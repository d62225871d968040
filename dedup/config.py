"""Pipeline configuration — the engine's entire "query language".

Analogue of the reference's persisted user settings (the hashing
algorithm, folder-comparison mode, nine compare flags, ignore-size
threshold; reference ``Properties/UserSettings.settings:4-44`` loaded at
``ViewModels/MainViewModel.cs:350-387``), re-expressed as a frozen
dataclass serialized to JSON alongside run outputs.  The
``fingerprint()`` keys checkpoints: a stage checkpoint is only reusable
when produced under an identical config.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace


SCOPE_MODES = (
    "all",            # reference FolderComparisonMode.AllFolders (MainViewModel.cs:43-59)
    "same_prefix",    # SameFolder  -> same url path-prefix (directory analogue)
    "diff_prefix",    # DifferentFolder
    "same_root",      # SameUserFolder -> same configured root (first-prefix-wins)
    "diff_root",      # DifferentUserFolder
    "same_host",      # disk analogue (Path.GetPathRoot, MainViewModel.cs:1023-1026)
    "diff_host",
)


@dataclass(frozen=True)
class DedupConfig:
    """Config for one dedup run.

    Exact-key flags mirror the reference's conjunctive predicate chain
    (CompareSize/Date/Name/Extension..., MainViewModel.cs:996-1241);
    near-dup knobs (MinHash/LSH, SimHash, substring) are the north-star
    generalization of the prefix-stem near-match (MainViewModel.cs:1064-1072).
    """

    # --- table shape -------------------------------------------------
    id_col: str = "url"            # primary key column
    text_col: str = "text"         # content column the predicates act on
    ts_col: str = "warc_ts"        # mtime analogue
    lang_col: str = "lang"         # extension analogue

    # --- exact pass (conjunctive equality keys) ----------------------
    exact: bool = True             # CompareHash/CompareContent analogue
    content_hash: str = "sha256"   # pluggable content-hash algorithm
                                   # (HashingAlgorithm enum CRC32/MD5/SHA1/SHA256,
                                   # MainViewModel.cs:25-38, FileEntryViewModel.cs:146-190);
                                   # sha256|blake2b|sha1|md5|crc32 — the choice can
                                   # never change assignments (absent collisions),
                                   # only hash cost; crc32 mirrors the reference's
                                   # cheapest option and carries its documented
                                   # collision risk at corpus scale
    key_ts: bool = False           # CompareDateModified (MainViewModel.cs:1011-1014)
    key_lang: bool = False         # CompareExtension analogue (:1081-1085)
    byte_verify: bool = False      # M9 byte comparator analogue (:1094-1146); carries
                                   # text through the exact shuffle — costly, off by default
    normalize: str = "none"        # 'none' | 'c4': exact-key material is the
                                   # C4-style-normalized text (lowercase, ASCII
                                   # punct stripped, whitespace collapsed) — the
                                   # content-level generalization of the
                                   # reference's OrdinalIgnoreCase key matching
                                   # (MainViewModel.cs:1040-1072); byte_verify
                                   # then compares the normalized bytes (the
                                   # bytes that were hashed)
    stem_prefix: bool = False      # M7 literal mode (CompareFilenameSimilar,
                                   # MainViewModel.cs:1064-1072): exact-pass pairs
                                   # additionally require the ORDER-EARLIER record's
                                   # stem to be a case-insensitive prefix of the
                                   # other's (the prober's stem in the greedy scan);
                                   # the near-dup passes are the scalable
                                   # generalization (SURVEY.md §2.2 M7)

    # --- scope (comparison domain) -----------------------------------
    scope: str = "all"             # one of SCOPE_MODES
    scope_col: str = ""            # non-empty: read the scope attribute from this
                                   # column instead of deriving it from the url —
                                   # required for integer-id tables (there is no url
                                   # to derive host/prefix/root from)
    roots: tuple[str, ...] = ()    # ordered url-prefix roots (Folders list analogue);
                                   # first-prefix-wins (MainViewModel.cs:522-527)

    # --- ignore filter -----------------------------------------------
    min_doc_bytes: int = 64        # strict '<' => ignored (MainViewModel.cs:603; SURVEY §A.1)

    # --- MinHash / LSH near-dup pass ---------------------------------
    near: bool = True
    shingle_k: int = 5             # words per shingle
    num_perm: int = 128            # MinHash signature length P
    lsh_bands: int = 32            # b bands x r rows; b*r must == num_perm
    lsh_rows: int = 4
    verify: str = "signature"      # 'none' | 'signature' (est. Jaccard from sig
                                   # agreement) | 'jaccard' (exact shingle Jaccard
                                   # over texts — n-gram Jaccard dedup)
    verify_threshold: float = 0.5  # min agreement/Jaccard to keep a candidate pair
    pair_cap: int = 64             # buckets larger than this emit star edges (skew guard)
    lsh_salt: int = 8              # >0: salt HOT band keys with hash(node) %% S so one
                                   # hot band (web boilerplate) spreads over S
                                   # partitions (memory-level skew guard); cross-salt
                                   # connectivity restored by a per-bucket rep pass.
                                   # Which bands are hot is decided GLOBALLY before the
                                   # band shuffle by a deterministic sampled count
                                   # (detect_hot_band_keys): the sample mask and counts
                                   # are pure functions of corpus content (mix64 of
                                   # content-derived keys), never of batch boundaries,
                                   # so byte-identical-across-parallelism determinism
                                   # holds.  A corpus with no hot bands pays ~nothing
                                   # (the detect pass is a 1/64-volume count; the band
                                   # shuffle stays single, unsalted, no skey0 column) —
                                   # always-salting cost a second full-volume rep
                                   # shuffle because most buckets are singletons.
                                   # 0 = salting disabled entirely.
    lsh_hot_min: int = 4096        # approximate global bucket size above which a band
                                   # key is salted (trigger is sampled at 1/64 volume:
                                   # ~50% at exactly this size, certain well above it —
                                   # the guard targets partition-memory-scale buckets,
                                   # orders of magnitude larger).  0 = salt EVERY
                                   # bucket unconditionally (the conservative mode:
                                   # no detect pass, one combined pairs+reps shuffle).

    # --- SimHash pass ------------------------------------------------
    simhash: bool = True
    simhash_bits: int = 64
    simhash_hamming: int = 3       # max Hamming distance; blocks = hamming+1 (pigeonhole)

    # --- substring (winnowing) pass ----------------------------------
    substring: bool = True
    winnow_gram: int = 64          # char-gram length g
    winnow_window: int = 192       # winnowing window w; guarantees detection of any
                                   # shared substring of length >= g + w - 1 = 255 chars
    min_substring: int = 256       # containment verified only at/above this length
    substring_mode: str = "winnow"  # 'winnow': containment semantics (shorter doc
                                    # appears verbatim in longer; ratio prefilter +
                                    # `small in big` verify) | 'suffix_array':
                                    # shared-run semantics (ANY verbatim byte run >=
                                    # min_substring shared between two docs; anchors
                                    # co-partition, per-partition sorted suffix
                                    # tables decide exactly — see dedup.suffix)

    # --- keeper policy (tier dedup) ----------------------------------
    keeper: str = "first"          # which cluster member survives:
                                   # 'first'   = global-order minimum (the
                                   #   reference's greedy-scan representative,
                                   #   MainViewModel.cs:1227-1234 — default);
                                   # 'longest' = max raw n_chars;
                                   # 'newest' / 'oldest' = max/min ts_col;
                                   # 'priority' = max keeper_col (an integer
                                   #   tier/quality rank — pre-scale floats e6).
                                   # Ties always break to the global-order
                                   # minimum, so every policy stays
                                   # deterministic at any parallelism.
    keeper_col: str = ""           # integer column read for keeper='priority'

    # --- misc --------------------------------------------------------
    seed: int = 42
    checkpoint_dir: str | None = None

    def __post_init__(self) -> None:
        if self.scope not in SCOPE_MODES:
            raise ValueError(f"scope must be one of {SCOPE_MODES}, got {self.scope!r}")
        if self.near and self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}x{self.lsh_rows}) must equal "
                f"num_perm ({self.num_perm})"
            )
        if self.verify not in ("none", "signature", "jaccard"):
            raise ValueError(
                f"verify must be 'none'|'signature'|'jaccard', got {self.verify!r}")
        if self.content_hash not in ("sha256", "blake2b", "sha1", "md5",
                                     "crc32"):
            raise ValueError(
                "content_hash must be sha256|blake2b|sha1|md5|crc32, "
                f"got {self.content_hash!r}")
        if self.normalize not in ("none", "c4"):
            raise ValueError(
                f"normalize must be 'none'|'c4', got {self.normalize!r}")
        if self.substring_mode not in ("winnow", "suffix_array"):
            raise ValueError(
                "substring_mode must be 'winnow'|'suffix_array', "
                f"got {self.substring_mode!r}")
        if self.keeper not in ("first", "longest", "newest", "oldest",
                               "priority"):
            raise ValueError(
                "keeper must be first|longest|newest|oldest|priority, "
                f"got {self.keeper!r}")
        if self.keeper == "priority" and not self.keeper_col:
            raise ValueError("keeper='priority' needs keeper_col")
        if self.keeper in ("newest", "oldest") and not self.ts_col:
            raise ValueError(f"keeper={self.keeper!r} needs ts_col")

    # -----------------------------------------------------------------
    def to_json(self) -> str:
        d = asdict(self)
        d["roots"] = list(self.roots)
        return json.dumps(d, sort_keys=True, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "DedupConfig":
        d = json.loads(s)
        d["roots"] = tuple(d.get("roots", ()))
        return cls(**d)

    def fingerprint(self) -> str:
        """Stable hash of every semantic knob; keys checkpoint reuse."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)


#: Config adapter for the driver-provided ``documents`` table
#: (doc_id:int64, text, lang, source, n_chars).  Order key = doc_id, so the
#: cluster keeper is simply MIN(doc_id) — directly SQL-checkable.
DOCUMENTS_CONFIG = DedupConfig(
    id_col="doc_id",
    text_col="text",
    ts_col="",
    lang_col="lang",
    roots=(),
)
