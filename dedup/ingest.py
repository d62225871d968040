"""Ingest / normalize stage.

Reads the input Parquet (with column pruning — the wide ``html`` binary
column is only loaded when the extract-invariant check is on, and is
dropped again before any shuffle, SURVEY.md §7.5) and derives the
working columns every later stage keys on:

    node       uint64   stable node id (doc_id, or blake2b64(url))
    id         (input)  the original primary-key column
    order_key  binary   sortable global-order encoding (keys.order_key_bytes)
    n_chars    int64    utf8 length of text (ignore filter + SQL parity)
    scope64    uint64   hash of the scope attribute for the configured mode
    state0     string   'ok' | 'ignored' | 'error'
    text       string   content (null for error rows)
    exact64    uint64   first 8 bytes of exact_full (shuffle key)
    exact_full binary   16-byte hash of the exact-equality key material

Reference semantics encoded here: strict ``<`` ignore threshold
(MainViewModel.cs:603, SURVEY.md §A.1); error rows never match anything
(null-hash decision, §A.4); byte-identical extract invariant
(MainViewModel.cs:1094-1146) enforced when html is present.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .config import DedupConfig
from .extract import extract_text
from .keys import order_key_bytes, root_rank, url_host, url_prefix


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _binary_pylist(col) -> list:
    """Python ``bytes`` view of a string column: arrow strings are
    UTF-8 already, so the string→binary cast is zero-copy and avoids a
    per-row decode-then-re-encode round trip on the hashing path."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(a.type):
        a = a.cast(pa.binary())
    elif pa.types.is_large_string(a.type):
        a = a.cast(pa.large_binary())
    return a.to_pylist()


def _scope_value(cfg: DedupConfig, url: str) -> str:
    if cfg.scope in ("same_prefix", "diff_prefix"):
        return url_prefix(url)
    if cfg.scope in ("same_host", "diff_host"):
        return url_host(url)
    if cfg.scope in ("same_root", "diff_root"):
        return str(root_rank(url, cfg.roots))
    return ""


def needed_columns(cfg: DedupConfig, has_html: bool = False) -> list[str]:
    """The columns the pipeline actually needs — everything else must
    stay in storage."""
    cols = [cfg.id_col, cfg.text_col]
    if cfg.ts_col and (cfg.key_ts or cfg.keeper in ("newest", "oldest")):
        cols.append(cfg.ts_col)
    if cfg.lang_col and cfg.key_lang:
        cols.append(cfg.lang_col)
    if cfg.scope_col and cfg.scope != "all" and cfg.scope_col not in cols:
        cols.append(cfg.scope_col)
    if cfg.keeper_col and cfg.keeper_col not in cols:
        cols.append(cfg.keeper_col)
    if has_html:
        cols.append("html")
    return cols


def _first_data_file(path: str | list[str]) -> str:
    """First regular data file under ``path`` (recursing into
    subdirectories so hive-partitioned layouts like ``shard=0/`` sniff
    from a FILE name, not a directory name — ADVICE r3)."""
    import os
    p = path[0] if isinstance(path, list) else path
    while os.path.isdir(p):
        names = sorted(n for n in os.listdir(p)
                       if not n.startswith(("_", ".")))
        if not names:
            break
        files = [n for n in names if os.path.isfile(os.path.join(p, n))]
        p = os.path.join(p, files[0] if files else names[0])
    return p


def _infer_format(path: str | list[str]) -> str:
    """File-extension format sniff over the first data file found."""
    ext = _first_data_file(path).rsplit(".", 1)[-1].lower()
    if ext in ("csv", "tsv"):
        return "csv"
    if ext in ("json", "jsonl", "ndjson"):
        return "jsonl"
    return "parquet"


def _check_source_columns(path: str | list[str], fmt: str,
                          cols: list[str]) -> None:
    """Targeted missing-column error for csv/jsonl sources: pyarrow's
    include_columns / select_columns fail opaquely when a configured
    optional column (ts/lang/scope/keeper) is absent, so sniff the first
    file's header and name the missing columns up front (ADVICE r3)."""
    import os
    p = _first_data_file(path)
    if not os.path.isfile(p):
        return
    try:
        with open(p, "rb") as f:
            first = f.readline().decode("utf-8", errors="replace").strip()
    except OSError:
        return
    if fmt == "csv":
        from io import BytesIO
        from pyarrow import csv as pacsv
        try:
            have = set(pacsv.read_csv(
                BytesIO(first.encode() + b"\n")).column_names)
        except Exception:
            return
    else:
        import json
        try:
            have = set(json.loads(first))
        except Exception:
            return
    missing = [c for c in cols if c not in have]
    if missing:
        raise ValueError(
            f"{fmt} source {p!r} is missing required column(s) "
            f"{missing} (present: {sorted(have)}); fix the config "
            "column names or the source schema")


def read_input(path: str | list[str], cfg: DedupConfig,
               has_html: bool = False,
               format: str = "auto") -> ray.data.Dataset:
    """Column-pruned source read for any supported interchange format.

    parquet  projection pushed to the reader: pruned columns never
             leave storage (row groups of unneeded columns unread)
    csv      pruned at parse (pyarrow include_columns); quoted newlines
             accepted; "" parses as null (strings_can_be_null — CSV
             cannot distinguish empty from missing, so the error-row
             contract maps both to null)
    jsonl    newline-delimited JSON (the WARC-extraction interchange
             shape); a JSON line must be fully parsed, so pruning
             happens immediately after parse (select_columns) and only
             the needed columns enter the object store
    """
    cols = needed_columns(cfg, has_html)
    fmt = _infer_format(path) if format == "auto" else format
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=cols)
    if fmt in ("csv", "jsonl"):
        _check_source_columns(path, fmt, cols)
    if fmt == "csv":
        from pyarrow import csv as pacsv
        return ray.data.read_csv(
            path,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            convert_options=pacsv.ConvertOptions(
                include_columns=cols, strings_can_be_null=True))
    if fmt == "jsonl":
        return ray.data.read_json(path).select_columns(cols)
    raise ValueError(f"unsupported input format: {fmt!r}")


class Preparer:
    """Stateless map_batches fn (kept as a class for config closure).

    ``keep_text=False`` drops the raw text column from the OUTPUT (it is
    still read to hash/measure): for exact-only configs nothing
    downstream consumes text, so carrying it through the materialized
    prepare stage would double the resident corpus footprint for
    nothing (VERDICT r3 #1)."""

    def __init__(self, cfg: DedupConfig, check_html: bool = True,
                 keep_text: bool = True) -> None:
        self.cfg = cfg
        self.check_html = check_html
        self.keep_text = keep_text
        self.string_ids = None  # resolved on first batch
        # pluggable content hash (HashingAlgorithm analogue,
        # MainViewModel.cs:25-38, dispatch FileEntryViewModel.cs:146-190);
        # any choice yields identical assignments (absent collisions).
        # crc32 is the reference's cheapest enum member — not in hashlib,
        # so shim zlib.crc32 to the digest interface (4-byte big-endian).
        if cfg.content_hash == "crc32":
            import zlib
            self._digest = lambda b: zlib.crc32(b).to_bytes(4, "big")
        else:
            _h = getattr(hashlib, cfg.content_hash)
            self._digest = lambda b: _h(b).digest()

    def __call__(self, t: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids = t[cfg.id_col]
        if self.string_ids is None:
            self.string_ids = pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type)
        n = t.num_rows
        txt_null = pc.is_null(t[cfg.text_col]).to_numpy(zero_copy_only=False)

        # --- extract-invariant check (byte comparator analogue),
        # vectorized: one re2-kernel extract over the column + one equal
        invariant_bad = np.zeros(n, dtype=bool)
        if self.check_html and "html" in t.column_names:
            from .extract import extract_text_column
            ext = extract_text_column(t["html"])
            eq = pc.fill_null(pc.equal(ext, t[cfg.text_col]), False) \
                .to_numpy(zero_copy_only=False)
            invariant_bad = ~eq & ~txt_null

        # content bytes the exact key hashes: the raw text, or its
        # C4-style normalization (normalize='c4') — nulls propagate.
        # The string column is viewed as BINARY (zero-copy: arrow strings
        # are already UTF-8) so hashing consumes bytes directly instead
        # of decoding to str and re-encoding per row (VERDICT r3 #3).
        hash_col = t[cfg.text_col]
        if cfg.normalize == "c4":
            from .extract import normalize_text_column
            hash_col = normalize_text_column(hash_col)
        hash_bytes = _binary_pylist(hash_col)

        scoped = cfg.scope != "all"
        if scoped and not cfg.scope_col and not self.string_ids:
            raise ValueError(
                f"scope={cfg.scope!r} over integer ids needs scope_col: "
                "there is no url to derive host/prefix/root from")

        # node + order key: per-row only for string ids (blake2b node
        # hash and the explorer-collation encoding are inherently
        # per-string); integer ids take the pure-numpy branch — the
        # big-endian byte view IS the order key
        if self.string_ids:
            id_list = ids.to_pylist()
            node = np.fromiter((_h64(u.encode()) for u in id_list),
                               dtype=np.uint64, count=n)
            if cfg.roots:
                okey_arr = pa.array(
                    [order_key_bytes(u, root_rank(u, cfg.roots))
                     for u in id_list], pa.binary())
            else:
                okey_arr = pa.array([order_key_bytes(u, 0)
                                     for u in id_list], pa.binary())
        else:
            id_list = None
            raw = ids.to_numpy(zero_copy_only=False)
            if raw.dtype.kind == "i" and n and int(raw.min()) < 0:
                raise ValueError(
                    f"negative values in integer id column "
                    f"{cfg.id_col!r} are not supported")
            node = raw.astype(np.uint64)
            be = node.astype(">u8")
            offs = np.arange(0, 8 * (n + 1), 8, dtype=np.int32)
            okey_arr = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(be.tobytes())])

        # scope hash: dictionary-encode the scope column and hash each
        # UNIQUE value once (hosts/prefixes repeat heavily in a crawl);
        # url-derived scopes stay per-row (string parsing)
        scope64 = np.zeros(n, dtype=np.uint64)
        if scoped:
            if cfg.scope_col:
                col = t[cfg.scope_col]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                dic = pc.dictionary_encode(col)
                uniq = dic.dictionary.to_pylist()
                uh = np.fromiter((_h64(str(v).encode()) for v in uniq),
                                 dtype=np.uint64, count=len(uniq))
                idx = dic.indices.fill_null(-1) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                null_h = np.uint64(_h64(b"None"))  # str(None) parity
                if len(uh):
                    scope64 = np.where(idx >= 0,
                                       uh[np.clip(idx, 0, None)], null_h)
                else:
                    scope64 = np.full(n, null_h, dtype=np.uint64)
            else:
                scope64 = np.fromiter(
                    (_h64(_scope_value(cfg, u).encode()) for u in id_list),
                    dtype=np.uint64, count=n)

        # content digest per row (hashlib is per-row by nature; the
        # surrounding work above is vectorized)
        dig = self._digest
        shas = [dig(b) if b is not None else None for b in hash_bytes]

        n_chars = pc.fill_null(pc.utf8_length(t[cfg.text_col]), 0).cast(pa.int64())
        nc = n_chars.to_numpy(zero_copy_only=False)

        # state0: error (null text / invariant violation) > ignored (strict <)
        is_err = txt_null | invariant_bad
        state0 = np.where(is_err, "error",
                          np.where(nc < cfg.min_doc_bytes, "ignored", "ok"))

        # exact key material: sha256(text) [+ ts] [+ lang] [+ scope if same_*]
        ts_vals = t[cfg.ts_col].cast(pa.int64()).to_pylist() if (cfg.key_ts and cfg.ts_col) else None
        lang_vals = t[cfg.lang_col].to_pylist() if (cfg.key_lang and cfg.lang_col) else None
        same_scope = cfg.scope.startswith("same_")
        ok_mask = state0 == "ok"
        exact_full: list[bytes | None]
        if ts_vals is None and lang_vals is None and not same_scope:
            # common case: one fixed-size blake2b per ok row, no extras
            _b2 = hashlib.blake2b
            exact_full = [_b2(s, digest_size=16).digest() if okm else None
                          for s, okm in zip(shas, ok_mask)]
        else:
            exact_full = []
            for i in range(n):
                if not ok_mask[i]:
                    exact_full.append(None)
                    continue
                h = hashlib.blake2b(shas[i], digest_size=16)
                if ts_vals is not None:
                    h.update(b"\x00t" + str(ts_vals[i]).encode())
                if lang_vals is not None:
                    h.update(b"\x00l" + (lang_vals[i] or "").encode())
                if same_scope:
                    h.update(b"\x00s" + scope64[i].tobytes())
                exact_full.append(h.digest())
        # exact64 = first 8 digest bytes little-endian, vectorized over
        # the concatenated fixed-width (16 B) ok-row digests
        exact64 = np.zeros(n, dtype=np.uint64)
        ok_idx = np.flatnonzero(ok_mask)
        if len(ok_idx):
            cat = b"".join(exact_full[i] for i in ok_idx)
            exact64[ok_idx] = np.frombuffer(cat, dtype="<u8") \
                .reshape(-1, 2)[:, 0]

        # keeper rank: SMALLER = preferred keeper; ties fall through to
        # order_key in the assignment sort, so 'first' (all-zero rank)
        # reproduces the reference's greedy representative exactly
        if cfg.keeper == "longest":
            krank = -nc.astype(np.int64)
        elif cfg.keeper in ("newest", "oldest"):
            tsv = pc.fill_null(t[cfg.ts_col].cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            krank = -tsv if cfg.keeper == "newest" else tsv
        elif cfg.keeper == "priority":
            pv = pc.fill_null(t[cfg.keeper_col].cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            krank = -pv
        else:
            krank = np.zeros(n, dtype=np.int64)

        out_cols = {
            "node": pa.array(node, pa.uint64()),
            "id": ids,
            "krank": pa.array(krank, pa.int64()),
            "order_key": okey_arr,
            "n_chars": pa.array(nc, pa.int64()),
            "scope64": pa.array(scope64, pa.uint64()),
            "state0": pa.array(state0.tolist(), pa.string()),
        }
        if self.keep_text:
            out_cols["text"] = t[cfg.text_col]
        out_cols["exact64"] = pa.array(exact64, pa.uint64())
        out_cols["exact_full"] = pa.array(exact_full, pa.binary())
        if cfg.stem_prefix:
            from .keys import url_stem
            stems = id_list if id_list is not None else ids.to_pylist()
            out_cols["stem"] = pa.array(
                [url_stem(i).lower() for i in stems], pa.string())
        return pa.table(out_cols)


def prepare(ds: ray.data.Dataset, cfg: DedupConfig,
            check_html: bool = True,
            keep_text: bool = True) -> ray.data.Dataset:
    """read → normalized working table (html dropped on output;
    ``keep_text=False`` drops the raw text column too — see Preparer)."""
    return ds.map_batches(
        Preparer(cfg, check_html=check_html, keep_text=keep_text),
        batch_format="pyarrow")
