"""End-to-end dedup pipelines (exact / near / simhash / substring → union-find
→ assignment).

Semantics re-derived from the reference's ScanAsync/CompareFile
(MainViewModel.cs:564-818, 996-1241; see SURVEY.md §0.1): candidate
pairs exist only within equality blocks; for symmetric predicates the
greedy first-wins pass equals connected components of the verified match
relation with representative = minimum member in the global order — here
computed with order-insensitive min-reduces only, so the output is
byte-identical at any parallelism / partition count.

Every wide step is the ``dist.groupapply`` pattern: ONE hash shuffle on
a uint64 key + a vectorized partition function.  Skew control: buckets
larger than ``pair_cap`` emit O(n) star edges instead of O(n^2) pairs
(connectivity-preserving, SURVEY.md §7.4/§7.5 "hot LSH bands").
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .config import DedupConfig
from .dist import groupapply, iter_blocks, mix64, segments, union_find
from .ingest import prepare
from .minhash import MinHashSigner
from .simhash import SimHashSigner

_PAIR_SCHEMA = pa.schema([("u", pa.uint64()), ("v", pa.uint64())])
_EMPTY_PAIRS = pa.table({"u": pa.array([], pa.uint64()),
                         "v": pa.array([], pa.uint64())})


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _auto_partitions(cfg: DedupConfig, data_bytes: int = 0) -> int:
    """Shuffle partition count: one partition per ~128 MiB of prepared
    data, but never below the cluster CPU count (a partition is the unit
    of reduce-side parallelism) and floored at 16.  Oversized P multiplies
    per-task fixed costs across every groupapply; at real scale the byte
    term governs."""
    if getattr(cfg, "num_partitions", 0):
        return cfg.num_partitions
    by_bytes = data_bytes // (128 << 20)
    return int(max(16, _cluster_cpus(), min(4096, by_bytes)))


def _pool() -> tuple[int, int]:
    """Actor-pool sizing for signer stages: scale with the cluster."""
    return (1, max(8, _cluster_cpus()))


def _ok_only(ds: ray.data.Dataset) -> ray.data.Dataset:
    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["state0"], "ok"))
    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pair emission inside a bucket (vectorized per partition)
# ---------------------------------------------------------------------------

#: Star anchors per over-cap bucket.  With ONE anchor, a verified pass
#: (minhash signature / jaccard / substring containment) loses every
#: (x, y) link of a hot bucket whenever the (anchor, x) candidates fail
#: verification — the anchor might be a bucket false-positive.  k
#: independent anchors bound that recall loss to the probability that
#: ALL k anchors fail against a true pair's endpoints, while edges stay
#: O(k·n) (ADVICE r1).
_STAR_ANCHORS = 3


def _emit_bucket_pairs(nodes: np.ndarray, scopes: np.ndarray | None,
                       diff_scope: bool, cap: int,
                       out_u: list, out_v: list) -> None:
    """Candidate pairs for one bucket.  <=cap: all pairs; larger buckets
    emit star edges from the _STAR_ANCHORS smallest nodes — O(k·n),
    connectivity-equivalent under union-find and robust to post-hoc edge
    verification (see _STAR_ANCHORS).  diff_scope restricts pairs to
    unequal scopes (reference Different-X modes,
    MainViewModel.cs:720-749); a >=2-scope bucket is transitively fully
    connected, so star edges anchored at the two smallest nodes of
    distinct scopes preserve components."""
    n = len(nodes)
    if n < 2:
        return
    o = np.argsort(nodes, kind="stable")
    nodes = nodes[o]
    if scopes is not None:
        scopes = scopes[o]
    if diff_scope:
        if scopes is None or len(np.unique(scopes)) < 2:
            return
        if n <= cap:
            iu, iv = np.triu_indices(n, k=1)
            keep = scopes[iu] != scopes[iv]
            out_u.append(nodes[iu][keep]); out_v.append(nodes[iv][keep])
        else:
            a0 = 0
            other = np.flatnonzero(scopes != scopes[a0])
            a1 = other[0]
            m0 = scopes != scopes[a0]
            m1 = ~m0
            m1[a0] = False
            out_u.append(np.full(m0.sum(), nodes[a0], dtype=np.uint64))
            out_v.append(nodes[m0])
            out_u.append(np.full(m1.sum(), nodes[a1], dtype=np.uint64))
            out_v.append(nodes[m1])
        return
    if n <= cap:
        iu, iv = np.triu_indices(n, k=1)
        out_u.append(nodes[iu]); out_v.append(nodes[iv])
    else:
        for a in range(min(_STAR_ANCHORS, n - 1)):
            out_u.append(np.full(n - 1 - a, nodes[a], dtype=np.uint64))
            out_v.append(nodes[a + 1:])


def _emit_partition_pairs(sk: np.ndarray, nodes: np.ndarray,
                          scopes: np.ndarray | None, diff_scope: bool,
                          cap: int, out_u: list, out_v: list) -> None:
    """All candidate pairs of one hash partition, grouped by ``sk``.
    Size-2 buckets — the overwhelming majority under LSH banding (a true
    duplicate pair resurfaces as its own 2-bucket in most of the b
    bands) — are emitted in ONE vectorized step; only buckets >= 3 rows
    take the per-bucket path."""
    order, starts, _ = segments(sk)
    sizes = np.diff(starts)
    nodes_s = nodes[order]
    scopes_s = scopes[order] if scopes is not None else None
    two = np.flatnonzero(sizes == 2)
    if len(two):
        s2 = starts[two]
        a, b = nodes_s[s2], nodes_s[s2 + 1]
        u2, v2 = np.minimum(a, b), np.maximum(a, b)
        keep = u2 != v2
        if diff_scope:
            if scopes_s is None:
                keep[:] = False
            else:
                keep &= scopes_s[s2] != scopes_s[s2 + 1]
        out_u.append(u2[keep])
        out_v.append(v2[keep])
    for gi in np.flatnonzero(sizes >= 3):
        s, e = starts[gi], starts[gi + 1]
        idx = order[s:e]
        _emit_bucket_pairs(nodes[idx],
                           scopes[idx] if scopes is not None else None,
                           diff_scope, cap, out_u, out_v)


def _star_indices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs of a multi-anchor star over n sorted nodes (the
    over-cap replacement for triu_indices; see _STAR_ANCHORS)."""
    k_a = min(_STAR_ANCHORS, n - 1)
    iu = np.concatenate([np.full(n - 1 - a, a, dtype=np.int64)
                         for a in range(k_a)])
    iv = np.concatenate([np.arange(a + 1, n, dtype=np.int64)
                         for a in range(k_a)])
    return iu, iv


def _pairs_table(out_u: list, out_v: list) -> pa.Table:
    if not out_u:
        return _EMPTY_PAIRS
    return pa.table({"u": np.concatenate(out_u), "v": np.concatenate(out_v)},
                    schema=_PAIR_SCHEMA)


# ---------------------------------------------------------------------------
# exact pass  (D1: group by (scope?, exact-key); SURVEY.md §2.7)
# ---------------------------------------------------------------------------

def _full_hi(col: pa.ChunkedArray) -> np.ndarray:
    """Bytes 8..16 of a 16-byte binary column as uint64 (zero-copy when
    the layout is uniform 16-byte values, which it always is for ok
    rows; ragged fallback kept for safety)."""
    arr = col.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=n + 1,
                         offset=arr.offset * 4)
    if (np.diff(offs) == 16).all():
        vals = np.frombuffer(arr.buffers()[2], dtype="<u8")
        return vals[offs[0] // 8: offs[0] // 8 + 2 * n].reshape(n, 2)[:, 1].copy()
    return np.array([int.from_bytes((b or b"")[8:16].ljust(8, b"\0"), "little")
                     for b in arr.to_pylist()], dtype=np.uint64)


def exact_edges(active: ray.data.Dataset, cfg: DedupConfig,
                P: int) -> ray.data.Dataset:
    """Edges connecting members of each exact-equality block.  The shuffle
    moves only (exact64, exact_full, node, scope64[, text]) — text only
    when byte_verify is on (M9 analogue)."""
    diff_scope = cfg.scope.startswith("diff_")
    cols = ["exact64", "exact_full", "node", "scope64"]
    if cfg.byte_verify:
        cols.append("text")
    if cfg.stem_prefix:
        cols += ["stem", "order_key"]
    sig = active.select_columns(cols)
    cap = cfg.pair_cap

    def _emit_stem_pairs(g: list, nodes, scopes, stems, okeys,
                         out_u: list, out_v: list) -> None:
        """M7 literal mode (CompareFilenameSimilar,
        MainViewModel.cs:1064-1072): within an exact block, pair (a, b)
        exists iff the ORDER-EARLIER record's stem (the prober's) is a
        case-insensitive prefix of the other's.  Over-cap blocks fall
        back to directional stars from the 3 order-first anchors."""
        gs = sorted(g, key=lambda i: okeys[i])
        m = len(gs)
        if m < 2:
            return
        if m <= cap:
            it = [(x, y) for xi, x in enumerate(gs) for y in gs[xi + 1:]]
        else:
            it = [(a, y) for a in gs[:_STAR_ANCHORS]
                  for y in gs if okeys[a] < okeys[y]]
        us, vs = [], []
        for x, y in it:
            if diff_scope and scopes[x] == scopes[y]:
                continue
            if stems[y].startswith(stems[x]):
                us.append(nodes[x])
                vs.append(nodes[y])
        if us:
            out_u.append(np.array(us, dtype=np.uint64))
            out_v.append(np.array(vs, dtype=np.uint64))

    def _part(t: pa.Table) -> pa.Table:
        e64 = t["exact64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scopes = t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # split rare exact64 collisions on the 16-byte key, vectorized:
        # bytes 8..16 of exact_full as a second uint64, one lexsort over
        # the composite (e64, ehi) — no Python-object conversion on the
        # common (no byte-verify / no stem) path
        ehi = _full_hi(t["exact_full"])
        if cfg.byte_verify:
            tcol = t["text"]
            if cfg.normalize == "c4":
                # verify the bytes that were hashed (the normalized text)
                from .extract import normalize_text_column
                tcol = normalize_text_column(tcol)
            texts = tcol.to_pylist()
        else:
            texts = None
        stems = t["stem"].to_pylist() if cfg.stem_prefix else None
        okeys = t["order_key"].to_pylist() if cfg.stem_prefix else None
        order = np.lexsort((ehi, e64))
        se, sh = e64[order], ehi[order]
        if len(se) == 0:
            return _EMPTY_PAIRS
        change = (se[1:] != se[:-1]) | (sh[1:] != sh[:-1])
        starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(se)]])
        sizes = np.diff(starts)
        out_u: list = []
        out_v: list = []
        for gi in np.flatnonzero(sizes >= 2):
            s, e = starts[gi], starts[gi + 1]
            idx = order[s:e]
            if texts is not None:
                # byte-verify (M9): sub-split on actual text equality
                by_text: dict[str, list[int]] = {}
                for i in idx:
                    by_text.setdefault(texts[i], []).append(i)
                groups = [g for g in by_text.values() if len(g) > 1]
            else:
                groups = [idx]
            for g in groups:
                if stems is not None:
                    _emit_stem_pairs(list(g), nodes, scopes, stems, okeys,
                                     out_u, out_v)
                else:
                    _emit_bucket_pairs(nodes[g], scopes[g], diff_scope,
                                       cap, out_u, out_v)
        return _pairs_table(out_u, out_v)

    return groupapply(sig, "exact64", _part, P)


# ---------------------------------------------------------------------------
# MinHash/LSH pass  (D3 near-dup; SURVEY.md §7.4 banding shuffle)
# ---------------------------------------------------------------------------

def _band_const(i: int) -> np.uint64:
    return np.uint64(int.from_bytes(
        hashlib.blake2b(b"band%d" % i, digest_size=8).digest(), "little"))


def _band_keys(t: pa.Table, cfg: DedupConfig):
    """Shared band-key kernel: (keys[b, n], nodes[n], scopes[n]) for the
    non-null-minhash rows of a signature table."""
    b, r = cfg.lsh_bands, cfg.lsh_rows
    consts = [_band_const(i) for i in range(b)]
    same_scope = cfg.scope.startswith("same_")
    t = t.filter(pc.invert(pc.is_null(t["minhash"])))
    n = t.num_rows
    if n == 0:
        z = np.zeros(0, dtype=np.uint64)
        return np.zeros((b, 0), dtype=np.uint64), z, z
    # zero-copy when the signature column is fixed-width (it always is:
    # the signer emits b*r u64s per doc) — the binary value buffer IS
    # the (n, b*r) matrix; _sig_matrix falls back to a bytes join only
    # on ragged layouts
    sig = _sig_matrix(t["minhash"].combine_chunks(), b * r)
    nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
    scopes = t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
    keys = np.empty((b, n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(b):
            h = np.full(n, consts[i], dtype=np.uint64)
            for j in range(r):
                h = mix64(h ^ sig[:, i * r + j])
            if same_scope:
                h = mix64(h ^ scopes)
            keys[i] = h
    return keys, nodes, scopes


_HOT_SAMPLE_RATE = 64   # detect pass samples 1/64 of the band rows
_HOT_CAP_KEYS = 1 << 18  # driver-side bound on the broadcast hot set
_HOT_C = _band_const(999_983)  # sample-mask tweak constant


def detect_hot_band_keys(sigs: ray.data.Dataset, cfg: DedupConfig,
                         P: int) -> np.ndarray:
    """Globally hot unsalted band keys (approximate bucket size >=
    cfg.lsh_hot_min), found BEFORE the band shuffle so the shuffle never
    has to concentrate a hot bucket on one partition.

    Deterministic by construction: a band row (skey, node) is sampled iff
    mix64(skey ^ mix64(node ^ C)) %% 64 == 0 — a pure function of corpus
    content, independent of batch boundaries and parallelism — and global
    sums of per-batch partial counts are blocking-invariant.  Cost: one
    pass of band-key hashing over the (materialized) signatures plus a
    shuffle of ~1/64 of the band-row volume as (key, count) partials.

    Returns a SORTED uint64 array (possibly empty), capped at the
    2^18 hottest keys (count desc, key asc) — each detected key stands
    for >= lsh_hot_min docs sharing a band, so the cap is only reachable
    when boilerplate dominates the corpus outright."""
    thr = max(1, cfg.lsh_hot_min // _HOT_SAMPLE_RATE)
    rate = np.uint64(_HOT_SAMPLE_RATE)

    def _partials(t: pa.Table) -> pa.Table:
        keys, nodes, _ = _band_keys(t, cfg)
        flat = keys.reshape(-1)
        nd = np.tile(nodes, keys.shape[0])
        with np.errstate(over="ignore"):
            mask = mix64(flat ^ mix64(nd ^ _HOT_C)) % rate == 0
        uk, cnt = np.unique(flat[mask], return_counts=True)
        # int64 bit view: Ray group keys round-trip through Python ints
        return pa.table({"skey": uk.view(np.int64),
                         "cnt": cnt.astype(np.int64)})

    def _hot_only(t: pa.Table) -> pa.Table:
        uk = t["skey"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(uk, kind="stable")
        uk, cnt = uk[order], cnt[order]
        starts = np.concatenate([[0], np.flatnonzero(uk[1:] != uk[:-1]) + 1])
        tot = np.add.reduceat(cnt, starts)
        keep = tot >= thr
        return pa.table({"skey": uk[starts][keep], "cnt": tot[keep]})

    batches = list(
        groupapply(sigs.map_batches(_partials, batch_format="pyarrow"),
                   "skey", _hot_only, P)
        .iter_batches(batch_format="pyarrow"))  # bounded: hot keys only
    if not batches:
        return np.zeros(0, dtype=np.uint64)
    hot_t = pa.concat_tables(batches)
    keys = hot_t["skey"].to_numpy(zero_copy_only=False).view(np.uint64)
    if len(keys) > _HOT_CAP_KEYS:
        cnt = hot_t["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -cnt))[:_HOT_CAP_KEYS]
        keys = keys[order]
    return np.sort(keys)


def lsh_band_rows(sigs: ray.data.Dataset, cfg: DedupConfig,
                  hot: np.ndarray | None = None) -> ray.data.Dataset:
    """Explode each signature into b band rows (skey = hash of the band's
    r signature components [+ scope for same_* modes]).

    Salting (the hot-band skew control): with cfg.lsh_salt = S > 0, a
    SALTED skey (band hash ⊕ hash(node) % S) is emitted so one hot band
    (web boilerplate) spreads over S groups and no single partition must
    hold its full membership; the unsalted key rides along as ``skey0``
    for the cross-salt rep pass (see minhash_edges).  Which rows are
    salted:
      * hot is None  -> every row (conservative all-salt mode);
      * hot is a sorted uint64 array -> only rows whose unsalted key is
        in it (adaptive mode; skey0 is NULL on unsalted rows, and with an
        empty hot set the output is identical to the S == 0 layout)."""
    S = cfg.lsh_salt
    if hot is not None and len(hot) == 0:
        S = 0  # no hot bands -> plain unsalted single-shuffle layout
    scoped = cfg.scope != "all"  # scope64 rides the shuffle only when used
    hot_ref = ray.put(hot) if (S > 0 and hot is not None) else None

    def _explode(t: pa.Table) -> pa.Table:
        keys, nodes, scopes = _band_keys(t, cfg)
        b, n = keys.shape
        if n == 0:
            cols = {"skey": pa.array([], pa.uint64()),
                    "node": pa.array([], pa.uint64())}
            if scoped:
                cols["scope64"] = pa.array([], pa.uint64())
            if S > 0:
                cols["skey0"] = pa.array([], pa.uint64())
            return pa.table(cols)
        cols = {}
        if S > 0:
            with np.errstate(over="ignore"):
                salt = mix64(nodes) % np.uint64(S)
                salted = mix64(keys ^ (salt[None, :] + np.uint64(1)))
            if hot_ref is not None:
                hot_arr = ray.get(hot_ref)
                flat = keys.reshape(-1)
                pos = np.searchsorted(hot_arr, flat)
                pos[pos == len(hot_arr)] = 0
                is_hot = hot_arr[pos] == flat
                cols["skey"] = np.where(is_hot, salted.reshape(-1), flat)
                cols["skey0"] = pa.array(flat, pa.uint64(), mask=~is_hot)
            else:
                cols["skey"] = salted.reshape(-1)
                cols["skey0"] = keys.reshape(-1)
        else:
            cols["skey"] = keys.reshape(-1)
        cols["node"] = np.tile(nodes, b)
        if scoped:
            cols["scope64"] = np.tile(scopes, b)
        return pa.table(cols)

    return sigs.map_batches(_explode, batch_format="pyarrow")


def _salted_pairs_and_reps(rows: ray.data.Dataset, cfg: DedupConfig,
                           P: int) -> ray.data.Dataset:
    """ONE shuffle over the salted band rows emitting BOTH outputs:
      * candidate pairs within each salted bucket — rows (u, v, rkey=null);
      * one representative row per SALTED bucket (min node), keyed by the
        UNSALTED band key — rows (u=node, v=null, rkey=skey0,
        rscope=scope64).  Rows with a null skey0 (cold, unsalted bands in
        adaptive mode) emit pairs only — they need no rep because their
        full bucket already met in this shuffle.
    The reps then meet under skey0 in a second (rep-only) shuffle to
    restore cross-salt connectivity of hot bands.  Folding rep emission
    into the pair shuffle saves the full extra band-table shuffle the
    standalone rep pass cost."""
    diff_scope = cfg.scope.startswith("diff_")
    cap = cfg.pair_cap

    def _part(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scoped = "scope64" in t.column_names
        scopes = (t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  if scoped else np.zeros(len(sk), dtype=np.uint64))
        sk0_col = t["skey0"].combine_chunks()
        valid0 = pc.is_valid(sk0_col).to_numpy(zero_copy_only=False)
        sk0 = sk0_col.fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        out_u: list = []
        out_v: list = []
        # per-SALTED-bucket min-node rep, vectorized: lexsort by
        # (skey, node), segment firsts are the argmins; cold (null-skey0)
        # segments are dropped — a salted bucket is all-hot or all-cold
        # since hotness is a function of the unsalted key
        order2 = np.lexsort((nodes, sk))
        sks = sk[order2]
        if len(sks) == 0:
            reps = np.zeros(0, dtype=np.int64)
        else:
            starts2 = np.concatenate(
                [[0], np.flatnonzero(sks[1:] != sks[:-1]) + 1])
            reps = order2[starts2]
            reps = reps[valid0[reps]]
        _emit_partition_pairs(sk, nodes, scopes if scoped else None,
                              diff_scope, cap, out_u, out_v)
        pu = np.concatenate(out_u) if out_u else np.array([], dtype=np.uint64)
        pv = np.concatenate(out_v) if out_v else np.array([], dtype=np.uint64)
        n_p, n_r = len(pu), len(reps)
        return pa.table({
            "u": pa.array(np.concatenate([pu, nodes[reps]]), pa.uint64()),
            "v": pa.concat_arrays([pa.array(pv, pa.uint64()),
                                   pa.nulls(n_r, pa.uint64())]),
            "rkey": pa.concat_arrays([pa.nulls(n_p, pa.uint64()),
                                      pa.array(sk0[reps], pa.uint64())]),
            "rscope": pa.concat_arrays([pa.nulls(n_p, pa.uint64()),
                                        pa.array(scopes[reps], pa.uint64())]),
        })

    return groupapply(rows, "skey", _part, P)


def bucket_pairs(rows: ray.data.Dataset, cfg: DedupConfig,
                 P: int) -> ray.data.Dataset:
    """groupby(skey) → candidate pairs (deduplicated across bands)."""
    diff_scope = cfg.scope.startswith("diff_")
    cap = cfg.pair_cap

    def _part(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scopes = (t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  if "scope64" in t.column_names else None)
        out_u: list = []
        out_v: list = []
        _emit_partition_pairs(sk, nodes, scopes, diff_scope, cap, out_u, out_v)
        return _pairs_table(out_u, out_v)

    return groupapply(rows, "skey", _part, P)


def dedupe_pairs(pairs: ray.data.Dataset, P: int) -> ray.data.Dataset:
    """Canonicalize (min, max) and drop duplicates (cross-band repeats)."""

    def _key(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"skey": mix64(lo) ^ mix64(~hi), "u": lo, "v": hi})

    def _uniq(t: pa.Table) -> pa.Table:
        uv = np.stack([
            t["u"].to_numpy(zero_copy_only=False).astype(np.uint64),
            t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)], axis=1)
        uv = np.unique(uv, axis=0)
        return pa.table({"u": uv[:, 0], "v": uv[:, 1]}, schema=_PAIR_SCHEMA)

    return groupapply(pairs.map_batches(_key, batch_format="pyarrow"),
                      "skey", _uniq, P)


# ---------------------------------------------------------------------------
# SimHash pass (Hamming-block candidates; fingerprint rides along -> inline verify)
# ---------------------------------------------------------------------------

def simhash_edges(active: ray.data.Dataset, cfg: DedupConfig,
                  P: int) -> ray.data.Dataset:
    n_blocks = cfg.simhash_hamming + 1
    width = cfg.simhash_bits // n_blocks
    bmask = np.uint64((1 << width) - 1)
    same_scope = cfg.scope.startswith("same_")
    diff_scope = cfg.scope.startswith("diff_")
    maxham = cfg.simhash_hamming
    cap = cfg.pair_cap
    consts = [_band_const(1000 + i) for i in range(n_blocks)]

    def _sign(t: pa.Table) -> pa.Table:
        from .simhash import cached_signer
        return cached_signer(cfg.seed)(t)

    sigs = active.select_columns(["node", "scope64", "text"]).map_batches(
        _sign, batch_format="pyarrow",
    ).select_columns(["node", "scope64", "simhash"])

    scoped = cfg.scope != "all"  # scope64 rides the shuffle only when used

    def _explode(t: pa.Table) -> pa.Table:
        fp = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = fp != 0
        fp = fp[mask]
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)[mask]
        scopes = t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)[mask]
        n = len(fp)
        keys = np.empty((n_blocks, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(n_blocks):
                blk = (fp >> np.uint64(i * width)) & bmask
                h = mix64(blk ^ consts[i])
                if same_scope:
                    h = mix64(h ^ scopes)
                keys[i] = h
        cols = {
            "skey": keys.reshape(-1),
            "node": np.tile(nodes, n_blocks),
            "fp": np.tile(fp, n_blocks),
        }
        if scoped:
            cols["scope64"] = np.tile(scopes, n_blocks)
        return pa.table(cols)

    rows = sigs.map_batches(_explode, batch_format="pyarrow")

    def _popcnt(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                             axis=1).sum(axis=1)

    def _part(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scopes = (t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  if "scope64" in t.column_names else None)
        fps = t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order, starts, _ = segments(sk)
        sizes = np.diff(starts)
        out_u: list = []
        out_v: list = []
        # vectorized fast path for size-2 blocks (the common case): one
        # popcount + compare over every 2-bucket at once
        two = np.flatnonzero(sizes == 2)
        if len(two):
            i0, i1 = order[starts[two]], order[starts[two] + 1]
            a, b = nodes[i0], nodes[i1]
            keep = (_popcnt(fps[i0] ^ fps[i1]) <= maxham) & (a != b)
            if diff_scope:
                keep = (keep & (scopes[i0] != scopes[i1])) if scopes is not None \
                    else np.zeros(len(a), dtype=bool)
            out_u.append(np.minimum(a, b)[keep])
            out_v.append(np.maximum(a, b)[keep])
        for gi in np.flatnonzero(sizes >= 3):
            s, e = starts[gi], starts[gi + 1]
            idx = order[s:e]
            nd, f = nodes[idx], fps[idx]
            sc = scopes[idx] if scopes is not None else None
            o = np.argsort(nd, kind="stable")
            nd, f = nd[o], f[o]
            if sc is not None:
                sc = sc[o]
            n = len(nd)
            if n <= cap:
                iu, iv = np.triu_indices(n, k=1)
            else:  # multi-anchor star (skew guard robust to the inline
                   # Hamming verify; see _STAR_ANCHORS)
                iu, iv = _star_indices(n)
            ham = _popcnt(f[iu] ^ f[iv])
            keep = (ham <= maxham) & (nd[iu] != nd[iv])
            if diff_scope:
                keep = keep & (sc[iu] != sc[iv]) if sc is not None \
                    else np.zeros(len(keep), dtype=bool)
            out_u.append(nd[iu][keep])
            out_v.append(nd[iv][keep])
        return _pairs_table(out_u, out_v)

    # a verified pair repeats in up to hamming+1 pigeonhole blocks; dedupe
    # here (one cheap 16-B/row shuffle, overlapped with the other edge
    # stages) so the union-find never sees the duplicates — its local
    # path's driver-side sort scales with TOTAL edge count
    return dedupe_pairs(groupapply(rows, "skey", _part, P), P)


# ---------------------------------------------------------------------------
# winnowing substring pass
# ---------------------------------------------------------------------------

def substring_candidates(active: ray.data.Dataset, cfg: DedupConfig,
                         P: int, require_len_diff: bool = True) -> ray.data.Dataset:
    """Anchor rows → candidate containment pairs (shorter doc contained in
    longer).  Both docs must be >= min_substring chars (the contained text
    is the whole shorter doc; FIXTURES.md F1.1 'substring').

    ``require_len_diff=False`` (suffix-array shared-run mode): equal-length
    distinct docs CAN share a >= min_substring run, so the length filter
    is dropped and any shared anchor makes a candidate."""
    from .winnow import winnow  # local import keeps module load cheap

    g, w = cfg.winnow_gram, cfg.winnow_window
    min_sub = cfg.min_substring
    diff_scope = cfg.scope.startswith("diff_")
    same_scope = cfg.scope.startswith("same_")
    cap = cfg.pair_cap

    scoped = cfg.scope != "all"  # scope64 rides the shuffle only when used

    def _anchors(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_chars"], min_sub))
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scopes = t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ncs = t["n_chars"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        ks, ns, ss, ls, cs = [], [], [], [], []
        for i, txt in enumerate(texts):
            a = winnow(txt, g, w)
            if same_scope:
                with np.errstate(over="ignore"):
                    a = mix64(a ^ scopes[i])
            ks.append(a)
            ns.append(np.full(len(a), nodes[i], dtype=np.uint64))
            if scoped:
                ss.append(np.full(len(a), scopes[i], dtype=np.uint64))
            # u32 riders: doc length / anchor count never exceed 2^32
            # (a >4 GiB single document is out of contract); 8 fewer
            # bytes per anchor row in the stage's one big exchange
            ls.append(np.full(len(a), ncs[i], dtype=np.uint32))
            cs.append(np.full(len(a), len(a), dtype=np.uint32))
        if not ks:
            cols = {"skey": pa.array([], pa.uint64()),
                    "node": pa.array([], pa.uint64()),
                    "n_chars": pa.array([], pa.uint32()),
                    "n_anchors": pa.array([], pa.uint32())}
            if scoped:
                cols["scope64"] = pa.array([], pa.uint64())
            return pa.table(cols)
        cols = {"skey": np.concatenate(ks),
                "node": np.concatenate(ns),
                "n_chars": np.concatenate(ls),
                "n_anchors": np.concatenate(cs)}
        if scoped:
            cols["scope64"] = np.concatenate(ss)
        return pa.table(cols)

    rows = active.select_columns(["node", "scope64", "n_chars", "text"]) \
                 .map_batches(_anchors, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scopes = (t["scope64"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  if "scope64" in t.column_names else None)
        ncs = t["n_chars"].to_numpy(zero_copy_only=False)
        nas = t["n_anchors"].to_numpy(zero_copy_only=False)
        order, starts, _ = segments(sk)
        sizes = np.diff(starts)
        out_u: list = []
        out_v: list = []
        out_na: list = []
        # size-2 fast path (winnow() emits UNIQUE anchors per doc, so a
        # node appears at most once per anchor bucket): one vectorized
        # pass over all 2-buckets
        two = np.flatnonzero(sizes == 2)
        if len(two):
            i0, i1 = order[starts[two]], order[starts[two] + 1]
            a, b = nodes[i0], nodes[i1]
            keep = (a != b) & (ncs[i0] != ncs[i1]) if require_len_diff \
                else (a != b)
            if diff_scope:
                keep = keep & (scopes[i0] != scopes[i1]) \
                    if scopes is not None else np.zeros(len(a), dtype=bool)
            out_u.append(np.minimum(a, b)[keep])
            out_v.append(np.maximum(a, b)[keep])
            out_na.append(np.where(ncs[i0] <= ncs[i1],
                                   nas[i0], nas[i1])[keep])
        for gi in np.flatnonzero(sizes >= 3):
            s, e = starts[gi], starts[gi + 1]
            idx = order[s:e]
            nd = nodes[idx]
            uniq_i = np.unique(nd, return_index=True)[1]
            if len(uniq_i) < 2:
                continue
            nd = nd[uniq_i]
            sc = scopes[idx][uniq_i] if scopes is not None else None
            ln, na = ncs[idx][uniq_i], nas[idx][uniq_i]
            o = np.argsort(nd, kind="stable")
            nd, ln, na = nd[o], ln[o], na[o]
            if sc is not None:
                sc = sc[o]
            n = len(nd)
            if n <= cap:
                iu, iv = np.triu_indices(n, k=1)
            else:  # multi-anchor star (see _STAR_ANCHORS: the containment
                   # verify post-filters these edges)
                iu, iv = _star_indices(n)
            # containment needs strictly different lengths: equal texts are
            # the exact pass's finding, equal-length unequal texts can't nest
            keep = ln[iu] != ln[iv] if require_len_diff \
                else np.ones(len(iu), dtype=bool)
            if diff_scope:
                keep &= sc[iu] != sc[iv]
            out_u.append(nd[iu][keep])
            out_v.append(nd[iv][keep])
            # anchor count of the SHORTER side (containment denominator)
            small_na = np.where(ln[iu] <= ln[iv], na[iu], na[iv])
            out_na.append(small_na[keep])
        if not out_u:
            return pa.table({"u": pa.array([], pa.uint64()),
                             "v": pa.array([], pa.uint64()),
                             "na_small": pa.array([], pa.uint32())})
        return pa.table({"u": np.concatenate(out_u),
                         "v": np.concatenate(out_v),
                         "na_small": np.concatenate(out_na)})

    return groupapply(rows, "skey", _part, P)


# ---------------------------------------------------------------------------
# pair verification (reduce-side payload join; SURVEY.md §2.7 D3 verify)
# ---------------------------------------------------------------------------

def _candidate_nodes(pairs: ray.data.Dataset) -> np.ndarray:
    """Sorted distinct node ids appearing in any pair (driver-collected via
    raw block refs; 8 bytes/node — at true web scale swap for a
    distributed semi-join / bloom filter)."""
    parts = [np.array([], dtype=np.uint64)]
    for b in iter_blocks(pairs):
        if b.num_rows == 0 or "u" not in b.column_names:
            continue
        parts.append(b["u"].to_numpy(zero_copy_only=False).astype(np.uint64))
        parts.append(b["v"].to_numpy(zero_copy_only=False).astype(np.uint64))
    return np.unique(np.concatenate(parts))


def _pair_rows(pairs: ray.data.Dataset, pay_type: pa.DataType) -> ray.data.Dataset:
    """Explode each pair into two node-keyed rows (one per side)."""

    def _explode(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "skey": np.concatenate([u, v]),
            "u": np.concatenate([u, u]),
            "v": np.concatenate([v, v]),
            "pay": pa.nulls(2 * len(u), pay_type),
        })

    return pairs.map_batches(_explode, batch_format="pyarrow")


#: Above this many candidate-pair endpoints the payload semi-join switches
#: from the exact broadcast-filter path to the bloom path (see
#: attach_payloads).  Module-level so tests can force the other tiers.
ATTACH_BROADCAST_THRESHOLD = 20_000_000

#: Above this many endpoints even the bloom (~1.2 bytes/endpoint at 1%
#: fpp) is too large to broadcast; the unfiltered co-shuffle runs.
ATTACH_BLOOM_THRESHOLD = 1_000_000_000


def attach_payloads(pairs: ray.data.Dataset, payload: ray.data.Dataset,
                    payload_col: str, P: int) -> ray.data.Dataset:
    """Distributed reduce-side payload join, fully vectorized: one shuffle
    keyed by node attaches each side's payload, a second keyed by a pair
    hash co-locates both sides.  Output rows: (skey=pair-hash, u, v,
    side, pay); candidate payload volume scales with the PAIR count.

    Semi-join strategy, auto-selected by candidate count:
      * <= ATTACH_BROADCAST_THRESHOLD endpoints: the sorted candidate-node
        array (8 B/candidate) is broadcast once via ray.put and the
        corpus-sized payload table is pre-filtered map-side, so only
        O(pairs) payload bytes enter the shuffle;
      * <= ATTACH_BLOOM_THRESHOLD: the exact array no longer fits a
        broadcast, but a sharded bloom over the endpoints (~1.2
        bytes/endpoint at 1% fpp, dedup.bloom) does — map-side filter
        passes candidates plus ~1% false positives, which the reduce
        side drops anyway (``_attach`` emits only rows matching a pair
        side), so results are byte-identical;
      * above it: no driver-side structure at all — every payload row
        enters the node-keyed shuffle and non-candidates are dropped
        reduce-side.  One full payload shuffle, but streaming and
        spillable — never a driver or single-worker materialization."""
    pay_type = payload.schema().base_schema.field(payload_col).type
    pairs = pairs.materialize()
    n_end = 2 * pairs.count()

    if n_end <= ATTACH_BROADCAST_THRESHOLD:
        cand_ref = ray.put(_candidate_nodes(pairs))

        def _pay_rows(t: pa.Table) -> pa.Table:
            arr = ray.get(cand_ref)
            nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(arr, nd)
            pos[pos >= len(arr)] = 0
            t = t.filter(pa.array(arr[pos] == nd) if len(arr) else
                         pa.array(np.zeros(len(nd), dtype=bool)))
            return pa.table({
                "skey": t["node"],
                "u": pa.nulls(t.num_rows, pa.uint64()),
                "v": pa.nulls(t.num_rows, pa.uint64()),
                "pay": t[payload_col],
            })
    elif n_end <= ATTACH_BLOOM_THRESHOLD:
        from .bloom import build_bloom

        def _ends(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table({"node": pa.array(np.concatenate([u, v]),
                                              pa.uint64())})

        bloom_ref = ray.put(build_bloom(
            pairs.map_batches(_ends, batch_format="pyarrow"),
            "node", capacity=n_end, fpp=0.01))

        def _pay_rows(t: pa.Table) -> pa.Table:
            b = ray.get(bloom_ref)
            nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
            t = t.filter(pa.array(b.contains(nd)))
            return pa.table({
                "skey": t["node"],
                "u": pa.nulls(t.num_rows, pa.uint64()),
                "v": pa.nulls(t.num_rows, pa.uint64()),
                "pay": t[payload_col],
            })
    else:
        def _pay_rows(t: pa.Table) -> pa.Table:
            return pa.table({
                "skey": t["node"],
                "u": pa.nulls(t.num_rows, pa.uint64()),
                "v": pa.nulls(t.num_rows, pa.uint64()),
                "pay": t[payload_col],
            })

    side = payload.map_batches(_pay_rows, batch_format="pyarrow").union(
        _pair_rows(pairs, pay_type))

    def _attach(t: pa.Table) -> pa.Table:
        # NOTE: split payload/pair rows with arrow filters BEFORE any
        # to_numpy — converting a nullable uint64 column goes via float64
        # and silently rounds 64-bit node ids
        is_pay = pc.is_null(t["u"])
        pay_tab = t.filter(is_pay)
        pair_tab = t.filter(pc.invert(is_pay))
        pay_nodes = pay_tab["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        po = np.argsort(pay_nodes, kind="stable")
        pay_nodes = pay_nodes[po]
        pay_arr = pay_tab["pay"].combine_chunks().take(pa.array(po))
        sk = pair_tab["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(pay_nodes, sk)
        pos_c = np.clip(pos, 0, max(len(pay_nodes) - 1, 0))
        hit = (pay_nodes[pos_c] == sk) if len(pay_nodes) else \
            np.zeros(len(sk), dtype=bool)
        u = pair_tab["u"].to_numpy(zero_copy_only=False).astype(np.uint64)[hit]
        v = pair_tab["v"].to_numpy(zero_copy_only=False).astype(np.uint64)[hit]
        sk = sk[hit]
        pos_c = pos_c[hit]
        side_flag = (sk != u).astype(np.int8)
        with np.errstate(over="ignore"):
            pk = mix64(u) ^ mix64(~v)
        return pa.table({
            "skey": pa.array(pk, pa.uint64()),
            "u": pa.array(u, pa.uint64()),
            "v": pa.array(v, pa.uint64()),
            "side": pa.array(side_flag, pa.int8()),
            "pay": pay_arr.take(pa.array(pos_c)),
        })

    return groupapply(side, "skey", _attach, P)


def _paired_indices(t: pa.Table):
    """Within an attach-output partition: indices (i0, i1) of side-0/side-1
    rows of each complete pair (sorted by (u, v, side); pairkey collisions
    are resolved by the real (u, v))."""
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    side = t["side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, v, u))
    us, vs, ss = u[order], v[order], side[order]
    n = len(us)
    if n < 2:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    first = (us[:-1] == us[1:]) & (vs[:-1] == vs[1:]) & (ss[:-1] == 0) & (ss[1:] == 1)
    i0 = order[:-1][first]
    i1 = order[1:][first]
    return i0, i1


#: Candidate-payload bytes under which verification broadcasts the
#: filtered payload once (ray.put) and judges pairs in a single map
#: pass — no payload ever enters a shuffle.  Above it, the reduce-side
#: attach_payloads path runs (scales with the corpus; payload volume
#: through the shuffle is O(pairs)).  The broadcast object is
#: NUMPY-ONLY (_PayStore): Ray deserializes numpy buffers as read-only
#: ZERO-COPY views over the node's plasma copy, so the bound is
#: per-NODE object-store budget, NOT per-worker heap.  (The r3 1M-doc
#: substring probe OOMed under the earlier pyarrow-array broadcast —
#: arrow deserialization copies into each worker's heap — which is why
#: this was briefly 256 MB; the numpy store removes the per-worker
#: copy, and the per-TASK judge working set is bounded separately by
#: the judge batch size.)
VERIFY_BROADCAST_BYTES = 2 << 30

#: Target ATTACHED-PAYLOAD BYTES per verify partition.  The judge
#: working set is a constant multiple of its partition's text bytes
#: (the suffix-table judge peaks at ~70-100 bytes of numpy arrays per
#: text byte: two rolling-hash chains, the combined key, lexsort
#: indices), so the attach/judge shuffle is re-partitioned to keep
#: per-partition payload near this target — 8 MB of text ≈ ≤1 GB of
#: working set per task, which 32 concurrent tasks survive on a
#: 128 GB node (the r3 1M-doc substring probe OOMed the host at the
#: previous 10k-PAIRS-per-partition bound: ~40 MB text → ~4 GB/task).
#: Output is partition-count-independent (per-pair verdicts), so this
#: only moves work, never answers.
VERIFY_PART_BYTES = 8 << 20

#: Fallback pairs-per-partition bound for the attach paths where the
#: filtered payload table (and hence its measured byte size) is never
#: materialized (candidate sets above the broadcast threshold).
VERIFY_PAIRS_PER_PART = 2_000


def _verify_parts(P: int, n_pairs: int, small=None) -> int:
    """Partition count for the attach/judge shuffle: bound
    per-partition attached-payload BYTES using the measured filtered
    payload (``small``, materialized) when available; else the
    conservative pair-count fallback."""
    if small is not None:
        n = small.count()
        if n:
            total = 2.0 * n_pairs * (small.size_bytes() / n)
            return max(P, 1 + int(total // VERIFY_PART_BYTES))
    return max(P, 1 + n_pairs // VERIFY_PAIRS_PER_PART)

#: Extra broadcast gate for the suffix-table judge: above this many
#: candidate pairs the per-batch table rebuilds dominate even when the
#: payload bytes fit, so go reduce-side.
SA_BROADCAST_PAIRS = 200_000


def _filtered_payload(pairs: ray.data.Dataset, payload: ray.data.Dataset,
                      payload_col: str) -> tuple:
    """(cand_sorted, small_materialized): payload rows restricted to the
    pair endpoints (map-side filter against the broadcast sorted
    candidate array)."""
    cand = _candidate_nodes(pairs)
    cand_ref = ray.put(cand)

    def _f(t: pa.Table) -> pa.Table:
        arr = ray.get(cand_ref)
        nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(arr, nd)
        pos[pos >= len(arr)] = 0
        m = (arr[pos] == nd) if len(arr) else np.zeros(len(nd), dtype=bool)
        t = t.filter(pa.array(m))
        t = t.filter(pc.invert(pc.is_null(t[payload_col])))
        return t.select(["node", payload_col])

    return cand, payload.map_batches(_f, batch_format="pyarrow").materialize()


class _PayStore(NamedTuple):
    """Filtered candidate payloads as a numpy-only broadcast object.

    Every field is a numpy array (plus one bool), so ``ray.put`` stores
    plasma buffers that map-task ``ray.get`` calls read ZERO-COPY — one
    copy per node, never per worker.  (A pyarrow array or Python list
    here deserializes into each worker's heap; at 1.5M-doc scale that
    per-worker copy is what OOMed the r3 substring probe.)

    ``nodes`` is sorted for searchsorted lookups; ``rows[rank]`` maps a
    rank in ``nodes`` to its row in the (unsorted) values store."""
    nodes: np.ndarray    # uint64, sorted
    rows: np.ndarray     # int64: rank -> row in offsets/values order
    values: np.ndarray   # uint8, concatenated payload bytes
    offsets: np.ndarray  # int64, n+1
    is_str: bool

    def get(self, rank: int):
        """Payload bytes (decoded to str for string payloads) at a rank
        in the sorted node order.  Upstream (_filtered_payload) drops
        null payloads; an empty slice decodes to ''/b''."""
        r = int(self.rows[rank])
        b = self.values[self.offsets[r]:self.offsets[r + 1]].tobytes()
        return b.decode("utf-8") if self.is_str else b


def _collect_payload(small: ray.data.Dataset, payload_col: str) -> _PayStore:
    """Driver-assemble the (bounded) filtered payload as a _PayStore."""
    nodes_l = [np.array([], dtype=np.uint64)]
    val_l: list = []
    len_l: list = []
    is_str = False
    for b in iter_blocks(small):
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        nodes_l.append(b["node"].to_numpy(zero_copy_only=False).astype(np.uint64))
        col = b[payload_col].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            is_str = True
            col = col.cast(pa.large_string())
        col = col.cast(pa.large_binary())
        off = np.frombuffer(col.buffers()[1], dtype=np.int64,
                            count=len(col) + 1, offset=col.offset * 8)
        data = (np.frombuffer(col.buffers()[2], dtype=np.uint8)
                if col.buffers()[2] is not None
                else np.zeros(0, dtype=np.uint8))
        val_l.append(data[off[0]:off[-1]])
        len_l.append(np.diff(off))
    nodes = np.concatenate(nodes_l)
    lens = (np.concatenate(len_l) if len_l
            else np.zeros(0, dtype=np.int64))
    values = (np.ascontiguousarray(np.concatenate(val_l)) if val_l
              else np.zeros(0, dtype=np.uint8))
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    order = np.argsort(nodes, kind="stable")
    return _PayStore(nodes[order], order.astype(np.int64), values, offsets,
                     is_str)


def _sig_matrix(pays: pa.Array, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint64 matrix from a binary signature column
    (zero-copy when fixed-width)."""
    n = len(pays)
    if n == 0:
        return np.zeros((0, num_perm), dtype=np.uint64)
    offs = np.frombuffer(pays.buffers()[1], dtype=np.int32,
                         count=n + 1, offset=pays.offset * 4)
    widths = np.diff(offs)
    if (widths == num_perm * 8).all():
        vals = np.frombuffer(pays.buffers()[2], dtype="<u8")
        return vals[offs[0] // 8: offs[-1] // 8].reshape(n, num_perm)
    return np.frombuffer(b"".join(pays.to_pylist()),
                         dtype="<u8").reshape(n, num_perm)


def verify_minhash_pairs(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                         num_perm: int, threshold: float,
                         P: int) -> ray.data.Dataset:
    """Signature-agreement verification; the per-pair judge is one
    row-wise equality mean over (n_pairs, P) uint64 matrices.

    Strategy auto-selected by candidate volume: small candidate sets
    broadcast the filtered signature matrix once and judge in a single
    map pass over the pairs (no payload shuffle at all); large sets use
    the reduce-side attach (payload volume through the shuffle stays
    O(pairs), never the corpus)."""
    pairs = pairs.materialize()
    if 2 * pairs.count() <= ATTACH_BROADCAST_THRESHOLD:
        cand, small = _filtered_payload(pairs, sigs, "minhash")
        if len(cand) * (num_perm * 8 + 8) <= VERIFY_BROADCAST_BYTES:
            store = _collect_payload(small, "minhash")
            n_c = len(store.nodes)
            w = np.diff(store.offsets)
            if n_c and store.values.size == n_c * num_perm * 8 and \
                    (w == num_perm * 8).all():
                # zero-copy u64 view, then one driver-side gather into
                # sorted-node order so the judge stays a plain matrix
                mat = store.values.view("<u8").reshape(n_c, num_perm)[
                    store.rows]
            elif n_c:  # ragged layout (never produced by the signer)
                mat = np.frombuffer(
                    b"".join(store.get(i) for i in range(n_c)),
                    dtype="<u8").reshape(n_c, num_perm)
            else:
                mat = np.zeros((0, num_perm), dtype="<u8")
            ref = ray.put((store.nodes, mat))

            def _judge_bcast(t: pa.Table) -> pa.Table:
                nd, m = ray.get(ref)
                u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
                v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
                pu = np.searchsorted(nd, u)
                pv = np.searchsorted(nd, v)
                pu_c = np.clip(pu, 0, max(len(nd) - 1, 0))
                pv_c = np.clip(pv, 0, max(len(nd) - 1, 0))
                ok = ((nd[pu_c] == u) & (nd[pv_c] == v)) if len(nd) else \
                    np.zeros(len(u), dtype=bool)
                keep = np.zeros(len(u), dtype=bool)
                if ok.any():
                    agree = (m[pu_c[ok]] == m[pv_c[ok]]).mean(axis=1)
                    keep[np.flatnonzero(ok)] = agree >= threshold
                return pa.table({"u": u[keep], "v": v[keep]},
                                schema=_PAIR_SCHEMA)

            return pairs.map_batches(_judge_bcast, batch_format="pyarrow")
        sigs = small  # pre-filtered: only candidate payload enters the shuffle
    attached = attach_payloads(pairs, sigs, "minhash", P)

    def _judge(t: pa.Table) -> pa.Table:
        i0, i1 = _paired_indices(t)
        if len(i0) == 0:
            return _EMPTY_PAIRS
        # zero-copy: every signature is num_perm*8 bytes, so the binary
        # column's value buffer IS an (n, num_perm) uint64 matrix
        pays = t["pay"].combine_chunks()
        offs = np.frombuffer(pays.buffers()[1], dtype=np.int32,
                             count=len(pays) + 1, offset=pays.offset * 4)
        widths = np.diff(offs)
        if len(widths) and (widths == num_perm * 8).all():
            vals = np.frombuffer(pays.buffers()[2], dtype="<u8")
            mat = vals[offs[0] // 8: offs[-1] // 8].reshape(len(pays), num_perm)
            m0, m1 = mat[i0], mat[i1]
        else:  # ragged/odd layout fallback
            m0 = np.frombuffer(b"".join(pays.take(pa.array(i0)).to_pylist()),
                               dtype="<u8").reshape(len(i0), num_perm)
            m1 = np.frombuffer(b"".join(pays.take(pa.array(i1)).to_pylist()),
                               dtype="<u8").reshape(len(i1), num_perm)
        agree = (m0 == m1).mean(axis=1)
        keep = agree >= threshold
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"u": u[i0][keep], "v": v[i0][keep]},
                        schema=_PAIR_SCHEMA)

    return groupapply(attached, "skey", _judge, P)


def verify_pairs(pairs: ray.data.Dataset, payload: ray.data.Dataset,
                 payload_col: str, verdict, P: int) -> ray.data.Dataset:
    """Generic pairwise verification with an arbitrary ``verdict(a, b)``
    (used by the substring pass: exact containment; by the n-gram
    Jaccard mode: exact shingle Jaccard).  Only the final per-pair
    verdict is a Python call, over the (small, deduplicated) candidate
    pair set.

    Same auto-selected strategy as verify_minhash_pairs: candidate
    payloads that fit VERIFY_BROADCAST_BYTES are broadcast once and
    judged in a single map pass; larger sets go through the reduce-side
    attach shuffle."""
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if 2 * n_pairs <= ATTACH_BROADCAST_THRESHOLD:
        cand, small = _filtered_payload(pairs, payload, payload_col)
        if small.size_bytes() <= VERIFY_BROADCAST_BYTES:
            ref = ray.put(_collect_payload(small, payload_col))

            def _judge_bcast(t: pa.Table) -> pa.Table:
                st = ray.get(ref)  # zero-copy numpy views over plasma
                nd = st.nodes
                u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
                v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
                pu = np.clip(np.searchsorted(nd, u), 0, max(len(nd) - 1, 0))
                pv = np.clip(np.searchsorted(nd, v), 0, max(len(nd) - 1, 0))
                ok = ((nd[pu] == u) & (nd[pv] == v)) if len(nd) else \
                    np.zeros(len(u), dtype=bool)
                keep = np.zeros(len(u), dtype=bool)
                for j in np.flatnonzero(ok):
                    if verdict(st.get(int(pu[j])), st.get(int(pv[j]))):
                        keep[j] = True
                return pa.table({"u": u[keep], "v": v[keep]},
                                schema=_PAIR_SCHEMA)

            return pairs.map_batches(_judge_bcast, batch_format="pyarrow")
        payload = small  # pre-filtered for the shuffle path
        P = _verify_parts(P, n_pairs, small)
    else:
        P = _verify_parts(P, n_pairs)
    attached = attach_payloads(pairs, payload, payload_col, P)

    def _judge(t: pa.Table) -> pa.Table:
        i0, i1 = _paired_indices(t)
        if len(i0) == 0:
            return _EMPTY_PAIRS
        pays = t["pay"]
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = np.zeros(len(i0), dtype=bool)
        for j in range(len(i0)):
            a = pays[int(i0[j])].as_py()
            b = pays[int(i1[j])].as_py()
            if a is not None and b is not None and verdict(a, b):
                keep[j] = True
        return pa.table({"u": u[i0][keep], "v": v[i0][keep]},
                        schema=_PAIR_SCHEMA)

    return groupapply(attached, "skey", _judge, P)


def verify_pairs_shared_run(pairs: ray.data.Dataset, payload: ray.data.Dataset,
                            payload_col: str, min_len: int,
                            P: int) -> ray.data.Dataset:
    """Suffix-table verification of shared-run candidates: per
    partition/batch, ONE prefix-doubling rank table is built over the
    distinct endpoint texts and every candidate pair is judged against
    its exact shared->=min_len-byte-run pair set (dedup.suffix) — the
    north-star's per-partition sorted suffix tables.  Unlike the
    per-pair verdict of verify_pairs, the table amortizes over all
    pairs touching the partition's docs, and the decision is exact (no
    probabilistic step survives into the output).

    Same auto-selected payload strategy as verify_pairs: broadcast the
    filtered candidate texts when they fit; reduce-side attach above."""
    from .suffix import shared_run_pairs

    def _sa_keep(nodes: np.ndarray, texts: list, u: np.ndarray,
                 v: np.ndarray, sel: np.ndarray) -> np.ndarray:
        """keep mask over the candidate arrays: pair in the exact
        shared-run set of this doc group (sel = judgeable rows)."""
        bts = [(s or "").encode("utf-8") for s in texts]
        su, sv = shared_run_pairs(nodes, bts, min_len)
        keep = np.zeros(len(u), dtype=bool)
        if len(su):
            pairset = set(zip(su.tolist(), sv.tolist()))
            for j in np.flatnonzero(sel):
                if (int(u[j]), int(v[j])) in pairset:
                    keep[j] = True
        return keep

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if 2 * n_pairs <= ATTACH_BROADCAST_THRESHOLD:
        cand, small = _filtered_payload(pairs, payload, payload_col)
        if n_pairs <= SA_BROADCAST_PAIRS and \
                small.size_bytes() <= VERIFY_BROADCAST_BYTES:
            ref = ray.put(_collect_payload(small, payload_col))

            def _judge_bcast(t: pa.Table) -> pa.Table:
                st = ray.get(ref)  # zero-copy numpy views over plasma
                nd = st.nodes
                u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
                v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
                pu = np.clip(np.searchsorted(nd, u), 0, max(len(nd) - 1, 0))
                pv = np.clip(np.searchsorted(nd, v), 0, max(len(nd) - 1, 0))
                ok = ((nd[pu] == u) & (nd[pv] == v)) if len(nd) else \
                    np.zeros(len(u), dtype=bool)
                if not ok.any():
                    return _EMPTY_PAIRS
                idx = np.unique(np.concatenate([pu[ok], pv[ok]]))
                texts = [st.get(int(i)) for i in idx]
                keep = _sa_keep(nd[idx], texts, u, v, ok)
                return pa.table({"u": u[keep], "v": v[keep]},
                                schema=_PAIR_SCHEMA)

            return pairs.map_batches(_judge_bcast, batch_format="pyarrow")
        payload = small  # pre-filtered for the shuffle path
        # bytes-aware verify partitioning: per-partition text volume
        # (and the per-task suffix-table working set) stays bounded no
        # matter how large the candidate set grows
        P = _verify_parts(P, n_pairs, small)
    else:
        P = _verify_parts(P, n_pairs)
    attached = attach_payloads(pairs, payload, payload_col, P)

    def _judge(t: pa.Table) -> pa.Table:
        i0, i1 = _paired_indices(t)
        if len(i0) == 0:
            return _EMPTY_PAIRS
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pays = t["pay"]
        nds = np.concatenate([u[i0], v[i0]])
        rows = np.concatenate([i0, i1])
        uniq, first = np.unique(nds, return_index=True)
        texts = [pays[int(rows[f])].as_py() for f in first]
        keep = _sa_keep(uniq, texts, u[i0], v[i0],
                        np.ones(len(i0), dtype=bool))
        return pa.table({"u": u[i0][keep], "v": v[i0][keep]},
                        schema=_PAIR_SCHEMA)

    return groupapply(attached, "skey", _judge, P)


# ---------------------------------------------------------------------------
# edge stages assembled
# ---------------------------------------------------------------------------

def minhash_edges(active: ray.data.Dataset, cfg: DedupConfig,
                  P: int) -> ray.data.Dataset:
    """shingle → MinHash actor pool → LSH bands → candidate pairs →
    signature-agreement verify (SURVEY.md §7.2 step 5)."""
    def _sign(t: pa.Table) -> pa.Table:
        from .minhash import cached_signer
        return cached_signer(cfg.num_perm, cfg.shingle_k, cfg.seed)(t)

    sigs = active.select_columns(["node", "scope64", "text"]).map_batches(
        _sign, batch_format="pyarrow",
    ).select_columns(["node", "scope64", "minhash"]).materialize()
    hot: np.ndarray | None = None
    salted = cfg.lsh_salt > 0
    if salted and cfg.lsh_hot_min > 0:
        # adaptive mode: find globally hot bands first (content-only
        # sampled count — deterministic across parallelism); a corpus
        # with none skips the salt machinery entirely.  A corpus with
        # fewer docs than lsh_hot_min cannot contain a hot bucket at
        # all, so the detect pass is skipped outright (sigs is
        # materialized — count() is metadata-only).
        if sigs.count() >= cfg.lsh_hot_min:
            hot = detect_hot_band_keys(sigs, cfg, P)
            salted = hot.size > 0
        else:
            hot = np.zeros(0, dtype=np.uint64)
            salted = False
    rows = lsh_band_rows(sigs, cfg, hot=hot)
    if salted:
        # one shuffle produces both in-bucket pairs and per-bucket reps
        # (materialized once — two consumers must not re-run the shuffle)
        mixed = _salted_pairs_and_reps(rows, cfg, P).materialize()

        def _only_pairs(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(pc.is_null(t["v"])))
            return pa.table({"u": t["u"].cast(pa.uint64()),
                             "v": t["v"].cast(pa.uint64())},
                            schema=_PAIR_SCHEMA)

        def _only_reps(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(pc.is_null(t["rkey"])))
            return pa.table({"skey": t["rkey"].cast(pa.uint64()),
                             "node": t["u"].cast(pa.uint64()),
                             "scope64": t["rscope"].cast(pa.uint64())})

        pairs = mixed.map_batches(_only_pairs, batch_format="pyarrow")
        reps = mixed.map_batches(_only_reps, batch_format="pyarrow")
        # cross-salt pairs: reps of each salt group meet under the
        # unsalted key; their pairs are verified like any others
        pairs = pairs.union(bucket_pairs(reps, cfg, P))
    else:
        pairs = bucket_pairs(rows, cfg, P)
    if cfg.verify == "none":
        return pairs
    # dedupe cross-band repeats BEFORE verification (a true pair surfaces
    # in most of the b bands)
    pairs = dedupe_pairs(pairs, P)
    if cfg.verify == "jaccard":
        # exact n-gram Jaccard over the candidate texts (the n-gram
        # Jaccard dedup operator): candidates from LSH, verdict exact
        from .minhash import jaccard as _jac
        k = cfg.shingle_k
        thr = cfg.verify_threshold

        def _verdict(ta: str, tb: str) -> bool:
            return _jac(ta, tb, k) >= thr

        payload = active.select_columns(["node", "text"])
        return verify_pairs(pairs, payload, "text", _verdict, P)
    return verify_minhash_pairs(pairs, sigs, cfg.num_perm,
                                cfg.verify_threshold, P)


def substring_edges_sa(active: ray.data.Dataset, cfg: DedupConfig,
                       P: int) -> ray.data.Dataset:
    """North-star suffix-array substring stage: winnow anchors
    co-partition every pair sharing a >= min_substring run (guaranteed
    at g + w - 1 <= min_substring), ANY shared anchor makes a candidate
    (no containment ratio prefilter — a single shared run shares only
    the few anchors inside it), and per-partition sorted suffix tables
    decide membership exactly (verify_pairs_shared_run).  Semantics:
    docs sharing ANY verbatim >= min_substring-byte run — a superset of
    the winnow mode's shorter-in-longer containment."""
    cands = substring_candidates(active, cfg, P, require_len_diff=False)
    pairs = dedupe_pairs(cands, P)
    payload = active.select_columns(["node", "text"])
    return verify_pairs_shared_run(pairs, payload, "text",
                                   cfg.min_substring, P)


def substring_edges(active: ray.data.Dataset, cfg: DedupConfig,
                    P: int) -> ray.data.Dataset:
    """winnow anchors → candidates → exact containment verify
    (`shorter in longer`, both >= min_substring chars); or the
    suffix-array shared-run stage under substring_mode='suffix_array'."""
    if cfg.substring_mode == "suffix_array":
        return substring_edges_sa(active, cfg, P)
    # count-aware dedupe: a candidate pair appears once per shared anchor,
    # so the duplicate count IS the shared-anchor count.  True containment
    # shares ~all of the shorter doc's anchors (winnowing is content-
    # defined), while near-dup noise shares fewer — requiring
    # count >= 0.9 * n_anchors(shorter) kills most false candidates BEFORE
    # the expensive text-verify shuffle without touching recall.
    cands = substring_candidates(active, cfg, P)

    def _ratio_dedupe(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        na = t["na_small"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        uv = np.stack([lo, hi], axis=1)
        uniq, inv, cnt = np.unique(uv, axis=0, return_inverse=True,
                                   return_counts=True)
        na_u = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(na_u, inv, na)
        keep = cnt >= np.maximum(1, (0.9 * na_u).astype(np.int64))
        return pa.table({"u": uniq[keep, 0], "v": uniq[keep, 1]},
                        schema=_PAIR_SCHEMA)

    def _pk(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = mix64(np.minimum(u, v)) ^ mix64(~np.maximum(u, v))
        return t.append_column("skey", pa.array(k, pa.uint64()))

    pairs = groupapply(cands.map_batches(_pk, batch_format="pyarrow"),
                       "skey", _ratio_dedupe, P)
    payload = active.select_columns(["node", "text"])

    def _verdict(ta: str, tb: str) -> bool:
        if ta is None or tb is None:
            return False
        small, big = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
        return len(small) >= cfg.min_substring and small in big

    return verify_pairs(pairs, payload, "text", _verdict, P)


# ---------------------------------------------------------------------------
# assignment (D2: keep = order-minimum member, delete = rest, unique = unmatched)
# ---------------------------------------------------------------------------

def _attach_broadcast(prep: ray.data.Dataset,
                      labels: ray.data.Dataset) -> ray.data.Dataset:
    """Small-label path: collect the label table once, ``ray.put`` the
    sorted (node, comp) arrays, and join them into the corpus with one
    vectorized map_batches — no corpus-wide shuffle."""
    lab_nodes: list[np.ndarray] = [np.array([], dtype=np.uint64)]
    lab_comps: list[np.ndarray] = [np.array([], dtype=np.uint64)]
    for b in iter_blocks(labels):
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        lab_nodes.append(b["node"].to_numpy(zero_copy_only=False).astype(np.uint64))
        lab_comps.append(b["comp"].to_numpy(zero_copy_only=False).astype(np.uint64))
    nodes_arr = np.concatenate(lab_nodes)
    comps_arr = np.concatenate(lab_comps)
    o = np.argsort(nodes_arr)
    nodes_arr, comps_arr = nodes_arr[o], comps_arr[o]
    lab_ref = ray.put((nodes_arr, comps_arr))

    def _attach(t: pa.Table) -> pa.Table:
        la, lc = ray.get(lab_ref)
        nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(la, nd)
        pos_c = np.clip(pos, 0, max(len(la) - 1, 0))
        hit = (la[pos_c] == nd) if len(la) else np.zeros(len(nd), dtype=bool)
        ok = pc.equal(t["state0"], "ok").to_numpy(zero_copy_only=False)
        clustered = hit & ok
        comp = np.where(clustered, lc[pos_c] if len(lc) else 0, 0)
        state = np.where(ok, "unique", t["state0"].to_numpy(zero_copy_only=False))
        return pa.table({
            "id": t["id"],
            "krank": t["krank"],
            "order_key": t["order_key"],
            "state": pa.array(state.tolist(), pa.string()),
            "skey": pa.array(comp, pa.uint64()),
            "clustered": pa.array(clustered),
        })

    return prep.map_batches(_attach, batch_format="pyarrow")


def _attach_reduce(prep: ray.data.Dataset, labels: ray.data.Dataset,
                   id_type: pa.DataType, P: int) -> ray.data.Dataset:
    """Large-label path: reduce-side join of docs ↔ labels on node (one
    hash shuffle, O(corpus + labels) rows; no driver materialization).
    Same output schema as the broadcast path, byte-identical rows."""

    def _doc_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "skey": t["node"],
            "id": t["id"],
            "krank": t["krank"],
            "order_key": t["order_key"],
            "state0": t["state0"],
            "comp": pa.nulls(t.num_rows, pa.uint64()),
        })

    def _lab_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "skey": t["node"],
            "id": pa.nulls(t.num_rows, id_type),
            "krank": pa.nulls(t.num_rows, pa.int64()),
            "order_key": pa.nulls(t.num_rows, pa.binary()),
            "state0": pa.nulls(t.num_rows, pa.string()),
            "comp": t["comp"],
        })

    docs = prep.select_columns(["node", "id", "krank", "order_key",
                                "state0"])
    side = docs.map_batches(_doc_rows, batch_format="pyarrow").union(
        labels.map_batches(_lab_rows, batch_format="pyarrow"))

    def _join(t: pa.Table) -> pa.Table:
        # arrow-filter the label/doc split BEFORE to_numpy: converting a
        # nullable uint64 column goes via float64 and rounds node ids
        is_lab = pc.invert(pc.is_null(t["comp"]))
        lab = t.filter(is_lab)
        doc = t.filter(pc.invert(is_lab))
        ln = lab["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lc = lab["comp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        o = np.argsort(ln)
        ln, lc = ln[o], lc[o]
        dn = doc["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(ln, dn)
        pos_c = np.clip(pos, 0, max(len(ln) - 1, 0))
        hit = (ln[pos_c] == dn) if len(ln) else np.zeros(len(dn), dtype=bool)
        ok = pc.equal(doc["state0"], "ok").to_numpy(zero_copy_only=False)
        clustered = hit & ok
        comp = np.where(clustered, lc[pos_c] if len(lc) else 0, 0)
        state = np.where(ok, "unique",
                         doc["state0"].to_numpy(zero_copy_only=False))
        return pa.table({
            "id": doc["id"],
            "krank": doc["krank"],
            "order_key": doc["order_key"],
            "state": pa.array(state.tolist(), pa.string()),
            "skey": pa.array(comp, pa.uint64()),
            "clustered": pa.array(clustered),
        })

    return groupapply(side, "skey", _join, P)


def assign_states(prep: ray.data.Dataset, labels: ray.data.Dataset,
                  cfg: DedupConfig, P: int,
                  broadcast_threshold: int = 20_000_000) -> ray.data.Dataset:
    """labels (node, comp) + prepared docs → assignments table
    (id_col, state, cluster_id, cluster_size).

    cluster_id = the keeper's original id.  The keeper is the cluster
    minimum under (krank, order_key): with the default keeper='first'
    krank is all-zero and this is exactly the reference's greedy-scan
    representative (first record in the deterministic global order that
    probed a non-empty candidate set, MainViewModel.cs:1227-1234 — equal
    to the order-minimum member for symmetric predicates, SURVEY.md
    §0.1); the tier-dedup policies (longest/newest/oldest/priority)
    prefer the best-ranked member and tie-break to the same global
    order, so assignments stay deterministic at any parallelism.
    Sentinel for non-clustered rows: -1 (int ids) / "" (string ids).

    The label table holds only MATCHED nodes (O(dups), not O(corpus)); up
    to ``broadcast_threshold`` labels it is broadcast once via ray.put and
    joined into the corpus with a single vectorized map_batches.  Above
    the threshold the reduce-side join runs instead (one hash shuffle on
    node; nothing ever lands on the driver), so the path scales to
    billions of labels.  Both paths produce byte-identical assignments.
    The per-cluster keeper selection then shuffles only the clustered
    rows (again O(dups))."""
    docs = prep.select_columns(["node", "id", "krank", "order_key",
                                "state0"])
    id_type = docs.schema().base_schema.field("id").type
    string_ids = pa.types.is_string(id_type) or pa.types.is_large_string(id_type)
    sentinel = "" if string_ids else -1

    labels = labels.materialize()
    if labels.count() <= broadcast_threshold:
        attached = _attach_broadcast(prep, labels)
    else:
        attached = _attach_reduce(prep, labels, id_type, P)
    attached = attached.materialize()

    def _final_nonclustered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t["clustered"]))
        size = pc.if_else(pc.equal(t["state"], "unique"),
                          pa.scalar(1, pa.int64()), pa.scalar(0, pa.int64()))
        n = t.num_rows
        cid = pa.array([sentinel] * n, id_type)
        return pa.table({"id": t["id"], "state": t["state"],
                         "cluster_id": cid, "cluster_size": size})

    def _clustered(t: pa.Table) -> pa.Table:
        t = t.filter(t["clustered"])
        return pa.table({"skey": t["skey"], "id": t["id"],
                         "krank": t["krank"],
                         "order_key": t["order_key"]})

    nonclustered = attached.map_batches(_final_nonclustered,
                                        batch_format="pyarrow")
    clustered = attached.map_batches(_clustered, batch_format="pyarrow")

    def _assign(t: pa.Table) -> pa.Table:
        # fully vectorized keeper selection: one arrow multi-key sort by
        # (cluster, krank, order_key) — binary order_key compares
        # lexicographically, identical to the min-by-bytes reduce — then
        # segment firsts are the keepers and np.repeat broadcasts
        # (cluster_id, size) to members
        idx = pc.sort_indices(t, sort_keys=[("skey", "ascending"),
                                            ("krank", "ascending"),
                                            ("order_key", "ascending")])
        t2 = t.take(idx)
        sk = t2["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sk)
        if n == 0:
            return pa.table({"id": pa.array([], id_type),
                             "state": pa.array([], pa.string()),
                             "cluster_id": pa.array([], id_type),
                             "cluster_size": pa.array([], pa.int64())})
        brk = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        starts = np.concatenate([[0], brk]).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [n]]))
        rep_rows = np.repeat(starts, sizes)
        state = np.full(n, "delete", dtype=object)
        state[starts] = "keep"
        ids2 = t2["id"].combine_chunks()
        return pa.table({"id": ids2,
                         "state": pa.array(state.tolist(), pa.string()),
                         "cluster_id": ids2.take(pa.array(rep_rows)),
                         "cluster_size": pa.array(np.repeat(sizes, sizes),
                                                  pa.int64())})

    assigned = groupapply(clustered, "skey", _assign, P)
    out = nonclustered.union(assigned)

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([cfg.id_col, "state", "cluster_id",
                                 "cluster_size"])

    return out.map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top-level pipelines
# ---------------------------------------------------------------------------

def run_dedup(ds: ray.data.Dataset, cfg: DedupConfig,
              check_html: bool = True,
              num_partitions: int | None = None,
              broadcast_threshold: int = 20_000_000,
              uf_local_threshold: int = 20_000_000) -> ray.data.Dataset:
    """Full dedup: exact [+ MinHash/LSH] [+ SimHash] [+ substring] edges →
    distributed union-find → keep/delete/unique/ignored/error assignment.

    Returns the assignments table (cfg.id_col, state, cluster_id,
    cluster_size), deterministic at any parallelism."""
    from .dist import tune_context
    tune_context()
    runner = None
    if cfg.checkpoint_dir:
        from .checkpoint import Runner, input_identity
        key = cfg.fingerprint()
        iid = input_identity(ds)
        if iid:
            key = f"{key}-{iid}"
        planned = ["prepare"]
        planned += [f"edges_{m}" for m, on in
                    (("exact", cfg.exact), ("minhash", cfg.near),
                     ("simhash", cfg.simhash),
                     ("substring", cfg.substring)) if on]
        planned += ["labels", "assignments"]
        runner = Runner(cfg.checkpoint_dir, key,
                        planned_stages=tuple(planned))

    def ck(name, fn, inputs=()):
        """Checkpoint a stage when a checkpoint dir is configured, else
        just materialize it."""
        if runner is not None:
            return runner.stage(name, fn, inputs)
        return fn().materialize()

    # the raw text column is carried through the materialized prepare
    # stage ONLY when an enabled tier consumes it (near/simhash/substring
    # signing or byte-verify payloads); for exact-only configs the
    # 16-byte hashes are the working set and the corpus text never
    # resides in the object store (VERDICT r3 #1)
    needs_text = bool(cfg.near or cfg.simhash or cfg.substring
                      or cfg.byte_verify)
    prep = ck("prepare", lambda: prepare(ds, cfg, check_html=check_html,
                                         keep_text=needs_text))
    P = num_partitions or _auto_partitions(cfg, prep.size_bytes())
    # active is derived LAZILY from the materialized prep — the ok-filter
    # re-runs per consuming edge stage (a cheap vectorized scan over
    # already-materialized blocks) instead of materializing a second
    # near-full corpus copy
    active = _ok_only(prep)

    # the four edge stages are independent — materialize them concurrently
    # so the streaming executor can interleave their tasks instead of the
    # driver serializing stage startup
    stage_fns = []
    if cfg.exact:
        stage_fns.append(("edges_exact",
                          lambda: exact_edges(active, cfg, P)))
    if cfg.near:
        stage_fns.append(("edges_minhash",
                          lambda: minhash_edges(active, cfg, P)))
    if cfg.simhash:
        stage_fns.append(("edges_simhash",
                          lambda: simhash_edges(active, cfg, P)))
    if cfg.substring:
        stage_fns.append(("edges_substring",
                          lambda: substring_edges(active, cfg, P)))

    if stage_fns:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=len(stage_fns)) as ex:
            edge_sets = [f.result() for f in
                         [ex.submit(ck, name, fn, ("prepare",))
                           for name, fn in stage_fns]]
        edges = edge_sets[0]
        if len(edge_sets) > 1:
            edges = edges.union(*edge_sets[1:])
        # no dedupe shuffle here: both union-find paths tolerate duplicate
        # edges natively (the local path is vectorized relaxation, the
        # distributed rounds dedupe per partition each round)
        labels = ck("labels",
                    lambda: union_find(edges, P,
                                       local_threshold=uf_local_threshold),
                    tuple(n for n, _ in stage_fns))
    else:
        labels = ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.uint64()),
            "comp": pa.array([], pa.uint64())}))

    out = ck("assignments",
             lambda: assign_states(prep, labels, cfg, P,
                                   broadcast_threshold=broadcast_threshold),
             ("prepare", "labels"))
    if runner is not None:
        runner.finish()
    return out


def state_stats(assignments: ray.data.Dataset) -> ray.data.Dataset:
    """Per-state cluster/row counts (A2 analogue, MainViewModel.cs:289-316)."""
    return assignments.groupby("state").count()


def filter_visible(assignments: ray.data.Dataset,
                   visible_states: tuple[str, ...] = ("keep", "delete"),
                   roots: tuple[str, ...] = (),
                   visible_roots: tuple[int, ...] | None = None,
                   id_col: str = "url") -> ray.data.Dataset:
    """Visibility filter over the assignments view (M10 analogue,
    FilterByVisibleFolders MainViewModel.cs:1819-1851): a row is visible
    iff its state is enabled AND its root (first case-insensitive
    url-prefix match in ``roots``, -1 = unrooted) is enabled.
    ``visible_roots=None`` shows every root.  Fully vectorized: one
    pc.is_in over states plus one pc.starts_with per root."""
    sv = pa.array(list(visible_states))
    lroots = [r.lower() for r in roots]
    vr = None if visible_roots is None else set(visible_roots)

    def _f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["state"], value_set=sv)
        if vr is not None and lroots:
            ids = t[id_col]
            low = pc.utf8_lower(ids) if pa.types.is_string(ids.type) \
                or pa.types.is_large_string(ids.type) else None
            if low is not None:
                rank = np.full(t.num_rows, -1, dtype=np.int64)
                unset = np.ones(t.num_rows, dtype=bool)
                for ri, r in enumerate(lroots):
                    m = pc.starts_with(low, pattern=r) \
                        .to_numpy(zero_copy_only=False) & unset
                    rank[m] = ri
                    unset &= ~m
                ok = np.isin(rank, list(vr))
                mask = pc.and_(mask, pa.array(ok))
        return t.filter(mask)

    return assignments.map_batches(_f, batch_format="pyarrow")


def remark_keeper(assignments: ray.data.Dataset, keeper_id,
                  id_col: str = "url") -> ray.data.Dataset:
    """Post-hoc keeper re-marking — the reference's manual keep<->delete
    toggle (MainWindow.xaml.cs:15-37, VERDICT r3 #9) over a finished
    assignments table: the named member of its cluster becomes the
    keeper (state='keep'), every other member becomes 'delete', and
    cluster_id is rewritten to the new keeper's id for the whole cluster
    (cluster_id IS the keeper's id, assign_states' contract), so the
    table stays self-consistent for every downstream sink/report.

    Locating the member's cluster is one pruned column scan collecting a
    single row; the rewrite is one vectorized map_batches over the
    assignments — nothing else is shuffled or collected, so the verb
    costs a corpus read + write regardless of cluster count.  Rows
    outside the target cluster (other clusters, unique/ignored/error)
    pass through untouched; re-marking the CURRENT keeper is a no-op
    rewrite."""
    hits = [r for b in assignments.map_batches(
        lambda t: t.filter(pc.equal(t[id_col], keeper_id)),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()]
    if not hits:
        raise ValueError(f"id {keeper_id!r} not found in assignments")
    row = hits[0]
    if row["state"] not in ("keep", "delete"):
        raise ValueError(
            f"id {keeper_id!r} has state {row['state']!r} — only members "
            "of a duplicate cluster (keep/delete) can be re-marked")
    old_cid = row["cluster_id"]

    def _rewrite(t: pa.Table) -> pa.Table:
        in_cluster = pc.equal(t["cluster_id"], old_cid)
        is_keeper = pc.equal(t[id_col], keeper_id)
        state = pc.if_else(
            in_cluster,
            pc.if_else(is_keeper, pa.scalar("keep"), pa.scalar("delete")),
            t["state"])
        cid = pc.if_else(in_cluster,
                         pa.scalar(keeper_id, t["cluster_id"].type),
                         t["cluster_id"])
        return pa.table({id_col: t[id_col], "state": state,
                         "cluster_id": cid,
                         "cluster_size": t["cluster_size"]})

    return assignments.map_batches(_rewrite, batch_format="pyarrow")


def cluster_size_hist(assignments: ray.data.Dataset) -> ray.data.Dataset:
    """Duplicate-cluster size distribution — the standard dedup QA
    report (how much of the corpus sits in 2-clusters vs giant
    boilerplate blobs).  One row per distinct cluster size:
    (cluster_size, n_clusters).

    Counts each cluster ONCE via its keeper row (every cluster has
    exactly one 'keep'), with a per-batch partial count before the tiny
    groupby — the shuffle carries one row per distinct size per batch."""

    def _partial(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t["state"], "keep"))
        vc = keep["cluster_size"].combine_chunks().value_counts()
        return pa.table({"cluster_size": vc.field("values").cast(pa.int64()),
                         "n_clusters": vc.field("counts").cast(pa.int64())})

    partial = assignments.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby("cluster_size").sum("n_clusters")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cluster_size", "n_clusters"])

    return agg.map_batches(_rename, batch_format="pyarrow") \
              .sort("cluster_size")


def _edge_stats(edges: ray.data.Dataset, P: int) -> tuple[int, int, int]:
    """(n_edges, n_matched_docs, n_clusters) for one edge set.  Matched
    docs and clusters come from union_find's (node, comp) labels — one
    row per node in any edge, comp = min member — so deletes the tier
    would cause ALONE are n_matched_docs - n_clusters (one keeper per
    cluster; ok-docs by construction since edges are built over the
    active working table).  Distinct-comp counting is distributed: one
    per-batch unique partial, one comp-hash shuffle of the deduped
    partials, a tiny per-partition count — the driver never sees a
    label table, only P count rows."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return 0, 0, 0
    labels = union_find(edges, P).materialize()
    n_docs = labels.count()

    def _partial(t: pa.Table) -> pa.Table:
        c = np.unique(t["comp"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
        return pa.table({"comp": c})

    def _count(t: pa.Table) -> pa.Table:
        n = len(np.unique(t["comp"].to_numpy(zero_copy_only=False)
                          .astype(np.uint64)))
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = groupapply(labels.map_batches(_partial, batch_format="pyarrow"),
                       "comp", _count, P)
    n_comps = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        n_comps += int(pc.sum(b["n"]).as_py() or 0)
    return n_edges, n_docs, n_comps


def soft_dedup(assignments: ray.data.Dataset, k: int,
               id_col: str = "doc_id",
               num_partitions: int = 16) -> ray.data.Dataset:
    """Cap duplicates at ``k`` copies per cluster instead of one — the
    soft keeper policy for corpora where natural duplication frequency
    is signal (up-to-k-epoch repetition is benign for training;
    Muennighoff et al. 2023, "Scaling Data-Constrained Language
    Models"): the policy keeper stays ``keep``, the next ``k-1``
    members in deterministic id order stay ``keep``, the rest flip to
    ``delete``.  A post-pass over an existing assignments table — the
    expensive matching/clustering work is reused, only the O(dups)
    clustered rows shuffle once on the cluster id.

    Returns (id_col, state, cluster_id, cluster_size, copy_rank) where
    ``copy_rank`` is the member's 0-based rank under (policy keeper
    first, then ascending id); non-clustered rows (including rows with
    a null state) pass through with copy_rank 0, and any EXTRA columns
    the input assignments table carries survive on both branches.  With ``keeper='first'`` the rank order equals plain
    ascending id (the keeper IS the id minimum), so a SQL oracle is
    ``ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY id) - 1``.
    ``k=1`` reproduces the input states exactly (tested)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if "copy_rank" in assignments.schema().names:
        # re-softening a soften output: recompute the rank rather than
        # appending a duplicate copy_rank column (schema error)
        assignments = assignments.drop_columns(["copy_rank"])
    cl_states = pa.array(["keep", "delete"])

    def _clmask(t: pa.Table) -> pa.Array:
        # null state is NOT clustered (is_in yields null for null
        # input, which would silently drop the row from BOTH branches)
        return pc.fill_null(pc.is_in(t["state"], value_set=cl_states),
                            False)

    def _pass(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(_clmask(t)))
        return t.append_column(
            "copy_rank", pa.array(np.zeros(t.num_rows, np.int64),
                                  pa.int64()))

    def _key(t: pa.Table) -> pa.Table:
        t = t.filter(_clmask(t))
        cid = t["cluster_id"]
        if pa.types.is_string(cid.type) or \
                pa.types.is_large_string(cid.type):
            from .corpus import _hash64_strings
            ck = _hash64_strings(cid.combine_chunks())
        else:
            ck = cid.to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("ckey", pa.array(ck, pa.uint64()))

    def _rank(t: pa.Table) -> pa.Table:
        # keeper-first then ascending id: copy_rank 0 is always the
        # policy keeper regardless of which keeper policy produced the
        # assignments; ranks 1..k-1 fill in deterministic id order
        krank = pc.cast(pc.not_equal(t["state"], "keep"), pa.int8())
        t = t.append_column("krank", krank)
        idx = pc.sort_indices(t, sort_keys=[("cluster_id", "ascending"),
                                            ("krank", "ascending"),
                                            (id_col, "ascending")])
        t2 = t.take(idx).drop_columns(["krank", "ckey"])
        n = t2.num_rows
        if n == 0:
            return t2.append_column("copy_rank", pa.array([], pa.int64()))
        cid = t2["cluster_id"]
        if pa.types.is_string(cid.type) or \
                pa.types.is_large_string(cid.type):
            cl = np.asarray(cid.to_pylist(), dtype=object)
        else:
            cl = cid.to_numpy(zero_copy_only=False)
        brk = np.flatnonzero(cl[1:] != cl[:-1]) + 1
        starts = np.concatenate([[0], brk]).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [n]]))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        state = np.where(rank < k, "keep", "delete")
        # rewrite state in place and append the rank so EXTRA columns a
        # caller's assignments table carries survive on both branches
        t2 = t2.set_column(t2.schema.get_field_index("state"), "state",
                           pa.array(state.tolist(), pa.string()))
        return t2.append_column("copy_rank", pa.array(rank, pa.int64()))

    passthrough = assignments.map_batches(_pass, batch_format="pyarrow")
    ranked = groupapply(
        assignments.map_batches(_key, batch_format="pyarrow"),
        "ckey", _rank, num_partitions)
    return passthrough.union(ranked)


def tier_report(ds: ray.data.Dataset, cfg: DedupConfig,
                check_html: bool = True,
                num_partitions: int | None = None) -> ray.data.Dataset:
    """Per-tier dedup attribution — the tier-dedup diagnostic table.

    For each enabled edge tier (exact / minhash / simhash / substring)
    the tier's matches ALONE: edges emitted, docs matched, clusters
    formed, and the deletes it would cause by itself; plus a 'combined'
    row over the union of every tier (run_dedup's edge set — its
    n_deletes equals the full pipeline's delete count because states
    other than keep/delete never enter edges).  The marginal value of a
    tier reads directly off the table: combined vs the sum of singles
    shows overlap; a tier whose singleton deletes ≈ 0 is not paying for
    its shuffle.

    One tiny output row per tier; every count is computed distributed
    (edge stages and union-find are the production ones)."""
    from .dist import tune_context
    tune_context()
    needs_text = bool(cfg.near or cfg.simhash or cfg.substring
                      or cfg.byte_verify)
    prep = prepare(ds, cfg, check_html=check_html,
                   keep_text=needs_text).materialize()
    P = num_partitions or _auto_partitions(cfg, prep.size_bytes())
    active = _ok_only(prep)

    tiers = []
    if cfg.exact:
        tiers.append(("exact", exact_edges(active, cfg, P)))
    if cfg.near:
        tiers.append(("minhash", minhash_edges(active, cfg, P)))
    if cfg.simhash:
        tiers.append(("simhash", simhash_edges(active, cfg, P)))
    if cfg.substring:
        tiers.append(("substring", substring_edges(active, cfg, P)))

    rows = []
    mats = [(name, e.materialize()) for name, e in tiers]
    for name, e in mats:
        ne, nd, nc = _edge_stats(e, P)
        rows.append((name, ne, nd, nc))
    if len(mats) > 1:
        comb = mats[0][1].union(*[e for _, e in mats[1:]])
        ne, nd, nc = _edge_stats(comb, P)
        rows.append(("combined", ne, nd, nc))
    elif mats:
        name, ne, nd, nc = rows[0]
        rows.append(("combined", ne, nd, nc))

    rows.sort()
    return ray.data.from_arrow(pa.table({
        "tier": pa.array([r[0] for r in rows], pa.string()),
        "n_edges": pa.array([r[1] for r in rows], pa.int64()),
        "n_matched_docs": pa.array([r[2] for r in rows], pa.int64()),
        "n_clusters": pa.array([r[3] for r in rows], pa.int64()),
        "n_deletes": pa.array([r[2] - r[3] for r in rows], pa.int64()),
    }))
