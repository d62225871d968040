"""Similarity search over an embedding column (list<float>).

Two paths (SURVEY.md "beyond the reference" scope):
  * brute-force cosine top-k — the exactness baseline: the query matrix
    is broadcast ONCE via ``ray.put`` and every batch does one float64
    matmul against it; per-batch top-k pruning keeps the shuffle to
    O(batches * Q * k) candidate rows before the final per-query select.
  * LSH-bucketed near-duplicate pairs — the scale path: random
    hyperplane signatures (Charikar 2002) bucket vectors; exact cosine
    is verified only within buckets, so no all-pairs pass exists.

Scores leave the engine as scaled integers (1e-6 units) in BOTH the Ray
path and the SQL oracle: bit-exact under value hashing, immune to the
one-ulp differences between numpy and DuckDB round().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — zero-copy for
    fixed-width non-null lists via list_flatten (no per-row Python)."""
    col = t[vec_col].combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    import pyarrow.compute as pc
    flat = pc.list_flatten(col)
    if len(flat) % n != 0:  # ragged — shouldn't happen for embeddings
        return np.array(col.to_pylist(), dtype=np.float64)
    dim = len(flat) // n
    return flat.to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False).reshape(n, dim)


def _ids_np(t: pa.Table, id_col: str) -> np.ndarray:
    return t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)


def _id_sorted_sample(ds: ray.data.Dataset, id_col: str, vec_col: str,
                      sample_size: int) -> np.ndarray:
    """Bounded training sample for coarse quantizers, ID-SORTED so the
    fitted centroids are deterministic: ``limit()`` takes the same rows
    every run but block arrival order varies, and k-means is sensitive
    to input order.  Unique ids are the caller contract; should a
    corpus violate it, ties are broken by VECTOR CONTENT (a secondary
    lexsort key on the raw bytes), so the order — and therefore the
    fitted centroids — stays content-deterministic either way, never
    arrival-order-dependent."""
    t = pa.concat_tables(list(
        ds.limit(sample_size).select_columns([id_col, vec_col])
        .iter_batches(batch_format="pyarrow")))
    mat = _batch_matrix(t, vec_col)
    ids = _ids_np(t, id_col)
    vec_key = np.frombuffer(np.ascontiguousarray(mat).tobytes(),
                            dtype=f"V{mat.shape[1] * mat.itemsize}")
    return mat[np.lexsort((vec_key, ids))]


def _load_queries(ds: ray.data.Dataset, id_col: str, vec_col: str,
                  query_ids: list[int]) -> tuple[np.ndarray, np.ndarray]:
    qset = set(query_ids)

    def _f(t: pa.Table) -> pa.Table:
        mask = pa.array([i in qset for i in t[id_col].to_pylist()])
        return t.filter(mask)

    qt = pa.concat_tables(list(
        ds.map_batches(_f, batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
    ids = _ids_np(qt, id_col)
    mat = _batch_matrix(qt, vec_col)
    order = np.argsort(ids)
    return ids[order], mat[order]


def knn_brute(ds: ray.data.Dataset, query_ids: list[int], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding") -> ray.data.Dataset:
    """For each query id: top-k neighbours by cosine (self excluded).
    Output: (q, vec_id, score) ordered by (q, score desc, vec_id)."""
    q_ids, q_mat = _load_queries(ds, id_col, vec_col, query_ids)
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, qn))

    def _scores(t: pa.Table) -> pa.Table:
        ids_b, qn_b = ray.get(q_ref)
        m = _batch_matrix(t, vec_col)
        vids = _ids_np(t, id_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        # scaled-integer scores (1e-6 units): bit-exact across engines,
        # immune to one-ulp round() differences vs the SQL oracle
        sims = np.rint((mn @ qn_b.T) * 1e6).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_b)):
            col = sims[:, qi]
            mask = vids != ids_b[qi]
            cand = np.flatnonzero(mask)
            if len(cand) > k:
                # tie-aware per-batch prune: keep everything scoring >= the
                # k-th best, so batch composition can't affect the final set
                kth = np.partition(-col[cand], k - 1)[k - 1]
                part = cand[-col[cand] <= kth]
            else:
                part = cand
            out_q.append(np.full(len(part), ids_b[qi], dtype=np.int64))
            out_v.append(vids[part])
            out_s.append(col[part])
        return pa.table({"q": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "score_e6": np.concatenate(out_s)})

    cand = ds.map_batches(_scores, batch_format="pyarrow")

    def _topk(t: pa.Table) -> pa.Table:
        qs = t["q"].to_numpy(zero_copy_only=False)
        vs = t["vec_id"].to_numpy(zero_copy_only=False)
        ss = t["score_e6"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, -ss))  # score desc, vec_id asc
        take = order[:k]
        return pa.table({"q": qs[take], "vec_id": vs[take],
                         "score_e6": ss[take]})

    return cand.groupby("q").map_groups(_topk, batch_format="pyarrow") \
               .sort(["q", "score_e6", "vec_id"],
                     descending=[False, True, False])


def embedding_norms(ds: ray.data.Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> ray.data.Dataset:
    """(vec_id, l2_norm) rounded to 6 decimals."""

    def _f(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, vec_col)
        return pa.table({
            id_col: t[id_col],
            "l2_norm_e6": np.rint(np.linalg.norm(m, axis=1) * 1e6).astype(np.int64),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def dup_pairs_brute(ds: ray.data.Dataset, threshold: float = 0.9,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> ray.data.Dataset:
    """All pairs (a < b) with cosine >= threshold — exact baseline via a
    broadcast of the full (small) matrix; use dup_pairs_lsh at scale."""
    full = pa.concat_tables(list(
        ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow")))
    ids = _ids_np(full, id_col)
    mat = _batch_matrix(full, vec_col)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    ref = ray.put((ids, mn))

    def _f(t: pa.Table) -> pa.Table:
        all_ids, all_mn = ray.get(ref)
        m = _batch_matrix(t, vec_col)
        vids = _ids_np(t, id_col)
        bn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        bi, aj, exact = _sim_cross(bn, all_mn, threshold)
        keep = vids[bi] < all_ids[aj]
        bi, aj, exact = bi[keep], aj[keep], exact[keep]
        return pa.table({"a": vids[bi], "b": all_ids[aj],
                         "score_e6": np.rint(exact * 1e6).astype(np.int64)})

    return ds.map_batches(_f, batch_format="pyarrow").sort(["a", "b"])


def dup_pairs_lsh(ds: ray.data.Dataset, threshold: float = 0.9,
                  n_planes: int = 8, n_tables: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  seed: int = 42, num_partitions: int = 32) -> ray.data.Dataset:
    """Scale path: multi-table random-hyperplane LSH; exact cosine only
    within buckets, so no all-pairs pass exists.  Recall ≈
    1 - (1 - p^n_planes)^n_tables with p = 1 - acos(sim)/pi."""
    from .dist import groupapply, mix64, segments

    rng = np.random.default_rng(seed)
    dim = len(ds.take(1)[0][vec_col])
    planes = rng.standard_normal((dim, n_tables * n_planes))
    p_ref = ray.put(planes)

    def _sig(t: pa.Table) -> pa.Table:
        pl = ray.get(p_ref)
        m = _batch_matrix(t, vec_col)
        n = len(m)
        bits = (m @ pl) > 0
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        vids = _ids_np(t, id_col)
        keys = np.empty((n_tables, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for ti in range(n_tables):
                key = np.full(n, np.uint64(ti) * np.uint64(0x9E3779B97F4A7C15),
                              dtype=np.uint64)
                for j in range(n_planes):
                    key = (key << np.uint64(1)) | bits[:, ti * n_planes + j].astype(np.uint64)
                keys[ti] = mix64(key)
        # one contiguous buffer for all n payloads (no per-row tobytes)
        width = mn.shape[1] * 8
        data = pa.py_buffer(np.ascontiguousarray(mn).tobytes())
        offsets = pa.py_buffer(
            (np.arange(n + 1, dtype=np.int32) * width).tobytes())
        vec_arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
        return pa.table({
            "skey": pa.array(keys.reshape(-1), pa.uint64()),
            "vid": pa.array(np.tile(vids, n_tables), pa.int64()),
            "vec": pa.chunked_array([vec_arr] * n_tables),
        })

    rows = ds.map_batches(_sig, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vids = t["vid"].to_numpy(zero_copy_only=False)
        # decode the whole partition's vectors at once: fixed-width binary
        # values are one contiguous buffer == an (n, dim) float64 matrix
        vecs = t["vec"].combine_chunks()
        offs = np.frombuffer(vecs.buffers()[1], dtype=np.int32,
                             count=len(vecs) + 1, offset=vecs.offset * 4)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all() and widths[0] % 8 == 0:
            vals = np.frombuffer(vecs.buffers()[2], dtype=np.float64)
            mat = vals[offs[0] // 8: offs[-1] // 8].reshape(
                len(vecs), widths[0] // 8)
        else:  # ragged fallback
            mat = np.stack([np.frombuffer(x, dtype=np.float64)
                            for x in vecs.to_pylist()])
        order, starts, _ = segments(sk)
        o_a, o_b, o_s = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            idx = order[s:e]
            m = mat[idx]
            vv = vids[idx]
            ai, bj, exact = _sim_edges(m, threshold)
            if len(ai) == 0:
                continue
            va, vb = vv[ai], vv[bj]
            o_a.append(np.minimum(va, vb))
            o_b.append(np.maximum(va, vb))
            o_s.append(np.rint(exact * 1e6).astype(np.int64))
        if not o_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(o_a), pa.int64()),
                         "b": pa.array(np.concatenate(o_b), pa.int64()),
                         "score_e6": pa.array(np.concatenate(o_s), pa.int64())})

    out = groupapply(rows, "skey", _part, num_partitions)

    # dedupe cross-table repeats (same pair found in several tables)
    def _pairkey(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = mix64(a) ^ mix64(~b)
        return t.append_column("skey", pa.array(k, pa.uint64()))

    def _uniq(t: pa.Table) -> pa.Table:
        # (a, b, score) rows repeat bit-identically across LSH tables, so
        # row-level np.unique dedupes pairs without pandas
        arr = np.stack([t["a"].to_numpy(zero_copy_only=False),
                        t["b"].to_numpy(zero_copy_only=False),
                        t["score_e6"].to_numpy(zero_copy_only=False)], axis=1)
        arr = np.unique(arr, axis=0)
        return pa.table({"a": pa.array(arr[:, 0], pa.int64()),
                         "b": pa.array(arr[:, 1], pa.int64()),
                         "score_e6": pa.array(arr[:, 2], pa.int64())})

    return groupapply(out.map_batches(_pairkey, batch_format="pyarrow"),
                      "skey", _uniq, num_partitions).sort(["a", "b"])


def embedding_dedup(ds: ray.data.Dataset, threshold: float = 0.9,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    num_partitions: int = 32,
                    use_lsh: bool = False) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate DEDUP: cosine>=threshold pairs →
    connected components (distributed union-find) → keep/delete/unique
    states with cluster_id = the minimum member id — the same
    assignment contract as the text pipelines, over the embedding
    modality.  ``use_lsh=True`` swaps the exact pair source for the
    bucketed LSH path (the 100-TB shape); the default brute source keeps
    the result exact and oracle-checkable (multi-hop closure verified
    against a recursive-CTE SQL oracle — the one clustering semantics a
    window function can't express)."""
    from .dist import union_find

    pair_src = dup_pairs_lsh if use_lsh else dup_pairs_brute
    pairs = pair_src(ds, threshold=threshold, id_col=id_col, vec_col=vec_col)

    def _edges(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["a"].cast(pa.uint64()),
                         "v": t["b"].cast(pa.uint64())})

    labels = union_find(pairs.map_batches(_edges, batch_format="pyarrow"),
                        num_partitions).materialize()
    # labels are O(duplicated vectors) — bounded — so one broadcast join
    # assigns states (the assign_states reduce-side shape would apply
    # above ~20M labels, as in dedup.pipeline)
    ln_l, lc_l = [np.array([], dtype=np.uint64)], [np.array([], dtype=np.uint64)]
    for b in labels.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        ln_l.append(b["node"].to_numpy(zero_copy_only=False).astype(np.uint64))
        lc_l.append(b["comp"].to_numpy(zero_copy_only=False).astype(np.uint64))
    ln = np.concatenate(ln_l)
    lc = np.concatenate(lc_l)
    o = np.argsort(ln)
    ln, lc = ln[o], lc[o]
    # per-row cluster size, aligned with ln (vectorized member counts)
    _, inv_c, cnt_c = np.unique(lc, return_inverse=True, return_counts=True)
    lsz = cnt_c[inv_c] if len(lc) else np.zeros(0, dtype=np.int64)
    ref = ray.put((ln, lc, lsz))

    def _assign(t: pa.Table) -> pa.Table:
        la, co, sz = ray.get(ref)
        vids = _ids_np(t, id_col)
        pos = np.clip(np.searchsorted(la, vids.astype(np.uint64)), 0,
                      max(len(la) - 1, 0))
        hit = (la[pos] == vids.astype(np.uint64)) if len(la) else \
            np.zeros(len(vids), dtype=bool)
        comp = np.where(hit, co[pos] if len(co) else 0, 0).astype(np.int64)
        state = np.where(~hit, "unique",
                         np.where(vids == comp, "keep", "delete"))
        csize = np.where(hit, sz[pos] if len(sz) else 0, 1)
        return pa.table({
            id_col: pa.array(vids, pa.int64()),
            "state": pa.array(state.tolist(), pa.string()),
            "cluster_id": pa.array(np.where(hit, comp, -1), pa.int64()),
            "cluster_size": pa.array(csize.astype(np.int64), pa.int64()),
        })

    return ds.select_columns([id_col]).map_batches(
        _assign, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbours — the scale path for
# top-k search: coarse k-means centroids partition the corpus; queries probe
# only the nearest n_probe cells, so no all-pairs matmul exists.
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Small deterministic k-means (driver-side, on a bounded sample)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    if k == 0:
        return cent
    s_sq = (sample ** 2).sum(axis=1, keepdims=True)
    for _ in range(iters):
        # |s - c|^2 = |s|^2 - 2 s.c + |c|^2 — O(s*k) memory, one matmul,
        # never the O(s*k*d) broadcast tensor (k scales with corpus size)
        d = s_sq - 2.0 * (sample @ cent.T) + (cent ** 2).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        # vectorized per-cell means: segment-sum via np.add.at-free path
        order = np.argsort(a, kind="stable")
        a_s = a[order]
        brk = np.flatnonzero(a_s[1:] != a_s[:-1]) + 1
        starts = np.concatenate([[0], brk, [len(a_s)]])
        occupied = a_s[starts[:-1]]
        sums = np.add.reduceat(sample[order], starts[:-1], axis=0)
        cnts = np.diff(starts)[:, None]
        cent[occupied] = sums / cnts
    return cent


def knn_ivf(ds: ray.data.Dataset, query_ids: list[int], k: int = 10,
            n_centroids: int = 16, n_probe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            sample_size: int = 2048, seed: int = 42) -> ray.data.Dataset:
    """Approximate top-k cosine via IVF: train coarse centroids on a
    sample, assign every vector to its nearest cell (one broadcast
    matmul per batch), then score queries only against vectors whose cell
    is among the query's n_probe nearest cells.

    Output: (q, vec_id, score) — approximate; recall rises with n_probe.
    """
    sample = _id_sorted_sample(ds, id_col, vec_col, sample_size)
    cent = _kmeans(sample, n_centroids, seed=seed)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)

    q_ids, q_mat = _load_queries(ds, id_col, vec_col, query_ids)
    qn = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)
    # per query: the n_probe nearest cells
    q_cells = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]
    ref = ray.put((q_ids, qn, cn, q_cells))

    def _score(t: pa.Table) -> pa.Table:
        ids_b, qn_b, cn_b, cells_b = ray.get(ref)
        m = _batch_matrix(t, vec_col)
        vids = _ids_np(t, id_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cell = (mn @ cn_b.T).argmax(axis=1)
        sims = np.rint((mn @ qn_b.T) * 1e6).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_b)):
            mask = np.isin(cell, cells_b[qi]) & (vids != ids_b[qi])
            cand = np.flatnonzero(mask)
            col = sims[:, qi]
            if len(cand) > k:
                kth = np.partition(-col[cand], k - 1)[k - 1]
                cand = cand[-col[cand] <= kth]
            out_q.append(np.full(len(cand), ids_b[qi], dtype=np.int64))
            out_v.append(vids[cand])
            out_s.append(col[cand])
        return pa.table({"q": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "score_e6": np.concatenate(out_s)})

    cand = ds.map_batches(_score, batch_format="pyarrow")

    def _topk(t: pa.Table) -> pa.Table:
        qs = t["q"].to_numpy(zero_copy_only=False)
        vs = t["vec_id"].to_numpy(zero_copy_only=False)
        ss = t["score_e6"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, -ss))[:k]
        return pa.table({"q": qs[order], "vec_id": vs[order],
                         "score_e6": ss[order]})

    return cand.groupby("q").map_groups(_topk, batch_format="pyarrow") \
               .sort(["q", "score_e6", "vec_id"],
                     descending=[False, True, False])


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via k-means cells (Abbas et al. 2023,
# arXiv:2303.09540): cluster the corpus into k coarse cells, then find
# near-duplicates ONLY within each cell.  The all-pairs matrix shrinks
# from O(n^2) to O(k * (n/k)^2); the price is pairs that straddle a cell
# boundary (measured honestly by the semdedup_recall query / tests).
# ---------------------------------------------------------------------------

def _edges_cc(n: int, iu: np.ndarray, ju: np.ndarray) -> np.ndarray:
    """Connected components over an undirected edge list on nodes
    [0, n): vectorized min-label propagation + pointer jumping,
    O(edges) per round, O(log diameter) rounds.  Returns the min local
    index of each node's component."""
    lab = np.arange(n)
    if len(iu) == 0:
        return lab
    src = np.concatenate([iu, ju])
    dst = np.concatenate([ju, iu])
    while True:
        new = lab.copy()
        np.minimum.at(new, src, lab[dst])
        while True:  # pointer jumping to fixpoint
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            return lab
        lab = new


def _screen_margin(dim: int) -> float:
    """Margin above the float32 dot error bound for unit-norm rows
    (|dot32 - dot64| <= ~dim * eps32 * |x||y| plus normalization slop)."""
    return max(1e-4, dim * 4e-7)


def _sim_edges(X: np.ndarray, threshold: float) \
        -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i < j, exact_dot) pairs of rows of the NORMALIZED float64
    matrix X with cosine >= threshold, with float64-exact semantics at
    float32 matmul speed: the O(n^2) similarity matrix is computed in
    float32 (this host's float64 GEMM is ~100x slower) with a margin
    well above the float32 error bound, then ONLY the candidate pairs
    are re-scored with float64 row dots.  Pairs and scores match a pure
    float64 GEMM up to its own last-ulp summation-order slack — the same
    slack the scaled-int (e6) oracle contract already absorbs."""
    if X.shape[0] < 2:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    X32 = X.astype(np.float32)
    cand = (X32 @ X32.T) >= np.float32(threshold - _screen_margin(X.shape[1]))
    iu, ju = np.nonzero(np.triu(cand, k=1))
    exact = np.einsum("ij,ij->i", X[iu], X[ju]) if len(iu) else \
        np.zeros(0, dtype=np.float64)
    keep = exact >= threshold
    return iu[keep], ju[keep], exact[keep]


def _sim_cross(B: np.ndarray, A: np.ndarray, threshold: float) \
        -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_of_B, row_of_A, exact_dot) for every cross pair with cosine
    >= threshold — same float32-screen / float64-confirm contract as
    _sim_edges, for a (B_rows x A_rows) cross matrix."""
    if B.shape[0] == 0 or A.shape[0] == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    s32 = B.astype(np.float32) @ A.astype(np.float32).T
    bi, aj = np.nonzero(s32 >= np.float32(threshold - _screen_margin(B.shape[1])))
    exact = np.einsum("ij,ij->i", B[bi], A[aj]) if len(bi) else \
        np.zeros(0, dtype=np.float64)
    keep = exact >= threshold
    return bi[keep], aj[keep], exact[keep]


def _dense_cc(adj: np.ndarray) -> np.ndarray:
    """Connected components of a small dense boolean adjacency matrix
    (symmetric); returns the min local index of each node's component.
    Extracts the (sparse) edge list once, then runs vectorized min-label
    propagation + pointer jumping over the edges — O(edges) per round,
    O(log diameter) rounds, no O(n^2) per-iteration temporaries (the
    adjacency is diagonal-dominated when most rows are unique, so dense
    row-min sweeps waste almost all their work)."""
    n = adj.shape[0]
    iu, ju = np.nonzero(np.triu(adj, k=1))
    return _edges_cc(n, iu, ju)


def semdedup(ds: ray.data.Dataset, threshold: float = 0.9,
             n_centroids: int | None = None, id_col: str = "vec_id",
             vec_col: str = "embedding", sample_size: int = 2048,
             seed: int = 42, num_partitions: int = 32,
             target_cell: int = 4096,
             keeper: str = "first") -> ray.data.Dataset:
    """SemDeDup: k-means cells over normalized embeddings, exact cosine
    dedup WITHIN each cell (connected components at cosine >= threshold).

    ``keeper`` picks the cluster survivor — the semantic analogue of the
    text engine's keeper-policy knob:
      * ``first``   — min id (the engine's default assignment contract);
      * ``diverse`` — the member with the LOWEST cosine to its cell
        centroid (the SemDeDup paper's rule: of a near-dup group, keep
        the example farthest from the cluster center to preserve
        diversity), ties broken by min id, deterministic at any
        parallelism.  ``cluster_id`` stays the min member id (cluster
        identity) under both policies.

    Output: (id_col, state keep|delete|unique, cluster_id = min member
    id or -1, cluster_size, cell).  The corpus rides ONE hash shuffle
    keyed on cell; per-cell work is one (c, c) screened matmul
    (_sim_edges: float32 screen, float64 confirm) with
    c ~ n/k — size n_centroids so a cell fits a worker (the paper's own
    constraint).  Every emitted delete has a true cosine>=threshold
    neighbor, so precision vs the exact closure is 1.0 by construction;
    recall is the cell-split cost, measured by semdedup_recall.

    ``n_centroids=None`` auto-sizes k = ceil(n / target_cell) (min 8):
    cells stay ~target_cell rows as the corpus grows — k must scale
    with n or the per-cell O(c^2) matmul quietly reverts to all-pairs.
    The count is parquet metadata (no data scan) ONLY when ``ds`` is a
    fresh parquet read; for a lazy/derived dataset ``count()`` executes
    the upstream pipeline an extra time — pass ``n_centroids``
    explicitly (or materialize first) in that case."""
    from .dist import groupapply, segments

    if keeper not in ("first", "diverse"):
        raise ValueError(f"semdedup keeper must be 'first' or 'diverse', "
                         f"got {keeper!r}")
    if n_centroids is None:
        n_centroids = max(8, -(-ds.count() // target_cell))
    sample = _id_sorted_sample(ds, id_col, vec_col, sample_size)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-300)
    cent = _kmeans(sample, n_centroids, seed=seed)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
    ref = ray.put(cn)

    def _cell(t: pa.Table) -> pa.Table:
        cn_b = ray.get(ref)
        m = _batch_matrix(t, vec_col)
        if m.shape[0] == 0:
            return t.append_column("cell", pa.array([], pa.uint64()))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cell = (mn @ cn_b.T).argmax(axis=1).astype(np.uint64)
        return t.append_column("cell", pa.array(cell, pa.uint64()))

    withcell = ds.select_columns([id_col, vec_col]).map_batches(
        _cell, batch_format="pyarrow")

    def _dedup_cells(t: pa.Table) -> pa.Table:
        ids = _ids_np(t, id_col)
        m = _batch_matrix(t, vec_col)
        cells = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300) \
            if m.size else m
        order, starts, _ = segments(cells)
        out_id = np.empty(len(ids), dtype=np.int64)
        out_state = np.empty(len(ids), dtype=object)
        out_comp = np.empty(len(ids), dtype=np.int64)
        out_size = np.empty(len(ids), dtype=np.int64)
        out_cell = np.empty(len(ids), dtype=np.int64)
        pos = 0
        for gi in range(len(starts) - 1):
            sel = order[starts[gi]:starts[gi + 1]]
            sel = sel[np.argsort(ids[sel])]  # min local index == min id
            gids = ids[sel]
            X = mn[sel]
            iu, ju, _ = _sim_edges(X, threshold)
            lab = _edges_cc(len(gids), iu, ju)
            comp_id = gids[lab]
            _, inv, cnt = np.unique(lab, return_inverse=True,
                                    return_counts=True)
            size = cnt[inv]
            dup = size > 1
            n = len(gids)
            if keeper == "diverse" and n:
                # paper keeper: per component, keep the member with the
                # LOWEST cosine to the cell centroid (ties -> min id).
                # One lexsort; component firsts are the keepers.
                csim = X @ ray.get(ref)[int(cells[sel[0]])]
                ord2 = np.lexsort((np.arange(n), csim, lab))
                first = np.concatenate(
                    [[True], lab[ord2][1:] != lab[ord2][:-1]])
                is_keep = np.zeros(n, dtype=bool)
                is_keep[ord2[first]] = True
            else:
                is_keep = gids == comp_id
            out_id[pos:pos + n] = gids
            out_state[pos:pos + n] = np.where(
                ~dup, "unique", np.where(is_keep, "keep", "delete"))
            out_comp[pos:pos + n] = np.where(dup, comp_id, -1)
            out_size[pos:pos + n] = size
            out_cell[pos:pos + n] = cells[sel].astype(np.int64)
            pos += n
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "state": pa.array(out_state.tolist(), pa.string()),
            "cluster_id": pa.array(out_comp, pa.int64()),
            "cluster_size": pa.array(out_size, pa.int64()),
            "cell": pa.array(out_cell, pa.int64()),
        })

    return groupapply(withcell, "cell", _dedup_cells, num_partitions) \
        .sort(id_col)


# ---------------------------------------------------------------------------
# IVF-PQ (Jégou, Douze, Schmid 2011, "Product quantization for nearest
# neighbor search", IEEE TPAMI 33(1)): the MEMORY-scale path for top-k.
# IVF bounds the scan (probe n_probe of k cells); product quantization
# bounds the bytes — each vector is stored as m uint8 codes (one per
# subspace, trained on cell residuals), so the scanned index is m bytes
# per vector instead of dim*4.  At 10^12 vectors that is the difference
# between an index that fits the cluster's RAM and one that cannot
# exist.  Search uses asymmetric distance computation (ADC): per
# (query, probed cell) a (m, ks) lookup table of exact sub-distances,
# per candidate a gather+sum — no decode, no matmul on the scan side.
# ---------------------------------------------------------------------------

def _train_pq(resid: np.ndarray, m: int, ks: int,
              seed: int = 42) -> np.ndarray:
    """Per-subspace k-means codebooks over residual sub-vectors.
    Returns (m, ks_eff, dsub); deterministic given the (id-sorted)
    training sample."""
    n, dim = resid.shape
    dsub = dim // m
    books = [_kmeans(np.ascontiguousarray(resid[:, j * dsub:(j + 1) * dsub]),
                     ks, seed=seed + 1 + j) for j in range(m)]
    ks_eff = min(ks, n)
    return np.stack([b[:ks_eff] for b in books])


def train_ivfpq(ds: ray.data.Dataset, n_centroids: int = 8, m: int = 8,
                ks: int = 16, id_col: str = "vec_id",
                vec_col: str = "embedding", sample_size: int = 2048,
                seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Fit the IVF-PQ model on a bounded id-sorted sample: coarse
    centroids (unit-normalized — cosine == L2 on the sphere) plus
    per-subspace residual codebooks.  Driver-side by design: the sample
    is <= sample_size rows and the model (k*dim + m*ks*dim/m floats) is
    broadcast once via ray.put, never re-shipped per batch."""
    sample = _id_sorted_sample(ds, id_col, vec_col, sample_size)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"pq m={m} must divide dim={dim}")
    sn = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-300)
    cent = _kmeans(sn, n_centroids, seed=seed)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
    resid = sn - cn[(sn @ cn.T).argmax(axis=1)]
    return cn, _train_pq(resid, m, ks, seed=seed)


def pq_encode(ds: ray.data.Dataset, cn: np.ndarray, books: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> ray.data.Dataset:
    """Compress the corpus to its IVF-PQ index rows: (id, cell:int64,
    code: fixed_size_list<uint8>[m]) — m bytes of payload per vector.
    One broadcast-model map_batches; the encode itself is two small
    matmuls per subspace (|r - c|^2 = |r|^2 - 2 r.c + |c|^2), never a
    per-row loop."""
    m, ks_eff, dsub = books.shape
    ref = ray.put((cn, books))

    def _enc(t: pa.Table) -> pa.Table:
        cn_b, books_b = ray.get(ref)
        X = _batch_matrix(t, vec_col)
        n = X.shape[0]
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cell": pa.array([], pa.int64()),
                "code": pa.array([], pa.list_(pa.uint8(), m)),
            })
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        cell = (Xn @ cn_b.T).argmax(axis=1)
        R = Xn - cn_b[cell]
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            rj = R[:, j * dsub:(j + 1) * dsub]
            bj = books_b[j]
            d = (rj ** 2).sum(axis=1, keepdims=True) - 2.0 * (rj @ bj.T) \
                + (bj ** 2).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pa.table({
            id_col: t[id_col],
            "cell": pa.array(cell.astype(np.int64), pa.int64()),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        _enc, batch_format="pyarrow")


def knn_ivfpq(ds: ray.data.Dataset, query_ids: list[int], k: int = 10,
              n_centroids: int = 8, n_probe: int = 4, m: int = 8,
              ks: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding", sample_size: int = 2048,
              seed: int = 42, rerank: int = 0) -> ray.data.Dataset:
    """Approximate top-k cosine over the PQ-compressed index via ADC.

    Train (bounded sample) -> encode (streaming map_batches) -> scan:
    per batch, per query, gather LUT sub-distances for rows whose cell
    is probed and sum across subspaces — the scan touches only the m
    uint8 codes, never the raw vectors.  Scores are the ADC cosine
    estimate 1 - d^2/2 (unit sphere) as e6 ints; ranking error vs the
    exact answer is quantization error, measured by knn_ivfpq_recall.
    Deterministic at any parallelism: the LUT is fixed driver state,
    per-batch pruning keeps every row tied with the k-th, and the final
    per-query sort breaks ties by vec_id.

    ``rerank=R > k`` adds the classic refine stage (IVF-PQ+R): the
    compressed scan produces a top-R shortlist (bounded Q*R rows), then
    ONE more pass over the raw vectors rescores only shortlisted ids
    with exact float64 cosine — identical arithmetic to knn_brute, so
    shortlisted true neighbours come back with their exact scores.
    Recall@k then equals the shortlist's recall (near 1 for modest R)
    while the scan side still reads m bytes per vector."""
    cn, books = train_ivfpq(ds, n_centroids, m, ks, id_col, vec_col,
                            sample_size, seed)
    ks_eff = books.shape[1]
    dsub = books.shape[2]
    q_ids, q_mat = _load_queries(ds, id_col, vec_col, query_ids)
    qn = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True),
                            1e-300)
    n_cent = cn.shape[0]
    n_probe = min(n_probe, n_cent)
    q_cells = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]
    # ADC lookup tables, probed cells only: lut[qi, cell, j, t] =
    # ||q_sub - c_sub - book[j,t]||^2.  (Q * n_probe * m * ks floats —
    # driver-bounded by the query-list contract, broadcast once.)
    nq = len(q_ids)
    lut = np.full((nq, n_cent, m, ks_eff), np.inf)
    probe_mask = np.zeros((nq, n_cent), dtype=bool)
    for qi in range(nq):
        for c in q_cells[qi]:
            diff = qn[qi] - cn[c]          # (dim,)
            for j in range(m):
                dj = diff[j * dsub:(j + 1) * dsub]
                lut[qi, c, j] = ((dj[None, :] - books[j]) ** 2).sum(axis=1)
        probe_mask[qi, q_cells[qi]] = True
    ref = ray.put((q_ids, lut, probe_mask))

    codes_ds = pq_encode(ds, cn, books, id_col, vec_col)

    def _scan(t: pa.Table) -> pa.Table:
        ids_b, lut_b, mask_b = ray.get(ref)
        n = t.num_rows
        if n == 0:
            return pa.table({"q": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        vids = _ids_np(t, id_col)
        cells = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        import pyarrow.compute as pc
        codes = pc.list_flatten(t["code"].combine_chunks()).to_numpy(
            zero_copy_only=False).reshape(n, -1)
        jj = np.arange(codes.shape[1])[None, :]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_b)):
            rows = np.flatnonzero(mask_b[qi, cells] & (vids != ids_b[qi]))
            if len(rows) == 0:
                continue
            d2 = lut_b[qi, cells[rows][:, None], jj, codes[rows]].sum(axis=1)
            s = np.rint((1.0 - d2 / 2.0) * 1e6).astype(np.int64)
            if len(rows) > k:
                kth = np.partition(-s, k - 1)[k - 1]
                keep = -s <= kth
                rows, s = rows[keep], s[keep]
            out_q.append(np.full(len(rows), ids_b[qi], dtype=np.int64))
            out_v.append(vids[rows])
            out_s.append(s)
        if not out_q:
            return pa.table({"q": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        return pa.table({"q": np.concatenate(out_q),
                         id_col: np.concatenate(out_v),
                         "score_e6": np.concatenate(out_s)})

    cand = codes_ds.map_batches(_scan, batch_format="pyarrow")

    def _make_topk(kk: int):
        def _topk(t: pa.Table) -> pa.Table:
            qs = t["q"].to_numpy(zero_copy_only=False)
            vs = t[id_col].to_numpy(zero_copy_only=False)
            ss = t["score_e6"].to_numpy(zero_copy_only=False)
            order = np.lexsort((vs, -ss))[:kk]
            return pa.table({"q": qs[order], id_col: vs[order],
                             "score_e6": ss[order]})
        return _topk

    if rerank > k:
        # refine: exact-rescore the bounded Q*R shortlist in one raw pass
        short = pa.concat_tables(list(
            cand.groupby("q").map_groups(_make_topk(rerank),
                                         batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")))
        allow: dict[int, np.ndarray] = {}
        sq = short["q"].to_numpy(zero_copy_only=False)
        sv = short[id_col].to_numpy(zero_copy_only=False)
        for qi, qid in enumerate(q_ids):
            allow[int(qid)] = np.sort(sv[sq == qid])
        rref = ray.put((q_ids, qn, allow))

        def _rescore(t: pa.Table) -> pa.Table:
            ids_b, qn_b, allow_b = ray.get(rref)
            X = _batch_matrix(t, vec_col)
            if X.shape[0] == 0:
                return pa.table({"q": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64()),
                                 "score_e6": pa.array([], pa.int64())})
            vids = _ids_np(t, id_col)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-300)
            sims = np.rint((Xn @ qn_b.T) * 1e6).astype(np.int64)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_b)):
                rows = np.flatnonzero(
                    np.isin(vids, allow_b[int(ids_b[qi])]))
                out_q.append(np.full(len(rows), ids_b[qi], dtype=np.int64))
                out_v.append(vids[rows])
                out_s.append(sims[rows, qi])
            return pa.table({"q": np.concatenate(out_q),
                             id_col: np.concatenate(out_v),
                             "score_e6": np.concatenate(out_s)})

        cand = ds.select_columns([id_col, vec_col]).map_batches(
            _rescore, batch_format="pyarrow")

    return cand.groupby("q").map_groups(_make_topk(k),
                                        batch_format="pyarrow") \
               .sort(["q", "score_e6", id_col],
                     descending=[False, True, False])


def group_centroids(ds: ray.data.Dataset, group_col: str = "label",
                    vec_col: str = "embedding") -> ray.data.Dataset:
    """Group-wise vector centroid — the list-typed-column aggregate: per
    (group, dimension), the component mean over all of the group's
    vectors, emitted as scalar rows ``(group, dim, n_vecs,
    centroid_e6)`` so the result is SQL-comparable and shuffle-friendly.

    Float discipline: each float32 component is quantized ONCE to an e6
    integer (``round(x * 1e6)``); all summation is int64 and therefore
    exact and order-insensitive under any blocking/merge order, and the
    mean is ``floor(sum_e6 / n)`` computed identically in SQL.  (At
    fixture scale the double division is exact; a 100 TB run keeping
    |sum_e6| near 2^53 would emit the (sum_e6, n) pair instead — same
    shuffle, division deferred to the consumer.)

    Scale shape: per-batch segment-sum combiner (np.add.reduceat over a
    label argsort) emits one row per (group, dim) per block, so the
    single groupby shuffle moves combiner output, never vectors."""
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, vec_col)
        if m.size == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_e6": pa.array([], pa.int64()),
            })
        e6 = np.round(m * 1e6).astype(np.int64)
        labs = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(labs, kind="stable")
        sl = labs[order]
        starts = np.concatenate([[0], np.flatnonzero(sl[1:] != sl[:-1]) + 1])
        sums = np.add.reduceat(e6[order], starts, axis=0)
        counts = np.diff(np.concatenate([starts, [len(sl)]]))
        ug = sl[starts]
        d = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(ug, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ug)),
                            pa.int64()),
            "n": pa.array(np.repeat(counts.astype(np.int64), d), pa.int64()),
            "sum_e6": pa.array(sums.reshape(-1), pa.int64()),
        })

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby(["label", "dim"]).aggregate(
        ray.data.aggregate.Sum("n"), ray.data.aggregate.Sum("sum_e6"))

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["label", "dim", "n_vecs", "sum_e6"])
        mean = np.floor(
            t["sum_e6"].to_numpy(zero_copy_only=False).astype(np.float64)
            / t["n_vecs"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "label": t["label"],
            "dim": t["dim"],
            "n_vecs": t["n_vecs"].cast(pa.int64()),
            "centroid_e6": pa.array(mean, pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow") \
              .sort(["label", "dim"])


def embedding_decontaminate(train: ray.data.Dataset,
                            bench: ray.data.Dataset,
                            threshold: float = 0.45,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> ray.data.Dataset:
    """Semantic (embedding-space) decontamination — the cosine
    counterpart of ``corpus.ngram_decontaminate``: for every train
    vector, its max cosine to ANY benchmark vector plus the nearest
    benchmark id; rows at or above ``threshold`` are flagged
    ``contaminated`` (Lee/Brown-style eval-leak screening done
    semantically instead of lexically).

    Output: (id, state contaminated|clean, max_sim_e6, nearest_bench),
    one row per train row, ``nearest_bench`` = the min benchmark id
    among exact-max ties (exact ties only arise from identical vectors,
    where float equality is bit-reliable).

    Scale shape: the benchmark side is BOUNDED BY BENCHMARK SIZE (the
    same contract as the n-gram decontaminator's gram set) — collected
    once, id-sorted, unit-normalized, ``ray.put`` once; each train
    batch does one float32 screen matmul against it and re-scores only
    the rows within the float32 error margin of their row max in
    float64 (same screen/confirm discipline as ``_sim_edges``).  No
    shuffle at all: n rows out for n rows in, embarrassingly parallel."""
    import pyarrow.compute as pc  # noqa: F401  (parity with module style)

    bt = pa.concat_tables(list(
        bench.select_columns([id_col, vec_col])
        .iter_batches(batch_format="pyarrow")))
    B = _batch_matrix(bt, vec_col)
    bids = _ids_np(bt, id_col)
    order = np.argsort(bids, kind="stable")
    B, bids = B[order], bids[order]
    Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
    ref = ray.put((Bn.astype(np.float32), Bn, bids))

    def _score(t: pa.Table) -> pa.Table:
        B32, B64, bid = ray.get(ref)
        m = _batch_matrix(t, vec_col)
        ids = _ids_np(t, id_col)
        n = len(ids)
        if n == 0 or B64.shape[0] == 0:
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "state": pa.array(["clean"] * n, pa.string()),
                "max_sim_e6": pa.array(np.full(n, -2_000_000, np.int64)),
                "nearest_bench": pa.array(np.full(n, -1, np.int64)),
            })
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        s32 = mn.astype(np.float32) @ B32.T
        margin = np.float32(_screen_margin(m.shape[1]))
        cand = s32 >= (s32.max(axis=1, keepdims=True) - margin)
        ci, cj = np.nonzero(cand)
        exact = np.einsum("ij,ij->i", mn[ci], B64[cj])
        best = np.full(n, -np.inf)
        np.maximum.at(best, ci, exact)
        at_max = exact == best[ci]
        nearest = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(nearest, ci[at_max], bid[cj[at_max]])
        contaminated = best >= threshold
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "state": pa.array(
                np.where(contaminated, "contaminated", "clean"),
                pa.string()),
            "max_sim_e6": pa.array(
                np.rint(best * 1e6).astype(np.int64), pa.int64()),
            "nearest_bench": pa.array(nearest, pa.int64()),
        })

    return train.map_batches(_score, batch_format="pyarrow").sort(id_col)
