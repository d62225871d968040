"""Distributed primitives: partition-level group-apply and union-find.

The engine's wide steps (exact blocking, LSH buckets, SimHash blocks,
anchor buckets, reduce-side joins, union-find rounds, cluster
assignment) all reduce to one pattern:

    hash-partition rows by a uint64 shuffle key  ->  process each
    partition with a VECTORIZED function that groups by the real key
    in numpy/pyarrow.

``groupapply`` implements it as ``map_batches`` (adds ``pkey = mix(key)
% P``) + ``groupby('pkey').map_groups`` — a single all-to-all shuffle
with only P Python-function invocations (P ~ a few per core), instead
of one per key-group.  Keys colocate because equal keys hash equally;
per-key skew inside a partition is the partition fn's job (pair caps /
star edges), which keeps hot keys O(n) instead of O(n^2).

``union_find`` is the hash-to-min connected-components algorithm
(Rastogi et al. 2013, "Finding Connected Components in Map-Reduce in
Logarithmic Rounds"): each round every node proposes the minimum of its
neighborhood to all its neighbors; converges to label = component-min in
O(log d) rounds.  All reduces are order-insensitive minima, so results
are byte-identical at any parallelism — the property that makes the
reference's greedy first-wins pass (MainViewModel.cs:694-781)
reproducible as min-representative connected components (SURVEY.md §2.7 D2).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data

_MIX_MUL = np.uint64(0x9E3779B97F4A7C15)


def quiet_empty_schema_warnings() -> None:
    """Silence ONE specific cosmetic Ray-internal warning: Ray 2.49's
    sort-based groupby/aggregate/map_groups emits EMPTY blocks with no
    schema whenever the shuffle has more partitions than key-groups
    (reproduced with a bare ``ds.groupby(k).aggregate(Count())`` — no
    user UDF involved), and streaming_executor_state.py:793 then logs
    "RefBundle with a different schema".  The blocks are empty, so
    values are unaffected; the warning floods bench output.  The filter
    matches exactly that message and nothing else."""
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return ("RefBundle with a different schema"
                    not in record.getMessage())

    for name in logging.root.manager.loggerDict:
        if name.endswith("streaming_executor_state"):
            logging.getLogger(name).addFilter(_F())
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state").addFilter(_F())


def tune_context() -> None:
    """Size Ray Data's read parallelism to the cluster instead of the
    200-block floor: at sandbox scale the default turns every operator of
    a ~18-stage pipeline into ~200 tiny-block tasks whose scheduling
    overhead dwarfs compute.  At real scale the 128 MiB block-size cap
    governs and this floor is irrelevant, so lowering it is scale-neutral."""
    import ray
    ctx = ray.data.DataContext.get_current()
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ctx.read_op_min_num_blocks = max(8, cpus)
    quiet_empty_schema_warnings()


def iter_blocks(ds: ray.data.Dataset):
    """Driver-side iteration over a (bounded) dataset's blocks as
    pyarrow Tables — the non-deprecated replacement for
    ``get_internal_block_refs``.  Only for small-side collects (labels,
    candidate arrays); corpus-sized data never takes this path."""
    import ray
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            yield ray.get(ref)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche so ``% P`` on structured keys is uniform."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def add_pkey(ds: ray.data.Dataset, key_col: str, num_partitions: int) -> ray.data.Dataset:
    """Append ``pkey = mix64(key) % P`` (key must be uint64-valued)."""
    P = np.uint64(num_partitions)

    def _add(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("pkey", pa.array(mix64(k) % P, type=pa.uint64()))

    return ds.map_batches(_add, batch_format="pyarrow")


def groupapply(
    ds: ray.data.Dataset,
    key_col: str,
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int,
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by uint64 ``key_col`` and apply ``fn`` to each
    partition (a pyarrow.Table holding every row of its key-groups).
    ``fn`` must group by the real key internally (see ``segments``)."""

    def _strip(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns(["pkey"]))

    return add_pkey(ds, key_col, num_partitions).groupby("pkey").map_groups(
        _strip, batch_format="pyarrow"
    )


def segments(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort-based segmentation of a key array: returns (order, starts,
    unique_keys) where ``keys[order]`` is sorted and
    ``starts[i]:starts[i+1]`` (starts has a trailing len) spans group i."""
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    if len(sk) == 0:
        return order, np.zeros(1, dtype=np.int64), sk
    brk = np.flatnonzero(sk[1:] != sk[:-1]) + 1
    starts = np.concatenate([[0], brk, [len(sk)]])
    return order, starts, sk[starts[:-1]]


# ---------------------------------------------------------------------------
# distributed union-find (hash-to-min)
# ---------------------------------------------------------------------------

_EDGE_SCHEMA = pa.schema([("u", pa.uint64()), ("v", pa.uint64()),
                          ("lbl", pa.bool_())])


def _uf_round(t: pa.Table) -> pa.Table:
    """One hash-to-min round over a partition of (u, v[, lbl]) rows.

    For every distinct u in the partition (all rows of u colocate), with
    m = min(neighbors(u) ∪ {u}), emit BOTH halves of hash-to-min:
      * (u, m, lbl=True) — u's current label;
      * (x, m) for every neighbor x — m propagates outward;
      * (m, x) for every x in neighbors(u) ∪ {u} — the min keeps sight of
        the members it must keep relabeling (without this, a node whose
        only neighbor later improves its own label never hears about it).
    """
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    # per-partition dedupe: repeated (u, v) rows accumulate across rounds
    uv = np.stack([u, v], axis=1)
    uv = np.unique(uv, axis=0)
    u, v = uv[:, 0], uv[:, 1]
    order, starts, uniq = segments(u)
    vs = v[order]
    seg_min = np.minimum.reduceat(vs, starts[:-1]) if len(vs) else vs
    m = np.minimum(seg_min, uniq)
    counts = np.diff(starts)
    m_rep = np.repeat(m, counts)
    new_u = np.concatenate([uniq, vs, m_rep, m])
    new_v = np.concatenate([m, m_rep, vs, uniq])
    lbl = np.concatenate([np.ones(len(uniq), dtype=bool),
                          np.zeros(2 * len(vs) + len(uniq), dtype=bool)])
    return pa.table({"u": new_u, "v": new_v, "lbl": lbl}, schema=_EDGE_SCHEMA)


def _label_checksum(pairs: ray.data.Dataset) -> int:
    """Order-insensitive checksum of the labeled rows (exact integer sum
    of mixed (u, label) hashes) — the convergence test."""

    def _cs(t: pa.Table) -> pa.Table:
        sel = t.filter(pa.compute.field("lbl"))
        u = sel["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = sel["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = mix64(u * np.uint64(3) + v)
        # wrap-around partial sum per batch; combined exactly on the driver
        return pa.table({"cs": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64()),
                         "n": pa.array([len(u)], pa.int64())})

    parts = _cs_totals(pairs.map_batches(_cs, batch_format="pyarrow"))
    return parts


def _cs_totals(ds: ray.data.Dataset) -> int:
    tot_cs = 0
    tot_n = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        tot_cs += sum(b["cs"].to_pylist())
        tot_n += sum(b["n"].to_pylist())
    return hash((tot_cs, tot_n))


def _local_union_find(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Driver-side connected components for small edge lists, fully
    vectorized (edge-relaxation + pointer jumping over dense indices).
    np.unique returns node ids sorted, so the minimum dense index of a
    component is its minimum node id — same contract as the rounds."""
    import ray
    eu_l, ev_l = [], []
    for b in iter_blocks(pairs):
        if b.num_rows == 0 or "u" not in b.column_names:
            continue
        eu_l.append(b["u"].to_numpy(zero_copy_only=False).astype(np.uint64))
        ev_l.append(b["v"].to_numpy(zero_copy_only=False).astype(np.uint64))
    eu = np.concatenate(eu_l) if eu_l else np.array([], dtype=np.uint64)
    ev = np.concatenate(ev_l) if ev_l else np.array([], dtype=np.uint64)
    allv = np.concatenate([eu, ev])
    ns = np.sort(allv)
    keep = np.empty(len(ns), dtype=bool)
    if len(ns):
        keep[0] = True
        np.not_equal(ns[1:], ns[:-1], out=keep[1:])
    nodes = ns[keep]
    inv = np.searchsorted(nodes, allv)
    m = len(eu)
    n = len(nodes)
    # symmetric incidence, pre-sorted ONCE by source endpoint so each
    # iteration is gather + segment-min (reduceat) — no ufunc.at
    src = np.concatenate([inv[:m], inv[m:]])
    dst = np.concatenate([inv[m:], inv[:m]])
    order = np.argsort(src, kind="stable")
    src_s = src[order]
    dst_s = dst[order]
    brk = np.flatnonzero(src_s[1:] != src_s[:-1]) + 1
    starts = np.concatenate([[0], brk])
    seg_nodes = src_s[starts]
    label = np.arange(n)
    while True:
        neigh_min = np.minimum.reduceat(label[dst_s], starts)
        l2 = label.copy()
        l2[seg_nodes] = np.minimum(l2[seg_nodes], neigh_min)
        while True:  # pointer jumping to fixpoint
            l3 = l2[l2]
            if np.array_equal(l3, l2):
                break
            l2 = l3
        if np.array_equal(l2, label):
            break
        label = l2
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.uint64()),
        "comp": pa.array(nodes[label], pa.uint64()),
    }))


def union_find(
    edges: ray.data.Dataset,
    num_partitions: int,
    max_rounds: int = 24,
    local_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """Connected components over an edge list of uint64 node ids.

    Input: dataset with columns (u, v).  Output: (node, comp) where comp
    is the minimum node id of the component — one row per node that
    appears in any edge.  Deterministic at any parallelism (min reduces
    only).

    Hybrid execution: edge lists are O(matched docs), orders of magnitude
    smaller than the corpus, so up to ``local_threshold`` edges a driver-
    side path-compressed union-find is both faster and exact; above it the
    distributed hash-to-min rounds run, each materializing only the edge
    table (never the corpus), per SURVEY.md §7.5."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.uint64()),
                      "comp": pa.array([], pa.uint64())}))
    if n_edges <= local_threshold:
        return _local_union_find(edges)

    def _sym(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "u": np.concatenate([u, v]),
            "v": np.concatenate([v, u]),
            "lbl": np.zeros(2 * len(u), dtype=bool),
        }, schema=_EDGE_SCHEMA)

    pairs = edges.map_batches(_sym, batch_format="pyarrow")

    prev = None
    for _ in range(max_rounds):
        pairs = groupapply(pairs, "u", _uf_round, num_partitions).materialize()
        cs = _label_checksum(pairs)
        if cs == prev:
            break
        prev = cs

    def _labels(t: pa.Table) -> pa.Table:
        sel = t.filter(pa.compute.field("lbl"))
        return pa.table({"node": sel["u"], "comp": sel["v"]})

    return pairs.map_batches(_labels, batch_format="pyarrow")
