"""Distributed union-find (alternating large-star/small-star) vs a local
reference implementation (SURVEY.md §5.4)."""

import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.dist import union_find


def _local_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def _run_uf(edges, P=8, local_threshold=2_000_000):
    t = pa.table({"u": pa.array([u for u, _ in edges], pa.uint64()),
                  "v": pa.array([v for _, v in edges], pa.uint64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = union_find(ds, P, local_threshold=local_threshold)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for n, c in zip(b["node"].to_pylist(), b["comp"].to_pylist()):
            got[n] = min(c, got.get(n, c))
    return got


@pytest.mark.parametrize("local_threshold", [2_000_000, 0])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 40), (2, 200, 150),
                                                  (3, 300, 600)])
def test_random_graphs(seed, n_nodes, n_edges, local_threshold):
    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes) + 1, rng.randrange(n_nodes) + 1)
             for _ in range(n_edges)]
    want = _local_components(edges)
    got = _run_uf(edges, local_threshold=local_threshold)
    assert got == want


def test_path_graph_converges():
    # worst case for min propagation: a long path (distributed rounds forced)
    edges = [(i, i + 1) for i in range(1, 80)]
    got = _run_uf(edges, local_threshold=0)
    assert set(got.values()) == {1}
    assert len(got) == 80


@pytest.mark.parametrize("local_threshold", [2_000_000, 0])
def test_self_loops_and_duplicates(local_threshold):
    edges = [(5, 5), (7, 9), (9, 7), (7, 9)]
    got = _run_uf(edges, local_threshold=local_threshold)
    assert got[5] == 5 and got[7] == 7 and got[9] == 7


def test_block_forest_sparsify_invariants():
    # per-block sparsify must (a) never emit more rows than the block's
    # distinct-node count, (b) preserve connectivity exactly, (c) leave
    # final labels identical under adversarial blocking
    from dedup.dist import _block_forest
    rng = random.Random(7)
    # redundant near-clique edges: E >> V inside each cluster
    edges = []
    for base in range(0, 120, 6):
        c = [base + i + 1 for i in range(6)]
        edges += [(rng.choice(c), rng.choice(c)) for _ in range(40)]
    t = pa.table({"u": pa.array([u for u, _ in edges], pa.uint64()),
                  "v": pa.array([v for _, v in edges], pa.uint64())})
    out = _block_forest(t)
    n_nodes = len(set([u for u, _ in edges] + [v for _, v in edges]))
    assert out.num_rows <= n_nodes
    want = _local_components(edges)
    # connectivity preserved: components of the forest == originals
    forest = list(zip(out["u"].to_pylist(), out["v"].to_pylist()))
    got = _local_components(forest)
    nodes_with_real_edge = {x for u, v in edges if u != v for x in (u, v)}
    assert {n: c for n, c in got.items()} == \
        {n: c for n, c in want.items() if n in nodes_with_real_edge}
    # end-to-end: distributed path equals local under two blockings
    for P_in in (1, 13):
        ds = ray.data.from_arrow(t).repartition(P_in)
        res = union_find(ds, 8, local_threshold=0)
        got_e2e = {r["node"]: r["comp"]
                   for b in res.iter_batches(batch_format="pyarrow")
                   for r in b.to_pylist()}
        assert got_e2e == want


def test_block_forest_all_self_loops():
    from dedup.dist import _block_forest
    t = pa.table({"u": pa.array([3, 4], pa.uint64()),
                  "v": pa.array([3, 4], pa.uint64())})
    out = _block_forest(t)
    assert out.num_rows == 0
