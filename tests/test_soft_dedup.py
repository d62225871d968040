"""soft_dedup keep-up-to-k post-pass (dedup/pipeline.py)."""

import pyarrow as pa
import pytest
import ray.data

from dedup.pipeline import soft_dedup


def _asn(rows, id_type=pa.int64()):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], id_type),
        "state": pa.array([r[1] for r in rows], pa.string()),
        "cluster_id": pa.array([r[2] for r in rows], id_type),
        "cluster_size": pa.array([r[3] for r in rows], pa.int64()),
    }))


_ROWS = [
    # cluster 10: size 4 (keeper 10)
    (10, "keep", 10, 4), (11, "delete", 10, 4),
    (12, "delete", 10, 4), (13, "delete", 10, 4),
    # cluster 20: size 2
    (20, "keep", 20, 2), (21, "delete", 20, 2),
    # non-clustered rows pass through untouched
    (30, "unique", -1, 1), (31, "ignored", -1, 0), (32, "error", -1, 0),
]


def _collect(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return {r.doc_id: (r.state, r.cluster_id, r.cluster_size, r.copy_rank)
            for r in df.itertuples()}


def test_soft_dedup_k2_keeps_two_per_cluster():
    got = _collect(soft_dedup(_asn(_ROWS), k=2, num_partitions=3))
    assert got == {
        10: ("keep", 10, 4, 0), 11: ("keep", 10, 4, 1),
        12: ("delete", 10, 4, 2), 13: ("delete", 10, 4, 3),
        20: ("keep", 20, 2, 0), 21: ("keep", 20, 2, 1),
        30: ("unique", -1, 1, 0), 31: ("ignored", -1, 0, 0),
        32: ("error", -1, 0, 0),
    }


def test_soft_dedup_k1_reproduces_input_states():
    base = _asn(_ROWS)
    got = _collect(soft_dedup(base, k=1, num_partitions=2))
    for doc_id, st, cid, csz in _ROWS:
        assert got[doc_id][:3] == (st, cid, csz)


def test_soft_dedup_keeper_first_even_when_not_id_minimum():
    # a 'longest'/'priority' policy can pick a keeper that is NOT the
    # id minimum; copy_rank 0 must still be the policy keeper
    rows = [(5, "delete", 7, 3), (6, "delete", 7, 3), (7, "keep", 7, 3)]
    got = _collect(soft_dedup(_asn(rows), k=2, num_partitions=2))
    assert got == {7: ("keep", 7, 3, 0), 5: ("keep", 7, 3, 1),
                   6: ("delete", 7, 3, 2)}


def test_soft_dedup_string_ids():
    rows = [("u/a", "keep", "u/a", 3), ("u/b", "delete", "u/a", 3),
            ("u/c", "delete", "u/a", 3), ("v/x", "unique", "", 1)]
    ds = _asn(rows, id_type=pa.string())
    got = _collect(soft_dedup(ds, k=2, id_col="doc_id", num_partitions=2))
    assert got["u/a"] == ("keep", "u/a", 3, 0)
    assert got["u/b"] == ("keep", "u/a", 3, 1)
    assert got["u/c"] == ("delete", "u/a", 3, 2)
    assert got["v/x"] == ("unique", "", 1, 0)


def test_soft_dedup_partitioning_invariant():
    a = _collect(soft_dedup(_asn(_ROWS), k=3, num_partitions=1))
    b = _collect(soft_dedup(_asn(_ROWS).repartition(5), k=3,
                            num_partitions=7))
    assert a == b


def test_soft_dedup_k_validation():
    with pytest.raises(ValueError):
        soft_dedup(_asn(_ROWS), k=0)


def test_soft_dedup_preserves_extra_columns():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "state": pa.array(["keep", "delete", "unique"], pa.string()),
        "cluster_id": pa.array([1, 1, -1], pa.int64()),
        "cluster_size": pa.array([2, 2, 1], pa.int64()),
        "n_chars": pa.array([100, 200, 300], pa.int64()),
    })
    out = soft_dedup(ray.data.from_arrow(t), k=1,
                     num_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_chars) == [100, 200, 300]        # no NaN, no drop
    assert str(out.n_chars.dtype) == "int64"


def test_soft_dedup_null_state_passes_through():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "state": pa.array(["keep", "delete", None], pa.string()),
        "cluster_id": pa.array([1, 1, -1], pa.int64()),
        "cluster_size": pa.array([2, 2, 0], pa.int64()),
    })
    out = soft_dedup(ray.data.from_arrow(t), k=2,
                     num_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 3                               # nothing vanished
    assert out.state.isna()[2] and out.copy_rank[2] == 0


def test_soft_dedup_matches_pandas_rank_on_random_assignments():
    # randomized cross-check vs the SQL contract: for keeper='first'
    # shaped inputs (keeper == min id per cluster), state must equal
    # rank(doc_id within cluster) < k and copy_rank the 0-based rank
    import numpy as np
    import pandas as pd
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        rows = []
        nid = 0
        for c in range(30):
            size = int(rng.integers(1, 6))
            ids = sorted(int(nid + i) for i in range(size))
            nid += size + int(rng.integers(0, 3))
            if size == 1:
                rows.append((ids[0], "unique", -1, 1))
            else:
                for j, d in enumerate(ids):
                    rows.append((d, "keep" if j == 0 else "delete",
                                 ids[0], size))
        k = int(rng.integers(1, 4))
        got = _collect(soft_dedup(_asn(rows), k=k, num_partitions=4))
        df = pd.DataFrame(rows, columns=["doc_id", "state",
                                         "cluster_id", "cluster_size"])
        cl = df[df.state.isin(["keep", "delete"])].copy()
        cl["rk"] = cl.groupby("cluster_id").doc_id.rank(
            method="first").astype(int) - 1
        for r in cl.itertuples():
            want_state = "keep" if r.rk < k else "delete"
            assert got[r.doc_id] == (want_state, r.cluster_id,
                                     r.cluster_size, r.rk), \
                (seed, k, r.doc_id)
        for r in df[~df.state.isin(["keep", "delete"])].itertuples():
            assert got[r.doc_id] == (r.state, r.cluster_id,
                                     r.cluster_size, 0)


def test_soft_dedup_is_resoftenable():
    # softening a soften output must recompute copy_rank, not crash on
    # a duplicate column; k=3 over a k=1 output restores more keeps
    base = _asn(_ROWS)
    s1 = soft_dedup(base, k=1, num_partitions=2).materialize()
    s2 = _collect(soft_dedup(s1, k=3, num_partitions=3))
    want = _collect(soft_dedup(base, k=3, num_partitions=2))
    assert s2 == want
