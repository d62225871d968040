"""asof_join: backward as-of semantics, tie-breaks, unmatched rows."""

import numpy as np
import pyarrow as pa
import ray.data

from dedup.windows import asof_join


def _run(left_t, right_t, P=3):
    out = asof_join(
        ray.data.from_arrow(left_t), ray.data.from_arrow(right_t),
        on_key=("k", "k"), on_ts=("ts", "ts"), id_col="id",
        value_cols=("val",), num_partitions=P,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    return out


def test_asof_backward_inclusive_and_unmatched():
    left = pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([5, 10, 15, 7, 4], pa.int64()),
        "id": pa.array([100, 101, 102, 103, 104], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([5, 12, 8, 3], pa.int64()),
        "val": pa.array([50, 120, 80, 30], pa.int64()),
    })
    out = _run(left, right)
    # id 100: ts=5 matches right ts=5 (inclusive)
    # id 101: ts=10 -> right ts=5; id 102: ts=15 -> right ts=12
    # id 103: k=2 ts=7 -> right ts=3; id 104: k=3 unmatched
    assert out["val"].tolist() == [50, 50, 120, 30, -1]


def test_asof_right_ts_tie_breaks_to_max_first_value():
    left = pa.table({"k": pa.array([1], pa.int64()),
                     "ts": pa.array([10], pa.int64()),
                     "id": pa.array([1], pa.int64())})
    right = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                      "ts": pa.array([10, 10, 4], pa.int64()),
                      "val": pa.array([7, 9, 1], pa.int64())})
    out = _run(left, right)
    assert out["val"].tolist() == [9]


def test_asof_deterministic_across_partitions():
    rng = np.random.default_rng(3)
    n_l, n_r = 500, 300
    left = pa.table({
        "k": pa.array(rng.integers(0, 20, n_l), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, n_l), pa.int64()),
        "id": pa.array(np.arange(n_l), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 25, n_r), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, n_r), pa.int64()),
        "val": pa.array(rng.integers(0, 10**6, n_r), pa.int64()),
    })
    a = _run(left, right, P=2)
    b = _run(left, right, P=9)
    assert a.equals(b)

    # cross-check vs a brute-force reference
    lk = left["k"].to_numpy()
    lts = left["ts"].to_numpy()
    rk = right["k"].to_numpy()
    rts = right["ts"].to_numpy()
    rv = right["val"].to_numpy()
    expect = []
    for i in range(n_l):
        m = (rk == lk[i]) & (rts <= lts[i])
        if not m.any():
            expect.append(-1)
            continue
        best_ts = rts[m].max()
        expect.append(int(rv[m & (rts == best_ts)].max()))
    assert a.sort_values("id")["val"].tolist() == expect
