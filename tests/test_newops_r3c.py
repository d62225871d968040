"""Fourth-session round-3 operators: gap-island temporal dedup, scoped
line dedup, embedding-space decontamination, per-group dedup savings —
naive-parity and cross-blocking determinism."""

import numpy as np
import pyarrow as pa
import ray.data

from dedup.ann import embedding_decontaminate
from dedup.corpus import line_dedup
from dedup.relational import group_savings
from dedup.windows import windowed_dedup


# ------------------------------------------------- windowed (gap-island)

def _events_table(seed=7, n=400, n_keys=25):
    rng = np.random.default_rng(seed)
    keys = [f"payload-{i}" for i in range(n_keys)]
    ks = rng.choice(keys, size=n)
    # microsecond timestamps over ~10 days with lumpy spacing so some
    # same-key rows fall inside the window and some outside
    ts = np.sort(rng.integers(0, 10 * 86400 * 1_000_000, size=n))
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "props": pa.array(ks.tolist(), pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def _naive_windowed(t: pa.Table, window_minutes: int):
    gap = window_minutes * 60 * 1_000_000
    rows = sorted(zip(t["props"].to_pylist(),
                      t["ts"].cast(pa.int64()).to_pylist(),
                      t["event_id"].to_pylist()))
    out = {}
    islands = []
    prev_key, prev_ts = None, None
    for k, ts, eid in rows:
        if k != prev_key or ts - prev_ts > gap:
            islands.append([])
        islands[-1].append((ts, eid))
        prev_key, prev_ts = k, ts
    for isl in islands:
        first = isl[0][1]
        for j, (_, eid) in enumerate(isl):
            if len(isl) == 1:
                out[eid] = ("unique", -1, 1)
            else:
                out[eid] = ("keep" if j == 0 else "delete", first, len(isl))
    return out


def test_windowed_dedup_naive_parity():
    t = _events_table()
    got = windowed_dedup(ray.data.from_arrow(t), window_minutes=90).take_all()
    want = _naive_windowed(t, 90)
    assert len(got) == t.num_rows
    for r in got:
        st, isl, sz = want[r["event_id"]]
        assert (r["state"], r["island_id"], r["island_size"]) == (st, isl, sz)


def test_windowed_dedup_gap_splits_islands():
    # one key, three bursts separated by > window
    ts = [0, 60, 120, 10_000_000_000, 10_000_000_060, 99_000_000_000]
    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "props": pa.array(["k"] * 6, pa.string()),
        "ts": pa.array(np.array(ts) * 1000, pa.timestamp("us")),
    })
    got = {r["event_id"]: r for r in
           windowed_dedup(ray.data.from_arrow(t),
                          window_minutes=1).take_all()}
    assert [got[i]["state"] for i in range(6)] == \
        ["keep", "delete", "delete", "keep", "delete", "unique"]
    assert got[0]["island_id"] == 0 and got[1]["island_id"] == 0
    assert got[3]["island_id"] == 3 and got[4]["island_id"] == 3
    assert got[5]["island_id"] == -1 and got[5]["island_size"] == 1


def test_windowed_dedup_blocking_invariance():
    t = _events_table(seed=11)
    a = windowed_dedup(ray.data.from_arrow(t), window_minutes=90,
                       num_partitions=1).take_all()
    b = windowed_dedup(
        ray.data.from_arrow(t).repartition(7), window_minutes=90,
        num_partitions=5).take_all()
    assert a == b


# ------------------------------------------------------ scoped line dedup

def _line_docs():
    shared = "the same boilerplate line everywhere"
    rows = [
        (0, "s1", f"{shared}\nalpha one"),
        (1, "s1", f"{shared}\nbeta two"),
        (2, "s2", f"{shared}\ngamma three"),
        (3, "s2", f"{shared}\nalpha one"),  # 'alpha one' dup across scopes
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })


def test_line_dedup_scoped_keeps_first_per_scope():
    t = _line_docs()
    got = {r["doc_id"]: r for r in
           line_dedup(ray.data.from_arrow(t),
                      scope_col="source").take_all()}
    # boilerplate survives once PER SOURCE: docs 0 and 2 keep it
    assert got[0]["text_dedup"].startswith("the same boilerplate")
    assert got[2]["text_dedup"].startswith("the same boilerplate")
    assert not got[1]["text_dedup"].startswith("the same boilerplate")
    # 'alpha one' is in different scopes -> kept in BOTH 0 and 3
    assert got[0]["text_dedup"].endswith("alpha one")
    assert got[3]["text_dedup"].endswith("alpha one")
    # unscoped: boilerplate survives only globally-first doc 0,
    # and doc 3's 'alpha one' dedups against doc 0's
    glob = {r["doc_id"]: r for r in
            line_dedup(ray.data.from_arrow(t)).take_all()}
    assert not glob[2]["text_dedup"].startswith("the same boilerplate")
    assert not glob[3]["text_dedup"].endswith("alpha one")


def test_line_dedup_scoped_blocking_invariance():
    t = _line_docs()
    a = line_dedup(ray.data.from_arrow(t), scope_col="source",
                   num_partitions=1).take_all()
    b = line_dedup(ray.data.from_arrow(t).repartition(3),
                   scope_col="source", num_partitions=4).take_all()
    assert sorted(a, key=lambda r: r["doc_id"]) == \
        sorted(b, key=lambda r: r["doc_id"])


# ------------------------------------------- embedding decontamination

def test_embedding_decontaminate_planted():
    rng = np.random.default_rng(3)
    dim = 8
    bench_vecs = rng.standard_normal((3, dim))
    # train: row 0 copies bench 1 (contaminated, sim 1.0), rest random
    train_vecs = rng.standard_normal((5, dim))
    train_vecs[0] = bench_vecs[1]

    def tbl(ids, m):
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float64())),
        })

    bench = ray.data.from_arrow(tbl([100, 101, 102], bench_vecs))
    train = ray.data.from_arrow(tbl([0, 1, 2, 3, 4], train_vecs))
    got = {r["vec_id"]: r for r in
           embedding_decontaminate(train, bench,
                                   threshold=0.95).take_all()}
    assert got[0]["state"] == "contaminated"
    assert got[0]["max_sim_e6"] == 1_000_000
    assert got[0]["nearest_bench"] == 101
    for i in (1, 2, 3, 4):
        assert got[i]["state"] == "clean"
        assert got[i]["max_sim_e6"] < 950_000
        assert got[i]["nearest_bench"] in (100, 101, 102)


def test_embedding_decontaminate_tie_breaks_to_min_bench_id():
    v = [1.0, 0.0, 0.0, 0.0]
    bench = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([7, 3], pa.int64()),
        "embedding": pa.array([v, v], pa.list_(pa.float64())),
    }))
    train = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array([v], pa.list_(pa.float64())),
    }))
    r = embedding_decontaminate(train, bench, threshold=0.9).take_all()[0]
    assert r["nearest_bench"] == 3 and r["state"] == "contaminated"


# --------------------------------------------------- group savings report

def test_group_savings_arithmetic():
    asn = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "state": pa.array(["keep", "delete", "unique",
                           "keep", "delete", "delete"], pa.string()),
    }))
    weights = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "lang": pa.array(["en", "en", "en", "de", "de", "de"], pa.string()),
        "n_chars": pa.array([10, 30, 60, 100, 50, 50], pa.int64()),
    }))
    got = {r["lang"]: r for r in group_savings(asn, weights).take_all()}
    en, de = got["en"], got["de"]
    assert (en["n_docs"], en["n_delete"]) == (3, 1)
    assert (en["weight_total"], en["weight_deleted"]) == (100, 30)
    assert en["saved_frac_e6"] == 300_000
    assert (de["n_docs"], de["n_delete"]) == (3, 2)
    assert (de["weight_total"], de["weight_deleted"]) == (200, 100)
    assert de["saved_frac_e6"] == 500_000
