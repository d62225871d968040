"""Round-3 operators: sliding-window aggregate, broadcast range join,
heavy hitters (sketch-then-verify), per-doc TF-IDF top-k — all naive-
parity tested against pure-Python references."""

import collections
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.relational import range_join
from dedup.textstats import heavy_hitters, tfidf_top_terms
from dedup.windows import sliding_aggregate


# ---------------------------------------------------------------- sliding

def _events_table(n=400, seed=7):
    rng = np.random.default_rng(seed)
    base = np.int64(1_600_000_000_000_000)  # us epoch
    ts = base + rng.integers(0, 6 * 3600, n).astype(np.int64) * 1_000_000
    return pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })


def _naive_sliding(t, window_min, slide_min):
    n_w = window_min // slide_min
    slide_us = slide_min * 60 * 1_000_000
    agg = collections.defaultdict(lambda: [0, 0])
    ts = t["ts"].cast(pa.int64()).to_pylist()
    et = t["event_type"].to_pylist()
    val = t["value"].to_pylist()
    for s, e, v in zip(ts, et, val):
        cents = round(v * 100)
        base = (s // slide_us) * slide_us
        for k in range(n_w):
            cell = agg[(base - k * slide_us, e)]
            cell[0] += 1
            cell[1] += cents
    return {k: tuple(v) for k, v in agg.items()}


def test_sliding_aggregate_matches_naive():
    t = _events_table()
    out = sliding_aggregate(ray.data.from_arrow(t), window_minutes=60,
                            slide_minutes=15).to_pandas()
    naive = _naive_sliding(t, 60, 15)
    assert len(out) == len(naive)
    for _, r in out.iterrows():
        key = (int(r["window_start"].value // 1000) * 1000
               if hasattr(r["window_start"], "value")
               else int(r["window_start"]), r["event_type"])
        # pandas Timestamp.value is ns; our key is us
        key = (key[0] // 1000, key[1]) if key[0] > 10**17 else key
        n, cents = naive[key]
        assert r["n_events"] == n
        assert r["total_value_cents"] == cents
    # every event is in exactly window/slide windows
    assert out["n_events"].sum() == t.num_rows * 4


def test_sliding_equals_tumbling_when_window_is_slide():
    from dedup.windows import hourly_aggregate
    t = _events_table(n=300, seed=11)
    slid = sliding_aggregate(ray.data.from_arrow(t), window_minutes=60,
                             slide_minutes=60).to_pandas()
    hour = hourly_aggregate(ray.data.from_arrow(t)).to_pandas()
    assert len(slid) == len(hour)
    assert slid["n_events"].tolist() == hour["n_events"].tolist()
    # hourly sums floats then rounds; sliding rounds per event — equal
    # only when per-event cents are exact, which _events_table's
    # 2-decimal values guarantee within fp error of round()
    assert (slid["total_value_cents"] - hour["total_value_cents"]) \
        .abs().max() <= 1


def test_sliding_rejects_non_divisible():
    with pytest.raises(ValueError):
        sliding_aggregate(ray.data.from_arrow(_events_table(8)),
                          window_minutes=60, slide_minutes=25)


# --------------------------------------------------------------- range join

BANDS = pa.table({
    "lo": pa.array([0, 200, 400, 800], pa.int64()),
    "hi": pa.array([200, 400, 800, 1600], pa.int64()),
    "band": pa.array(["tiny", "small", "medium", "large"]),
})


def test_range_join_half_open_and_nulls():
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([0, 199, 200, 799, 1600, 5000], pa.int64()),
    }))
    out = range_join(ds, BANDS, value_col="v").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["band"].tolist()[:4] == ["tiny", "tiny", "small", "medium"]
    assert out["band"].isna().tolist() == [False] * 4 + [True, True]


def test_range_join_rejects_overlap():
    bad = pa.table({"lo": pa.array([0, 5], pa.int64()),
                    "hi": pa.array([10, 15], pa.int64()),
                    "band": pa.array(["a", "b"])})
    with pytest.raises(ValueError):
        range_join(ray.data.from_arrow(pa.table(
            {"v": pa.array([1], pa.int64())})), bad, value_col="v")


def test_range_join_random_vs_naive():
    rng = np.random.default_rng(5)
    v = rng.integers(-50, 2000, 500).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v, pa.int64())}))
    out = range_join(ds, BANDS, value_col="v").to_pandas()
    lo = BANDS["lo"].to_pylist()
    hi = BANDS["hi"].to_pylist()
    lab = BANDS["band"].to_pylist()

    def naive(x):
        for l, h, b in zip(lo, hi, lab):
            if l <= x < h:
                return b
        return None

    got = dict(zip(out["v"], out["band"].where(out["band"].notna(), None)))
    for x in np.unique(v):
        assert got[x] == naive(int(x)), int(x)


# ------------------------------------------------------------ heavy hitters

def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_heavy_hitters_exact_vs_naive():
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(200)]
    weights = np.array([100.0] * 5 + [1.0] * 195)
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=40, p=weights))
             for _ in range(60)]
    out = heavy_hitters(ray.data.from_arrow(_docs_table(texts)),
                        capacity=50).to_pandas()
    cnt = collections.Counter(w for s in texts for w in s.split())
    n = sum(cnt.values())
    want = sorted(((c, t) for t, c in cnt.items() if c * 50 > n),
                  key=lambda x: (-x[0], x[1]))
    assert out["token"].tolist() == [t for _, t in want]
    assert out["cnt"].tolist() == [c for c, _ in want]


def test_heavy_hitters_empty_and_no_hitters():
    # uniform vocab with capacity tighter than any frequency -> empty
    texts = [" ".join(f"u{i}_{j}" for j in range(20)) for i in range(10)]
    out = heavy_hitters(ray.data.from_arrow(_docs_table(texts)),
                        capacity=3)
    # schema survives the empty result (ray's to_pandas drops columns
    # on a 0-row dataset, so assert on the Arrow schema)
    assert out.schema().names == ["token", "cnt"]
    assert out.count() == 0


# ------------------------------------------------------------------- tfidf

def _naive_tfidf(texts, k):
    docs = [[w for w in s.split() if w] for s in texts]
    n_docs = len(docs)
    df = collections.Counter(w for d in docs for w in set(d))
    idf6 = {w: math.floor(math.log(n_docs / c) * 1e6)
            for w, c in df.items()}
    rows = []
    for i, d in enumerate(docs):
        tf = collections.Counter(d)
        scored = sorted(((tf[w] * idf6[w], w) for w in tf),
                        key=lambda x: (-x[0], x[1]))[:k]
        for s, w in scored:
            rows.append((i, w, tf[w], s))
    return rows


def test_tfidf_matches_naive():
    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(40)] + ["", "  "]
    out = tfidf_top_terms(ray.data.from_arrow(_docs_table(texts)), k=3) \
        .to_pandas()
    got = list(zip(out["doc_id"], out["token"], out["tf"], out["tfidf_e6"]))
    want = _naive_tfidf(texts, 3)
    assert sorted(got) == sorted(want)
    # per-doc ordering: tfidf desc then token asc
    for doc in set(out["doc_id"]):
        sub = out[out["doc_id"] == doc]
        keys = list(zip(-sub["tfidf_e6"], sub["token"]))
        assert keys == sorted(keys)


def test_tfidf_deterministic_across_blocking():
    texts = [f"alpha beta w{i} w{i} gamma" for i in range(30)]
    t = _docs_table(texts)
    a = tfidf_top_terms(ray.data.from_arrow(t), k=2).to_pandas()
    b = tfidf_top_terms(
        ray.data.from_arrow(t).repartition(7), k=2).to_pandas()
    assert a.equals(b)


# --------------------------------------------------------- group centroids

def test_group_centroids_matches_naive():
    from dedup.ann import group_centroids
    rng = np.random.default_rng(21)
    n, d = 120, 8
    m = rng.normal(size=(n, d)).astype(np.float32)
    labs = rng.integers(0, 4, n).astype(np.int32)
    t = pa.table({
        "label": pa.array(labs, pa.int32()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), d).cast(
            pa.list_(pa.float32())),
    })
    out = group_centroids(ray.data.from_arrow(t).repartition(5)) \
        .to_pandas()
    e6 = np.round(m.astype(np.float64) * 1e6).astype(np.int64)
    for lab in np.unique(labs):
        sel = e6[labs == lab]
        want = np.floor(sel.sum(axis=0).astype(np.float64)
                        / len(sel)).astype(np.int64)
        sub = out[out["label"] == lab].sort_values("dim")
        assert sub["n_vecs"].tolist() == [len(sel)] * d
        assert sub["centroid_e6"].tolist() == want.tolist()


def test_group_centroids_deterministic_across_blocking():
    from dedup.ann import group_centroids
    rng = np.random.default_rng(22)
    m = rng.normal(size=(60, 4)).astype(np.float32)
    labs = (np.arange(60) % 3).astype(np.int32)
    t = pa.table({
        "label": pa.array(labs, pa.int32()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), 4).cast(
            pa.list_(pa.float32())),
    })
    a = group_centroids(ray.data.from_arrow(t)).to_pandas()
    b = group_centroids(ray.data.from_arrow(t).repartition(9)).to_pandas()
    assert a.equals(b)
