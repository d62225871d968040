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


# ------------------------------------------------- HyperLogLog distinct

def test_approx_distinct_accuracy_and_blocking_invariance():
    from dedup.textstats import approx_distinct
    rng = np.random.default_rng(31)
    true_n = 5000
    vals = [f"key-{i}" for i in rng.integers(0, true_n, 20000)]
    # ensure every key appears so the true distinct count is exact
    vals += [f"key-{i}" for i in range(true_n)]
    t = pa.table({"v": pa.array(vals)})
    a = approx_distinct(ray.data.from_arrow(t), "v", precision=12)
    b = approx_distinct(ray.data.from_arrow(t).repartition(13), "v",
                        precision=12)
    assert a == b  # register maxima are blocking-insensitive
    assert abs(a - true_n) / true_n <= 3 * 1.04 / (1 << 12) ** 0.5


def test_approx_distinct_small_range_linear_counting():
    from dedup.textstats import approx_distinct
    t = pa.table({"v": pa.array([f"x{i % 40}" for i in range(500)])})
    est = approx_distinct(ray.data.from_arrow(t), "v", precision=12)
    assert est == 40  # linear counting is exact this far below m


def test_approx_distinct_pre_split_tokens():
    from dedup.textstats import approx_distinct
    t = pa.table({"text": pa.array(["a b  c", "b c d", "", None])})
    est = approx_distinct(ray.data.from_arrow(t), "text", precision=12,
                          pre_split=True)
    assert est == 4


# ------------------------------------------------- grouped quantiles

def test_grouped_quantiles_matches_duckdb():
    import duckdb
    from dedup.textstats import grouped_quantiles
    rng = np.random.default_rng(33)
    g = rng.choice(["en", "de", "fr"], 900).tolist()
    v = rng.integers(0, 250, 900).astype(np.int64)
    t = pa.table({"lang": pa.array(g), "n": pa.array(v, pa.int64())})
    out = grouped_quantiles(ray.data.from_arrow(t).repartition(7),
                            "lang", "n").to_pandas()
    want = duckdb.connect().execute("""
        SELECT lang, CAST(count(n) AS BIGINT) AS n,
               CAST(min(n) AS BIGINT) AS min_value,
               CAST(max(n) AS BIGINT) AS max_value,
               CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25,
               CAST(quantile_disc(n, 0.50) AS BIGINT) AS p50,
               CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75,
               CAST(quantile_disc(n, 0.90) AS BIGINT) AS p90,
               CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99
        FROM t GROUP BY lang ORDER BY lang""").df()
    assert out.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_grouped_quantiles_empty():
    from dedup.textstats import grouped_quantiles
    t = pa.table({"lang": pa.array([], pa.string()),
                  "n": pa.array([], pa.int64())})
    out = grouped_quantiles(ray.data.from_arrow(t), "lang", "n")
    assert out.num_rows == 0
    assert "p99" in out.column_names


# ------------------------------------------------- bigram surprisal

def _naive_bigram_surprisal(texts):
    """Pure-Python reference: corpus MLE bigram model, floor-e6 per
    unique bigram, per-doc integer mean."""
    docs = [[w for w in (t or "").split() if w] for t in texts]
    bgs = [list(zip(ws, ws[1:])) for ws in docs]
    cnt = collections.Counter(b for d in bgs for b in d)
    pref = collections.Counter()
    for (w1, _), c in cnt.items():
        pref[w1] += c
    lp6 = {b: math.floor(math.log(c / pref[b[0]]) * 1e6)
           for b, c in cnt.items()}
    out = []
    for d in bgs:
        nb = len(d)
        s = sum(lp6[b] for b in d)
        out.append((nb, (-s) // nb if nb else 0))
    return out


@pytest.mark.parametrize("mode", ["broadcast", "reduce"])
def test_bigram_surprisal_matches_naive(mode):
    from dedup.textstats import bigram_surprisal
    rng = np.random.default_rng(35)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 12)))
             for _ in range(80)] + ["", "one"]
    t = pa.table({"doc_id": pa.array(range(82), pa.int64()),
                  "text": pa.array(texts)})
    out = bigram_surprisal(ray.data.from_arrow(t).repartition(6),
                           mode=mode).to_pandas()
    want = _naive_bigram_surprisal(texts)
    assert out["doc_id"].tolist() == list(range(82))
    assert out["n_bigrams"].tolist() == [w[0] for w in want]
    assert out["surprisal2_e6"].tolist() == [w[1] for w in want]


def test_bigram_surprisal_modes_byte_identical():
    from dedup.textstats import bigram_surprisal
    rng = np.random.default_rng(36)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 20)))
             for _ in range(60)]
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(texts)})
    a = bigram_surprisal(ray.data.from_arrow(t), mode="broadcast") \
        .to_pandas()
    b = bigram_surprisal(ray.data.from_arrow(t).repartition(5),
                         mode="reduce").to_pandas()
    assert a.equals(b)


# ------------------------------------------------- user event deltas

def test_user_event_deltas_matches_naive():
    from dedup.windows import user_event_deltas
    rng = np.random.default_rng(37)
    n = 300
    users = rng.integers(0, 12, n).astype(np.int64)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 10**7, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })
    out = user_event_deltas(ray.data.from_arrow(t).repartition(7)) \
        .to_pandas()
    rows = sorted(zip(users.tolist(), ts.tolist(), range(n)))
    want = {}
    prev_user, prev_ts = None, None
    for u, s, e in rows:
        want[e] = -1 if u != prev_user else s - prev_ts
        prev_user, prev_ts = u, s
    assert len(out) == n
    got = dict(zip(out["event_id"], out["prev_gap_us"]))
    assert got == want
    # output is (user, ts, id)-sorted
    key = list(zip(out["user_id"], out["ts"], out["event_id"]))
    assert key == sorted(key)


def test_user_event_deltas_tie_break_on_event_id():
    from dedup.windows import user_event_deltas
    ts0 = np.int64(1_700_000_000_000_000)
    t = pa.table({
        "event_id": pa.array([5, 2, 9], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([ts0, ts0, ts0], pa.int64()).cast(
            pa.timestamp("us")),
    })
    out = user_event_deltas(ray.data.from_arrow(t)).to_pandas()
    assert out["event_id"].tolist() == [2, 5, 9]
    assert out["prev_gap_us"].tolist() == [-1, 0, 0]


def test_windowed_distinct_matches_naive_and_blocking():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from dedup.windows import windowed_distinct
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    rows = [{"ts": base + pd.Timedelta(minutes=int(rng.integers(0, 600))),
             "user_id": int(rng.integers(0, 25))} for _ in range(800)]
    t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    got = windowed_distinct(ray.data.from_arrow(t).repartition(4),
                            key_col="user_id").to_pandas()
    df = pd.DataFrame(rows)
    df["w"] = df["ts"].dt.floor("h")
    want = df.groupby("w").agg(n_distinct=("user_id", "nunique"),
                               n_events=("user_id", "size")).reset_index()
    assert got["window_start"].tolist() == want["w"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    got2 = windowed_distinct(ray.data.from_arrow(t).repartition(13),
                             key_col="user_id",
                             num_partitions=5).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))


def test_grouped_heavy_hitters_exact_and_blocking_invariant():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from collections import Counter
    from dedup.textstats import grouped_heavy_hitters
    rng = np.random.default_rng(11)
    langs = ["en", "de", "fr"]
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(300):
        g = langs[int(rng.integers(0, 3))]
        # skew: each lang has its own hot word
        pool = words + [f"hot_{g}"] * 15
        rows.append({"doc_id": i, "lang": g,
                     "text": " ".join(rng.choice(pool, size=12))})
    rows.append({"doc_id": 300, "lang": None, "text": "skip me"})
    cap = 16
    got = grouped_heavy_hitters(
        ray.data.from_items(rows).repartition(4), group_col="lang",
        capacity=cap).to_pandas()
    # naive exact answer
    want = []
    for g in langs:
        c = Counter()
        for r in rows:
            if r["lang"] == g:
                c.update(r["text"].split())
        n_g = sum(c.values())
        for tok, cnt in c.items():
            if cnt * cap > n_g:
                want.append((g, tok, cnt))
    want.sort(key=lambda x: (x[0], -x[2], x[1]))
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert any(t.startswith("hot_") for _, t, _ in want)  # non-vacuous
    got2 = grouped_heavy_hitters(
        ray.data.from_items(rows).repartition(13), group_col="lang",
        capacity=cap).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))
