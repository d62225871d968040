"""Third-session round-3 operators: count-min sketch, inverted index
(postings), integer-exact weighted sampling — naive/DuckDB parity and
blocking-invariance tested."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.textstats import cms_build, cms_query, postings, weighted_sample


# ------------------------------------------------------- count-min sketch

def _token_table(n_docs=200, seed=41):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(300)]
    # zipf-ish: low ids far more frequent
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 40), p=probs))
             for _ in range(n_docs)]
    return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts)})


def _exact_counts(texts):
    import collections
    c = collections.Counter()
    for t in texts:
        c.update(w for w in (t or "").split() if w)
    return c


def test_cms_overestimates_never_under_and_tight_when_wide():
    t = _token_table()
    exact = _exact_counts(t["text"].to_pylist())
    sk = cms_build(ray.data.from_arrow(t), "text", depth=4, width=1 << 14,
                   pre_split=True)
    toks = list(exact)
    est = cms_query(sk, toks)
    true = np.array([exact[x] for x in toks], np.int64)
    assert (est >= true).all()          # CMS never undercounts
    # 300 distinct tokens in 2^14 cells: collisions ~0 -> exact
    assert (est == true).all()


def test_cms_blocking_invariance():
    t = _token_table()
    a = cms_build(ray.data.from_arrow(t), "text", depth=3, width=256,
                  pre_split=True)
    b = cms_build(ray.data.from_arrow(t).repartition(11), "text", depth=3,
                  width=256, pre_split=True)
    assert (a == b).all()


def test_cms_narrow_width_bound():
    t = _token_table()
    exact = _exact_counts(t["text"].to_pylist())
    n_total = sum(exact.values())
    sk = cms_build(ray.data.from_arrow(t), "text", depth=4, width=64,
                   pre_split=True)
    toks = list(exact)
    est = cms_query(sk, toks)
    true = np.array([exact[x] for x in toks], np.int64)
    assert (est >= true).all()
    # e*N/width bound should hold for the vast majority at depth 4
    bound = np.e * n_total / 64
    assert float(np.mean(est - true <= bound)) >= 0.95


def test_cms_rows_mode_counts_rows():
    t = pa.table({"v": pa.array(["a", "a", "b", None, "a"])})
    sk = cms_build(ray.data.from_arrow(t), "v", depth=2, width=32)
    assert cms_query(sk, ["a"])[0] == 3
    assert cms_query(sk, ["b"])[0] == 1


# ------------------------------------------------------- postings

def _naive_postings(table, cap, min_df):
    ids = table["doc_id"].to_pylist()
    texts = table["text"].to_pylist()
    inv = {}
    for i, txt in zip(ids, texts):
        for w in set(w for w in (txt or "").split() if w):
            inv.setdefault(w, set()).add(i)
    out = []
    for tok in sorted(inv):
        docs = sorted(inv[tok])
        if len(docs) < min_df:
            continue
        out.append((tok, len(docs),
                    ",".join(str(d) for d in docs[:cap])))
    return out


@pytest.mark.parametrize("cap,min_df", [(3, 1), (10, 2)])
def test_postings_matches_naive(cap, min_df):
    t = _token_table(n_docs=80, seed=43)
    got = postings(ray.data.from_arrow(t).repartition(7), cap=cap,
                   min_df=min_df).to_pandas()
    want = _naive_postings(t, cap, min_df)
    assert list(zip(got["token"], got["df"], got["doc_csv"])) == want


def test_postings_matches_duckdb():
    import duckdb
    t = _token_table(n_docs=60, seed=44)
    got = postings(ray.data.from_arrow(t), cap=5, min_df=2).to_pandas()
    want = duckdb.connect().execute(r"""
        WITH tok AS (
          SELECT DISTINCT doc_id, u.token
          FROM t, unnest(list_filter(regexp_split_to_array(
                   coalesce(text, ''), '\s+'), x -> x <> '')) AS u(token)),
        ranked AS (
          SELECT token, doc_id,
                 row_number() OVER (PARTITION BY token ORDER BY doc_id) rn,
                 count(*) OVER (PARTITION BY token) df
          FROM tok)
        SELECT token, CAST(max(df) AS BIGINT) AS df,
               string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR)
                          END, ',' ORDER BY doc_id) AS doc_csv
        FROM ranked GROUP BY token HAVING max(df) >= 2
        ORDER BY token""").df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_postings_empty_and_null_text():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([None, "  "])})
    out = postings(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 0


# ------------------------------------------------------- weighted sample

def _naive_weighted_sample(ids, weights, k):
    pri = []
    for i, w in zip(ids, weights):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                           "little")
        pri.append((h // max(w, 1), i))
    return sorted(i for _, i in sorted(pri)[:k])


def test_weighted_sample_matches_naive_and_blocking():
    rng = np.random.default_rng(45)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    wts = rng.integers(1, 5000, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(wts)})
    got = weighted_sample(ray.data.from_arrow(t), k=25).to_pandas()
    want = _naive_weighted_sample(ids.tolist(), wts.tolist(), 25)
    assert got["doc_id"].tolist() == want
    got2 = weighted_sample(ray.data.from_arrow(t).repartition(9),
                           k=25).to_pandas()
    assert got.equals(got2)


def test_weighted_sample_matches_duckdb():
    import duckdb
    rng = np.random.default_rng(46)
    n = 300
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_chars": pa.array(rng.integers(0, 3000, n), pa.int64())})
    got = weighted_sample(ray.data.from_arrow(t), k=20).to_pandas()
    want = duckdb.connect().execute("""
        SELECT doc_id, n_chars FROM (
          SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY
                   md5_number_upper(CAST(doc_id AS VARCHAR))
                     // CAST(GREATEST(n_chars, 1) AS UBIGINT),
                   doc_id) AS rn
          FROM t) WHERE rn <= 20 ORDER BY doc_id""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()


def test_weighted_sample_heavier_rows_win():
    # two identical id sets, weights 1 vs 10_000: the heavy half should
    # dominate the sample (statistical but deterministic given md5)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    wts = np.where(ids < n // 2, 1, 10_000).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(wts)})
    got = weighted_sample(ray.data.from_arrow(t), k=40).to_pandas()
    heavy = (got["doc_id"] >= n // 2).sum()
    assert heavy >= 35
