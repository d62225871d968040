"""bm25_topk: naive-parity, determinism across blocking, tie-breaks."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from dedup.textstats import bm25_topk

K1, B = 1.2, 0.75


def _naive_bm25(texts, queries, k=10):
    docs = [(t or "").split() for t in texts]
    n = len(docs)
    dl = [len(d) for d in docs]
    total = sum(dl)
    avgdl = total / n if n else 1.0
    rows = []
    for qid, qtext in queries:
        terms = sorted({w for w in qtext.split() if w})
        scores = {}
        for term in terms:
            df = sum(1 for d in docs if term in d)
            i6 = math.floor(
                math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
            for did, d in enumerate(docs):
                tf = d.count(term)
                if tf == 0:
                    continue
                n6 = math.floor(
                    tf * (K1 + 1.0)
                    / (tf + K1 * ((1.0 - B) + B * dl[did] / avgdl))
                    * 1e6)
                scores[did] = scores.get(did, 0) + i6 * n6
        top = sorted(((s, d) for d, s in scores.items() if s > 0),
                     key=lambda x: (-x[0], x[1]))[:k]
        rows.extend((qid, d, s) for s, d in top)
    return rows


def test_bm25_matches_naive():
    rng = np.random.default_rng(2)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(3, 25))))
             for _ in range(80)]
    texts[5] = ""          # empty doc
    queries = [(1, "alpha beta"), (2, "zeta"), (3, "missingterm")]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})).repartition(4)
    got = bm25_topk(ds, queries, k=10) \
        .sort(["query_id", "score_e12", "doc_id"],
              descending=[False, True, False]).to_pandas()
    want = _naive_bm25(texts, queries, k=10)
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert not (got.query_id == 3).any()   # unseen term: no rows


def test_bm25_deterministic_across_blocking():
    rng = np.random.default_rng(6)
    words = [f"w{i}" for i in range(20)]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(200)]
    queries = [(7, "w0 w1 w2")]
    a = bm25_topk(ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        .repartition(3), queries, k=5) \
        .sort(["query_id", "score_e12", "doc_id"],
              descending=[False, True, False]).to_pandas()
    b = bm25_topk(ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        .repartition(13), queries, k=5) \
        .sort(["query_id", "score_e12", "doc_id"],
              descending=[False, True, False]).to_pandas()
    assert a.equals(b)
    assert len(a) == 5
