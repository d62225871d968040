"""corpus_shuffle (deterministic training-order permutation) and
temperature_sample (sqrt-smoothed source mixing)."""

import numpy as np
import pyarrow as pa
import ray.data

from dedup import textstats


def _docs(n=200, langs=("en", "de", "fr")):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([langs[i % len(langs)] for i in range(n)],
                         pa.string()),
    })


def test_corpus_shuffle_is_a_permutation():
    ds = ray.data.from_arrow(_docs(300))
    out = textstats.corpus_shuffle(ds).to_pandas()
    assert len(out) == 300
    assert sorted(out["shuffle_rank"]) == list(range(300))
    # the order is md5-driven, not id order
    byrank = out.sort_values("shuffle_rank")["doc_id"].to_numpy()
    assert not np.array_equal(byrank, np.arange(300))


def test_corpus_shuffle_deterministic_across_partitioning():
    t = _docs(500)
    outs = []
    for nb in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nb)
        outs.append(textstats.corpus_shuffle(ds).to_pandas())
    assert outs[0].equals(outs[1])


def test_corpus_shuffle_matches_naive_order():
    import hashlib
    t = _docs(64)
    out = textstats.corpus_shuffle(ray.data.from_arrow(t)).to_pandas()
    ids = sorted(range(64),
                 key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    want = {i: r for r, i in enumerate(ids)}
    got = dict(zip(out["doc_id"], out["shuffle_rank"]))
    assert got == want


def test_temperature_sample_quota_math():
    # 3 langs with counts 120/60/20: quotas floor(B*sqrt(n)/sum_sqrt)
    rows = {"doc_id": [], "lang": []}
    i = 0
    for lang, n in (("en", 120), ("de", 60), ("fr", 20)):
        for _ in range(n):
            rows["doc_id"].append(i); rows["lang"].append(lang); i += 1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "lang": pa.array(rows["lang"], pa.string())}))
    budget = 100
    out = textstats.temperature_sample(ds, budget=budget).to_pandas()
    sq = {l: np.sqrt(float(n)) for l, n in
          (("en", 120), ("de", 60), ("fr", 20))}
    denom = sq["de"] + sq["en"] + sq["fr"]
    for lang, n in (("en", 120), ("de", 60), ("fr", 20)):
        want = min(n, int(np.floor(budget * sq[lang] / denom)))
        assert (out["lang"] == lang).sum() == want
    # sqrt smoothing: fr's sampled share exceeds its raw 10% share
    assert (out["lang"] == "fr").sum() / len(out) > 0.1


def test_temperature_sample_caps_at_group_size():
    ds = ray.data.from_arrow(_docs(30))  # 10 per lang
    out = textstats.temperature_sample(ds, budget=1000).to_pandas()
    assert len(out) == 30  # every group capped at its own size


def test_temperature_sample_deterministic_across_partitioning():
    t = _docs(240)
    outs = []
    for nb in (2, 9):
        ds = ray.data.from_arrow(t).repartition(nb)
        outs.append(textstats.temperature_sample(ds, budget=90).to_pandas())
    assert outs[0].equals(outs[1])
