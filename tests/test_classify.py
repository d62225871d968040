"""Learned quality classifier (dedup/classify.py): separable-rule
recovery, determinism across blocking, input validation."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dedup.classify import quality_classify, train_quality_classifier


def _corpus(n=300, seed=0):
    """Texts whose stopword ratio is bimodal: 'good' docs are mostly
    stopwords, 'bad' docs mostly digits — linearly separable in the
    quality features."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        if good:
            toks = rng.choice(["the", "and", "of", "to", "word"], size=30)
        else:
            toks = rng.choice(["12345", "9876", "#!?", "000"], size=30)
        rows.append({"doc_id": i, "text": " ".join(toks),
                     "label": int(good)})
    return rows


def test_classifier_recovers_separable_rule():
    rows = _corpus()
    train = ray.data.from_items(rows[:200]).repartition(3)
    model = train_quality_classifier(train)
    val = ray.data.from_items(
        [{k: r[k] for k in ("doc_id", "text")} for r in rows[200:]])
    out = quality_classify(val, model).sort("doc_id").to_pandas()
    want = np.array([r["label"] for r in rows[200:]])
    assert (out["pred"].to_numpy() == want).all()
    # scores are calibrated to the right side of 0.5
    assert (out.loc[out.pred == 1, "score_e6"] >= 500_000).all()


def test_classifier_deterministic_across_blocking():
    rows = _corpus(seed=1)
    m1 = train_quality_classifier(
        ray.data.from_items(rows).repartition(2))
    m2 = train_quality_classifier(
        ray.data.from_items(rows).repartition(11))
    for k in ("mu", "sd", "w"):
        assert np.array_equal(m1[k], m2[k]), k
    assert m1["b"] == m2["b"]
    val = [{k: r[k] for k in ("doc_id", "text")} for r in rows]
    a = quality_classify(ray.data.from_items(val).repartition(2), m1) \
        .sort("doc_id").to_pandas()
    b = quality_classify(ray.data.from_items(val).repartition(9), m1) \
        .sort("doc_id").to_pandas()
    assert a.equals(b)


def test_classifier_rejects_bad_labels_and_empty():
    bad = ray.data.from_items(
        [{"doc_id": 0, "text": "a b", "label": 2}])
    with pytest.raises(ValueError):
        train_quality_classifier(bad)
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "label": pa.array([], pa.int64())}))
    with pytest.raises(ValueError):
        train_quality_classifier(empty)
