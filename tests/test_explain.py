"""explain_pair: per-tier metrics faithful to the pipeline's verdicts."""

import pyarrow as pa

import ray.data

from dedup.config import DOCUMENTS_CONFIG
from dedup.explain import explain_pair


def _texts():
    words = [f"w{i}" for i in range(150)]
    base = " ".join(words)
    near = " ".join(words[:140] + [f"X{i}" for i in range(10)])
    far = " ".join(reversed([w.upper() for w in words]))
    return base, near, far


def test_explain_pair_metrics():
    base, near, far = _texts()
    e = explain_pair(base, base)
    assert e["exact_match"] and e["normalized_match"]
    assert e["jaccard_e6"] == 1_000_000
    assert e["minhash_agree_e6"] == 1_000_000
    assert e["simhash_hamming"] == 0
    assert all(e["would_match"].values())

    e = explain_pair(base, near)
    assert not e["exact_match"]
    assert 700_000 < e["jaccard_e6"] < 1_000_000
    assert e["band_collision"] and e["would_match"]["minhash"]
    assert e["would_match"]["substring"]  # 140 shared leading words

    e = explain_pair(base, far)
    assert e["jaccard_e6"] == 0
    assert not any(e["would_match"].values())

    e = explain_pair("short", None)
    assert e["minhash_agree_e6"] is None and not e["band_collision"]


def test_explain_pair_agrees_with_pipeline():
    """A pair explain says would_match must co-cluster in run_dedup,
    and a pair it fully rejects must not."""
    from dedup.pipeline import run_dedup
    base, near, far = _texts()
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, far]}))
    cfg = DOCUMENTS_CONFIG
    out = run_dedup(ds, cfg, check_html=False).to_pandas() \
        .set_index("doc_id")
    exp = explain_pair(base, near, cfg)
    assert any(exp["would_match"].values())
    assert out.loc[1, "cluster_id"] == out.loc[2, "cluster_id"] != -1
    exp_far = explain_pair(base, far, cfg)
    assert not any(exp_far["would_match"].values())
    assert out.loc[3, "state"] == "unique"
