"""Composed curation recipe (dedup/curate.py): gate order, first-fail
semantics, dedup-over-survivors, funnel report consistency."""

import pyarrow as pa

import ray.data

from dedup.curate import GATES, CurateConfig, curate, curation_report

GOOD = ("The quick brown fox jumps over the lazy dog and then walks home "
        "to rest for the evening with friends. " * 3)


def _corpus():
    return pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": [
            GOOD,                              # 0 kept
            GOOD,                              # 1 dup of 0
            None,                              # 2 error
            "short",                           # 3 too_short
            "x " * 50,                         # 4 low_stopword (alpha ok)
            "1234567890 " * 20,                # 5 low_alpha (fires before
                                               #   high_digit — gate order)
            ("the same line\n" * 30) + GOOD,   # 6 rep_lines
            ("is it " * 60) + "the end of that for now with more words",
                                               # 7 rep_2gram
            GOOD + " unique tail to differ",   # 8 kept
            GOOD.upper(),                      # 9 kept (different bytes)
        ],
    })


def _verdicts(cfg=None, P=4):
    ds = ray.data.from_arrow(_corpus()).repartition(3)
    out = curate(ds, cfg, num_partitions=P).sort("doc_id").to_pandas()
    return dict(zip(out["doc_id"], out["verdict"]))


def test_gate_assignments_and_first_fail_order():
    v = _verdicts()
    assert v == {0: "kept", 1: "dup", 2: "error", 3: "too_short",
                 4: "low_stopword", 5: "low_alpha", 6: "rep_lines",
                 7: "rep_2gram", 8: "kept", 9: "kept"}
    assert all(x in GATES for x in v.values())


def test_dedup_only_over_survivors():
    """A filtered doc must never shadow a kept one: doc 6's text starts
    failing gates, and an identical copy that passes elsewhere keeps."""
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["z", GOOD, GOOD],  # 1 too_short; 2 keeps; 3 dup of 2
    })
    out = curate(ray.data.from_arrow(t)).sort("doc_id").to_pandas()
    assert list(out["verdict"]) == ["too_short", "kept", "dup"]


def test_parallelism_invariance():
    assert _verdicts(P=1) == _verdicts(P=8)


def test_report_matches_pipeline():
    ds = ray.data.from_arrow(_corpus())
    out = curate(ds).to_pandas()
    rep = curation_report(ds).to_pandas()
    got = dict(zip(rep["verdict"], rep["docs"]))
    exp = out["verdict"].value_counts().to_dict()
    assert got == exp
    chars = dict(zip(rep["verdict"], rep["chars"]))
    exp_chars = out.groupby("verdict")["n_chars"].sum().to_dict()
    assert chars == {k: int(v) for k, v in exp_chars.items()}


def test_thresholds_are_config():
    cfg = CurateConfig(min_chars=1, min_stopword_e6=0, min_alpha_e6=0,
                       max_top_2gram_e6=1_000_000,
                       max_dup_line_e6=1_000_000,
                       min_tok_len_e6=0, max_tok_len_e6=10**9)
    v = _verdicts(cfg)
    # with everything loosened only error and exact dups remain
    assert v[2] == "error" and v[1] == "dup"
    assert sum(1 for x in v.values() if x == "kept") == 7
