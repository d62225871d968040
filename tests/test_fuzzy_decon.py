"""minhash_decontaminate: fuzzy (near-duplicate) benchmark
decontamination — planted truth, determinism, edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dedup.minhash import minhash_decontaminate


def _corpus():
    rng = np.random.default_rng(1)
    words = [f"tok{i}" for i in range(500)]

    def mk(size):
        return " ".join(rng.choice(words, size=size))

    bench_rows = [{"doc_id": 1000 + i, "text": mk(60)} for i in range(30)]
    train_rows = [{"doc_id": i, "text": mk(60)} for i in range(200)]
    train_rows[5]["text"] = bench_rows[3]["text"]       # verbatim copy
    toks = bench_rows[7]["text"].split()                # light paraphrase
    for j in range(0, len(toks), 20):
        toks[j] = "EDITED%d" % j
    train_rows[8]["text"] = " ".join(toks)
    train_rows[11]["text"] = "too few"                  # unsignable
    return train_rows, bench_rows


def test_fuzzy_decontaminate_planted():
    train_rows, bench_rows = _corpus()
    train = ray.data.from_items(train_rows).repartition(4)
    bench = ray.data.from_items(bench_rows)
    out = minhash_decontaminate(train, bench, threshold=0.3) \
        .sort("doc_id").to_pandas()
    assert len(out) == 200
    flagged = out[out.near_contaminated == 1]
    assert set(flagged.doc_id) == {5, 8}
    got = flagged.set_index("doc_id")
    # verbatim copy: perfect agreement; paraphrase: partial but >= 0.3
    assert got.loc[5, "best_agree_e6"] == 1_000_000
    assert got.loc[5, "best_bench_id"] == 1003
    assert 300_000 <= got.loc[8, "best_agree_e6"] < 1_000_000
    assert got.loc[8, "best_bench_id"] == 1007
    # unsignable doc: no hits, sentinel id
    row11 = out[out.doc_id == 11].iloc[0]
    assert row11.n_bench_hits == 0 and row11.best_bench_id == -1


def test_fuzzy_decontaminate_deterministic_across_blocking():
    train_rows, bench_rows = _corpus()
    bench = ray.data.from_items(bench_rows)
    a = minhash_decontaminate(
        ray.data.from_items(train_rows).repartition(4), bench,
        threshold=0.3).sort("doc_id").to_pandas()
    b = minhash_decontaminate(
        ray.data.from_items(train_rows).repartition(11), bench,
        threshold=0.3).sort("doc_id").to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_fuzzy_decontaminate_threshold_zero_is_band_collision():
    """threshold=0 degrades to pure Broder band-collision semantics:
    every doc with >= 1 band hit is flagged."""
    train_rows, bench_rows = _corpus()
    train = ray.data.from_items(train_rows)
    bench = ray.data.from_items(bench_rows)
    out = minhash_decontaminate(train, bench, threshold=0.0) \
        .sort("doc_id").to_pandas()
    assert (out[out.n_bench_hits > 0].near_contaminated == 1).all()
    assert (out[out.n_bench_hits == 0].near_contaminated == 0).all()


def test_fuzzy_decontaminate_rejects_bad_args():
    train = ray.data.from_items([{"doc_id": 1, "text": "a b c d e f"}])
    bench_str = ray.data.from_items([{"doc_id": "x", "text": "a b c d e f"}])
    import pytest
    with pytest.raises(ValueError):
        minhash_decontaminate(train, bench_str)
    with pytest.raises(ValueError):
        minhash_decontaminate(train, train, bands=7)  # 7 does not divide 128
