"""Incremental (reference-corpus) exact dedup: a new snapshot deduped
against a previously-kept corpus plus within itself in one shuffle
(dedup/incremental.py).  Micro semantics, parallelism-determinism, and
equivalence with the plain exact pass when the reference matches
nothing."""

import pyarrow as pa
import ray.data

from dedup.config import DOCUMENTS_CONFIG, DedupConfig
from dedup.incremental import incremental_exact_dedup
from dedup.pipeline import run_dedup
from dedup.synth import generate_pages

A = "a" * 100
B = "b" * 80
C = "c" * 70
D = "d" * 90


def _micro():
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [A, B]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
        "text": [A, A, C, C, D, "tiny", None]}))
    return new, ref


def _cfg(**kw):
    return DOCUMENTS_CONFIG.with_(
        near=False, simhash=False, substring=False, **kw)


def _rows(out):
    t = out.sort("doc_id").to_pandas()
    return {int(r.doc_id): (r.state, r.cluster_id, r.cluster_size, r.n_ref)
            for r in t.itertuples()}


def test_micro_states():
    new, ref = _micro()
    rows = _rows(incremental_exact_dedup(new, ref, _cfg(),
                                         num_partitions=4))
    assert rows == {
        10: ("ref_dup", -1, 0, 1),   # matches ref doc 1
        11: ("ref_dup", -1, 0, 1),
        12: ("keep", 12, 2, 0),      # within-new pair, keeper = min id
        13: ("delete", 12, 2, 0),
        14: ("unique", -1, 1, 0),
        15: ("ignored", -1, 0, 0),   # < min_doc_bytes
        16: ("error", -1, 0, 0),     # null text never matches
    }


def test_micro_ref_count_and_parallelism_invariance():
    # two identical ref copies of A -> n_ref = 2; result identical at P=1/8
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [A, A, B]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": [A, C]}))
    r1 = _rows(incremental_exact_dedup(new, ref, _cfg(), num_partitions=1))
    r8 = _rows(incremental_exact_dedup(new, ref, _cfg(), num_partitions=8))
    assert r1 == r8 == {10: ("ref_dup", -1, 0, 2), 11: ("unique", -1, 1, 0)}


def test_unmatched_ref_equals_plain_exact_pass():
    """With a reference that matches nothing, the new-side assignments
    must equal run_dedup's exact-only output exactly (modulo the n_ref
    column, which must be all-zero)."""
    pages, _ = generate_pages(250, seed=13)
    ds = ray.data.from_arrow(pages).repartition(3)
    cfg = DedupConfig(near=False, simhash=False, substring=False)
    ref = ray.data.from_arrow(pa.table({
        "url": ["https://nowhere.example/x"], "text": ["z" * 500]}))

    inc = incremental_exact_dedup(ds, ref, cfg).sort("url").to_pandas()
    assert (inc["n_ref"] == 0).all()
    plain = run_dedup(ds, cfg).sort("url").to_pandas()
    base = inc.drop(columns=["n_ref"]).reset_index(drop=True)
    assert base.equals(plain.reset_index(drop=True))


def test_key_lang_conjunct_respected():
    """The exact key honours the configured conjuncts: with key_lang on,
    a same-text/different-lang ref doc is NOT a match."""
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": [A], "lang": ["en"]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": [A, A], "lang": ["de", "en"]}))
    rows = _rows(incremental_exact_dedup(new, ref, _cfg(key_lang=True),
                                         num_partitions=4))
    assert rows == {10: ("unique", -1, 1, 0), 11: ("ref_dup", -1, 0, 1)}


def test_closure_path_equals_exact_variant():
    """incremental_dedup with the exact-only config must equal
    incremental_exact_dedup minus the n_ref column."""
    from dedup.incremental import incremental_dedup
    new, ref = _micro()
    direct = incremental_exact_dedup(new, ref, _cfg(), num_partitions=4) \
        .sort("doc_id").to_pandas().drop(columns=["n_ref"])
    cc = incremental_dedup(new, ref, _cfg(), num_partitions=4) \
        .sort("doc_id").to_pandas()
    assert cc.reset_index(drop=True).equals(direct.reset_index(drop=True))


def test_near_ref_dup_and_transitive_chain():
    """A new doc that NEAR-duplicates a reference doc is ref_dup, and so
    is a new doc connected to it only through the duplicate chain."""
    from dedup.incremental import incremental_dedup
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"] * 12
    base = " ".join(words)
    edit1 = " ".join(words[:115] + ["CHANGED1", "x", "y", "z", "w"])
    edit2 = " ".join(words[:110] + ["CHANGED1", "x", "y", "z", "w",
                                    "q2", "r2", "s2", "t2", "u2"])
    other = " ".join(reversed([w.upper() for w in words]))
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": [base]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": [edit1, edit2, other]}))
    cfg = DOCUMENTS_CONFIG.with_(simhash=False, substring=False)  # exact+minhash
    t = incremental_dedup(new, ref, cfg, num_partitions=4) \
        .sort("doc_id").to_pandas()
    assert list(t["state"]) == ["ref_dup", "ref_dup", "unique"]


# ---------------------------------------------------------------------------
# storage-partitioned (bucketed) path
# ---------------------------------------------------------------------------

def test_bucketed_micro_states(tmp_path):
    from dedup.incremental import (incremental_exact_dedup_bucketed,
                                   write_key_index)
    new, ref = _micro()
    idx = write_key_index(ref, _cfg(), str(tmp_path / "idx"), n_buckets=16)
    rows = _rows(incremental_exact_dedup_bucketed(
        new, idx, _cfg(), n_buckets=16, num_partitions=4))
    assert rows == {
        10: ("ref_dup", -1, 0, 1),
        11: ("ref_dup", -1, 0, 1),
        12: ("keep", 12, 2, 0),
        13: ("delete", 12, 2, 0),
        14: ("unique", -1, 1, 0),
        15: ("ignored", -1, 0, 0),
        16: ("error", -1, 0, 0),
    }


def test_bucketed_matches_shuffle_path(tmp_path):
    """Byte-identical to the one-shuffle path on a corpus with real
    overlap, at two parallelism levels."""
    from dedup.incremental import (incremental_exact_dedup_bucketed,
                                   write_key_index)
    ref_t, _ = generate_pages(300, seed=13)
    new_t, _ = generate_pages(300, seed=14)
    # plant cross-snapshot dups: 40 new docs carry ref texts
    texts = new_t["text"].to_pylist()
    ref_texts = ref_t["text"].to_pylist()
    for i in range(40):
        texts[i * 5] = ref_texts[i * 7]
    new_t = new_t.set_column(new_t.schema.get_field_index("text"),
                             "text", pa.array(texts, pa.string()))
    cfg = DedupConfig(near=False, simhash=False, substring=False)
    ref = ray.data.from_arrow(ref_t).repartition(3)
    new = ray.data.from_arrow(new_t).repartition(3)

    base = incremental_exact_dedup(new, ref, cfg, num_partitions=8) \
        .sort("url").to_pandas().reset_index(drop=True)
    assert (base["n_ref"] > 0).any()  # the planting worked

    idx = write_key_index(ref, cfg, str(tmp_path / "idx"), n_buckets=16)
    for P in (2, 8):
        got = incremental_exact_dedup_bucketed(
            new, idx, cfg, n_buckets=16, num_partitions=P) \
            .sort("url").to_pandas().reset_index(drop=True)
        pd_testing_assert(got, base)


def pd_testing_assert(got, exp):
    import pandas.testing as pdt
    pdt.assert_frame_equal(got, exp, check_like=False)


def test_bucketed_multi_dump_accumulation(tmp_path):
    """Two dumps = two index dirs; n_ref sums across dumps and the
    result equals the shuffle path over the union reference."""
    from dedup.incremental import (incremental_exact_dedup_bucketed,
                                   write_key_index)
    ref1 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()), "text": [A, B]}))
    ref2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 4], pa.int64()), "text": [A, C]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": [A, C, D]}))
    i1 = write_key_index(ref1, _cfg(), str(tmp_path / "d1"), n_buckets=16)
    i2 = write_key_index(ref2, _cfg(), str(tmp_path / "d2"), n_buckets=16)
    rows = _rows(incremental_exact_dedup_bucketed(
        new, [i1, i2], _cfg(), n_buckets=16, num_partitions=4))
    assert rows == {
        10: ("ref_dup", -1, 0, 2),   # A in both dumps
        11: ("ref_dup", -1, 0, 1),   # C in dump 2 only
        12: ("unique", -1, 1, 0),
    }


def test_band_index_filter_flags_near_copies(tmp_path):
    """Long ref docs with one token perturbed must flag ref_near; fresh
    docs must not; non-ok rows report (False, 0); multi-dump indexes
    union; deterministic across parallelism."""
    from dedup.incremental import (incremental_minhash_filter,
                                   write_band_index)
    cfg = DOCUMENTS_CONFIG.with_(simhash=False, substring=False)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 6)
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [base + "one ending here", base + "two other close"]}))
    toks = (base + "one ending here").split()
    toks[3] = "changed"
    near_copy = " ".join(toks)
    fresh = ("totally different words about completely other topics "
             "nothing shared with the reference corpus at all " * 6)
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": [near_copy, fresh, "tiny", None]}))
    idx = write_band_index(ref, cfg, str(tmp_path / "bidx"), n_buckets=16)
    outs = []
    for P in (1, 8):
        out = incremental_minhash_filter(
            new, [idx], cfg, n_buckets=16, num_partitions=P) \
            .sort("doc_id").to_pandas().reset_index(drop=True)
        outs.append(out)
    import pandas.testing as pdt
    pdt.assert_frame_equal(outs[0], outs[1])
    got = {int(r.doc_id): (bool(r.ref_near), int(r.n_band_hits))
           for r in outs[0].itertuples()}
    assert got[10][0] and got[10][1] >= 1    # near copy flagged
    assert got[11] == (False, 0)             # fresh not flagged
    assert got[12] == (False, 0)             # ignored
    assert got[13] == (False, 0)             # error


def test_band_index_rerun_replaces(tmp_path):
    """Re-writing an index into the same dir must not append (doubled
    band rows would change nothing semantically but bloat the index);
    the second write replaces the first."""
    import glob
    from dedup.incremental import write_band_index
    cfg = DOCUMENTS_CONFIG.with_(simhash=False, substring=False)
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": [A + " " + B]}))
    idx = write_band_index(ref, cfg, str(tmp_path / "i"), n_buckets=4)
    n1 = len(glob.glob(idx + "/bucket=*/*.parquet"))
    write_band_index(ref, cfg, idx, n_buckets=4)
    n2 = len(glob.glob(idx + "/bucket=*/*.parquet"))
    assert n1 == n2


def test_compact_index_exact_preserves_probe_results(tmp_path):
    """Compacting two exact-index dumps into one dir is
    probe-equivalent: same states AND same n_ref occurrence counts
    (compaction concatenates, never dedupes)."""
    from dedup.incremental import (compact_index,
                                   incremental_exact_dedup_bucketed,
                                   write_key_index)
    ref1 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()), "text": [A, B]}))
    ref2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 4], pa.int64()), "text": [A, C]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": [A, C, D]}))
    i1 = write_key_index(ref1, _cfg(), str(tmp_path / "d1"), n_buckets=16)
    i2 = write_key_index(ref2, _cfg(), str(tmp_path / "d2"), n_buckets=16)
    rep = compact_index([i1, i2], str(tmp_path / "merged"))
    assert rep["rows_in"] == rep["rows_out"] == 4  # exact: no dedupe
    base = _rows(incremental_exact_dedup_bucketed(
        new, [i1, i2], _cfg(), n_buckets=16, num_partitions=4))
    got = _rows(incremental_exact_dedup_bucketed(
        new, str(tmp_path / "merged"), _cfg(), n_buckets=16,
        num_partitions=4))
    assert got == base
    assert got[10] == ("ref_dup", -1, 0, 2)  # occurrence count intact


def test_compact_index_bands_dedupes_and_preserves_flags(tmp_path):
    from dedup.config import DedupConfig
    from dedup.incremental import (compact_index,
                                   incremental_minhash_filter,
                                   write_band_index)
    words = [f"w{i}" for i in range(160)]
    base_txt = " ".join(words)
    ref1 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": [base_txt]}))
    ref2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2], pa.int64()), "text": [base_txt]}))
    near = " ".join(words[:150] + ["X1", "X2", "X3", "X4", "X5",
                                   "X6", "X7", "X8", "X9", "X10"])
    far = " ".join(reversed([w.upper() for w in words]))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": [near, far]}))
    cfg = DOCUMENTS_CONFIG.with_(exact=False, simhash=False,
                                 substring=False, near=True)
    i1 = write_band_index(ref1, cfg, str(tmp_path / "b1"), n_buckets=16)
    i2 = write_band_index(ref2, cfg, str(tmp_path / "b2"), n_buckets=16)
    rep = compact_index([i1, i2], str(tmp_path / "bm"))
    assert rep["rows_out"] < rep["rows_in"]  # identical dumps dedupe
    base = incremental_minhash_filter(new, [i1, i2], cfg, n_buckets=16) \
        .sort("doc_id").to_pandas()
    got = incremental_minhash_filter(new, str(tmp_path / "bm"), cfg,
                                     n_buckets=16) \
        .sort("doc_id").to_pandas()
    assert list(got["ref_near"]) == list(base["ref_near"]) == [True, False]


def test_compact_index_rejects_mismatched_dumps(tmp_path):
    import pytest
    from dedup.incremental import compact_index, write_key_index
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": [A]}))
    i1 = write_key_index(ref, _cfg(), str(tmp_path / "x1"), n_buckets=16)
    i2 = write_key_index(ref, _cfg(), str(tmp_path / "x2"), n_buckets=32)
    with pytest.raises(ValueError):
        compact_index([i1, i2], str(tmp_path / "bad"))


def test_snapshot_diff_statuses_and_contract():
    import pandas as pd
    import pytest
    from dedup.incremental import snapshot_diff
    old = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a", "b", "c", None]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
        "text": ["b", "C!", "", None]}))
    out = snapshot_diff(old, new).sort("doc_id").to_pandas()
    # null and "" digest identically (null-safe contract): 4 unchanged
    assert out.set_index("doc_id")["status"].to_dict() == {
        1: "removed", 2: "unchanged", 3: "changed",
        4: "unchanged", 5: "added"}
    # determinism across blocking
    out2 = snapshot_diff(old.repartition(3), new.repartition(2),
                         num_partitions=7).sort("doc_id").to_pandas()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))
    # duplicate id within one snapshot violates the contract
    dup = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()), "text": ["x", "y"]}))
    with pytest.raises(Exception):
        snapshot_diff(dup, new).materialize()
