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
