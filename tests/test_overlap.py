"""source_overlap + dup_ratio_estimate (dedup/overlap.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.overlap import dup_ratio_estimate, source_overlap


def _corpus():
    # sources named so dictionary (first-appearance) order differs from
    # string order: zeta appears before alpha
    rows = [
        ("zeta", "shared-all"),      # in zeta, alpha, beta
        ("zeta", "zeta-only"),
        ("zeta", "zeta-dup"),        # within-source dup: counts once
        ("zeta", "zeta-dup"),
        ("alpha", "shared-all"),
        ("alpha", "shared-ab"),      # alpha & beta
        ("alpha", None),             # null text: excluded everywhere
        ("beta", "shared-all"),
        ("beta", "shared-ab"),
        ("beta", "beta-only"),
    ]
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_source_overlap_exact_counts():
    ds = ray.data.from_arrow(_corpus())
    out = source_overlap(ds, num_partitions=4).to_pandas()
    got = {(r.source_a, r.source_b): (r.n_shared, r.n_a, r.n_b,
                                      r.jaccard_e6)
           for r in out.itertuples()}
    # distinct texts: zeta={shared-all, zeta-only, zeta-dup} (3),
    # alpha={shared-all, shared-ab} (2), beta={shared-all, shared-ab,
    # beta-only} (3)
    assert got == {
        ("alpha", "beta"): (2, 2, 3, int(np.floor(1e6 * 2 / 3))),
        ("alpha", "zeta"): (1, 2, 3, 250000),
        ("beta", "zeta"): (1, 3, 3, 200000),
    }
    # pair ordering is by string, and rows are sorted
    assert list(out.source_a) == sorted(out.source_a)


def test_source_overlap_partitioning_invariant():
    ds = ray.data.from_arrow(_corpus())
    a = source_overlap(ds, num_partitions=3).to_pandas()
    b = source_overlap(ds.repartition(7), num_partitions=11).to_pandas()
    assert a.equals(b)


def test_source_overlap_no_overlap_is_empty_with_schema():
    t = pa.table({"source": pa.array(["a", "b"], pa.string()),
                  "text": pa.array(["x", "y"], pa.string())})
    out = source_overlap(ray.data.from_arrow(t), num_partitions=2)
    assert out.count() == 0
    assert set(out.schema().names) >= {"source_a", "source_b", "n_shared",
                                       "n_a", "n_b", "jaccard_e6"}


def test_dup_ratio_full_slice_is_exact():
    rows = [("s1", "a"), ("s1", "a"), ("s1", "b"),       # 3 rows, 2 distinct
            ("s2", "c"), ("s2", "c"), ("s2", "c"),       # 3 rows, 1 distinct
            ("s2", None)]                                # excluded
    t = pa.table({"source": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = dup_ratio_estimate(ray.data.from_arrow(t), slice_hex="zz",
                             num_partitions=3).to_pandas()
    got = {r.source: (r.n_sampled, r.n_distinct, r.n_dup, r.dup_ratio_e6)
           for r in out.itertuples()}
    assert got == {"s1": (3, 2, 1, 333333), "s2": (3, 1, 2, 666666)}


def test_dup_ratio_slice_matches_manual_recompute():
    texts = [f"doc number {i}" for i in range(200)] + \
            [f"doc number {i}" for i in range(0, 200, 5)]   # 40 exact dups
    srcs = ["even" if i % 2 == 0 else "odd" for i in range(len(texts))]
    t = pa.table({"source": pa.array(srcs, pa.string()),
                  "text": pa.array(texts, pa.string())})
    bound = "40"
    out = dup_ratio_estimate(ray.data.from_arrow(t), slice_hex=bound,
                             num_partitions=4).to_pandas()
    # manual recompute of the same slice predicate
    want: dict[str, tuple] = {}
    per: dict[str, list] = {}
    for s, x in zip(srcs, texts):
        if hashlib.md5(x.encode()).hexdigest()[:2] < bound:
            per.setdefault(s, []).append(x)
    for s, xs in sorted(per.items()):
        n, d = len(xs), len(set(xs))
        want[s] = (n, d, n - d, int(np.floor(1e6 * (n - d) / n)))
    got = {r.source: (r.n_sampled, r.n_distinct, r.n_dup, r.dup_ratio_e6)
           for r in out.itertuples()}
    assert got == want
    assert list(out.source) == sorted(want)          # sorted by source
    # the slice is a real subsample, not everything
    assert sum(v[0] for v in want.values()) < len(texts)


def test_dup_ratio_estimate_is_unbiased_on_planted_corpus():
    # plant a known 25% duplicate ratio; the hash-space slice estimate
    # must land near it (clusters stay intact, so error is only the
    # which-clusters-fall-in-the-slice binomial, not pair loss)
    base = [f"unique text {i} padding" for i in range(1500)]
    texts = base + base[:500]                        # 2000 rows, 500 dups
    t = pa.table({"source": pa.array(["s"] * len(texts), pa.string()),
                  "text": pa.array(texts, pa.string())})
    out = dup_ratio_estimate(ray.data.from_arrow(t), slice_hex="28",
                             num_partitions=4).to_pandas()
    est = out.dup_ratio_e6[0] / 1e6
    assert abs(est - 0.25) < 0.08


def test_dup_ratio_bad_slice_hex():
    ds = ray.data.from_arrow(pa.table({"source": ["a"], "text": ["x"]}))
    with pytest.raises(ValueError):
        dup_ratio_estimate(ds, slice_hex="XY")
    with pytest.raises(ValueError):
        dup_ratio_estimate(ds, slice_hex="1")


def test_sketch_partitioning_invariant_and_dup_insensitive():
    from dedup.overlap import source_overlap_sketch
    t = _corpus()
    a = source_overlap_sketch(ray.data.from_arrow(t)).to_pandas()
    b = source_overlap_sketch(
        ray.data.from_arrow(t).repartition(6)).to_pandas()
    assert a.equals(b)
    # duplicating every row changes nothing (min is a semilattice)
    dup = pa.concat_tables([t, t])
    c = source_overlap_sketch(ray.data.from_arrow(dup)).to_pandas()
    assert a.equals(c)


def test_sketch_estimates_known_jaccard():
    from dedup.overlap import source_overlap_sketch
    shared = [f"shared text {i}" for i in range(100)]
    only_a = [f"a only {i}" for i in range(200)]
    only_b = [f"b only {i}" for i in range(200)]
    rows = [("a", x) for x in shared + only_a] + \
           [("b", x) for x in shared + only_b]
    t = pa.table({"source": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = source_overlap_sketch(ray.data.from_arrow(t),
                                num_perm=128).to_pandas()
    assert list(out.source_a) == ["a"] and list(out.source_b) == ["b"]
    j_true = 100 / 500
    sigma = (j_true * (1 - j_true) / 128) ** 0.5
    assert abs(out.jaccard_est_e6[0] / 1e6 - j_true) < 4 * sigma


def test_sketch_reports_disjoint_pairs_near_zero():
    from dedup.overlap import source_overlap_sketch
    rows = [("a", f"left {i}") for i in range(50)] + \
           [("b", f"right {i}") for i in range(50)]
    t = pa.table({"source": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = source_overlap_sketch(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    assert out.jaccard_est_e6[0] <= 50000     # ~0, sketch noise only


def test_null_sources_excluded_everywhere():
    rows = [("a", "shared"), ("b", "shared"), (None, "shared"),
            (None, "orphan"), ("a", "a only")]
    t = pa.table({"source": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    ds = ray.data.from_arrow(t)
    exact = source_overlap(ds, num_partitions=2).to_pandas()
    assert len(exact) == 1
    assert (exact.source_a[0], exact.source_b[0],
            exact.n_shared[0], exact.n_a[0], exact.n_b[0]) == \
        ("a", "b", 1, 2, 1)
    ratio = dup_ratio_estimate(ds, slice_hex="zz",
                               num_partitions=2).to_pandas()
    assert sorted(ratio.source) == ["a", "b"]      # no null-source row
    from dedup.overlap import source_overlap_sketch
    sk = source_overlap_sketch(ds).to_pandas()
    assert sorted(set(sk.source_a) | set(sk.source_b)) == ["a", "b"]


def test_dup_ratio_rejects_mixed_z_hex():
    ds = ray.data.from_arrow(pa.table({"source": ["a"], "text": ["x"]}))
    for bad in ("z0", "4z", "fz", "ZZ"):
        with pytest.raises(ValueError):
            dup_ratio_estimate(ds, slice_hex=bad)


from hypothesis import given, settings
from hypothesis import strategies as st

_SRC = ("alpha", "beta", "gamma", "zeta")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 7), st.sampled_from(_SRC)),
                max_size=60))
def test_overlap_partition_matches_bruteforce(rows):
    # the partition kernel (pure numpy, no Ray) must agree with a
    # brute-force set computation for ANY (key, source) multiset:
    # diagonal rows count distinct keys per source, pair rows count
    # keys shared by a source pair, both ordered source_a < source_b
    from dedup.overlap import _overlap_partition
    t = pa.table({
        "h64": pa.array([np.uint64(k) for k, _ in rows], pa.uint64()),
        "hhi": pa.array([np.uint64(k * 31) for k, _ in rows],
                        pa.uint64()),
        "source": pa.array([s for _, s in rows], pa.string()),
    })
    out = _overlap_partition(t)
    got: dict = {}
    for a, b, n in zip(out["source_a"].to_pylist(),
                       out["source_b"].to_pylist(),
                       out["n"].to_pylist()):
        got[(a, b)] = got.get((a, b), 0) + n
    per: dict = {}
    for k, s in rows:
        per.setdefault(s, set()).add(k)
    want: dict = {}
    for s, ks in per.items():
        want[(s, s)] = len(ks)
    srcs = sorted(per)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = len(per[a] & per[b])
            if n:
                want[(a, b)] = n
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["x", "yy", "zzz", "w w", ""]),
                max_size=30),
       st.sampled_from(["00", "28", "80", "zz"]))
def test_digest_source_rows_matches_bruteforce(texts, bound):
    # per-batch distinct (digest, source) rows + counts == Counter over
    # the same md5-prefix slice predicate
    from collections import Counter
    from dedup.overlap import _digest_source_rows
    srcs = [_SRC[i % 3] for i in range(len(texts))]
    t = pa.table({"source": pa.array(srcs, pa.string()),
                  "text": pa.array(texts, pa.string())})
    out = _digest_source_rows(t, "text", "source", slice_hex=bound,
                              with_count=True)
    got = Counter()
    for s, c in zip(out["source"].to_pylist(), out["c"].to_pylist()):
        got[s] += c
    want = Counter()
    dis: dict = {}
    for s, x in zip(srcs, texts):
        if hashlib.md5(x.encode()).hexdigest()[:2] < bound:
            want[s] += 1
            dis.setdefault(s, set()).add(x)
    assert got == want
    n_distinct = Counter()
    for s in out["source"].to_pylist():
        n_distinct[s] += 1
    assert n_distinct == Counter({s: len(v) for s, v in dis.items()})


def test_top_shared_texts_counts_and_order():
    from dedup.overlap import top_shared_texts
    rows = [("a", "everywhere text"), ("b", "everywhere text"),
            ("c", "everywhere text"), ("c", "everywhere text"),  # dup row
            ("a", "pair text"), ("b", "pair text"),
            ("a", "solo text"), (None, "orphan"), ("b", None)]
    t = pa.table({"source": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = top_shared_texts(ray.data.from_arrow(t), k=5,
                           num_partitions=3).to_pandas()
    assert len(out) == 2                     # solo/orphan filtered
    assert out.n_sources.tolist() == [3, 2]  # ordered by n_sources desc
    by = {r.snippet: (r.n_sources, r.n_rows, r.h) for r in out.itertuples()}
    assert by["everywhere text"] == (
        3, 4, hashlib.md5(b"everywhere text").hexdigest())
    assert by["pair text"][0:2] == (2, 2)
    # determinism across partitionings
    out2 = top_shared_texts(ray.data.from_arrow(t).repartition(5), k=5,
                            num_partitions=7).to_pandas()
    assert out.equals(out2)


def test_top_shared_texts_k_cutoff_is_md5_deterministic():
    from dedup.overlap import top_shared_texts
    rows = []
    for i in range(10):                       # 10 texts each in 2 sources
        rows += [("a", f"shared {i}"), ("b", f"shared {i}")]
    t = pa.table({"source": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = top_shared_texts(ray.data.from_arrow(t), k=4).to_pandas()
    want = sorted(hashlib.md5(f"shared {i}".encode()).hexdigest()
                  for i in range(10))[:4]
    assert out.h.tolist() == want             # md5-order tie-break
