"""Duplicated-span removal (dedup/spans.py) vs a naive per-window
reference: keeper = min (doc, offset) occurrence per distinct window,
every other occurrence's [o, o+L) range cut, overlaps merged."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup.spans import span_dedup


def _naive(texts, L, stride=1):
    occ = {}
    for d, t in enumerate(texts):
        t = t or ""
        for o in range(0, max(len(t) - L + 1, 0), stride):
            occ.setdefault(t[o:o + L], []).append((d, o))
    cuts = {}
    for lst in occ.values():
        if len(lst) > 1:
            for d, o in sorted(lst)[1:]:
                cuts.setdefault(d, []).append(o)
    out = []
    for d, t in enumerate(texts):
        t = t or ""
        cov = np.zeros(len(t), dtype=bool)
        for o in cuts.get(d, []):
            cov[o:o + L] = True
        out.append(("".join(c for c, m in zip(t, cov) if not m),
                    int(cov.sum()), len(t)))
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 3 + "unique tail one",
    "prefix text " + "the quick brown fox jumps over the lazy dog " * 3,
    "completely different content with no duplication at all whatsoever",
    "a" * 60,                       # self-overlapping repeat
    "short",
    None,
    "",
]


def _run(L, stride=1, parts=3, mode="exact"):
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)])
    return span_dedup(ds.repartition(parts), L=L, stride=stride, mode=mode,
                      num_partitions=5).sort("doc_id").to_pandas()


def test_span_dedup_matches_naive():
    got = _run(L=30)
    want = _naive(TEXTS, 30)
    for i, (txt, rem, n) in enumerate(want):
        assert got.loc[i, "text_dedup"] == txt
        assert got.loc[i, "n_removed"] == rem
        assert got.loc[i, "n_chars"] == n


def test_span_dedup_stride_matches_strided_naive():
    got = _run(L=30, stride=4)
    want = _naive(TEXTS, 30, stride=4)
    for i, (txt, rem, _) in enumerate(want):
        assert got.loc[i, "text_dedup"] == txt
        assert got.loc[i, "n_removed"] == rem
    # stride still catches the long duplicated run (len >= L + s - 1)
    assert got.loc[1, "n_removed"] > 0


def test_span_dedup_deterministic_across_partitions():
    a = _run(L=30, parts=2)
    b = _run(L=30, parts=6)
    assert a.equals(b)


def test_span_dedup_unicode_boundaries():
    texts = ["héllo wörld ünïcode " * 4, "x héllo wörld ünïcode " * 4]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = span_dedup(ds, L=15, mode="exact").sort("doc_id").to_pandas()
    want = _naive(texts, 15)
    for i, (txt, rem, n) in enumerate(want):
        assert got.loc[i, "text_dedup"] == txt
        assert got.loc[i, "n_removed"] == rem
        assert got.loc[i, "n_chars"] == n


def test_winnow_selection_guarantee_and_density():
    """_selected_starts('winnow'): every window of W consecutive starts
    contains a selection (max gap <= W), and density stays near the
    expected 2/(W+1) on random hashes."""
    from dedup.spans import _selected_starts
    rng = np.random.default_rng(7)
    for m, W in [(50, 16), (1000, 16), (10_000, 32), (15, 16), (1, 8)]:
        h1 = rng.integers(0, 2**64, size=m, dtype=np.uint64)
        sel = _selected_starts(h1, "winnow", 1, W)
        assert len(sel) >= 1
        assert sel[0] <= W - 1
        assert sel[-1] >= m - W
        if len(sel) > 1:
            assert int(np.diff(sel).max()) <= W
        if m >= 1000:
            assert len(sel) < m * 4 / W  # emission density bounded


def test_winnow_mode_cuts_long_shared_run():
    """Default (winnow) mode: a shared run of length >= L + W - 1 is
    detected; the first-occurrence doc keeps its text byte-identical and
    the later doc loses chars only inside the shared run."""
    # a shared run with NO internal repetition (self-repeats would make
    # the keeper doc legitimately self-dedup); len 150 >= L + W - 1 = 65
    run = " ".join(f"tok{i:03d}" for i in range(22))
    prefix = "totally distinct preamble content goes here and here "
    texts = [run, prefix + run, "unrelated content entirely different"]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = span_dedup(ds.repartition(2), L=50, winnow_window=16,
                     num_partitions=4).sort("doc_id").to_pandas()
    assert got.loc[0, "text_dedup"] == run          # keeper untouched
    assert got.loc[0, "n_removed"] == 0
    assert got.loc[1, "n_removed"] > 0              # duplicate cut
    assert got.loc[1, "text_dedup"].startswith(prefix)  # prefix intact
    assert got.loc[2, "n_removed"] == 0


def test_winnow_mode_deterministic_across_partitions():
    a = _run(L=30, parts=2, mode="winnow")
    b = _run(L=30, parts=6, mode="winnow")
    assert a.equals(b)


def test_winnow_cuts_subset_of_exact():
    """Winnow-mode cut chars are a subset of exact-mode cut chars per
    doc (selection only removes candidate windows, never adds)."""
    ex = _run(L=30, mode="exact")
    wn = _run(L=30, mode="winnow")
    assert (wn["n_removed"] <= ex["n_removed"]).all()
    assert wn["n_removed"].sum() > 0  # and it does cut the planted dups


def test_top_spans_counts_and_text_recovery():
    from collections import Counter
    from dedup.spans import top_spans
    texts = [t or "" for t in TEXTS]
    L = 30
    cnt = Counter()
    docs_of = {}
    first = {}
    for d, t in enumerate(texts):
        for o in range(max(len(t) - L + 1, 0)):
            w = t[o:o + L]
            cnt[w] += 1
            docs_of.setdefault(w, set()).add(d)
            first.setdefault(w, (d, o))
    want = sorted(((w, c) for w, c in cnt.items() if c >= 2),
                  key=lambda x: (-x[1], first[x[0]]))[:10]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)])
    got = top_spans(ds.repartition(3), L=L, k=10, min_count=2,
                    mode="exact", num_partitions=4).to_pandas()
    assert list(got["span"]) == [w for w, _ in want]
    assert list(got["n_occ"]) == [c for _, c in want]
    assert list(got["n_docs"]) == [len(docs_of[w]) for w, _ in want]
    for _, r in got.iterrows():
        assert texts[r["rep_doc"]][r["rep_offset"]:r["rep_offset"] + L] \
            == r["span"]
