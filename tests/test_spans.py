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


# ---------------------------------------------------------------------------
# span_decontaminate (verbatim L-char overlap with a benchmark corpus)
# ---------------------------------------------------------------------------

from dedup.spans import span_decontaminate  # noqa: E402

BENCH_TEXTS = [
    "The quick brown fox jumps over the lazy dog near the river bank "
    "every single morning in early spring.",
    "x" * 40,                       # too short to contribute windows
]
SHARED = "jumps over the lazy dog near the river bank every single morning"


def _decon_naive(train_texts, bench_texts, L):
    bw = set()
    for t in bench_texts:
        t = t or ""
        for i in range(max(len(t) - L + 1, 0)):
            bw.add(t[i:i + L])
    out = []
    for t in train_texts:
        t = t or ""
        n_win = max(len(t) - L + 1, 0)
        n_hit = sum(1 for i in range(n_win) if t[i:i + L] in bw)
        out.append((n_win, n_hit, int(n_hit > 0)))
    return out


def _mk(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_span_decontaminate_exact_matches_naive():
    train = ["no overlap here with anything benchmarky at all, not even "
             "a little bit of shared phrasing to speak of",
             "prefix text then " + SHARED + " then a suffix",
             None,
             "short",
             BENCH_TEXTS[0]]        # full benchmark doc verbatim
    res = span_decontaminate(_mk(train), _mk(BENCH_TEXTS), L=50,
                             mode="exact").sort("doc_id").take_all()
    naive = _decon_naive(train, BENCH_TEXTS, 50)
    assert [(r["n_windows"], r["n_contaminated"], r["span_contaminated"])
            for r in res] == naive
    assert res[1]["span_contaminated"] == 1      # planted overlap caught
    assert res[0]["span_contaminated"] == 0


def test_span_decontaminate_winnow_guarantee_and_clean():
    # planted overlap of length >= L + W - 1 must be caught; a clean doc
    # must not be flagged (hash false hits ~2^-64)
    W = 16
    long_shared = BENCH_TEXTS[0][10:10 + 50 + W - 1]
    train = ["wrapper before " + long_shared + " wrapper after",
             "entirely unrelated material that shares nothing with the "
             "benchmark and is long enough to carry several anchors"]
    res = span_decontaminate(_mk(train), _mk(BENCH_TEXTS), L=50,
                             mode="winnow", winnow_window=W) \
        .sort("doc_id").take_all()
    assert res[0]["span_contaminated"] == 1
    assert res[1]["span_contaminated"] == 0
    assert res[0]["n_anchors"] >= 1


def test_span_decontaminate_deterministic_across_partitions():
    train = ["prefix " + SHARED + " suffix"] * 7 + \
            ["unrelated filler text that is long enough for windows"] * 6
    t = pa.table({"doc_id": pa.array(range(len(train)), pa.int64()),
                  "text": pa.array(train, pa.string())})
    outs = []
    for P in (1, 5):
        ds = ray.data.from_arrow(t).repartition(P)
        r = span_decontaminate(ds, _mk(BENCH_TEXTS), L=50,
                               mode="exact").sort("doc_id").take_all()
        outs.append([(x["doc_id"], x["n_contaminated"]) for x in r])
    assert outs[0] == outs[1]


def test_span_decontaminate_empty_bench_flags_nothing():
    res = span_decontaminate(
        _mk(["some train text that is long enough to have many windows "
             "but nothing to collide with"]),
        _mk(["tiny"]), L=50, mode="exact").take_all()
    assert res[0]["n_contaminated"] == 0
    assert res[0]["span_contaminated"] == 0


def test_span_decontaminate_rejects_bad_mode():
    import pytest
    with pytest.raises(ValueError):
        span_decontaminate(_mk(["x"]), _mk(["y"]), mode="nope")


def test_span_decontaminate_cut_removes_exact_overlap():
    # the contaminated run must vanish; clean docs pass byte-identical
    train = ["prefix text then " + SHARED + " then a suffix",
             "totally clean content long enough to window but unshared",
             None, "short"]
    res = span_decontaminate(_mk(train), _mk(BENCH_TEXTS), L=50,
                             mode="exact", emit="cut") \
        .sort("doc_id").take_all()
    # naive: merge [o, o+50) over hit positions, drop covered chars
    bw = set()
    for t in BENCH_TEXTS:
        for i in range(max(len(t) - 49, 0)):
            bw.add(t[i:i + 50])
    for r, txt in zip(res, train):
        t = txt or ""
        cov = [False] * len(t)
        for o in range(max(len(t) - 49, 0)):
            if t[o:o + 50] in bw:
                for j in range(o, o + 50):
                    cov[j] = True
        want = "".join(c for c, m in zip(t, cov) if not m)
        assert r["text_clean"] == (txt if txt is None else want) or \
            r["text_clean"] == want
        assert r["n_removed_chars"] == sum(cov)
    assert res[0]["n_removed_chars"] > 0
    assert SHARED not in res[0]["text_clean"]
    assert res[1]["text_clean"] == train[1]


def test_span_decontaminate_cut_requires_exact_mode():
    import pytest
    with pytest.raises(ValueError):
        span_decontaminate(_mk(["x"]), _mk(["y"]), mode="winnow",
                           emit="cut")
    with pytest.raises(ValueError):
        span_decontaminate(_mk(["x"]), _mk(["y"]), emit="nope")


def test_bench_window_rows_collision_keeps_all_strings(monkeypatch):
    # force every window onto ONE mixed hash: the confirm-string set
    # must still carry every distinct benchmark window (dedup is by
    # string VALUE, not by hash), with the shorter hash column padded
    import dedup.spans as spans_mod
    monkeypatch.setattr(spans_mod, "_mix128",
                        lambda h1, h2: np.zeros(len(h1), np.uint64))
    txt = "abcdefgh"   # L=4 -> 5 distinct windows
    t = pa.table({"text": pa.array([txt], pa.string())})
    out = spans_mod._bench_window_rows(t, 4, "exact", 16, "text")
    hs = [x for x in out["h"].to_pylist() if x is not None]
    ss = sorted(x for x in out["s"].to_pylist() if x is not None)
    assert hs == [0]                      # all windows collided
    assert ss == sorted(txt[i:i + 4] for i in range(5))
    assert out.num_rows == 5              # padded to the string count


def test_span_prober_string_confirm_is_value_based():
    # the screen admits by hash; the confirm must accept ANY string in
    # the benchmark set and reject hash-screened strings outside it
    from dedup.spans import (_SpanProber, _codepoints, _window_hashes,
                             _mix128, _B1, _B1_INV, _B2, _B2_INV)
    L = 6
    win_a, win_b = "aaaaaa", "bbbbbb"

    def mixed(s):
        cp = _codepoints(s)
        return _mix128(_window_hashes(cp, L, _B1, _B1_INV),
                       _window_hashes(cp, L, _B2, _B2_INV))

    keys = np.sort(np.concatenate([mixed(win_a), mixed(win_b)]))
    # simulate a collision-recovered confirm set holding BOTH strings
    prober = _SpanProber(href=keys,
                         sref=pa.array(sorted([win_a, win_b])),
                         L=L, mode="exact", W=16,
                         id_col="doc_id", text_col="text")
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"xx{win_a}yy", f"xx{win_b}yy", "no match here"],
                         pa.string()),
    })
    out = prober(t)
    assert out["span_contaminated"].to_pylist() == [1, 1, 0]
    # negative: hash screened in but string NOT in the confirm set
    prober2 = _SpanProber(href=keys, sref=pa.array([win_a]),
                          L=L, mode="exact", W=16,
                          id_col="doc_id", text_col="text")
    out2 = prober2(t)
    assert out2["span_contaminated"].to_pylist() == [1, 0, 0]
