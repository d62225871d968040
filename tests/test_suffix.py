"""Suffix-array substring stage: kernel correctness vs brute force and
the pipeline's shared-run semantics (north-star suffix-array stage;
reference semantic root: the similar-name conjunct generalized to
verbatim shared runs, MainViewModel.cs:1064-1072)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.config import DedupConfig
from dedup.pipeline import run_dedup
from dedup.suffix import prefix_ranks, shared_run, shared_run_pairs


def _brute_pairs(ids, texts, L):
    out = set()
    for i in range(len(texts)):
        subs = {texts[i][k:k + L] for k in range(len(texts[i]) - L + 1)}
        for j in range(i + 1, len(texts)):
            if any(texts[j][k:k + L] in subs
                   for k in range(len(texts[j]) - L + 1)):
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_prefix_ranks_equal_iff_equal_window():
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(5, 150))
        arr = rng.integers(0, 3, n).astype(np.uint8)
        for h in (1, 2, 4, 8):
            r = prefix_ranks(arr, h)
            for _ in range(40):
                i, j = (int(x) for x in rng.integers(0, n, 2))
                same = (arr[i:i + h].tobytes() == arr[j:j + h].tobytes()
                        and (n - i >= h) == (n - j >= h))
                assert (r[i] == r[j]) == same


def test_shared_run_pairs_vs_brute():
    rng = np.random.default_rng(11)
    for trial in range(20):
        ndocs = int(rng.integers(2, 7))
        L = int(rng.integers(3, 10))
        texts = [bytes(rng.integers(97, 101, int(rng.integers(0, 50)))
                       .astype(np.uint8)) for _ in range(ndocs)]
        if rng.random() < 0.7:
            run = bytes(rng.integers(97, 123, L).astype(np.uint8))
            i, j = rng.choice(ndocs, 2, replace=False)
            texts[i] = texts[i][:3] + run + texts[i][3:]
            texts[j] = run + texts[j]
        ids = np.arange(5, 5 + ndocs, dtype=np.uint64)
        u, v = shared_run_pairs(ids, texts, L)
        assert set(zip(u.tolist(), v.tolist())) == \
            _brute_pairs(ids.tolist(), texts, L), trial


def test_shared_run_boundary():
    assert shared_run(b"xx" + b"A" * 20, b"y" + b"A" * 20 + b"z", 20)
    assert not shared_run(b"A" * 19 + b"B", b"C" + b"A" * 19, 20)
    # run crossing a would-be separator must not leak across docs
    assert not shared_run(b"A" * 10, b"A" * 10, 20)


def test_shared_run_pairs_star_cap_keeps_connectivity():
    run = bytes(range(97, 117)) * 3  # 60-byte shared run
    texts = [bytes([105 + (i % 7)]) * (5 + i) + run for i in range(12)]
    ids = np.arange(12, dtype=np.uint64)
    u, v = shared_run_pairs(ids, texts, len(run), pair_cap=3)
    # star edges, not the full clique — but every node reachable
    assert len(u) < 12 * 11 // 2
    seen = set(u.tolist()) | set(v.tolist())
    assert seen == set(range(12))


def test_pipeline_suffix_array_mode():
    run300 = "R" + "x".join(str(i) for i in range(120))
    assert len(run300) >= 256
    docs = {
        "u1": "A" * 50 + run300 + "B" * 50,
        "u2": "C" * 400 + run300,
        "u3": "unrelated " * 60,
        "u4": "another distinct body " * 30,
        "u5": run300 + "D" * 40,
        "u6": "E" * 150 + run300[:100],  # overlap < 256 -> no edge
        # equal-length shared-run pair: winnow containment mode cannot
        # represent this (it requires strict length difference)
        "u7": "P" * 60 + run300 + "Q" * 60,
        "u8": "S" * 60 + run300 + "T" * 60,
    }
    ds = ray.data.from_arrow(pa.table({"url": list(docs),
                                       "text": list(docs.values())}))
    cfg = DedupConfig(exact=False, near=False, simhash=False,
                      substring_mode="suffix_array", min_doc_bytes=0)
    out = run_dedup(ds, cfg, check_html=False).to_pandas() \
        .set_index("url")["state"].to_dict()
    assert out == {"u1": "keep", "u2": "delete", "u5": "delete",
                   "u7": "delete", "u8": "delete",
                   "u3": "unique", "u4": "unique", "u6": "unique"}


def test_suffix_mode_config_validated():
    with pytest.raises(ValueError):
        DedupConfig(substring_mode="nope")
