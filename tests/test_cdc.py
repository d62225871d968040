"""Content-defined chunking tier: boundary-rule parity with a pure-
Python reference, shift resistance (the CDC property), determinism
across blocking, zero rows for empty docs."""

import numpy as np
import pyarrow as pa
import ray.data

from dedup.cdc import DEFAULT_MASK_BITS, DEFAULT_WINDOW, cdc_report, chunk_doc

_B1 = 0x9E3779B97F4A7C15 | 1
_B2 = 0xC2B2AE3D27D4EB4F | 1
_M = 1 << 64


def _naive_chunks(text, mask_bits=DEFAULT_MASK_BITS, w=DEFAULT_WINDOW):
    cp = [ord(c) for c in text]
    n = len(cp)
    if n <= w:
        return [(0, n)]
    mask = (1 << mask_bits) - 1
    starts = [0]
    for o in range(n - w + 1):
        h = sum(cp[o + t] * pow(_B1, t, _M) for t in range(w)) % _M
        if h & mask == 0 and o + w < n:
            starts.append(o + w)
    starts = sorted(set(starts))
    return list(zip(starts, starts[1:] + [n]))


def _naive_report(texts, ids):
    chunks = {}  # key -> first (doc, off)
    occs = []
    for i, t in zip(ids, texts):
        if not t:
            occs.append((i, []))
            continue
        spans = _naive_chunks(t)
        cl = []
        for l, r in spans:
            k1 = sum(ord(t[l + j]) * pow(_B1, j, _M)
                     for j in range(r - l)) % _M
            k2 = sum(ord(t[l + j]) * pow(_B2, j, _M)
                     for j in range(r - l)) % _M
            key = (k1, k2, r - l)
            if key not in chunks or (i, l) < chunks[key]:
                chunks[key] = min(chunks.get(key, (i, l)), (i, l))
            cl.append((key, l, r - l))
        occs.append((i, cl))
    out = {}
    for i, cl in occs:
        nb = len(cl)
        dup = sum(1 for key, l, _ in cl if chunks[key] != (i, l))
        ch = sum(ln for _, _, ln in cl)
        dch = sum(ln for key, l, ln in cl if chunks[key] != (i, l))
        out[i] = (nb, dup, ch, dch, dch * 1_000_000 // ch if ch else 0)
    return out


def _rand_texts(n, seed):
    rng = np.random.default_rng(seed)
    alpha = list("abcdefgh ")
    return ["".join(rng.choice(alpha, rng.integers(200, 900)))
            for _ in range(n)]


def test_chunk_doc_matches_naive_boundaries():
    texts = _rand_texts(6, seed=51)
    for t in texts:
        got = chunk_doc(np.frombuffer(t.encode("utf-32-le"),
                                      dtype=np.uint32))
        want = [l for l, _ in _naive_chunks(t)]
        assert got.tolist() == want


def test_cdc_report_matches_naive():
    texts = _rand_texts(20, seed=52)
    # plant shifted copies: doc 100+i = junk prefix + doc i's text
    ids = list(range(20)) + [100 + i for i in range(5)]
    texts = texts + ["XYZPAD-%d " % i + texts[i] for i in range(5)]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    got = cdc_report(ray.data.from_arrow(t).repartition(5)).to_pandas()
    want = _naive_report(texts, ids)
    for _, row in got.iterrows():
        assert (row["n_chunks"], row["dup_chunks"], row["n_chars"],
                row["dup_chars"], row["dup_ratio_e6"]) == want[row["doc_id"]]


def test_cdc_shift_resistance():
    # the defining CDC property: a prefix insertion leaves most chunk
    # boundaries (hence chunks) intact, so the copy dedups heavily
    rng = np.random.default_rng(53)
    alpha = list("abcdefgh ")
    texts = ["".join(rng.choice(alpha, rng.integers(2000, 6000)))
             for _ in range(8)]
    ids = list(range(8)) + [200 + i for i in range(8)]
    texts = texts + ["PREFIX%d " % i + texts[i] for i in range(8)]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    rep = cdc_report(ray.data.from_arrow(t), mask_bits=6).to_pandas() \
        .set_index("doc_id")
    twins = rep.loc[[200 + i for i in range(8)]]
    base = rep.loc[list(range(8))]
    assert (twins["dup_ratio_e6"] >= 700_000).all()
    assert (base["dup_ratio_e6"] <= 100_000).all()


def test_cdc_blocking_invariance_and_empty_docs():
    texts = _rand_texts(10, seed=54) + [None, ""]
    ids = list(range(12))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    a = cdc_report(ray.data.from_arrow(t)).to_pandas()
    b = cdc_report(ray.data.from_arrow(t).repartition(7)).to_pandas()
    assert a.equals(b)
    assert len(a) == 12
    z = a[a.doc_id >= 10]
    assert (z[["n_chunks", "n_chars", "dup_ratio_e6"]] == 0).all().all()
