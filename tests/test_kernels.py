"""Kernel-level tests: MinHash estimator, SimHash, winnowing."""

import random

import numpy as np

from dedup.minhash import (MinHashSigner, _TokenHasher, jaccard,
                           shingle_hashes, signature_agreement, tokenize)
from dedup.simhash import hamming64, simhash64
from dedup.winnow import _gram_hashes, _sliding_min, winnow


def _rand_words(rng, n):
    return [f"w{rng.randrange(5000)}" for _ in range(n)]


def test_shingles_order_sensitive_and_unique():
    h = _TokenHasher()
    a = shingle_hashes(h.hash_tokens(["a", "b", "c", "d", "e", "f"]), 5)
    b = shingle_hashes(h.hash_tokens(["f", "e", "d", "c", "b", "a"]), 5)
    assert len(a) == 2 and len(b) == 2
    assert set(a.tolist()) != set(b.tolist())
    assert len(shingle_hashes(h.hash_tokens(["a", "b"]), 5)) == 0


def test_minhash_estimates_jaccard():
    rng = random.Random(3)
    signer = MinHashSigner(num_perm=256, shingle_k=5, seed=42)
    base = _rand_words(rng, 400)
    for edit_n in (4, 20, 60):
        other = list(base)
        for _ in range(edit_n):
            other[rng.randrange(len(other))] = f"x{rng.randrange(9999)}"
        ta, tb = " ".join(base), " ".join(other)
        true_j = jaccard(ta, tb, 5)
        est = signature_agreement(signer.sign_text(ta), signer.sign_text(tb))
        # std err ~ sqrt(J(1-J)/256) <= 0.032; allow 4 sigma
        assert abs(est - true_j) < 0.13, (true_j, est)


def test_minhash_deterministic_across_instances():
    s1 = MinHashSigner(seed=42)
    s2 = MinHashSigner(seed=42)
    t = "some words repeated some words and more tokens here to shingle"
    assert s1.sign_text(t) == s2.sign_text(t)
    assert MinHashSigner(seed=43).sign_text(t) != s1.sign_text(t)


def test_simhash_near_for_small_edits():
    rng = random.Random(5)
    h = _TokenHasher()
    base = _rand_words(rng, 600)
    fp_a = simhash64(h.hash_tokens(base))
    other = list(base)
    other[10] = "changedword"
    fp_b = simhash64(h.hash_tokens(other))
    assert hamming64(fp_a, fp_b) <= 8
    unrelated = _rand_words(rng, 600)
    fp_c = simhash64(h.hash_tokens(unrelated))
    assert hamming64(fp_a, fp_c) > 10


def test_gram_hashes_match_naive():
    rng = random.Random(1)
    data = bytes(rng.randrange(97, 123) for _ in range(800))
    got = _gram_hashes(data, 20)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = len(arr) - 19
    naive = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        p = np.uint64(1)
        for j in range(20):
            naive += arr[j:j + m] * p
            p = p * np.uint64(1099511628211)
        naive ^= naive >> np.uint64(33)
        naive *= np.uint64(0xFF51AFD7ED558CCD)
        naive ^= naive >> np.uint64(33)
    assert (got == naive).all()


def test_sliding_min_matches_naive():
    rng = np.random.default_rng(2)
    h = rng.integers(0, 1 << 60, size=777, dtype=np.uint64)
    for w in (3, 50, 100):
        naive = np.array([h[i:i + w].min() for i in range(len(h) - w + 1)])
        assert (_sliding_min(h, w) == naive).all()


def test_winnow_shared_substring_guarantee():
    rng = random.Random(9)
    for _ in range(5):
        a = "".join(chr(rng.randrange(97, 123)) for _ in range(1500))
        lo = rng.randrange(0, 1100)
        block = a[lo:lo + 300]
        b = ("".join(chr(rng.randrange(97, 123)) for _ in range(400))
             + block
             + "".join(chr(rng.randrange(97, 123)) for _ in range(300)))
        assert set(winnow(a).tolist()) & set(winnow(b).tolist())


def test_tokenize_matches_regex_semantics():
    import re
    for s in ["a b  c", " lead", "trail ", "", "\tx\ny z "]:
        assert tokenize(s) == re.findall(r"\S+", s)


def test_multi_anchor_star_edges():
    """Over-cap buckets emit stars from _STAR_ANCHORS smallest nodes, so
    a single bucket false-positive anchor can't sever verified links
    (ADVICE r1)."""
    from dedup.pipeline import _STAR_ANCHORS, _emit_bucket_pairs
    nodes = np.array([50, 10, 30, 20, 60, 40], dtype=np.uint64)
    out_u, out_v = [], []
    _emit_bucket_pairs(nodes, None, False, cap=3, out_u=out_u, out_v=out_v)
    edges = set(zip(np.concatenate(out_u).tolist(),
                    np.concatenate(out_v).tolist()))
    srt = np.sort(nodes)
    for a in range(_STAR_ANCHORS):
        for x in srt[a + 1:]:
            assert (srt[a], int(x)) in edges
    # still O(k*n), not all-pairs
    assert len(edges) < 6 * 5 / 2 + 1


def test_star_cap_recall_under_verification():
    """pair_cap=2 forces every bucket through the star path while the
    jaccard verify post-filters edges; planted recall must hold."""
    import pyarrow as pa
    import ray.data
    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup
    from dedup.synth import generate_pages
    pages, truth = generate_pages(400, seed=33)
    ds = ray.data.from_arrow(pages).repartition(4)
    cfg = DedupConfig(simhash=False, substring=False, pair_cap=2,
                      verify="jaccard", verify_threshold=0.7)
    out = run_dedup(ds, cfg, num_partitions=8)
    cid = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            cid[b["url"][i].as_py()] = b["cluster_id"][i].as_py()
    cls_of = dict(zip(truth["url"].to_pylist(),
                      truth["cluster_class"].to_pylist()))
    clusters = {}
    for u, c in zip(truth["url"].to_pylist(), truth["cluster_id"].to_pylist()):
        if c >= 0 and cls_of[u] in ("exact", "near"):
            clusters.setdefault(c, []).append(u)
    total = found = 0
    for members in clusters.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if cid[members[i]] == cid[members[j]] != "":
                    found += 1
    assert total > 20
    assert found / total >= 0.99, found / total


def test_emit_partition_pairs_matches_per_bucket_reference():
    """The vectorized size-2 fast path + >=3 loop must emit exactly the
    pairs of the per-bucket reference (_emit_bucket_pairs over every
    bucket), for plain / diff-scope modes and over-cap buckets."""
    from dedup.pipeline import _emit_bucket_pairs, _emit_partition_pairs
    from dedup.dist import segments

    rng = np.random.default_rng(7)
    n = 5000
    sk = rng.integers(0, 1800, n).astype(np.uint64)  # many size-2 buckets
    nodes = rng.permutation(n).astype(np.uint64)
    scopes = rng.integers(0, 3, n).astype(np.uint64)
    cap = 8

    def canon(out_u, out_v):
        if not out_u:
            return set()
        u = np.concatenate(out_u)
        v = np.concatenate(out_v)
        return set(zip(u.tolist(), v.tolist()))

    for diff_scope, sc in ((False, scopes), (True, scopes), (False, None)):
        ref_u, ref_v = [], []
        order, starts, _ = segments(sk)
        for gi in range(len(starts) - 1):
            s, e = starts[gi], starts[gi + 1]
            if e - s < 2:
                continue
            idx = order[s:e]
            _emit_bucket_pairs(nodes[idx],
                               sc[idx] if sc is not None else None,
                               diff_scope, cap, ref_u, ref_v)
        got_u, got_v = [], []
        _emit_partition_pairs(sk, nodes, sc, diff_scope, cap, got_u, got_v)
        assert canon(got_u, got_v) == canon(ref_u, ref_v), \
            f"mismatch diff_scope={diff_scope} scoped={sc is not None}"


def test_full_hi_views_second_word():
    """_full_hi must return bytes 8..16 of each 16-byte key, for chunked
    and sliced layouts."""
    import hashlib
    import pyarrow as pa
    from dedup.pipeline import _full_hi

    vals = [hashlib.blake2b(str(i).encode(), digest_size=16).digest()
            for i in range(300)]
    exp = np.array([int.from_bytes(v[8:16], "little") for v in vals],
                   dtype=np.uint64)
    col = pa.chunked_array([pa.array(vals[:100], pa.binary()),
                            pa.array(vals[100:], pa.binary())])
    assert (_full_hi(col) == exp).all()
    sl = pa.table({"x": pa.array(vals, pa.binary())}).slice(37, 200)
    assert (_full_hi(sl["x"]) == exp[37:237]).all()


def test_normalize_text_column_matches_reference():
    import pyarrow as pa
    from dedup.extract import normalize_text, normalize_text_column
    cases = [
        "Hello, World!  foo-bar_baz",
        "  A  B\tC\nD ",
        "ALL CAPS!!!",
        "",
        "中文 Mixed-CASE 句子。",
        "a@b.c [x] `y` {z} ~w",
        "é À Ü ß",
        None,
    ]
    got = normalize_text_column(pa.array(cases, pa.string())).to_pylist()
    want = [normalize_text(c) if c is not None else None for c in cases]
    assert got == want
    # idempotent: normalizing a normalized string is a no-op
    again = normalize_text_column(pa.array(
        [g for g in got if g is not None])).to_pylist()
    assert again == [g for g in got if g is not None]


def test_scrub_pii_table_counts_and_redaction():
    import pyarrow as pa
    from dedup.textstats import scrub_pii_table
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "mail a.b+c@x-corp.co.uk and d@e.io today",
            "call +44 20 7946 0958 or +1 5551234567 now",
            "order 123456789012 shipped, ref 987654321",
            None,
        ],
    })
    out = scrub_pii_table(t)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
    assert out["n_phones"].to_pylist() == [0, 2, 0, 0]
    assert out["n_numbers"].to_pylist() == [0, 0, 2, 0]
    got = out["text_scrubbed"].to_pylist()
    assert got[0] == "mail <EMAIL> and <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "order <NUM> shipped, ref <NUM>"
    assert got[3] == ""
    # phones already redacted are not re-matched as long numbers
    assert "<NUM>" not in got[1]

def test_repetition_stats_table_matches_naive():
    import pyarrow as pa
    from collections import Counter
    from dedup.textstats import repetition_stats_table
    texts = [
        "a b a b\na b a b\nunique line",     # repeated line + repeated 2-grams
        "x y z",                              # nothing repeated
        "w w w w w",                          # one token repeated -> one 2-gram
        "",                                   # empty doc
        None,                                 # null doc
        "line\nline\nline",                   # only line repetition
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_stats_table(t)

    for i, txt in enumerate(texts):
        s = txt or ""
        lines = s.split("\n")
        lc = Counter(lines)
        ltot = len(lines)
        ldup = sum(c for c in lc.values() if c > 1)
        toks = [x for x in __import__("re").split(r"\s+", s) if x != ""]
        grams = [(a, b) for a, b in zip(toks, toks[1:])]
        gc = Counter(grams)
        gtot = len(grams)
        gmx = max(gc.values()) if gc else 0
        gdup = sum(c for c in gc.values() if c > 1)
        assert out["n_lines"][i].as_py() == ltot
        assert out["dup_line_frac_e6"][i].as_py() == ldup * 10**6 // max(ltot, 1)
        assert out["n_2grams"][i].as_py() == gtot
        assert out["top_2gram_frac_e6"][i].as_py() == gmx * 10**6 // max(gtot, 1)
        assert out["dup_2gram_frac_e6"][i].as_py() == gdup * 10**6 // max(gtot, 1)


def test_batched_signer_matches_per_doc_sign_text():
    # the batched __call__ (arrow whitespace split + dictionary-encoded
    # token hashing + reduceat min) must be byte-identical to the
    # per-doc reference path across nulls, empties, whitespace edge
    # cases, sub-k docs and long docs
    import pyarrow as pa
    from dedup.minhash import MinHashSigner
    texts = [None, "", "   ", "one two", "a b c d e",
             "  leading and trailing  ", "a\tb\nc d e f g",
             "tok " * 500, "a b c d", " nbsp a b c d e f"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = MinHashSigner()(t)["minhash"].to_pylist()
    ref = MinHashSigner()
    want = [ref.sign_text(x) for x in texts]
    assert got == want


def test_batched_simhash_matches_per_doc_fingerprint():
    # the batched __call__ (batch-vectorized tokenization + per-doc
    # vote sums over shared token codes) must be bit-identical to the
    # per-doc reference path across nulls, empties, whitespace edge
    # cases, repeated tokens and long docs
    import pyarrow as pa
    from dedup.simhash import SimHashSigner
    texts = [None, "", "   ", "one two", "a b c d e",
             "  leading and trailing  ", "a\tb\nc d e f g",
             "tok " * 500, "alpha beta alpha beta gamma",
             " nbsp a b c d e f", "zz yy xx " * 100]
    t = pa.table({"text": pa.array(texts, pa.string())})
    signer = SimHashSigner()
    got = signer(t)["simhash"].to_pylist()
    want = [signer.fingerprint(x) for x in texts]
    assert got == want
