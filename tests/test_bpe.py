"""BPE trainer/encoder (dedup/bpe.py): reference-example merges,
roundtrip invariant, determinism across blocking, scale knobs."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup.bpe import (EOW, _encode_word, bpe_encode_stats, train_bpe,
                       word_counts)


def _ds(texts, parts=3):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})) \
        .repartition(parts)


def test_bpe_sennrich_reference_example():
    """The classic subword-nmt walkthrough: with 'newest' dominating,
    the first merges build 'est</w>' from (e,s), (es,t), (est,</w>)."""
    corpus = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    merges = train_bpe(_ds(corpus, parts=1), n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW)]
    ranks = {tuple(p): i for i, p in enumerate(
        train_bpe(_ds(corpus, parts=1), n_merges=10))}
    assert _encode_word("lowest", ranks) == ["low", "est" + EOW]


def test_bpe_roundtrip_and_bounds():
    """Encoding is a partition of the word's characters: concatenating
    the subwords (minus the EOW marker) reproduces the word, and the
    per-doc subword count is bounded by [n_words, n_chars + n_words]."""
    rng = np.random.default_rng(4)
    words = ["".join(rng.choice(list("abcdef"), size=rng.integers(1, 9)))
             for _ in range(60)]
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(40)]
    ds = _ds(texts)
    merges = train_bpe(ds, n_merges=50)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in words:
        enc = _encode_word(w, ranks)
        assert "".join(enc).removesuffix(EOW) == w
    out = bpe_encode_stats(_ds(texts), merges).sort("doc_id").to_pandas()
    assert (out.n_words == 20).all()
    assert (out.n_bpe_tokens >= out.n_words).all()
    lens = [len(t.replace(" ", "")) for t in texts]
    assert (out.n_bpe_tokens <= np.array(lens) + out.n_words).all()


def test_bpe_deterministic_across_blocking():
    rng = np.random.default_rng(8)
    words = ["".join(rng.choice(list("xyzw"), size=rng.integers(2, 7)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(words, size=15)) for _ in range(30)]
    m1 = train_bpe(_ds(texts, parts=2), n_merges=40)
    m2 = train_bpe(_ds(texts, parts=9), n_merges=40)
    assert m1 == m2
    a = bpe_encode_stats(_ds(texts, parts=2), m1).sort("doc_id").to_pandas()
    b = bpe_encode_stats(_ds(texts, parts=9), m1).sort("doc_id").to_pandas()
    assert a.equals(b)


def test_bpe_max_vocab_caps_trainer_input():
    texts = ["aa bb cc dd ee ff gg hh aa aa bb bb"]
    # cap to the 2 most frequent words — merges can only come from aa/bb
    merges = train_bpe(_ds(texts, parts=1), n_merges=10, max_vocab=2)
    syms = {s for p in merges for s in p}
    assert all(set(s.replace(EOW, "")) <= {"a", "b"} for s in syms)


def test_encode_word_roundtrip_property():
    """The partition invariant holds for ANY rank table: concatenating
    the encoded subwords always reproduces word + EOW."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2,
             ("b", EOW): 3, ("d", "a"): 4, ("ab", "ab"): 5}

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcd", min_size=1, max_size=16))
    def _check(w):
        enc = _encode_word(w, ranks)
        assert "".join(enc) == w + EOW
        assert all(len(s) > 0 for s in enc)

    _check()


def test_word_counts_matches_naive():
    texts = ["a b a", None, "  b   c b  "]
    got = word_counts(_ds(texts)).to_pandas() \
        .sort_values("word").reset_index(drop=True)
    assert got.to_dict("list") == {"word": ["a", "b", "c"],
                                   "cnt": [2, 3, 1]}
