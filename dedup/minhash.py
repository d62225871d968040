"""Word-shingle hashing + MinHash signatures (vectorized, actor-pool stage).

The reference's only near-match operator is the asymmetric prefix-stem
predicate (MainViewModel.cs:1064-1072); per SURVEY.md §2.7/D3 we
generalize it to MinHash/LSH over word k-gram shingles (Broder 1997,
"On the resemblance and containment of documents").

Design notes (Ray-Data-first):
  * ``MinHashSigner`` is a callable CLASS for
    ``ds.map_batches(MinHashSigner, fn_constructor_kwargs=..., concurrency=N)``
    — the permutation table (2 x P uint64) and the token-hash cache are
    built ONCE per actor in ``__init__``, per-batch work is numpy over
    Arrow columns.
  * Per-shingle hashes are a vectorized rotate-xor combine of stable
    64-bit token hashes (blake2b, process-independent — python's
    ``hash()`` is salted and never used).
  * Signatures use the standard (a*x+b) mod 2^64 family with uint64
    wraparound; ``min`` over the shingle axis is a single numpy reduce.
  * Signature is stored as a ``binary`` column of P little-endian uint64
    (P*8 bytes) so it moves through shuffles as one buffer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

TOKEN_RE_PAT = r"\S+"


def token_hash64(token: str) -> int:
    """Stable 64-bit token hash (blake2b truncation)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization — must agree with the SQL oracle's
    ``regexp_extract_all(text, '\\S+')``."""
    return text.split()


class _TokenHasher:
    """Token -> uint64 with a bounded memo (vocab is Zipfian; the cache
    turns the per-token blake2b into a dict hit for the hot head).  The
    cap keeps long-running actors from growing without bound at web scale."""

    def __init__(self, cap: int = 1 << 21) -> None:
        self._cache: dict[str, int] = {}
        self._cap = cap

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        c = self._cache
        if len(c) > self._cap:
            c.clear()
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = c.get(t)
            if h is None:
                h = token_hash64(t)
                c[t] = h
            out[i] = h
        return out


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Unique 64-bit hashes of all k-gram shingles, vectorized over
    positions: h_i = XOR_j rotl64(th[i+j], 7*j).  Rotation makes the
    combine order-sensitive (['a','b'] != ['b','a'])."""
    n = len(token_hashes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    m = n - k + 1
    g = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        x = token_hashes[j : j + m]
        r = np.uint64((7 * j) % 64)
        rot = (x << r) | (x >> np.uint64((64 - 7 * j) % 64)) if j else x
        g ^= rot
    return np.unique(g)


class MinHashSigner:
    """map_batches actor: adds a ``minhash`` binary column (P*8 bytes;
    null when the doc has fewer than k tokens — such docs cannot
    near-match, mirroring the empty-candidate path MainViewModel.cs:769-777)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 42,
                 text_col: str = "text", out_col: str = "minhash") -> None:
        rng = np.random.default_rng(seed)
        # odd multipliers for a better-mixing mod-2^64 family
        self.a = (rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.out_col = out_col
        self.hasher = _TokenHasher()

    def sign_text(self, text: str | None) -> bytes | None:
        if not text:
            return None
        th = self.hasher.hash_tokens(tokenize(text))
        sh = shingle_hashes(th, self.k)
        if len(sh) == 0:
            return None
        # (P, S) wraparound hash, min over shingles
        sig = (self.a[:, None] * sh[None, :] + self.b[:, None]).min(axis=1)
        return sig.astype("<u8").tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = [self.sign_text(t) for t in texts]
        return batch.append_column(self.out_col, pa.array(sigs, type=pa.binary()))


_SIGNER_CACHE: dict[tuple, "MinHashSigner"] = {}


def cached_signer(num_perm: int, shingle_k: int, seed: int,
                  text_col: str = "text") -> "MinHashSigner":
    """Process-level signer cache: Ray tasks run in reusable worker
    processes, so a module-global memo gives once-per-worker setup (the
    actor-pool property) without actor-pool startup churn — at 32+ CPUs,
    spawning dozens of single-purpose actors per stage cost more than the
    signing itself.  Actor pools remain the right tool for heavyweight
    state (models); the permutation table is 2*P uint64."""
    key = (num_perm, shingle_k, seed, text_col)
    s = _SIGNER_CACHE.get(key)
    if s is None:
        s = MinHashSigner(num_perm=num_perm, shingle_k=shingle_k, seed=seed,
                          text_col=text_col)
        _SIGNER_CACHE[key] = s
    return s


def signature_agreement(sig_a: bytes, sig_b: bytes) -> float:
    """Fraction of agreeing MinHash components — unbiased estimator of
    the shingle Jaccard similarity."""
    a = np.frombuffer(sig_a, dtype="<u8")
    b = np.frombuffer(sig_b, dtype="<u8")
    return float((a == b).mean())


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact shingle Jaccard (test/verify helper, not a pipeline stage)."""
    h = _TokenHasher()
    sa = set(shingle_hashes(h.hash_tokens(tokenize(text_a)), k).tolist())
    sb = set(shingle_hashes(h.hash_tokens(tokenize(text_b)), k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
