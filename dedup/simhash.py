"""SimHash fingerprints + Hamming-block candidate keys.

64-bit SimHash (Charikar 2002, "Similarity estimation techniques from
rounding algorithms"; Manku et al. 2007 for the Hamming-block lookup
trick): each token votes its hash bits weighted by term frequency; the
fingerprint is the sign vector.  Near-identical pages differ in a few
bits, so candidates are found by grouping on each of ``t+1`` disjoint
bit-blocks (pigeonhole: two fingerprints within Hamming distance t agree
on at least one of t+1 blocks) — a plain Ray ``groupby`` per block, no
pairwise scan.

The 8-byte fingerprint is cheap enough to carry INTO the block-key rows,
so Hamming verification happens inside ``map_groups`` with zero extra
joins (unlike MinHash signatures, which are verified via a reduce-side
signature join — see :mod:`dedup.pairs`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .minhash import _TokenHasher, tokenize

_BITS = np.arange(64, dtype=np.uint64)


def simhash64(token_hashes: np.ndarray, counts: np.ndarray | None = None) -> int:
    """Weighted 64-bit SimHash of token hashes (vectorized unpack+sum)."""
    if len(token_hashes) == 0:
        return 0
    if counts is None:
        token_hashes, counts = np.unique(token_hashes, return_counts=True)
    bits = ((token_hashes[:, None] >> _BITS[None, :]) & np.uint64(1)) \
        .astype(np.int32)
    votes = ((2 * bits - 1) * counts[:, None].astype(np.int32)) \
        .sum(axis=0, dtype=np.int64)
    return int(((votes >= 0).astype(np.uint64) << _BITS)
               .sum(dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class SimHashSigner:
    """map_batches actor: adds a ``simhash`` uint64 column (0 for
    empty/null text — those rows are excluded from candidate gen)."""

    def __init__(self, seed: int = 42, text_col: str = "text",
                 out_col: str = "simhash") -> None:
        # seed kept for config parity; token hashing is unsalted blake2b
        self.text_col = text_col
        self.out_col = out_col
        self.hasher = _TokenHasher()

    def fingerprint(self, text: str | None) -> int:
        if not text:
            return 0
        return simhash64(self.hasher.hash_tokens(tokenize(text)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched fingerprinting, bit-identical to per-doc
        ``fingerprint`` (parity asserted in tests/test_kernels.py::
        test_batched_simhash_matches_per_doc_fingerprint; merging term
        counts by distinct STRING sums the same ±1 bit rows simhash64
        merges by hash — vote sums are linear in counts): ONLY the
        tokenization + token hashing is batch-vectorized (shared
        minhash.batch_token_codes — one dictionary encode, each distinct
        token hashed once per batch); the vote matrix itself stays a
        per-doc simhash64 call.  A fully-batched composite-key
        np.unique + slabbed-reduceat variant was built and measured
        TWICE (r4 and r5) at 0.36-0.6x this path — the 64-wide vote
        matrix is memory-bandwidth-bound and per-doc slices cache far
        better than one batch-wide gather — so the per-doc loop here is
        the deliberate fast path, not an oversight."""
        from .minhash import batch_token_codes
        uh, codes, counts = batch_token_codes(batch[self.text_col],
                                              self.hasher)
        nrows = len(counts)
        fps = np.zeros(nrows, dtype=np.uint64)
        if len(codes):
            th = uh[codes]
            offs = np.concatenate([[0], np.cumsum(counts)])
            for i in range(nrows):
                a, b = offs[i], offs[i + 1]
                if b > a:
                    fps[i] = simhash64(th[a:b])
        return batch.append_column(self.out_col,
                                   pa.array(fps, type=pa.uint64()))


_SIGNER_CACHE: dict[tuple, "SimHashSigner"] = {}


def cached_signer(seed: int, text_col: str = "text") -> "SimHashSigner":
    """Process-level cache; see dedup.minhash.cached_signer."""
    key = (seed, text_col)
    s = _SIGNER_CACHE.get(key)
    if s is None:
        s = SimHashSigner(seed=seed, text_col=text_col)
        _SIGNER_CACHE[key] = s
    return s


def block_keys(fp: int, n_blocks: int, bits: int = 64) -> list[tuple[int, int]]:
    """Split a fingerprint into ``n_blocks`` disjoint bit-blocks;
    returns (block_id, block_value) candidate keys."""
    width = bits // n_blocks
    mask = (1 << width) - 1
    return [(i, (fp >> (i * width)) & mask) for i in range(n_blocks)]
