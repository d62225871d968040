"""Winnowing fingerprints for the substring-dedup stage.

Replaces the survey's per-partition suffix-array sketch with the
winnowing algorithm (Schleimer, Wilkerson, Aiken 2003, "Winnowing:
Local Algorithms for Document Fingerprinting"), which is shuffle-native:
each document emits a small set of content-defined anchor hashes, docs
sharing an anchor become containment candidates via a plain ``groupby``
— no global suffix array and no cross-partition misses.

Guarantee: with char-gram length g and window w, any substring shared
verbatim between two documents of length >= w + g - 1 chars produces at
least one COMMON fingerprint in both (alignment-independent).  With the
defaults g=50, w=100 every >=256-char planted containment (FIXTURES.md
F1.1 'substring' class) is caught; candidates are then exact-verified
(`small in large`) in :mod:`dedup.pipeline`.

Both kernels are O(n) vectorized numpy: gram hashes via prefix sums of a
polynomial rolling hash (the base is odd, hence invertible mod 2^64),
window minima via the van Herk/Gil-Werman block prefix/suffix trick.
"""

from __future__ import annotations

import numpy as np

_B = np.uint64(1099511628211)  # FNV64 prime, odd => invertible mod 2^64
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _modinv_pow2(a: int, bits: int = 64) -> int:
    """Inverse of odd ``a`` mod 2^bits by Newton iteration."""
    x = a  # correct mod 2^3
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << bits)
    return x % (1 << bits)


_B_INV = np.uint64(_modinv_pow2(int(_B)))


def _gram_hashes(data: bytes, g: int) -> np.ndarray:
    """Hash of every g-byte gram in O(n):
    h_i = (S_{i+g-1} - S_{i-1}) * B^{-i} where S_j = sum_{t<=j} d_t B^t,
    all arithmetic wrapping mod 2^64, followed by a murmur-style
    avalanche so window-min selection isn't biased by raw byte values."""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr)
    if n < g:
        return np.empty(0, dtype=np.uint64)
    m = n - g + 1
    with np.errstate(over="ignore"):
        powB = np.empty(n, dtype=np.uint64)
        powB[0] = 1
        np.cumprod(np.full(n - 1, _B, dtype=np.uint64), out=powB[1:])
        S = np.cumsum(arr * powB, dtype=np.uint64)
        invp = np.empty(m, dtype=np.uint64)
        invp[0] = 1
        np.cumprod(np.full(m - 1, _B_INV, dtype=np.uint64), out=invp[1:])
        h = S[g - 1 :].copy()
        h[1:] -= S[: m - 1]
        h *= invp
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """Minimum of every length-w window, O(n) (van Herk/Gil-Werman)."""
    m = len(h)
    nwin = m - w + 1
    pad = (-m) % w
    hp = np.concatenate([h, np.full(pad, _U64_MAX, dtype=np.uint64)])
    blocks = hp.reshape(-1, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()
    suff = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suff[:nwin], pref[w - 1 : w - 1 + nwin])


def winnow(text: str, g: int = 50, w: int = 100) -> np.ndarray:
    """Unique winnowed anchor hashes of ``text`` (min of each w-window
    of g-gram hashes)."""
    h = _gram_hashes(text.encode("utf-8"), g)
    m = len(h)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    if m <= w:
        return np.unique(h.min(keepdims=True))
    return np.unique(_sliding_min(h, w))
