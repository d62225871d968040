"""Per-partition sorted suffix tables for exact substring dedup.

The north-star names this stage directly: an actor-pool stage holding
per-partition sorted suffix tables.  The reference's semantic analogue
is the prefix-stem near-match conjunct (MainViewModel.cs:1064-1072)
generalized to "two documents share a verbatim byte run of length >=
min_substring" — the classic exact-substring dedup contract (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better").

Design (vectorized, partition-local — never a global suffix array):

* ``prefix_ranks`` builds Manber–Myers prefix-doubling ranks over a
  byte buffer: after round k every position carries the rank of its
  first 2^k bytes.  Each round is one ``np.lexsort`` — O(n log n log L)
  total and fully vectorized (no per-suffix Python).
* "suffix i and j share a prefix of length >= L" is decided WITHOUT an
  LCP array via the standard two-overlapping-blocks trick: with
  h = 2^floor(log2 L) <= L, the L-prefixes are equal iff
  rank_h[i] == rank_h[j] AND rank_h[i+L-h] == rank_h[j+L-h].
  (Retained as ``_l_prefix_keys`` — the collision fallback and test
  oracle.)
* ``shared_run_pairs`` concatenates one partition's documents (with a
  separator byte), keeps only positions whose L-window lies inside a
  single document, groups positions by an O(n) double rolling-hash
  window key (dedup.spans machinery — ~15x faster than the
  prefix-doubling rank rounds at L=256), and emits the distinct
  document pairs of each group (star-capped for hot boilerplate runs).
  Every emitted pair is then BYTE-VERIFIED at its representative
  window positions; a verification miss (a ~2^-128 double-hash
  collision) falls back to the exact two-document prefix-doubling
  check — so no probabilistic step survives into the output.

Partitioning assumption (documented per the build contract): a pair
sharing a >= min_substring run must be co-partitioned.  The pipeline
guarantees it with winnowing anchors (dedup.winnow): any shared run of
length >= w + g - 1 (149 < 256 at the defaults) yields a common
content-defined anchor, and candidates meet in that anchor's bucket.
Lengths here are BYTES of the utf-8 encoding (the winnow pass hashes
the same bytes); the containment mode in dedup.pipeline measures
Python chars — identical for ASCII corpora, documented divergence
otherwise.
"""

from __future__ import annotations

import numpy as np

_SEP = 0xFF  # separator byte between concatenated docs


def prefix_ranks(arr: np.ndarray, h_target: int) -> np.ndarray:
    """Prefix-doubling ranks: int64 array where equal values mean the
    first ``h_target`` bytes (a power of two) are equal.  Positions past
    the end compare as rank -1 (shorter suffixes sort first, the usual
    suffix-array convention)."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    r = arr.astype(np.int64)
    h = 1
    while h < h_target:
        nxt = np.full(n, -1, dtype=np.int64)
        nxt[: n - h] = r[h:]
        order = np.lexsort((nxt, r))
        rs, ns = r[order], nxt[order]
        bump = np.empty(n, dtype=np.int64)
        bump[0] = 0
        bump[1:] = ((rs[1:] != rs[:-1]) | (ns[1:] != ns[:-1]))
        ranks = np.cumsum(bump)
        r = np.empty(n, dtype=np.int64)
        r[order] = ranks
        h *= 2
    return r


def _l_prefix_keys(arr: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """(key1, key2) composite key arrays over positions 0..n-L: equal
    composite keys iff the L-byte windows are byte-identical."""
    n = len(arr)
    m = n - L + 1
    if m <= 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    h = 1 << (L.bit_length() - 1)  # largest power of two <= L
    if h == L:  # exact power of two: one rank suffices
        r = prefix_ranks(arr, L)
        return r[:m], np.zeros(m, dtype=np.int64)
    r = prefix_ranks(arr, h)
    return r[:m], r[L - h : L - h + m]


def _window_keys(buf: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """(k1, k2) double 64-bit polynomial rolling hashes of every L-byte
    window — O(n) (two cumsum chains, dedup.spans machinery) instead of
    prefix-doubling's O(n log L) lexsort rounds.  Equal windows ALWAYS
    hash equal; unequal windows collide with probability ~2^-128, and
    every collision is caught downstream by the per-pair byte verify +
    exact fallback, so the emitted pair set stays byte-exact."""
    from .spans import _B1, _B1_INV, _B2, _B2_INV, _window_hashes
    m = len(buf) - L + 1
    if m <= 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z
    return (_window_hashes(buf, L, _B1, _B1_INV),
            _window_hashes(buf, L, _B2, _B2_INV))


def shared_run_pairs(node_ids: np.ndarray, texts: list[bytes], L: int,
                     pair_cap: int = 1 << 16,
                     star_anchors: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All distinct (u, v) document-id pairs, u < v, whose texts share a
    verbatim byte run of length >= L — byte-exact within this partition.

    Grouping key = double rolling hash of the L-window (O(n)); every
    emitted pair is then BYTE-VERIFIED at its representative window
    positions, and a verification miss (a 2^-128 double-hash collision
    merging two true run classes) falls back to the exact two-document
    prefix-doubling check — so no probabilistic step survives into the
    output, at rolling-hash speed on the happy path.

    Returns sorted-unique (u, v) uint64 arrays.  Groups whose pair count
    would exceed ``pair_cap`` emit a multi-anchor star instead (the
    edges are exact here, so connectivity — not the full clique — is
    what union-find needs)."""
    node_ids = np.asarray(node_ids, dtype=np.uint64)
    total = sum(len(t) for t in texts) + len(texts)
    buf = np.empty(total, dtype=np.uint8)
    doc_of = np.empty(total, dtype=np.int64)
    ends = np.empty(len(texts), dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):
        b = np.frombuffer(t, dtype=np.uint8)
        buf[pos : pos + len(b)] = b
        doc_of[pos : pos + len(b) + 1] = i
        pos += len(b)
        ends[i] = pos
        buf[pos] = _SEP
        pos += 1
    k1, k2 = _window_keys(buf, L)
    m = len(k1)
    if m == 0:
        e = np.zeros(0, dtype=np.uint64)
        return e, e
    # a position is valid when its whole L-window lies inside its doc
    p = np.arange(m, dtype=np.int64)
    d = doc_of[:m]
    valid = p + L <= ends[d]
    d, p = d[valid], p[valid]
    if len(d) == 0:
        e = np.zeros(0, dtype=np.uint64)
        return e, e
    # combined 128->64-bit class key: a cross-class merge here only
    # costs a byte-verify miss + exact fallback downstream, so one sort
    # key suffices (2-key lexsort instead of 4)
    with np.errstate(over="ignore"):
        h = k1[valid] ^ (k2[valid] * np.uint64(0x9E3779B97F4A7C15))
    # one vote per doc per run class, keeping a representative position
    order = np.lexsort((d, h))
    h, d, p = h[order], d[order], p[order]
    first = np.concatenate([[True], (h[1:] != h[:-1]) | (d[1:] != d[:-1])])
    h, d, p = h[first], d[first], p[first]
    # segment boundaries of equal-class runs
    brk = np.concatenate(
        [[0], np.flatnonzero(h[1:] != h[:-1]) + 1, [len(h)]])
    seg_len = np.diff(brk)
    multi = np.flatnonzero(seg_len >= 2)  # singleton classes dominate the
    us, vs, pus, pvs = [], [], [], []     # class count; never loop them
    two = multi[seg_len[multi] == 2]      # size-2 classes in one shot
    if len(two):
        s2 = brk[two]
        a_nd, b_nd = node_ids[d[s2]], node_ids[d[s2 + 1]]
        a_p, b_p = p[s2], p[s2 + 1]
        swap = a_nd > b_nd
        us.append(np.where(swap, b_nd, a_nd))
        vs.append(np.where(swap, a_nd, b_nd))
        pus.append(np.where(swap, b_p, a_p))
        pvs.append(np.where(swap, a_p, b_p))
    for si in multi[seg_len[multi] > 2]:
        s, e = int(brk[si]), int(brk[si + 1])
        o = np.argsort(node_ids[d[s:e]], kind="stable")
        nd = node_ids[d[s:e]][o]
        ps = p[s:e][o]
        n = len(nd)
        if n * (n - 1) // 2 <= pair_cap:
            iu, iv = np.triu_indices(n, k=1)
        else:  # multi-anchor star over the order-first anchors
            a = min(star_anchors, n - 1)
            iu = np.concatenate([np.full(n - 1 - i, i, dtype=np.int64)
                                 for i in range(a)])
            iv = np.concatenate([np.arange(i + 1, n, dtype=np.int64)
                                 for i in range(a)])
        us.append(nd[iu]); vs.append(nd[iv])
        pus.append(ps[iu]); pvs.append(ps[iv])
    if not us:
        e = np.zeros(0, dtype=np.uint64)
        return e, e
    u = np.concatenate(us); v = np.concatenate(vs)
    pu = np.concatenate(pus); pv = np.concatenate(pvs)
    # dedupe pairs, keeping one representative (pu, pv) per (u, v)
    o = np.lexsort((pv, pu, v, u))
    u, v, pu, pv = u[o], v[o], pu[o], pv[o]
    first = np.concatenate([[True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
    u, v, pu, pv = u[first], v[first], pu[first], pv[first]
    # byte-verify every emitted pair at its representative windows
    win = np.arange(L, dtype=np.int64)
    ok = (buf[pu[:, None] + win] == buf[pv[:, None] + win]).all(axis=1)
    if not ok.all():  # ~2^-128 per window pair: exact two-doc fallback
        di = np.argsort(node_ids, kind="stable")
        nd_sorted = node_ids[di]
        for j in np.flatnonzero(~ok):
            a = texts[int(di[np.searchsorted(nd_sorted, u[j])])]
            b = texts[int(di[np.searchsorted(nd_sorted, v[j])])]
            ok[j] = _pair_shares_run(a, b, L)
    return u[ok], v[ok]


def _pair_shares_run(a: bytes, b: bytes, L: int) -> bool:
    """Exact two-document shared-run check via prefix-doubling ranks
    (the collision fallback; also the tests' reference oracle)."""
    buf = np.frombuffer(a + bytes([_SEP]) + b, dtype=np.uint8)
    k1, k2 = _l_prefix_keys(buf, L)
    m = len(k1)
    if m == 0:
        return False
    p = np.arange(m, dtype=np.int64)
    in_a = p + L <= len(a)
    in_b = p >= len(a) + 1
    in_b &= p + L <= len(buf)
    o = np.lexsort((k2, k1))
    k1s, k2s = k1[o], k2[o]
    side_a = in_a[o]
    side_b = in_b[o]
    brk = np.concatenate(
        [[0], np.flatnonzero((k1s[1:] != k1s[:-1]) |
                             (k2s[1:] != k2s[:-1])) + 1, [m]])
    for s, e in zip(brk[:-1], brk[1:]):
        if side_a[s:e].any() and side_b[s:e].any():
            return True
    return False


def shared_run(a: bytes, b: bytes, L: int) -> bool:
    """Reference two-document check (tests / spot verification)."""
    u, v = shared_run_pairs(np.array([1, 2], dtype=np.uint64), [a, b], L)
    return len(u) > 0
