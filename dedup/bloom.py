"""Sharded Bloom filter over uint64 key columns.

The scale path for semi-joins: instead of shuffling a huge reference
corpus into a join just to discover that most rows match nothing, build
a compact bloom over the SMALL side's keys once, broadcast it, and
arrow-filter the large side down to probable matches before the shuffle
(false positives only cost a little extra shuffle volume; false
negatives are impossible, so assignments are unchanged).  This is the
distributed replacement the round-1 review asked for wherever a
driver-side id set or full-corpus join stood in for a membership test.

Layout: S independent blooms sharded by the key's top bits.  Each shard
is built by whichever shuffle partition its keys land in (one 8-byte-key
shuffle, no bit-array OR-merging across tasks), then the S bit arrays
are assembled and ``ray.put`` once.  Probe tasks read the broadcast
object zero-copy.  Memory: the assembled filter is ~1.2 bytes/key at
1% fpp — 1e9 keys ≈ 1.4 GB, broadcast once per node via the object
store; shard count only affects build parallelism, not total size.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dist import groupapply, mix64

#: double-hashing probe: position_j = (h1 + j*h2) % m_bits with h2 odd —
#: the standard Kirsch–Mitzenmacher construction over one 64-bit key
_MIX = np.uint64(0x9E3779B97F4A7C15)


def bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for the target capacity / false-positive rate."""
    capacity = max(int(capacity), 1)
    m = int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / capacity * math.log(2)))
    return max(m, 64), k


def _probes(h: np.ndarray, m_bits: int, k: int):
    """Yield k vectorized probe-position arrays for keys ``h``."""
    h = h.astype(np.uint64)
    h1 = (h * _MIX) >> np.uint64(1)
    h2 = ((h >> np.uint64(32)) | (h << np.uint64(32))) | np.uint64(1)
    m = np.uint64(m_bits)
    for j in range(k):
        yield ((h1 + np.uint64(j) * h2) % m).astype(np.int64)


def _set_bits(bits: np.ndarray, h: np.ndarray, m_bits: int, k: int) -> None:
    for pos in _probes(h, m_bits, k):
        np.bitwise_or.at(bits, pos >> 3,
                         (np.uint8(1) << (pos & 7).astype(np.uint8)))


def _test_bits(bits: np.ndarray, h: np.ndarray, m_bits: int,
               k: int) -> np.ndarray:
    hit = np.ones(len(h), dtype=bool)
    for pos in _probes(h, m_bits, k):
        hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
    return hit


class ShardedBloom:
    """S shard blooms; shard(key) = mix64(key) >> (64 - shard_bits) —
    the avalanche mix keeps shard load uniform even when raw keys have
    constant high bits (sequential ids, small hash ranges)."""

    def __init__(self, shards: list[np.ndarray], m_bits: int, k: int,
                 shard_bits: int) -> None:
        self.shards = shards
        self.m_bits = m_bits
        self.k = k
        self.shard_bits = shard_bits

    def shard_of(self, h: np.ndarray) -> np.ndarray:
        if self.shard_bits == 0:
            return np.zeros(len(h), dtype=np.int64)
        return (mix64(h.astype(np.uint64))
                >> np.uint64(64 - self.shard_bits)).astype(np.int64)

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership test; never a false negative."""
        h = h.astype(np.uint64)
        out = np.zeros(len(h), dtype=bool)
        sh = self.shard_of(h)
        for s in np.unique(sh):
            m = sh == s
            out[m] = _test_bits(self.shards[s], h[m], self.m_bits, self.k)
        return out

    @property
    def nbytes(self) -> int:
        return sum(b.nbytes for b in self.shards)


def build_bloom(ds: ray.data.Dataset, col: str, capacity: int | None = None,
                fpp: float = 0.01, shard_bits: int = 4,
                num_partitions: int = 32) -> ShardedBloom:
    """Distributed bloom build over a uint64 column: one 8-byte-key
    shuffle routes each shard's keys to one partition, which sets that
    shard's bits locally; the driver only assembles the S finished bit
    arrays (total = filter size — the same memory any broadcast of the
    filter costs)."""
    if capacity is None:
        capacity = ds.count()
    n_shards = 1 << shard_bits
    m_bits, k = bloom_params(max(capacity, 1) // n_shards + 1, fpp)

    def _keyed(t: pa.Table) -> pa.Table:
        h = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if shard_bits == 0:
            sh = np.zeros(len(h), dtype=np.uint64)
        else:
            sh = mix64(h) >> np.uint64(64 - shard_bits)
        return pa.table({"h": pa.array(h, pa.uint64()),
                         "shard": pa.array(sh, pa.uint64())})

    def _build(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows_s, rows_b = [], []
        for s in np.unique(sh):
            bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
            _set_bits(bits, h[sh == s], m_bits, k)
            rows_s.append(int(s))
            rows_b.append(bits.tobytes())
        return pa.table({"shard": pa.array(rows_s, pa.int64()),
                         "bits": pa.array(rows_b, pa.binary())})

    parts = groupapply(ds.map_batches(_keyed, batch_format="pyarrow"),
                       "shard", _build,
                       min(num_partitions, n_shards)).take_all()
    shards = [np.zeros((m_bits + 7) // 8, dtype=np.uint8)
              for _ in range(n_shards)]
    for row in parts:
        shards[int(row["shard"])] = np.frombuffer(row["bits"],
                                                  dtype=np.uint8).copy()
    return ShardedBloom(shards, m_bits, k, shard_bits)


def bloom_filter_dataset(ds: ray.data.Dataset, col: str,
                         bloom: ShardedBloom,
                         keep_hits: bool = True) -> ray.data.Dataset:
    """Arrow-filter ``ds`` to rows whose ``col`` key (probably) is /
    (certainly) is not in the bloom.  Broadcast once via ray.put; probe
    tasks fetch the shared copy from the local object store."""
    ref = ray.put(bloom)

    def _f(t: pa.Table) -> pa.Table:
        b: ShardedBloom = ray.get(ref)
        h = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hit = b.contains(h)
        return t.filter(pa.array(hit if keep_hits else ~hit))

    return ds.map_batches(_f, batch_format="pyarrow")
