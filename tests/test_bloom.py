"""Sharded bloom filter (dedup/bloom.py): no false negatives, bounded
false-positive rate, and byte-identical incremental-dedup assignments
with the bloom semi-join on."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup.bloom import (ShardedBloom, bloom_filter_dataset, bloom_params,
                         build_bloom)


def _hashes(n, seed):
    return np.random.default_rng(seed).integers(
        0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_bloom_no_false_negatives_and_fpp_bound():
    members = _hashes(20_000, 1)
    others = _hashes(20_000, 2)
    others = others[~np.isin(others, members)]
    ds = ray.data.from_arrow(pa.table({"h": pa.array(members, pa.uint64())}))
    bloom = build_bloom(ds, "h", fpp=0.01, num_partitions=4)
    assert bloom.contains(members).all()          # never a false negative
    fp = bloom.contains(others).mean()
    assert fp < 0.03                              # ~fpp with slack


def test_bloom_params_sane():
    m, k = bloom_params(1_000_000, 0.01)
    assert 9.5e6 < m < 10.1e6 and 6 <= k <= 8     # textbook ~9.6 bits/key
    assert bloom_params(0, 0.01)[0] >= 64


def test_bloom_filter_dataset_both_directions():
    members = _hashes(5_000, 3)
    bloom = build_bloom(
        ray.data.from_arrow(pa.table({"h": pa.array(members, pa.uint64())})),
        "h", fpp=0.01, num_partitions=2)
    probe = np.concatenate([members[:100], _hashes(100, 4)])
    ds = ray.data.from_arrow(pa.table({"h": pa.array(probe, pa.uint64()),
                                       "i": list(range(len(probe)))}))
    hits = bloom_filter_dataset(ds, "h", bloom).to_pandas()
    misses = bloom_filter_dataset(ds, "h", bloom, keep_hits=False).to_pandas()
    assert set(hits["i"]) | set(misses["i"]) == set(range(len(probe)))
    assert set(range(100)) <= set(hits["i"])      # all members hit
    assert len(misses) >= 80                      # most non-members miss


def test_incremental_bloom_matches_unfiltered():
    from dedup.config import DOCUMENTS_CONFIG
    from dedup.incremental import incremental_exact_dedup
    cfg = DOCUMENTS_CONFIG.with_(near=False, simhash=False, substring=False)
    texts = [f"document number {i} with enough characters to pass the "
             f"ignore threshold easily {'x' * (i % 7)}" for i in range(300)]
    ref = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": texts[:100]}))
    # new: 50 overlap ref, 30 internal dup pairs, rest unique
    new_texts = texts[50:150] + texts[150:180] + texts[150:180]
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(1000, 1000 + len(new_texts)), pa.int64()),
        "text": new_texts}))
    plain = incremental_exact_dedup(new, ref, cfg) \
        .sort("doc_id").to_pandas()
    bloomed = incremental_exact_dedup(new, ref, cfg, bloom_fpp=0.01) \
        .sort("doc_id").to_pandas()
    assert plain.equals(bloomed)
    assert (plain["state"] == "ref_dup").sum() == 50
