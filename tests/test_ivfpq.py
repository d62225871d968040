"""IVF-PQ compressed ANN (ann.train_ivfpq / pq_encode / knn_ivfpq).

Three contracts:
  * exact-reconstruction config (sample covers the corpus, ks >= sample
    rows, probe-all): PQ codebooks reproduce every residual exactly, so
    the ADC top-k id sets must equal knn_brute's;
  * clustered fixture: probing recalls planted group members;
  * index shape/compression and cross-partitioning determinism — the
    codes table is m bytes of payload per vector regardless of how the
    corpus is partitioned.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dedup import ann
from dedup.synth import write_embedding_clusters

FIX = "/tmp/dedup_ivfpq_test_fix"


def _random_ds(n=80, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1).astype(np.float32)), dim).cast(
                pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t)


def test_ivfpq_exact_reconstruction_matches_brute():
    # sample_size >= n and ks >= n make every residual its own code, so
    # ADC distances are exact and probe-all IVF-PQ == brute force.
    ds = _random_ds()
    qids = [0, 1, 2]
    brute = ann.knn_brute(ds, query_ids=qids, k=5).to_pandas()
    approx = ann.knn_ivfpq(ds, query_ids=qids, k=5, n_centroids=4,
                           n_probe=4, m=4, ks=128, sample_size=128).to_pandas()
    for q in qids:
        bset = set(brute[brute["q"] == q]["vec_id"])
        aset = set(approx[approx["q"] == q]["vec_id"])
        assert bset == aset, f"query {q}: {bset ^ aset}"


def test_ivfpq_recalls_planted_groups():
    paths = write_embedding_clusters(FIX, n_groups=10, group_size=4,
                                     n_singletons=200, dim=32, seed=11)
    ds = ray.data.read_parquet(paths["embeddings"])
    truth = pq.read_table(paths["truth"]).to_pandas()
    # query one member per planted group; its 3 siblings must be the
    # top-3 under probe-all (clustered residuals are tiny, so PQ ranking
    # preserves the in-group/out-group gap).  truth cluster_id = the
    # group's min member vec_id (singletons -1).
    groups = sorted(c for c in truth["cluster_id"].unique() if c >= 0)
    qids = [int(c) for c in groups]  # min member IS the id
    out = ann.knn_ivfpq(ds, query_ids=qids, k=3, n_centroids=8,
                        n_probe=8, m=8, ks=16, sample_size=4096).to_pandas()
    for c, q in zip(groups, qids):
        siblings = set(truth[truth["cluster_id"] == c]["vec_id"]) - {q}
        got = set(out[out["q"] == q]["vec_id"])
        assert got == siblings, f"group {c}: {got} != {siblings}"


def test_pq_encode_shape_and_compression():
    ds = _random_ds(n=60, dim=16)
    cn, books = ann.train_ivfpq(ds, n_centroids=4, m=4, ks=8,
                                sample_size=64)
    assert books.shape == (4, 8, 4)
    codes = ann.pq_encode(ds, cn, books).to_pandas().sort_values("vec_id")
    assert len(codes) == 60
    assert all(len(c) == 4 for c in codes["code"])  # m bytes per vector
    arr = np.stack(codes["code"].to_numpy())
    assert arr.dtype == np.uint8 and arr.max() < 8
    assert set(codes["cell"]) <= set(range(4))
    # compression: 4 code bytes vs 16 * 4 raw float32 bytes = 16x
    assert 16 * 4 / 4 == 16.0


def test_ivfpq_deterministic_across_partitioning():
    paths = write_embedding_clusters(FIX, n_groups=10, group_size=4,
                                     n_singletons=200, dim=32, seed=11)
    outs = []
    for nb in (2, 8):
        ds = ray.data.read_parquet(paths["embeddings"],
                                   override_num_blocks=nb)
        outs.append(ann.knn_ivfpq(ds, query_ids=[0, 5, 9], k=7,
                                  n_centroids=8, n_probe=3, m=8,
                                  ks=16).to_pandas())
    assert outs[0].equals(outs[1])


def test_ivfpq_rerank_scores_are_exact():
    # the refine stage rescores shortlisted ids with knn_brute's exact
    # float64 arithmetic: every hit must carry the identical e6 score.
    ds = _random_ds(n=120, dim=16, seed=9)
    qids = [1, 7]
    brute = ann.knn_brute(ds, query_ids=qids, k=5).to_pandas()
    rr = ann.knn_ivfpq(ds, query_ids=qids, k=5, n_centroids=4, n_probe=4,
                       m=4, ks=32, rerank=60).to_pandas()
    bm = {(q, v): s for q, v, s in
          zip(brute["q"], brute["vec_id"], brute["score_e6"])}
    rm = {(q, v): s for q, v, s in
          zip(rr["q"], rr["vec_id"], rr["score_e6"])}
    hits = set(bm) & set(rm)
    assert hits, "rerank shortlist recalled nothing"
    assert all(bm[h] == rm[h] for h in hits)


def test_ivfpq_m_must_divide_dim():
    ds = _random_ds(n=20, dim=16)
    with pytest.raises(ValueError, match="must divide"):
        ann.train_ivfpq(ds, m=5)


def test_ivfpq_excludes_self():
    ds = _random_ds()
    out = ann.knn_ivfpq(ds, query_ids=[4], k=10, n_centroids=4,
                        n_probe=4, m=4, ks=16).to_pandas()
    assert 4 not in set(out["vec_id"])
    assert len(out) == 10
