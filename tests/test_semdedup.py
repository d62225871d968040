"""SemDeDup (k-means cells + within-cell cosine dedup, ann.semdedup).

Planted fixture: tight clusters (within-group cosine ~0.999) + isotropic
singletons, so with enough centroids every planted group lands in one
cell and member recall must be 1.0; singletons must never cluster at
threshold 0.9.  Also: determinism across partitionings, the
delete-subset property vs the exact transitive closure, and the dense-CC
kernel vs a reference implementation.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from dedup import ann
from dedup.ann import _dense_cc
from dedup.synth import write_embedding_clusters

FIX = "/tmp/dedup_semdedup_test_fix"


@pytest.fixture(scope="module")
def fixture_paths():
    return write_embedding_clusters(FIX, n_groups=25, group_size=4,
                                    n_singletons=300, dim=32, seed=7)


def _run(paths, **kw):
    ds = ray.data.read_parquet(paths["embeddings"])
    base = dict(threshold=0.9, n_centroids=32, sample_size=400)
    base.update(kw)
    return ann.semdedup(ds, **base).to_pandas()


def test_semdedup_planted_recall_and_no_false_dups(fixture_paths):
    out = _run(fixture_paths)
    truth = pq.read_table(fixture_paths["truth"]).to_pandas() \
        .rename(columns={"cluster_id": "tc"})
    df = out.merge(truth, on="vec_id")
    members = df[df["tc"] >= 0]
    assert len(members) == 100
    assert (members["cluster_id"] >= 0).all()  # recall 1.0
    # each planted group resolves to exactly its min member id
    grp = members.groupby("tc")["cluster_id"].nunique()
    assert (grp == 1).all()
    for tc, g in members.groupby("tc"):
        assert (g["cluster_id"] == tc).all()
    # singletons never cluster at threshold 0.9
    single = df[df["tc"] < 0]
    assert (single["state"] == "unique").all()
    assert (single["cluster_id"] == -1).all()


def test_semdedup_deterministic_across_partitionings(fixture_paths):
    a = _run(fixture_paths, num_partitions=32)
    b = _run(fixture_paths, num_partitions=5)
    assert a.equals(b)


def test_semdedup_deletes_subset_of_exact_closure(fixture_paths):
    """Every semdedup delete must be a dup-cluster member of the exact
    brute-force closure at the same threshold (within-cell edges are a
    subset of all edges) — delete precision 1.0 by construction."""
    out = _run(fixture_paths)
    ds = ray.data.read_parquet(fixture_paths["embeddings"])
    brute = ann.embedding_dedup(ds, threshold=0.9).to_pandas() \
        .rename(columns={"cluster_id": "bc", "state": "bstate"})
    m = out.merge(brute[["vec_id", "bc", "bstate"]], on="vec_id")
    dels = m[m["state"] == "delete"]
    assert len(dels) > 0
    assert (dels["bc"] >= 0).all()
    # one keeper per semdedup cluster, and it is the min member id
    clustered = out[out["cluster_id"] >= 0]
    keeps = clustered.groupby("cluster_id").apply(
        lambda g: ((g["state"] == "keep").sum(), g["vec_id"].min()),
        include_groups=False)
    for cid, (nkeep, minid) in keeps.items():
        assert nkeep == 1
        assert cid == minid


def test_semdedup_states_partition_output(fixture_paths):
    out = _run(fixture_paths)
    assert sorted(out.columns) == ["cell", "cluster_id", "cluster_size",
                                   "state", "vec_id"]
    assert len(out) == 400
    assert set(out["state"]) == {"keep", "delete", "unique"}
    # cluster_size consistent with membership counts
    clustered = out[out["cluster_id"] >= 0]
    sizes = clustered.groupby("cluster_id").size()
    for cid, n in sizes.items():
        assert (clustered[clustered["cluster_id"] == cid]["cluster_size"]
                == n).all()


def test_dense_cc_matches_reference():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 40))
        adj = rng.random((n, n)) < 0.08
        adj = adj | adj.T
        np.fill_diagonal(adj, True)
        got = _dense_cc(adj)
        # reference: BFS per node
        lab = np.full(n, -1)
        for s in range(n):
            if lab[s] >= 0:
                continue
            stack, comp = [s], [s]
            lab[s] = s
            while stack:
                u = stack.pop()
                for v in np.flatnonzero(adj[u]):
                    if lab[v] < 0:
                        lab[v] = s
                        stack.append(v)
                        comp.append(v)
        assert np.array_equal(got, lab), trial


def test_dense_cc_empty_and_singleton():
    assert _dense_cc(np.zeros((0, 0), dtype=bool)).shape == (0,)
    assert np.array_equal(_dense_cc(np.eye(1, dtype=bool)), [0])


def test_screened_sim_kernels_bit_exact_vs_float64():
    """The float32-screen / float64-confirm kernels must emit EXACTLY
    the pure-float64 pair set and scores, including pairs engineered to
    sit within one float32 ulp of the threshold."""
    from dedup.ann import _sim_cross, _sim_edges
    rng = np.random.default_rng(3)
    thr = 0.9
    X = rng.standard_normal((300, 24))
    # plant near-threshold pairs: rows j = rotate(row i) mixed so that
    # cosine lands in a tight band around thr
    for i in range(0, 40, 2):
        a = X[i] / np.linalg.norm(X[i])
        b = rng.standard_normal(24)
        b -= (b @ a) * a
        b /= np.linalg.norm(b)
        c = thr + rng.uniform(-1e-6, 1e-6)
        X[i + 1] = c * a + np.sqrt(1 - c * c) * b
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    iu, ju, ex = _sim_edges(X, thr)
    S = X @ X.T
    ri, rj = np.nonzero(np.triu(S >= thr, k=1))
    assert np.array_equal(iu, ri) and np.array_equal(ju, rj)
    # einsum and BLAS GEMM may differ in the last ulp (different
    # summation order — same slack the SQL oracle already tolerates);
    # the e6-scaled integer contract must be identical
    assert np.abs(ex - S[ri, rj]).max() < 1e-12
    assert np.array_equal(np.rint(ex * 1e6), np.rint(S[ri, rj] * 1e6))
    B = X[:50]
    bi, aj, exc = _sim_cross(B, X, thr)
    C = B @ X.T
    ci, cj = np.nonzero(C >= thr)
    assert np.array_equal(bi, ci) and np.array_equal(aj, cj)
    assert np.abs(exc - C[ci, cj]).max() < 1e-12
    assert np.array_equal(np.rint(exc * 1e6), np.rint(C[ci, cj] * 1e6))


def test_semdedup_diverse_keeper(fixture_paths):
    """keeper='diverse' (the paper's rule): one keep per cluster, keeper
    = member with the LOWEST cosine to its cell centroid; cluster ids
    and membership identical to keeper='first'; deterministic."""
    import pytest
    a = _run(fixture_paths)                      # first (min id)
    d = _run(fixture_paths, keeper="diverse")
    d2 = _run(fixture_paths, keeper="diverse", num_partitions=5)
    assert d.equals(d2)
    # membership identical: only the keep/delete roles may differ
    assert a["cluster_id"].tolist() == d["cluster_id"].tolist()
    assert a["cluster_size"].tolist() == d["cluster_size"].tolist()
    assert (a["state"] == "unique").equals(d["state"] == "unique")
    clustered = d[d["cluster_id"] >= 0]
    assert (clustered.groupby("cluster_id")["state"]
            .apply(lambda s: (s == "keep").sum()) == 1).all()
    # at least one cluster picks a different keeper than min-id (noise
    # makes centroid distances distinct within planted groups)
    ka = set(a[a["state"] == "keep"]["vec_id"])
    kd = set(d[d["state"] == "keep"]["vec_id"])
    assert ka != kd
    with pytest.raises(ValueError):
        _run(fixture_paths, keeper="bogus")


def test_screened_sim_kernels_property_random():
    """Property check over random thresholds/dims/sizes: screened pair
    sets always equal the pure-float64 reference sets."""
    from dedup.ann import _sim_cross, _sim_edges
    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(0, 60))
        d = int(rng.integers(1, 96))
        thr = float(rng.uniform(-0.5, 0.999))
        X = rng.standard_normal((n, d))
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300) \
            if n else X
        iu, ju, _ = _sim_edges(X, thr)
        S = X @ X.T
        ri, rj = np.nonzero(np.triu(S >= thr, k=1))
        assert np.array_equal(iu, ri) and np.array_equal(ju, rj), \
            (trial, n, d, thr)
        m = int(rng.integers(0, n + 1))
        bi, aj, _ = _sim_cross(X[:m], X, thr)
        C = X[:m] @ X.T
        ci, cj = np.nonzero(C >= thr)
        assert np.array_equal(bi, ci) and np.array_equal(aj, cj), \
            (trial, n, d, thr)
