"""CLI run subcommand (ray job submit entrypoint shape)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

from dedup.synth import write_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run(tmp_path):
    paths = write_pages(str(tmp_path / "corpus"), n_docs=150, seed=33)
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "run", "--input", paths["pages"],
         "--output", out_dir, "--cpus", "4",
         "--checkpoint-dir", str(tmp_path / "ckpt")],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert report["states"].get("keep", 0) > 0
    assert os.path.exists(os.path.join(out_dir, "run.json"))
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    t = pq.read_table(os.path.join(out_dir, "assignments"))
    assert t.num_rows == 150
    assert set(t.column_names) == {"url", "state", "cluster_id", "cluster_size"}


def test_cli_run_cross_snapshot(tmp_path):
    """--ref-input mode: the input is deduped against the reference
    corpus; matched docs come back as state=ref_dup."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from dedup.synth import generate_pages

    pages, _ = generate_pages(300, seed=7)
    m = pa.array([hashlib.md5(u.encode()).hexdigest()[:2] < "80"
                  for u in pages["url"].to_pylist()])
    os.makedirs(tmp_path / "ref"); os.makedirs(tmp_path / "new")
    pq.write_table(pages.filter(m), str(tmp_path / "ref" / "p.parquet"))
    n_new = pages.num_rows - pages.filter(m).num_rows
    pq.write_table(pages.filter(pa.compute.invert(m)),
                   str(tmp_path / "new" / "p.parquet"))
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "run",
         "--input", str(tmp_path / "new"),
         "--ref-input", str(tmp_path / "ref"),
         "--output", out_dir, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")][-1])
    assert report["ref_input"] == str(tmp_path / "ref")
    assert report["states"].get("ref_dup", 0) > 0
    t = pq.read_table(os.path.join(out_dir, "assignments"))
    assert t.num_rows == n_new
    assert set(t.column_names) == {"url", "state", "cluster_id",
                                   "cluster_size"}


def test_cli_index_and_ref_index_run(tmp_path):
    """index --kind exact -> run --ref-index: matched docs come back
    ref_dup with NO reference-side shuffle; the index is
    self-describing and a mismatched probe config is rejected."""
    import hashlib

    import pyarrow as pa

    from dedup.synth import generate_pages

    pages, _ = generate_pages(300, seed=9)
    m = pa.array([hashlib.md5(u.encode()).hexdigest()[:2] < "80"
                  for u in pages["url"].to_pylist()])
    os.makedirs(tmp_path / "ref"); os.makedirs(tmp_path / "new")
    pq.write_table(pages.filter(m), str(tmp_path / "ref" / "p.parquet"))
    pq.write_table(pages.filter(pa.compute.invert(m)),
                   str(tmp_path / "new" / "p.parquet"))
    idx_dir = str(tmp_path / "idx")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "index",
         "--input", str(tmp_path / "ref"), "--output", idx_dir,
         "--kind", "exact", "--buckets", "32", "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(idx_dir, "_index.json"))
    rep = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["kind"] == "exact" and rep["buckets"] == 32

    out_dir = str(tmp_path / "out")
    r2 = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "run",
         "--input", str(tmp_path / "new"), "--ref-index", idx_dir,
         "--output", out_dir, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep2 = json.loads([ln for ln in r2.stdout.splitlines()
                       if ln.startswith("{")][-1])
    assert rep2["states"].get("ref_dup", 0) > 0
    assert rep2["ref_index"] == idx_dir


def test_cli_filter_band_index(tmp_path):
    """index --kind bands -> filter: flags parquet written with counts
    in the report."""
    import pyarrow as pa

    from dedup.synth import generate_pages

    pages, _ = generate_pages(200, seed=11)
    os.makedirs(tmp_path / "ref"); os.makedirs(tmp_path / "new")
    pq.write_table(pages, str(tmp_path / "ref" / "p.parquet"))
    # new snapshot: same corpus (every ok doc should flag) — blunt but
    # deterministic
    pq.write_table(pages, str(tmp_path / "new" / "p.parquet"))
    idx_dir = str(tmp_path / "bidx")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "index",
         "--input", str(tmp_path / "ref"), "--output", idx_dir,
         "--kind", "bands", "--buckets", "16", "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    out_dir = str(tmp_path / "fout")
    r2 = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "filter",
         "--input", str(tmp_path / "new"), "--band-index", idx_dir,
         "--output", out_dir, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep = json.loads([ln for ln in r2.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["n_docs"] == 200
    assert rep["n_flagged"] > 0
    t = pq.read_table(os.path.join(out_dir, "flags"))
    assert set(t.column_names) == {"url", "ref_near", "n_band_hits"}


def test_index_meta_mismatch_rejected(tmp_path):
    """A probe whose key-affecting knobs differ from the index writer's
    must be rejected (it would silently miss every duplicate)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from dedup.config import DedupConfig
    from dedup.incremental import (incremental_exact_dedup_bucketed,
                                   write_key_index)

    ref = ray.data.from_arrow(pa.table({
        "url": ["https://x.example/a"], "text": ["z" * 200]}))
    new = ray.data.from_arrow(pa.table({
        "url": ["https://x.example/b"], "text": ["z" * 200]}))
    cfg = DedupConfig(near=False, simhash=False, substring=False)
    idx = write_key_index(ref, cfg, str(tmp_path / "i"), n_buckets=8)
    bad = cfg.with_(content_hash="md5")
    with pytest.raises(ValueError, match="mismatch"):
        incremental_exact_dedup_bucketed(new, idx, bad, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        incremental_exact_dedup_bucketed(new, idx, cfg, n_buckets=16)


def test_cli_compact_merges_dumps(tmp_path):
    """index (two dumps) -> compact -> run --ref-index <merged>: the
    compacted dir is probe-equivalent to the dump list and carries its
    own _index.json."""
    import pyarrow as pa

    from dedup.synth import generate_pages

    pages, _ = generate_pages(200, seed=21)
    os.makedirs(tmp_path / "ref")
    pq.write_table(pages, str(tmp_path / "ref" / "p.parquet"))
    dumps = []
    for i in (1, 2):
        d = str(tmp_path / f"idx{i}")
        r = subprocess.run(
            [sys.executable, "-m", "dedup.cli", "index",
             "--input", str(tmp_path / "ref"), "--output", d,
             "--kind", "exact", "--buckets", "16", "--cpus", "4"],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "RAY_ADDRESS": "local"})
        assert r.returncode == 0, r.stderr[-2000:]
        dumps.append(d)
    merged = str(tmp_path / "merged")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "compact",
         "--indexes", ",".join(dumps), "--output", merged, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    # exact kind: concatenation, twice the rows of one dump, no dedupe
    assert rep["rows_in"] == rep["rows_out"] > 0
    assert os.path.exists(os.path.join(merged, "_index.json"))


def test_cli_remark_swaps_keeper_and_rederives(tmp_path):
    """Post-hoc keeper re-mark (the reference's manual keep<->delete
    toggle): promote a delete member to keeper via the CLI, check the
    whole cluster re-points, the manifest sink is re-derived
    consistently, and re-marking the ORIGINAL keeper reproduces the
    keeper-policy output byte-for-byte (the round-trip oracle)."""
    import pandas as pd
    import ray.data

    from dedup.sinks import write_action_manifest

    paths = write_pages(str(tmp_path / "corpus"), n_docs=150, seed=33)
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "run", "--input", paths["pages"],
         "--output", out_dir, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    orig = pq.read_table(os.path.join(out_dir, "assignments")) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    write_action_manifest(
        ray.data.read_parquet(os.path.join(out_dir, "assignments")),
        out_dir, id_col="url")

    cl = orig[orig["state"] == "delete"].iloc[0]
    member, cid = cl["url"], cl["cluster_id"]
    old_keeper = orig[(orig["cluster_id"] == cid)
                      & (orig["state"] == "keep")]["url"].iloc[0]
    n_members = int((orig["cluster_id"] == cid).sum())

    r2 = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "remark", "--run", out_dir,
         "--keeper", member, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep = json.loads([ln for ln in r2.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["rederived"] == ["delete_manifest"]

    got = pq.read_table(os.path.join(out_dir, "assignments")) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    by = got.set_index("url")
    assert by.loc[member, "state"] == "keep"
    assert by.loc[old_keeper, "state"] == "delete"
    members = got[got["cluster_id"] == member]
    assert len(members) == n_members
    assert (members["state"] == "delete").sum() == n_members - 1
    # global invariants hold: state totals unchanged, one keep/cluster
    assert got["state"].value_counts().to_dict() \
        == orig["state"].value_counts().to_dict()
    # manifest re-derived: the demoted keeper is now actionable, the
    # promoted member is not
    man = pq.read_table(os.path.join(out_dir, "delete_manifest"))
    man_urls = set(man["url"].to_pylist())
    assert old_keeper in man_urls and member not in man_urls
    assert len(man_urls) == int((got["state"] == "delete").sum())

    # round-trip oracle: re-marking the original keeper restores the
    # keeper-policy assignments exactly
    r3 = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "remark", "--run", out_dir,
         "--keeper", old_keeper, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r3.returncode == 0, r3.stderr[-2000:]
    back = pq.read_table(os.path.join(out_dir, "assignments")) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig)
    # audit log carries both remarks
    audit = json.load(open(os.path.join(out_dir, "remarks.json")))
    assert [e["keeper"] for e in audit] == [member, old_keeper]


def test_remark_keeper_rejects_nonmembers():
    """Library-level guardrails: unknown ids and non-clustered rows
    (unique/error) cannot be promoted."""
    import pyarrow as pa
    import pytest
    import ray.data

    from dedup.pipeline import remark_keeper

    assignments = ray.data.from_arrow(pa.table({
        "url": ["a", "b", "c", "d"],
        "state": ["keep", "delete", "unique", "error"],
        "cluster_id": ["a", "a", "", ""],
        "cluster_size": [2, 2, 1, 0],
    }))
    with pytest.raises(ValueError, match="not found"):
        remark_keeper(assignments, "nope", id_col="url")
    with pytest.raises(ValueError, match="unique"):
        remark_keeper(assignments, "c", id_col="url")
    out = remark_keeper(assignments, "b", id_col="url").to_pandas() \
        .set_index("url")
    assert out.loc["b", "state"] == "keep"
    assert out.loc["a", "state"] == "delete"
    assert out.loc["a", "cluster_id"] == "b"
    assert out.loc["c", "state"] == "unique"  # untouched


def test_cli_overlap_estimate_soften(tmp_path):
    """The three round-5 report verbs end-to-end: overlap (exact +
    sketch), estimate, and soften (k=2 over a run's assignments)."""
    import pyarrow as pa

    # corpus with a known cross-source twin and within-source dups
    rows = [("sa", f"document body number {i} with enough padding text "
                   f"to clear every threshold easily {i}")
            for i in range(30)]
    rows += [("sb", rows[i][1]) for i in range(10)]        # sa∩sb = 10
    rows += [("sa", rows[i][1]) for i in range(5)]         # sa self-dups
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    os.makedirs(tmp_path / "docs")
    pq.write_table(t, str(tmp_path / "docs" / "p.parquet"))
    env = {**os.environ, "RAY_ADDRESS": "local"}

    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "overlap",
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "ov"), "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    ov = pq.read_table(str(tmp_path / "ov" / "overlap"))
    row = {c: ov[c][0].as_py() for c in ov.column_names}
    assert (row["source_a"], row["source_b"]) == ("sa", "sb")
    assert (row["n_shared"], row["n_a"], row["n_b"]) == (10, 30, 10)

    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "overlap", "--sketch",
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "ovs"), "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    ovs = pq.read_table(str(tmp_path / "ovs" / "overlap"))
    assert ovs.num_rows == 1 and "jaccard_est_e6" in ovs.column_names

    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "estimate", "--slice", "zz",
         "--input", str(tmp_path / "docs"), "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    # full-corpus slice is exact: 45 rows, 5 within-source sa dups
    # (cross-source copies dedupe per source, not globally)
    assert rep["n_sampled"] == 45 and rep["n_dup"] == 5

    # soften: run a real dedup first, then relax to k=2
    paths = write_pages(str(tmp_path / "corpus"), n_docs=150, seed=33)
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "run", "--input",
         paths["pages"], "--output", out_dir, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "dedup.cli", "soften",
         "--assignments", out_dir, "--k", "2",
         "--output", str(tmp_path / "soft"), "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    soft = pq.read_table(str(tmp_path / "soft" / "assignments"))
    hard = pq.read_table(os.path.join(out_dir, "assignments"))
    assert soft.num_rows == hard.num_rows
    assert "copy_rank" in soft.column_names
    import pyarrow.compute as pc
    keeps = lambda tt: pc.sum(pc.cast(pc.equal(tt["state"], "keep"),
                                      "int64")).as_py()
    # k=2 keeps at least as many as k=1, strictly more when any
    # cluster has >= 2 members
    assert keeps(soft) > keeps(hard)
