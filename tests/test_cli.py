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
