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
