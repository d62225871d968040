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
