"""Checkpoint/resume semantics (FIXTURES.md F5 'interrupt'): resumed runs
reuse completed stages without recompute and produce byte-equal outputs;
a config change invalidates the checkpoint."""

import json
import os

import pyarrow as pa
import ray.data

from dedup.config import DedupConfig
from dedup.pipeline import run_dedup
from dedup.synth import generate_pages


def _collect(out):
    rows = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            rows[b["url"][i].as_py()] = (b["state"][i].as_py(),
                                         b["cluster_id"][i].as_py(),
                                         b["cluster_size"][i].as_py())
    return rows


def test_resume_reuses_stages(tmp_path):
    pages, _ = generate_pages(250, seed=13)
    ds = ray.data.from_arrow(pages).repartition(3)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path))

    out1 = _collect(run_dedup(ds, cfg, num_partitions=8))
    run_dir = os.path.join(str(tmp_path), cfg.fingerprint())
    metrics1 = json.load(open(os.path.join(run_dir, "metrics.json")))
    assert not any(m["reused"] for m in metrics1["stages"].values())
    mtime = os.path.getmtime(os.path.join(run_dir, "prepare", "manifest.json"))

    # full resume: everything reused, output identical
    out2 = _collect(run_dedup(ds, cfg, num_partitions=8))
    metrics2 = json.load(open(os.path.join(run_dir, "metrics.json")))
    assert all(m["reused"] for m in metrics2["stages"].values())
    assert os.path.getmtime(
        os.path.join(run_dir, "prepare", "manifest.json")) == mtime
    assert out1 == out2

    # interrupt simulation: kill a mid-pipeline stage; earlier stages are
    # reused, the killed one recomputes, output still identical
    os.remove(os.path.join(run_dir, "labels", "manifest.json"))
    out3 = _collect(run_dedup(ds, cfg, num_partitions=8))
    metrics3 = json.load(open(os.path.join(run_dir, "metrics.json")))
    assert metrics3["stages"]["prepare"]["reused"]
    assert metrics3["stages"]["edges_exact"]["reused"]
    assert not metrics3["stages"]["labels"]["reused"]
    assert out1 == out3


def test_config_change_invalidates(tmp_path):
    pages, _ = generate_pages(150, seed=14)
    ds = ray.data.from_arrow(pages).repartition(2)
    cfg1 = DedupConfig(checkpoint_dir=str(tmp_path), near=False,
                       simhash=False, substring=False)
    cfg2 = cfg1.with_(min_doc_bytes=32)
    run_dedup(ds, cfg1, num_partitions=8).materialize()
    run_dedup(ds, cfg2, num_partitions=8).materialize()
    # different fingerprints -> disjoint checkpoint trees
    assert cfg1.fingerprint() != cfg2.fingerprint()
    assert os.path.isdir(os.path.join(str(tmp_path), cfg1.fingerprint()))
    assert os.path.isdir(os.path.join(str(tmp_path), cfg2.fingerprint()))


def test_manifest_lineage(tmp_path):
    pages, _ = generate_pages(150, seed=15)
    ds = ray.data.from_arrow(pages).repartition(2)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path))
    run_dedup(ds, cfg, num_partitions=8).materialize()
    run_dir = os.path.join(str(tmp_path), cfg.fingerprint())
    m = json.load(open(os.path.join(run_dir, "labels", "manifest.json")))
    assert set(m["inputs"]) == {"edges_exact", "edges_minhash",
                                "edges_simhash", "edges_substring"}
    assert m["rows"] == sum(p["rows"] for p in m["partitions"])
    for p in m["partitions"]:
        assert p["rows"] >= 0 and p["bytes"] > 0


def test_partial_write_replaced_on_retry(tmp_path):
    """A stage dir with leftover partial files (crash before manifest)
    must be replaced, not appended to."""
    pages, _ = generate_pages(120, seed=16)
    ds = ray.data.from_arrow(pages).repartition(2)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path), near=False,
                      simhash=False, substring=False)
    run_dir = os.path.join(str(tmp_path), cfg.fingerprint())
    out1 = run_dedup(ds, cfg, num_partitions=8).materialize().count()
    # simulate crash: manifest gone, stale data files remain
    os.remove(os.path.join(run_dir, "prepare", "manifest.json"))
    out2 = run_dedup(ds, cfg, num_partitions=8).materialize().count()
    assert out1 == out2 == 120


def test_input_change_invalidates(tmp_path):
    """Same config, different --input: the run key folds an input identity
    digest (paths + size/mtime), so stale stages are never reused."""
    import pyarrow.parquet as pq
    pages_a, _ = generate_pages(120, seed=16)
    pages_b, _ = generate_pages(120, seed=17)
    in_a, in_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pages_a, in_a)
    pq.write_table(pages_b, in_b)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ckpt"), near=False,
                      simhash=False, substring=False)

    out_a = _collect(run_dedup(ray.data.read_parquet(in_a), cfg,
                               check_html=False, num_partitions=4))
    out_b = _collect(run_dedup(ray.data.read_parquet(in_b), cfg,
                               check_html=False, num_partitions=4))
    # different corpora -> different keyspaces and different outputs
    assert set(out_a) != set(out_b)
    runs = os.listdir(str(tmp_path / "ckpt"))
    assert len(runs) == 2
    # updating a file in place (same path, new mtime/size) also invalidates
    pq.write_table(pages_b, in_a)
    out_a2 = _collect(run_dedup(ray.data.read_parquet(in_a), cfg,
                                check_html=False, num_partitions=4))
    assert set(out_a2) == set(out_b)
    assert len(os.listdir(str(tmp_path / "ckpt"))) == 3


def test_eta_formula(tmp_path):
    # reference rule: eta = elapsed * (1 - p) / p, p = done/planned
    # (MainViewModel.cs:1580-1608 analogue)
    import time
    from dedup.checkpoint import Runner
    r = Runner(str(tmp_path), "cfgX", planned_stages=("a", "b", "c", "d"))
    assert r.eta_sec() is None          # nothing done yet
    r._t_start = time.time() - 30.0     # pretend 30s elapsed
    r.metrics["a"] = {"wall_sec": 30.0}
    eta = r.eta_sec()
    assert eta is not None and abs(eta - 90.0) < 1.0   # 30 * 0.75/0.25
    r.metrics.update({"b": {}, "c": {}, "d": {}})
    assert r.eta_sec() is not None and r.eta_sec() < 1.0
    # no plan declared -> no estimate
    r2 = Runner(str(tmp_path), "cfgY")
    r2.metrics["a"] = {}
    assert r2.eta_sec() is None
