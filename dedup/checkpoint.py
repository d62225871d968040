"""Stage checkpointing, lineage, and metrics.

The reference has NO resume story — cancel discards all work; the only
intra-scan memo is the hash cache (FileEntryViewModel.cs:97-101) and the
skip-if-classified guard (MainViewModel.cs:703-706).  SURVEY.md §4
("Checkpoint / resume: design needed") and the north rule require
per-partition lineage + metrics with resume-without-recompute.

Design:
  * a run directory keyed by the config fingerprint — a checkpoint is
    only ever reused under an IDENTICAL semantic config;
  * each stage writes partitioned Parquet (one file per Ray block) plus
    a manifest.json recorded AFTER a successful write (stage-level
    atomicity: a crash mid-write leaves no manifest, so the stage
    recomputes; completed stages are skipped entirely);
  * the manifest carries lineage (input stage names + fingerprints) and
    per-partition records (file, rows, bytes) — the unit a multi-node
    scheduler can verify/skip individually;
  * metrics.json aggregates per-stage wall time, rows, bytes, rows/s and
    whether the stage was reused — the run's observability artifact
    (DiskViewModel perf-counter analogue, SURVEY.md §2.3 T4).
"""

from __future__ import annotations

import base64
import json
import os
import time

import pyarrow as pa

import ray.data


def input_identity(ds: ray.data.Dataset) -> str:
    """Digest of the input's file identity (paths + size/mtime when
    stat-able): folded into the checkpoint run key so the same config
    over a DIFFERENT or updated corpus never reuses stale stages.
    In-memory datasets (from_arrow etc.) have no input files and return
    "" — their checkpoints key on config alone, as before."""
    import hashlib
    try:
        files = ds.input_files()
    except Exception:
        return ""
    if not files:
        return ""
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        try:
            st = os.stat(f)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            pass
    return h.hexdigest()[:16]


class Runner:
    """Checkpointed stage executor.

    Usage:
        r = Runner("/ckpt/run1", cfg.fingerprint())
        prep = r.stage("prepare", lambda: prepare(ds, cfg), inputs=["read"])
        ...
        r.finish()
    """

    def __init__(self, root: str, config_fingerprint: str,
                 planned_stages: tuple[str, ...] = ()) -> None:
        self.dir = os.path.join(root, config_fingerprint)
        os.makedirs(self.dir, exist_ok=True)
        self.fingerprint = config_fingerprint
        self.metrics: dict[str, dict] = {}
        self.planned = tuple(planned_stages)
        self._t_start = time.time()
        cfg_path = os.path.join(self.dir, "config_fingerprint")
        with open(cfg_path, "w") as fh:
            fh.write(config_fingerprint)

    def eta_sec(self) -> float | None:
        """Remaining-time estimate after the stages recorded so far —
        the reference's ETA rule elapsed * (1 - p) / p
        (MainViewModel.cs:1580-1608) with p = completed / planned
        stages.  None until progress is measurable or when no stage
        plan was declared."""
        if not self.planned or not self.metrics:
            return None
        p = min(1.0, len(self.metrics) / len(self.planned))
        if p <= 0:
            return None
        elapsed = time.time() - self._t_start
        return round(elapsed * (1.0 - p) / p, 3)

    # ------------------------------------------------------------------
    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "manifest.json")

    def is_complete(self, name: str) -> bool:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return False
        try:
            m = json.load(open(p))
        except (OSError, json.JSONDecodeError):
            return False
        return m.get("config_fingerprint") == self.fingerprint

    def stage(self, name: str, fn, inputs: tuple[str, ...] = ()) -> ray.data.Dataset:
        """Run ``fn() -> Dataset`` under checkpoint ``name`` (or reread the
        completed checkpoint).  The returned dataset is always backed by
        the checkpoint Parquet, so downstream stages re-read instead of
        re-deriving."""
        data_dir = os.path.join(self._stage_dir(name), "data")
        t0 = time.time()
        if self.is_complete(name):
            m = json.load(open(self._manifest_path(name)))
            self.metrics[name] = {"reused": True, "rows": m["rows"],
                                  "bytes": m["bytes"], "wall_sec": 0.0}
            if m["rows"] == 0:
                schema = pa.ipc.read_schema(pa.BufferReader(
                    base64.b64decode(m["schema"])))
                return ray.data.from_arrow(schema.empty_table())
            return ray.data.read_parquet(data_dir)
        ds = fn().materialize()
        rows = ds.count()
        schema = ds.schema().base_schema
        if os.path.isdir(data_dir):
            # a crash between write and manifest leaves partial files; a
            # retry must replace them, not append alongside
            import shutil
            shutil.rmtree(data_dir)
        os.makedirs(data_dir, exist_ok=True)
        if rows > 0:
            ds.write_parquet(data_dir)
        wall = time.time() - t0
        parts = []
        total_bytes = 0
        for f in sorted(os.listdir(data_dir)):
            fp = os.path.join(data_dir, f)
            if not f.endswith(".parquet"):
                continue
            import pyarrow.parquet as pq
            md = pq.ParquetFile(fp).metadata
            parts.append({"file": f, "rows": md.num_rows,
                          "bytes": os.path.getsize(fp)})
            total_bytes += os.path.getsize(fp)
        manifest = {
            "stage": name,
            "schema": base64.b64encode(schema.serialize().to_pybytes()).decode(),
            "config_fingerprint": self.fingerprint,
            "inputs": list(inputs),
            "rows": rows,
            "bytes": total_bytes,
            "wall_sec": round(wall, 3),
            "partitions": parts,
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, self._manifest_path(name))
        self.metrics[name] = {
            "reused": False, "rows": rows, "bytes": total_bytes,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
        }
        eta = self.eta_sec()
        if eta is not None:
            self.metrics[name]["eta_sec"] = eta
        if rows == 0:
            return ray.data.from_arrow(schema.empty_table())
        return ray.data.read_parquet(data_dir)

    def finish(self) -> dict:
        path = os.path.join(self.dir, "metrics.json")
        out = {"stages": self.metrics,
               "total_wall_sec": round(sum(m.get("wall_sec", 0)
                                           for m in self.metrics.values()), 3)}
        with open(path, "w") as fh:
            json.dump(out, fh, indent=2)
        return out
