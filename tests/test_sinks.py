"""Action manifest + survivors sinks (S4/S5 analogues)."""

import os

import pyarrow.parquet as pq
import ray.data

from dedup.config import DedupConfig
from dedup.pipeline import run_dedup
from dedup.sinks import write_action_manifest, write_survivors
from dedup.synth import generate_pages


def test_sinks_roundtrip(tmp_path):
    pages, truth = generate_pages(200, seed=31)
    ds = ray.data.from_arrow(pages).repartition(3)
    assignments = run_dedup(ds, DedupConfig(), num_partitions=8).materialize()

    man = write_action_manifest(assignments, str(tmp_path))
    man_t = pq.read_table(man)
    assert set(man_t.column_names) >= {"url", "cluster_id", "cluster_size"}
    deleted = set(man_t["url"].to_pylist())

    surv = write_survivors(ds, assignments, str(tmp_path))
    surv_t = pq.read_table(surv)
    survivors = set(surv_t["url"].to_pylist())

    # survivors and deletions partition the keep/unique/delete universe
    assert not (deleted & survivors)
    states = {}
    for b in assignments.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            states[b["url"][i].as_py()] = b["state"][i].as_py()
    for u, s in states.items():
        if s == "delete":
            assert u in deleted
        elif s in ("keep", "unique"):
            assert u in survivors
        else:
            assert u not in survivors and u not in deleted
    # survivors table preserves full page schema
    assert set(surv_t.column_names) == {"url", "warc_ts", "html", "text", "lang"}
