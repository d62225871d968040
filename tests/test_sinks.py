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
    # survivors table preserves full page schema (+ the shard partition key)
    assert set(surv_t.column_names) == {"url", "warc_ts", "html", "text",
                                        "lang", "shard"}
    # partitioned layout: shard=N directories, no giant single file
    shards = [d for d in os.listdir(surv) if d.startswith("shard=")]
    assert len(shards) > 1
    assert any(d.startswith("shard=") for d in os.listdir(man))
    # same url-prefix always lands in the same shard directory (re-rooting
    # analogue: survivors of one source directory colocate)
    from dedup.keys import url_prefix
    seen = {}
    for b in surv_t.select(["url", "shard"]).to_batches():
        for u, s in zip(b["url"].to_pylist(), b["shard"].to_pylist()):
            p = url_prefix(u)
            assert seen.setdefault(p, s) == s


def test_sinks_rerun_replaces(tmp_path):
    """Rerunning into the same out_dir must REPLACE prior output — a
    manifest feeding destructive I/O must never accumulate stale rows."""
    pages, _ = generate_pages(120, seed=7)
    ds = ray.data.from_arrow(pages).repartition(2)
    assignments = run_dedup(ds, DedupConfig(), num_partitions=4).materialize()

    man1 = write_action_manifest(assignments, str(tmp_path))
    n_man1 = pq.read_table(man1).num_rows
    surv1 = write_survivors(ds, assignments, str(tmp_path))
    n_surv1 = pq.read_table(surv1).num_rows

    man2 = write_action_manifest(assignments, str(tmp_path))
    surv2 = write_survivors(ds, assignments, str(tmp_path))
    assert pq.read_table(man2).num_rows == n_man1
    assert pq.read_table(surv2).num_rows == n_surv1


def test_write_training_shards(tmp_path):
    """Shard layout: rank-ordered directories of exactly docs_per_shard
    docs (last short), contents a permutation of the corpus, and the
    whole layout byte-deterministic across input partitioning."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from dedup.sinks import write_training_shards

    t = pa.table({
        "doc_id": pa.array(list(range(37)), pa.int64()),
        "text": [f"doc number {i} body" for i in range(37)],
    })
    layouts = []
    for parts, d in ((1, "a"), (5, "b")):
        out = write_training_shards(
            ray.data.from_arrow(t).repartition(parts),
            str(tmp_path / d), docs_per_shard=10)
        shards = sorted(glob.glob(out + "/shard=*"))
        assert [s.rsplit("=", 1)[1] for s in shards] == ["0", "1", "2", "3"]
        rows = []
        for s in shards:
            st = pq.read_table(s).to_pandas().sort_values("shuffle_rank")
            rows.append(st)
        import pandas as pd
        full = pd.concat(rows).reset_index(drop=True)
        assert sorted(full["doc_id"]) == list(range(37))
        assert list(full["shuffle_rank"]) == list(range(37))
        assert len(rows[0]) == len(rows[1]) == len(rows[2]) == 10
        assert len(rows[3]) == 7
        layouts.append(full[["doc_id", "shuffle_rank", "text"]])
    import pandas.testing as pdt
    pdt.assert_frame_equal(layouts[0], layouts[1])


def test_write_training_shards_jsonl(tmp_path):
    """JSONL shard export: same deterministic layout/permutation as the
    parquet path, newline-JSON payload, rank-ordered within shards."""
    import json

    from dedup.sinks import write_training_shards
    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(25)]
    out_p = write_training_shards(
        ray.data.from_items(rows).repartition(3),
        str(tmp_path / "pq"), docs_per_shard=8)
    out_j = write_training_shards(
        ray.data.from_items(rows).repartition(5),
        str(tmp_path / "jl"), docs_per_shard=8, format="jsonl")
    import pyarrow.parquet as pq
    for shard in sorted(os.listdir(out_p)):
        if not shard.startswith("shard="):
            continue
        pt = pq.read_table(os.path.join(out_p, shard)) \
            .sort_by("shuffle_rank")
        with open(os.path.join(out_j, shard, "part-0.jsonl")) as fh:
            jrows = [json.loads(ln) for ln in fh]
        assert [r["doc_id"] for r in jrows] == \
            pt["doc_id"].to_pylist()          # identical permutation
        assert [r["shuffle_rank"] for r in jrows] == \
            sorted(r["shuffle_rank"] for r in jrows)
    import pytest
    with pytest.raises(ValueError):
        write_training_shards(ray.data.from_items(rows),
                              str(tmp_path / "bad"), 8, format="csv")
