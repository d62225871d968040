"""Terminal sinks: action manifest and survivors table.

Analogues of the reference's destructive endpoints re-expressed as data
outputs (SURVEY.md §2.1 S4/S5): the delete pass
(DeleteVisibleFilesAsync, MainViewModel.cs:1248-1346) becomes an action
MANIFEST Parquet — the destructive I/O stays out-of-band, reading the
manifest — and the copy pass (CopyVisibleFilesAsync, :1348-1469) becomes
the SURVIVORS table (keep+unique rows), written as partitioned Parquet
keyed by a url-prefix-derived shard (the copy sink's structure-preserving
re-rooting analogue, MainViewModel.cs:1413-1421: survivors of one source
prefix land together) so a failed write can resume per partition and no
single giant file exists.

Both sinks REPLACE their target directory on rerun (write to the final
path only after clearing it): a rerun with the same out_dir must never
mix stale rows from a prior run into the manifest — the manifest feeds
out-of-band destructive I/O.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dist import mix64
from .keys import url_prefix

_N_SHARDS = 16


def _fresh_dir(path: str) -> str:
    """Clear-and-recreate: a rerun replaces prior output, never appends."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def _shard_of(ids: pa.ChunkedArray | pa.Array, by_prefix: bool) -> pa.Array:
    """Stable shard column: hash of the url prefix (string ids — survivors
    of one source directory colocate, the re-rooting analogue) or of the
    id value (integer ids)."""
    if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type):
        import hashlib
        vals = ids.to_pylist()
        keys = (url_prefix(x) for x in vals) if by_prefix else iter(vals)
        shard = [int.from_bytes(
            hashlib.blake2b(k.encode(), digest_size=2).digest(),
            "little") % _N_SHARDS for k in keys]
        return pa.array(shard, pa.int32())
    vals = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.array((mix64(vals) % np.uint64(_N_SHARDS)).astype(np.int32))


def write_action_manifest(assignments: ray.data.Dataset, out_dir: str,
                          id_col: str = "url") -> str:
    """Rows marked ``delete`` → manifest parquet (id, cluster_id,
    cluster_size), partitioned by an id-hash shard column."""

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["state"], "delete"))
        return t.append_column("shard", _shard_of(t[id_col], by_prefix=False))

    ds = assignments.map_batches(_f, batch_format="pyarrow")
    path = _fresh_dir(os.path.join(out_dir, "delete_manifest"))
    ds.write_parquet(path, partition_cols=["shard"])
    return path


def write_survivors(pages: ray.data.Dataset, assignments: ray.data.Dataset,
                    out_dir: str, id_col: str = "url",
                    num_partitions: int = 16) -> str:
    """Keep+unique rows joined back to their page content, written as
    Parquet partitioned by a url-prefix shard (copy-sink re-rooting
    analogue).  The survivor filter is a DISTRIBUTED hash join on the id
    column — nothing is collected to the driver, so the sink scales with
    the corpus (the id set is O(corpus) and must never become a Python
    set)."""
    keep = assignments.filter(
        expr="state == 'keep' or state == 'unique'",
    ).select_columns([id_col])
    joined = pages.join(keep, join_type="inner",
                        num_partitions=num_partitions, on=(id_col,))

    def _shard(t: pa.Table) -> pa.Table:
        return t.append_column("shard", _shard_of(t[id_col], by_prefix=True))

    path = _fresh_dir(os.path.join(out_dir, "survivors"))
    joined.map_batches(_shard, batch_format="pyarrow").write_parquet(
        path, partition_cols=["shard"])
    return path


def write_training_shards(ds: "ray.data.Dataset", out_dir: str,
                          docs_per_shard: int, id_col: str = "doc_id",
                          carry_cols: tuple = ("text",),
                          num_partitions: int = 32,
                          format: str = "parquet") -> str:
    """Deterministic training-shard layout: the corpus is written in its
    training order (textstats.corpus_shuffle — the engine-independent
    (md5(id), id) permutation) as ``out_dir/shard=K/`` with exactly
    ``docs_per_shard`` docs per shard (last shard short).  A trainer
    streams shard directories in order; a failed export rerun REPLACES
    the directory (never appends), and because rank assignment is
    content-independent and deterministic, re-exporting after adding
    dumps yields the same prefix property the shuffle guarantees.
    One small bucket-count exchange (corpus_shuffle) + the write; no
    global sort.  ``format='jsonl'`` writes newline-delimited JSON
    instead of parquet (trainer-interop parity with the JSONL source
    path in ingest.read_input)."""
    import ray.data  # noqa: F401  (type only)
    from .textstats import corpus_shuffle

    if format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown shard format {format!r}")
    _fresh_dir(out_dir)
    ranked = corpus_shuffle(ds, id_col=id_col, carry_cols=tuple(carry_cols),
                            num_partitions=num_partitions)

    def _shard(t: pa.Table) -> pa.Table:
        r = t["shuffle_rank"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array(r // docs_per_shard, pa.int64()))

    sharded = ranked.map_batches(_shard, batch_format="pyarrow")
    if format == "parquet":
        sharded.write_parquet(out_dir, partition_cols=["shard"])
    else:
        # per-shard jsonl: one task per shard id range writes
        # shard=K/part.jsonl task-locally (the compact_index discipline)
        import json as _json
        import os

        from .dist import groupapply

        def _key(t: pa.Table) -> pa.Table:
            return t.append_column(
                "k", t["shard"].cast(pa.uint64()))

        def _write(t: pa.Table) -> pa.Table:
            import numpy as np
            sh = t["shard"].to_numpy(zero_copy_only=False)
            rk = t["shuffle_rank"].to_numpy(zero_copy_only=False)
            written = []
            for s in np.unique(sh):
                sub = t.filter(pa.array(sh == s))
                order = pa.compute.sort_indices(sub["shuffle_rank"])
                sub = sub.take(order).drop_columns(["shard", "k"])
                d = os.path.join(out_dir, f"shard={int(s)}")
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, "part-0.jsonl"), "w") as fh:
                    for row in sub.to_pylist():
                        fh.write(_json.dumps(row, sort_keys=True) + "\n")
                written.append(int(s))
            _ = rk
            return pa.table({"shard": pa.array(written, pa.int64())})

        groupapply(sharded.map_batches(_key, batch_format="pyarrow"),
                   "k", _write, num_partitions).materialize()
    return out_dir
