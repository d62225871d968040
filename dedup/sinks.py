"""Terminal sinks: action manifest and survivors table.

Analogues of the reference's destructive endpoints re-expressed as data
outputs (SURVEY.md §2.1 S4/S5): the delete pass
(DeleteVisibleFilesAsync, MainViewModel.cs:1248-1346) becomes an action
MANIFEST Parquet — the destructive I/O stays out-of-band, reading the
manifest — and the copy pass (CopyVisibleFilesAsync, :1348-1469) becomes
the SURVIVORS table (keep+unique rows), written as partitioned Parquet
(one directory per state / id-hash shard) so a failed write can resume
per partition and no single giant file exists.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from .dist import mix64


def write_action_manifest(assignments: ray.data.Dataset, out_dir: str,
                          id_col: str = "url") -> str:
    """Rows marked ``delete`` → manifest parquet (id, cluster_id,
    cluster_size), partitioned by an id-hash shard column."""

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t["state"], "delete"))
        ids = t[id_col]
        if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type):
            import hashlib
            shard = [int.from_bytes(
                hashlib.blake2b(x.encode(), digest_size=2).digest(), "little") % 16
                for x in ids.to_pylist()]
            shard = pa.array(shard, pa.int32())
        else:
            vals = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
            shard = pa.array((mix64(vals) % np.uint64(16)).astype(np.int32))
        return t.append_column("shard", shard)

    ds = assignments.map_batches(_f, batch_format="pyarrow")
    path = os.path.join(out_dir, "delete_manifest")
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path, partition_cols=["shard"])
    return path


def write_survivors(pages: ray.data.Dataset, assignments: ray.data.Dataset,
                    out_dir: str, id_col: str = "url",
                    num_partitions: int = 16) -> str:
    """Keep+unique rows joined back to their page content, written as
    partitioned Parquet.  The survivor id set is broadcast (ids only —
    O(corpus) x 8..60 bytes; shard the manifest and run per shard beyond
    driver memory)."""
    keep_ids: set = set()
    for ref in assignments.materialize().get_internal_block_refs():
        b = ray.get(ref)
        if b.num_rows == 0 or "state" not in b.column_names:
            continue
        t = b.filter(pa.compute.is_in(
            b["state"], value_set=pa.array(["keep", "unique"])))
        keep_ids.update(t[id_col].to_pylist())
    ref_ids = ray.put(keep_ids)

    def _f(t: pa.Table) -> pa.Table:
        ids = ray.get(ref_ids)
        mask = pa.array([x in ids for x in t[id_col].to_pylist()])
        return t.filter(mask)

    path = os.path.join(out_dir, "survivors")
    os.makedirs(path, exist_ok=True)
    pages.map_batches(_f, batch_format="pyarrow").write_parquet(path)
    return path
