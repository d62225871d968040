"""Incremental (reference-corpus) exact dedup.

Dedups a NEW snapshot against a previously-kept REFERENCE corpus and
against itself in ONE hash shuffle — the standard web-pipeline shape for
deduping a fresh crawl dump against the corpus accumulated from earlier
dumps (CCNet/RefinedWeb-style cross-snapshot dedup).  The reference app
has no incremental mode (every scan rebuilds the full index,
MainViewModel.cs:770-906); this is the LLM-pipeline extension of its
exact pass (SURVEY.md §2.9) to the snapshot-over-snapshot case.

Semantics per NEW document:

    error    null text / invariant violation (never matches, SURVEY §A.4)
    ignored  n_chars < min_doc_bytes (strict '<', MainViewModel.cs:603)
    ref_dup  its exact key (content hash + configured key conjuncts)
             already exists in the reference corpus — the doc adds no
             new content; n_ref = number of matching reference docs
    keep / delete / unique
             no reference match: the usual within-snapshot exact pass
             (keeper = global-order minimum, cluster_id = keeper's id)

Scale shape: both sides are prepared with the normal column-pruned
ingest; the shuffle moves only (exact64, exact_full, id, order_key,
side) for ok rows — the reference side contributes 16-byte hashes plus a
tag, never text.  No broadcast, no driver-side state: one groupapply on
exact64 at any corpus size.  Non-ok new rows bypass the shuffle
entirely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .config import DedupConfig
from .dist import groupapply, tune_context
from .ingest import prepare

_SIDE_REF = 0
_SIDE_NEW = 1


def _ok_side(prep: ray.data.Dataset, side: int,
             id_type: pa.DataType) -> ray.data.Dataset:
    """ok rows of a prepared table, reduced to the shuffle columns with a
    side tag.  The reference side ships null id/order_key placeholders so
    the two sides union under one schema."""

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["state0"], "ok"))
        n = t.num_rows
        if side == _SIDE_REF:
            ids = pa.nulls(n, id_type)
            okeys = pa.nulls(n, pa.binary())
        else:
            ids = t["id"].cast(id_type)
            okeys = t["order_key"]
        return pa.table({
            "exact64": t["exact64"],
            "exact_full": t["exact_full"],
            "id": ids,
            "order_key": okeys,
            "side": pa.array(np.full(n, side, dtype=np.int8)),
        })

    return prep.map_batches(_f, batch_format="pyarrow")


def incremental_exact_dedup(
    new_ds: ray.data.Dataset,
    ref_ds: ray.data.Dataset,
    cfg: DedupConfig,
    check_html: bool = False,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Assignments for every NEW doc: (cfg.id_col, state, cluster_id,
    cluster_size, n_ref).  ref_dup rows carry the sentinel cluster_id
    (-1 / ""), cluster_size 0 and n_ref >= 1; unmatched groups follow
    the exact_dedup conventions (assign_states) with n_ref = 0."""
    from .pipeline import _auto_partitions, _full_hi

    tune_context()
    P = num_partitions or _auto_partitions(cfg)

    prep_new = prepare(new_ds, cfg, check_html=check_html).materialize()
    prep_ref = prepare(ref_ds, cfg, check_html=check_html)

    id_type = prep_new.schema().base_schema.field("id").type
    string_ids = (pa.types.is_string(id_type)
                  or pa.types.is_large_string(id_type))
    sentinel = "" if string_ids else -1

    both = _ok_side(prep_new, _SIDE_NEW, id_type).union(
        _ok_side(prep_ref, _SIDE_REF, id_type))

    def _part(t: pa.Table) -> pa.Table:
        e64 = t["exact64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ehi = _full_hi(t["exact_full"])
        side = t["side"].to_numpy(zero_copy_only=False)
        ids = t["id"]
        okeys = t["order_key"].to_pylist()
        order = np.lexsort((ehi, e64))
        se, sh = e64[order], ehi[order]
        out_idx: list[int] = []
        out_state: list[str] = []
        out_cid: list = []
        out_size: list[int] = []
        out_nref: list[int] = []
        if len(se):
            change = (se[1:] != se[:-1]) | (sh[1:] != sh[:-1])
            starts = np.concatenate([[0], np.flatnonzero(change) + 1,
                                     [len(se)]])
            for gi in range(len(starts) - 1):
                idx = order[starts[gi]:starts[gi + 1]]
                new_i = idx[side[idx] == _SIDE_NEW]
                if len(new_i) == 0:
                    continue  # reference-only group: nothing to assign
                nref = int(len(idx) - len(new_i))
                if nref > 0:
                    for i in new_i:
                        out_idx.append(int(i))
                        out_state.append("ref_dup")
                        out_cid.append(sentinel)
                        out_size.append(0)
                        out_nref.append(nref)
                elif len(new_i) == 1:
                    out_idx.append(int(new_i[0]))
                    out_state.append("unique")
                    out_cid.append(sentinel)
                    out_size.append(1)
                    out_nref.append(0)
                else:
                    # keeper = global-order minimum (order_key bytes compare
                    # lexicographically; assign_states semantics)
                    g = sorted(new_i, key=lambda i: okeys[i])
                    keeper_id = ids[int(g[0])].as_py()
                    for rank, i in enumerate(g):
                        out_idx.append(int(i))
                        out_state.append("keep" if rank == 0 else "delete")
                        out_cid.append(keeper_id)
                        out_size.append(len(g))
                        out_nref.append(0)
        take = pa.array(out_idx, pa.int64())
        return pa.table({
            "id": ids.take(take),
            "state": pa.array(out_state, pa.string()),
            "cluster_id": pa.array(out_cid, id_type),
            "cluster_size": pa.array(out_size, pa.int64()),
            "n_ref": pa.array(out_nref, pa.int64()),
        })

    assigned = groupapply(both, "exact64", _part, P)

    def _passthrough(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["state0"], "ok"))
        n = t.num_rows
        return pa.table({
            "id": t["id"].cast(id_type),
            "state": t["state0"],
            "cluster_id": pa.array([sentinel] * n, id_type),
            "cluster_size": pa.array(np.zeros(n, dtype=np.int64)),
            "n_ref": pa.array(np.zeros(n, dtype=np.int64)),
        })

    nonok = prep_new.map_batches(_passthrough, batch_format="pyarrow")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([cfg.id_col, "state", "cluster_id",
                                 "cluster_size", "n_ref"])

    return assigned.union(nonok).map_batches(_rename, batch_format="pyarrow")
