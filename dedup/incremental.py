"""Incremental (reference-corpus) dedup.

Dedups a NEW snapshot against a previously-kept REFERENCE corpus and
against itself — the standard web-pipeline shape for deduping a fresh
crawl dump against the corpus accumulated from earlier dumps
(CCNet/RefinedWeb-style cross-snapshot dedup).  The reference app has no
incremental mode (every scan rebuilds the full index,
MainViewModel.cs:770-906); this is the LLM-pipeline extension of its
dedup passes (SURVEY.md §2.9) to the snapshot-over-snapshot case.

Two entry points: ``incremental_exact_dedup`` (direct exact-key
anti-join semantics, one shuffle, reports the per-doc reference match
count) and ``incremental_dedup`` (every configured pass — exact,
MinHash, SimHash, substring — under transitive-closure semantics).

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
from .dist import groupapply, tune_context, union_find
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
    bloom_fpp: float | None = None,
) -> ray.data.Dataset:
    """Assignments for every NEW doc: (cfg.id_col, state, cluster_id,
    cluster_size, n_ref).  ref_dup rows carry the sentinel cluster_id
    (-1 / ""), cluster_size 0 and n_ref >= 1; unmatched groups follow
    the exact_dedup conventions (assign_states) with n_ref = 0.

    ``bloom_fpp`` enables the bloom semi-join: a sharded bloom over the
    NEW snapshot's exact keys (the small side — the reference corpus
    accumulated over many dumps dwarfs one fresh crawl) filters the
    reference side before the shuffle, so only probable matches ship.
    Reference rows the bloom drops can never affect an assignment
    (reference-only groups are skipped in the join kernel) and false
    positives just shuffle and match nothing, so assignments are
    byte-identical to the unfiltered path at any fpp."""
    from .pipeline import _auto_partitions, _full_hi

    tune_context()
    P = num_partitions or _auto_partitions(cfg)

    # exact join: only the 16-byte key material rides — never text
    prep_new = prepare(new_ds, cfg, check_html=check_html,
                       keep_text=False).materialize()
    prep_ref = prepare(ref_ds, cfg, check_html=check_html,
                       keep_text=False)

    id_type = prep_new.schema().base_schema.field("id").type
    string_ids = (pa.types.is_string(id_type)
                  or pa.types.is_large_string(id_type))
    sentinel = "" if string_ids else -1

    new_side = _ok_side(prep_new, _SIDE_NEW, id_type)
    ref_side = _ok_side(prep_ref, _SIDE_REF, id_type)
    if bloom_fpp is not None:
        from .bloom import bloom_filter_dataset, build_bloom
        bloom = build_bloom(new_side.select_columns(["exact64"]), "exact64",
                            fpp=bloom_fpp, num_partitions=P)
        ref_side = bloom_filter_dataset(ref_side, "exact64", bloom)
    both = new_side.union(ref_side)

    def _part(t: pa.Table) -> pa.Table:
        return _exact_join_table(t, id_type, sentinel)

    assigned = groupapply(both, "exact64", _part, P)
    nonok = _nonok_passthrough(prep_new, id_type, sentinel)
    return _rename_out(assigned.union(nonok), cfg)


def _exact_join_table(t: pa.Table, id_type: pa.DataType,
                      sentinel) -> pa.Table:
    """The incremental exact-join kernel: ``t`` holds WHOLE exact-key
    groups of side-tagged (exact64, exact_full, id, order_key, side)
    rows; emits the per-NEW-doc assignment rows (ref_dup / unique /
    keep / delete).  Shared by the shuffle path
    (``incremental_exact_dedup``) and the storage-partitioned bucket
    path (``incremental_exact_dedup_bucketed``) — any partitioning that
    co-locates whole groups yields byte-identical output."""
    from .pipeline import _full_hi

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


def _nonok_passthrough(prep_new: ray.data.Dataset, id_type: pa.DataType,
                       sentinel) -> ray.data.Dataset:
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

    return prep_new.map_batches(_passthrough, batch_format="pyarrow")


def _rename_out(ds: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([cfg.id_col, "state", "cluster_id",
                                 "cluster_size", "n_ref"])

    return ds.map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# full incremental dedup (every configured pass, closure semantics)
# ---------------------------------------------------------------------------

def incremental_dedup(
    new_ds: ray.data.Dataset,
    ref_ds: ray.data.Dataset,
    cfg: DedupConfig,
    check_html: bool = False,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cross-snapshot dedup with EVERY configured pass (exact + MinHash +
    SimHash + substring, per the cfg flags) under transitive-closure
    semantics: edges are computed over the side-tagged union of both
    snapshots with the exact same stages run_dedup uses, components come
    from the same union-find, and then

        component containing >= 1 reference doc  -> every NEW member is
            'ref_dup' (its content — directly or through a chain of
            duplicates — already exists in the kept corpus)
        component of only NEW docs               -> the usual
            keep/delete assignment (keeper = global-order minimum)
        unmatched ok NEW docs                    -> 'unique'
        non-ok NEW docs                          -> 'ignored' / 'error'

    Reference docs never appear in the output.  Scale shape: the edge
    stages are the engine's own shuffle-native passes; the side/label
    attachment is one hash shuffle on node over the corpus and the
    component assigner one shuffle on comp over O(matched) rows — no
    broadcast, no driver-side state.  Ref-ref edges are kept (they can
    only merge components that are already reference-containing, so they
    never change a new doc's state)."""
    from .pipeline import (_auto_partitions, _ok_only, exact_edges,
                           minhash_edges, simhash_edges, substring_edges)

    tune_context()
    needs_text = bool(cfg.near or cfg.simhash or cfg.substring
                      or cfg.byte_verify)
    prep_new = prepare(new_ds, cfg, check_html=check_html,
                       keep_text=needs_text).materialize()
    prep_ref = prepare(ref_ds, cfg, check_html=check_html,
                       keep_text=needs_text)
    P = num_partitions or _auto_partitions(cfg, prep_new.size_bytes())

    id_type = prep_new.schema().base_schema.field("id").type
    string_ids = (pa.types.is_string(id_type)
                  or pa.types.is_large_string(id_type))
    sentinel = "" if string_ids else -1

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))
        return _f

    active = _ok_only(prep_new).map_batches(_tag(_SIDE_NEW),
                                            batch_format="pyarrow").union(
        _ok_only(prep_ref).map_batches(_tag(_SIDE_REF),
                                       batch_format="pyarrow")).materialize()

    stage_fns = []
    if cfg.exact:
        stage_fns.append(lambda: exact_edges(active, cfg, P))
    if cfg.near:
        stage_fns.append(lambda: minhash_edges(active, cfg, P))
    if cfg.simhash:
        stage_fns.append(lambda: simhash_edges(active, cfg, P))
    if cfg.substring:
        stage_fns.append(lambda: substring_edges(active, cfg, P))
    if not stage_fns:
        raise ValueError("incremental_dedup needs at least one pass enabled")
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=len(stage_fns)) as ex:
        edge_sets = [f.result() for f in
                     [ex.submit(lambda fn: fn().materialize(), fn)
                      for fn in stage_fns]]
    edges = edge_sets[0]
    if len(edge_sets) > 1:
        edges = edges.union(*edge_sets[1:])
    labels = union_find(edges, P)

    # ---- shuffle A (node): attach comp + side/id/order_key; settle
    # unmatched new docs immediately ------------------------------------
    def _lab_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["node"],
            "comp": t["comp"],
            "side": pa.array(np.full(n, -1, dtype=np.int8)),
            "id": pa.nulls(n, id_type),
            "order_key": pa.nulls(n, pa.binary()),
        })

    def _act_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t["id"].cast(id_type)
        okeys = pc.if_else(pc.equal(t["side"], _SIDE_NEW),
                           t["order_key"], pa.nulls(n, pa.binary()))
        return pa.table({
            "node": t["node"],
            "comp": pa.nulls(n, pa.uint64()),
            "side": t["side"],
            "id": pc.if_else(pc.equal(t["side"], _SIDE_NEW), ids,
                             pa.nulls(n, id_type)),
            "order_key": okeys,
        })

    mixed = labels.map_batches(_lab_rows, batch_format="pyarrow").union(
        active.select_columns(["node", "side", "id", "order_key"])
              .map_batches(_act_rows, batch_format="pyarrow"))

    def _attach(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = t["side"].to_numpy(zero_copy_only=False)
        # nullable-uint64 to_numpy degrades to float64 and loses precision
        # for full-range hash ids — fill nulls on the arrow side instead
        comp = pc.fill_null(t["comp"], 0).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        # sort by (node, side) so each group's label row (side -1) is first
        order = np.lexsort((side, nodes))
        sn = nodes[order]
        brk = np.flatnonzero(sn[1:] != sn[:-1]) + 1
        starts = np.concatenate([[0], brk]).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [len(sn)]]))
        first = order[starts]
        has_lab = side[first] == -1
        row_comp = np.repeat(comp[first], sizes)    # aligned with `order`
        row_haslab = np.repeat(has_lab, sizes)
        row_side = side[order]
        is_act = row_side >= 0
        matched = is_act & row_haslab
        unmatched_new = is_act & ~row_haslab & (row_side == _SIDE_NEW)
        m_idx = pa.array(order[matched], pa.int64())
        u_idx = pa.array(order[unmatched_new], pa.int64())
        return pa.table({
            "comp": pa.array(
                np.concatenate([row_comp[matched],
                                np.zeros(int(unmatched_new.sum()),
                                         np.uint64)]), pa.uint64()),
            "side": pa.concat_arrays([
                t["side"].combine_chunks().take(m_idx),
                t["side"].combine_chunks().take(u_idx)]),
            "id": pa.concat_arrays([
                t["id"].combine_chunks().take(m_idx),
                t["id"].combine_chunks().take(u_idx)]),
            "order_key": pa.concat_arrays([
                t["order_key"].combine_chunks().take(m_idx),
                t["order_key"].combine_chunks().take(u_idx)]),
            "matched": pa.array(
                [True] * int(matched.sum()) +
                [False] * int(unmatched_new.sum()), pa.bool_()),
        })

    attached = groupapply(mixed, "node", _attach, P).materialize()

    def _unmatched_final(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t["matched"]))
        n = t.num_rows
        return pa.table({
            "id": t["id"],
            "state": pa.array(["unique"] * n, pa.string()),
            "cluster_id": pa.array([sentinel] * n, id_type),
            "cluster_size": pa.array(np.ones(n, dtype=np.int64)),
        })

    unmatched = attached.map_batches(_unmatched_final, batch_format="pyarrow")

    def _comp_cols(t: pa.Table) -> pa.Table:
        t = t.filter(t["matched"])
        return t.drop_columns(["matched"])

    comp_rows = attached.map_batches(_comp_cols, batch_format="pyarrow")

    # ---- shuffle B (comp): per-component assignment --------------------
    def _assign(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("comp", "ascending"),
                                            ("order_key", "ascending")])
        t2 = t.take(idx)
        ck = t2["comp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = t2["side"].to_numpy(zero_copy_only=False)
        n = len(ck)
        if n == 0:
            return pa.table({"id": pa.array([], id_type),
                             "state": pa.array([], pa.string()),
                             "cluster_id": pa.array([], id_type),
                             "cluster_size": pa.array([], pa.int64())})
        brk = np.flatnonzero(ck[1:] != ck[:-1]) + 1
        starts = np.concatenate([[0], brk]).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [n]]))
        gidx = np.repeat(np.arange(len(starts)), sizes)
        has_ref = np.bincount(gidx, weights=(side == _SIDE_REF),
                              minlength=len(starts)) > 0
        n_new = np.bincount(gidx, weights=(side == _SIDE_NEW),
                            minlength=len(starts)).astype(np.int64)
        # keeper = first row per group in (comp, order_key) order; in
        # new-only groups every row is new so this is the order minimum
        state = np.full(n, "delete", dtype=object)
        state[starts] = "keep"
        state[has_ref[gidx]] = "ref_dup"
        ids2 = t2["id"].combine_chunks()
        cid = ids2.take(pa.array(np.repeat(starts, sizes)))
        row_has_ref = has_ref[gidx]
        keep_mask = side == _SIDE_NEW
        out = pa.table({
            "id": ids2,
            "state": pa.array(state.tolist(), pa.string()),
            "cluster_id": pc.if_else(pa.array(row_has_ref),
                                     pa.scalar(sentinel, id_type), cid),
            "cluster_size": pa.array(
                np.where(row_has_ref, 0, n_new[gidx]), pa.int64()),
        })
        return out.filter(pa.array(keep_mask))

    assigned = groupapply(comp_rows, "comp", _assign, P)

    def _passthrough(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["state0"], "ok"))
        n = t.num_rows
        return pa.table({
            "id": t["id"].cast(id_type),
            "state": t["state0"],
            "cluster_id": pa.array([sentinel] * n, id_type),
            "cluster_size": pa.array(np.zeros(n, dtype=np.int64)),
        })

    nonok = prep_new.map_batches(_passthrough, batch_format="pyarrow")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([cfg.id_col, "state", "cluster_id",
                                 "cluster_size"])

    return assigned.union(unmatched).union(nonok) \
        .map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# storage-partitioned (bucketed) incremental dedup
# ---------------------------------------------------------------------------
#
# The accumulating-corpus shape at 100 TB: every kept dump's exact-key
# index is written ONCE as a bucketed parquet layout (16 bytes + bucket
# per doc), and deduping the next crawl reads only the reference bucket
# files co-bucketed with some new doc — the reference side is never
# shuffled and never scanned outside those buckets.  This is the
# storage-partitioned-join trick: pre-bucketing replaces the all-to-all
# exchange with bucket-pruned local reads, and because the index is one
# directory per dump, accumulating a new dump appends a directory
# instead of rewriting anything.

N_KEY_BUCKETS = 256


def key_bucket(e64: np.ndarray, n_buckets: int) -> np.ndarray:
    """Bucket id for an exact64 key array.  mix64 decouples the bucket
    from groupapply's own mix64(bucket) % P partitioner and from any
    structure in exact64 itself."""
    from .dist import mix64
    return (mix64(e64.astype(np.uint64)) % np.uint64(n_buckets)).astype(
        np.int64)


def write_key_index(ds: ray.data.Dataset, cfg: DedupConfig, out_dir: str,
                    n_buckets: int = N_KEY_BUCKETS,
                    check_html: bool = False) -> str:
    """Write the exact-key index of a corpus snapshot as a bucketed
    parquet layout ``out_dir/bucket=K/*.parquet`` with columns
    (exact64, exact_full) — 16 bytes of key material per ok doc, one
    row per doc so n_ref stays an occurrence count.  All dumps of an
    accumulating corpus must share ``n_buckets``; each dump gets its
    own out_dir and ``incremental_exact_dedup_bucketed`` takes the list.
    A rerun replaces the target directory (sink convention), never
    appends — appending would double-count n_ref."""
    from .sinks import _fresh_dir
    _fresh_dir(out_dir)
    prep = prepare(ds, cfg, check_html=check_html, keep_text=False)

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["state0"], "ok"))
        e64 = t["exact64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "exact64": t["exact64"],
            "exact_full": t["exact_full"],
            "bucket": pa.array(key_bucket(e64, n_buckets)),
        })

    prep.map_batches(_f, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    write_index_meta(out_dir, "exact", n_buckets, cfg)
    return out_dir


def incremental_exact_dedup_bucketed(
    new_ds: ray.data.Dataset,
    index_dirs: str | list[str],
    cfg: DedupConfig,
    n_buckets: int = N_KEY_BUCKETS,
    check_html: bool = False,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Incremental exact dedup against reference corpora stored as
    ``write_key_index`` layouts (same ``n_buckets``).  Same output
    contract as ``incremental_exact_dedup`` — byte-identical on the
    union of the indexed corpora (tested) — but the ONLY exchange is
    one groupapply of the NEW side on its bucket id; each bucket task
    then reads the matching reference bucket files task-locally (on a
    real cluster: bucket-pruned reads from shared storage) and runs the
    shared join kernel.  Reference rows outside new-occupied buckets
    are never read at all."""
    import os

    from .pipeline import _auto_partitions

    if isinstance(index_dirs, str):
        index_dirs = [index_dirs]
    dirs = list(index_dirs)
    _validate_indexes(dirs, "exact", n_buckets, cfg)
    tune_context()
    P = num_partitions or min(n_buckets, _auto_partitions(cfg))

    prep_new = prepare(new_ds, cfg, check_html=check_html,
                       keep_text=False).materialize()
    id_type = prep_new.schema().base_schema.field("id").type
    string_ids = (pa.types.is_string(id_type)
                  or pa.types.is_large_string(id_type))
    sentinel = "" if string_ids else -1

    new_side = _ok_side(prep_new, _SIDE_NEW, id_type)

    def _add_bucket(t: pa.Table) -> pa.Table:
        e64 = t["exact64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array(key_bucket(e64, n_buckets).astype(np.uint64)))

    new_b = new_side.map_batches(_add_bucket, batch_format="pyarrow")

    def _bucket_join(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        bs = np.unique(t["bucket"].to_numpy(zero_copy_only=False))
        parts = [t.drop_columns(["bucket"])]
        for b in bs:
            for d in dirs:
                p = os.path.join(d, f"bucket={int(b)}")
                if not os.path.isdir(p):
                    continue
                rt = pq.read_table(p, columns=["exact64", "exact_full"])
                n = rt.num_rows
                parts.append(pa.table({
                    "exact64": rt["exact64"].cast(pa.uint64()),
                    "exact_full": rt["exact_full"].cast(pa.binary()),
                    "id": pa.nulls(n, id_type),
                    "order_key": pa.nulls(n, pa.binary()),
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                }))
        merged = pa.concat_tables(parts, promote_options="default")
        return _exact_join_table(merged, id_type, sentinel)

    assigned = groupapply(new_b, "bucket", _bucket_join, P)
    nonok = _nonok_passthrough(prep_new, id_type, sentinel)
    return _rename_out(assigned.union(nonok), cfg)


# ---------------------------------------------------------------------------
# bucketed LSH band index (near-dup analogue of write_key_index)
# ---------------------------------------------------------------------------

def write_band_index(ds: ray.data.Dataset, cfg: DedupConfig, out_dir: str,
                     n_buckets: int = N_KEY_BUCKETS,
                     check_html: bool = False) -> str:
    """Write the MinHash/LSH band-key index of a corpus snapshot:
    bucketed parquet ``out_dir/bucket=K/*.parquet`` with one uint64
    ``skey`` column (batch-locally deduplicated band keys — 8 bytes per
    (doc, band) at most).  Band keys are a pure function of
    (num_perm, shingle_k, seed, lsh_bands, lsh_rows, scope), so the
    probe side must run the same cfg; like write_key_index, one dir per
    dump and a rerun replaces the dir."""
    from .minhash import cached_signer
    from .pipeline import _band_keys
    from .sinks import _fresh_dir

    _fresh_dir(out_dir)
    prep = prepare(ds, cfg, check_html=check_html)

    def _sign(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["state0"], "ok"))
        return cached_signer(cfg.num_perm, cfg.shingle_k, cfg.seed)(
            t.select(["node", "scope64", "text"]))

    sigs = prep.map_batches(_sign, batch_format="pyarrow") \
        .select_columns(["node", "scope64", "minhash"])

    def _bands(t: pa.Table) -> pa.Table:
        keys, _, _ = _band_keys(t, cfg)
        uk = np.unique(keys.reshape(-1))
        return pa.table({
            "skey": pa.array(uk),
            "bucket": pa.array(key_bucket(uk, n_buckets)),
        })

    sigs.map_batches(_bands, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    write_index_meta(out_dir, "bands", n_buckets, cfg)
    return out_dir


def incremental_minhash_filter(
    new_ds: ray.data.Dataset,
    index_dirs: str | list[str],
    cfg: DedupConfig,
    n_buckets: int = N_KEY_BUCKETS,
    check_html: bool = False,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cross-snapshot NEAR-dup filter against ``write_band_index``
    layouts: per NEW doc, (cfg.id_col, ref_near, n_band_hits) where
    ref_near = the doc shares >= 1 LSH band key with the indexed
    reference corpus.  Band-collision semantics (Broder 1997): with the
    cfg's (bands b, rows r), P[flag | jaccard j] = 1 - (1 - j^r)^b —
    there is no text-level verify because the index stores 8-byte band
    keys only; tune b, r for the target threshold.  Non-ok rows report
    (False, 0).

    Scale shape: the ONLY exchange is the new side's band rows grouped
    by key bucket; each bucket task reads the matching reference bucket
    files task-locally and probes them with one searchsorted.  The
    reference corpus is never shuffled, never re-signed, never read
    outside new-occupied buckets."""
    import os

    from .minhash import cached_signer
    from .pipeline import _auto_partitions, _band_keys

    if isinstance(index_dirs, str):
        index_dirs = [index_dirs]
    dirs = list(index_dirs)
    _validate_indexes(dirs, "bands", n_buckets, cfg)
    tune_context()
    P = num_partitions or min(n_buckets, _auto_partitions(cfg))

    prep_new = prepare(new_ds, cfg, check_html=check_html).materialize()
    id_type = prep_new.schema().base_schema.field("id").type

    def _sign(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["state0"], "ok"))
        return cached_signer(cfg.num_perm, cfg.shingle_k, cfg.seed)(
            t.select(["node", "scope64", "text"]))

    sigs = prep_new.map_batches(_sign, batch_format="pyarrow") \
        .select_columns(["node", "scope64", "minhash"])

    def _rows(t: pa.Table) -> pa.Table:
        keys, nodes, _ = _band_keys(t, cfg)
        flat = keys.reshape(-1)
        return pa.table({
            "skey": pa.array(flat),
            "node": pa.array(np.tile(nodes, keys.shape[0])),
            "bucket": pa.array(key_bucket(flat, n_buckets)
                               .astype(np.uint64)),
        })

    rows = sigs.map_batches(_rows, batch_format="pyarrow")

    def _probe(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        sk = t["skey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hit = np.zeros(len(sk), dtype=bool)
        for b in np.unique(bk):
            refs = []
            for d in dirs:
                p = os.path.join(d, f"bucket={int(b)}")
                if os.path.isdir(p):
                    refs.append(pq.read_table(p, columns=["skey"])["skey"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.uint64))
            if not refs:
                continue
            ref = np.unique(np.concatenate(refs))
            m = bk == b
            pos = np.searchsorted(ref, sk[m])
            pos[pos == len(ref)] = 0
            hit[m] = ref[pos] == sk[m]
        un, cnt = np.unique(nd[hit], return_counts=True)
        return pa.table({"node": pa.array(un),
                         "hits": pa.array(cnt.astype(np.int64))})

    # hit rows are sparse (only near-dup docs); sum partials per node
    hits = groupapply(rows, "bucket", _probe, P)

    def _sum_node(t: pa.Table) -> pa.Table:
        nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = t["hits"].to_numpy(zero_copy_only=False)
        order = np.argsort(nd, kind="stable")
        nd, h = nd[order], h[order]
        starts = np.concatenate([[0], np.flatnonzero(nd[1:] != nd[:-1]) + 1])
        return pa.table({
            "node": pa.array(nd[starts]),
            "hits": pa.array(np.add.reduceat(h, starts).astype(np.int64)),
        })

    totals = groupapply(hits, "node", _sum_node, P).materialize()

    # attach: flagged nodes are bounded by the near-dup count; broadcast
    # below the pipeline's 20M bound, else co-shuffle on node
    if totals.count() <= 20_000_000:
        nodes_l: list[int] = []
        hits_l: list[int] = []
        for b in totals.iter_batches(batch_format="pyarrow"):
            nodes_l.extend(b["node"].to_pylist())
            hits_l.extend(b["hits"].to_pylist())
        order = np.argsort(np.array(nodes_l, dtype=np.uint64), kind="stable")
        nd_arr = np.array(nodes_l, dtype=np.uint64)[order]
        ht_arr = np.array(hits_l, dtype=np.int64)[order]
        ref = ray.put((nd_arr, ht_arr))

        def _attach(t: pa.Table) -> pa.Table:
            nd_s, ht_s = ray.get(ref)
            nd = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(nd_s, nd)
            pos[pos == len(nd_s)] = 0
            m = (nd_s[pos] == nd) if len(nd_s) else np.zeros(len(nd), bool)
            n_hits = np.where(m, ht_s[pos] if len(ht_s) else 0, 0)
            ok = pc.equal(t["state0"], "ok").to_numpy(zero_copy_only=False)
            return pa.table({
                "id": t["id"].cast(id_type),
                "ref_near": pa.array((m & ok)),
                "n_band_hits": pa.array(np.where(ok, n_hits, 0), pa.int64()),
            })

        out = prep_new.map_batches(_attach, batch_format="pyarrow")
    else:
        def _node_rows(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "id": t["id"].cast(id_type),
                "state0": t["state0"],
            })

        left = prep_new.map_batches(_node_rows, batch_format="pyarrow")
        joined = left.join(totals, join_type="left_outer",
                           num_partitions=P, on=("node",))

        def _finish(t: pa.Table) -> pa.Table:
            h = pc.fill_null(t["hits"], 0).cast(pa.int64())
            ok = pc.equal(t["state0"], "ok")
            return pa.table({
                "id": t["id"],
                "ref_near": pc.and_(pc.greater(h, 0), ok),
                "n_band_hits": pc.if_else(ok, h, pa.scalar(0, pa.int64())),
            })

        out = joined.map_batches(_finish, batch_format="pyarrow")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([cfg.id_col, "ref_near", "n_band_hits"])

    return out.map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# index metadata (self-describing layouts for the CLI / cross-run safety)
# ---------------------------------------------------------------------------

def _index_params(kind: str, cfg: DedupConfig) -> dict:
    """The cfg knobs a probe MUST share with the index writer: exact
    keys depend on the content hash and key conjuncts; band keys on the
    whole MinHash/LSH geometry."""
    if kind == "exact":
        return {
            "content_hash": cfg.content_hash,
            "key_ts": cfg.key_ts,
            "key_lang": cfg.key_lang,
            "scope": cfg.scope,
            "min_doc_bytes": cfg.min_doc_bytes,
        }
    return {
        "num_perm": cfg.num_perm,
        "shingle_k": cfg.shingle_k,
        "seed": cfg.seed,
        "lsh_bands": cfg.lsh_bands,
        "lsh_rows": cfg.lsh_rows,
        "scope": cfg.scope,
        "min_doc_bytes": cfg.min_doc_bytes,
    }


def write_index_meta(out_dir: str, kind: str, n_buckets: int,
                     cfg: DedupConfig) -> None:
    import json
    import os
    with open(os.path.join(out_dir, "_index.json"), "w") as fh:
        json.dump({"kind": kind, "n_buckets": n_buckets,
                   "params": _index_params(kind, cfg)}, fh, indent=1)


def read_index_meta(index_dir: str, kind: str,
                    cfg: DedupConfig | None = None) -> dict:
    """Load and validate an index dir's ``_index.json``: the kind must
    match, and (when a cfg is given) every key-affecting knob must equal
    the writer's — a mismatched probe would silently miss every
    duplicate, so it is an error, not a warning."""
    import json
    import os
    with open(os.path.join(index_dir, "_index.json")) as fh:
        meta = json.load(fh)
    if meta.get("kind") != kind:
        raise ValueError(
            f"{index_dir}: index kind {meta.get('kind')!r} != {kind!r}")
    if cfg is not None:
        want = _index_params(kind, cfg)
        got = meta.get("params", {})
        bad = {k: (got.get(k), v) for k, v in want.items()
               if got.get(k) != v}
        if bad:
            raise ValueError(
                f"{index_dir}: index/probe config mismatch: {bad}")
    return meta


def _validate_indexes(dirs: list[str], kind: str, n_buckets: int,
                      cfg: DedupConfig) -> None:
    """Probe-side guard: every index dir carrying meta must have been
    written with the same kind, bucket count and key-affecting knobs.
    Meta-less dirs (pre-meta layouts) are trusted as-is."""
    import os
    for d in dirs:
        if not os.path.exists(os.path.join(d, "_index.json")):
            continue
        meta = read_index_meta(d, kind, cfg)
        if meta["n_buckets"] != n_buckets:
            raise ValueError(
                f"{d}: index has n_buckets={meta['n_buckets']}, "
                f"probe used {n_buckets}")


def compact_index(index_dirs: list[str], out_dir: str) -> dict:
    """Merge several per-dump index dirs (write_key_index /
    write_band_index layouts that share kind + n_buckets + key params)
    into ONE directory — the periodic maintenance op an accumulating
    reference corpus needs: probe cost is per-dir file opens per
    bucket, so dozens of dumps make every bucket task open dozens of
    files; compaction restores one file per bucket.

    Semantics are kind-aware and probe-equivalent (tested):
      * ``exact`` rows are one-per-doc occurrence records (n_ref is a
        COUNT), so compaction concatenates — never dedupes;
      * ``bands`` rows are membership keys (the probe is a
        searchsorted membership test), so duplicate skeys across dumps
        are dropped and each bucket is written sorted.

    Scale shape: one Ray task batch per bucket-id range; each task
    reads only its buckets' files from every dump and writes the
    merged bucket task-locally — no shuffle, no driver data path.
    A rerun replaces ``out_dir`` (sink convention).  Returns
    {"buckets": ..., "rows_in": ..., "rows_out": ...}."""
    import json
    import os

    import pyarrow.parquet as pq

    from .sinks import _fresh_dir

    if not index_dirs:
        raise ValueError("compact_index needs at least one index dir")
    metas = []
    for d in index_dirs:
        with open(os.path.join(d, "_index.json")) as fh:
            metas.append(json.load(fh))
    kind = metas[0]["kind"]
    n_buckets = metas[0]["n_buckets"]
    params = metas[0].get("params", {})
    for d, m in zip(index_dirs, metas):
        if (m["kind"], m["n_buckets"], m.get("params", {})) != \
                (kind, n_buckets, params):
            raise ValueError(
                f"{d}: incompatible index meta {m} vs {metas[0]}")
    _fresh_dir(out_dir)
    dirs = list(index_dirs)
    cols = ["exact64", "exact_full"] if kind == "exact" else ["skey"]

    def _compact(t: pa.Table) -> pa.Table:
        res_b, res_in, res_out = [], [], []
        for b in t["bucket"].to_pylist():
            parts = []
            for d in dirs:
                p = os.path.join(d, f"bucket={int(b)}")
                if os.path.isdir(p):
                    parts.append(pq.read_table(p, columns=cols))
            if not parts:
                continue
            merged = pa.concat_tables(parts, promote_options="default")
            rows_in = merged.num_rows
            if kind == "bands":
                k = np.unique(
                    merged["skey"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64))
                merged = pa.table({"skey": pa.array(k, pa.uint64())})
            tgt = os.path.join(out_dir, f"bucket={int(b)}")
            os.makedirs(tgt, exist_ok=True)
            pq.write_table(merged, os.path.join(tgt, "part-0.parquet"))
            res_b.append(int(b))
            res_in.append(rows_in)
            res_out.append(merged.num_rows)
        return pa.table({"bucket": pa.array(res_b, pa.int64()),
                         "rows_in": pa.array(res_in, pa.int64()),
                         "rows_out": pa.array(res_out, pa.int64())})

    report = ray.data.from_items(
        [{"bucket": b} for b in range(n_buckets)]) \
        .map_batches(_compact, batch_format="pyarrow").to_pandas()
    with open(os.path.join(out_dir, "_index.json"), "w") as fh:
        json.dump({"kind": kind, "n_buckets": n_buckets,
                   "params": params}, fh, indent=1)
    if report.empty:    # every input bucket empty (e.g. all-ignored dump)
        return {"buckets": 0, "rows_in": 0, "rows_out": 0}
    return {"buckets": int(len(report)),
            "rows_in": int(report["rows_in"].sum()),
            "rows_out": int(report["rows_out"].sum())}


def snapshot_diff(old: ray.data.Dataset, new: ray.data.Dataset,
                  id_col: str = "doc_id", text_col: str = "text",
                  num_partitions: int = 32) -> ray.data.Dataset:
    """Crawl-ops snapshot diff: one row per id present in either
    snapshot with status ``added`` (new only) / ``removed`` (old only)
    / ``changed`` (both, content differs) / ``unchanged``.  The
    operational companion to incremental dedup — what changed between
    dumps, not just what duplicates what.

    Scale shape: each side is reduced per batch to (id, md5-128 content
    digest) rows — 16 bytes/doc ride the ONE id-hash shuffle, never the
    text (the exact-key discipline); per-partition compare is one
    lexsort.  Ids must be unique within each snapshot (the snapshot
    contract; duplicate ids raise)."""
    import hashlib

    from .corpus import _key64_ids
    from .dist import segments

    def _digest(side: int):
        def _f(t: pa.Table) -> pa.Table:
            ids = t[id_col]
            txt = t[text_col].to_pylist()
            dig = [hashlib.md5((s or "").encode()).digest() for s in txt]
            ids_arr = ids.combine_chunks() if isinstance(
                ids, pa.ChunkedArray) else ids
            return pa.table({
                "k": pa.array(_key64_ids(ids_arr), pa.uint64()),
                "id": ids_arr,
                "side": pa.array(np.full(t.num_rows, side, np.int8)),
                "dig": pa.array(dig, pa.binary()),
            })
        return _f

    both = old.map_batches(_digest(0), batch_format="pyarrow").union(
        new.map_batches(_digest(1), batch_format="pyarrow"))

    def _cmp(t: pa.Table) -> pa.Table:
        ids = t["id"]
        if pa.types.is_integer(ids.type):
            keys = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            d = pc.dictionary_encode(
                ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
                else ids)
            keys = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        side = t["side"].to_numpy(zero_copy_only=False)
        dig = t["dig"].to_pylist()
        order, starts, _ = segments(keys)
        out_idx, out_status = [], []
        for a, b in zip(starts[:-1], starts[1:]):
            g = order[a:b]
            s = side[g]
            n_old, n_new = int((s == 0).sum()), int((s == 1).sum())
            if n_old > 1 or n_new > 1:
                raise ValueError(
                    "snapshot_diff: duplicate id within one snapshot")
            out_idx.append(int(g[0]))
            if n_old and not n_new:
                out_status.append("removed")
            elif n_new and not n_old:
                out_status.append("added")
            else:
                o = g[s == 0][0]
                n = g[s == 1][0]
                out_status.append(
                    "unchanged" if dig[o] == dig[n] else "changed")
        ids_a = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        return pa.table({
            id_col: ids_a.take(pa.array(out_idx, pa.int64())),
            "status": pa.array(out_status, pa.string()),
        })

    return groupapply(both, "k", _cmp, num_partitions)
