"""Windowed / stateful event-stream operators (custom-operator examples
per the brief: windowed aggregate + sessionization as compositions of
``map_batches`` + hash-partitioned group processing — no raw Ray actors
needed).

The partitioning assumption (documented per SURVEY.md custom-operator
rule): sessionization requires all events of one user in one partition —
provided by ``groupapply`` on ``hash(user_id)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dist import groupapply, segments


def hourly_aggregate(events: ray.data.Dataset,
                     ts_col: str = "ts", type_col: str = "event_type",
                     value_col: str = "value") -> ray.data.Dataset:
    """Tumbling 1-hour windows per event type: (window_start, event_type,
    n_events, total_value).  Pre-aggregates inside map_batches before the
    small groupby (combiner pattern — the shuffle moves one row per
    (window, type) per block, not per event)."""

    def _partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t[ts_col], unit="hour")
        tmp = pa.table({"window_start": win, "event_type": t[type_col],
                        "value": t[value_col]})
        g = tmp.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")])
        return g.rename_columns(["window_start", "event_type", "value_sum",
                                 "n"])

    partial = events.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby(["window_start", "event_type"]).aggregate(
        ray.data.aggregate.Sum("value_sum"),
        ray.data.aggregate.Sum("n"),
    )

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["window_start", "event_type", "total_value",
                              "n_events"])
        cents = pc.round(pc.multiply(t["total_value"], pa.scalar(100.0)))
        return pa.table({
            "window_start": t["window_start"],
            "event_type": t["event_type"],
            "n_events": t["n_events"].cast(pa.int64()),
            "total_value_cents": cents.cast(pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow") \
              .sort(["window_start", "event_type"])


def sliding_aggregate(events: ray.data.Dataset,
                      window_minutes: int = 60, slide_minutes: int = 15,
                      ts_col: str = "ts", type_col: str = "event_type",
                      value_col: str = "value") -> ray.data.Dataset:
    """Sliding-window aggregate: per (window_start, event_type), count and
    value total over windows of ``window_minutes`` sliding every
    ``slide_minutes`` (window_minutes must be a multiple — each event
    lands in exactly window/slide windows).  Generalizes
    ``hourly_aggregate`` (tumbling = window == slide).

    Scale shape: the window replication happens INSIDE map_batches
    (vectorized ``np.repeat`` + tiled offsets) and is immediately
    combined per (window, type) per batch, so the shuffle moves one row
    per distinct (window, type) per block — the windows/event blow-up
    never rides the wire.  Values go through the scaled-integer cents
    discipline PER EVENT (``round(value*100)`` before summation), so
    totals are integer-exact and order-insensitive regardless of
    parallelism or merge order."""
    if window_minutes % slide_minutes:
        raise ValueError("window_minutes must be a multiple of "
                         "slide_minutes")
    n_w = window_minutes // slide_minutes
    slide_us = np.int64(slide_minutes * 60 * 1_000_000)

    def _partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.round(pc.multiply(t[value_col], pa.scalar(100.0))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // slide_us) * slide_us
        # each event -> n_w window starts: base - k*slide_us, k in [0, n_w)
        starts = np.repeat(base, n_w) - np.tile(
            np.arange(n_w, dtype=np.int64) * slide_us, n)
        etype = t[type_col].take(pa.array(np.repeat(
            np.arange(n, dtype=np.int64), n_w)))
        tmp = pa.table({
            "ws": pa.array(starts, pa.int64()),
            "event_type": etype,
            "cents": pa.array(np.repeat(cents, n_w), pa.int64()),
        })
        g = tmp.group_by(["ws", "event_type"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["ws", "event_type", "cents", "n"])

    agg = events.map_batches(_partial, batch_format="pyarrow") \
                .groupby(["ws", "event_type"]).aggregate(
        ray.data.aggregate.Sum("cents"), ray.data.aggregate.Sum("n"))

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["ws", "event_type", "total_value_cents", "n"])
        return pa.table({
            "window_start": t["ws"].cast(pa.timestamp("us")),
            "event_type": t["event_type"],
            "n_events": t["n"].cast(pa.int64()),
            "total_value_cents": t["total_value_cents"].cast(pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow") \
              .sort(["window_start", "event_type"])


def user_sessions(events: ray.data.Dataset, gap_minutes: int = 30,
                  num_partitions: int = 16,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> ray.data.Dataset:
    """Sessionization: per user, a session is a maximal run of events with
    inter-event gaps <= gap_minutes.  Output: (user_id, n_sessions,
    max_session_events).  One hash shuffle on user_id; per-partition
    processing is vectorized over (user, ts)-sorted runs."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def _rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "skey": t[user_col].cast(pa.uint64()),
            "user_id": t[user_col],
            "ts": t[ts_col].cast(pa.int64()),
            "eid": t[id_col],
        })

    rows = events.map_batches(_rows, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        users = t["user_id"].to_numpy(zero_copy_only=False)
        tss = t["ts"].to_numpy(zero_copy_only=False)
        eids = t["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eids, tss, users))
        u, ts = users[order], tss[order]
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "max_session_events": pa.array([], pa.int64())})
        o_user, o_n, o_max = [], [], []
        # runs of equal user in the sorted order
        brk = np.flatnonzero(u[1:] != u[:-1]) + 1
        starts = np.concatenate([[0], brk, [len(u)]]).astype(np.int64)
        for s, e in zip(starts[:-1], starts[1:]):
            gaps = np.diff(ts[s:e])
            new_session = np.concatenate([[True], gaps > gap_us])
            sess_id = np.cumsum(new_session)
            sizes = np.bincount(sess_id)[1:]
            o_user.append(u[s])
            o_n.append(int(new_session.sum()))
            o_max.append(int(sizes.max()) if len(sizes) else 0)
        return pa.table({"user_id": pa.array(o_user, pa.int64()),
                         "n_sessions": pa.array(o_n, pa.int64()),
                         "max_session_events": pa.array(o_max, pa.int64())})

    return groupapply(rows, "skey", _part, num_partitions).sort("user_id")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on_key: tuple[str, str], on_ts: tuple[str, str],
              id_col: str, value_cols: tuple[str, ...],
              num_partitions: int = 16) -> ray.data.Dataset:
    """As-of (backward) join — the classic operator Ray Data lacks: for
    each left row, attach the right row of the same key with the
    greatest timestamp <= the left timestamp (ties on the right
    timestamp broken by the greatest first value column, so the result
    is total-order deterministic).  Unmatched left rows carry -1.

    ``value_cols`` must already be int64 on the right side (pre-project
    prices to cents etc. — the scaled-integer float discipline).

    Scale shape: ONE hash shuffle on the join key (groupapply), then a
    per-partition vectorized merge — union-tag both sides, lexsort by
    (key, ts, side, tiebreak) with right rows ordered before left rows
    at equal timestamps (backward-inclusive semantics), forward-fill the
    last-seen right row position with ``np.maximum.accumulate``, and
    invalidate fills that crossed a key boundary.  No per-key Python
    loop, no per-row search.  Partitioning assumption (SURVEY.md
    custom-operator rule): all rows of one key — both sides — fit one
    partition, same contract as ``user_sessions``."""
    lk, rk = on_key
    lts, rts = on_ts
    n_val = len(value_cols)

    def _lrows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        base = {
            "skey": t[lk].cast(pa.uint64()),
            "k": t[lk].cast(pa.int64()),
            "ts": t[lts].cast(pa.int64()),
            "src": pa.array(np.ones(n, dtype=np.int8)),
            "id": t[id_col].cast(pa.int64()),
        }
        for c in value_cols:  # placeholders, never read for left rows
            base[c] = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(base)

    def _rrows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        base = {
            "skey": t[rk].cast(pa.uint64()),
            "k": t[rk].cast(pa.int64()),
            "ts": t[rts].cast(pa.int64()),
            "src": pa.array(np.zeros(n, dtype=np.int8)),
            "id": pa.array(np.zeros(n, dtype=np.int64)),
        }
        for c in value_cols:
            base[c] = t[c].cast(pa.int64())
        return pa.table(base)

    rows = left.map_batches(_lrows, batch_format="pyarrow").union(
        right.map_batches(_rrows, batch_format="pyarrow"))

    empty_schema = {id_col: pa.array([], pa.int64())}
    empty_schema.update({c: pa.array([], pa.int64()) for c in value_cols})

    def _part(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(dict(empty_schema))
        k = t["k"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        vals = [t[c].to_numpy(zero_copy_only=False) for c in value_cols]
        # right tie-break: first value column; left rows use id (total
        # order only — their relative order never affects the fill)
        tb = np.where(src == 0, vals[0] if n_val else ids, ids)
        order = np.lexsort((tb, src, ts, k))
        ks, tss, srcs = k[order], ts[order], src[order]
        pos = np.arange(n, dtype=np.int64)
        rpos = np.where(srcs == 0, pos, np.int64(-1))
        filled = np.maximum.accumulate(rpos)
        safe = np.clip(filled, 0, n - 1)
        valid = (filled >= 0) & (ks[safe] == ks)
        take = srcs == 1
        m_idx, m_ok = safe[take], valid[take]
        out = {id_col: pa.array(ids[order][take], pa.int64())}
        for c, v in zip(value_cols, vals):
            vs = v[order]
            out[c] = pa.array(np.where(m_ok, vs[m_idx], np.int64(-1)),
                              pa.int64())
        return pa.table(out)

    return groupapply(rows, "skey", _part, num_partitions)


def user_event_deltas(events: ray.data.Dataset,
                      num_partitions: int = 16,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id") -> ray.data.Dataset:
    """Per-user lag delta — the window-function surface (``ts -
    lag(ts) OVER (PARTITION BY user ORDER BY ts, id)``): for every
    event, microseconds since that user's previous event; a user's
    first event gets the -1 sentinel (NOT null — int64-with-null
    round-trips to float64 NaN in pandas, where NaN != NaN breaks the
    driver's value compare).  Deterministic under ties via the id
    tiebreak.

    Scale shape: ONE hash shuffle on user (same ``groupapply``
    machinery as sessionization); per-partition work is one lexsort +
    one vectorized diff over (user, ts, id)-sorted runs — no per-user
    Python loop, n rows out for n rows in."""

    def _rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "skey": t[user_col].cast(pa.uint64()),
            "user_id": t[user_col].cast(pa.int64()),
            "ts": t[ts_col].cast(pa.int64()),
            "eid": t[id_col].cast(pa.int64()),
        })

    rows = events.map_batches(_rows, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        users = t["user_id"].to_numpy(zero_copy_only=False)
        tss = t["ts"].to_numpy(zero_copy_only=False)
        eids = t["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eids, tss, users))
        u, ts, ei = users[order], tss[order], eids[order]
        if len(u) == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
                "prev_gap_us": pa.array([], pa.int64())})
        first = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.empty(len(u), np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        return pa.table({
            "event_id": pa.array(ei, pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "prev_gap_us": pa.array(np.where(first, -1, gap), pa.int64()),
        })

    out = groupapply(rows, "skey", _part, num_partitions)

    def _ts_back(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts": t["ts"].cast(pa.timestamp("us")),
            "prev_gap_us": t["prev_gap_us"],
        })

    return out.map_batches(_ts_back, batch_format="pyarrow") \
              .sort(["user_id", "ts", "event_id"])


def windowed_dedup(events: ray.data.Dataset,
                   key_col: str = "props", ts_col: str = "ts",
                   id_col: str = "event_id", window_minutes: int = 60,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Temporal gap-island dedup: rows with identical ``key_col`` are
    duplicates ONLY while they arrive within ``window_minutes`` of the
    previous occurrence — each maximal gap-chained run (a gaps-and-
    islands window per key) is one duplicate island, the island's first
    (ts, id) row is the keeper, later members are deletes, and a key
    re-appearing after a quiet gap starts a FRESH island (it is a new
    legitimate record, not a duplicate).  The event-stream analogue of
    the reference's date-modified predicate (M3,
    ViewModels/MainViewModel.cs settings block): where ``key_ts``
    demands ts EQUALITY, the window generalizes it to ts PROXIMITY.

    Output: (id, state keep|delete|unique, island_id = keeper id or -1
    for singletons, island_size), sorted by id.

    Scale shape: ONE hash shuffle on md5(key) (all rows of a key
    colocate; island chaining is a per-key prefix property so it cannot
    cross partitions); per-partition work is one lexsort + vectorized
    break/cumsum/run-length — no per-key Python loop.  Determinism: the
    sort key (key, ts, id) is total, so output is byte-identical at any
    parallelism."""
    from .corpus import _hash64_strings

    gap_us = np.int64(window_minutes) * 60 * 1_000_000

    def _rows(t: pa.Table) -> pa.Table:
        key = pc.fill_null(t[key_col], "").cast(pa.string())
        return pa.table({
            "skey": pa.array(_hash64_strings(key), pa.uint64()),
            "key": key,
            "ts": t[ts_col].cast(pa.int64()),
            "eid": t[id_col].cast(pa.int64()),
        })

    rows = events.map_batches(_rows, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "eid": pa.array([], pa.int64()),
                "state": pa.array([], pa.string()),
                "island_id": pa.array([], pa.int64()),
                "island_size": pa.array([], pa.int64())})
        codes = pc.dictionary_encode(t["key"].combine_chunks()) \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, codes))
        c, s, e = codes[order], ts[order], eid[order]
        brk = np.empty(len(c), dtype=bool)
        brk[0] = True
        brk[1:] = (c[1:] != c[:-1]) | (s[1:] - s[:-1] > gap_us)
        island = np.cumsum(brk) - 1                    # 0-based island no
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(c)))
        size_row = sizes[island]
        keeper = e[starts][island]                     # first (ts,id) member
        state = np.where(size_row == 1, "unique",
                         np.where(brk, "keep", "delete"))
        island_id = np.where(size_row == 1, -1, keeper)
        return pa.table({
            "eid": pa.array(e, pa.int64()),
            "state": pa.array(state, pa.string()),
            "island_id": pa.array(island_id, pa.int64()),
            "island_size": pa.array(size_row, pa.int64()),
        })

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([id_col, "state", "island_id",
                                 "island_size"])

    return groupapply(rows, "skey", _part, num_partitions) \
        .map_batches(_rename, batch_format="pyarrow").sort(id_col)


def windowed_distinct(events: ray.data.Dataset, key_col: str = "user",
                      ts_col: str = "ts",
                      num_partitions: int = 32) -> ray.data.Dataset:
    """Exact distinct-key count per tumbling 1-hour window (hourly
    unique users — the streaming-analytics staple): (window_start,
    n_distinct, n_events).

    Scale shape: per batch, events reduce to DISTINCT (window, key)
    pairs plus a per-window event-count partial — the shuffle carries
    one row per distinct pair per batch, never the event stream; one
    window-keyed groupapply then counts per-window distinct keys with a
    lexsort (re-deduping pairs that recur across batches).  For
    cardinalities where even distinct pairs are too many, the
    approximate path is ``textstats.approx_distinct`` per window."""
    from .dist import groupapply, mix64, segments

    def _pairs(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t[ts_col], unit="hour")
        tmp = pa.table({"w": win, "key": t[key_col]})
        g = tmp.group_by(["w", "key"]).aggregate([([], "count_all")])
        g = g.rename_columns(["w", "key", "n"])
        wi = g["w"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(mix64(wi.astype(np.uint64)), pa.uint64()),
            "w": g["w"],
            "key": g["key"],
            "n": g["n"].cast(pa.int64()),
        })

    pairs = events.map_batches(_pairs, batch_format="pyarrow")

    def _count(t: pa.Table) -> pa.Table:
        wi = t["w"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        kd = pc.dictionary_encode(
            t["key"].combine_chunks() if isinstance(
                t["key"], pa.ChunkedArray) else t["key"])
        # null keys still count toward n_events but are EXCLUDED from the
        # distinct count (SQL count(DISTINCT key) semantics — the oracle
        # contract); fill_null(-1) keeps the cast well-defined instead of
        # the NaN->int64 UB a raw .to_numpy() on null indices produces
        kc = kd.indices.fill_null(-1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False)
        order, starts, uniq_w = segments(wi)
        out_w, out_d, out_n = [], [], []
        for a, b, w in zip(starts[:-1], starts[1:], uniq_w):
            g = order[a:b]
            u = np.unique(kc[g])
            out_w.append(int(w))
            out_d.append(int(len(u) - (1 if len(u) and u[0] == -1 else 0)))
            out_n.append(int(n[g].sum()))
        return pa.table({
            "window_start": pa.array(out_w, pa.int64()).cast(
                t["w"].type),
            "n_distinct": pa.array(out_d, pa.int64()),
            "n_events": pa.array(out_n, pa.int64()),
        })

    return groupapply(pairs, "k", _count, num_partitions) \
        .sort("window_start")
