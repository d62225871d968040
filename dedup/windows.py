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
