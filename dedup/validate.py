"""Row-validation gate: declarative data-quality rules evaluated
distributed — the schema/constraint check every production ingest runs
before a corpus enters the pipeline (null checks, ranges, format
regexes, key uniqueness), reported as one row per rule.

Rules (each a dict):
    {"name": ..., "kind": "not_null",  "col": c}
    {"name": ..., "kind": "range",     "col": c, "lo": x, "hi": y}
        (violation = non-null value outside [lo, hi])
    {"name": ..., "kind": "regex",     "col": c, "pattern": p}
        (violation = non-null value NOT fully matching p)
    {"name": ..., "kind": "in_set",    "col": c, "values": [...]}
        (violation = non-null value outside the set)
    {"name": ..., "kind": "unique",    "col": c}
        (violations = n_rows - n_distinct values, nulls counted as a
         value; examples = the 5 smallest duplicated values)

Output per rule: (rule, n_checked, n_violations, examples) where
``examples`` is a comma-joined, deterministic sample — the 5 smallest
violating ids (scalar rules) or duplicated values (unique) — so the
report is stable at any parallelism and SQL-checkable.

Scale shape: scalar rules ride ONE shuffle-free map_batches emitting a
per-rule partial row per batch (counts + a 5-example prune); the
driver combine is rules x blocks rows.  The ``unique`` rule is the one
wide check: per-batch (value, cnt, min_id) partials into a
groupby(value) combine — one hash shuffle carrying distinct values per
batch, never the corpus — then per-partition top-5 prune."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dist import groupapply, segments
from .corpus import _hash64_strings

_N_EXAMPLES = 5


def _as_arr(a) -> pa.Array:
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def validate_rows(ds: ray.data.Dataset, rules: list[dict],
                  id_col: str = "doc_id",
                  num_partitions: int = 8) -> pa.Table:
    """Evaluate ``rules`` over ``ds``; returns the report table sorted
    by rule name (small: one row per rule)."""
    scalar = [r for r in rules if r["kind"] != "unique"]
    uniq = [r for r in rules if r["kind"] == "unique"]
    out_rows = []

    if scalar:
        def _partials(t: pa.Table) -> pa.Table:
            ids = _as_arr(t[id_col])
            names, checked, viol, ex = [], [], [], []
            for r in scalar:
                col = _as_arr(t[r["col"]])
                null = pc.is_null(col)
                if r["kind"] == "not_null":
                    bad = null
                    n_checked = t.num_rows
                elif r["kind"] == "range":
                    bad = pc.and_kleene(
                        pc.invert(null),
                        pc.or_kleene(pc.less(col, r["lo"]),
                                     pc.greater(col, r["hi"])))
                    bad = pc.fill_null(bad, False)
                    n_checked = t.num_rows - null.true_count
                elif r["kind"] == "regex":
                    m = pc.match_substring_regex(
                        col.cast(pa.string()),
                        pattern=f"^(?:{r['pattern']})$")
                    bad = pc.fill_null(pc.invert(m), False)
                    n_checked = t.num_rows - null.true_count
                elif r["kind"] == "in_set":
                    m = pc.is_in(col, value_set=pa.array(r["values"]))
                    bad = pc.and_kleene(pc.invert(null), pc.invert(m))
                    bad = pc.fill_null(bad, False)
                    n_checked = t.num_rows - null.true_count
                else:
                    raise ValueError(f"unknown rule kind {r['kind']!r}")
                bad_ids = ids.filter(bad)
                # deterministic 5-example prune per batch
                if len(bad_ids):
                    sort_i = pc.sort_indices(bad_ids)[:_N_EXAMPLES]
                    sample = bad_ids.take(sort_i).to_pylist()
                else:
                    sample = []
                names.append(r["name"])
                checked.append(int(n_checked))
                viol.append(int(bad.true_count if hasattr(bad, "true_count")
                                else pc.sum(bad).as_py() or 0))
                ex.append(",".join(str(x) for x in sample))
            return pa.table({
                "rule": pa.array(names, pa.string()),
                "n_checked": pa.array(checked, pa.int64()),
                "n_violations": pa.array(viol, pa.int64()),
                "ex": pa.array(ex, pa.string()),
            })

        part = ds.map_batches(_partials, batch_format="pyarrow") \
                 .to_pandas()   # bounded: rules x blocks rows
        for name, g in part.groupby("rule"):
            exs = sorted({x for s in g["ex"] if s for x in s.split(",")},
                         key=_ex_key)[:_N_EXAMPLES]
            out_rows.append({
                "rule": name,
                "n_checked": int(g["n_checked"].sum()),
                "n_violations": int(g["n_violations"].sum()),
                "examples": ",".join(exs),
            })

    for r in uniq:
        out_rows.append(_unique_rule(ds, r, num_partitions))

    out_rows.sort(key=lambda x: x["rule"])
    return pa.Table.from_pylist(out_rows) if out_rows else pa.table({
        "rule": pa.array([], pa.string()),
        "n_checked": pa.array([], pa.int64()),
        "n_violations": pa.array([], pa.int64()),
        "examples": pa.array([], pa.string())})


def _ex_key(s: str):
    try:
        return (0, int(s), s)
    except ValueError:
        return (1, 0, s)


def _unique_rule(ds: ray.data.Dataset, rule: dict,
                 num_partitions: int) -> dict:
    col = rule["col"]

    def _counts(t: pa.Table) -> pa.Table:
        v = _as_arr(t[col]).cast(pa.string())
        v = pc.fill_null(v, "\0NULL")
        vc = v.value_counts()
        vals = _as_arr(vc.field("values"))
        return pa.table({
            "k": pa.array(_hash64_strings(vals), pa.uint64()),
            "value": vals,
            "cnt": vc.field("counts").cast(pa.int64()),
        })

    def _combine(t: pa.Table) -> pa.Table:
        vals = _as_arr(t["value"])
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(vals)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, _ = segments(codes)
        tot = np.add.reduceat(cnt[order], starts[:-1]) if len(codes) \
            else np.zeros(0, np.int64)
        rep = order[starts[:-1]]
        dup = tot > 1
        n_extra = int((tot[dup] - 1).sum())
        dup_vals = _as_arr(vals.take(pa.array(rep[dup])))
        if len(dup_vals):
            si = pc.sort_indices(dup_vals)[:_N_EXAMPLES]
            sample = dup_vals.take(si).to_pylist()
        else:
            sample = []
        return pa.table({
            "n_rows": pa.array([int(cnt.sum())], pa.int64()),
            "n_extra": pa.array([n_extra], pa.int64()),
            "ex": pa.array([",".join(sample)], pa.string()),
        })

    agg = groupapply(ds.map_batches(_counts, batch_format="pyarrow"),
                     "k", _combine, num_partitions).to_pandas()
    # unique-rule examples are VALUES (strings): plain lexicographic,
    # matching the per-partition pc.sort_indices prune order
    exs = sorted({x for s in agg["ex"] if s
                  for x in s.split(",")})[:_N_EXAMPLES]
    return {"rule": rule["name"],
            "n_checked": int(agg["n_rows"].sum()),
            "n_violations": int(agg["n_extra"].sum()),
            "examples": ",".join(exs)}
