"""Relational pipelines over the TPC-H-ish star schema — general
query/data-processing capability of the engine beyond dedup: filtered
groupby-aggregates with per-batch combiners, broadcast dimension joins,
hash joins, and top-k.

Float discipline: every money/value aggregate leaves the engine as
integer CENTS on BOTH the Ray and SQL sides — bit-exact under value
hashing (numpy and DuckDB round() can differ by one ulp on large
doubles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def pricing_summary(lineitem: ray.data.Dataset,
                    ship_cutoff: str = "1998-09-02") -> ray.data.Dataset:
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) over rows with
    l_shipdate <= cutoff — sums/counts with a vectorized per-batch
    combiner before the (tiny) groupby."""
    import datetime
    cutoff = datetime.date.fromisoformat(ship_cutoff)

    def _partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"]
        mask = pc.less_equal(sd, pa.scalar(cutoff).cast(sd.type))
        t = t.filter(mask)
        qty = t["l_quantity"]
        price = t["l_extendedprice"]
        disc = t["l_discount"]
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        tmp = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty, "price": price, "dprice": disc_price,
        })
        g = tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("dprice", "sum"),
             ("qty", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                                 "sum_price", "sum_disc_price", "n"])

    partial = lineitem.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        ray.data.aggregate.Sum("sum_qty"),
        ray.data.aggregate.Sum("sum_price"),
        ray.data.aggregate.Sum("sum_disc_price"),
        ray.data.aggregate.Sum("n"),
    )

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                              "sum_price", "sum_disc_price", "count_order"])
        # scale by 1e4: disc_price carries exactly 4 decimals, so scaled
        # values land ON integers and float noise (~1e-3 in these units)
        # can never flip a rounding boundary
        def e4(col):
            return pc.round(pc.multiply(col, pa.scalar(10000.0))).cast(pa.int64())
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty_e4": e4(t["sum_qty"]),
            "sum_price_e4": e4(t["sum_price"]),
            "sum_disc_price_e4": e4(t["sum_disc_price"]),
            "count_order": t["count_order"].cast(pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow") \
              .sort(["l_returnflag", "l_linestatus"])


def top_customers(orders: ray.data.Dataset, customer: ray.data.Dataset,
                  nation: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """Revenue per customer with nation name: hash join orders↔customer
    (both large-ish → Dataset.join), broadcast join to the tiny nation
    dimension, then top-k by (revenue desc, custkey)."""
    # pre-aggregate orders per customer BEFORE the join (combiner)
    def _per_cust(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_totalprice", "sum"),
                                               ("o_orderkey", "count")])
        return g.rename_columns(["o_custkey", "rev", "n_orders"])

    per_cust = orders.map_batches(_per_cust, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(
            ray.data.aggregate.Sum("rev"),
            ray.data.aggregate.Sum("n_orders"))

    def _rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "rev", "n_orders"])

    per_cust = per_cust.map_batches(_rn, batch_format="pyarrow")

    joined = per_cust.join(customer, join_type="inner", num_partitions=8,
                           on=("o_custkey",), right_on=("c_custkey",))

    # nation is tiny: broadcast lookup instead of a shuffle join
    nat = {r["n_nationkey"]: r["n_name"] for r in nation.iter_rows()}
    nat_ref = ray.put(nat)

    def _attach_nation(t: pa.Table) -> pa.Table:
        nm = ray.get(nat_ref)
        names = [nm.get(x) for x in t["c_nationkey"].to_pylist()]
        # Dataset.join folds the right key into the left key column
        return pa.table({
            "c_custkey": t["o_custkey"],
            "c_name": t["c_name"],
            "n_name": pa.array(names, pa.string()),
            "revenue_cents": pc.round(pc.multiply(t["rev"], pa.scalar(100.0))).cast(pa.int64()),
            "n_orders": t["n_orders"].cast(pa.int64()),
        })

    out = joined.map_batches(_attach_nation, batch_format="pyarrow")
    return out.sort(["revenue_cents", "c_custkey"],
                    descending=[True, False]).limit(k)


def region_supplier_stats(supplier: ray.data.Dataset,
                          nation: ray.data.Dataset,
                          region: ray.data.Dataset) -> ray.data.Dataset:
    """Suppliers per region with account-balance stats: two broadcast
    dimension joins + a small groupby."""
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in nation.iter_rows()}
    reg = {r["r_regionkey"]: r["r_name"] for r in region.iter_rows()}
    ref = ray.put((nat, reg))

    def _f(t: pa.Table) -> pa.Table:
        nm, rm = ray.get(ref)
        rnames = [rm.get(nm.get(x)) for x in t["s_nationkey"].to_pylist()]
        return pa.table({"r_name": pa.array(rnames, pa.string()),
                         "s_acctbal": t["s_acctbal"]})

    rows = supplier.map_batches(_f, batch_format="pyarrow")
    agg = rows.groupby("r_name").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("s_acctbal"),
        ray.data.aggregate.Min("s_acctbal"),
        ray.data.aggregate.Max("s_acctbal"),
    )

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["r_name", "n_suppliers", "total_bal",
                              "min_bal", "max_bal"])
        def cents(col):
            return pc.round(pc.multiply(col, pa.scalar(100.0))).cast(pa.int64())
        return pa.table({
            "r_name": t["r_name"],
            "n_suppliers": t["n_suppliers"].cast(pa.int64()),
            "total_bal_cents": cents(t["total_bal"]),
            "min_bal_cents": cents(t["min_bal"]),
            "max_bal_cents": cents(t["max_bal"]),
        })

    return agg.map_batches(_final, batch_format="pyarrow").sort("r_name")


def range_join(ds: ray.data.Dataset, intervals: pa.Table,
               value_col: str, lo_col: str = "lo", hi_col: str = "hi",
               label_col: str = "band",
               keep_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Broadcast range (interval) join — the classic operator Ray Data
    lacks: attach to each row the label of the interval containing its
    ``value_col`` under half-open ``lo <= v < hi`` semantics; rows in no
    interval carry a null label (LEFT-join semantics).

    Scale shape: the interval table is the SMALL side by contract
    (config-sized — size bands, rate tiers, date ranges); it is sorted
    and validated once on the driver, shipped once via ``ray.put``, and
    probed per batch with two vectorized ``np.searchsorted`` calls — no
    shuffle at all, the big side streams.  Intervals must be
    non-overlapping (validated; overlapping tiers would need a
    flat_map-style multi-emit variant instead).
    """
    itab = intervals.combine_chunks()
    lo = itab[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = itab[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
    labels = itab[label_col]
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    labels = labels.take(pa.array(order))
    if np.any(hi <= lo):
        raise ValueError("each interval needs lo < hi")
    if np.any(lo[1:] < hi[:-1]):
        raise ValueError("intervals overlap; range_join requires disjoint "
                         "intervals")
    ref = ray.put({"lo": lo, "hi": hi, "labels": labels})

    def _probe(t: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        if len(iv["lo"]) == 0:
            lab = pa.nulls(t.num_rows, pa.string())
        else:
            v = t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(iv["lo"], v, side="right") - 1
            safe = np.clip(idx, 0, len(iv["lo"]) - 1)
            ok = (idx >= 0) & (v < iv["hi"][safe])
            lab = iv["labels"].take(pa.array(safe))
            lab = pc.if_else(pa.array(ok), lab,
                             pa.nulls(t.num_rows, lab.type))
        out = {c: t[c] for c in keep_cols} if keep_cols else \
            {c: t[c] for c in t.column_names}
        out[label_col] = lab
        return pa.table(out)

    return ds.map_batches(_probe, batch_format="pyarrow")


def group_savings(asn: ray.data.Dataset, weights: ray.data.Dataset,
                  group_col: str = "lang", weight_col: str = "n_chars",
                  id_col: str = "doc_id",
                  num_partitions: int = 8) -> ray.data.Dataset:
    """Per-group dedup-savings report — 'what does the dedup pass buy
    us, and in which slice of the corpus': join dedup assignments to a
    per-doc weight (chars, tokens, bytes), then per group (language,
    source, shard) count docs and deletes and sum the weight total vs
    the weight the deletes free up.  Output: (group, n_docs, n_delete,
    weight_total, weight_deleted, saved_frac_e6), saved_frac_e6 =
    weight_deleted * 1e6 // weight_total (floor — the repo's integer
    fraction discipline).

    Scale shape: one distributed hash join on id (both sides carry two
    thin columns), then a combiner inside map_batches so the final
    groupby shuffle moves one row per (group, state) per block."""
    joined = asn.select_columns([id_col, "state"]).join(
        weights.select_columns([id_col, group_col, weight_col]),
        join_type="inner", num_partitions=num_partitions, on=(id_col,))

    def _cnt(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(t, [group_col, "state"]).aggregate(
            [(id_col, "count"), (weight_col, "sum")]).rename_columns(
                [group_col, "state", "n", "w"])

    def _pivot(t: pa.Table) -> pa.Table:
        n_by: dict[str, int] = {}
        w_by: dict[str, int] = {}
        for s, n, w in zip(t["state"].to_pylist(), t["n"].to_pylist(),
                           t["w"].to_pylist()):
            n_by[s] = n_by.get(s, 0) + int(n)
            w_by[s] = w_by.get(s, 0) + int(w)
        docs = sum(n_by.values())
        wtot = sum(w_by.values())
        wdel = w_by.get("delete", 0)
        return pa.table({
            group_col: pa.array([t[group_col][0].as_py()], pa.string()),
            "n_docs": pa.array([docs], pa.int64()),
            "n_delete": pa.array([n_by.get("delete", 0)], pa.int64()),
            "weight_total": pa.array([wtot], pa.int64()),
            "weight_deleted": pa.array([wdel], pa.int64()),
            "saved_frac_e6": pa.array([wdel * 1_000_000 // max(wtot, 1)],
                                      pa.int64()),
        })

    part = joined.map_batches(_cnt, batch_format="pyarrow")
    return part.groupby(group_col).map_groups(
        _pivot, batch_format="pyarrow").sort(group_col)
