"""Composed curation recipe — the end-to-end document filter every
web-corpus pipeline runs before training (C4's heuristics, Rae et al.
2021 "Gopher" §A.1.1 repetition/quality rules, FineWeb's
filter-then-dedup ordering): length gates, alphabetic/digit/stopword
ratios, mean token length, repetition caps, then exact dedup over the
survivors.

One verdict per document, where verdict is the FIRST failed gate (gate
order is the documented contract) or ``kept``:

    error        null text
    too_short    n_chars <  min_chars
    too_long     n_chars >= max_chars
    low_alpha    alpha_ratio_e6    < min_alpha_e6
    high_digit   digit_ratio_e6    > max_digit_e6
    low_stopword stopword_ratio_e6 < min_stopword_e6
    token_len    mean_token_len_e6 outside [min_tok_len_e6, max_tok_len_e6]
    rep_lines    dup_line_frac_e6  > max_dup_line_e6
    rep_2gram    top_2gram_frac_e6 > max_top_2gram_e6
    dup          exact duplicate of a kept doc with smaller id
    kept         survived everything

Scale shape (prune-before-shuffle): gates are ONE map_batches over the
pruned (id, text) read — no exchange; only gate-survivors enter the
single 8-byte-key dedup shuffle, which ships (hash64, digest16, id) and
never text.  At web scale the gates drop the majority of documents
before any byte crosses the network — the reason every published
pipeline orders filters before dedup.

Every gate metric reuses the exact e6-integer kernels already
SQL-checked standalone (textstats.quality_table /
repetition_stats_table), so the WHOLE recipe is covered by one DuckDB
oracle (`curation_pipeline` / `curation_report` queries).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dist import groupapply, tune_context
from .textstats import quality_table, repetition_stats_table

#: gate order is part of the contract (first failed gate wins)
GATES = ("error", "too_short", "too_long", "low_alpha", "high_digit",
         "low_stopword", "token_len", "rep_lines", "rep_2gram", "dup",
         "kept")


@dataclass(frozen=True)
class CurateConfig:
    """Thresholds in the same floor-e6 integer space as the metric
    kernels (so Ray and SQL compare identical integers).  Defaults are
    Gopher-flavored but tuned loose enough that a generic web corpus
    keeps a majority of docs."""
    min_chars: int = 80
    max_chars: int = 1_000_000
    min_alpha_e6: int = 500_000       # >= 50% alphabetic chars
    max_digit_e6: int = 200_000       # <= 20% digits
    min_stopword_e6: int = 10_000     # >= 1% stopwords (Gopher: >= 2 hits)
    min_tok_len_e6: int = 2_000_000   # mean token length in [2, 12]
    max_tok_len_e6: int = 12_000_000
    max_dup_line_e6: int = 300_000    # <= 30% of lines duplicated
    max_top_2gram_e6: int = 200_000   # top 2-gram <= 20% of 2-grams


def _gate_table(t: pa.Table, cfg: CurateConfig, id_col: str,
                text_col: str) -> pa.Table:
    """Per-batch verdict for gates 1-8 (everything except the dedup
    stage): (id, n_chars, gate) where gate == 'kept' means the doc
    proceeds to dedup."""
    n = t.num_rows
    q = quality_table(t, id_col=id_col, text_col=text_col)
    r = repetition_stats_table(t, id_col=id_col, text_col=text_col)
    n_chars = pc.fill_null(
        pc.utf8_length(t[text_col]), -1).to_numpy(zero_copy_only=False)

    def col(tbl, name):
        return tbl[name].to_numpy(zero_copy_only=False)

    verdict = np.full(n, "kept", dtype=object)
    checks = (  # reverse gate order: earlier gates overwrite later ones
        (col(r, "top_2gram_frac_e6") > cfg.max_top_2gram_e6, "rep_2gram"),
        (col(r, "dup_line_frac_e6") > cfg.max_dup_line_e6, "rep_lines"),
        ((col(q, "mean_token_len_e6") < cfg.min_tok_len_e6)
         | (col(q, "mean_token_len_e6") > cfg.max_tok_len_e6), "token_len"),
        (col(q, "stopword_ratio_e6") < cfg.min_stopword_e6, "low_stopword"),
        (col(q, "digit_ratio_e6") > cfg.max_digit_e6, "high_digit"),
        (col(q, "alpha_ratio_e6") < cfg.min_alpha_e6, "low_alpha"),
        (n_chars >= cfg.max_chars, "too_long"),
        ((n_chars >= 0) & (n_chars < cfg.min_chars), "too_short"),
        (n_chars < 0, "error"),
    )
    for mask, name in checks:
        verdict[mask] = name
    # md5-16 digest (as two uint64 halves) for gate survivors only —
    # text never leaves this stage, so the materialized gate table and
    # the dedup shuffle carry 16 bytes per doc, not the corpus
    kept = verdict == "kept"
    dig = np.zeros((n, 2), dtype=np.uint64)
    if kept.any():
        txts = pc.fill_null(t[text_col], "").to_pylist()
        raw = b"".join(hashlib.md5(txts[i].encode()).digest()
                       for i in np.flatnonzero(kept))
        dig[kept] = np.frombuffer(raw, dtype=np.uint64).reshape(-1, 2)
    return pa.table({
        id_col: t[id_col],
        "n_chars": pa.array(np.maximum(n_chars, 0), pa.int64()),
        "verdict": pa.array(verdict.tolist(), pa.string()),
        "h64": pa.array(dig[:, 0], mask=~kept),
        "hhi": pa.array(dig[:, 1], mask=~kept),
    })


def curate(ds: ray.data.Dataset, cfg: CurateConfig | None = None,
           id_col: str = "doc_id", text_col: str = "text",
           num_partitions: int = 16) -> ray.data.Dataset:
    """Run the full recipe; returns (id_col, verdict, n_chars) per input
    document.  Dedup stage: md5-16 digest of the exact text, min-id
    keeper among gate-survivors only (a filtered doc never shadows a
    kept one — FineWeb semantics: dedup runs on the filtered corpus)."""
    cfg = cfg or CurateConfig()
    tune_context()

    gated = ds.map_batches(
        lambda t: _gate_table(t, cfg, id_col, text_col),
        batch_format="pyarrow").materialize()

    def _keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["verdict"], "kept"))
        return pa.table({
            "h64": t["h64"].cast(pa.uint64()),
            "hhi": t["hhi"].cast(pa.uint64()),
            "id": t[id_col],
        })

    survivors = gated.map_batches(_keys, batch_format="pyarrow")

    def _dedup(t: pa.Table) -> pa.Table:
        lo = t["h64"].to_numpy(zero_copy_only=False)
        hi = t["hhi"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hi, lo))
        sl, sh, si = lo[order], hi[order], ids[order]
        first = np.concatenate(
            [[True], (sl[1:] != sl[:-1]) | (sh[1:] != sh[:-1])])
        # group min = first id in each digest run; everyone else is a dup
        return pa.table({"id": pa.array(si[~first], t["id"].type)})

    dups = groupapply(survivors, "h64", _dedup,
                      num_partitions).materialize()
    # dup-id attach: broadcast below the same 20M bound the main
    # pipeline's label join uses; shuffle-join above it
    if dups.count() <= 20_000_000:
        dup_ids: list = []
        for b in dups.iter_batches(batch_format="pyarrow"):
            dup_ids.extend(b["id"].to_pylist())
        dup_arr = pa.array(sorted(dup_ids),
                           gated.schema().base_schema.field(id_col).type)

        def _final(t: pa.Table) -> pa.Table:
            isdup = pc.is_in(t[id_col], value_set=dup_arr)
            verdict = pc.if_else(
                pc.and_(pc.equal(t["verdict"], "kept"), isdup),
                pa.scalar("dup"), t["verdict"])
            return pa.table({
                id_col: t[id_col],
                "verdict": verdict,
                "n_chars": t["n_chars"],
            })

        return gated.map_batches(_final, batch_format="pyarrow")
    # join path: shuffle-join the dup ids back (no driver materialize)
    dup_ds = dups.map_batches(
        lambda t: t.rename_columns([id_col]).append_column(
            "_isdup", pa.array(np.ones(t.num_rows, dtype=bool))),
        batch_format="pyarrow")
    joined = gated.drop_columns(["h64", "hhi"]).join(
        dup_ds, join_type="left_outer", num_partitions=num_partitions,
        on=(id_col,))

    def _final_join(t: pa.Table) -> pa.Table:
        isdup = pc.fill_null(t["_isdup"], False)
        verdict = pc.if_else(
            pc.and_(pc.equal(t["verdict"], "kept"), isdup),
            pa.scalar("dup"), t["verdict"])
        return pa.table({
            id_col: t[id_col],
            "verdict": verdict,
            "n_chars": t["n_chars"],
        })

    return joined.map_batches(_final_join, batch_format="pyarrow")


def curation_report(ds: ray.data.Dataset, cfg: CurateConfig | None = None,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Per-verdict funnel: docs and chars per gate (the numbers a
    pipeline owner actually reads).  Combiner-before-groupby: each block
    reduces to <= len(GATES) rows before the exchange."""
    out = curate(ds, cfg, id_col=id_col, text_col=text_col)

    def _combine(t: pa.Table) -> pa.Table:
        v = t["verdict"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(v, return_inverse=True)
        return pa.table({
            "verdict": pa.array(keys.tolist(), pa.string()),
            "docs": pa.array(np.bincount(inv), pa.int64()),
            "chars": pa.array(
                np.bincount(inv, weights=nc.astype(np.float64))
                .astype(np.int64), pa.int64()),
        })

    part = out.map_batches(_combine, batch_format="pyarrow")
    return part.groupby("verdict").sum(["docs", "chars"]) \
        .rename_columns({"sum(docs)": "docs", "sum(chars)": "chars"})
