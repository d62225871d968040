"""Text-analysis operators over the documents table (SURVEY.md "beyond
the reference" scope): token counting, per-document quality stats,
corpus token frequencies, language-ID heuristic, winnowing doc
fingerprints.  All per-batch work is pyarrow.compute kernels or numpy —
no per-row Python in the hot paths (token counting / stats use
``pc.count_substring_regex``, fully vectorized).

Column-name discipline: every computed column is named identically to
its SQL-oracle alias (driver hash-compare requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def token_count(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """(id, n_tokens) — tokens are \\S+ runs, matching
    ``regexp_extract_all(text,'\\S+')`` in the oracle."""

    def _f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], pattern=r"\S+").cast(pa.int64())
        return pa.table({id_col: t[id_col], "n_tokens": n})

    return ds.map_batches(_f, batch_format="pyarrow")


def doc_stats(ds: ray.data.Dataset, id_col: str = "doc_id",
              text_col: str = "text") -> ray.data.Dataset:
    """Quality-scoring inputs: char/token/alpha/digit/space counts."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        return pa.table({
            id_col: t[id_col],
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(txt, pattern=r"\S+").cast(pa.int64()),
            "n_alpha": pc.count_substring_regex(txt, pattern=r"[A-Za-z]").cast(pa.int64()),
            "n_digits": pc.count_substring_regex(txt, pattern=r"[0-9]").cast(pa.int64()),
            "n_spaces": pc.count_substring_regex(txt, pattern=r" ").cast(pa.int64()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def top_tokens(ds: ray.data.Dataset, k: int = 50,
               text_col: str = "text") -> ray.data.Dataset:
    """Corpus token frequencies, top-k by (count desc, token asc).

    Pre-aggregates inside map_batches (per-batch Counter over the token
    explosion) before the small groupby — the shuffle moves one row per
    distinct token per batch, not one per token occurrence."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[text_col], pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    partial = ds.map_batches(_f, batch_format="pyarrow")
    total = partial.groupby("token").sum("cnt")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["token", "cnt"])

    return total.map_batches(_rename, batch_format="pyarrow") \
                .sort(["cnt", "token"], descending=[True, False]).limit(k)


def token_doc_freq(ds: ray.data.Dataset, k: int = 25,
                   text_col: str = "text") -> ray.data.Dataset:
    """Top-k tokens by DOCUMENT frequency (the count-distinct aggregate:
    how many docs contain the token at least once — the vocabulary /
    stopword-discovery stat, distinct from top_tokens' occurrence
    counts).  Per-batch the (doc, token) pairs are deduped vectorized
    (dictionary codes + one lexsort) before counting, so the shuffle
    carries one row per distinct token per batch — exact count-distinct
    works because a doc's rows never span batches."""

    def _partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        toks = pc.split_pattern_regex(txt, pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
            else flat
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep]
        d = pc.dictionary_encode(flat.filter(pa.array(keep)))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (doc, token) pairs, then df per token code
        if len(codes):
            order = np.lexsort((parent, codes))
            cs, ps = codes[order], parent[order]
            first = np.concatenate([[True], (cs[1:] != cs[:-1])
                                    | (ps[1:] != ps[:-1])])
            df = np.bincount(cs[first], minlength=len(d.dictionary))
        else:
            df = np.zeros(len(d.dictionary), dtype=np.int64)
        return pa.table({"token": d.dictionary,
                         "df": pa.array(df.astype(np.int64), pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("token").sum("df")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["token", "df"])

    return agg.map_batches(_rename, batch_format="pyarrow") \
              .sort(["df", "token"], descending=[True, False]).limit(k)


def lang_group_stats(ds: ray.data.Dataset, lang_col: str = "lang",
                     chars_col: str = "n_chars") -> ray.data.Dataset:
    """groupby(lang): n_docs, total/min/max chars (A2 stats analogue)."""
    agg = ds.groupby(lang_col).aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum(chars_col),
        ray.data.aggregate.Min(chars_col),
        ray.data.aggregate.Max(chars_col),
    )

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([lang_col, "n_docs", "total_chars",
                                 "min_chars", "max_chars"])

    return agg.map_batches(_rename, batch_format="pyarrow").sort(lang_col)


# ---------------------------------------------------------------------------
# language-ID heuristic (stopword voting; deterministic, dependency-free)
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "on", "with", "as", "at", "by", "this", "are", "be", "or", "an"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "im", "des", "dem", "zu", "für", "auch"},
    "fr": {"le", "la", "les", "et", "des", "est", "dans", "pour", "que",
           "une", "un", "du", "au", "avec", "sur", "pas", "par", "il"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "en", "que", "un",
           "una", "con", "por", "para", "del", "se", "no", "al"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "op", "te", "met",
           "voor", "niet", "aan", "er", "ook", "maar", "bij", "uit"},
}


class LangIdModel:
    """map_batches actor: stopword tables built once per actor; adds
    ``lang_pred`` (ISO code or 'unknown' below min_ratio)."""

    def __init__(self, text_col: str = "text", min_ratio: float = 0.05) -> None:
        self.text_col = text_col
        self.min_ratio = min_ratio
        self.tables = sorted(_STOPWORDS.items())  # deterministic tie order
        # arrow value-set per language, built once per actor
        self._value_sets = [(lang, pa.array(sorted(words)))
                            for lang, words in self.tables]

    def predict(self, text: str | None) -> str:
        """Single-doc reference implementation (kept for tests; the batch
        path below is the vectorized equivalent)."""
        if not text:
            return "unknown"
        toks = text.lower().split()
        if not toks:
            return "unknown"
        best, best_score = "unknown", self.min_ratio
        for lang, words in self.tables:
            score = sum(1 for w in toks if w in words) / len(toks)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, t: pa.Table) -> pa.Table:
        """Vectorized batch scoring: one regex split + one pc.is_in per
        language + bincount segment sums — no per-row Python.  Exactly
        matches predict(): denominator counts non-empty tokens, ties win
        for the alphabetically-first language, score must EXCEED
        min_ratio."""
        n = t.num_rows
        if n == 0:
            return t.append_column("lang_pred", pa.array([], pa.string()))
        txt = pc.fill_null(t[self.text_col], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(txt), pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).combine_chunks()
        parent = np.repeat(np.arange(n), nper)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        denom = np.bincount(parent, weights=nonempty, minlength=n)
        ratio = np.zeros((len(self.tables), n))
        safe = np.maximum(denom, 1.0)
        for li, (_, vs) in enumerate(self._value_sets):
            hit = pc.is_in(flat, value_set=vs).to_numpy(
                zero_copy_only=False).astype(np.float64)
            ratio[li] = np.bincount(parent, weights=hit, minlength=n) / safe
        best = ratio.argmax(axis=0)          # first max = alpha-first lang
        mx = ratio.max(axis=0) if len(ratio) else np.zeros(n)
        langs = np.array([l for l, _ in self.tables], dtype=object)
        pred = np.where(mx > self.min_ratio, langs[best], "unknown")
        return t.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


def lang_id(ds: ray.data.Dataset, id_col: str = "doc_id",
            text_col: str = "text") -> ray.data.Dataset:
    out = ds.map_batches(LangIdModel, fn_constructor_kwargs={"text_col": text_col},
                         batch_format="pyarrow", concurrency=(1, 8))
    return out.select_columns([id_col, "lang_pred"])


#: Stopword list for the quality heuristic (EN head — the scoring is a
#: ratio feature, not language detection; see _STOPWORDS for lang-ID).
_QUALITY_STOPWORDS = sorted(_STOPWORDS["en"])


def quality_score(ds: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> ray.data.Dataset:
    """Per-document quality features for training-data filtering
    (Gopher/C4-style heuristics over counts): alpha ratio, digit ratio,
    stopword ratio, mean token length — all fully vectorized (arrow
    regex-count kernels + one pc.is_in) and emitted as floor-scaled e6
    integers so the SQL oracle hashes bit-identically.

    A doc with zero chars/tokens scores 0 in the affected ratios (not
    null) — degenerate docs should rank as lowest quality, not drop out
    of the filter."""
    return ds.map_batches(
        lambda t: quality_table(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow")


def quality_table(t: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Batch kernel for quality_score (table-level for Ray-free tests
    and for composition into the curation recipe)."""
    sw = pa.array(_QUALITY_STOPWORDS)
    txt = pc.fill_null(t[text_col], "")
    n = t.num_rows
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    n_alpha = pc.count_substring_regex(txt, pattern=r"[A-Za-z]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_digit = pc.count_substring_regex(txt, pattern=r"[0-9]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    toks = pc.split_pattern_regex(pc.utf8_lower(txt), pattern=r"\s+")
    nper = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).combine_chunks()
    parent = np.repeat(np.arange(n), nper)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    n_tokens = np.bincount(parent, weights=nonempty.astype(np.float64),
                           minlength=n)
    tok_chars = np.bincount(parent, weights=tok_len * nonempty,
                            minlength=n)
    is_sw = pc.is_in(flat, value_set=sw).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(parent, weights=(is_sw & nonempty)
                         .astype(np.float64), minlength=n)
    safe_c = np.maximum(n_chars, 1.0)
    safe_t = np.maximum(n_tokens, 1.0)

    def e6(x: np.ndarray) -> pa.Array:
        return pa.array(np.floor(x * 1e6).astype(np.int64), pa.int64())

    return pa.table({
        id_col: t[id_col],
        "alpha_ratio_e6": e6(n_alpha / safe_c),
        "digit_ratio_e6": e6(n_digit / safe_c),
        "stopword_ratio_e6": e6(n_stop / safe_t),
        "mean_token_len_e6": e6(tok_chars / safe_t),
    })


def top_docs_per_group(ds: ray.data.Dataset, group_col: str = "lang",
                       id_col: str = "doc_id", rank_col: str = "n_chars",
                       k: int = 5) -> ray.data.Dataset:
    """Top-k rows per group by (rank_col desc, id asc) — the per-group
    selection every curation pipeline needs (longest docs per language
    here).  Per-batch partial top-k prune BEFORE the groupby shuffle:
    only k rows per (batch, group) ever enter the exchange, so the
    shuffle is O(batches * groups * k), never the corpus."""

    def _prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                            (rank_col, "descending"),
                                            (id_col, "ascending")])
        t2 = t.take(idx).select([group_col, id_col, rank_col])
        g = t2[group_col].to_numpy(zero_copy_only=False)
        # first k of each group run
        brk = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1,
                              [len(g)]])
        keep = np.concatenate([np.arange(s, min(s + k, e))
                               for s, e in zip(brk[:-1], brk[1:])]) \
            if len(g) else np.zeros(0, dtype=np.int64)
        return t2.take(pa.array(keep))

    def _final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(rank_col, "descending"),
                                            (id_col, "ascending")])
        return t.take(idx[:k])

    return ds.map_batches(_prune, batch_format="pyarrow") \
             .groupby(group_col).map_groups(_final, batch_format="pyarrow") \
             .sort([group_col, rank_col, id_col],
                   descending=[False, True, False])


def hash_split(ds: ray.data.Dataset, id_col: str = "doc_id",
               train_pct: int = 90) -> ray.data.Dataset:
    """Deterministic train/val assignment by content-independent id hash
    (the split every training pipeline needs): md5 of the decimal id
    string, first two hex chars compared against the percentile
    boundary — stable across runs, partitionings and engines (DuckDB's
    md5() produces the identical hex, so the split is oracle-checkable).
    train_pct must be a multiple of 100/256 granularity; the boundary is
    floor(256 * train_pct / 100) in byte space."""
    import hashlib
    bound = format(256 * train_pct // 100, "02x")

    def _f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        split = ["train" if hashlib.md5(str(i).encode()).hexdigest()[:2] < bound
                 else "val" for i in ids]
        return pa.table({id_col: t[id_col],
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(_f, batch_format="pyarrow")


#: (label, numerator, denominator) — quantiles as exact rationals so the
#: selected index is integer arithmetic, matching DuckDB quantile_disc
#: (idx = ceil(q*n) - 1, clamped at 0) with no float drift.
QUANTILES = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
             ("p90", 9, 10), ("p99", 99, 100))


def exact_quantiles(ds: ray.data.Dataset, value_col: str,
                    qs=QUANTILES) -> pa.Table:
    """EXACT distributed order statistics over an integer-valued column
    (doc/token length distributions — the corpus profile every curation
    run reports).  One row: (n_docs, min/max, one column per quantile).

    Scale shape: per-batch value_counts combine -> groupby(value).sum —
    the shuffle carries one row per DISTINCT value per batch, never the
    corpus.  The cumulative scan runs on the aggregated distinct-value
    table (small for counts-like columns; a continuous column needs a
    sketch instead — out of scope here, documented).  Discrete-quantile
    rule matches DuckDB quantile_disc: value at index ceil(q*n)-1 of the
    sorted multiset, computed in integer arithmetic."""

    def _partial(t: pa.Table) -> pa.Table:
        col = t[value_col].combine_chunks().drop_null().cast(pa.int64())
        vc = col.value_counts()
        return pa.table({"value": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("value").sum("cnt")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["value", "cnt"])

    small = agg.map_batches(_rename, batch_format="pyarrow").sort("value")
    vals_l, cnts_l = [], []
    for b in small.iter_batches(batch_format="pyarrow"):
        vals_l.append(b["value"].to_numpy(zero_copy_only=False))
        cnts_l.append(b["cnt"].to_numpy(zero_copy_only=False))
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0, np.int64)
    cnts = np.concatenate(cnts_l) if cnts_l else np.zeros(0, np.int64)
    n = int(cnts.sum())
    cum = np.cumsum(cnts)
    out = {"n_docs": pa.array([n], pa.int64()),
           "min_value": pa.array([int(vals[0]) if n else 0], pa.int64()),
           "max_value": pa.array([int(vals[-1]) if n else 0], pa.int64())}
    for label, num, den in qs:
        if n == 0:
            out[label] = pa.array([0], pa.int64())
            continue
        idx = max((num * n + den - 1) // den - 1, 0)
        pos = int(np.searchsorted(cum, idx, side="right"))
        out[label] = pa.array([int(vals[pos])], pa.int64())
    return pa.table(out)


def approx_quantiles(ds: ray.data.Dataset, value_col: str,
                     qs=QUANTILES, k: int = 4096,
                     id_col: str = "doc_id") -> pa.Table:
    """APPROXIMATE order statistics via a deterministic bottom-k uniform
    sample — the sketch companion to ``exact_quantiles`` for CONTINUOUS
    or high-cardinality columns, where the exact path's distinct-value
    table is itself corpus-sized (exact_quantiles documents that
    boundary; this is the op it defers to).

    Sample rule: keep the k rows with the smallest md5(id) (the
    quota_sample / weighted_sample priority — content-independent,
    engine-reproducible, blocking-insensitive), then apply the same
    DuckDB quantile_disc rule to the sampled values.  A bottom-k hash
    sample is a uniform sample without replacement, so the rank error
    of the q-quantile concentrates as ~sqrt(q(1-q)/k) (Hoeffding /
    binomial tail; ~1.6 % at q=0.5, k=1024) — the self-check driver row
    records the realized rank error against a 4-sigma bound.

    Scale shape: each batch prunes to its k smallest priorities (one
    argpartition), so the driver collect is <= k rows per BLOCK and the
    final reduce is one argpartition over <= k*P rows; no shuffle at
    all.  Output row: (n_docs=n_sampled, min/max of sample, one column
    per quantile) — same layout as exact_quantiles.  Requires unique
    ids (the determinism precondition every md5-priority op shares)."""
    import hashlib

    def _partial(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_null(t[value_col]))
        t = t.filter(keep)
        ids = t[id_col].to_pylist()
        prio = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                            "big") for i in ids),
            dtype=np.uint64, count=len(ids))
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(prio) > k:
            sel = np.argpartition(prio, k)[:k]
            prio, vals = prio[sel], vals[sel]
        return pa.table({"prio": pa.array(prio, pa.uint64()),
                         "value": pa.array(vals, pa.int64())})

    prio_l, vals_l = [], []
    for b in ds.map_batches(_partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        prio_l.append(b["prio"].to_numpy(zero_copy_only=False))
        vals_l.append(b["value"].to_numpy(zero_copy_only=False))
    prio = np.concatenate(prio_l) if prio_l else np.zeros(0, np.uint64)
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0, np.int64)
    if len(prio) > k:
        sel = np.argpartition(prio, k)[:k]
        prio, vals = prio[sel], vals[sel]
    vals = np.sort(vals)
    n = len(vals)
    out = {"n_docs": pa.array([n], pa.int64()),
           "min_value": pa.array([int(vals[0]) if n else 0], pa.int64()),
           "max_value": pa.array([int(vals[-1]) if n else 0], pa.int64())}
    for label, num, den in qs:
        if n == 0:
            out[label] = pa.array([0], pa.int64())
            continue
        idx = max((num * n + den - 1) // den - 1, 0)
        out[label] = pa.array([int(vals[idx])], pa.int64())
    return pa.table(out)


def quota_sample(ds: ray.data.Dataset, group_col: str = "lang",
                 id_col: str = "doc_id", k: int = 30,
                 carry_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Deterministic per-group downsampling to a fixed quota — the data
    MIXING primitive (cap each source/language at k docs): within each
    group, keep the k docs with the smallest md5(id) — a uniform,
    content-independent, engine-reproducible choice (DuckDB's md5 ranks
    identically, so the pick is oracle-checkable).

    Same shuffle discipline as top_docs_per_group: per-batch prune to k
    rows per (batch, group) BEFORE the exchange, so the shuffle carries
    O(batches * groups * k) rows, never the corpus."""
    import hashlib

    def _rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = pa.array([hashlib.md5(str(i).encode()).hexdigest()
                      for i in ids], pa.string())
        cols = {group_col: t[group_col], id_col: t[id_col], "h": h}
        for c in carry_cols:
            cols[c] = t[c]
        return pa.table(cols)

    def _prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                            ("h", "ascending"),
                                            (id_col, "ascending")])
        t2 = t.take(idx)
        g = t2[group_col].to_numpy(zero_copy_only=False)
        brk = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1,
                              [len(g)]])
        keep = np.concatenate([np.arange(s, min(s + k, e))
                               for s, e in zip(brk[:-1], brk[1:])]) \
            if len(g) else np.zeros(0, dtype=np.int64)
        return t2.take(pa.array(keep))

    def _final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("h", "ascending"),
                                            (id_col, "ascending")])
        return t.take(idx[:k]).drop_columns(["h"])

    ranked = ds.map_batches(_rank, batch_format="pyarrow") \
               .map_batches(_prune, batch_format="pyarrow")
    return ranked.groupby(group_col).map_groups(
        _final, batch_format="pyarrow").sort([group_col, id_col])


def _group_dup_stats(parent: np.ndarray, keys: np.ndarray,
                     nrows: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-parent (total, max-multiplicity, duplicated-occurrence) counts
    over (parent, key) items — one lexsort + run-length pass, no hashing
    and no per-row Python (overflow-safe for any key range)."""
    tot = np.bincount(parent, minlength=nrows).astype(np.int64)
    mx = np.zeros(nrows, dtype=np.int64)
    dup = np.zeros(nrows, dtype=np.int64)
    if len(parent):
        order = np.lexsort((keys, parent))
        gp, gk = parent[order], keys[order]
        change = (gp[1:] != gp[:-1]) | (gk[1:] != gk[:-1])
        starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(gp)]])
        counts = np.diff(starts).astype(np.int64)
        run_parent = gp[starts[:-1]]
        np.maximum.at(mx, run_parent, counts)
        dup = np.bincount(run_parent, weights=counts * (counts > 1),
                          minlength=nrows).astype(np.int64)
    return tot, mx, dup


def repetition_stats_table(t: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text") -> pa.Table:
    """Batch kernel for repetition_stats (table-level for Ray-free
    tests).  Fractions are occurrence fractions (occurrences belonging
    to a repeated line / 2-gram over total occurrences) emitted as
    floor-e6 integers via pure int arithmetic — bit-identical to the
    SQL oracle's ``x * 1000000 // greatest(tot, 1)``."""
    txt = pc.fill_null(t[text_col], "")
    nrows = t.num_rows

    def e6_frac(x: np.ndarray, tot: np.ndarray) -> pa.Array:
        return pa.array(x * 1_000_000 // np.maximum(tot, 1), pa.int64())

    # --- duplicate-line stats (every split segment is a line, empties
    # included — matches string_split(t, chr(10)) in the oracle)
    lines = pc.split_pattern(txt, pattern="\n")
    lper = pc.list_value_length(lines).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lparent = np.repeat(np.arange(nrows), lper)
    lflat = pc.list_flatten(lines).combine_chunks()
    lcodes = pc.dictionary_encode(lflat).indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    ltot, _, ldup = _group_dup_stats(lparent, lcodes, nrows)

    # --- 2-gram stats over non-empty \s+ tokens
    toks = pc.split_pattern_regex(txt, pattern=r"\s+")
    nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    parent = np.repeat(np.arange(nrows), nper)
    flat = pc.list_flatten(toks).combine_chunks()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = parent[keep]
    codes = pc.dictionary_encode(flat.filter(pa.array(keep))) \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(codes)
    adj = parent[1:] == parent[:-1] if k else np.zeros(0, dtype=bool)
    ncodes = int(codes.max()) + 1 if k else 1
    gram = (codes[:-1] * ncodes + codes[1:])[adj] if k else codes
    gparent = parent[:-1][adj] if k else parent
    gtot, gmx, gdup = _group_dup_stats(gparent, gram, nrows)

    return pa.table({
        id_col: t[id_col],
        "n_lines": pa.array(ltot, pa.int64()),
        "dup_line_frac_e6": e6_frac(ldup, ltot),
        "n_2grams": pa.array(gtot, pa.int64()),
        "top_2gram_frac_e6": e6_frac(gmx, gtot),
        "dup_2gram_frac_e6": e6_frac(gdup, gtot),
    })


def repetition_stats(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """Gopher-style repetition features for quality filtering (duplicate
    line fraction, duplicate / most-common 2-gram occurrence fractions)
    — vectorized: dictionary-encode + one lexsort per batch, no per-row
    Python.  (Gopher's char-weighted variants differ slightly; the
    occurrence-fraction definition here is exactly SQL-checkable.)"""
    return ds.map_batches(
        lambda t: repetition_stats_table(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow")


#: PII scrub patterns, applied IN ORDER over the evolving text (each
#: count is taken on the text as the previous stage left it — the SQL
#: oracle chains the same way).  RE2 on both sides: arrow
#: count_substring_regex / replace_substring_regex vs DuckDB
#: regexp_extract_all / regexp_replace(…,'g') agree match-for-match.
PII_PATTERNS = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phones", r"\+\d[\d -]{7,}\d", "<PHONE>"),
    ("n_numbers", r"\d{9,}", "<NUM>"),
)


def scrub_pii_table(t: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Batch kernel for scrub_pii (kept table-level for Ray-free tests):
    redacts emails / international phone numbers / long digit runs and
    counts each category — all arrow re2 kernels, no per-row Python."""
    txt = pc.fill_null(t[text_col], "")
    out: dict = {id_col: t[id_col]}
    for name, pat, rep in PII_PATTERNS:
        out[name] = pc.count_substring_regex(txt, pattern=pat).cast(pa.int64())
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=rep)
    out["text_scrubbed"] = txt
    return pa.table(out)


def scrub_pii(ds: ray.data.Dataset, id_col: str = "doc_id",
              text_col: str = "text") -> ray.data.Dataset:
    """PII redaction — the scrub every published training corpus needs.
    Emits per-doc redaction counts plus the scrubbed text itself, so the
    transformation is verifiable byte-for-byte (the SQL oracle replays
    the same chained regexp_replace)."""
    return ds.map_batches(
        lambda t: scrub_pii_table(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow")


def doc_fingerprints(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", g: int = 50,
                     w: int = 100) -> ray.data.Dataset:
    """Rolling-hash document fingerprint: number of winnowed anchors and
    their XOR — a compact content fingerprint per doc."""
    from .winnow import winnow

    def _f(t: pa.Table) -> pa.Table:
        fps, counts = [], []
        for txt in t[text_col].to_pylist():
            if not txt:
                fps.append(0); counts.append(0)
                continue
            a = winnow(txt, g, w)
            counts.append(len(a))
            fps.append(int(np.bitwise_xor.reduce(a)) if len(a) else 0)
        return pa.table({id_col: t[id_col],
                         "n_anchors": pa.array(counts, pa.int64()),
                         "fingerprint": pa.array(fps, pa.uint64())})

    return ds.map_batches(_f, batch_format="pyarrow")


def corpus_shuffle(ds: ray.data.Dataset, id_col: str = "doc_id",
                   carry_cols: tuple[str, ...] = (),
                   num_partitions: int = 32) -> ray.data.Dataset:
    """Deterministic global training-order shuffle: every row gets
    ``shuffle_rank`` = its 0-based position under the pseudo-random
    total order (md5(id) hex, id) — the content-independent permutation
    a training run reads the corpus in, reproducible across engines
    (DuckDB's row_number over the same md5 order matches exactly).

    Scale shape — NO global sort: md5 is uniform, so the first hex byte
    buckets the corpus into 256 balanced ranges; a combiner counts rows
    per (batch, bucket), the driver cumsums the tiny 256-row table into
    bucket offsets, and one groupapply per bucket assigns
    rank = bucket_offset + local (h, id) sort index.  The shuffle
    carries only (id, 32-byte hex, carry_cols); at any parallelism the
    ranks are a permutation of [0, n)."""
    import hashlib
    from .dist import groupapply

    def _hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hx = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        bucket = np.array([int(h[:2], 16) for h in hx], dtype=np.uint64)
        cols = {id_col: t[id_col], "h": pa.array(hx, pa.string()),
                "bucket": pa.array(bucket, pa.uint64())}
        for c in carry_cols:
            cols[c] = t[c]
        return pa.table(cols)

    hashed = ds.map_batches(_hash, batch_format="pyarrow")

    def _counts(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    totals = hashed.map_batches(_counts, batch_format="pyarrow") \
                   .groupby("bucket").sum("c").sort("bucket")
    bk_l, c_l = [], []
    for b in totals.iter_batches(batch_format="pyarrow"):
        bk_l.append(b["bucket"].to_numpy(zero_copy_only=False))
        c_l.append(b["sum(c)"].to_numpy(zero_copy_only=False))
    bks = np.concatenate(bk_l).astype(np.int64) if bk_l else \
        np.zeros(0, np.int64)
    cnts = np.concatenate(c_l).astype(np.int64) if c_l else \
        np.zeros(0, np.int64)
    offs = np.concatenate([[0], np.cumsum(cnts)[:-1]]) if len(cnts) \
        else cnts
    bcast = ray.put((bks, offs))

    def _rank(t: pa.Table) -> pa.Table:
        bks_b, offs_b = ray.get(bcast)
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "shuffle_rank": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("bucket", "ascending"),
                                            ("h", "ascending"),
                                            (id_col, "ascending")])
        t2 = t.take(idx)
        b = t2["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        brk = np.concatenate([[0], np.flatnonzero(b[1:] != b[:-1]) + 1,
                              [n]])
        rank = np.empty(n, dtype=np.int64)
        for s, e in zip(brk[:-1], brk[1:]):
            off = offs_b[np.searchsorted(bks_b, b[s])]
            rank[s:e] = off + np.arange(e - s)
        out = {id_col: t2[id_col],
               "shuffle_rank": pa.array(rank, pa.int64())}
        for c in t2.column_names:
            if c not in (id_col, "h", "bucket"):
                out[c] = t2[c]
        return pa.table(out)

    return groupapply(hashed, "bucket", _rank, num_partitions) \
        .sort(id_col)


def temperature_sample(ds: ray.data.Dataset, budget: int,
                       group_col: str = "lang", id_col: str = "doc_id",
                       num_partitions: int = 32) -> ray.data.Dataset:
    """Square-root temperature mixing (the multilingual-corpus rebalance
    of Raffel et al. 2020 / Conneau & Lample 2019, at alpha = 0.5):
    group g gets a target share proportional to sqrt(n_g), so
    low-resource groups are upweighted relative to their raw share.
    Each group is then downsampled deterministically to
    m_g = floor(budget * sqrt(n_g) / sum_h sqrt(n_h)) capped at n_g,
    accepting the docs whose md5(id) uint32 prefix clears the group's
    integer cutoff — content-independent and engine-reproducible.

    Exactness discipline: the only float math is sqrt (correctly
    rounded IEEE in both numpy and DuckDB) and one mul/div chain in a
    fixed order; the accept test itself is an integer compare of
    md5-prefix * 2^32 against cutoff ranks, realized as "the m_g
    smallest (md5, id) keys per group" so ties and boundaries are
    unambiguous.  Scale shape = quota_sample's: per-batch prune to the
    group quota BEFORE the exchange, so the shuffle carries
    O(batches * groups * m_g) rows — except m_g here is data-derived
    (one tiny count groupby) instead of a constant."""
    import hashlib

    counts = {}
    for b in ds.groupby(group_col).count().iter_batches(
            batch_format="pyarrow"):
        for g_, c_ in zip(b[group_col].to_pylist(),
                          b["count()"].to_pylist()):
            counts[g_] = int(c_)
    groups = sorted(counts)
    denom = float(np.sum([np.sqrt(float(counts[g_])) for g_ in groups]))
    quota = {g_: min(counts[g_],
                     int(np.floor(budget * np.sqrt(float(counts[g_]))
                                  / denom)))
             for g_ in groups}

    def _rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = pa.array([hashlib.md5(str(i).encode()).hexdigest()
                      for i in ids], pa.string())
        return pa.table({group_col: t[group_col], id_col: t[id_col],
                         "h": h})

    def _prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                            ("h", "ascending"),
                                            (id_col, "ascending")])
        t2 = t.take(idx)
        g = t2[group_col].to_numpy(zero_copy_only=False)
        brk = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1,
                              [len(g)]])
        keep = np.concatenate(
            [np.arange(s, min(s + quota.get(g[s], 0), e))
             for s, e in zip(brk[:-1], brk[1:])]) \
            if len(g) else np.zeros(0, dtype=np.int64)
        return t2.take(pa.array(keep))

    def _final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("h", "ascending"),
                                            (id_col, "ascending")])
        k = quota.get(t[group_col][0].as_py(), 0) if t.num_rows else 0
        return t.take(idx[:k]).drop_columns(["h"])

    ranked = ds.select_columns([group_col, id_col]) \
               .map_batches(_rank, batch_format="pyarrow") \
               .map_batches(_prune, batch_format="pyarrow")
    return ranked.groupby(group_col).map_groups(
        _final, batch_format="pyarrow").sort([group_col, id_col])


# ---------------------------------------------------------------------------
# paragraph-granularity boilerplate classification (jusText-style tier)
# ---------------------------------------------------------------------------

def paragraph_quality(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", sep: str = "\n\n",
                      short_chars: int = 40,
                      stop_density_denom: int = 4) -> ray.data.Dataset:
    """Per-document paragraph-class counts — the jusText-style
    boilerplate tier (Pomikalek 2011) between line dedup and document
    filtering: each ``sep``-separated paragraph is classified

    * ``short``        — fewer than ``short_chars`` codepoints,
    * ``boilerplate``  — stopword count * ``stop_density_denom`` <
      token count (low function-word density = navigation / banner /
      footer matter), else
    * ``good``.

    Output: (id, n_paras, n_short, n_boiler, n_good, good_chars) where
    good_chars is the total codepoint length of good paragraphs — the
    quantity a cleaning pass would keep.  All-integer arithmetic so the
    DuckDB oracle hashes bit-identically.

    Scale shape: ONE map_batches, no shuffle — a doc's paragraphs never
    leave its batch, so per-doc aggregation is batch-local (same
    contract as doc_line_dedup).  Everything is arrow/numpy vectorized:
    one split per level + is_in + three bincounts."""
    sw = pa.array(_QUALITY_STOPWORDS)

    def _f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        txt = pc.fill_null(t[text_col], "")
        paras = pc.split_pattern(txt, pattern=sep)
        nper = pc.list_value_length(paras).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(paras)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
            else flat
        doc_of = np.repeat(np.arange(n), nper)
        m = len(flat)
        n_chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_tokens = pc.count_substring_regex(flat, pattern=r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(flat, pattern=r"\s+")
        tper = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tflat = pc.list_flatten(toks)
        tflat = tflat.combine_chunks() if isinstance(tflat, pa.ChunkedArray) \
            else tflat
        para_of = np.repeat(np.arange(m), tper)
        is_sw = (pc.is_in(tflat, value_set=sw)
                 .to_numpy(zero_copy_only=False)
                 & pc.not_equal(tflat, "").to_numpy(zero_copy_only=False))
        n_stop = np.bincount(para_of, weights=is_sw.astype(np.float64),
                             minlength=m).astype(np.int64)
        short = n_chars < short_chars
        boiler = ~short & (n_stop * stop_density_denom < n_tokens)
        good = ~short & ~boiler

        def per_doc(mask: np.ndarray, w: np.ndarray | None = None) -> pa.Array:
            wts = mask.astype(np.float64) if w is None else mask * w
            return pa.array(np.bincount(doc_of, weights=wts.astype(np.float64),
                                        minlength=n).astype(np.int64),
                            pa.int64())

        ones = np.ones(m, dtype=np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_paras": per_doc(ones.astype(bool)),
            "n_short": per_doc(short),
            "n_boiler": per_doc(boiler),
            "n_good": per_doc(good),
            "good_chars": per_doc(good, n_chars),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# unigram-LM surprisal (CCNet-style perplexity-bucket stand-in)
# ---------------------------------------------------------------------------

def unigram_surprisal(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text") -> ray.data.Dataset:
    """Per-document mean unigram surprisal — the CCNet-style (Wenzek et
    al. 2020) LM-quality signal with the n-gram LM reduced to the
    corpus' own unigram distribution: documents made of globally-common
    tokens score LOW (head boilerplate), rare-token documents score
    HIGH.

    Two phases:

    1. corpus token counts: per-batch ``value_counts`` partials →
       ``groupby(token).sum`` → collected to the driver.  The collect is
       VOCABULARY-bounded, not corpus-bounded (same bound as
       top_tokens' aggregate — web vocab is millions of rows where the
       corpus is billions of docs); per-token log-probs are quantized to
       integers once here, ``lp6 = floor(ln(c / total) * 1e6)``.
    2. one broadcast (``ray.put`` of the token→lp6 map, read once per
       task) + one vectorized map_batches: per-doc
       ``surprisal_e6 = (-sum lp6) // n_tokens`` — integer arithmetic
       end-to-end after the per-UNIQUE-token ln, so the DuckDB oracle
       (same floor-e6 quantization in SQL) hashes bit-identically.

    Output: (id, n_tokens, surprisal_e6); empty docs score 0."""
    import math

    def _counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    freq = ds.map_batches(_counts, batch_format="pyarrow") \
             .groupby("token").sum("cnt")
    # vocabulary-bounded driver collect (see docstring): one row per
    # distinct token, NOT per occurrence
    batches = list(freq.iter_batches(batch_format="pyarrow"))
    ftab = pa.concat_tables(batches) if batches else \
        pa.table({"token": pa.array([], pa.string()),
                  "sum(cnt)": pa.array([], pa.int64())})
    tokens = ftab["token"].to_pylist()
    counts = ftab["sum(cnt)"].to_numpy(zero_copy_only=False)
    total = int(counts.sum()) if len(counts) else 1
    # per-unique-token scalar math.log (glibc libm — the same ln DuckDB
    # calls), quantized once; everything after this is integer-exact
    lp6 = {tok: math.floor(math.log(int(c) / total) * 1e6)
           for tok, c in zip(tokens, counts)}
    ref = ray.put(lp6)

    def _score(t: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        n = t.num_rows
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
            else flat
        parent = np.repeat(np.arange(n), nper)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # bounded Python loop: one lookup per UNIQUE token in the batch
        uval = np.array([lut.get(u, 0) for u in d.dictionary.to_pylist()],
                        dtype=np.int64) if len(d.dictionary) else \
            np.zeros(0, dtype=np.int64)
        tok_lp = np.where(nonempty, uval[codes] if len(uval) else 0, 0)
        n_tok = np.bincount(parent, weights=nonempty.astype(np.float64),
                            minlength=n).astype(np.int64)
        s = np.bincount(parent, weights=tok_lp.astype(np.float64),
                        minlength=n).astype(np.int64)
        surp = np.where(n_tok > 0, (-s) // np.maximum(n_tok, 1), 0)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "surprisal_e6": pa.array(surp.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


def heavy_hitters(ds: ray.data.Dataset, capacity: int = 64,
                  text_col: str = "text") -> ray.data.Dataset:
    """Heavy hitters with EXACT counts via a bounded-state sketch pass:
    all tokens whose corpus frequency is strictly greater than
    n_total / capacity, with their exact counts, sorted
    (cnt desc, token asc).

    Two phases (the classic sketch-then-verify shape):

    1. candidate pass — per block, tokens with block frequency
       > block_total / capacity (the Misra-Gries guarantee specialized
       to pre-counted blocks: if a token's GLOBAL frequency exceeds
       n/capacity then by pigeonhole it exceeds the local threshold in
       at least one block, so the union of per-block survivors is a
       provable superset of the true heavy hitters).  Per-block state is
       bounded by capacity-1 rows no matter the vocabulary size — THIS
       is what replaces top_tokens' vocabulary-sized shuffle at web
       scale.  The driver collect is bounded by capacity * n_blocks
       rows (a second sketch tier would bound it further; documented).
    2. exact pass — broadcast the candidate set (``ray.put``, read once
       per task), count ONLY candidate tokens per batch, one small
       groupby, threshold ``cnt * capacity > n_total``.

    Because phase 2 is exact and phase 1 is a guaranteed superset, the
    output equals the exact SQL answer (HAVING cnt * capacity > n) and
    is deterministic regardless of blocking or merge order."""

    def _cands(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        cnts = vc.field("counts").cast(pa.int64())
        n_b = int(len(flat))
        keep = pc.greater(pc.multiply(cnts, pa.scalar(capacity, pa.int64())),
                          pa.scalar(n_b, pa.int64()))
        cand = vc.field("values").filter(keep)
        # sentinel row carries this block's token total ("" is never a
        # token: empty strings are filtered from the stream above)
        return pa.table({
            "token": pa.concat_arrays([cand.combine_chunks()
                                       if isinstance(cand, pa.ChunkedArray)
                                       else cand,
                                       pa.array([""], pa.string())]),
            "n_b": pa.array([0] * len(cand) + [n_b], pa.int64()),
        })

    # bounded driver collect: <= capacity rows per block (see docstring)
    cand_tokens: set[str] = set()
    n_total = 0
    for b in ds.map_batches(_cands, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for tok, nb in zip(b["token"].to_pylist(), b["n_b"].to_pylist()):
            if tok == "":
                n_total += nb
            else:
                cand_tokens.add(tok)
    _schema = pa.schema([("token", pa.string()), ("cnt", pa.int64())])
    if not cand_tokens:
        # no block produced a local heavy hitter -> provably no global
        # one; keep the declared schema (Ray drops columns on an empty
        # groupby result)
        return ray.data.from_arrow(_schema.empty_table())
    cand_arr = pa.array(sorted(cand_tokens), pa.string())
    ref = ray.put(cand_arr)

    def _exact(t: pa.Table) -> pa.Table:
        cands = ray.get(ref)
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.is_in(flat, value_set=cands))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(_exact, batch_format="pyarrow") \
            .groupby("token").sum("cnt")

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["token", "cnt"])
        keep = pc.greater(
            pc.multiply(t["cnt"], pa.scalar(capacity, pa.int64())),
            pa.scalar(n_total, pa.int64()))
        return t.filter(keep)

    return agg.map_batches(_final, batch_format="pyarrow") \
              .sort(["cnt", "token"], descending=[True, False])


def tfidf_top_terms(ds: ray.data.Dataset, k: int = 3,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Per-document top-k terms by TF-IDF (whitespace tokens, natural-log
    idf): output (id, token, tf, tfidf_e6) with
    ``tfidf_e6 = tf * floor(ln(n_docs / df) * 1e6)`` — idf quantized to
    an integer once per UNIQUE token (the unigram_surprisal float
    discipline), so scores are integer-exact and the DuckDB oracle
    hashes bit-identically.

    Scale shape: document frequencies come from token_doc_freq's
    dedupe-inside-the-batch partial (one shuffle, one row per distinct
    token per block); the df table is VOCABULARY-bounded and collected
    once on the driver (same bound as unigram_surprisal — web vocab is
    millions where the corpus is billions), then broadcast via
    ``ray.put``.  The per-doc top-k is one vectorized pass per batch
    (lexsort runs, no per-row Python), no doc-keyed shuffle at all —
    a doc's rows never span batches."""
    import math

    def _df_partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        toks = pc.split_pattern_regex(txt, pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
            else flat
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep]
        d = pc.dictionary_encode(flat.filter(pa.array(keep)))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(codes):
            order = np.lexsort((parent, codes))
            cs, ps = codes[order], parent[order]
            first = np.concatenate([[True], (cs[1:] != cs[:-1])
                                    | (ps[1:] != ps[:-1])])
            df = np.bincount(cs[first], minlength=len(d.dictionary))
        else:
            df = np.zeros(len(d.dictionary), dtype=np.int64)
        # sentinel "" row carries this block's DOC count (n_docs term)
        return pa.table({
            "token": pa.concat_arrays([
                d.dictionary.combine_chunks()
                if isinstance(d.dictionary, pa.ChunkedArray)
                else d.dictionary, pa.array([""], pa.string())]),
            "df": pa.array(list(df.astype(np.int64)) + [t.num_rows],
                           pa.int64()),
        })

    dftab_batches = list(ds.map_batches(_df_partial, batch_format="pyarrow")
                         .groupby("token").sum("df")
                         .iter_batches(batch_format="pyarrow"))
    dftab = pa.concat_tables(dftab_batches) if dftab_batches else \
        pa.table({"token": pa.array([], pa.string()),
                  "sum(df)": pa.array([], pa.int64())})
    toks = dftab["token"].to_pylist()
    dfs = dftab["sum(df)"].to_numpy(zero_copy_only=False)
    n_docs = 0
    for tok, d_ in zip(toks, dfs):
        if tok == "":
            n_docs = int(d_)
    idf6 = {tok: math.floor(math.log(n_docs / int(d_)) * 1e6)
            for tok, d_ in zip(toks, dfs) if tok != ""} if n_docs else {}
    ref = ray.put(idf6)

    def _topk(t: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        n = t.num_rows
        txt = pc.fill_null(t[text_col], "")
        tok_lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        nper = pc.list_value_length(tok_lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(tok_lists)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
            else flat
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), nper)[keep]
        d = pc.dictionary_encode(flat.filter(pa.array(keep)))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(d.dictionary.to_pylist(), dtype=object)
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "tfidf_e6": pa.array([], pa.int64()),
        })
        if not len(codes):
            return empty
        # (doc, token) run-length counts -> tf
        order = np.lexsort((codes, parent))
        cs, ps = codes[order], parent[order]
        first = np.concatenate([[True], (cs[1:] != cs[:-1])
                                | (ps[1:] != ps[:-1])])
        starts = np.flatnonzero(first)
        tf = np.diff(np.concatenate([starts, [len(cs)]])).astype(np.int64)
        run_doc, run_code = ps[starts], cs[starts]
        # bounded Python: one idf lookup per unique token in the batch
        uidf = np.array([lut.get(u, 0) for u in vocab], dtype=np.int64)
        score = tf * uidf[run_code]
        run_tok = vocab[run_code].astype("U")
        # rank within doc by (score desc, token asc); keep rank < k
        r_order = np.lexsort((run_tok, -score, run_doc))
        rd = run_doc[r_order]
        doc_first = np.concatenate([[True], rd[1:] != rd[:-1]])
        idx = np.arange(len(rd), dtype=np.int64)
        start_of_doc = np.maximum.accumulate(np.where(doc_first, idx, 0))
        rank = idx - start_of_doc
        sel = r_order[rank < k]
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[run_doc[sel]], pa.int64()),
            "token": pa.array(run_tok[sel].astype(object), pa.string()),
            "tf": pa.array(tf[sel], pa.int64()),
            "tfidf_e6": pa.array(score[sel], pa.int64()),
        })

    return ds.map_batches(_topk, batch_format="pyarrow") \
             .sort([id_col, "tfidf_e6", "token"],
                   descending=[False, True, False])


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct count (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (no float log2 —
    log2 loses integer precision above 2**53)."""
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        hi = v >> np.uint64(s)
        has = hi > 0
        bl += np.where(has, s, 0)
        v = np.where(has, hi, v)
    return bl + (v > 0)


def approx_distinct(ds: ray.data.Dataset, col: str,
                    precision: int = 12,
                    pre_split: bool = False) -> int:
    """HyperLogLog approximate distinct count over a string column — the
    sketch that replaces a vocabulary-sized ``unique`` shuffle with a
    fixed 2**precision-register table (16 KiB at p=12) when the corpus
    is too big to count exactly (distinct urls / tokens / shingles at
    100 TB).

    Scale shape: per batch, values are md5-hashed per UNIQUE value
    (dictionary-encode first — the same bounded-loop discipline as
    ``_TokenHasher``) and folded into a local register array via
    ``np.maximum.at``; each block emits at most 2**precision
    (register, rho) rows.  The one shuffle is
    ``groupby(register).max(rho)`` over those bounded partials, and the
    driver reduces the <= 2**precision final registers to the estimate.
    Register maxima are order- and blocking-insensitive, so the
    estimate is DETERMINISTIC for a given input set regardless of
    parallelism — tested.  Standard error ~= 1.04 / sqrt(2**precision)
    (~1.6 % at p=12); linear-counting correction applied below 2.5m.

    ``pre_split=True`` treats ``col`` as whitespace-separated text and
    counts distinct TOKENS instead of distinct rows."""
    import hashlib
    if not 4 <= precision <= 18:
        raise ValueError("precision must be in [4, 18]")
    p = precision
    m = 1 << p
    width = 64 - p  # bits hashed into the rho field

    def _partial(t: pa.Table) -> pa.Table:
        vals = t[col]
        if pre_split:
            toks = pc.split_pattern_regex(pc.fill_null(vals, ""),
                                          pattern=r"\s+")
            vals = pc.list_flatten(toks)
            vals = vals.filter(pc.not_equal(vals, ""))
        else:
            vals = vals.cast(pa.string()).drop_null()
        d = pc.dictionary_encode(
            vals.combine_chunks() if isinstance(vals, pa.ChunkedArray)
            else vals)
        uniq = d.dictionary.to_pylist()
        if not uniq:
            return pa.table({"register": pa.array([], pa.int32()),
                             "rho": pa.array([], pa.int64())})
        # bounded loop: one md5 per unique value in the batch
        h = np.array([int.from_bytes(
            hashlib.md5(u.encode("utf-8", "surrogatepass")).digest()[:8],
            "big") for u in uniq], dtype=np.uint64)
        idx = (h >> np.uint64(width)).astype(np.int64)
        w = h & np.uint64((1 << width) - 1)
        rho = np.where(w == 0, width + 1, width - _bit_length_u64(w) + 1)
        reg = np.zeros(m, np.int64)
        np.maximum.at(reg, idx, rho)
        nz = np.flatnonzero(reg)
        return pa.table({"register": pa.array(nz.astype(np.int32)),
                         "rho": pa.array(reg[nz], pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("register").max("rho")
    reg = np.zeros(m, np.int64)
    # bounded collect: <= 2**precision rows by construction
    for b in agg.iter_batches(batch_format="pyarrow"):
        reg[b["register"].to_numpy(zero_copy_only=False)] = \
            b["max(rho)"].to_numpy(zero_copy_only=False)
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else \
        {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -reg)))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting, small range
    return int(round(est))


def grouped_quantiles(ds: ray.data.Dataset, group_col: str,
                      value_col: str, qs=QUANTILES) -> pa.Table:
    """Per-group EXACT order statistics (per-language length profiles —
    the grouped form of ``exact_quantiles``).  One row per group:
    (group, n, min/max, one column per quantile).

    Scale shape: per-batch (group, value) value-count combine →
    ``groupby(group, value).sum`` — the shuffle carries one row per
    distinct (group, value) per batch, never the corpus.  The final
    scan runs on the aggregated distinct-(group, value) table (bounded
    by n_groups × distinct values; a continuous value column needs a
    sketch instead, as documented on exact_quantiles).  Quantile rule =
    DuckDB quantile_disc: index ceil(q*n)-1 in integer arithmetic."""

    def _partial(t: pa.Table) -> pa.Table:
        sub = pa.table({"g": t[group_col],
                        "value": t[value_col].cast(pa.int64())})
        g = sub.group_by(["g", "value"]).aggregate([("value", "count")])
        return g.rename_columns(["g", "value", "cnt"])

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby(["g", "value"]).sum("cnt")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["g", "value", "cnt"])

    small = agg.map_batches(_rename, batch_format="pyarrow") \
               .sort(["g", "value"])
    gs, vs, cs = [], [], []
    # bounded collect: one row per distinct (group, value) — see docstring
    for b in small.iter_batches(batch_format="pyarrow"):
        gs.append(b["g"].to_numpy(zero_copy_only=False))
        vs.append(b["value"].to_numpy(zero_copy_only=False))
        cs.append(b["cnt"].to_numpy(zero_copy_only=False))
    if not gs:
        cols = {group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "min_value": pa.array([], pa.int64()),
                "max_value": pa.array([], pa.int64())}
        for label, _, _ in qs:
            cols[label] = pa.array([], pa.int64())
        return pa.table(cols)
    g = np.concatenate(gs)
    v = np.concatenate(vs)
    c = np.concatenate(cs)
    brk = np.flatnonzero(g[1:] != g[:-1]) + 1
    starts = np.concatenate([[0], brk, [len(g)]]).astype(np.int64)
    out_g, out_n, out_min, out_max = [], [], [], []
    out_q = {label: [] for label, _, _ in qs}
    for s, e in zip(starts[:-1], starts[1:]):
        cnts = c[s:e]
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        out_g.append(g[s])
        out_n.append(n)
        out_min.append(int(v[s]))
        out_max.append(int(v[e - 1]))
        for label, num, den in qs:
            idx = max((num * n + den - 1) // den - 1, 0)
            pos = int(np.searchsorted(cum, idx, side="right"))
            out_q[label].append(int(v[s + pos]))
    cols = {group_col: pa.array(list(out_g)),
            "n": pa.array(out_n, pa.int64()),
            "min_value": pa.array(out_min, pa.int64()),
            "max_value": pa.array(out_max, pa.int64())}
    for label, _, _ in qs:
        cols[label] = pa.array(out_q[label], pa.int64())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Bigram-LM surprisal (CCNet-style quality signal, order-2 model)
# ---------------------------------------------------------------------------

#: bigram key separator — ASCII unit separator; tokens are produced by a
#: \s+ split so they can in principle contain it, in which case two
#: different bigrams could alias (documented limitation, matched by the
#: SQL oracle which uses the same chr(31) join).
_BG_SEP = "\x1f"


def _bigram_partials(t: pa.Table, text_col: str) -> pa.Table:
    """Per-batch (bigram, count) partials: whitespace-split, drop empty
    tokens, pair consecutive tokens WITHIN each doc (list_flatten
    preserves order, so consecutive flat entries with the same parent
    are consecutive tokens), value-count the joined keys."""
    toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                  pattern=r"\s+")
    nper = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
        else flat
    parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), nper)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    if len(parent) < 2:
        return pa.table({"bg": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    pair = parent[1:] == parent[:-1]
    w1 = flat.slice(0, len(flat) - 1).filter(pa.array(pair))
    w2 = flat.slice(1).filter(pa.array(pair))
    bg = pc.binary_join_element_wise(w1, w2, _BG_SEP)
    vc = bg.value_counts()
    return pa.table({"bg": vc.field("values"),
                     "cnt": vc.field("counts").cast(pa.int64())})


def _doc_bigrams(t: pa.Table, id_col: str, text_col: str) -> tuple:
    """(ids int64 array, parent idx per bigram, bigram StringArray) for a
    batch — shared by both scoring paths."""
    n = t.num_rows
    toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                  pattern=r"\s+")
    nper = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
        else flat
    parent = np.repeat(np.arange(n, dtype=np.int64), nper)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    if len(parent) < 2:
        return ids, np.zeros(0, np.int64), pa.array([], pa.string())
    pair = parent[1:] == parent[:-1]
    w1 = flat.slice(0, len(flat) - 1).filter(pa.array(pair))
    w2 = flat.slice(1).filter(pa.array(pair))
    bg = pc.binary_join_element_wise(w1, w2, _BG_SEP)
    return ids, parent[:-1][pair], bg


def bigram_surprisal(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     mode: str = "broadcast") -> ray.data.Dataset:
    """Per-document mean bigram surprisal — the order-2 upgrade of
    ``unigram_surprisal`` (CCNet / Wenzek et al. 2020 LM-quality signal
    with the LM trained on the corpus itself): per bigram position,
    -ln P(w_i | w_{i-1}) under the corpus MLE bigram model
    (count(w1,w2) / count(w1 as a bigram prefix)).  Training on the
    scored corpus itself means every bigram is in-model — no backoff
    needed, and the whole signal is integer-exact after one
    per-unique-bigram ln quantization (lp6 = floor(ln(c/cp) * 1e6)).

    ``mode='broadcast'`` (default): bigram→lp6 table collected once on
    the driver and ``ray.put`` — the collect is DISTINCT-BIGRAM bounded
    (web-scale distinct bigrams run ~10-100× unigram vocab; beyond
    broadcast reach, use ``mode='reduce'``).  Scoring is one vectorized
    map_batches with a per-unique-bigram lookup per batch.

    ``mode='reduce'``: nothing on the driver — unbounded vocabulary.
    Four hash shuffles, every one the repo's ``groupapply`` /
    ``groupby`` primitive (NOT ``Dataset.join``, which spawns
    ``num_partitions`` aggregator actors per join — three chained
    joins deadlock a small cluster and oversubscribe a big one):
    (1) bigram-count combine, (2) colocate by hash(w1) to quantize
    lp6 per bigram, (3) colocate doc-bigram rows with their lp6 row
    by hash(bigram) — a reduce-side join in one map_groups, partials
    pre-summed per (partition, doc), (4) per-doc sum.  Byte-identical
    outputs to broadcast (tested).

    Output: (id, n_bigrams, surprisal2_e6); docs with < 2 tokens score
    0."""
    import math
    if mode not in ("broadcast", "reduce"):
        raise ValueError("mode must be broadcast|reduce")

    freq = ds.map_batches(
        lambda t: _bigram_partials(t, text_col),
        batch_format="pyarrow").groupby("bg").sum("cnt")
    freq = freq.map_batches(
        lambda t: t.rename_columns(["bg", "cnt"]), batch_format="pyarrow")

    if mode == "broadcast":
        # distinct-bigram bounded collect (see docstring)
        batches = list(freq.iter_batches(batch_format="pyarrow"))
        ftab = pa.concat_tables(batches) if batches else \
            pa.table({"bg": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
        bgs = ftab["bg"].to_pylist()
        cnts = ftab["cnt"].to_numpy(zero_copy_only=False)
        pref: dict = {}
        for b, c in zip(bgs, cnts):
            w1 = b.split(_BG_SEP, 1)[0]
            pref[w1] = pref.get(w1, 0) + int(c)
        lp6 = {b: math.floor(math.log(int(c) / pref[b.split(_BG_SEP, 1)[0]])
                             * 1e6) for b, c in zip(bgs, cnts)}
        ref = ray.put(lp6)

        def _score(t: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            ids, parent, bg = _doc_bigrams(t, id_col, text_col)
            n = len(ids)
            d = pc.dictionary_encode(bg)
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
                if len(bg) else np.zeros(0, np.int64)
            # bounded loop: one lookup per unique bigram in the batch
            uval = np.array([lut.get(u, 0) for u in d.dictionary.to_pylist()],
                            dtype=np.int64) if len(bg) else np.zeros(0, np.int64)
            s = np.bincount(parent, weights=(uval[codes] if len(bg) else
                            np.zeros(0)).astype(np.float64),
                            minlength=n).astype(np.int64)
            nb = np.bincount(parent, minlength=n).astype(np.int64)
            surp = np.where(nb > 0, (-s) // np.maximum(nb, 1), 0)
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "surprisal2_e6": pa.array(surp.astype(np.int64), pa.int64()),
            })

        return ds.map_batches(_score, batch_format="pyarrow").sort(id_col)

    # mode == 'reduce': fully distributed, no driver-side model
    from .corpus import _hash64_strings
    from .dist import groupapply
    num_partitions = 16

    def _w1key(t: pa.Table) -> pa.Table:
        w1 = pc.list_element(pc.split_pattern(t["bg"], _BG_SEP), 0)
        return pa.table({
            "skey": pa.array(_hash64_strings(w1), pa.uint64()),
            "w1": w1, "bg": t["bg"], "cnt": t["cnt"]})

    def _lp_part(t: pa.Table) -> pa.Table:
        """All bigrams sharing a w1 colocate (routed by hash(w1));
        regroup EXACTLY by the w1 string, sum cnt per group → cp, then
        the same floor-e6 ln quantization as broadcast (IEEE double
        division both sides)."""
        w1 = t["w1"]
        d = pc.dictionary_encode(
            w1.combine_chunks() if isinstance(w1, pa.ChunkedArray) else w1)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        acc = np.zeros(len(d.dictionary), np.int64)
        np.add.at(acc, codes, c)
        lp = np.floor(np.log(c / acc[codes]) * 1e6).astype(np.int64)
        return pa.table({"bg": t["bg"], "lp6": pa.array(lp, pa.int64())})

    lp_ds = groupapply(freq.map_batches(_w1key, batch_format="pyarrow"),
                       "skey", _lp_part, num_partitions)

    # reduce-side join: lp rows and doc-bigram rows union under one
    # schema, colocate by hash(bigram), match on the true string inside
    # the partition (hash collisions only cost skew, never correctness)
    def _tag_lp(t: pa.Table) -> pa.Table:
        return pa.table({
            "skey": pa.array(_hash64_strings(t["bg"]), pa.uint64()),
            "bg": t["bg"], "lp6": t["lp6"],
            "doc": pa.nulls(t.num_rows, pa.int64())})

    def _tag_doc(t: pa.Table) -> pa.Table:
        ids, parent, bg = _doc_bigrams(t, id_col, text_col)
        docs = ids[parent] if len(parent) else np.zeros(0, np.int64)
        return pa.table({
            "skey": pa.array(_hash64_strings(bg), pa.uint64()),
            "bg": bg, "lp6": pa.nulls(len(bg), pa.int64()),
            "doc": pa.array(docs, pa.int64())})

    tagged = lp_ds.map_batches(_tag_lp, batch_format="pyarrow").union(
        ds.map_batches(_tag_doc, batch_format="pyarrow"))

    def _score_part(t: pa.Table) -> pa.Table:
        """Within one bigram partition: build the code→lp6 table from
        the lp rows, score the doc rows through it, and pre-sum per doc
        so the final shuffle carries one row per (partition, doc)."""
        bg = t["bg"]
        d = pc.dictionary_encode(
            bg.combine_chunks() if isinstance(bg, pa.ChunkedArray) else bg)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        is_lp = pc.is_valid(t["lp6"]).to_numpy(zero_copy_only=False)
        lut = np.zeros(len(d.dictionary), np.int64)
        lp_vals = t["lp6"].fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lut[codes[is_lp]] = lp_vals[is_lp]
        docs = t["doc"].fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)[~is_lp]
        vals = lut[codes[~is_lp]]
        u, inv = np.unique(docs, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, vals)
        nb = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({id_col: pa.array(u, pa.int64()),
                         "s": pa.array(s, pa.int64()),
                         "nb": pa.array(nb, pa.int64())})

    partials = groupapply(tagged, "skey", _score_part, num_partitions)

    # zero rows give every doc (incl. < 2 tokens) an output row without
    # a left-outer join
    def _zeros(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "s": z, "nb": z})

    per_doc = partials.union(
        ds.select_columns([id_col]).map_batches(
            _zeros, batch_format="pyarrow")) \
        .groupby(id_col).aggregate(ray.data.aggregate.Sum("s"),
                                   ray.data.aggregate.Sum("nb"))

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns([id_col, "s", "nb"])
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        surp = np.where(nb > 0, (-s) // np.maximum(nb, 1), 0)
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
            "surprisal2_e6": pa.array(surp.astype(np.int64), pa.int64()),
        })

    return per_doc.map_batches(_final, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

def cms_build(ds: ray.data.Dataset, col: str, depth: int = 4,
              width: int = 1 << 14, pre_split: bool = False) -> np.ndarray:
    """Count-min sketch over a string column — the point-frequency
    sketch that completes the family (HyperLogLog = distinct count,
    Misra-Gries = heavy hitters, CMS = per-key count estimates) when
    the vocabulary is too big for an exact groupby at 100 TB.

    Scale shape: per batch, counts are accumulated per UNIQUE value
    (value_counts first), hashed into a local (depth, width) table via
    Kirsch-Mitzenmacher double hashing (h1 + i*h2 over the two md5
    halves) and ``np.add.at``; each block emits at most depth*width
    nonzero (cell, cnt) rows.  The one shuffle is
    ``groupby(cell).sum`` over those bounded partials; the driver
    assembles the <= depth*width final cells.  Cell sums are order-
    and blocking-insensitive, so the sketch is DETERMINISTIC for a
    given multiset regardless of parallelism (tested).  Guarantees:
    est >= true always; est <= true + e*N/width with prob 1-exp(-depth)
    per query (N = total occurrences).

    ``pre_split=True`` treats ``col`` as whitespace-separated text and
    counts token occurrences."""
    import hashlib
    d, w = depth, width
    if d < 1 or w < 2:
        raise ValueError("depth >= 1 and width >= 2 required")

    def _partial(t: pa.Table) -> pa.Table:
        vals = t[col]
        if pre_split:
            toks = pc.split_pattern_regex(pc.fill_null(vals, ""),
                                          pattern=r"\s+")
            vals = pc.list_flatten(toks)
            vals = vals.filter(pc.not_equal(vals, ""))
        else:
            vals = vals.cast(pa.string()).drop_null()
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) \
            else vals
        vc = vals.value_counts()
        uniq = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not uniq:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        # bounded loop: one md5 per unique value in the batch
        dig = [hashlib.md5(u.encode("utf-8", "surrogatepass")).digest()
               for u in uniq]
        h1 = np.frombuffer(b"".join(x[:8] for x in dig), dtype="<u8")
        h2 = np.frombuffer(b"".join(x[8:] for x in dig), dtype="<u8")
        local = np.zeros((d, w), np.int64)
        with np.errstate(over="ignore"):
            for i in range(d):
                idx = ((h1 + np.uint64(i) * h2) % np.uint64(w)).astype(np.int64)
                np.add.at(local[i], idx, cnts)
        flat = local.reshape(-1)
        nz = np.flatnonzero(flat)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "cnt": pa.array(flat[nz], pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("cell").sum("cnt")
    sk = np.zeros(d * w, np.int64)
    # bounded collect: <= depth*width rows by construction
    for b in agg.iter_batches(batch_format="pyarrow"):
        sk[b["cell"].to_numpy(zero_copy_only=False)] = \
            b["sum(cnt)"].to_numpy(zero_copy_only=False)
    return sk.reshape(d, w)


def cms_query(sketch: np.ndarray, values: list[str]) -> np.ndarray:
    """Point-frequency estimates (min over the sketch's rows) for each
    value, int64; est >= true count always."""
    import hashlib
    d, w = sketch.shape
    if not values:
        return np.zeros(0, np.int64)
    dig = [hashlib.md5(v.encode("utf-8", "surrogatepass")).digest()
           for v in values]
    h1 = np.frombuffer(b"".join(x[:8] for x in dig), dtype="<u8")
    h2 = np.frombuffer(b"".join(x[8:] for x in dig), dtype="<u8")
    est = np.full(len(values), np.iinfo(np.int64).max, np.int64)
    with np.errstate(over="ignore"):
        for i in range(d):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(w)).astype(np.int64)
            est = np.minimum(est, sketch[i][idx])
    return est


# ---------------------------------------------------------------------------
# Inverted index (token -> posting list)
# ---------------------------------------------------------------------------

def postings(ds: ray.data.Dataset, id_col: str = "doc_id",
             text_col: str = "text", cap: int = 10,
             min_df: int = 1,
             num_partitions: int = 16) -> ray.data.Dataset:
    """Inverted-index construction — (token, df, doc_csv): document
    frequency plus the first ``cap`` containing doc ids ascending,
    comma-joined (the bounded posting-list head; a search index build
    emits the full sorted list the same way, sharded by token).

    Scale shape: per batch, (doc, token) pairs are deduped vectorized
    (a doc's rows never span batches, so batch-local distinct pairs are
    globally distinct); ONE hash shuffle colocates each token's pairs
    (groupapply on hash64(token) — collisions only share a partition,
    grouping inside is by the true string); per partition one sort +
    run-length pass computes df and assembles the capped CSV via
    ListArray offsets + binary_join — no per-token Python."""
    from .corpus import _hash64_strings
    from .dist import groupapply

    def _pairs(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        toks = pc.split_pattern_regex(txt, pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
            else flat
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep]
        flat = flat.filter(pa.array(keep))
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(codes):
            order = np.lexsort((parent, codes))
            cs, ps = codes[order], parent[order]
            first = np.concatenate([[True], (cs[1:] != cs[:-1])
                                    | (ps[1:] != ps[:-1])])
            cs, ps = cs[first], ps[first]
        else:
            cs = ps = np.zeros(0, np.int64)
        tok = d.dictionary.take(pa.array(cs))
        return pa.table({
            "skey": pa.array(_hash64_strings(tok), pa.uint64()),
            "token": tok,
            "doc": pa.array(ids[ps] if len(ps) else np.zeros(0, np.int64),
                            pa.int64())})

    def _part(t: pa.Table) -> pa.Table:
        tok = t["token"]
        d = pc.dictionary_encode(
            tok.combine_chunks() if isinstance(tok, pa.ChunkedArray)
            else tok)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = t["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, codes))
        cs, dv = codes[order], docs[order]
        brk = np.concatenate([[0], np.flatnonzero(cs[1:] != cs[:-1]) + 1,
                              [len(cs)]]) if len(cs) else np.array([0])
        df = np.diff(brk).astype(np.int64)
        rank = np.arange(len(cs)) - np.repeat(brk[:-1], df)
        capped = rank < cap
        # per-group capped CSV: offsets into the capped doc strings
        kept = dv[capped]
        per_group = np.minimum(df, cap)
        offs = np.concatenate([[0], np.cumsum(per_group)]).astype(np.int32)
        doc_str = pc.cast(pa.array(kept, pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), doc_str)
        csv = pc.binary_join(lists, ",")
        keep = df >= min_df
        out = pa.table({
            "token": d.dictionary.take(pa.array(np.flatnonzero(keep))) if
            len(df) else pa.array([], pa.string()),
            "df": pa.array(df[keep], pa.int64()),
            "doc_csv": csv.take(pa.array(np.flatnonzero(keep))) if len(df)
            else pa.array([], pa.string()),
        })
        return out

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    return groupapply(pairs, "skey", _part, num_partitions).sort("token")


# ---------------------------------------------------------------------------
# Weighted priority sampling (integer-exact, oracle-checkable)
# ---------------------------------------------------------------------------

def weighted_sample(ds: ray.data.Dataset, k: int,
                    weight_col: str = "n_chars", id_col: str = "doc_id",
                    carry_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Deterministic weighted sampling without replacement: keep the k
    rows with the smallest priority = md5_u64(id) // max(weight, 1) —
    heavier rows draw stochastically smaller priorities (the integer
    cousin of Efraimidis-Spirakis u^(1/w) keys, chosen because integer
    division ranks IDENTICALLY in numpy and DuckDB, so the pick is
    oracle-checkable bit-for-bit; md5_u64 = little-endian first 8
    digest bytes = DuckDB's md5_number_upper).

    Scale shape: per-batch prune to the k smallest (priority, id)
    BEFORE the exchange — the shuffle carries O(batches * k) rows; the
    single final prune runs on that bounded set.  The uint64 priority
    rides as (hi, lo) int64 halves so no value crosses Ray's int64
    group-key boundary."""
    import hashlib

    def _rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wts = t[weight_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = np.frombuffer(
            b"".join(hashlib.md5(str(int(i)).encode()).digest()[:8]
                     for i in ids), dtype="<u8") if len(ids) else \
            np.zeros(0, np.uint64)
        pri = h // np.maximum(wts, 1).astype(np.uint64)
        cols = {
            "hi": pa.array((pri >> np.uint64(32)).astype(np.int64),
                           pa.int64()),
            "lo": pa.array((pri & np.uint64(0xffffffff)).astype(np.int64),
                           pa.int64()),
            id_col: t[id_col], weight_col: t[weight_col]}
        for c in carry_cols:
            cols[c] = t[c]
        t2 = pa.table(cols)
        idx = pc.sort_indices(t2, sort_keys=[("hi", "ascending"),
                                             ("lo", "ascending"),
                                             (id_col, "ascending")])
        return t2.take(idx[:k])

    def _final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("hi", "ascending"),
                                            ("lo", "ascending"),
                                            (id_col, "ascending")])
        return t.take(idx[:k]).drop_columns(["hi", "lo", "grp"])

    pruned = ds.map_batches(_rank, batch_format="pyarrow") \
               .map_batches(lambda t: t.append_column(
                   "grp", pa.array(np.zeros(t.num_rows, np.int64))),
                   batch_format="pyarrow")
    return pruned.groupby("grp").map_groups(
        _final, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# document chunking (embedding-pipeline pre-processing)
# ---------------------------------------------------------------------------


def chunk_documents(ds: ray.data.Dataset, chunk_tokens: int = 256,
                    overlap: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Split every document into overlapping fixed-token windows — the
    pre-processing step every embedding / retrieval pipeline runs before
    encoding (token windows of ``chunk_tokens`` advancing by
    ``chunk_tokens - overlap``).  Output one row per chunk:
    (id, chunk_idx, n_chunk_tokens, chunk) in document order.

    Chunk rule (deterministic, SQL-expressible): tokens are non-empty
    ``\\s+`` splits; chunk i covers tokens [i*step, i*step+chunk_tokens);
    a doc with n tokens yields 1 + ceil(max(n - chunk_tokens, 0) / step)
    chunks (so the final window always reaches the last token; a doc
    with 0 tokens yields no rows).

    Scale shape: pure map_batches, NO shuffle — per batch, token lists
    are exploded once (list_flatten), every chunk's token span becomes a
    gather-index range (one np.repeat/arange composition), and chunk
    strings are rebuilt with ONE ListArray + binary_join over the taken
    tokens; each token is copied into at most
    ceil(chunk_tokens / step) chunks, which bounds output bytes at that
    multiple of the corpus."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat_vals = pc.list_flatten(flat)
        nper = pc.list_value_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = pc.not_equal(flat_vals, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat_vals = flat_vals.filter(keep)
        # per-doc token counts after dropping the empty-split artifacts
        parent_all = np.repeat(np.arange(len(nper)), nper)[keep_np]
        n_tok = np.bincount(parent_all, minlength=len(nper)).astype(np.int64)
        doc_tok_start = np.concatenate([[0], np.cumsum(n_tok)[:-1]]) \
            if len(nper) else np.zeros(0, np.int64)
        n_chunks = np.where(
            n_tok == 0, 0,
            1 + -(-np.maximum(n_tok - chunk_tokens, 0) // step))
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: _t_take_empty(t[id_col]),
                "chunk_idx": pa.array([], pa.int64()),
                "n_chunk_tokens": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string())})
        doc_of_chunk = np.repeat(np.arange(len(nper)), n_chunks)
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_idx = np.arange(total) - np.repeat(first, n_chunks)
        starts = chunk_idx * step
        lens = np.minimum(n_tok[doc_of_chunk] - starts, chunk_tokens)
        # gather indices: for chunk c, doc_tok_start[doc]+starts[c] .. +lens[c]
        g0 = doc_tok_start[doc_of_chunk] + starts
        idx = np.repeat(g0, lens) + (
            np.arange(int(lens.sum()))
            - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens))
        taken = flat_vals.take(pa.array(idx, pa.int64()))
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]),
                           pa.int32())
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(offsets, taken), " ")
        return pa.table({
            id_col: t[id_col].take(pa.array(doc_of_chunk, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_chunk_tokens": pa.array(lens, pa.int64()),
            "chunk": chunks})

    return ds.map_batches(_f, batch_format="pyarrow")


def _t_take_empty(col) -> pa.Array:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.slice(0, 0)


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson & Zaragoza 2009)
# ---------------------------------------------------------------------------


def bm25_topk(ds: ray.data.Dataset, queries: list[tuple[int, str]],
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              num_partitions: int = 8) -> ray.data.Dataset:
    """Top-k documents per query under Okapi BM25 — the retrieval
    scorer one tier up from tfidf_top_terms (idf with the +0.5 df
    smoothing, tf saturation k1, length normalization b).  ``queries``
    is a small (query_id, text) list; terms are the query's DISTINCT
    whitespace tokens.  Output: (query_id, doc_id, score_e12) rows,
    top-k per query by (score desc, doc_id) — ties deterministic.

    Float discipline (the unigram_surprisal rule, extended): idf is
    quantized per TERM (one scalar math.log each, e6 floor); the length
    normalization is quantized per (term, doc) with a fixed-order
    double expression that DuckDB evaluates identically (only
    correctly-rounded ops — *, /, floor — after the one ln), so
    score_e12 = sum(idf_e6 * norm_e6) is integer arithmetic and the SQL
    oracle hashes bit-identically.

    Scale shape: pass 1 is a per-batch partials pass (df per query
    term + doc/token totals; <= n_terms+1 rows per block, collected
    driver-side — bounded by the QUERY vocabulary, never the corpus).
    Pass 2 scores each batch vectorized (one pc.equal + bincount per
    term — terms are few by contract) and prunes to top-k per query
    INSIDE the batch, so the one query-keyed shuffle carries
    <= k * queries rows per block."""
    import math
    id_type = ds.schema().base_schema.field(id_col).type
    if not (pa.types.is_integer(id_type)):
        # the scorer carries doc ids through int64 numpy (lexsort prune
        # + shuffle key); fail loudly instead of an opaque astype error
        # mid-pipeline (ADVICE r3)
        raise ValueError(
            f"bm25_topk requires an integer {id_col!r} column "
            f"(got {id_type}); map string ids to int64 first")
    terms_by_q: dict[int, list[str]] = {}
    for qid, qtext in queries:
        ts = sorted({w for w in (qtext or "").split() if w})
        terms_by_q[int(qid)] = ts
    all_terms = sorted({t for ts in terms_by_q.values() for t in ts})
    term_arr = pa.array(all_terms, pa.string())

    def _partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep_np]
        rows_t, rows_df = [], []
        for term in all_terms:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            rows_t.append(term)
            rows_df.append(int(len(np.unique(parent[m]))))
        rows_t.append("")      # stats row: doc + token totals
        rows_df.append(0)
        return pa.table({
            "term": pa.array(rows_t, pa.string()),
            "df": pa.array(rows_df, pa.int64()),
            "docs": pa.array([0] * len(all_terms) + [t.num_rows],
                             pa.int64()),
            "toks": pa.array([0] * len(all_terms) + [int(len(flat))],
                             pa.int64()),
        })

    import pandas as pd
    part = ds.map_batches(_partials, batch_format="pyarrow").to_pandas()
    agg = part.groupby("term", as_index=True).sum()
    n_docs = int(agg["docs"].sum())
    total_toks = int(agg["toks"].sum())
    avgdl = total_toks / n_docs if n_docs else 1.0
    idf6 = {term: math.floor(
        math.log((n_docs - int(agg.loc[term, "df"]) + 0.5)
                 / (int(agg.loc[term, "df"]) + 0.5) + 1.0) * 1e6)
        for term in all_terms if term in agg.index}

    qids = sorted(terms_by_q)
    payload = (qids, terms_by_q, idf6, float(avgdl))
    ref = ray.put(payload)

    def _score(t: pa.Table) -> pa.Table:
        qids_, tbq, idf6_, avgdl_ = ray.get(ref)
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep_np]
        dl = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        tf_by_term = {}
        for term in {x for ts in tbq.values() for x in ts}:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf_by_term[term] = np.bincount(
                parent[m], minlength=t.num_rows).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_d, out_s = [], [], []
        for qid in qids_:
            score = np.zeros(t.num_rows, dtype=np.int64)
            for term in tbq[qid]:
                i6 = idf6_.get(term)
                if i6 is None:
                    continue
                tf = tf_by_term[term]
                hit = tf > 0
                if not hit.any():
                    continue
                tfh = tf[hit].astype(np.float64)
                dlh = dl[hit].astype(np.float64)
                # FIXED-ORDER double expression — mirrored verbatim in
                # the SQL oracle (only correctly-rounded ops)
                norm6 = np.floor(
                    tfh * (k1 + 1.0)
                    / (tfh + k1 * ((1.0 - b) + b * dlh / avgdl_))
                    * 1e6).astype(np.int64)
                score[hit] += i6 * norm6
            pos = np.flatnonzero(score > 0)
            if not len(pos):
                continue
            # in-batch prune to top-k by (score desc, id asc)
            order = np.lexsort((ids[pos], -score[pos]))[:k]
            sel = pos[order]
            out_q.extend([qid] * len(sel))
            out_d.extend(ids[sel].tolist())
            out_s.extend(score[sel].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "k": pa.array(np.asarray(out_q, np.uint64), pa.uint64()),
            id_col: pa.array(out_d, pa.int64()),
            "score_e12": pa.array(out_s, pa.int64()),
        })

    from .dist import groupapply

    def _topk(t: pa.Table) -> pa.Table:
        qs_ = t["query_id"].to_numpy(zero_copy_only=False)
        ids_ = t[id_col].to_numpy(zero_copy_only=False)
        sc = t["score_e12"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_, -sc, qs_))
        qo = qs_[order]
        brk = np.concatenate([[0], np.flatnonzero(qo[1:] != qo[:-1]) + 1,
                              [len(qo)]])
        keep_idx = np.concatenate([
            order[brk[i]: min(brk[i] + k, brk[i + 1])]
            for i in range(len(brk) - 1)]) if len(qo) else \
            np.zeros(0, np.int64)
        keep_idx = np.sort(keep_idx)
        sub = t.take(pa.array(keep_idx, pa.int64()))
        return sub.drop_columns(["k"])

    scored = ds.map_batches(_score, batch_format="pyarrow")
    return groupapply(scored, "k", _topk, num_partitions)


def compression_ratio(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      level: int = 6) -> ray.data.Dataset:
    """Per-document zlib compression ratio — the entropy-style quality
    signal (DCLM/RefinedWeb-family filters): highly repetitive
    boilerplate compresses far below natural prose, machine-generated
    noise barely compresses at all.  Output: (id, n_bytes,
    compressed_bytes, ratio_e6 = floor(compressed/raw * 1e6); empty
    docs report ratio 1e6 — degenerate docs must not sort as
    highest-quality).

    Per-row zlib.compress is inherent (an opaque-payload kernel, like
    the media decoders) but runs in C per doc; the stage is shuffle-free
    and deterministic (zlib output is fixed for a given level)."""
    import zlib

    def _f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        raw = np.zeros(len(texts), dtype=np.int64)
        comp = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            b = (s or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level)) if b else 0
        ratio = np.where(raw > 0, (comp * 1_000_000) // np.maximum(raw, 1),
                         1_000_000).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
            "ratio_e6": pa.array(ratio, pa.int64()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def _as_arr(a) -> pa.Array:
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def grouped_heavy_hitters(ds: ray.data.Dataset, group_col: str = "lang",
                          capacity: int = 64,
                          text_col: str = "text") -> ray.data.Dataset:
    """Per-GROUP heavy hitters with exact counts: for every group g,
    all tokens whose in-group frequency is strictly greater than
    n_g / capacity — ``heavy_hitters`` with the Misra-Gries bound
    applied per (block, group), so per-block state stays
    <= groups_in_block * (capacity - 1) rows regardless of vocabulary
    (the web-scale replacement for a per-language vocabulary shuffle).

    Same sketch-then-verify exactness argument as the global op: the
    per-(block, group) survivors are a pigeonhole superset of the true
    per-group heavy hitters, and the second pass counts ONLY candidates
    exactly, so the output equals the SQL ``HAVING cnt*capacity > n_g``
    answer under any blocking.  Group values must not contain NUL
    (the composite-key separator; tokens MAY — the split is
    max_splits=1 and block totals ride out-of-band in their own
    column); null groups are skipped."""
    SEP = "\x00"

    def _cands(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep_np]
        grp = _as_arr(t[group_col]).cast(pa.string()) \
            .take(pa.array(parent, pa.int64()))
        ok = pc.invert(pc.is_null(grp))
        grp, flat = grp.filter(ok), flat.filter(ok)
        comp = pc.binary_join_element_wise(grp, flat, SEP)
        vc = comp.value_counts()
        vals = _as_arr(vc.field("values"))
        cnts = vc.field("counts").cast(pa.int64())
        gvc = grp.value_counts()
        out_tok, out_nb, out_tot = [], [], []
        for g, n_bg in zip(gvc.field("values").to_pylist(),
                           gvc.field("counts").to_pylist()):
            m = pc.starts_with(vals, g + SEP)
            sel = pc.and_(m, pc.greater(
                pc.multiply(cnts, pa.scalar(capacity, pa.int64())),
                pa.scalar(int(n_bg), pa.int64())))
            for v in vals.filter(sel).to_pylist():
                out_tok.append(v)
                out_nb.append(0)
                out_tot.append(False)
            # group block total rides OUT-OF-BAND in its own flag column
            # (an in-band endswith-SEP sentinel would misparse any token
            # that itself ends with a NUL byte — ADVICE r3)
            out_tok.append(g)
            out_nb.append(int(n_bg))
            out_tot.append(True)
        return pa.table({"comp": pa.array(out_tok, pa.string()),
                         "n_b": pa.array(out_nb, pa.int64()),
                         "is_total": pa.array(out_tot, pa.bool_())})

    cand: set[str] = set()
    totals: dict[str, int] = {}
    for b in ds.map_batches(_cands, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for comp, nb, tot in zip(b["comp"].to_pylist(),
                                 b["n_b"].to_pylist(),
                                 b["is_total"].to_pylist()):
            if tot:
                totals[comp] = totals.get(comp, 0) + nb
            else:
                cand.add(comp)
    _schema = pa.schema([(group_col, pa.string()),
                         ("token", pa.string()), ("cnt", pa.int64())])
    if not cand:
        return ray.data.from_arrow(_schema.empty_table())
    ref = ray.put(pa.array(sorted(cand), pa.string()))

    def _exact(t: pa.Table) -> pa.Table:
        cands = ray.get(ref)
        toks = pc.split_pattern_regex(pc.fill_null(t[text_col], ""),
                                      pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep_np]
        grp = _as_arr(t[group_col]).cast(pa.string()) \
            .take(pa.array(parent, pa.int64()))
        ok = pc.invert(pc.is_null(grp))
        comp = pc.binary_join_element_wise(grp.filter(ok),
                                           flat.filter(ok), SEP)
        comp = comp.filter(pc.is_in(comp, value_set=cands))
        vc = comp.value_counts()
        return pa.table({"comp": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(_exact, batch_format="pyarrow") \
            .groupby("comp").sum("cnt")

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["comp", "cnt"])
        parts = pc.split_pattern(t["comp"], pattern=SEP, max_splits=1)
        g = pc.list_element(parts, 0)
        tok = pc.list_element(parts, 1)
        gl = g.to_pylist() if not isinstance(g, pa.ChunkedArray) \
            else g.combine_chunks().to_pylist()
        n_g = np.array([totals.get(x, 0) for x in gl], dtype=np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        keep = cnt * capacity > n_g
        out = pa.table({group_col: g, "token": tok,
                        "cnt": t["cnt"]}).filter(pa.array(keep))
        return out

    return agg.map_batches(_final, batch_format="pyarrow") \
        .sort([group_col, "cnt", "token"],
              descending=[False, True, False])
