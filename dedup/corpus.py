"""Corpus-level text operators: C4-style global line dedup and n-gram
decontamination against a held-out benchmark set.

Both are the "beyond the reference" LLM-training-data ops (SURVEY.md
scope): the reference's semantic core is whole-record duplicate
detection (MainViewModel.cs:783-1120); these operate at sub-document
granularity, where the shuffle unit is a LINE or an N-GRAM rather than
a record.

Scale shapes
------------
``line_dedup`` is two hash shuffles, both over the exploded line table
(never the corpus as one block):

    explode (map_batches, vectorized)            one row per line
    -> groupapply(line_hash64)                   winner = min (doc, idx)
    -> groupapply(doc_id)                        rebuild kept text

Line text crosses the first exchange once (it is needed to verify
equality under 64-bit key collisions and again for the rebuild); the
partition kernels group by the true line string, so a hash collision
can never merge two distinct lines.

``ngram_decontaminate`` is broadcast-side: the benchmark n-gram set is
aggregated to a sorted distinct array (the SMALL side — benchmark
suites are MBs against a TB corpus), shipped once via ``ray.put``, and
probed inside an actor-pool ``map_batches`` with one ``pc.is_in`` per
batch — the train corpus is never shuffled at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dist import groupapply, segments


def _as_array(a) -> pa.Array:
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

# ---------------------------------------------------------------------------
# shared vectorized explosions
# ---------------------------------------------------------------------------


def _line_rows(t: pa.Table, id_col: str, text_col: str,
               sep: str) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Explode text into (line, parent_row, line_idx) — one
    split_pattern + arange, no per-row Python.  Every split segment is a
    line (empties included), matching string_split in SQL."""
    txt = pc.fill_null(t[text_col], "")
    lines = pc.split_pattern(txt, pattern=sep)
    nper = pc.list_value_length(lines).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = _as_array(pc.list_flatten(lines))
    parent = np.repeat(np.arange(t.num_rows), nper)
    offs = np.concatenate([[0], np.cumsum(nper)[:-1]]) if t.num_rows else \
        np.zeros(0, dtype=np.int64)
    idx = np.arange(len(flat)) - np.repeat(offs, nper)
    return flat, parent, idx


def _hash64_strings(arr: pa.Array) -> np.ndarray:
    """uint64 partition key per string — md5 over the per-batch DISTINCT
    values only (dictionary encode first), mapped back through codes.
    Used purely to colocate equal strings; kernels re-group by the true
    string, so collisions cost nothing but skew."""
    d = pc.dictionary_encode(_as_array(arr))
    dv = d.dictionary.to_pylist()
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in dv), dtype=np.uint64, count=len(dv))
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return h[codes] if len(codes) else np.zeros(0, dtype=np.uint64)


def gram_rows(txt: pa.Array, n: int) -> tuple[pa.Array, np.ndarray]:
    """All within-document token n-grams of a text column, vectorized:
    tokens are non-empty ``\\s+`` splits; each gram is n consecutive
    tokens joined by one space (``binary_join_element_wise`` over n
    zero-copy slices of the flat token array).  Returns (grams, parent
    row index); a doc with < n tokens contributes none."""
    toks = pc.split_pattern_regex(pc.fill_null(txt, ""), pattern=r"\s+")
    nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = _as_array(pc.list_flatten(toks))
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    parent = np.repeat(np.arange(len(nper)), nper)[keep_np]
    k = len(flat)
    if k < n:
        return pa.array([], pa.string()), np.zeros(0, dtype=np.int64)
    # a window starting at j stays inside one doc iff parent[j] ==
    # parent[j+n-1] (parent is non-decreasing)
    ok = parent[: k - n + 1] == parent[n - 1:]
    idx = np.flatnonzero(ok)
    pieces = [flat.slice(j, k - n + 1) for j in range(n)]
    joined = pc.binary_join_element_wise(*pieces, " ")
    return joined.take(pa.array(idx)), parent[idx]


# ---------------------------------------------------------------------------
# C4-style corpus-level line dedup
# ---------------------------------------------------------------------------


def line_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "\n",
               min_line_chars: int = 0,
               scope_col: str | None = None,
               num_partitions: int = 32) -> ray.data.Dataset:
    """Global line deduplication (the C4 pipeline's cross-document
    dedup, applied at line granularity): every distinct line keeps
    exactly its FIRST occurrence — minimum (doc_id, line_idx) — and is
    removed from every other document; each document's text is rebuilt
    from its surviving lines (dropped lines take their separator with
    them).  Output: (id, n_lines, n_kept, text_dedup), one row per doc.

    Lines shorter than ``min_line_chars`` are EXEMPT — kept in every
    document (the RefinedWeb-style guard: globally deduping short
    boilerplate like list bullets or "Home" would gut unrelated pages).

    ``scope_col`` (string column, e.g. the doc's host) switches the
    dedup key from the line alone to (scope, line) — the CCNet-style
    per-snapshot / per-host boilerplate removal: a nav bar repeated
    across one site dedups within that site but never collides with an
    identical line on another site.  Scope rides the partition hash, so
    a boilerplate line hot across the whole corpus ships to as many
    partitions as it has scopes instead of one.

    Determinism: the winner rule is a pure minimum, so output is
    byte-identical at any parallelism.  ``id_col`` must be integer."""

    def _explode(t: pa.Table) -> pa.Table:
        flat, parent, idx = _line_rows(t, id_col, text_col, sep)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lh = _hash64_strings(flat)
        cols = {
            "line": flat,
            "d": pa.array(ids[parent], pa.int64()),
            "i": pa.array(idx, pa.int64()),
        }
        if scope_col is not None:
            sc = _as_array(pc.fill_null(t[scope_col], "").cast(pa.string()))
            sh = _hash64_strings(sc)[parent]
            # mix the scope hash into the shuffle key (golden-ratio odd
            # multiplier keeps the mix bijective per scope)
            lh = lh ^ (sh * np.uint64(0x9E3779B97F4A7C15))
            cols["scope"] = sc.take(pa.array(parent))
        cols["lh"] = pa.array(lh, pa.uint64())
        return pa.table(cols)

    lines = ds.map_batches(_explode, batch_format="pyarrow")

    def _winner(t: pa.Table) -> pa.Table:
        """Partition kernel: group by the TRUE (scope, line) strings
        (dictionary codes — collision-proof), keep = row with min
        (d, i); short lines are exempt (always kept)."""
        codes = pc.dictionary_encode(t["line"].combine_chunks()) \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if scope_col is not None:
            sco = pc.dictionary_encode(t["scope"].combine_chunks()) \
                .indices.to_numpy(zero_copy_only=False).astype(np.int64)
            codes = codes * (sco.max() + 1 if len(sco) else 1) + sco
        d = t["d"].to_numpy(zero_copy_only=False)
        i = t["i"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(codes), dtype=bool)
        if len(codes):
            order = np.lexsort((i, d, codes))
            gc = codes[order]
            first = np.concatenate([[True], gc[1:] != gc[:-1]])
            keep[order[first]] = True
            if min_line_chars > 0:
                short = pc.less(pc.utf8_length(t["line"]),
                                min_line_chars) \
                    .to_numpy(zero_copy_only=False)
                keep |= short
        return pa.table({
            "line": t["line"],
            "d": t["d"],
            "i": t["i"],
            "keep": pa.array(keep),
            "dh": pa.array(d.astype(np.uint64), pa.uint64()),
        })

    flagged = groupapply(lines, "lh", _winner, num_partitions)

    def _rebuild(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False)
        i = t["i"].to_numpy(zero_copy_only=False)
        keep = t["keep"].to_numpy(zero_copy_only=False)
        # one sort puts each doc's lines in order; per-doc join of kept
        order = np.lexsort((i, d))
        ds_, is_, keep_ = d[order], i[order], keep[order]
        lines_np = np.asarray(t["line"].to_numpy(zero_copy_only=False),
                              dtype=object)[order]
        seg_order, starts, uniq = segments(ds_)
        # ds_ already sorted, so segments' argsort is stable identity
        out_txt, out_n, out_k = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = keep_[s:e]
            out_n.append(e - s)
            out_k.append(int(m.sum()))
            out_txt.append(sep.join(lines_np[s:e][m]))
        return pa.table({
            id_col: pa.array(uniq.astype(np.int64), pa.int64()),
            "n_lines": pa.array(out_n, pa.int64()),
            "n_kept": pa.array(out_k, pa.int64()),
            "text_dedup": pa.array(out_txt, pa.string()),
        })

    return groupapply(flagged, "dh", _rebuild, num_partitions)


def doc_line_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text",
                   sep: str = "\n") -> ray.data.Dataset:
    """WITHIN-document line dedup (the RefinedWeb line-wise-filter tier):
    each document independently keeps only the first occurrence of every
    distinct line.  Embarrassingly parallel — no shuffle at all, one
    vectorized ``map_batches`` (the scale contrast to ``line_dedup``'s
    corpus-wide first-occurrence rule).  Output: (id, n_lines, n_kept,
    text_dedup), one row per doc, same schema as line_dedup."""

    def _f(t: pa.Table) -> pa.Table:
        flat, parent, idx = _line_rows(t, id_col, text_col, sep)
        codes = pc.dictionary_encode(_as_array(flat)).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        keep = np.zeros(len(codes), dtype=bool)
        if len(codes):
            order = np.lexsort((idx, codes, parent))
            p_s, c_s = parent[order], codes[order]
            first = np.concatenate(
                [[True], (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])])
            keep[order[first]] = True
        n_lines = np.bincount(parent, minlength=n).astype(np.int64)
        n_kept = np.bincount(parent[keep], minlength=n).astype(np.int64)
        # kept lines are already in (doc, line_idx) order in the flat
        # explode layout, so one filter + list-wrap + join rebuilds texts
        kept_flat = _as_array(flat).filter(pa.array(keep))
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(n_kept, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets), kept_flat)
        text_dedup = pc.binary_join(lists, sep)
        return pa.table({
            id_col: t[id_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "text_dedup": text_dedup,
        })

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram decontamination (train vs benchmark)
# ---------------------------------------------------------------------------


def benchmark_gram_set(bench: ray.data.Dataset, n: int,
                       text_col: str = "text") -> "ray.ObjectRef":
    """Distinct n-grams of the benchmark corpus as a broadcast ref
    (sorted pa.StringArray).  Per-batch distinct FIRST (unique inside
    map_batches), then the small union on the driver — the full gram
    explosion never aggregates anywhere; only per-batch distinct rows
    move.  The benchmark is the small side by construction; a benchmark
    too large to broadcast should be the probe side instead."""

    def _distinct(t: pa.Table) -> pa.Table:
        grams, _ = gram_rows(t[text_col], n)
        return pa.table({"gram": grams.unique()})

    parts = bench.map_batches(_distinct, batch_format="pyarrow")
    seen: set = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        seen.update(b["gram"].to_pylist())
    return ray.put(pa.array(sorted(seen), pa.string()))


class _GramProber:
    """map_batches actor: resolves the broadcast gram set once per actor
    (__init__), probes each batch with one pc.is_in."""

    def __init__(self, gram_ref, n: int, id_col: str, text_col: str) -> None:
        self.value_set = ray.get(gram_ref) if isinstance(
            gram_ref, ray.ObjectRef) else gram_ref
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        grams, parent = gram_rows(t[self.text_col], self.n)
        nrows = t.num_rows
        tot = np.bincount(parent, minlength=nrows).astype(np.int64)
        hit = pc.is_in(grams, value_set=self.value_set) \
            .to_numpy(zero_copy_only=False)
        bad = np.bincount(parent, weights=hit.astype(np.float64),
                          minlength=nrows).astype(np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_grams": pa.array(tot, pa.int64()),
            "n_contaminated": pa.array(bad, pa.int64()),
            "contaminated": pa.array((bad > 0).astype(np.int64), pa.int64()),
        })


def ngram_decontaminate(train: ray.data.Dataset, bench: ray.data.Dataset,
                        n: int = 8, id_col: str = "doc_id",
                        text_col: str = "text",
                        concurrency=(1, 8), mode: str = "broadcast",
                        bloom_fpp: float = 0.001,
                        num_partitions: int = 32) -> ray.data.Dataset:
    """Benchmark decontamination (the train/test-overlap scrub every
    published pretraining corpus runs): counts, per train doc, the token
    n-gram occurrences that also appear anywhere in the benchmark
    corpus, and flags docs with >= 1 overlap.  Output per train doc:
    (id, n_grams, n_contaminated, contaminated).

    ``mode='broadcast'`` (default): the benchmark gram set is broadcast
    once (ray.put) and probed per-batch with pc.is_in — no shuffle
    touches the train corpus.  Right whenever the distinct benchmark
    gram set fits a worker (benchmark suites are MBs against a TB
    corpus).

    ``mode='bloom'``: the scale path for benchmark sets too large to
    broadcast as strings (a multi-benchmark union can reach 1e8+
    distinct grams).  A sharded bloom over the gram hashes (~1.8 bytes
    per gram at fpp 1e-3) is the only broadcast object; train grams
    that hit the bloom are confirmed EXACTLY against the real benchmark
    gram strings in a co-partitioned shuffle, so the output is
    byte-identical to broadcast mode (bloom false positives are
    discarded by the confirm; false negatives are impossible).  Shuffle
    volume is bounded by true contamination + fpp·train-grams, never
    the corpus text."""
    if mode == "bloom":
        return _ngram_decontaminate_bloom(
            train, bench, n=n, id_col=id_col, text_col=text_col,
            bloom_fpp=bloom_fpp, num_partitions=num_partitions)
    if mode != "broadcast":
        raise ValueError(f"unknown decontaminate mode {mode!r}")
    ref = benchmark_gram_set(bench, n, text_col=text_col)
    return train.map_batches(
        _GramProber,
        fn_constructor_kwargs={"gram_ref": ref, "n": n, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)


def _key64_ids(arr: pa.Array) -> np.ndarray:
    """uint64 partition key for an id column: avalanche-mixed for
    integer ids, md5-over-distinct for strings.  Purely a co-location
    key — kernels always re-group by the real id."""
    from .dist import mix64
    arr = _as_array(arr)
    if pa.types.is_integer(arr.type):
        return mix64(arr.to_numpy(zero_copy_only=False).astype(np.uint64))
    return _hash64_strings(arr)


def _ngram_decontaminate_bloom(train: ray.data.Dataset,
                               bench: ray.data.Dataset, n: int,
                               id_col: str, text_col: str,
                               bloom_fpp: float,
                               num_partitions: int) -> ray.data.Dataset:
    """Bloom-screen / exact-confirm decontamination (see
    ngram_decontaminate).  Three stages, none of which moves corpus
    text:

      1. bench -> distinct (gram, h64) rows (per-batch distinct first;
         materialized — bounded by the benchmark's distinct gram count,
         the very quantity this mode exists to keep OFF the driver) ->
         distributed sharded-bloom build over h64.
      2. train -> ONE map_batches pass emitting per doc a totals row
         (kind 0, keyed by doc hash) plus one candidate row per
         (doc, distinct gram) whose hash hits the bloom (kind 1, keyed
         by gram hash, carrying the occurrence count).  Materialized:
         exactly n_docs + bloom-hit rows — the same 1-row-per-doc order
         as the assignments table, NEVER the gram explosion.
      3. candidates co-shuffled with the bench gram rows on h64; exact
         string is_in per partition discards bloom false positives;
         confirmed (doc, occ) partials re-keyed by doc hash and merged
         with the totals rows in one final groupapply.
    """
    from .bloom import build_bloom

    def _bench_grams(t: pa.Table) -> pa.Table:
        grams, _ = gram_rows(t[text_col], n)
        u = grams.unique()
        return pa.table({"gram": u,
                         "h": pa.array(_hash64_strings(u), pa.uint64())})

    bg = bench.map_batches(_bench_grams, batch_format="pyarrow") \
              .materialize()
    bloom = build_bloom(bg, "h", fpp=bloom_fpp,
                        num_partitions=num_partitions)
    bloom_ref = ray.put(bloom)
    _sch = train.schema()
    id_type = _sch.types[_sch.names.index(id_col)]

    def _emit(t: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        ids = _as_array(t[id_col])
        grams, parent = gram_rows(t[text_col], n)
        tot = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        d = pc.dictionary_encode(grams)
        dv = _as_array(d.dictionary)
        h_dv = _hash64_strings(dv)
        hit_dv = b.contains(h_dv) if len(dv) else np.zeros(0, dtype=bool)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(grams) else np.zeros(0, dtype=np.int64)
        sel = np.flatnonzero(hit_dv[codes]) if len(codes) else codes
        # occurrence counts per (doc row, distinct gram) among bloom hits
        comp = parent[sel] * max(len(dv), 1) + codes[sel]
        order, starts, uniq = segments(comp)
        occ = np.diff(starts)
        doc_idx = (uniq // max(len(dv), 1)).astype(np.int64)
        code_u = (uniq % max(len(dv), 1)).astype(np.int64)
        cand = pa.table({
            "k": pa.array(h_dv[code_u] if len(code_u) else
                          np.zeros(0, np.uint64), pa.uint64()),
            "kind": pa.array(np.ones(len(code_u), np.int8), pa.int8()),
            "doc_id": ids.take(pa.array(doc_idx)),
            "gram": dv.take(pa.array(code_u)),
            "occ": pa.array(occ.astype(np.int64), pa.int64()),
        })
        totals = pa.table({
            "k": pa.array(_key64_ids(ids), pa.uint64()),
            "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            "doc_id": ids,
            "gram": pa.nulls(t.num_rows, pa.string()),
            "occ": pa.array(tot, pa.int64()),
        })
        return pa.concat_tables([totals, cand])

    emitted = train.map_batches(_emit, batch_format="pyarrow").materialize()

    def _only(kind: int):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind))
        return _f

    cand = emitted.map_batches(_only(1), batch_format="pyarrow")
    totals = emitted.map_batches(_only(0), batch_format="pyarrow") \
                    .drop_columns(["gram"])

    def _bench_keyed(t: pa.Table) -> pa.Table:
        m = t.num_rows
        return pa.table({
            "k": t["h"],
            "kind": pa.array(np.full(m, 2, np.int8), pa.int8()),
            "doc_id": pa.nulls(m, id_type),
            "gram": t["gram"],
            "occ": pa.array(np.zeros(m, np.int64), pa.int64()),
        })

    union = cand.union(bg.map_batches(_bench_keyed, batch_format="pyarrow"))

    def _confirm(t: pa.Table) -> pa.Table:
        kind = t["kind"]
        bench_g = _as_array(t.filter(pc.equal(kind, 2))["gram"])
        c = t.filter(pc.equal(kind, 1))
        if c.num_rows and len(bench_g):
            ok = pc.is_in(_as_array(c["gram"]), value_set=bench_g.unique())
            c = c.filter(ok)
        else:
            c = c.slice(0, 0)
        return pa.table({
            "k": pa.array(_key64_ids(c["doc_id"]), pa.uint64()),
            "kind": pa.array(np.full(c.num_rows, 3, np.int8), pa.int8()),
            "doc_id": c["doc_id"],
            "occ": c["occ"],
        })

    confirmed = groupapply(union, "k", _confirm, num_partitions)

    def _combine(t: pa.Table) -> pa.Table:
        ids = _as_array(t["doc_id"])
        if pa.types.is_integer(ids.type):
            keys = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            d = pc.dictionary_encode(ids)
            keys = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        occ = t["occ"].to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, _ = segments(keys)
        if not len(keys):
            return pa.table({id_col: ids.slice(0, 0),
                             "n_grams": pa.array([], pa.int64()),
                             "n_contaminated": pa.array([], pa.int64()),
                             "contaminated": pa.array([], pa.int64())})
        ko, oo = kind[order], occ[order]
        s = starts[:-1]
        tot = np.add.reduceat(np.where(ko == 0, oo, 0), s)
        bad = np.add.reduceat(np.where(ko == 3, oo, 0), s)
        rep = order[s]
        return pa.table({
            id_col: ids.take(pa.array(rep)),
            "n_grams": pa.array(tot, pa.int64()),
            "n_contaminated": pa.array(bad, pa.int64()),
            "contaminated": pa.array((bad > 0).astype(np.int64), pa.int64()),
        })

    return groupapply(totals.union(confirmed), "k", _combine, num_partitions)


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix scan)
# ---------------------------------------------------------------------------


def pack_sequences(ds: ray.data.Dataset, budget: int,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   ids_per_range: int = 4096,
                   num_partitions: int = 32) -> ray.data.Dataset:
    """Assign every doc its position in a stream of fixed token-budget
    training sequences (the packing step that turns a curated corpus
    into context windows): docs are laid out in id order and cut every
    ``budget`` tokens; each doc gets (pack_id, pack_offset) of its first
    token.  Boundary rule is the simple streaming one (a doc may span a
    cut — pack_id is where it STARTS), which makes the whole op an
    exclusive prefix sum: SQL-checkable as ``sum() OVER (ORDER BY id)``.

    Scale shape — the classic two-phase distributed scan, never a
    single-node sort: ids are bucketed into contiguous ranges
    (``id // ids_per_range``); a combiner computes per-range token
    totals (one row per range per batch crosses the tiny aggregation);
    the driver cumsums the RANGE table (small: #docs / ids_per_range)
    and broadcasts the offsets; one groupapply over the range key then
    computes each range's local exclusive cumsum and adds its offset.
    Assumes ids are roughly uniform over their span (true for dense
    ids); skewed id spaces should bucket by an equi-depth sample
    instead."""

    def _range_sums(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = pc.fill_null(t[tokens_col], 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rk = ids // ids_per_range
        order, starts, uniq = segments(rk)
        s = np.add.reduceat(tok[order], starts[:-1]) if len(tok) else \
            np.zeros(0, dtype=np.int64)
        return pa.table({"rk": pa.array(uniq, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    totals = ds.map_batches(_range_sums, batch_format="pyarrow") \
               .groupby("rk").sum("s")
    rks_l, sums_l = [], []
    for b in totals.sort("rk").iter_batches(batch_format="pyarrow"):
        rks_l.append(b["rk"].to_numpy(zero_copy_only=False))
        sums_l.append(b["sum(s)"].to_numpy(zero_copy_only=False))
    rks = np.concatenate(rks_l).astype(np.int64) if rks_l else \
        np.zeros(0, np.int64)
    sums = np.concatenate(sums_l).astype(np.int64) if sums_l else \
        np.zeros(0, np.int64)
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]]) if len(sums) else sums
    bcast = ray.put((rks, offs))

    def _with_rk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "rk64", pa.array((ids // ids_per_range).astype(np.uint64),
                             pa.uint64()))

    def _scan(t: pa.Table) -> pa.Table:
        rks_b, offs_b = ray.get(bcast)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = pc.fill_null(t[tokens_col], 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rk = ids // ids_per_range
        order = np.lexsort((ids, rk))
        rk_s, ids_s, tok_s = rk[order], ids[order], tok[order]
        cum = np.cumsum(tok_s) - tok_s  # exclusive, but resets needed per rk
        starts = np.concatenate([[0], np.flatnonzero(rk_s[1:] != rk_s[:-1])
                                 + 1]) if len(rk_s) else np.zeros(0, np.int64)
        base = np.zeros(len(rk_s), dtype=np.int64)
        if len(rk_s):
            base[starts] = cum[starts]
            base = np.maximum.accumulate(base)
        local = cum - base
        prefix = offs_b[np.searchsorted(rks_b, rk_s)] + local
        return pa.table({
            id_col: pa.array(ids_s, pa.int64()),
            tokens_col: pa.array(tok_s, pa.int64()),
            "pack_id": pa.array(prefix // budget, pa.int64()),
            "pack_offset": pa.array(prefix % budget, pa.int64()),
        })

    keyed = ds.map_batches(_with_rk, batch_format="pyarrow")
    return groupapply(keyed, "rk64", _scan, num_partitions)


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup
# ---------------------------------------------------------------------------

#: canonicalization rules, applied IN ORDER (scheme before www — the
#: www rule is anchored at start and only exposes after the scheme is
#: gone).  RE2 on both sides: arrow replace_substring_regex and DuckDB
#: regexp_replace(...,'g') agree match-for-match.
URL_CANON_RULES = (
    (r"^https?://", ""),     # scheme
    (r"^www\.", ""),         # www prefix
    (r"#.*$", ""),           # fragment
    (r"\?utm_.*$", ""),      # tracking query (utm-led)
    (r"/$", ""),             # trailing slash
)


def canonicalize_urls(urls: pa.Array) -> pa.Array:
    """Chained vectorized URL normalization (the crawl-dedup
    preprocessor: scheme / www / fragment / utm-query / trailing-slash
    stripping)."""
    if not pa.types.is_string(urls.type):   # all-null block => null type
        urls = urls.cast(pa.string())
    out = pc.fill_null(urls, "")
    for pat, rep in URL_CANON_RULES:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
    return out


def url_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
              url_col: str = "url",
              num_partitions: int = 32) -> ray.data.Dataset:
    """Canonical-URL exact dedup: rows whose canonicalized URLs match
    form a cluster; the minimum id keeps.  One hash shuffle on the
    canonical string's 64-bit key; the partition kernel groups by the
    true canonical string (collision-proof), exactly like line_dedup's
    winner stage.  Output: (id, url, canonical_url, state,
    cluster_size), deterministic at any parallelism."""

    def _canon(t: pa.Table) -> pa.Table:
        canon = canonicalize_urls(_as_array(t[url_col].combine_chunks()
                                            if isinstance(t[url_col],
                                                          pa.ChunkedArray)
                                            else t[url_col]))
        return pa.table({
            id_col: t[id_col],
            url_col: t[url_col],
            "canonical_url": canon,
            "ch": pa.array(_hash64_strings(canon), pa.uint64()),
        })

    keyed = ds.map_batches(_canon, batch_format="pyarrow")

    def _states(t: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(_as_array(t["canonical_url"]
                                               .combine_chunks())) \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        mn = np.full(int(codes.max()) + 1 if n else 1, np.iinfo(np.int64).max,
                     dtype=np.int64)
        np.minimum.at(mn, codes, ids)
        cnt = np.bincount(codes, minlength=len(mn))
        state = np.where(cnt[codes] == 1, "unique",
                         np.where(ids == mn[codes], "keep", "delete"))
        return pa.table({
            id_col: t[id_col],
            url_col: t[url_col],
            "canonical_url": t["canonical_url"],
            "state": pa.array(state.tolist(), pa.string()),
            "cluster_size": pa.array(cnt[codes].astype(np.int64), pa.int64()),
        })

    return groupapply(keyed, "ch", _states, num_partitions)


# ---------------------------------------------------------------------------
# unicode text normalization (pre-hash normalization stage)
# ---------------------------------------------------------------------------

def _unicode_normalize(txt, form: str) -> pa.Array:
    """Unicode-normalize a string column.  Arrow's utf8_normalize is
    DECOMPOSE-only (NFC/NFKC come back decomposed — utf8proc is invoked
    without the COMPOSE step), so composition falls back to
    unicodedata.normalize on exactly the rows that still carry
    combining marks after the arrow pass — none at all on ASCII web
    text, so the vectorized fast path handles the bulk and the per-row
    fallback touches only the accented tail."""
    arr = _as_array(txt)
    out = pc.utf8_normalize(arr, form=form)
    if form in ("NFC", "NFKC"):
        needs = pc.fill_null(
            pc.match_substring_regex(out, r"\p{M}"), False)
        n_needs = pc.sum(pc.cast(needs, "int64")).as_py() or 0
        if n_needs:
            import unicodedata
            mask = needs.to_numpy(zero_copy_only=False)
            flagged = out.filter(needs).to_pylist()
            fixed = pa.array(
                [unicodedata.normalize(form, s) for s in flagged],
                out.type)
            out = pc.replace_with_mask(out, pa.array(mask), fixed)
    return out


def normalize_text_table(t: pa.Table, id_col: str = "doc_id",
                         text_col: str = "text", form: str = "NFC",
                         lower: bool = True, strip_marks: bool = False,
                         collapse_ws: bool = True) -> pa.Table:
    """Batch kernel for normalize_text: unicode normalization (NFC /
    NFKC), optional lowercase, optional accent/mark stripping (NFKD
    decompose then remove \\p{Mn} combining marks, recomposed NFC —
    the portable definition of "strip accents"), optional whitespace
    collapse (runs -> one space, ends trimmed).  All arrow kernels, no
    per-row Python; null text stays null (error rows must not become
    empty strings)."""
    txt = t[text_col]
    if strip_marks:
        txt = pc.utf8_normalize(txt, form="NFKD")
        txt = pc.replace_substring_regex(txt, pattern=r"\p{Mn}",
                                         replacement="")
    if form:
        txt = _unicode_normalize(txt, form)
    if lower:
        txt = pc.utf8_lower(txt)
    if collapse_ws:
        txt = pc.replace_substring_regex(txt, pattern=r"\s+",
                                         replacement=" ")
        txt = pc.utf8_trim_whitespace(txt)
    return pa.table({id_col: t[id_col], "text_norm": txt})


def normalize_text(ds: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text", form: str = "NFC",
                   lower: bool = True, strip_marks: bool = False,
                   collapse_ws: bool = True) -> ray.data.Dataset:
    """Unicode normalization stage (the CCNet/Dolma pre-hash step: the
    same text must hash identically whether a crawler emitted it
    composed or decomposed).  One shuffle-free map_batches; compose
    BEFORE any dedup tier when crawl sources mix normalization forms."""
    return ds.map_batches(
        lambda t: normalize_text_table(
            t, id_col=id_col, text_col=text_col, form=form, lower=lower,
            strip_marks=strip_marks, collapse_ws=collapse_ws),
        batch_format="pyarrow")
