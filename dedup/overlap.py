"""Cross-source overlap + sampled duplicate-ratio estimation.

Two curation-planning operators that answer "is dedup worth the
shuffle, and between which sources?" BEFORE the full pipeline runs:

* :func:`source_overlap` — the exact pairwise cross-source
  content-overlap report (how many distinct texts sources A and B
  share, plus Jaccard).  The 100-TB analogue of the reference's
  disk-scope duplicate view (ViewModels/MainViewModel.cs same-disk /
  different-disk predicates): where the reference asks "which DISKS
  hold copies of each other", this asks "which crawl SOURCES feed the
  duplicate pile" — the table that decides which dumps to drop.

* :func:`dup_ratio_estimate` — an unbiased duplicate-ratio estimate
  from a deterministic 1/256-granularity slice of content-hash space.
  Sampling DOCUMENTS underestimates duplication (a pair is only seen
  if both members are drawn); sampling the HASH SPACE keeps every
  duplicate cluster intact or absent as a unit, so the in-slice dup
  ratio is an unbiased estimator of the corpus ratio.  Cost: one read
  + per-row digest, and a shuffle of ONLY the sliced digests (the
  slice fraction of 16-byte keys — nothing else moves).  This is the
  pre-flight check a 100-TB run does before paying for the full
  dedup shuffle.

Scale shape (both): text never leaves the first map_batches — rows are
reduced per batch to distinct (md5-16 digest, source) pairs before
anything shuffles; the single all-to-all is a ``groupapply`` on the
digest's low half; every downstream table is bounded by the number of
distinct sources (a handful of crawl dumps), not by corpus size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dist import groupapply, tune_context

_EMPTY_U64 = np.zeros(0, dtype=np.uint64)


def _digest_source_rows(t: pa.Table, text_col: str, source_col: str,
                        slice_hex: str | None = None,
                        with_count: bool = False) -> pa.Table:
    """Per-batch DISTINCT (md5-16 digest halves, source) rows; with
    ``with_count`` also the number of input rows per distinct triple
    (the per-batch combiner).  ``slice_hex`` keeps only rows whose
    md5 hexdigest starts below the 2-hex-char bound — the same
    ``substr(md5(text), 1, 2) < bound`` predicate a DuckDB oracle can
    evaluate verbatim.  Null texts are excluded on both sides (SQL's
    ``md5(NULL)`` is NULL and fails any comparison); null sources are
    excluded too (a row without a source belongs to no overlap
    group)."""
    txt = t[text_col]
    src = t[source_col]
    valid = ~np.asarray(pc.is_null(txt).to_numpy(zero_copy_only=False))
    valid &= ~np.asarray(pc.is_null(src).to_numpy(zero_copy_only=False))
    texts = txt.to_pylist()
    n = t.num_rows
    lo = np.zeros(n, dtype=np.uint64)
    hi = np.zeros(n, dtype=np.uint64)
    for i in np.flatnonzero(valid):
        d = hashlib.md5(texts[i].encode()).digest()
        if slice_hex is not None and d[:1].hex() >= slice_hex:
            valid[i] = False
            continue
        lo[i] = int.from_bytes(d[:8], "little")
        hi[i] = int.from_bytes(d[8:], "little")
    keep = np.flatnonzero(valid)
    sd = pc.dictionary_encode(
        src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src)
    codes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tri = np.stack([lo[keep], hi[keep],
                    codes[keep].astype(np.uint64)], axis=1)
    uniq, counts = np.unique(tri, axis=0, return_counts=True)
    out = {
        "h64": pa.array(uniq[:, 0] if len(uniq) else _EMPTY_U64,
                        pa.uint64()),
        "hhi": pa.array(uniq[:, 1] if len(uniq) else _EMPTY_U64,
                        pa.uint64()),
        "source": (pa.DictionaryArray.from_arrays(
            pa.array(uniq[:, 2].astype(np.int64) if len(uniq)
                     else np.zeros(0, np.int64), pa.int32()),
            sd.dictionary).cast(pa.string())),
    }
    if with_count:
        out["c"] = pa.array(counts.astype(np.int64) if len(uniq)
                            else np.zeros(0, np.int64), pa.int64())
    return pa.table(out)


def _pair_schema() -> pa.Schema:
    return pa.schema([("source_a", pa.string()), ("source_b", pa.string()),
                      ("n", pa.int64())])


def _overlap_partition(t: pa.Table) -> pa.Table:
    """One digest-hash partition: re-dedupe (digest, source) triples
    across batches, then emit partial counts — a diagonal row
    (s, s, 1) per distinct (digest, source) and a pair row (a, b, 1)
    per unordered source pair sharing a digest.  Pair emission is
    vectorized per run-length bucket (runs longer than one are rare —
    a text seen by k sources emits C(k,2) rows; k is bounded by the
    number of distinct sources)."""
    lo = t["h64"].to_numpy(zero_copy_only=False).astype(np.uint64)
    hi = t["hhi"].to_numpy(zero_copy_only=False).astype(np.uint64)
    sd = pc.dictionary_encode(t["source"].combine_chunks())
    codes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    srcs = np.asarray(sd.dictionary.to_pylist(), dtype=object)
    tri = np.stack([lo, hi, codes.astype(np.uint64)], axis=1)
    tri = np.unique(tri, axis=0)        # cross-batch distinct
    if not len(tri):
        return pa.table({"source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    # diagonal partials: distinct keys per source
    dcode, dcnt = np.unique(tri[:, 2].astype(np.int64),
                            return_counts=True)
    sa = [srcs[dcode].tolist()]
    sb = [srcs[dcode].tolist()]
    nn = [dcnt.astype(np.int64)]
    # pair partials: runs over (lo, hi); np.unique output is already
    # lexsorted so runs are contiguous and sources ascend within a run
    key_change = np.concatenate(
        [[True], (tri[1:, 0] != tri[:-1, 0]) | (tri[1:, 1] != tri[:-1, 1])])
    run_id = np.cumsum(key_change) - 1
    run_len = np.bincount(run_id)
    starts = np.concatenate([[0], np.cumsum(run_len)[:-1]])
    for L in np.unique(run_len):
        if L < 2:
            continue
        s0 = starts[run_len == L]                      # runs of length L
        iu, ju = np.triu_indices(L, k=1)               # C(L,2) index pairs
        a_idx = (s0[:, None] + iu[None, :]).ravel()
        b_idx = (s0[:, None] + ju[None, :]).ravel()
        pa_s = srcs[tri[a_idx, 2].astype(np.int64)]
        pb_s = srcs[tri[b_idx, 2].astype(np.int64)]
        # codes order by first appearance, not lexicographically —
        # normalize each pair so source_a < source_b by STRING (the
        # SQL contract a.source < b.source)
        swap = pa_s > pb_s
        pa_s[swap], pb_s[swap] = pb_s[swap], pa_s[swap]
        sa.append(pa_s.tolist())
        sb.append(pb_s.tolist())
        nn.append(np.ones(len(a_idx), dtype=np.int64))
    flat_a = [x for part in sa for x in part]
    flat_b = [x for part in sb for x in part]
    return pa.table({"source_a": pa.array(flat_a, pa.string()),
                     "source_b": pa.array(flat_b, pa.string()),
                     "n": pa.array(np.concatenate(nn), pa.int64())})


def source_overlap(ds: ray.data.Dataset, source_col: str = "source",
                   text_col: str = "text",
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Pairwise cross-source exact-content overlap report.

    Returns one row per unordered source pair that shares at least one
    distinct text: ``(source_a, source_b, n_shared, n_a, n_b,
    jaccard_e6)`` where ``n_a``/``n_b`` are each side's distinct-text
    counts and ``jaccard_e6 = floor(1e6 * n_shared / (n_a + n_b -
    n_shared))``, sorted by (source_a, source_b) with source_a <
    source_b.

    Identity is the md5-16 content digest (the repo's documented
    2^-128 exactness posture).  Texts are distinct-ed per source
    first, so within-source duplicates don't inflate any count.

    Scale: one digest shuffle of per-batch-distinct 16-byte keys; the
    aggregate and the final report are bounded by the number of
    distinct sources squared (crawl dumps — a handful), so the
    driver-side assembly below is a bounded collect by contract.
    """
    tune_context()
    rows = ds.map_batches(
        lambda t: _digest_source_rows(t, text_col, source_col),
        batch_format="pyarrow")
    partials = groupapply(rows, "h64", _overlap_partition, num_partitions)
    agg = partials.groupby(["source_a", "source_b"]).sum("n")
    # bounded collect: <= (#distinct sources)^2 rows by construction
    diag: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        for a, bb, n in zip(b["source_a"].to_pylist(),
                            b["source_b"].to_pylist(),
                            b["sum(n)"].to_pylist()):
            if a == bb:
                diag[a] = diag.get(a, 0) + int(n)
            else:
                pairs[(a, bb)] = pairs.get((a, bb), 0) + int(n)
    out_a, out_b, shared, na, nb, jac = [], [], [], [], [], []
    for (a, bb) in sorted(pairs):
        s = pairs[(a, bb)]
        ca, cb = diag[a], diag[bb]
        out_a.append(a)
        out_b.append(bb)
        shared.append(s)
        na.append(ca)
        nb.append(cb)
        jac.append(int(np.floor(1e6 * s / (ca + cb - s))))
    return ray.data.from_arrow(pa.table({
        "source_a": pa.array(out_a, pa.string()),
        "source_b": pa.array(out_b, pa.string()),
        "n_shared": pa.array(shared, pa.int64()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nb, pa.int64()),
        "jaccard_e6": pa.array(jac, pa.int64()),
    }))


def source_overlap_sketch(ds: ray.data.Dataset,
                          source_col: str = "source",
                          text_col: str = "text",
                          num_perm: int = 128,
                          seed: int = 7) -> ray.data.Dataset:
    """Shuffle-FREE estimate of :func:`source_overlap`'s Jaccard column
    via per-source MinHash union sketches (Broder 1997): each batch
    reduces to ONE row per source present — the elementwise minimum of
    ``a_p * h + b_p`` over the batch's text digests ``h`` — and a tiny
    ``groupby(source).map_groups`` min-merges the partials (min is a
    semilattice, so duplicate texts are free and no per-batch distinct
    is needed).  Estimated Jaccard between two sources = the fraction
    of agreeing signature components; std error ≈
    ``sqrt(j(1-j)/num_perm)``.

    Returns ``(source_a, source_b, jaccard_est_e6)`` for every
    unordered source pair (including zero-overlap pairs — the sketch
    can't distinguish 0 from < 1/num_perm), sorted.  This is the
    100-TB path when even the exact report's digest shuffle is too
    big: nothing shuffles but #blocks × #sources sketch rows, and the
    result is deterministic at any parallelism (order-insensitive
    minima).  Use :func:`source_overlap` when exact counts matter.
    """
    tune_context()
    rng = np.random.default_rng(seed)
    A = rng.integers(1, 2 ** 63, size=num_perm, dtype=np.uint64) \
        * np.uint64(2) + np.uint64(1)              # odd multipliers
    B = rng.integers(0, 2 ** 63, size=num_perm, dtype=np.uint64)

    def _partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        valid = ~np.asarray(pc.is_null(txt).to_numpy(zero_copy_only=False))
        valid &= ~np.asarray(
            pc.is_null(t[source_col]).to_numpy(zero_copy_only=False))
        texts = txt.to_pylist()
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for i in np.flatnonzero(valid):
            h[i] = int.from_bytes(
                hashlib.md5(texts[i].encode()).digest()[:8], "little")
        src = t[source_col]
        sd = pc.dictionary_encode(
            src.combine_chunks() if isinstance(src, pa.ChunkedArray)
            else src)
        codes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.flatnonzero(valid)
        if not len(keep):
            return pa.table({"source": pa.array([], pa.string()),
                             "sig": pa.array([], pa.list_(pa.uint64()))})
        h, codes = h[keep], codes[keep]
        order = np.argsort(codes, kind="stable")
        h, codes = h[order], codes[order]
        brk = np.flatnonzero(codes[1:] != codes[:-1]) + 1
        starts = np.concatenate([[0], brk]).astype(np.int64)
        seg_codes = codes[starts]
        sig = np.empty((len(starts), num_perm), dtype=np.uint64)
        y = np.empty(len(h), dtype=np.uint64)
        for p in range(num_perm):
            np.multiply(h, A[p], out=y)
            np.add(y, B[p], out=y)
            sig[:, p] = np.minimum.reduceat(y, starts)
        names = sd.dictionary.to_pylist()
        return pa.table({
            "source": pa.array([names[int(c)] for c in seg_codes],
                               pa.string()),
            "sig": pa.array(list(sig), pa.list_(pa.uint64())),
        })

    def _merge(t: pa.Table) -> pa.Table:
        sigs = np.asarray(
            [np.asarray(x, dtype=np.uint64) for x in
             t["sig"].to_pylist()], dtype=np.uint64)
        return pa.table({
            "source": t["source"].slice(0, 1),
            "sig": pa.array([sigs.min(axis=0)], pa.list_(pa.uint64())),
        })

    merged = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("source").map_groups(_merge, batch_format="pyarrow")
    # bounded collect: one sketch row per distinct source by contract
    names: list[str] = []
    sigs: list[np.ndarray] = []
    for b in merged.iter_batches(batch_format="pyarrow"):
        names.extend(b["source"].to_pylist())
        sigs.extend(np.asarray(x, dtype=np.uint64)
                    for x in b["sig"].to_pylist())
    order = np.argsort(np.asarray(names, dtype=object), kind="stable")
    names = [names[int(i)] for i in order]
    S = np.asarray([sigs[int(i)] for i in order], dtype=np.uint64)
    out_a, out_b, est = [], [], []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            out_a.append(names[i])
            out_b.append(names[j])
            est.append(int(np.floor(
                1e6 * (S[i] == S[j]).sum() / num_perm)))
    return ray.data.from_arrow(pa.table({
        "source_a": pa.array(out_a, pa.string()),
        "source_b": pa.array(out_b, pa.string()),
        "jaccard_est_e6": pa.array(est, pa.int64()),
    }))


def top_shared_texts(ds: ray.data.Dataset, k: int = 20,
                     source_col: str = "source", text_col: str = "text",
                     snippet_chars: int = 80,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """Top-k texts present in the MOST distinct sources — the
    "which boilerplate crosses dumps" diagnostic that names the texts
    behind :func:`source_overlap`'s pair counts.

    Returns ``(h, snippet, n_sources, n_rows)``: the text's md5 hex
    (the deterministic tie-break a SQL oracle mirrors as
    ``md5(text)``), its first ``snippet_chars`` characters, the count
    of distinct sources carrying it, and its total row count; only
    texts in >= 2 sources qualify, ordered by (n_sources desc, h).

    Scale: per-batch distinct (digest, source, count, snippet) rows,
    ONE digest shuffle, per-partition top-k prune (<= k rows leave
    each partition), driver merge bounded at partitions x k rows.
    """
    tune_context()

    def _rows(t: pa.Table) -> pa.Table:
        base = _digest_source_rows(t, text_col, source_col,
                                   with_count=True)
        # snippet per distinct triple: first sighting of the digest in
        # this batch (same text => same snippet, so any pick agrees)
        txt = t[text_col].to_pylist()
        snip: dict[tuple, str] = {}
        src = t[source_col].to_pylist()
        for i, x in enumerate(txt):
            if x is None or src[i] is None:
                continue
            d = hashlib.md5(x.encode()).digest()
            key = (int.from_bytes(d[:8], "little"),
                   int.from_bytes(d[8:], "little"))
            if key not in snip:
                snip[key] = x[:snippet_chars]
        lo = base["h64"].to_numpy(zero_copy_only=False)
        hi = base["hhi"].to_numpy(zero_copy_only=False)
        return base.append_column("snippet", pa.array(
            [snip[(int(a), int(b))] for a, b in zip(lo, hi)],
            pa.string()))

    def _topk(t: pa.Table) -> pa.Table:
        lo = t["h64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = t["hhi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sd = pc.dictionary_encode(t["source"].combine_chunks())
        codes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        snips = t["snippet"].to_pylist()
        tri = np.stack([lo, hi, codes.astype(np.uint64)], axis=1)
        uniq, inv = np.unique(tri, axis=0, return_inverse=True)
        if not len(uniq):
            return pa.table({"h": pa.array([], pa.string()),
                             "snippet": pa.array([], pa.string()),
                             "n_sources": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        csum = np.bincount(inv, weights=c.astype(np.float64)) \
            .astype(np.int64)
        first_row = np.full(len(uniq), len(inv), dtype=np.int64)
        np.minimum.at(first_row, inv, np.arange(len(inv)))
        # per digest (runs over lexsorted uniq): distinct sources = run
        # length (triples are distinct), rows = sum of run csums
        key_change = np.concatenate(
            [[True],
             (uniq[1:, 0] != uniq[:-1, 0]) | (uniq[1:, 1] != uniq[:-1, 1])])
        run_id = np.cumsum(key_change) - 1
        n_sources = np.bincount(run_id)
        n_rows = np.bincount(run_id, weights=csum.astype(np.float64)) \
            .astype(np.int64)
        starts = np.flatnonzero(key_change)
        keep = np.flatnonzero(n_sources >= 2)
        if not len(keep):
            return pa.table({"h": pa.array([], pa.string()),
                             "snippet": pa.array([], pa.string()),
                             "n_sources": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        hexes = np.array([
            (int(uniq[starts[j], 0]).to_bytes(8, "little")
             + int(uniq[starts[j], 1]).to_bytes(8, "little")).hex()
            for j in keep], dtype=object)
        order = np.lexsort((hexes, -n_sources[keep]))[:k]
        sel = keep[order]
        return pa.table({
            "h": pa.array(hexes[order].tolist(), pa.string()),
            "snippet": pa.array(
                [snips[int(first_row[starts[j]])] for j in sel],
                pa.string()),
            "n_sources": pa.array(n_sources[sel], pa.int64()),
            "n_rows": pa.array(n_rows[sel], pa.int64()),
        })

    cands = groupapply(ds.map_batches(_rows, batch_format="pyarrow"),
                       "h64", _topk, num_partitions)
    # bounded collect: <= num_partitions * k candidate rows
    rows = []
    for b in cands.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b["h"].to_pylist(), b["snippet"].to_pylist(),
                        b["n_sources"].to_pylist(),
                        b["n_rows"].to_pylist()))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return ray.data.from_arrow(pa.table({
        "h": pa.array([r[0] for r in rows], pa.string()),
        "snippet": pa.array([r[1] for r in rows], pa.string()),
        "n_sources": pa.array([r[2] for r in rows], pa.int64()),
        "n_rows": pa.array([r[3] for r in rows], pa.int64()),
    }))


def dup_ratio_estimate(ds: ray.data.Dataset, slice_hex: str = "28",
                       source_col: str = "source",
                       text_col: str = "text",
                       num_partitions: int = 16) -> ray.data.Dataset:
    """Per-source duplicate-ratio estimate from a deterministic
    content-hash-space slice.

    Keeps only rows whose ``md5(text)`` hexdigest starts strictly
    below the 2-hex-char ``slice_hex`` bound (``'28'`` ≈ a 15.6 %
    slice; ``'zz'`` = everything, making the estimate exact) — the
    predicate a DuckDB oracle evaluates verbatim as
    ``substr(md5(text), 1, 2) < '<slice_hex>'``.  Because exact
    duplicates share the digest, a duplicate CLUSTER is entirely in or
    entirely out of the slice, so the in-slice ratio is an unbiased
    estimator of the corpus-wide ratio — unlike row sampling, which
    misses every pair whose partner wasn't drawn.

    Returns one row per source: ``(source, n_sampled, n_distinct,
    n_dup, dup_ratio_e6)`` with ``n_dup = n_sampled - n_distinct`` and
    ``dup_ratio_e6 = floor(1e6 * n_dup / n_sampled)``, sorted by
    source.  Sources with an empty slice emit nothing (matching the
    SQL GROUP BY).

    Scale: the full corpus is read once and digested per batch; ONLY
    the sliced per-batch-distinct (digest, source, count) partials
    shuffle — the pre-flight estimate costs a slice-sized shuffle, not
    a corpus-sized one.
    """
    tune_context()
    if not (slice_hex == "zz"
            or (len(slice_hex) == 2 and all(c in "0123456789abcdef"
                                            for c in slice_hex))):
        raise ValueError("slice_hex must be two lowercase hex chars "
                         "(or exactly 'zz' for the full corpus), got "
                         f"{slice_hex!r}")
    rows = ds.map_batches(
        lambda t: _digest_source_rows(t, text_col, source_col,
                                      slice_hex=slice_hex,
                                      with_count=True),
        batch_format="pyarrow")

    def _per_source(t: pa.Table) -> pa.Table:
        lo = t["h64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = t["hhi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sd = pc.dictionary_encode(t["source"].combine_chunks())
        codes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = sd.dictionary.to_pylist()
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        tri = np.stack([lo, hi, codes.astype(np.uint64)], axis=1)
        uniq, inv = np.unique(tri, axis=0, return_inverse=True)
        if not len(uniq):
            return pa.table({"source": pa.array([], pa.string()),
                             "n_sampled": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64())})
        csum = np.bincount(inv, weights=c.astype(np.float64)) \
            .astype(np.int64)                 # rows per distinct triple
        code_u = uniq[:, 2].astype(np.int64)
        dcode = np.unique(code_u)
        n_sampled = np.array(
            [csum[code_u == k].sum() for k in dcode], dtype=np.int64)
        n_distinct = np.array(
            [(code_u == k).sum() for k in dcode], dtype=np.int64)
        return pa.table({
            "source": pa.array([srcs[int(k)] for k in dcode], pa.string()),
            "n_sampled": pa.array(n_sampled, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
        })

    partials = groupapply(rows, "h64", _per_source, num_partitions)
    agg = partials.groupby("source").aggregate(
        ray.data.aggregate.Sum("n_sampled"),
        ray.data.aggregate.Sum("n_distinct"),
    )

    def _final(t: pa.Table) -> pa.Table:
        ns = t["sum(n_sampled)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nd = t["sum(n_distinct)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dup = ns - nd
        ratio = np.floor(1e6 * dup / np.maximum(ns, 1)).astype(np.int64)
        return pa.table({
            "source": t["source"],
            "n_sampled": pa.array(ns, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "n_dup": pa.array(dup, pa.int64()),
            "dup_ratio_e6": pa.array(ratio, pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow").sort("source")
