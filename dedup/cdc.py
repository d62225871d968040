"""Content-defined chunking (CDC) — the storage-dedup tier.

Splits each document at content-defined boundaries (a rolling-hash
window value hitting a mask, the public CDC principle behind LBFS /
FastCDC — Muthitacharoen et al. 2001, Xia et al. 2016), then dedups the
chunk store globally: identical chunks across documents are detected
regardless of byte SHIFTS (insertions/prefixes move fixed-window
offsets but not content-defined boundaries — the property fixed-size
blocking lacks).  The per-document output is the storage-dedup report:
how many of a doc's chunks (and chars) already exist elsewhere.

Scale shape: chunk rows ride ONE hash shuffle on the 8-byte chunk key
(expected density 1/2^mask_bits rows per char — ~1/256 at the default,
vs 1 per char for stride-1 windows); first-occurrence keepers are
min-(doc, offset) per key inside each partition (all rows of a key
colocate), so the report is deterministic at any parallelism.  Per-doc
partials are pre-summed inside the partition; the second (tiny) shuffle
carries one row per (partition, doc).

Boundary rule (must match the test reference exactly): a cut is placed
after codepoint ``o + w - 1`` for every window start ``o`` where
``h1[o] & (2^mask_bits - 1) == 0``; h1 is the same length-``w``
polynomial rolling hash the span tier uses (spans.py:95).  No min/max
chunk clamp — the rule stays a pure function of local content
(FastCDC's clamps trade that purity for size bounds; documented
simplification).  Chunk identity = (span-hash1, span-hash2, length):
two independent 64-bit polynomial hashes of the chunk's codepoints.

Reference semantic anchor: the byte-content comparator tier
(ViewModels/FileEntryViewModel.cs:146-190 hashes whole files); CDC is
its sub-file generalization for the 100 TB corpus case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .dist import groupapply
from .spans import _B1, _B1_INV, _B2, _B2_INV, _codepoints, _powers

#: expected chunk length = 2^DEFAULT_MASK_BITS codepoints
DEFAULT_MASK_BITS = 8
DEFAULT_WINDOW = 16


def chunk_doc(cp: np.ndarray, mask_bits: int = DEFAULT_MASK_BITS,
              w: int = DEFAULT_WINDOW) -> np.ndarray:
    """Chunk START offsets (always beginning with 0) for one document's
    codepoints under the boundary rule above.  Vectorized: one rolling-
    hash pass + one flatnonzero."""
    n = len(cp)
    if n <= w:
        return np.zeros(1, dtype=np.int64)
    pw = _powers(_B1, n)
    inv = _powers(_B1_INV, n - w + 1)
    s = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(cp.astype(np.uint64) * pw, out=s[1:])
    h1 = (s[w:] - s[:-w]) * inv
    mask = np.uint64((1 << mask_bits) - 1)
    cuts = np.flatnonzero((h1 & mask) == 0).astype(np.int64) + w
    cuts = cuts[cuts < n]
    return np.concatenate([[0], cuts])


def _chunk_rows(t: pa.Table, id_col: str, text_col: str,
                mask_bits: int, w: int) -> pa.Table:
    """(k1, k2, len, doc, offset) rows, one per chunk."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t[text_col].to_pylist()
    k1_l, k2_l, ln_l, d_l, o_l = [], [], [], [], []
    for i, txt in enumerate(texts):
        if not txt:
            continue
        cp = _codepoints(txt)
        n = len(cp)
        starts = chunk_doc(cp, mask_bits, w)
        ends = np.concatenate([starts[1:], [n]])
        p1 = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(cp.astype(np.uint64) * _powers(_B1, n), out=p1[1:])
        p2 = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(cp.astype(np.uint64) * _powers(_B2, n), out=p2[1:])
        i1 = _powers(_B1_INV, n + 1)
        i2 = _powers(_B2_INV, n + 1)
        k1_l.append((p1[ends] - p1[starts]) * i1[starts])
        k2_l.append((p2[ends] - p2[starts]) * i2[starts])
        ln_l.append(ends - starts)
        d_l.append(np.full(len(starts), ids[i], dtype=np.int64))
        o_l.append(starts)
    if not k1_l:
        return pa.table({"k1": pa.array([], pa.uint64()),
                         "k2": pa.array([], pa.uint64()),
                         "ln": pa.array([], pa.int64()),
                         "doc": pa.array([], pa.int64()),
                         "off": pa.array([], pa.int64())})
    return pa.table({
        "k1": pa.array(np.concatenate(k1_l), pa.uint64()),
        "k2": pa.array(np.concatenate(k2_l), pa.uint64()),
        "ln": pa.array(np.concatenate(ln_l).astype(np.int64), pa.int64()),
        "doc": pa.array(np.concatenate(d_l), pa.int64()),
        "off": pa.array(np.concatenate(o_l), pa.int64()),
    })


def cdc_report(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text",
               mask_bits: int = DEFAULT_MASK_BITS,
               w: int = DEFAULT_WINDOW,
               num_partitions: int = 16) -> ray.data.Dataset:
    """Per-document storage-dedup report over the global chunk store:
    (id, n_chunks, dup_chunks, n_chars, dup_chars, dup_ratio_e6) where
    a chunk occurrence is DUP iff an identical chunk (same two span
    hashes + length) occurs at a globally smaller (doc, offset) — the
    first occurrence is the stored copy, every later one dedups against
    it.  Docs with null/empty text get a zero row."""

    rows = ds.map_batches(
        lambda t: _chunk_rows(t, id_col, text_col, mask_bits, w),
        batch_format="pyarrow")

    def _mark(t: pa.Table) -> pa.Table:
        k1 = t["k1"].to_numpy(zero_copy_only=False)
        k2 = t["k2"].to_numpy(zero_copy_only=False)
        ln = t["ln"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        off = t["off"].to_numpy(zero_copy_only=False)
        # group EXACTLY by (k1, k2, ln) inside the k1-routed partition
        order = np.lexsort((off, doc, ln, k2, k1))
        k1s, k2s, lns = k1[order], k2[order], ln[order]
        docs, offs = doc[order], off[order]
        if len(order):
            new = np.concatenate([[True], (k1s[1:] != k1s[:-1])
                                  | (k2s[1:] != k2s[:-1])
                                  | (lns[1:] != lns[:-1])])
        else:
            new = np.zeros(0, dtype=bool)
        is_dup = ~new  # sorted by (doc, off) within key: first = keeper
        # per-(partition, doc) partials
        u, inv = np.unique(docs, return_inverse=True)
        nb = np.bincount(inv, minlength=len(u)).astype(np.int64)
        dup = np.bincount(inv, weights=is_dup.astype(np.float64),
                          minlength=len(u)).astype(np.int64)
        chars = np.bincount(inv, weights=lns.astype(np.float64),
                            minlength=len(u)).astype(np.int64)
        dchars = np.bincount(inv, weights=(lns * is_dup).astype(np.float64),
                             minlength=len(u)).astype(np.int64)
        return pa.table({
            id_col: pa.array(u, pa.int64()),
            "n_chunks": pa.array(nb, pa.int64()),
            "dup_chunks": pa.array(dup, pa.int64()),
            "n_chars": pa.array(chars, pa.int64()),
            "dup_chars": pa.array(dchars, pa.int64()),
        })

    keyed = rows.map_batches(
        lambda t: t.rename_columns(["skey", "k2", "ln", "doc", "off"]),
        batch_format="pyarrow")

    def _mark_with_key(t: pa.Table) -> pa.Table:
        return _mark(t.rename_columns(["k1", "k2", "ln", "doc", "off"]))

    partials = groupapply(keyed, "skey", _mark_with_key, num_partitions)

    def _zeros(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "n_chunks": z, "dup_chunks": z,
                         "n_chars": z, "dup_chars": z})

    per_doc = partials.union(
        ds.select_columns([id_col]).map_batches(_zeros,
                                                batch_format="pyarrow")) \
        .groupby(id_col).aggregate(
            ray.data.aggregate.Sum("n_chunks"),
            ray.data.aggregate.Sum("dup_chunks"),
            ray.data.aggregate.Sum("n_chars"),
            ray.data.aggregate.Sum("dup_chars"))

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns([id_col, "n_chunks", "dup_chunks",
                              "n_chars", "dup_chars"])
        ch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        dc = t["dup_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = np.where(ch > 0, dc * 1_000_000 // np.maximum(ch, 1), 0)
        return t.append_column("dup_ratio_e6",
                               pa.array(ratio.astype(np.int64), pa.int64()))

    return per_doc.map_batches(_final, batch_format="pyarrow").sort(id_col)
