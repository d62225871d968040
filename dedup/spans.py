"""Exact duplicated-SPAN removal (Lee et al. 2022 semantics).

Where ``dedup.pipeline``'s substring passes flag DOCUMENT pairs that
share a long verbatim run, this operator rewrites the documents
themselves: every length-``L`` character window that occurs more than
once in the corpus keeps exactly its first occurrence — minimum
(doc_id, offset) — and every other occurrence's character range is cut
from its document (overlapping cut windows merge into maximal runs).
This is the span-level generalization of the reference's byte
comparator (FileEntryViewModel.cs:192-247): equality decided on content,
winner decided by the deterministic global order.

Scale shape — two hash shuffles over the sampled-window table, never a
global suffix array:

    map_batches: per doc, TWO independent 64-bit polynomial rolling
        hashes over the codepoint array (vectorized: cumsum of
        byte*B^t, window hash = (S[o+L]-S[o]) * B^-o with an ODD base,
        invertible mod 2^64) -> rows (h1, h2, doc, offset), one per
        window start, sampled every ``stride`` positions
    -> groupapply(h1): groups by (h1, h2); in each group of >= 2 every
        occurrence but the (doc, offset) minimum becomes a cut row
    -> groupapply(doc): cut rows + the original texts co-locate; the
        kernel merges [o, o+L) intervals and rebuilds the text

The 128-bit combined hash stands in for byte verification (collision
odds ~2^-128 per pair — negligible at any corpus size; documented
divergence from the carry-the-bytes alternative, which would multiply
shuffle volume by L).

Window-emission modes (the shuffle-volume dial):

* ``mode='winnow'`` (DEFAULT — the 100-TB-safe setting): emit only
  winnowing-selected window starts — the rightmost-minimum ``h1`` in
  every sliding window of ``winnow_window`` consecutive starts
  (Schleimer, Karlin & Aiken 2003, "Winnowing: local algorithms for
  document fingerprinting").  Selection is content-defined, so every
  occurrence of a selected window value is selected wherever its
  surrounding ``W-1`` starts are also shared — the standard guarantee:
  any duplicated run of length >= L + winnow_window - 1 shares at
  least one selected window in all its copies and gets cut.  Expected
  emission density is 2/(winnow_window+1) rows per character
  (~0.12 at the default W=16) instead of 1, bounding shuffle volume;
  runs shorter than the guarantee threshold may survive (documented
  approximation, same trade as Lee et al.'s min-length).
* ``mode='exact'``: one row per window start (optionally strided) —
  exact per-window semantics, the SQL-checkable contract; stride-1 is
  the small-corpus exactness mode and the driver-oracle configuration.
  ``stride=s > 1`` samples starts and still detects every duplicated
  run of length >= L + s - 1, but sampling is position- (not content-)
  defined, so winnow dominates it at equal density.

Both modes are deterministic at any parallelism: selection depends only
on each document's own text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dist import groupapply, segments

_B1 = np.uint64(0x9E3779B97F4A7C15 | 1)   # odd -> invertible mod 2^64
_B2 = np.uint64(0xC2B2AE3D27D4EB4F | 1)
_B1_INV = np.uint64(pow(int(_B1), -1, 1 << 64))
_B2_INV = np.uint64(pow(int(_B2), -1, 1 << 64))


def _codepoints(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


#: per-process memo of geometric power arrays B^0..B^k — the cumprod
#: chain is serial (non-SIMD) and was the hot spot of per-doc window
#: hashing; powers depend only on the base, so each worker computes
#: them once at the largest length seen and slices thereafter.
_POW_CACHE: dict[int, np.ndarray] = {}


def _powers(base: np.uint64, n: int) -> np.ndarray:
    arr = _POW_CACHE.get(int(base))
    if arr is None or len(arr) < n:
        size = n if arr is None else max(n, 2 * len(arr))
        pw = np.ones(size, dtype=np.uint64)
        pw[1:] = base
        arr = np.cumprod(pw, dtype=np.uint64)
        _POW_CACHE[int(base)] = arr
    return arr[:n]


def _window_hashes(cp: np.ndarray, L: int,
                   base: np.uint64, base_inv: np.uint64) -> np.ndarray:
    """Rolling hash of every length-L window (len(cp)-L+1 values),
    fully vectorized: S[k] = sum cp[t]*B^t, H[o] = (S[o+L]-S[o])*B^-o.
    uint64 arithmetic wraps mod 2^64 by construction."""
    n = len(cp)
    pw = _powers(base, n)                           # B^t (memoized)
    inv = _powers(base_inv, n - L + 1)              # B^-o (memoized)
    s = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(cp.astype(np.uint64) * pw, out=s[1:])
    return (s[L:] - s[:-L]) * inv


def _selected_starts(h1: np.ndarray, mode: str, stride: int,
                     W: int) -> np.ndarray:
    """Window starts to emit for one document.

    'exact': every stride-th start.  'winnow': the argmin of h1 in
    every sliding window of W consecutive starts (classic winnowing
    selection; content-defined, so shared runs share selected starts).
    Ties break LEFTMOST (argmin default) — a valid winnowing convention
    with the same guarantee, and the contiguous-view argmin is ~10x
    faster than the reversed-view rightmost variant; 64-bit hash ties
    are ~impossible anyway.  O(m*W) vectorized — W is small."""
    m = len(h1)
    if mode == "exact":
        return np.arange(0, m, stride)
    if m <= W:
        return np.array([int(h1.argmin())], dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(h1, W)
    return np.unique(np.arange(len(sw), dtype=np.int64) +
                     sw.argmin(axis=1))


def _window_rows(t: pa.Table, id_col: str, text_col: str, L: int,
                 mode: str, stride: int, W: int) -> pa.Table:
    """Per-doc rolling hashes -> (h1, h2, d, o) rows for the selected
    window starts (shared by span_dedup and top_spans)."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t[text_col].to_pylist()
    h1_l, h2_l, d_l, o_l = [], [], [], []
    for i, txt in enumerate(texts):
        if txt is None:
            continue
        cp = _codepoints(txt)
        if len(cp) < L:
            continue
        h1 = _window_hashes(cp, L, _B1, _B1_INV)
        h2 = _window_hashes(cp, L, _B2, _B2_INV)
        sel = _selected_starts(h1, mode, stride, W)
        h1_l.append(h1[sel])
        h2_l.append(h2[sel])
        d_l.append(np.full(len(sel), ids[i], dtype=np.int64))
        o_l.append(sel.astype(np.int64))
    if not h1_l:
        return pa.table({"h1": pa.array([], pa.uint64()),
                         "h2": pa.array([], pa.uint64()),
                         "d": pa.array([], pa.int64()),
                         "o": pa.array([], pa.int64())})
    return pa.table({
        "h1": pa.array(np.concatenate(h1_l), pa.uint64()),
        "h2": pa.array(np.concatenate(h2_l), pa.uint64()),
        "d": pa.array(np.concatenate(d_l), pa.int64()),
        "o": pa.array(np.concatenate(o_l), pa.int64()),
    })


def span_dedup(ds: ray.data.Dataset, L: int = 50, stride: int = 1,
               mode: str = "winnow", winnow_window: int = 16,
               id_col: str = "doc_id", text_col: str = "text",
               num_partitions: int = 32) -> ray.data.Dataset:
    """Corpus-wide duplicated-span removal.  Output one row per doc:
    (id, n_chars, n_removed, text_dedup), deterministic at any
    parallelism (winner = min (doc_id, offset) per selected window
    value).  ``id_col`` must be integer.  ``mode`` picks the emission
    density (module docstring): 'winnow' (default, web-scale) emits
    ~2/(winnow_window+1) rows/char; 'exact' with stride=1 is the full
    per-window SQL contract."""
    if mode not in ("winnow", "exact"):
        raise ValueError(f"mode must be 'winnow'|'exact', got {mode!r}")

    def _windows(t: pa.Table) -> pa.Table:
        return _window_rows(t, id_col, text_col, L, mode, stride,
                            winnow_window)

    wins = ds.map_batches(_windows, batch_format="pyarrow")

    def _losers(t: pa.Table) -> pa.Table:
        """Per (h1, h2) group: every occurrence but the (d, o) minimum
        is cut.  One lexsort; group firsts survive."""
        h1 = t["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = t["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t["d"].to_numpy(zero_copy_only=False)
        o = t["o"].to_numpy(zero_copy_only=False)
        if len(h1) == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "o": pa.array([], pa.int64()),
                             "dh": pa.array([], pa.uint64())})
        order = np.lexsort((o, d, h2, h1))
        g1, g2 = h1[order], h2[order]
        new_grp = np.concatenate(
            [[True], (g1[1:] != g1[:-1]) | (g2[1:] != g2[:-1])])
        grp_id = np.cumsum(new_grp) - 1
        grp_size = np.bincount(grp_id)
        dup = grp_size[grp_id] > 1          # group has >= 2 occurrences
        loser = dup & ~new_grp              # everything but the first
        keep_idx = order[loser]
        return pa.table({
            "d": pa.array(d[keep_idx], pa.int64()),
            "o": pa.array(o[keep_idx], pa.int64()),
            "dh": pa.array(d[keep_idx].astype(np.uint64), pa.uint64()),
        })

    cuts = groupapply(wins, "h1", _losers, num_partitions)

    def _doc_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "d": pa.array(ids, pa.int64()),
            "o": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "dh": pa.array(ids.astype(np.uint64), pa.uint64()),
            "text": pc.fill_null(t[text_col], ""),
        })

    def _cut_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "d": t["d"], "o": t["o"], "dh": t["dh"],
            "text": pa.nulls(t.num_rows, pa.string()),
        })

    side = ds.map_batches(_doc_rows, batch_format="pyarrow").union(
        cuts.map_batches(_cut_rows, batch_format="pyarrow"))

    def _rebuild(t: pa.Table) -> pa.Table:
        o = t["o"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        is_doc = o == -1
        doc_d = d[is_doc]
        doc_txt = np.asarray(
            t.filter(pa.array(is_doc))["text"].to_numpy(
                zero_copy_only=False), dtype=object)
        cut_d = d[~is_doc]
        cut_o = o[~is_doc]
        # group cuts by doc via one argsort
        corder, cstarts, cuniq = segments(cut_d.astype(np.uint64))
        cut_by_doc = {int(cuniq[g]): cut_o[corder[cstarts[g]:cstarts[g + 1]]]
                      for g in range(len(cuniq))}
        out_d, out_n, out_r, out_t = [], [], [], []
        for j in np.argsort(doc_d, kind="stable"):
            did = int(doc_d[j])
            txt = doc_txt[j]
            cp = _codepoints(txt)
            n = len(cp)
            co = cut_by_doc.get(did)
            if co is None or n == 0:
                out_d.append(did)
                out_n.append(n)
                out_r.append(0)
                out_t.append(txt)
                continue
            diff = np.zeros(n + 1, dtype=np.int64)
            np.add.at(diff, np.minimum(co, n), 1)
            np.add.at(diff, np.minimum(co + L, n), -1)
            covered = np.cumsum(diff[:-1]) > 0
            kept = cp[~covered]
            out_d.append(did)
            out_n.append(n)
            out_r.append(int(covered.sum()))
            out_t.append(kept.tobytes().decode("utf-32-le"))
        return pa.table({
            id_col: pa.array(out_d, pa.int64()),
            "n_chars": pa.array(out_n, pa.int64()),
            "n_removed": pa.array(out_r, pa.int64()),
            "text_dedup": pa.array(out_t, pa.string()),
        })

    return groupapply(side, "dh", _rebuild, num_partitions)


def top_spans(ds: ray.data.Dataset, L: int = 50, k: int = 20,
              min_count: int = 2, stride: int = 1,
              mode: str = "winnow", winnow_window: int = 16,
              id_col: str = "doc_id", text_col: str = "text",
              num_partitions: int = 32) -> pa.Table:
    """Boilerplate discovery: the k most-duplicated length-L windows in
    the corpus.  Output (span, n_occ, n_docs, rep_doc, rep_offset),
    ordered by (n_occ desc, rep) — rep is the window's first
    (doc, offset) occurrence, which both breaks ties deterministically
    and lets the span TEXT be recovered with one tiny second pass
    instead of carrying L chars per window through the shuffle.

    Shape: the same selected-window shuffle as span_dedup, a per-group
    count + per-partition top-k prune, a small global sort, then one
    map over the corpus extracting the k spans from their rep docs.
    Under mode='winnow' occurrence counts cover selected windows only
    (the boilerplate ranking is over fingerprinted spans); mode='exact'
    stride-1 counts every window — the SQL contract."""
    if mode not in ("winnow", "exact"):
        raise ValueError(f"mode must be 'winnow'|'exact', got {mode!r}")

    def _windows(t: pa.Table) -> pa.Table:
        return _window_rows(t, id_col, text_col, L, mode, stride,
                            winnow_window)

    wins = ds.map_batches(_windows, batch_format="pyarrow")

    def _grp(t: pa.Table) -> pa.Table:
        h1 = t["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = t["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t["d"].to_numpy(zero_copy_only=False)
        o = t["o"].to_numpy(zero_copy_only=False)
        empty = pa.table({"n_occ": pa.array([], pa.int64()),
                          "rep64": pa.array([], pa.uint64()),
                          "n_docs": pa.array([], pa.int64())})
        if len(h1) == 0:
            return empty
        order = np.lexsort((o, d, h2, h1))
        g1, g2, gd, go = h1[order], h2[order], d[order], o[order]
        new_grp = np.concatenate(
            [[True], (g1[1:] != g1[:-1]) | (g2[1:] != g2[:-1])])
        grp_id = np.cumsum(new_grp) - 1
        n_occ = np.bincount(grp_id)
        new_doc = new_grp | np.concatenate([[True], gd[1:] != gd[:-1]])
        n_docs = np.bincount(grp_id, weights=new_doc).astype(np.int64)
        starts = np.flatnonzero(new_grp)
        rep64 = (gd[starts].astype(np.uint64) << np.uint64(32)) | \
            go[starts].astype(np.uint64)
        keep = n_occ >= min_count
        if not keep.any():
            return empty
        n_occ, n_docs, rep64 = n_occ[keep], n_docs[keep], rep64[keep]
        # partition-local prune to top-k by (n_occ desc, rep64 asc)
        pr = np.lexsort((rep64, -n_occ))[:k]
        return pa.table({
            "n_occ": pa.array(n_occ[pr].astype(np.int64), pa.int64()),
            "rep64": pa.array(rep64[pr], pa.uint64()),
            "n_docs": pa.array(n_docs[pr], pa.int64()),
        })

    pruned = groupapply(wins, "h1", _grp, num_partitions)
    top = pruned.sort(["n_occ", "rep64"],
                      descending=[True, False]).limit(k).take_all()
    if not top:
        return pa.table({"span": pa.array([], pa.string()),
                         "n_occ": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "rep_doc": pa.array([], pa.int64()),
                         "rep_offset": pa.array([], pa.int64())})
    want: dict[int, list[tuple[int, int]]] = {}
    for rank, row in enumerate(top):
        rd = int(row["rep64"]) >> 32
        ro = int(row["rep64"]) & 0xFFFFFFFF
        want.setdefault(rd, []).append((ro, rank))

    def _extract(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ranks, spans = [], []
        hit = np.isin(ids, np.fromiter(want, dtype=np.int64))
        for i in np.flatnonzero(hit):
            txt = t[text_col][int(i)].as_py() or ""
            for ro, rank in want[int(ids[i])]:
                ranks.append(rank)
                spans.append(txt[ro:ro + L])
        return pa.table({"rank": pa.array(ranks, pa.int64()),
                         "span": pa.array(spans, pa.string())})

    by_rank = {int(r["rank"]): r["span"]
               for r in ds.map_batches(_extract,
                                       batch_format="pyarrow").take_all()}
    return pa.table({
        "span": pa.array([by_rank[i] for i in range(len(top))], pa.string()),
        "n_occ": pa.array([int(r["n_occ"]) for r in top], pa.int64()),
        "n_docs": pa.array([int(r["n_docs"]) for r in top], pa.int64()),
        "rep_doc": pa.array([int(r["rep64"]) >> 32 for r in top], pa.int64()),
        "rep_offset": pa.array([int(r["rep64"]) & 0xFFFFFFFF for r in top],
                               pa.int64()),
    })


def _mix128(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Combine the two independent 64-bit window hashes into one probe
    key (odd-multiplier mix, wraps mod 2^64).  Collision odds ~2^-64
    per cross pair — the repo's documented screening posture; the exact
    mode confirms against the real strings anyway."""
    return h1 * _B1 + h2


def _bench_window_rows(t: pa.Table, L: int, mode: str, W: int,
                       text_col: str) -> pa.Table:
    """Per-batch distinct benchmark window rows for span_decontaminate:
    ``h`` = per-doc-distinct mixed window hashes (the probe screen);
    in exact mode also ``s`` = per-doc-distinct window STRINGS (the
    confirm set), deduped by VALUE — not by hash — so two distinct
    benchmark windows colliding on the 64-bit mixed hash both reach the
    confirm set and counts stay exactly equal to the SQL contract.  The
    two columns are independent sets, padded with nulls to a common
    length (they differ only under such a collision)."""
    texts = t[text_col].to_pylist()
    hs: list[np.ndarray] = []
    ss: list[str] = []
    for txt in texts:
        cp = _codepoints(txt) if txt else np.zeros(0, np.uint32)
        if len(cp) < L:
            continue
        h1 = _window_hashes(cp, L, _B1, _B1_INV)
        h2 = _window_hashes(cp, L, _B2, _B2_INV)
        if mode == "winnow":
            sel = _selected_starts(h1, "winnow", 1, W)
        else:
            sel = np.arange(len(h1), dtype=np.int64)
        hs.append(np.unique(_mix128(h1[sel], h2[sel])))
        if mode == "exact":
            ss.extend({txt[int(o):int(o) + L] for o in sel})
    h = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
    if mode == "exact":
        n = max(len(h), len(ss))
        return pa.table({
            "h": pa.array(list(h) + [None] * (n - len(h)), pa.uint64()),
            "s": pa.array(ss + [None] * (n - len(ss)), pa.string()),
        })
    return pa.table({"h": pa.array(h, pa.uint64())})


class _SpanProber:
    """map_batches actor for span_decontaminate's train side: resolves
    the broadcast benchmark window index once per actor, probes each
    batch vectorized (searchsorted screen on the mixed hash; exact mode
    then extracts ONLY the screened windows and confirms their strings
    with one pc.is_in, so hash collisions cannot inflate counts and the
    50x window-string expansion never materializes for clean text)."""

    def __init__(self, href, sref, L: int, mode: str, W: int,
                 id_col: str, text_col: str, emit: str = "flag") -> None:
        self.hset = ray.get(href) if isinstance(href, ray.ObjectRef) \
            else href                      # sorted uint64 bench keys
        self.strings = (ray.get(sref) if isinstance(sref, ray.ObjectRef)
                        else sref) if sref is not None else None
        self.L, self.mode, self.W = L, mode, W
        self.id_col, self.text_col = id_col, text_col
        self.emit = emit

    def _screen(self, h: np.ndarray) -> np.ndarray:
        if not len(h) or not len(self.hset):
            return np.zeros(len(h), dtype=bool)
        idx = np.searchsorted(self.hset, h)
        idx[idx == len(self.hset)] = 0
        return self.hset[idx] == h

    def __call__(self, t: pa.Table) -> pa.Table:
        L, texts = self.L, t[self.text_col].to_pylist()
        n_win = np.zeros(t.num_rows, dtype=np.int64)
        n_hit = np.zeros(t.num_rows, dtype=np.int64)
        # (row, offset, window string) to confirm
        cand: list[tuple[int, int, str]] = []
        for i, txt in enumerate(texts):
            cp = _codepoints(txt) if txt else np.zeros(0, np.uint32)
            if len(cp) < L:
                continue
            h1 = _window_hashes(cp, L, _B1, _B1_INV)
            if self.mode == "winnow":
                sel = _selected_starts(h1, "winnow", 1, self.W)
                h1 = h1[sel]
                h2 = _window_hashes(cp, L, _B2, _B2_INV)[sel]
            else:
                sel = np.arange(len(h1), dtype=np.int64)
                h2 = _window_hashes(cp, L, _B2, _B2_INV)
            n_win[i] = len(sel)
            hit = self._screen(_mix128(h1, h2))
            if self.strings is None:       # winnow: hash-confirmed only
                n_hit[i] = int(hit.sum())
            else:                          # exact: string-confirm hits
                for o in sel[hit]:
                    cand.append((i, int(o), txt[int(o):int(o) + L]))
        cut_by_row: dict[int, list[int]] = {}
        if self.strings is not None and cand:
            rows = np.fromiter((c[0] for c in cand), np.int64, len(cand))
            offs = np.fromiter((c[1] for c in cand), np.int64, len(cand))
            ok = pc.is_in(pa.array([c[2] for c in cand], pa.string()),
                          value_set=self.strings) \
                .to_numpy(zero_copy_only=False)
            np.add.at(n_hit, rows[ok], 1)
            if self.emit == "cut":
                for r, o in zip(rows[ok], offs[ok]):
                    cut_by_row.setdefault(int(r), []).append(int(o))
        flag = (n_hit > 0).astype(np.int64)
        col = "n_windows" if self.mode == "exact" else "n_anchors"
        out = {
            self.id_col: t[self.id_col],
            col: pa.array(n_win, pa.int64()),
            "n_contaminated": pa.array(n_hit, pa.int64()),
            "span_contaminated": pa.array(flag, pa.int64()),
        }
        if self.emit == "cut":
            # rewrite each contaminated doc: merge the confirmed
            # [o, o+L) windows into maximal runs and drop the covered
            # codepoints (same diff-array kernel as span_dedup's
            # rebuild); clean docs pass through byte-identical
            clean, removed = [], np.zeros(t.num_rows, dtype=np.int64)
            for i, txt in enumerate(texts):
                co = cut_by_row.get(i)
                if not co or not txt:
                    clean.append(txt)
                    continue
                cp = _codepoints(txt)
                n = len(cp)
                diff = np.zeros(n + 1, dtype=np.int64)
                offs_i = np.asarray(co, dtype=np.int64)
                np.add.at(diff, np.minimum(offs_i, n), 1)
                np.add.at(diff, np.minimum(offs_i + L, n), -1)
                covered = np.cumsum(diff[:-1]) > 0
                removed[i] = int(covered.sum())
                clean.append(cp[~covered].tobytes().decode("utf-32-le"))
            out["n_removed_chars"] = pa.array(removed, pa.int64())
            out["text_clean"] = pa.array(clean, pa.string())
        return pa.table(out)


def span_decontaminate(train: ray.data.Dataset, bench: ray.data.Dataset,
                       L: int = 50, mode: str = "winnow",
                       winnow_window: int = 16, id_col: str = "doc_id",
                       text_col: str = "text", emit: str = "flag",
                       concurrency=(1, 8)) -> ray.data.Dataset:
    """Character-level benchmark decontamination: flags every train doc
    that shares a verbatim length-``L`` character span with the
    benchmark corpus — the substring analogue of ngram_decontaminate
    (token grams miss overlaps that cross tokenization, e.g. punctuated
    or reformatted quotes; Lee et al. 2022 dedup verbatim 50-char runs
    for exactly this reason).  Output per train doc:
    (id, n_windows|n_anchors, n_contaminated, span_contaminated).

    ``mode='exact'``: every window start on both sides; the benchmark's
    distinct window (hash, string) pairs are collected once (bounded by
    benchmark size — a benchmark too large for that should be the probe
    side) and broadcast; train windows are screened by hash and hits
    are string-confirmed, so counts equal the SQL contract
    ``count(positions p where substr(train, p, L) IN bench windows)``
    exactly — including under mixed-hash collisions among benchmark
    windows (the confirm set is deduped by string VALUE, the hash is
    only a screen; a colliding train window is screened in and then
    rejected by the string confirm).

    ``mode='winnow'`` (default — the scale path): both sides emit only
    winnowing-selected anchors (Schleimer, Karlin & Aiken 2003), so the
    broadcast is ~2/(W+1) of the window count and the standard
    guarantee holds: any shared span of length >= L + winnow_window - 1
    shares an anchor in both copies and is caught.  Shorter overlaps
    may be missed (documented approximation); matching is on the mixed
    128->64-bit hash (~2^-64 false-hit odds, no string confirm).

    The train side is never shuffled and never re-read: one map_batches
    pass, bench index broadcast via ray.put — the same shape as the
    other three decontamination modalities (token-gram, fuzzy MinHash,
    embedding), completing the verbatim-substring corner.

    ``emit='flag'`` (default) returns per-doc counts + the
    span_contaminated flag; ``emit='cut'`` (exact mode only — window
    positions must be exact to cut precisely) additionally REWRITES
    each contaminated doc, dropping the merged [o, o+L) runs of every
    confirmed benchmark window (the GPT-3-style scrub that removes the
    leaked span but keeps the document), adding
    (n_removed_chars, text_clean) columns.  Still one map_batches over
    the train side — the cut is batch-local."""
    if mode not in ("exact", "winnow"):
        raise ValueError(f"unknown span_decontaminate mode {mode!r}")
    if emit not in ("flag", "cut"):
        raise ValueError(f"unknown span_decontaminate emit {emit!r}")
    if emit == "cut" and mode != "exact":
        raise ValueError("emit='cut' requires mode='exact' (winnow "
                         "anchors are sparse; they flag docs but cannot "
                         "bound the overlapping span)")
    W = winnow_window

    # driver-side union of per-batch-distinct rows — bounded by the
    # benchmark's distinct window/anchor count (same posture as
    # benchmark_gram_set: the benchmark is the small side by contract).
    # Hash keys and confirm strings are independent SETS (strings deduped
    # by value), so mixed-hash collisions among benchmark windows cannot
    # drop a string from the confirm set.
    hset: set[int] = set()
    sset: set[str] = set()
    for b in bench.map_batches(
            lambda t: _bench_window_rows(t, L, mode, W, text_col),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        hset.update(x for x in b["h"].to_pylist() if x is not None)
        if mode == "exact":
            sset.update(x for x in b["s"].to_pylist() if x is not None)
    keys = np.array(sorted(hset), dtype=np.uint64)
    href = ray.put(keys)
    sref = ray.put(pa.array(sorted(sset), pa.string())) \
        if mode == "exact" else None
    return train.map_batches(
        _SpanProber,
        fn_constructor_kwargs={"href": href, "sref": sref, "L": L,
                               "mode": mode, "W": W, "id_col": id_col,
                               "text_col": text_col, "emit": emit},
        batch_format="pyarrow", concurrency=concurrency)
