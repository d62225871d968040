"""Word-shingle hashing + MinHash signatures (vectorized, actor-pool stage).

The reference's only near-match operator is the asymmetric prefix-stem
predicate (MainViewModel.cs:1064-1072); per SURVEY.md §2.7/D3 we
generalize it to MinHash/LSH over word k-gram shingles (Broder 1997,
"On the resemblance and containment of documents").

Design notes (Ray-Data-first):
  * ``MinHashSigner`` is a callable CLASS for
    ``ds.map_batches(MinHashSigner, fn_constructor_kwargs=..., concurrency=N)``
    — the permutation table (2 x P uint64) and the token-hash cache are
    built ONCE per actor in ``__init__``, per-batch work is numpy over
    Arrow columns.
  * Per-shingle hashes are a vectorized rotate-xor combine of stable
    64-bit token hashes (blake2b, process-independent — python's
    ``hash()`` is salted and never used).
  * Signatures use the standard (a*x+b) mod 2^64 family with uint64
    wraparound; ``min`` over the shingle axis is a single numpy reduce.
  * Signature is stored as a ``binary`` column of P little-endian uint64
    (P*8 bytes) so it moves through shuffles as one buffer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

TOKEN_RE_PAT = r"\S+"


def token_hash64(token: str) -> int:
    """Stable 64-bit token hash (blake2b truncation)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization — must agree with the SQL oracle's
    ``regexp_extract_all(text, '\\S+')``."""
    return text.split()


class _TokenHasher:
    """Token -> uint64 with a bounded memo (vocab is Zipfian; the cache
    turns the per-token blake2b into a dict hit for the hot head).  The
    cap keeps long-running actors from growing without bound at web scale."""

    def __init__(self, cap: int = 1 << 21) -> None:
        self._cache: dict[str, int] = {}
        self._cap = cap

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        c = self._cache
        if len(c) > self._cap:
            c.clear()
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = c.get(t)
            if h is None:
                h = token_hash64(t)
                c[t] = h
            out[i] = h
        return out

    def hash_unique(self, dictionary: pa.Array) -> np.ndarray:
        """Hashes for a dictionary-encoded batch's UNIQUE tokens — the
        batched signing path hashes each distinct token once per batch
        (vocab is ~100x smaller than the token stream) and gathers."""
        return self.hash_tokens(dictionary.to_pylist())


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Unique 64-bit hashes of all k-gram shingles, vectorized over
    positions: h_i = XOR_j rotl64(th[i+j], 7*j).  Rotation makes the
    combine order-sensitive (['a','b'] != ['b','a'])."""
    n = len(token_hashes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    m = n - k + 1
    g = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        x = token_hashes[j : j + m]
        r = np.uint64((7 * j) % 64)
        rot = (x << r) | (x >> np.uint64((64 - 7 * j) % 64)) if j else x
        g ^= rot
    return np.unique(g)


def batch_token_codes(col, hasher: _TokenHasher):
    """Vectorized batch tokenization shared by the MinHash and SimHash
    signers: arrow whitespace split (== str.split() once empty tokens
    from leading/trailing/repeated whitespace are dropped — parity
    asserted in tests/test_kernels.py), ONE dictionary encode so each
    distinct token is hashed once per batch, positions gathered from
    the dictionary.  Returns (unique_hashes, codes, per_row_counts):
    ``unique_hashes[codes]`` is the per-position token-hash stream and
    ``counts`` its row segmentation (0 for null/empty rows)."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sp = pc.utf8_split_whitespace(pc.fill_null(col, ""))
    if isinstance(sp, pa.ChunkedArray):
        sp = sp.combine_chunks()
    offsets = sp.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_raw = sp.values
    emp = pc.equal(flat_raw, "").to_numpy(zero_copy_only=False)
    ce = np.concatenate([[0], np.cumsum(emp, dtype=np.int64)])
    counts = np.diff(offsets) - (ce[offsets[1:]] - ce[offsets[:-1]])
    d = pc.dictionary_encode(flat_raw.filter(pa.array(~emp)))
    uh = hasher.hash_unique(d.dictionary)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh, codes, counts


class MinHashSigner:
    """map_batches actor: adds a ``minhash`` binary column (P*8 bytes;
    null when the doc has fewer than k tokens — such docs cannot
    near-match, mirroring the empty-candidate path MainViewModel.cs:769-777)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 42,
                 text_col: str = "text", out_col: str = "minhash") -> None:
        rng = np.random.default_rng(seed)
        # odd multipliers for a better-mixing mod-2^64 family
        self.a = (rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.out_col = out_col
        self.hasher = _TokenHasher()

    def sign_text(self, text: str | None) -> bytes | None:
        if not text:
            return None
        th = self.hasher.hash_tokens(tokenize(text))
        sh = shingle_hashes(th, self.k)
        if len(sh) == 0:
            return None
        # (P, S) wraparound hash, min over shingles
        sig = (self.a[:, None] * sh[None, :] + self.b[:, None]).min(axis=1)
        return sig.astype("<u8").tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched signing, byte-identical to per-doc ``sign_text`` (the
        min over a shingle multiset equals the min over its distinct
        set, so the per-doc np.unique is skipped): ONE dictionary
        encode hashes each distinct token once per batch instead of a
        3.5M-iteration memo loop, shingle hashes are computed over the
        whole flattened token stream (doc-crossing positions masked via
        offsets), and the (P x shingles) wraparound-hash min runs as P
        ``minimum.reduceat`` passes over doc segments instead of one
        small allocation per doc — the profiled hot spots of the
        engine's heaviest headline stage."""
        uh, codes, counts = batch_token_codes(batch[self.text_col],
                                              self.hasher)
        nrows = len(counts)
        k = self.k
        m_i = np.maximum(counts - k + 1, 0)
        has = m_i > 0
        sigs: list = [None] * nrows
        if has.any():
            th = uh[codes]
            n = len(th)
            m = n - k + 1
            g = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                x = th[j:j + m]
                if j:
                    r = np.uint64((7 * j) % 64)
                    x = (x << r) | (x >> np.uint64((64 - 7 * j) % 64))
                g ^= x
            # per-doc valid shingle ranges [offs[d], offs[d] + m_d)
            offs = np.concatenate([[0], np.cumsum(counts)])
            starts_flat = offs[:-1][has]
            lens = m_i[has]
            total = int(lens.sum())
            seg_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            idx = (np.arange(total, dtype=np.int64)
                   - np.repeat(seg_starts, lens)
                   + np.repeat(starts_flat, lens))
            gsel = g[idx]
            P = self.num_perm
            sig = np.empty((len(lens), P), dtype="<u8")
            y = np.empty(total, dtype=np.uint64)   # reused per perm
            for p in range(P):
                np.multiply(gsel, self.a[p], out=y)
                np.add(y, self.b[p], out=y)
                sig[:, p] = np.minimum.reduceat(y, seg_starts)
            sig = np.ascontiguousarray(sig)
            for pos, di in enumerate(np.flatnonzero(has)):
                sigs[int(di)] = sig[pos].tobytes()
        return batch.append_column(self.out_col,
                                   pa.array(sigs, type=pa.binary()))


_SIGNER_CACHE: dict[tuple, "MinHashSigner"] = {}


def cached_signer(num_perm: int, shingle_k: int, seed: int,
                  text_col: str = "text") -> "MinHashSigner":
    """Process-level signer cache: Ray tasks run in reusable worker
    processes, so a module-global memo gives once-per-worker setup (the
    actor-pool property) without actor-pool startup churn — at 32+ CPUs,
    spawning dozens of single-purpose actors per stage cost more than the
    signing itself.  Actor pools remain the right tool for heavyweight
    state (models); the permutation table is 2*P uint64."""
    key = (num_perm, shingle_k, seed, text_col)
    s = _SIGNER_CACHE.get(key)
    if s is None:
        s = MinHashSigner(num_perm=num_perm, shingle_k=shingle_k, seed=seed,
                          text_col=text_col)
        _SIGNER_CACHE[key] = s
    return s


def signature_agreement(sig_a: bytes, sig_b: bytes) -> float:
    """Fraction of agreeing MinHash components — unbiased estimator of
    the shingle Jaccard similarity."""
    a = np.frombuffer(sig_a, dtype="<u8")
    b = np.frombuffer(sig_b, dtype="<u8")
    return float((a == b).mean())


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact shingle Jaccard (test/verify helper, not a pipeline stage)."""
    h = _TokenHasher()
    sa = set(shingle_hashes(h.hash_tokens(tokenize(text_a)), k).tolist())
    sb = set(shingle_hashes(h.hash_tokens(tokenize(text_b)), k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# fuzzy (MinHash) decontamination: train vs benchmark, no train shuffle
# ---------------------------------------------------------------------------


def _bench_lsh_pack(bench, num_perm: int, shingle_k: int, seed: int,
                    bands: int, id_col: str, text_col: str):
    """Sign the benchmark and pack it as numpy-only broadcast payloads
    (Ray reads numpy zero-copy from the object store — one copy per
    NODE): sorted band-key array + parallel bench row indices (the LSH
    probe table), the (m, P) signature matrix (the agreement judge),
    and the bench ids.  Bounded by the benchmark size by contract —
    benchmark suites are MBs against a TB train corpus; a benchmark too
    big to broadcast should use incremental.write_band_index instead."""
    from .dist import mix64
    from .pipeline import _band_const, _sig_matrix

    r = num_perm // bands

    def _sign(t: pa.Table) -> pa.Table:
        s = cached_signer(num_perm, shingle_k, seed, text_col=text_col)
        out = s(t)
        return out.select([id_col, "minhash"]) \
            .filter(pa.compute.invert(pa.compute.is_null(out["minhash"])))

    ids_l, sig_l = [], []
    for b in bench.map_batches(_sign, batch_format="pyarrow") \
                  .sort(id_col).iter_batches(batch_format="pyarrow"):
        ids_l.append(b[id_col].combine_chunks()
                     .to_numpy(zero_copy_only=False))
        sig_l.append(_sig_matrix(b["minhash"].combine_chunks(), num_perm))
    ids = np.concatenate(ids_l) if ids_l else np.zeros(0, np.int64)
    sigs = np.concatenate(sig_l) if sig_l else \
        np.zeros((0, num_perm), np.uint64)
    m = len(ids)
    keys = np.empty((bands, m), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(bands):
            h = np.full(m, _band_const(i), dtype=np.uint64)
            for j in range(r):
                h = mix64(h ^ sigs[:, i * r + j])
            keys[i] = h
    flat = keys.ravel()                       # band-major (bands*m,)
    rows = np.tile(np.arange(m, dtype=np.int64), bands)
    order = np.argsort(flat, kind="stable")
    return flat[order], rows[order], np.ascontiguousarray(sigs), ids


class _FuzzyDecontProber:
    """map_batches actor: signs each train batch with the SAME
    permutation family as the benchmark, probes the sorted bench band
    keys with two searchsorted calls, and confirms every band collision
    by signature agreement (the unbiased Jaccard estimator) — the exact
    two-phase screen/confirm discipline the near-dup pipeline uses."""

    def __init__(self, ref, num_perm: int, shingle_k: int, seed: int,
                 bands: int, threshold: float, id_col: str,
                 text_col: str) -> None:
        import ray
        self.key_sorted, self.row_sorted, self.bench_sigs, self.bench_ids = \
            ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.num_perm = num_perm
        self.bands = bands
        self.r = num_perm // bands
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        self.signer = cached_signer(num_perm, shingle_k, seed,
                                    text_col=text_col)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .dist import mix64
        from .pipeline import _band_const
        n = t.num_rows
        texts = t[self.text_col].to_pylist()
        sig_list = [self.signer.sign_text(x) for x in texts]
        valid = np.array([s is not None for s in sig_list], dtype=bool)
        vi = np.flatnonzero(valid)
        nv = len(vi)
        sigs = np.frombuffer(
            b"".join(sig_list[i] for i in vi), dtype="<u8") \
            .reshape(nv, self.num_perm) if nv else \
            np.zeros((0, self.num_perm), np.uint64)

        pair_t, pair_b = [], []
        with np.errstate(over="ignore"):
            for i in range(self.bands):
                h = np.full(nv, _band_const(i), dtype=np.uint64)
                for j in range(self.r):
                    h = mix64(h ^ sigs[:, i * self.r + j])
                lo = np.searchsorted(self.key_sorted, h, side="left")
                hi = np.searchsorted(self.key_sorted, h, side="right")
                cnt = hi - lo
                hitrows = np.flatnonzero(cnt)
                if not len(hitrows):
                    continue
                reps = cnt[hitrows]
                tr = np.repeat(hitrows, reps)
                idx = np.concatenate(
                    [np.arange(lo[k], hi[k]) for k in hitrows])
                pair_t.append(tr)
                pair_b.append(self.row_sorted[idx])
        if pair_t:
            pt = np.concatenate(pair_t)
            pb = np.concatenate(pair_b)
            comp = pt.astype(np.int64) * len(self.bench_ids) + pb
            comp = np.unique(comp)     # distinct (train, bench) pairs
            pt = (comp // len(self.bench_ids)).astype(np.int64)
            pb = (comp % len(self.bench_ids)).astype(np.int64)
            agree = (sigs[pt] == self.bench_sigs[pb]).mean(axis=1)
            agree_e6 = np.floor(agree * 1e6).astype(np.int64)
        else:
            pt = pb = agree_e6 = np.zeros(0, dtype=np.int64)

        n_hits = np.zeros(n, dtype=np.int64)
        best_agree = np.zeros(n, dtype=np.int64)
        best_bench = np.full(n, -1, dtype=np.int64)
        if len(pt):
            from .dist import segments
            # per train row: hit count, then best = max agreement with
            # smallest bench row (== smallest bench id; ids are sorted)
            # as the deterministic tie-break
            order = np.lexsort((pb, -agree_e6, pt))
            po, bo, ao = pt[order], pb[order], agree_e6[order]
            _, starts, _ = segments(po)       # po already sorted
            first = starts[:-1]
            rows_v = vi[po[first]]
            cnts = np.diff(starts)
            n_hits[vi[po[first]]] = cnts
            best_agree[rows_v] = ao[first]
            best_bench[rows_v] = self.bench_ids[bo[first]] \
                if self.bench_ids.dtype.kind in "iu" else bo[first]
        thr_e6 = int(np.floor(self.threshold * 1e6))
        flag = (best_agree >= thr_e6) & (best_bench != -1) \
            if thr_e6 > 0 else (n_hits > 0)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_bench_hits": pa.array(n_hits, pa.int64()),
            "best_bench_id": pa.array(best_bench, pa.int64()),
            "best_agree_e6": pa.array(best_agree, pa.int64()),
            "near_contaminated": pa.array(flag.astype(np.int64),
                                          pa.int64()),
        })


def minhash_decontaminate(train, bench, num_perm: int = 128,
                          shingle_k: int = 5, seed: int = 42,
                          bands: int = 32, threshold: float = 0.5,
                          id_col: str = "doc_id", text_col: str = "text",
                          bench_id_col: str | None = None,
                          bench_text_col: str | None = None,
                          concurrency=(1, 8)):
    """FUZZY benchmark decontamination (the near-duplicate analogue of
    ngram_decontaminate, and the text analogue of
    ann.embedding_decontaminate): flags every train doc whose MinHash
    signature band-collides with a benchmark doc AND whose signature
    agreement (unbiased Jaccard estimate) to the best colliding
    benchmark doc is >= ``threshold``.  Exact n-gram scrubs miss
    paraphrased / lightly-edited test-set leakage; this is the standard
    two-phase LSH screen + agreement confirm at benchmark granularity.

    Output per train doc: (id, n_bench_hits = distinct colliding bench
    docs, best_bench_id = highest-agreement bench doc (-1 none;
    smallest id on ties), best_agree_e6, near_contaminated 0|1).

    Scale shape: the benchmark is signed once and broadcast as
    numpy-only payloads (sorted band keys + (m, P) signature matrix —
    zero-copy per node); the train corpus is signed and probed inside
    one map_batches and NEVER shuffled.  ``threshold=0`` degrades to
    pure band-collision semantics (Broder banding, no confirm).
    ``bench_id_col`` / ``bench_text_col`` default to the train-side
    names; set them when the two tables disagree (e.g. url-keyed train
    vs doc_id-keyed benchmark — train ids pass through unchanged, any
    type).  Requires integer bench ids (``best_bench_id`` is an int64 column
    with -1 sentinel); bands must divide num_perm."""
    import ray
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    pack = _bench_lsh_pack(bench, num_perm, shingle_k, seed, bands,
                           bench_id_col or id_col,
                           bench_text_col or text_col)
    if pack[3].dtype.kind not in "iu":
        raise ValueError("minhash_decontaminate requires integer bench ids")
    if len(pack[3]) and int(pack[3].min()) < 0:
        # -1 is the best_bench_id no-hit sentinel; a bench doc with a
        # negative id could never flag anything (its hits would be
        # silently suppressed by the sentinel test), so reject up front
        raise ValueError(
            "minhash_decontaminate requires non-negative bench ids "
            "(-1 is the no-collision sentinel in best_bench_id)")
    ref = ray.put(pack)
    return train.map_batches(
        _FuzzyDecontProber,
        fn_constructor_kwargs={
            "ref": ref, "num_perm": num_perm, "shingle_k": shingle_k,
            "seed": seed, "bands": bands, "threshold": threshold,
            "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
