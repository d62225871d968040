"""Byte-pair-encoding tokenizer: distributed word-count train corpus,
driver merge training, distributed encode (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units").

This is the real version of the token-counting tier: a trained subword
vocabulary plus a distributed encoder, the step that turns a curated
corpus into model tokens.

Scale shape (the standard BPE trainer shape — HuggingFace/subword-nmt
train on the word-frequency DICT too, never the raw corpus):

    corpus --map_batches--> per-batch word value_counts   (combiner)
           --groupby(word).sum-->                         one shuffle,
                                                          vocabulary-bounded
    driver: merge loop over the distinct-word table       bounded by
            (incremental pair-count maintenance)          |vocab|, NOT corpus
    corpus --map_batches(_BpeEncoder)-->                  merge ranks
                                                          broadcast once,
                                                          per-UNIQUE-word memo

The driver stage is bounded by the distinct-word count (the same bound
``benchmark_gram_set`` / ``heavy_hitters`` document); a corpus whose
vocabulary exceeds driver memory should first cap it (``max_vocab``
keeps the most frequent words — rare-word tails contribute merges last
and least).

Determinism: merges pick (max count, then lexicographically smallest
pair) — count ties cannot depend on blocking because word counts are
exact, so the merge table (and hence every encoding) is identical at
any parallelism.  Tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

#: end-of-word marker appended to every word's symbol sequence (Sennrich
#: et al. §3.2) so merges can learn word-final units ("est</w>")
EOW = "</w>"


def word_counts(ds: ray.data.Dataset, text_col: str = "text",
                lowercase: bool = True) -> ray.data.Dataset:
    """(word, cnt) distinct-word table: per-batch value_counts combine,
    one groupby(word).sum — the shuffle carries one row per distinct
    word per batch, never the corpus (the exact_quantiles discipline)."""

    def _partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        if lowercase:
            txt = pc.utf8_lower(txt)
        toks = pc.list_flatten(
            pc.split_pattern_regex(txt, pattern=r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"word": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("word").sum("cnt")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["word", "cnt"])

    return agg.map_batches(_rename, batch_format="pyarrow")


def train_bpe(ds: ray.data.Dataset, n_merges: int = 200,
              text_col: str = "text", lowercase: bool = True,
              max_vocab: int | None = 1_000_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the merge
    list in rank order (rank 0 first) — pass to ``bpe_encode``.

    Driver work is the classic incremental trainer over the
    distinct-word table: maintain pair -> total count and pair -> the
    set of words containing it; each round merges the argmax pair and
    re-counts ONLY the affected words.  Bounded by |vocab| x avg word
    length, never the corpus."""
    wc = word_counts(ds, text_col=text_col, lowercase=lowercase)
    words_l, cnts_l = [], []
    for b in wc.iter_batches(batch_format="pyarrow"):
        words_l.extend(b["word"].to_pylist())
        cnts_l.extend(b["cnt"].to_pylist())
    if max_vocab is not None and len(words_l) > max_vocab:
        # keep the most frequent words (ties: lexicographic — determinism)
        order = sorted(range(len(words_l)),
                       key=lambda i: (-cnts_l[i], words_l[i]))[:max_vocab]
        words_l = [words_l[i] for i in order]
        cnts_l = [cnts_l[i] for i in order]
    # symbol sequences; EOW as a distinct final symbol
    seqs = [tuple(w) + (EOW,) for w in words_l]
    cnts = cnts_l

    from collections import defaultdict
    pair_cnt: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)

    def _add_word(i: int, sign: int) -> None:
        s, c = seqs[i], cnts[i]
        for a, b in zip(s, s[1:]):
            pair_cnt[(a, b)] += sign * c
            if sign > 0:
                pair_words[(a, b)].add(i)

    for i in range(len(seqs)):
        _add_word(i, +1)

    merges: list[tuple[str, str]] = []
    done: set[tuple[str, str]] = set()
    for _ in range(n_merges):
        best = None
        for p, c in pair_cnt.items():
            # a later merge can CREATE a symbol string-equal to a past
            # merge's left/right part, resurrecting the pair — never
            # merge the same pair twice (ranks must be unique)
            if c <= 0 or p in done:
                continue
            if best is None or c > pair_cnt[best] or \
                    (c == pair_cnt[best] and p < best):
                best = p
        if best is None:
            break
        done.add(best)
        merges.append(best)
        a, b = best
        ab = a + b
        affected = list(pair_words.pop(best, ()))
        pair_cnt.pop(best, None)
        for i in affected:
            s = seqs[i]
            _add_word(i, -1)
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = tuple(out)
            _add_word(i, +1)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic greedy BPE encode: repeatedly apply the lowest-rank
    applicable merge."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_rank, best_j = None, -1
        for j in range(len(s) - 1):
            r = ranks.get((s[j], s[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        s[best_j: best_j + 2] = [s[best_j] + s[best_j + 1]]
    return s


class _BpeEncoder:
    """map_batches actor: merge ranks resolved once per actor; words
    encoded once per UNIQUE word per batch (dictionary encode first)
    behind a capped cross-batch memo (the _TokenHasher discipline)."""

    def __init__(self, merges_ref, lowercase: bool, id_col: str,
                 text_col: str, memo_cap: int = 1 << 20) -> None:
        merges = ray.get(merges_ref) if isinstance(
            merges_ref, ray.ObjectRef) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.lowercase = lowercase
        self.id_col = id_col
        self.text_col = text_col
        self.memo: dict[str, int] = {}
        self.memo_cap = memo_cap

    def _n_subwords(self, w: str) -> int:
        n = self.memo.get(w)
        if n is None:
            n = len(_encode_word(w, self.ranks))
            if len(self.memo) < self.memo_cap:
                self.memo[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[self.text_col], "")
        if self.lowercase:
            txt = pc.utf8_lower(txt)
        toks = pc.split_pattern_regex(txt, pattern=r"\s+")
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parent = np.repeat(np.arange(t.num_rows), nper)[keep_np]
        d = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        uniq = d.dictionary.to_pylist()
        per_uniq = np.fromiter((self._n_subwords(w) for w in uniq),
                               dtype=np.int64, count=len(uniq))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(uniq) else np.zeros(0, np.int64)
        sub = per_uniq[codes] if len(codes) else codes
        n_words = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        n_bpe = np.bincount(parent, weights=sub.astype(np.float64),
                            minlength=t.num_rows).astype(np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        })


def bpe_encode_stats(ds: ray.data.Dataset,
                     merges: list[tuple[str, str]],
                     id_col: str = "doc_id", text_col: str = "text",
                     lowercase: bool = True,
                     concurrency=(1, 8)) -> ray.data.Dataset:
    """Per-doc subword statistics under a trained merge table:
    (id, n_words, n_bpe_tokens).  The merge table is broadcast once;
    encoding is memoized per unique word."""
    ref = ray.put(list(merges))
    return ds.map_batches(
        _BpeEncoder,
        fn_constructor_kwargs={"merges_ref": ref, "lowercase": lowercase,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
