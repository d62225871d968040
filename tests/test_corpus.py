"""Corpus-level ops: C4-style global line dedup, n-gram decontamination."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data

from dedup.corpus import gram_rows, line_dedup, ngram_decontaminate


def _naive_line_dedup(texts):
    """First-global-occurrence line dedup (winner = min (doc, idx))."""
    seen = set()
    out = []
    for txt in texts:
        kept = []
        lines = (txt or "").split("\n")
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out.append((len(lines), len(kept), "\n".join(kept)))
    return out


TEXTS = [
    "header\nbody one\nfooter",
    "header\nbody two\nfooter",          # loses header+footer
    "body one\nfresh line",              # loses body one
    "",                                  # single empty line (first owner)
    "x\n\ny",                            # its empty line is a dup of doc 3's
    "header",                            # fully removed -> empty rebuild
]


def test_line_dedup_matches_naive():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(TEXTS))), "text": TEXTS}))
    got = line_dedup(ds).sort("doc_id").to_pandas()
    want = _naive_line_dedup(TEXTS)
    assert got["doc_id"].tolist() == list(range(len(TEXTS)))
    assert got["n_lines"].tolist() == [w[0] for w in want]
    assert got["n_kept"].tolist() == [w[1] for w in want]
    assert got["text_dedup"].tolist() == [w[2] for w in want]
    # the fully-boilerplate doc rebuilds to empty
    assert got["text_dedup"].tolist()[5] == ""


def test_line_dedup_deterministic_across_partitions():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "header", "footer"]
    texts = ["\n".join(rng.choice(vocab, size=rng.integers(1, 6)))
             for _ in range(200)]
    t = pa.table({"doc_id": list(range(200)), "text": texts})
    a = line_dedup(ray.data.from_arrow(t), num_partitions=2) \
        .sort("doc_id").to_pandas()
    b = line_dedup(ray.data.from_arrow(t).repartition(7),
                   num_partitions=13).sort("doc_id").to_pandas()
    assert a.equals(b)
    want = _naive_line_dedup(texts)
    assert a["text_dedup"].tolist() == [w[2] for w in want]


def test_gram_rows_matches_naive():
    texts = ["a b c d", "a  b\nc", "", None, "one"]
    grams, parent = gram_rows(pa.array(texts, pa.string()), 2)
    naive = []
    for i, txt in enumerate(texts):
        toks = [x for x in re.split(r"\s+", txt or "") if x]
        naive += [(i, f"{u} {v}") for u, v in zip(toks, toks[1:])]
    assert list(zip(parent.tolist(), grams.to_pylist())) == naive


def test_ngram_decontaminate_counts():
    train = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox", "clean text here entirely",
                 "quick brown fox quick brown fox"],
    }))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": [10], "text": ["lazy quick brown fox dog"]}))
    out = ngram_decontaminate(train, bench, n=3).sort("doc_id").to_pandas()
    # "quick brown fox" is the only shared 3-gram; doc 2 contains it twice
    assert out["n_grams"].tolist() == [2, 2, 4]
    assert out["n_contaminated"].tolist() == [1, 0, 2]
    assert out["contaminated"].tolist() == [1, 0, 1]


def test_ngram_decontaminate_short_docs():
    train = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1], "text": ["too short", None]}))
    bench = ray.data.from_arrow(pa.table({"doc_id": [9], "text": ["a b c"]}))
    out = ngram_decontaminate(train, bench, n=3).sort("doc_id").to_pandas()
    assert out["n_grams"].tolist() == [0, 0]
    assert out["contaminated"].tolist() == [0, 0]


def test_ngram_decontaminate_bloom_matches_broadcast():
    """The bloom screen + exact-confirm scale path must be
    byte-identical to broadcast mode (no false negatives by bloom
    construction; false positives removed by the string confirm) —
    including occurrence counts, zero-gram docs, and duplicate grams."""
    import pandas as pd
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(150)]
    mk = lambda: " ".join(rng.choice(words, size=int(rng.integers(2, 30))))
    train_rows = [{"doc_id": i, "text": mk()} for i in range(120)]
    bench_rows = [{"doc_id": 900 + i, "text": mk()} for i in range(25)]
    train_rows[3]["text"] += " " + bench_rows[4]["text"]   # partial overlap
    train_rows[9]["text"] = bench_rows[0]["text"]          # verbatim copy
    train_rows[11]["text"] = ""                            # zero grams
    train = ray.data.from_items(train_rows).repartition(5)
    bench = ray.data.from_items(bench_rows).repartition(3)
    a = ngram_decontaminate(train, bench, n=5).sort("doc_id").to_pandas()
    # high fpp stresses the confirm stage (many false bloom hits)
    b = ngram_decontaminate(train, bench, n=5, mode="bloom",
                            bloom_fpp=0.2, num_partitions=7) \
        .sort("doc_id").to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert a.loc[a.doc_id == 9, "contaminated"].iloc[0] == 1
    assert a.loc[a.doc_id == 3, "contaminated"].iloc[0] == 1


def test_ngram_decontaminate_bloom_string_ids():
    import pandas as pd
    train = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b", "c"],
        "text": ["the quick brown fox", "clean text here entirely",
                 "quick brown fox quick brown fox"]}))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": ["z"], "text": ["lazy quick brown fox dog"]}))
    a = ngram_decontaminate(train, bench, n=3).sort("doc_id").to_pandas()
    b = ngram_decontaminate(train, bench, n=3, mode="bloom") \
        .sort("doc_id").to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert b["n_contaminated"].tolist() == [1, 0, 2]


def test_quota_sample_matches_naive_and_partition_invariant():
    import hashlib
    from dedup.textstats import quota_sample
    rng = np.random.default_rng(3)
    langs = rng.choice(["en", "de", "fr"], size=120).tolist()
    t = pa.table({"doc_id": list(range(120)), "lang": langs})
    got = quota_sample(ray.data.from_arrow(t), k=10).to_pandas()
    # naive: per lang, 10 smallest md5(str(id))
    want = []
    for lang in sorted(set(langs)):
        ids = [i for i, l in zip(range(120), langs) if l == lang]
        pick = sorted(ids, key=lambda i: hashlib.md5(str(i).encode())
                      .hexdigest())[:10]
        want += sorted((lang, i) for i in pick)
    assert list(zip(got["lang"], got["doc_id"])) == want
    again = quota_sample(ray.data.from_arrow(t).repartition(9),
                         k=10).to_pandas()
    assert got.equals(again)


def test_cluster_size_hist():
    from dedup.pipeline import cluster_size_hist
    t = pa.table({
        "doc_id": [0, 1, 2, 3, 4, 5, 6],
        "state": ["keep", "delete", "keep", "delete", "delete", "unique",
                  "keep"],
        "cluster_size": [2, 2, 3, 3, 3, 1, 2],
    })
    out = cluster_size_hist(ray.data.from_arrow(t)).to_pandas()
    # two clusters of size 2, one of size 3; uniques not counted
    assert out["cluster_size"].tolist() == [2, 3]
    assert out["n_clusters"].tolist() == [2, 1]


def test_exact_quantiles_matches_duckdb_rule():
    import duckdb
    from dedup.textstats import exact_quantiles
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, size=337).tolist() + [7] * 40  # heavy ties
    t = pa.table({"doc_id": list(range(len(vals))), "n": vals})
    got = exact_quantiles(ray.data.from_arrow(t).repartition(5), "n")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT count(n), min(n), max(n), quantile_disc(n, 0.25), "
        "quantile_disc(n, 0.5), quantile_disc(n, 0.75), "
        "quantile_disc(n, 0.9), quantile_disc(n, 0.99) FROM t").fetchone()
    assert [c[0].as_py() for c in got.columns] == [int(x) for x in want]


def test_approx_quantiles_exact_when_sample_covers():
    """k >= n: the bottom-k sample IS the corpus, so the sketch answer
    must equal exact_quantiles bit-for-bit."""
    from dedup.textstats import approx_quantiles, exact_quantiles
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, size=400).tolist()
    t = pa.table({"doc_id": list(range(len(vals))), "n": vals})
    ds = ray.data.from_arrow(t).repartition(5)
    got = approx_quantiles(ds, "n", k=4096)
    want = exact_quantiles(ray.data.from_arrow(t).repartition(5), "n")
    assert got.to_pydict() == want.to_pydict()


def test_approx_quantiles_bounded_error_and_blocking_invariant():
    from dedup.textstats import QUANTILES, approx_quantiles
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 100_000, size=20_000)
    t = pa.table({"doc_id": list(range(len(vals))), "n": vals.tolist()})
    k = 512
    a = approx_quantiles(ray.data.from_arrow(t).repartition(3), "n", k=k)
    b = approx_quantiles(ray.data.from_arrow(t).repartition(17), "n", k=k)
    assert a.to_pydict() == b.to_pydict()   # md5 priorities, not blocking
    assert a["n_docs"][0].as_py() == k
    for lab, num, den in QUANTILES:
        q = num / den
        approx_v = a[lab][0].as_py()
        rank = (vals <= approx_v).mean()
        assert abs(rank - q) <= 4 * np.sqrt(q * (1 - q) / k) + 1 / k, lab


def test_chunk_documents_matches_naive():
    from dedup.textstats import chunk_documents
    texts = []
    for n in [0, 1, 7, 8, 9, 20, 33, 100]:
        texts.append(" ".join(f"t{i}" for i in range(n)))
    texts.append(None)
    texts.append("  a   b  ")  # ragged whitespace
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ct, ov = 8, 3
    step = ct - ov
    got = chunk_documents(ray.data.from_arrow(t).repartition(3),
                          chunk_tokens=ct, overlap=ov) \
        .sort(["doc_id", "chunk_idx"]).to_pandas()
    rows = []
    for did, txt in enumerate(texts):
        toks = (txt or "").split()
        n = len(toks)
        if n == 0:
            continue
        nc = 1 + -(-max(n - ct, 0) // step)
        for i in range(nc):
            piece = toks[i * step: i * step + ct]
            rows.append((did, i, len(piece), " ".join(piece)))
    assert list(map(tuple, got.itertuples(index=False))) == rows


def test_compression_ratio_matches_zlib_and_orders_quality():
    import zlib
    from dedup.textstats import compression_ratio
    boiler = "spam spam spam " * 50          # compresses hard
    prose = " ".join(f"w{i}x{i * 7 % 13}" for i in range(150))
    texts = [boiler, prose, "", None]
    t = pa.table({"doc_id": [0, 1, 2, 3], "text": texts})
    out = compression_ratio(ray.data.from_arrow(t).repartition(2)) \
        .sort("doc_id").to_pandas()
    for i, s in enumerate(texts):
        b = (s or "").encode()
        assert out.loc[i, "n_bytes"] == len(b)
        want = len(zlib.compress(b, 6)) if b else 0
        assert out.loc[i, "compressed_bytes"] == want
    # repetitive boilerplate compresses far below varied prose
    assert out.loc[0, "ratio_e6"] < out.loc[1, "ratio_e6"]
    # degenerate docs pin to 1e6, never "best quality"
    assert out.loc[2, "ratio_e6"] == 1_000_000
    assert out.loc[3, "ratio_e6"] == 1_000_000


def test_chunk_documents_rejects_bad_overlap():
    import pytest
    from dedup.textstats import chunk_documents
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["a b"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_tokens=8, overlap=8)


def test_exact_quantiles_empty_and_single():
    from dedup.textstats import exact_quantiles
    empty = pa.table({"n": pa.array([], pa.int64())})
    out = exact_quantiles(ray.data.from_arrow(empty), "n")
    assert out["n_docs"][0].as_py() == 0
    one = pa.table({"n": pa.array([42], pa.int64())})
    out1 = exact_quantiles(ray.data.from_arrow(one), "n")
    assert out1["p50"][0].as_py() == 42 and out1["p99"][0].as_py() == 42


def test_pack_sequences_matches_naive():
    from dedup.corpus import pack_sequences
    rng = np.random.default_rng(5)
    toks = rng.integers(0, 40, size=200).tolist()
    # shuffled, non-dense ids exercise the range bucketing
    ids = (np.arange(200) * 3 + 17).tolist()
    t = pa.table({"doc_id": ids, "n_tokens": toks})
    got = pack_sequences(ray.data.from_arrow(t).repartition(7), budget=64,
                         ids_per_range=50, num_partitions=5) \
        .sort("doc_id").to_pandas()
    order = np.argsort(ids)
    prefix = 0
    want = {}
    for j in order:
        want[ids[j]] = (prefix // 64, prefix % 64)
        prefix += toks[j]
    assert got["doc_id"].tolist() == sorted(ids)
    for _, r in got.iterrows():
        assert (r["pack_id"], r["pack_offset"]) == want[r["doc_id"]]


def test_token_doc_freq_counts_docs_not_occurrences():
    from dedup.textstats import token_doc_freq
    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["cat cat cat dog", "cat fish", None],
    })
    out = token_doc_freq(ray.data.from_arrow(t), k=10).to_pandas()
    got = dict(zip(out["token"], out["df"]))
    assert got == {"cat": 2, "dog": 1, "fish": 1}
    # tie order: df desc, token asc
    assert out["token"].tolist() == ["cat", "dog", "fish"]


def test_url_dedup_canonicalization_and_states():
    from dedup.corpus import canonicalize_urls, url_dedup
    urls = [
        "https://www.ex.com/p/1",          # all five spellings of ex.com/p/1
        "http://ex.com/p/1",
        "ex.com/p/1/",
        "https://ex.com/p/1#frag",
        "https://ex.com/p/1?utm_source=x",
        "https://other.com/q",             # unique
        "https://other.com/q?real=1",      # real query survives -> unique
        None,                              # null -> '' cluster of 2
        "#justfrag",
    ]
    canon = canonicalize_urls(pa.array(urls, pa.string())).to_pylist()
    assert canon[:5] == ["ex.com/p/1"] * 5
    assert canon[5] == "other.com/q"
    assert canon[6] == "other.com/q?real=1"
    assert canon[7] == "" and canon[8] == ""

    ds = ray.data.from_items(
        [{"doc_id": i, "url": u} for i, u in enumerate(urls)])
    out = url_dedup(ds).sort("doc_id").to_pandas()
    assert out["state"].tolist() == [
        "keep", "delete", "delete", "delete", "delete",
        "unique", "unique", "keep", "delete"]
    assert out["cluster_size"].tolist() == [5, 5, 5, 5, 5, 1, 1, 2, 2]


def test_url_dedup_deterministic_across_partitions():
    from dedup.corpus import url_dedup
    rng = np.random.default_rng(7)
    urls = [f"https://www.s{int(rng.integers(0, 40))}.com/p/"
            f"{int(rng.integers(0, 30))}" + ("/" if i % 2 else "")
            for i in range(200)]
    t = pa.table({"doc_id": list(range(200)), "url": urls})
    a = url_dedup(ray.data.from_arrow(t), num_partitions=3) \
        .sort("doc_id").to_pandas()
    b = url_dedup(ray.data.from_arrow(t).repartition(11),
                  num_partitions=8).sort("doc_id").to_pandas()
    assert a.equals(b)
    # keeper is min doc_id per canonical group
    mins = a.groupby("canonical_url")["doc_id"].transform("min")
    sizes = a.groupby("canonical_url")["doc_id"].transform("size")
    want = np.where(sizes == 1, "unique",
                    np.where(a["doc_id"] == mins, "keep", "delete"))
    assert a["state"].tolist() == want.tolist()


def test_line_dedup_min_line_chars_exempts_short_lines():
    texts = ["short\nthis is a much longer shared line here\nshort",
             "short\nthis is a much longer shared line here\nother tail line x"]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = line_dedup(ds, min_line_chars=8).sort("doc_id").to_pandas()
    # 'short' (5 chars) exempt -> survives in both docs everywhere;
    # the long shared line dedups to doc 0
    assert out.loc[0, "text_dedup"] == texts[0]
    assert out.loc[1, "text_dedup"] == "short\nother tail line x"
    assert out["n_kept"].tolist() == [3, 2]


def test_doc_line_dedup_matches_naive():
    from dedup.corpus import doc_line_dedup
    texts = [
        "a\nb\na\nc\nb",          # dups of a and b
        "x\nx\nx",                # all identical -> one survivor
        "",                       # empty text -> one empty line, kept
        "solo",                   # single line
        None,                     # null -> treated as ''
        "p\nq",                   # no dups
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, pa.string())}))
    got = doc_line_dedup(ds).sort("doc_id").to_pandas()

    def naive(t):
        lines = (t or "").split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        return len(lines), len(kept), "\n".join(kept)

    want = [naive(t) for t in texts]
    assert got["n_lines"].tolist() == [w[0] for w in want]
    assert got["n_kept"].tolist() == [w[1] for w in want]
    assert got["text_dedup"].tolist() == [w[2] for w in want]
    # no shuffle: a doc's result must not depend on other docs — run the
    # worst doc alone and compare
    solo = doc_line_dedup(ray.data.from_arrow(pa.table(
        {"doc_id": [1], "text": ["x\nx\nx"]}))).to_pandas()
    assert solo["text_dedup"].tolist() == ["x"]


def test_doc_line_dedup_property_random():
    """Random corpora (empty lines, repeats, unicode, multi-char sep)
    match the per-doc naive rule."""
    import random
    from dedup.corpus import doc_line_dedup
    rng = random.Random(5)
    pool = ["", "a", "b", "ab", "x y", "ü", "line-1", "\t"]
    for sep in ("\n", "\n\n", "||"):
        texts = []
        for _ in range(40):
            k = rng.randint(0, 6)
            texts.append(sep.join(rng.choice(pool) for _ in range(k))
                         if k else rng.choice(pool))
        ds = ray.data.from_arrow(pa.table({
            "doc_id": list(range(len(texts))),
            "text": pa.array(texts, pa.string())}))
        got = doc_line_dedup(ds, sep=sep).sort("doc_id").to_pandas()

        for i, t in enumerate(texts):
            lines = (t or "").split(sep)
            seen, kept = set(), []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            row = got.iloc[i]
            assert row["n_lines"] == len(lines), (sep, i, t)
            assert row["n_kept"] == len(kept), (sep, i, t)
            assert row["text_dedup"] == sep.join(kept), (sep, i, t)


def test_normalize_text_table_forms_and_flags():
    """NFC recomposition, NFKC compatibility folding, accent strip via
    NFKD + mark removal, whitespace collapse, null propagation."""
    import pyarrow as pa
    from dedup.corpus import normalize_text_table
    composed = "café"            # é precomposed
    decomposed = "café"         # e + combining acute
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "text": [composed, decomposed, "ﬁne",  # fi ligature
                           "  A\t\nB  ", None]})
    # NFC: composed == decomposed afterwards
    out = normalize_text_table(t, lower=False, collapse_ws=False)
    v = out["text_norm"].to_pylist()
    assert v[0] == v[1] == composed
    assert v[4] is None
    # NFKC folds the ligature
    out = normalize_text_table(t, form="NFKC", lower=False,
                               collapse_ws=False)
    assert out["text_norm"].to_pylist()[2] == "fine"
    # strip_marks drops the accent entirely
    out = normalize_text_table(t, strip_marks=True)
    v = out["text_norm"].to_pylist()
    assert v[0] == v[1] == "cafe"
    assert v[3] == "a b"
