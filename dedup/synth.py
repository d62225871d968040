"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Generates the ``input_hint`` schema from BASELINE.json —
``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string`` — with planted duplicate structure (exact / near /
simhash-near / substring / short / error / unique classes) and a
``truth`` sidecar table carrying the ground-truth cluster assignments.
All generation is seeded pure Python; NO external data.

The html column is rendered by a fixed template such that
``dedup.extract.extract_text(html) == text`` byte-for-byte (the
reference's byte-comparator invariant, MainViewModel.cs:1094-1146).
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text
from .keys import order_key_bytes
from .minhash import _TokenHasher, jaccard, tokenize
from .simhash import hamming64, simhash64

# class fractions (FIXTURES.md F1.1); remainder is 'unique'
_FRAC = {"exact": 0.15, "near": 0.15, "simhash": 0.05, "substring": 0.05,
         "short": 0.04, "error": 0.01}

_HOSTS = [f"host{i:02d}.example.org" for i in range(50)]
_SEGS = ["news", "blog", "docs", "shop", "wiki", "forum", "media", "data"]
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en",
          "de", "fr", "es", "nl"]


def _word_pool(seed: int = 7, n: int = 5000) -> list[str]:
    rng = random.Random(seed)
    syl = ["ra", "ko", "ti", "mu", "zel", "pha", "dor", "vin", "qua", "sto",
           "ble", "car", "nex", "ol", "tri", "wes", "yor", "gam", "hul", "iv"]
    pool: set[str] = set()
    while len(pool) < n:
        w = "".join(rng.choice(syl) for _ in range(rng.randint(2, 4)))
        pool.add(w)
    return sorted(pool)


def _doc_words(rng: random.Random, pool: list[str], lo: int = 50, hi: int = 5000) -> list[str]:
    n = int(min(hi, max(lo, rng.lognormvariate(5.0, 0.6))))
    return [rng.choice(pool) for _ in range(n)]


def _edit(rng: random.Random, words: list[str], pool: list[str], frac: float) -> list[str]:
    """Seeded swap/delete/insert edits on roughly ``frac`` of the words."""
    out = list(words)
    n_edits = max(1, int(len(out) * frac))
    for _ in range(n_edits):
        op = rng.random()
        i = rng.randrange(len(out))
        if op < 0.5:
            out[i] = rng.choice(pool)
        elif op < 0.75 and len(out) > 10:
            del out[i]
        else:
            out.insert(i, rng.choice(pool))
    return out


def _render_html(text: str, i: int) -> bytes:
    return (
        f"<html><head><title>page {i}</title></head><body>"
        f"<nav>site navigation | section links | search</nav>"
        f"<p>{text}</p>"
        f"<footer>copyright synthetic corpus {i % 7}</footer>"
        f"</body></html>"
    ).encode("utf-8")


def generate_pages(n_docs: int, seed: int = 42, shingle_k: int = 5,
                   min_doc_bytes: int = 64):
    """Returns (pages: pyarrow.Table, truth: pyarrow.Table).

    truth columns: url, cluster_id (int64, -1 = none), cluster_class,
    expected_state — expected under scope='all' with exact+near+simhash+
    substring passes all enabled at the generator's shingle config."""
    rng = random.Random(seed)
    pool = _word_pool()
    hasher = _TokenHasher()

    # --- build docs: list of (class, cluster, text|None) -----------------
    counts = {c: int(n_docs * f) for c, f in _FRAC.items()}
    docs: list[tuple[str, int, str | None]] = []
    cluster = 0

    def add_cluster(cls: str, texts: list[str | None]) -> None:
        nonlocal cluster
        for t in texts:
            docs.append((cls, cluster, t))
        cluster += 1

    # exact clusters (size 2-8, byte-identical text)
    left = counts["exact"]
    while left > 0:
        size = min(left, rng.randint(2, 8))
        if size < 2:
            break
        t = " ".join(_doc_words(rng, pool))
        add_cluster("exact", [t] * size)
        left -= size

    # near clusters (size 2-5, edit rate tuned to Jaccard in [0.7, 0.95])
    left = counts["near"]
    while left > 0:
        size = min(left, rng.randint(2, 5))
        if size < 2:
            break
        base = _doc_words(rng, pool, lo=80)
        texts = [" ".join(base)]
        for _ in range(size - 1):
            frac = rng.uniform(0.005, 0.03)
            for _try in range(8):
                cand = " ".join(_edit(rng, base, pool, frac))
                if 0.70 <= jaccard(texts[0], cand, shingle_k) <= 0.97:
                    break
                frac *= 0.5
            texts.append(cand)
        add_cluster("near", texts)
        left -= size

    # simhash-near pairs: long docs differing by <=3 fingerprint bits
    left = counts["simhash"]
    while left >= 2:
        base = _doc_words(rng, pool, lo=400, hi=2000)
        fp_a = simhash64(hasher.hash_tokens(base))
        for _try in range(12):
            other = list(base)
            for _ in range(rng.randint(1, 2)):
                other[rng.randrange(len(other))] = rng.choice(pool)
            fp_b = simhash64(hasher.hash_tokens(other))
            if 0 < hamming64(fp_a, fp_b) <= 3:
                break
        add_cluster("simhash", [" ".join(base), " ".join(other)])
        left -= 2

    # substring pairs: one text is a verbatim >=256-char block of the other
    left = counts["substring"]
    while left >= 2:
        big = " ".join(_doc_words(rng, pool, lo=300, hi=3000))
        lo = rng.randrange(0, max(1, len(big) - 600))
        block = big[lo : lo + rng.randint(300, 600)]
        # snap to word boundaries so the block is clean text
        block = block.strip()
        add_cluster("substring", [big, block])
        left -= 2

    # short rows (ignored; some byte-identical pairs that must NOT match)
    left = counts["short"]
    while left > 0:
        t = " ".join(rng.choice(pool) for _ in range(rng.randint(2, 6)))[: min_doc_bytes - 1].strip()
        if left >= 2 and rng.random() < 0.4:
            add_cluster("short", [t, t])
            left -= 2
        else:
            add_cluster("short", [t])
            left -= 1

    # error rows (null text, undecodable html)
    for _ in range(max(1, counts["error"])):
        add_cluster("error", [None])

    while len(docs) < n_docs:
        add_cluster("unique", [" ".join(_doc_words(rng, pool))])
    docs = docs[:n_docs]

    # --- interleave deterministically, assign urls/ts/lang ---------------
    order = list(range(len(docs)))
    rng.shuffle(order)

    cluster_lang: dict[int, str] = {}
    cluster_ts_shared: dict[int, bool] = {}
    ts_base = 1_704_067_200_000_000  # 2024-01-01 UTC in us

    urls, tss, htmls, texts, langs = [], [], [], [], []
    cls_by_row, clu_by_row = [], []
    for row_i, doc_i in enumerate(order):
        cls, clu, text = docs[doc_i]
        host = _HOSTS[rng.randrange(50) if rng.random() < 0.5 else row_i % 7]
        seg = _SEGS[row_i % len(_SEGS)]
        if rng.random() < 0.01:
            slug = f"doc{rng.randrange(1, 10 ** rng.randint(1, 6))}"
        else:
            slug = f"page-{row_i}"
        url = f"https://{host}/{seg}/{slug}-{row_i}.html"
        lang = cluster_lang.setdefault(clu, rng.choice(_LANGS))
        shared = cluster_ts_shared.setdefault(clu, rng.random() < 0.5)
        ts = ts_base + (clu if shared else row_i) * 61_000_000 + (0 if shared else row_i % 997)
        if cls == "error":
            html = b"\xff\xfe\x00broken"
            text = None
        else:
            html = _render_html(text, row_i)
            assert extract_text(html) == text, "extract invariant violated at gen time"
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        cls_by_row.append(cls)
        clu_by_row.append(clu)

    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })

    # --- ground truth ----------------------------------------------------
    # keeper = min member in global order (order_key_bytes of url, roots=())
    members: dict[int, list[int]] = {}
    for i, clu in enumerate(clu_by_row):
        members.setdefault(clu, []).append(i)
    expected = [""] * len(urls)
    truth_cluster = [-1] * len(urls)
    for clu, rows in members.items():
        cls = cls_by_row[rows[0]]
        if cls == "error":
            for r in rows:
                expected[r] = "error"
        elif cls == "short":
            for r in rows:
                expected[r] = "ignored"
        elif len(rows) == 1:
            expected[rows[0]] = "unique"
        else:
            keeper = min(rows, key=lambda r: order_key_bytes(urls[r]))
            for r in rows:
                expected[r] = "keep" if r == keeper else "delete"
                truth_cluster[r] = clu
    truth = pa.table({
        "url": pa.array(urls, pa.string()),
        "cluster_id": pa.array(truth_cluster, pa.int64()),
        "cluster_class": pa.array(cls_by_row, pa.string()),
        "expected_state": pa.array(expected, pa.string()),
    })
    return pages, truth


def write_pages(out_dir: str, n_docs: int, seed: int = 42, num_files: int = 8,
                min_doc_bytes: int = 64) -> dict[str, str]:
    """Write a multi-file pages corpus + truth sidecar; idempotent (skips
    if a _SUCCESS marker for the same params exists).  Multi-file output
    gives Ray >=num_files input blocks (FIXTURES.md F4)."""
    marker = os.path.join(out_dir, f"_SUCCESS.{n_docs}.{seed}.{num_files}")
    pages_dir = os.path.join(out_dir, "pages")
    truth_path = os.path.join(out_dir, "truth.parquet")
    if os.path.exists(marker):
        return {"pages": pages_dir, "truth": truth_path}
    pages, truth = generate_pages(n_docs, seed=seed, min_doc_bytes=min_doc_bytes)
    os.makedirs(pages_dir, exist_ok=True)
    step = (pages.num_rows + num_files - 1) // num_files
    for f in range(num_files):
        chunk = pages.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{f:05d}.parquet"))
    pq.write_table(truth, truth_path)
    with open(marker, "w") as fh:
        fh.write("ok")
    return {"pages": pages_dir, "truth": truth_path}


def generate_hotband_pages(n_docs: int, hot_frac: float = 0.05,
                           seed: int = 42) -> pa.Table:
    """Hot-band stress corpus (VERDICT r1 item 9): ``hot_frac`` of the
    docs share ~90% boilerplate text (the web-template analogue), so LSH
    band buckets hold the ENTIRE hot set and the band-key groupby is
    maximally skewed; the remainder are unique docs.  No truth sidecar —
    the acceptance checks are (a) all hot docs land in one cluster
    (connectivity survives lsh_salt) and (b) salted throughput >=
    unsalted.  Same pages schema as generate_pages."""
    rng = random.Random(seed)
    pool = _word_pool()
    n_hot = int(n_docs * hot_frac)
    boiler = " ".join(rng.choice(pool) for _ in range(270))
    urls, tss, htmls, texts, langs = [], [], [], [], []
    ts_base = 1_704_067_200_000_000
    for i in range(n_docs):
        if i < n_hot:
            tail = " ".join(rng.choice(pool) for _ in range(20))
            text = f"{boiler} {tail}"
        else:
            text = " ".join(rng.choice(pool)
                            for _ in range(rng.randint(60, 200)))
        host = _HOSTS[i % len(_HOSTS)]
        urls.append(f"https://{host}/{_SEGS[i % len(_SEGS)]}/hb-{i}.html")
        tss.append(ts_base + i * 61_000_000)
        htmls.append(_render_html(text, i))
        texts.append(text)
        langs.append("en")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_hotband_pages(out_dir: str, n_docs: int, hot_frac: float = 0.05,
                        seed: int = 42, num_files: int = 32) -> dict[str, str]:
    """Write (idempotent, _SUCCESS-marked) hotband corpus shards."""
    marker = os.path.join(out_dir,
                          f"_SUCCESS.{n_docs}.{hot_frac}.{seed}.{num_files}")
    pages_dir = os.path.join(out_dir, "pages")
    if os.path.exists(marker):
        return {"pages": pages_dir, "n_hot": str(int(n_docs * hot_frac))}
    pages = generate_hotband_pages(n_docs, hot_frac=hot_frac, seed=seed)
    os.makedirs(pages_dir, exist_ok=True)
    step = (pages.num_rows + num_files - 1) // num_files
    for f in range(num_files):
        chunk = pages.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir,
                                               f"part-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return {"pages": pages_dir, "n_hot": str(int(n_docs * hot_frac))}


def generate_embedding_clusters(n_groups: int = 40, group_size: int = 5,
                                n_singletons: int = 800, dim: int = 32,
                                noise: float = 0.05,
                                seed: int = 42) -> pa.Table:
    """Planted semantic-dup fixture for SemDeDup-style ops: ``n_groups``
    tight clusters (a random unit center + gaussian noise small enough
    that within-group cosine stays >= ~0.99) plus ``n_singletons``
    isotropic background vectors (pairwise cosine concentrates near 0 at
    this dim, far below any dedup threshold).  Truth: ``cluster_id`` =
    min vec_id of the planted group, -1 for singletons.  Columns match
    the testdata embeddings table (vec_id, embedding) + truth."""
    import numpy as np
    rng = np.random.default_rng(seed)
    vecs, truth = [], []
    vid = 0
    first_of_group = {}
    for g in range(n_groups):
        c = rng.normal(size=dim)
        c /= np.linalg.norm(c)
        for _ in range(group_size):
            v = c + rng.normal(scale=noise / np.sqrt(dim), size=dim)
            if g not in first_of_group:
                first_of_group[g] = vid
            vecs.append(v)
            truth.append(g)
            vid += 1
    for _ in range(n_singletons):
        v = rng.normal(size=dim)
        vecs.append(v / np.linalg.norm(v))
        truth.append(-1)
        vid += 1
    ids = np.arange(vid, dtype=np.int64)
    cluster = np.array([first_of_group[g] if g >= 0 else -1 for g in truth],
                       dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "cluster_id": pa.array(cluster, pa.int64()),
    })


def write_embedding_clusters(out_dir: str, n_groups: int = 40,
                             group_size: int = 5, n_singletons: int = 800,
                             dim: int = 32, seed: int = 42) -> dict[str, str]:
    """Write (idempotent, _SUCCESS-marked) the planted embedding fixture:
    embeddings.parquet (vec_id, embedding) + truth.parquet sidecar."""
    marker = os.path.join(
        out_dir, f"_SUCCESS.{n_groups}.{group_size}.{n_singletons}.{dim}.{seed}")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    truth_path = os.path.join(out_dir, "truth.parquet")
    if os.path.exists(marker):
        return {"embeddings": emb_path, "truth": truth_path}
    t = generate_embedding_clusters(n_groups=n_groups, group_size=group_size,
                                    n_singletons=n_singletons, dim=dim,
                                    seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(t.select(["vec_id", "embedding"]), emb_path)
    pq.write_table(t.select(["vec_id", "cluster_id"]), truth_path)
    with open(marker, "w") as fh:
        fh.write("ok")
    return {"embeddings": emb_path, "truth": truth_path}


def write_embedding_corpus(out_dir: str, n_vecs: int = 500_000,
                           dim: int = 32, dup_frac: float = 0.2,
                           seed: int = 42,
                           num_files: int = 16) -> dict[str, str]:
    """Scale-probe embedding corpus (fully numpy-vectorized, no per-row
    Python): ``dup_frac`` of the vectors are near-copies (tiny gaussian
    perturbation, cosine ~0.999) of an earlier vector; the rest are
    isotropic unit vectors (pairwise cosine ~N(0, 1/dim) — far below a
    0.9 dedup threshold at this dim).  Idempotent via _SUCCESS marker.

    Truth is implicit: the dup block is the LAST n_dups rows, and dup
    row i copies vec i - (n_vecs - n_dups) (rows [0, n_dups) in order),
    so expected deletes = n_dups = int(n_vecs * dup_frac)."""
    import numpy as np
    marker = os.path.join(out_dir,
                          f"_SUCCESS.{n_vecs}.{dim}.{dup_frac}.{seed}")
    emb_dir = os.path.join(out_dir, "embeddings")
    n_dups = int(n_vecs * dup_frac)
    if os.path.exists(marker):
        return {"embeddings": emb_dir, "n_dups": str(n_dups)}
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # last n_dups rows copy rows [0, n_dups) + tiny noise
    if n_dups:
        src = v[:n_dups]
        noise = rng.standard_normal((n_dups, dim)).astype(np.float32) \
            * np.float32(0.01 / np.sqrt(dim))
        v[n_vecs - n_dups:] = src + noise
    ids = np.arange(n_vecs, dtype=np.int64)
    flat = pa.array(v.reshape(-1))
    offsets = pa.array(np.arange(0, (n_vecs + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, flat)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})
    os.makedirs(emb_dir, exist_ok=True)
    step = (n_vecs + num_files - 1) // num_files
    for f in range(num_files):
        chunk = t.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(emb_dir,
                                               f"part-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return {"embeddings": emb_dir, "n_dups": str(n_dups)}
