"""Pipeline conformance: greedy-oracle equivalence on micro tables
(FIXTURES.md F3), planted-truth recall (F1.1), determinism across
parallelism (F5), scope-mode semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.config import DedupConfig
from dedup.oracle import oracle_assign
from dedup.pipeline import run_dedup
from dedup.synth import generate_pages


def _table(rows, cfg):
    cols = {cfg.id_col: [], cfg.text_col: []}
    extra = set()
    for r in rows:
        extra |= set(r) - {cfg.id_col, cfg.text_col}
    for e in extra:
        cols[e] = []
    for r in rows:
        for c in cols:
            cols[c].append(r.get(c))
    return pa.table(cols)


def _run(rows, cfg, **kw):
    ds = ray.data.from_arrow(_table(rows, cfg)).repartition(3)
    out = run_dedup(ds, cfg, check_html=False, **kw)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            got[b[cfg.id_col][i].as_py()] = (
                b["state"][i].as_py(), b["cluster_id"][i].as_py(),
                b["cluster_size"][i].as_py())
    return got


def _oracle(rows, cfg):
    t = oracle_assign(rows, cfg)
    return {t[cfg.id_col][i].as_py(): (t["state"][i].as_py(),
                                       t["cluster_id"][i].as_py(),
                                       t["cluster_size"][i].as_py())
            for i in range(t.num_rows)}


EXACT = dict(near=False, simhash=False, substring=False, min_doc_bytes=4)
LONG = "this is a sufficiently long duplicate text body " * 2


def _pages(specs):
    """specs: list of (url, text[, ts[, lang]])."""
    rows = []
    for s in specs:
        r = {"url": s[0], "text": s[1], "warc_ts": s[2] if len(s) > 2 else 0,
             "lang": s[3] if len(s) > 3 else "en"}
        rows.append(r)
    return rows


def test_micro_order_keeper_is_natural_min():
    # natural sort decides the keeper: doc2 < doc10; '.' first
    rows = _pages([
        (f"https://h/a/doc10", LONG),
        (f"https://h/a/doc2", LONG),
        (f"https://h/a/.doc", LONG),
        (f"https://h/a/other", "something else entirely " * 3),
    ])
    cfg = DedupConfig(**EXACT)
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://h/a/.doc"][0] == "keep"
    assert got["https://h/a/doc2"][0] == "delete"
    assert got["https://h/a/other"][0] == "unique"


def test_micro_order_root_rank_precedes_name():
    roots = ("https://z.example", "https://a.example")
    rows = _pages([
        ("https://a.example/aaa", LONG),
        ("https://z.example/zzz", LONG),  # root rank 0 wins despite name
    ])
    cfg = DedupConfig(roots=roots, **EXACT)
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://z.example/zzz"][0] == "keep"


def test_micro_ignore_strict_less_than():
    cfg = DedupConfig(near=False, simhash=False, substring=False,
                      min_doc_bytes=10)
    rows = _pages([
        ("https://h/a1", "123456789"),    # 9 < 10 -> ignored
        ("https://h/a2", "1234567890"),   # 10 -> not ignored
        ("https://h/a3", "1234567890"),
        ("https://h/a4", "123456789"),    # identical to a1 but both ignored
    ])
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://h/a1"][0] == "ignored"
    assert got["https://h/a4"][0] == "ignored"
    assert got["https://h/a2"][0] == "keep"


def test_micro_chain_ts_and_lang_keys():
    base = [("https://h/x1", LONG, 100, "en"),
            ("https://h/x2", LONG, 200, "en"),
            ("https://h/x3", LONG, 100, "de")]
    for key_ts, key_lang in [(False, False), (True, False), (False, True),
                             (True, True)]:
        cfg = DedupConfig(key_ts=key_ts, key_lang=key_lang, **EXACT)
        rows = _pages(base)
        got = _run(rows, cfg)
        assert got == _oracle(rows, cfg), (key_ts, key_lang)


def test_micro_scope_same_modes():
    rows = _pages([
        ("https://h1/a/p1", LONG),
        ("https://h1/a/p2", LONG),
        ("https://h2/b/p3", LONG),
    ])
    for scope in ("all", "same_host", "same_prefix"):
        cfg = DedupConfig(scope=scope, **EXACT)
        got = _run(rows, cfg)
        assert got == _oracle(rows, cfg), scope
    # same_host: p3 on h2 is alone in its scope -> unique
    got = _run(rows, DedupConfig(scope="same_host", **EXACT))
    assert got["https://h2/b/p3"][0] == "unique"
    assert got["https://h1/a/p1"][0] == "keep"


def test_micro_scope_same_root():
    roots = ("https://h1", "https://h2")
    rows = _pages([
        ("https://h1/p1", LONG),
        ("https://h1/p2", LONG),
        ("https://h2/p3", LONG),
    ])
    cfg = DedupConfig(scope="same_root", roots=roots, **EXACT)
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://h2/p3"][0] == "unique"


def test_diff_scope_transitive_closure():
    """diff modes: engine computes the transitive closure of cross-scope
    matches (documented divergence from the greedy pass for diff modes;
    see dedup.oracle module docstring)."""
    rows = _pages([
        ("https://h1/p1", LONG),
        ("https://h1/p2", LONG),
        ("https://h2/p3", LONG),
    ])
    got = _run(rows, DedupConfig(scope="diff_host", **EXACT))
    # all three in one cluster via p3; keeper = natural min = p1
    assert got["https://h1/p1"] == ("keep", "https://h1/p1", 3)
    assert got["https://h1/p2"][0] == "delete"
    assert got["https://h2/p3"][0] == "delete"
    # all in one scope -> no admissible pair -> all unique
    rows2 = _pages([("https://h1/p1", LONG), ("https://h1/p2", LONG)])
    got2 = _run(rows2, DedupConfig(scope="diff_host", **EXACT))
    assert got2["https://h1/p1"][0] == "unique"
    assert got2["https://h1/p2"][0] == "unique"


def test_error_rows_never_match():
    rows = _pages([("https://h/e1", None), ("https://h/e2", None),
                   ("https://h/ok", LONG)])
    cfg = DedupConfig(**EXACT)
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://h/e1"][0] == "error"
    assert got["https://h/e2"][0] == "error"


@pytest.fixture(scope="module")
def planted():
    pages, truth = generate_pages(600, seed=42)
    return pages, truth


def _truth_maps(truth):
    exp_state = dict(zip(truth["url"].to_pylist(),
                         truth["expected_state"].to_pylist()))
    clusters = {}
    for u, c in zip(truth["url"].to_pylist(), truth["cluster_id"].to_pylist()):
        if c >= 0:
            clusters.setdefault(c, []).append(u)
    return exp_state, clusters


def _collect(out):
    state, cid = {}, {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            u = b["url"][i].as_py()
            state[u] = b["state"][i].as_py()
            cid[u] = b["cluster_id"][i].as_py()
    return state, cid


def test_planted_truth_states_and_recall(planted):
    pages, truth = planted
    ds = ray.data.from_arrow(pages).repartition(6)
    out = run_dedup(ds, DedupConfig(), num_partitions=8).materialize()
    state, cid = _collect(out)
    exp_state, clusters = _truth_maps(truth)
    mismatch = [u for u in exp_state if state[u] != exp_state[u]]
    assert not mismatch, mismatch[:5]
    # dup-pair recall over planted clusters (target >= 0.99)
    total = found = 0
    for members in clusters.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if cid[members[i]] == cid[members[j]] != "":
                    found += 1
    assert total > 50
    assert found / total >= 0.99, found / total


def test_determinism_across_parallelism(planted):
    pages, _ = planted
    outs = []
    for blocks, P in [(2, 5), (8, 13)]:
        ds = ray.data.from_arrow(pages).repartition(blocks)
        out = run_dedup(ds, DedupConfig(), num_partitions=P)
        outs.append(_collect(out))
    assert outs[0] == outs[1]


def test_byte_verify_splits_hash_collisions():
    """byte_verify carries text through the exact shuffle (M9 analogue,
    MainViewModel.cs:1094-1146) and sub-splits groups on byte equality."""
    rows = _pages([("https://h/a", LONG), ("https://h/b", LONG),
                   ("https://h/c", "other text entirely " * 4)])
    cfg = DedupConfig(byte_verify=True, **EXACT)
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://h/a"][0] == "keep"
    assert got["https://h/b"][0] == "delete"


def test_verify_none_mode():
    """verify='none' feeds LSH buckets straight to union-find."""
    pages, truth = generate_pages(300, seed=21)
    ds = ray.data.from_arrow(pages).repartition(3)
    cfg = DedupConfig(verify="none", simhash=False, substring=False)
    out = run_dedup(ds, cfg, num_partitions=8)
    state, cid = _collect(out)
    exp_state, clusters = _truth_maps(truth)
    # exact and near clusters must still be found (recall holds; precision
    # may admit extra merges, so only check planted-pair recall)
    total = found = 0
    for members in clusters.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if cid[members[i]] == cid[members[j]] != "":
                    found += 1
    assert total > 10
    assert found / total >= 0.9


def test_salted_lsh_recall(planted):
    """Salted band keys (hot-band skew control) must not lose planted
    near-dup clusters: the per-bucket rep pass restores cross-salt
    connectivity.  lsh_hot_min=0 forces the all-salt mode so the rep
    machinery is exercised on every bucket (the adaptive default would
    salt nothing on this cold corpus)."""
    pages, truth = planted
    ds = ray.data.from_arrow(pages).repartition(6)
    cfg = DedupConfig(lsh_salt=4, lsh_hot_min=0, simhash=False,
                      substring=False)
    out = run_dedup(ds, cfg, num_partitions=8)
    state, cid = _collect(out)
    exp_state, clusters = _truth_maps(truth)
    total = found = 0
    for members in clusters.values():
        cls = {u for u in members}
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if cid[members[i]] == cid[members[j]] != "":
                    found += 1
    # exact+near clusters must be fully recovered; simhash/substring-only
    # pairs may legitimately be missed with those passes off
    assert found / total >= 0.7
    # near-class pairs specifically:
    near_total = near_found = 0
    cls_of = dict(zip(truth["url"].to_pylist(),
                      truth["cluster_class"].to_pylist()))
    for members in clusters.values():
        if cls_of[members[0]] not in ("near", "exact"):
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                near_total += 1
                if cid[members[i]] == cid[members[j]] != "":
                    near_found += 1
    assert near_found / near_total >= 0.99, near_found / near_total


def test_adaptive_salt_cold_corpus_identical(planted):
    """The adaptive default (lsh_salt=8, lsh_hot_min>0) must detect no
    hot bands on a cold corpus and produce assignments IDENTICAL to the
    unsalted pipeline — the guard costs nothing when unneeded."""
    pages, _ = planted
    ds = ray.data.from_arrow(pages).repartition(6)
    a = _collect(run_dedup(ds, DedupConfig(), num_partitions=8))
    b = _collect(run_dedup(ds, DedupConfig(lsh_salt=0), num_partitions=8))
    assert a == b


def test_adaptive_salt_hot_corpus():
    """On a boilerplate-heavy corpus the sampled-count trigger must find
    the hot bands (deterministically across partitionings), salt them,
    and keep the hot cluster connected through the rep pass."""
    from dedup.ingest import prepare
    from dedup.pipeline import _ok_only, detect_hot_band_keys
    from dedup.synth import generate_hotband_pages

    pages = generate_hotband_pages(3000, hot_frac=0.1, seed=42)
    cfg = DedupConfig(lsh_salt=4, lsh_hot_min=64, simhash=False,
                      substring=False)

    def _sigs(nparts):
        ds = ray.data.from_arrow(pages).repartition(nparts)
        prep = _ok_only(prepare(ds, cfg, check_html=False))
        from dedup.minhash import cached_signer
        return prep.select_columns(["node", "scope64", "text"]).map_batches(
            lambda t: cached_signer(cfg.num_perm, cfg.shingle_k, cfg.seed)(t),
            batch_format="pyarrow",
        ).select_columns(["node", "scope64", "minhash"])

    hot2 = detect_hot_band_keys(_sigs(2), cfg, 4)
    hot8 = detect_hot_band_keys(_sigs(8), cfg, 4)
    assert hot2.size > 0                      # the boilerplate bands are found
    assert np.array_equal(hot2, hot8)         # content-only => blocking-invariant
    # end-to-end: hot cluster survives adaptive salting intact
    ds = ray.data.from_arrow(pages).repartition(6)
    out = run_dedup(ds, cfg, num_partitions=8).materialize()
    assert int(out.max("cluster_size")) >= 0.99 * 300


def test_reduce_side_label_join_identical(planted):
    """Forcing broadcast_threshold=0 routes assignment through the
    reduce-side label join (the >20M-label scale path); assignments must
    be byte-identical to the broadcast path."""
    pages, _ = planted
    ds = ray.data.from_arrow(pages).repartition(4)
    cfg = DedupConfig()
    a = _collect(run_dedup(ds, cfg, num_partitions=8))
    b = _collect(run_dedup(ds, cfg, num_partitions=8, broadcast_threshold=0))
    assert a == b
    # sanity: the corpus actually has matched labels, so the reduce path ran
    assert "delete" in a[0].values()


def test_reduce_side_label_join_int_ids():
    """Reduce path with integer ids (documents-table shape)."""
    rows = [{"doc_id": i, "text": (LONG if i % 3 == 0 else f"unique {i} " * 8)}
            for i in range(30)]
    cfg = DedupConfig(id_col="doc_id", ts_col="", lang_col="", **EXACT)
    got_b = _run(rows, cfg)
    got_r = _run(rows, cfg, broadcast_threshold=0)
    assert got_b == got_r
    assert got_r[0][0] == "keep" and got_r[3][0] == "delete"


def test_attach_coshuffle_identical(planted, monkeypatch):
    """Forcing both attach thresholds to 0 routes the verify payload
    semi-join through the full co-shuffle path; results must match the
    broadcast-filter path exactly."""
    import dedup.pipeline as pl
    pages, _ = planted
    ds = ray.data.from_arrow(pages).repartition(4)
    cfg = DedupConfig(simhash=False)  # exercises minhash + substring verify
    a = _collect(run_dedup(ds, cfg, num_partitions=8))
    monkeypatch.setattr(pl, "ATTACH_BROADCAST_THRESHOLD", 0)
    monkeypatch.setattr(pl, "ATTACH_BLOOM_THRESHOLD", 0)
    b = _collect(run_dedup(ds, cfg, num_partitions=8))
    assert a == b


def test_attach_bloom_tier_identical(planted, monkeypatch):
    """Forcing only ATTACH_BROADCAST_THRESHOLD=0 routes the payload
    semi-join through the bloom tier (map-side bloom filter, false
    positives dropped reduce-side); results must be byte-identical."""
    import dedup.pipeline as pl
    pages, _ = planted
    ds = ray.data.from_arrow(pages).repartition(4)
    cfg = DedupConfig(simhash=False)
    a = _collect(run_dedup(ds, cfg, num_partitions=8))
    monkeypatch.setattr(pl, "ATTACH_BROADCAST_THRESHOLD", 0)
    b = _collect(run_dedup(ds, cfg, num_partitions=8))
    assert a == b


def test_scope_col_int_ids_matches_oracle():
    """scope_col reads the scope attribute from a column — the only way
    to scope integer-id tables (documents shape)."""
    rows = [
        {"doc_id": 1, "text": LONG, "source": "s1"},
        {"doc_id": 2, "text": LONG, "source": "s1"},
        {"doc_id": 3, "text": LONG, "source": "s2"},
        {"doc_id": 4, "text": "something else entirely " * 3, "source": "s1"},
    ]
    base = dict(id_col="doc_id", ts_col="", lang_col="", **EXACT)
    got_same = _run(rows, DedupConfig(scope="same_host", scope_col="source",
                                      **base))
    assert got_same[1][0] == "keep" and got_same[2][0] == "delete"
    assert got_same[3][0] == "unique"          # alone in its source
    got_diff = _run(rows, DedupConfig(scope="diff_host", scope_col="source",
                                      **base))
    # transitive closure across the cross-source match: all three cluster
    assert got_diff[1] == ("keep", 1, 3)
    assert got_diff[2][0] == "delete" and got_diff[3][0] == "delete"
    # oracle agreement for both modes
    for cfg in (DedupConfig(scope="same_host", scope_col="source", **base),):
        assert _run(rows, cfg) == _oracle(rows, cfg)


def test_scope_int_ids_without_scope_col_raises():
    """ADVICE r1: integer ids with a url-derived scope mode silently
    degenerated; now it raises."""
    rows = [{"doc_id": 1, "text": LONG}, {"doc_id": 2, "text": LONG}]
    cfg = DedupConfig(scope="same_host", id_col="doc_id", ts_col="",
                      lang_col="", **EXACT)
    with pytest.raises(Exception) as ei:
        _run(rows, cfg)
    assert "scope_col" in str(ei.value)


def test_content_hash_choice_invariant():
    """Any supported content_hash yields identical assignments (the
    reference's HashingAlgorithm switch changes cost, never results)."""
    rows = _pages([("https://h/a", LONG), ("https://h/b", LONG),
                   ("https://h/c", "other text " * 5)])
    outs = [_run(rows, DedupConfig(content_hash=h, **EXACT))
            for h in ("sha256", "blake2b", "sha1", "md5", "crc32")]
    assert all(o == outs[0] for o in outs[1:])
    with pytest.raises(ValueError):
        DedupConfig(content_hash="crc999")


def test_filter_visible_states_and_roots():
    """M10 visibility filter: per-state × per-root row filter
    (FilterByVisibleFolders, MainViewModel.cs:1819-1851)."""
    from dedup.pipeline import filter_visible
    roots = ("https://h1", "https://h2")
    rows = _pages([("https://h1/p1", LONG), ("https://h1/p2", LONG),
                   ("https://h2/p3", LONG), ("https://h3/p4", "xx " * 8)])
    ds = ray.data.from_arrow(_table(rows, DedupConfig(**EXACT))).repartition(2)
    assign = run_dedup(ds, DedupConfig(**EXACT), check_html=False).materialize()
    # states only: duplicates view
    vis = {r["url"] for r in
           filter_visible(assign, ("keep", "delete")).iter_rows()}
    assert vis == {"https://h1/p1", "https://h1/p2", "https://h2/p3"}
    # per-root: only h2's rows of the duplicates view
    vis2 = {r["url"] for r in
            filter_visible(assign, ("keep", "delete", "unique"), roots=roots,
                           visible_roots=(1,)).iter_rows()}
    assert vis2 == {"https://h2/p3"}
    # unrooted rows (rank -1) hidden unless -1 enabled
    vis3 = {r["url"] for r in
            filter_visible(assign, ("unique",), roots=roots,
                           visible_roots=(-1,)).iter_rows()}
    assert vis3 == {"https://h3/p4"}


def test_stem_prefix_literal_mode():
    """M7 literal mode (CompareFilenameSimilar, MainViewModel.cs:1064-1072):
    exact-content pairs additionally require the prober's stem to be a
    case-insensitive prefix of the candidate's."""
    rows = _pages([
        ("https://h/a/report.html", LONG),        # stem 'report'
        ("https://h/a/report-v2.html", LONG),     # 'report-v2' (match)
        ("https://h/a/REPORT-final.html", LONG),  # case-insensitive match
        ("https://h/a/summary.html", LONG),       # same text, stem differs
        ("https://h/a/rep.html", "different content " * 4),  # prefix stem,
                                                  # different text: no match
    ])
    cfg = DedupConfig(stem_prefix=True, **EXACT)
    got = _run(rows, cfg)
    assert got == _oracle(rows, cfg)
    assert got["https://h/a/rep.html"][0] == "unique"
    assert got["https://h/a/summary.html"][0] == "unique"
    assert got["https://h/a/report.html"][0] == "keep"
    assert got["https://h/a/report-v2.html"][0] == "delete"
    assert got["https://h/a/REPORT-final.html"][0] == "delete"
    # without the flag, all four same-text docs cluster
    got2 = _run(rows, DedupConfig(**EXACT))
    assert got2["https://h/a/summary.html"][0] == "delete"


def test_url_stem():
    from dedup.keys import url_stem
    assert url_stem("https://h/a/report-v2.html") == "report-v2"
    assert url_stem("https://h/a/noext") == "noext"
    assert url_stem("https://h/a/.hidden") == ".hidden"
    assert url_stem(42) == "42"


def test_embedding_dedup_transitive_chain():
    """a~b and b~c above threshold but a!~c: transitive closure must put
    all three in ONE cluster with keeper = min id; an isolated vector
    stays unique (dedup.ann.embedding_dedup)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from dedup.ann import embedding_dedup

    a = np.array([1.0, 0.0])
    b = np.array([np.cos(np.pi / 5), np.sin(np.pi / 5)])   # 36deg to a
    c = np.array([np.cos(2 * np.pi / 5), np.sin(2 * np.pi / 5)])  # 72deg to a
    d = np.array([-1.0, 0.0])
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([a.tolist(), b.tolist(), c.tolist(),
                               d.tolist()],
                              pa.list_(pa.float32())),
    })
    # cos(a,b)=cos(b,c)=cos36 ~ 0.809 >= 0.7; cos(a,c)=cos72 ~ 0.309 < 0.7
    out = embedding_dedup(ray.data.from_arrow(t), threshold=0.7,
                          num_partitions=4).take_all()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[0]["state"] == "keep" and by_id[0]["cluster_id"] == 0
    assert by_id[1]["state"] == "delete" and by_id[1]["cluster_id"] == 0
    assert by_id[2]["state"] == "delete" and by_id[2]["cluster_id"] == 0
    assert by_id[2]["cluster_size"] == 3
    assert by_id[3]["state"] == "unique" and by_id[3]["cluster_id"] == -1
    assert by_id[3]["cluster_size"] == 1


def test_normalize_c4_clusters_case_and_punct_variants():
    """normalize='c4': docs differing only in case / ASCII punctuation /
    whitespace runs share one exact key; without it they don't.  Also
    exercises byte_verify over normalized bytes (the hashed material)."""
    cfg = DedupConfig(**EXACT, normalize="c4")
    rows = _pages([
        ("u/a", "The QUICK  brown FOX!"),
        ("u/b", "the quick brown fox"),
        ("u/c", "the, quick; brown... fox"),
        ("u/d", "a different document entirely"),
    ])
    got = _run(rows, cfg)
    assert got["u/a"][0] == "keep"
    assert got["u/b"][0] == "delete" and got["u/c"][0] == "delete"
    assert got["u/b"][1] == got["u/a"][1] == got["u/c"][1]
    assert got["u/a"][2] == 3
    assert got["u/d"][0] == "unique"
    # byte_verify composes: verifies the normalized bytes -> same result
    got_bv = _run(rows, cfg.with_(byte_verify=True))
    assert got_bv == got
    # without normalization these are four distinct texts
    got_plain = _run(rows, DedupConfig(**EXACT))
    assert all(v[0] == "unique" for v in got_plain.values())


def test_tier_report_counts_consistent():
    """tier_report's combined row must equal the full pipeline's delete
    count, the exact row must equal the exact-only pipeline's, and every
    single-tier delete count is bounded by the combined one."""
    import pyarrow.compute as pc

    from dedup.pipeline import tier_report

    pages, _ = generate_pages(400, seed=33)
    cfg = DedupConfig()

    def _deletes(c) -> int:
        out = run_dedup(ray.data.from_arrow(pages).repartition(4), c,
                        num_partitions=6)
        n = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            n += int(pc.sum(pc.cast(pc.equal(b["state"], "delete"),
                                    "int64")).as_py() or 0)
        return n

    rep = tier_report(ray.data.from_arrow(pages).repartition(4), cfg,
                      num_partitions=6).to_pandas().set_index("tier")
    assert set(rep.index) >= {"exact", "combined"}
    assert rep.loc["combined", "n_deletes"] == _deletes(cfg)
    assert rep.loc["exact", "n_deletes"] == _deletes(
        cfg.with_(near=False, simhash=False, substring=False))
    for tier in rep.index:
        assert rep.loc[tier, "n_deletes"] <= rep.loc["combined", "n_deletes"]
        assert rep.loc[tier, "n_deletes"] == \
            rep.loc[tier, "n_matched_docs"] - rep.loc[tier, "n_clusters"]
    # at least one near tier must add deletes beyond exact on this corpus
    assert rep.loc["combined", "n_deletes"] > rep.loc["exact", "n_deletes"]


def test_paystore_collect_payload_kinds():
    """_PayStore mechanics: string and binary payloads round-trip, node
    order is sorted for searchsorted lookups, empty payloads decode to
    ''/b'', and the store is numpy-only (the zero-copy broadcast
    contract — a pyarrow field here would reintroduce the per-worker
    deserialization copy that OOMed the r3 substring probe)."""
    import dedup.pipeline as pl

    t = pa.table({
        "node": pa.array([30, 10, 20], pa.uint64()),
        "text": pa.array(["ccc", "", "béta"]),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    st = pl._collect_payload(ds, "text")
    assert isinstance(st, pl._PayStore)
    for f in (st.nodes, st.rows, st.values, st.offsets):
        assert isinstance(f, np.ndarray)
    assert st.nodes.tolist() == [10, 20, 30]  # sorted
    assert st.is_str
    assert [st.get(i) for i in range(3)] == ["", "béta", "ccc"]

    b = pa.table({
        "node": pa.array([2, 1], pa.uint64()),
        "minhash": pa.array([b"\x01" * 16, b"\x02" * 16], pa.binary()),
    })
    st2 = pl._collect_payload(ray.data.from_arrow(b), "minhash")
    assert not st2.is_str
    assert st2.get(0) == b"\x02" * 16 and st2.get(1) == b"\x01" * 16
    # fixed-width payloads expose the zero-copy u64 matrix view used by
    # verify_minhash_pairs
    mat = st2.values.view("<u8").reshape(2, 2)[st2.rows]
    assert mat.shape == (2, 2)
    assert (mat[0] == np.frombuffer(b"\x02" * 16, "<u8")).all()


def test_verify_broadcast_vs_shuffle_identical(planted, monkeypatch):
    """Forcing VERIFY_BROADCAST_BYTES=0 routes BOTH text-verify stages
    (minhash jaccard / substring containment) and the minhash signature
    judge through the reduce-side attach shuffle; assignments must be
    byte-identical to the broadcast fast path."""
    import dedup.pipeline as pl
    pages, _ = planted
    ds = ray.data.from_arrow(pages).repartition(4)
    cfg = DedupConfig()
    a = _collect(run_dedup(ds, cfg, num_partitions=8))
    monkeypatch.setattr(pl, "VERIFY_BROADCAST_BYTES", 0)
    b = _collect(run_dedup(ds, cfg, num_partitions=8))
    assert a == b
