"""Benchmark harness.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the headline pages-dedup pipeline twice in FRESH
processes (num_cpus=8 then num_cpus=32) on the same pre-synthesized
input and reports throughput at both plus the scaling efficiency
(= (dps_32 / dps_8) / 4); the sandbox evidence protocol for the
north-rule's N-vs-4N-node criterion (see BASELINE.md §2).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("DEDUP_BENCH_DOCS", "100000"))
# scaling runs need a compute-dominated corpus: fixed per-stage costs at
# 100k docs would swamp the 8-vs-32-cpu signal
SCALING_DOCS = int(os.environ.get("DEDUP_BENCH_DOCS", "1500000"))
BENCH_REPS = int(os.environ.get("DEDUP_BENCH_REPS", "2"))
BENCH_CORPUS = f"/tmp/dedup_bench_pages_{BENCH_DOCS}"


def _init_ray(num_cpus: int) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="error")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    from dedup.dist import quiet_empty_schema_warnings
    quiet_empty_schema_warnings()


def _consume(res) -> int:
    """Force execution; returns row count."""
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def synth_bench_corpus(n_docs: int | None = None) -> str:
    from dedup.synth import write_pages
    n = n_docs or BENCH_DOCS
    return write_pages(f"/tmp/dedup_bench_pages_{n}", n_docs=n, seed=42,
                       num_files=32)["pages"]


def run_pages_dedup(num_cpus: int, n_docs: int | None = None) -> dict:
    """Headline: full dedup (exact+minhash+simhash+substring+UF) over the
    input_hint pages corpus.  Returns wall time + docs/s."""
    n_docs = n_docs or BENCH_DOCS
    _init_ray(num_cpus)
    import ray
    import ray.data
    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup
    path = synth_bench_corpus(n_docs)
    ds = ray.data.read_parquet(path)
    # warm the worker pool so process spawn/import cost isn't in the timing
    ray.data.range(num_cpus * 8, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b).materialize()
    best, n = None, 0
    for _rep in range(BENCH_REPS):  # best-of-N smooths scheduler/OS noise
        t0 = time.time()
        n = _consume(run_dedup(ds, DedupConfig(), check_html=False))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return {"wall_sec": round(best, 2), "docs": n_docs,
            "docs_per_sec": round(n_docs / best, 1), "rows_out": n,
            "num_cpus": num_cpus}


HOTBAND_DOCS = int(os.environ.get("DEDUP_HOTBAND_DOCS", "200000"))


def run_hotband(num_cpus: int, n_docs: int | None = None) -> dict:
    """Hot-band skew stress (VERDICT r1 item 9): 5% of docs share ~90%
    boilerplate, run the minhash pipeline with lsh_salt off vs on and
    report wall time, throughput, the max band-bucket size each way, and
    whether the hot set stayed one cluster (salt must not cut recall)."""
    n_docs = n_docs or HOTBAND_DOCS
    _init_ray(num_cpus)
    import ray.data
    from dedup.config import DedupConfig
    from dedup.ingest import prepare
    from dedup.minhash import cached_signer
    from dedup.pipeline import (_ok_only, detect_hot_band_keys,
                                lsh_band_rows, run_dedup)
    from dedup.synth import write_hotband_pages

    info = write_hotband_pages(f"/tmp/dedup_hotband_{n_docs}", n_docs=n_docs,
                               seed=42)
    n_hot = int(info["n_hot"])
    ds = ray.data.read_parquet(info["pages"])
    out: dict[str, dict] = {}
    for salt in (0, 8):
        # salt=8 leg keeps the DEFAULT lsh_hot_min, so the measured
        # max_band_bucket is exactly what the default adaptive pipeline
        # (detect hot bands -> salt only those) produces
        cfg = DedupConfig(simhash=False, substring=False, lsh_salt=salt)
        t0 = time.time()
        res = run_dedup(ds, cfg, check_html=False).materialize()
        dt = time.time() - t0
        max_cluster = res.max("cluster_size")
        # max band-bucket size under this salt (the skew the shuffle sees)
        prep = _ok_only(prepare(ds, cfg, check_html=False))
        sigs = prep.select_columns(["node", "scope64", "text"]).map_batches(
            lambda t, c=cfg: cached_signer(c.num_perm, c.shingle_k, c.seed)(t),
            batch_format="pyarrow",
        ).select_columns(["node", "scope64", "minhash"]).materialize()
        hot = (detect_hot_band_keys(sigs, cfg, num_cpus)
               if salt > 0 else None)
        # reinterpret the uint64 band key as int64 (bijective bit view):
        # Ray's aggregate converts group keys through Python ints typed
        # int64, so raw uint64 keys >= 2^63 hit an OverflowError and the
        # whole block falls back to pickled-object serialization
        def _skey_i64(t):
            i = t.column_names.index("skey")
            return t.set_column(
                i, "skey", t["skey"].combine_chunks().view("int64"))

        max_bucket = lsh_band_rows(sigs, cfg, hot=hot) \
            .map_batches(_skey_i64, batch_format="pyarrow") \
            .groupby("skey").count().max("count()")
        out[f"salt{salt}"] = {
            "wall_sec": round(dt, 2),
            "docs_per_sec": round(n_docs / dt, 1),
            "max_cluster_size": int(max_cluster),
            "max_band_bucket": int(max_bucket),
            "hot_cluster_intact": bool(max_cluster >= 0.99 * n_hot),
            "n_hot_band_keys": int(len(hot)) if hot is not None else None,
        }
    from dedup.config import DedupConfig as _DC
    return {"docs": n_docs, "n_hot": n_hot, "num_cpus": num_cpus,
            # the default config applies this salt to DETECTED-hot bands
            # only (lsh_hot_min sampled-count trigger), so the bounded
            # max_band_bucket row IS the default behavior
            "default_salt": _DC().lsh_salt,
            "default_hot_min": _DC().lsh_hot_min, **out}


def _assignments_hash(res) -> str:
    """Order-insensitive digest of a dedup assignments output: sha256
    over the rows sorted by the (unique) id column, hashed column-wise.
    Vectorized (arrow sort + one repr per column) — million-row outputs
    digest in seconds.  Used by the determinism cross-checks."""
    import hashlib
    import pyarrow as pa
    import pyarrow.compute as pc
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    cols = sorted(t.column_names)
    idx = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in cols])
    t = t.take(idx)
    h = hashlib.sha256()
    for c in cols:
        h.update(c.encode())
        h.update(repr(t[c].to_pylist()).encode())
    return h.hexdigest()


def run_span_density(num_cpus: int) -> dict:
    """Span-dedup shuffle-volume evidence (VERDICT r2 item 3): run the
    duplicated-span removal over the sf documents table in both window
    modes and record the emitted-rows-per-character density — the
    default (winnow) mode must emit << 1 row/char where exact stride-1
    emits ~1, since every emitted row rides the (h1, h2, d, o) shuffle."""
    _init_ray(num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from dedup.spans import _window_rows, span_dedup
    path = os.path.join(SF_DIR, "documents.parquet")
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    n_chars = int(docs.map_batches(
        lambda t: pa.table({"n": pc.fill_null(pc.utf8_length(t["text"]), 0)
                            .cast("int64")}),
        batch_format="pyarrow").sum("n"))
    out: dict[str, dict] = {}
    for mode in ("winnow", "exact"):
        emitted = int(docs.map_batches(
            lambda t, m=mode: _window_rows(t, "doc_id", "text", 50, m, 1, 16),
            batch_format="pyarrow").count())
        t0 = time.time()
        n = _consume(span_dedup(docs, L=50, mode=mode,
                                num_partitions=num_cpus * 2))
        out[mode] = {
            "wall_sec": round(time.time() - t0, 2),
            "rows_out": n,
            "emitted_windows": emitted,
            "rows_per_char_e6": int(round(emitted / n_chars * 1e6)),
        }
    return {"metric": "span_dedup emission density", "sf": SF_DIR,
            "total_chars": n_chars, "num_cpus": num_cpus, **out}


SUBSTRING_DOCS = int(os.environ.get("DEDUP_SUBSTRING_DOCS", "1000000"))


def run_substring_scale(cpu_list=(8, 32), n_docs: int | None = None) -> dict:
    """Substring-tier scale probe (VERDICT r2 item 8, mirroring the
    SemDeDup 500k probe): 1M pages through the winnow-anchor +
    suffix-array shared-run stage only (exact/minhash/simhash off) at
    two parallelism levels in ONE process with fresh-config runs;
    asserts byte-identical assignments across parallelism and records
    docs/s.  Uses in-process runs (parallelism knob = num_partitions)
    because ray re-init per leg is not possible in one process; the
    cross-CPU determinism evidence comes from the fresh-process scaling
    protocol, this probe pins output stability across partition counts
    at scale."""
    n_docs = n_docs or SUBSTRING_DOCS
    _init_ray(max(cpu_list))
    import ray.data
    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup
    path = synth_bench_corpus(n_docs)
    ds = ray.data.read_parquet(path)
    cfg = DedupConfig(exact=False, near=False, simhash=False,
                      substring=True, substring_mode="suffix_array")
    out: dict[str, dict] = {}
    hashes = []
    for P in sorted({c * 2 for c in cpu_list}):
        t0 = time.time()
        res = run_dedup(ds, cfg, check_html=False,
                        num_partitions=P).materialize()
        dt = time.time() - t0
        hashes.append(_assignments_hash(res))
        out[f"P{P}"] = {"wall_sec": round(dt, 2),
                        "docs_per_sec": round(n_docs / dt, 1),
                        "assign_sha256": hashes[-1][:16]}
    return {"metric": "substring-tier scale probe (suffix-array mode)",
            "docs": n_docs, "num_cpus": max(cpu_list),
            "deterministic_across_partitions": len(set(hashes)) == 1, **out}


def run_reduce_path(num_cpus: int, n_docs: int | None = None) -> dict:
    """Forced reduce-side label join (VERDICT r2 item 9): the >20M-label
    path (broadcast_threshold=0) timed on the full bench corpus vs the
    default broadcast path, with an output-hash equality assert — the
    evidence that the join 100x scale will actually take is both correct
    and not pathologically slower."""
    n_docs = n_docs or BENCH_DOCS
    _init_ray(num_cpus)
    import ray.data
    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup
    path = synth_bench_corpus(n_docs)
    ds = ray.data.read_parquet(path)
    out: dict[str, dict] = {}
    hashes = {}
    for name, thr in (("broadcast", 20_000_000), ("reduce", 0)):
        t0 = time.time()
        res = run_dedup(ds, DedupConfig(), check_html=False,
                        broadcast_threshold=thr).materialize()
        dt = time.time() - t0
        hashes[name] = _assignments_hash(res)
        out[name] = {"wall_sec": round(dt, 2),
                     "docs_per_sec": round(n_docs / dt, 1),
                     "assign_sha256": hashes[name][:16]}
    return {"metric": "assignment-join path comparison", "docs": n_docs,
            "num_cpus": num_cpus,
            "paths_identical": hashes["broadcast"] == hashes["reduce"], **out}


def run_uf_path(num_cpus: int, n_docs: int | None = None) -> dict:
    """Forced distributed union-find: the >20M-edge hash-to-min rounds
    (uf_local_threshold=0) timed on the full bench corpus's REAL edge
    set vs the default driver-side path-compressed UF, with an
    output-hash equality assert — the same evidence discipline as
    run_reduce_path, for the other driver-bounded stage that flips
    implementation at 100x scale."""
    n_docs = n_docs or BENCH_DOCS
    _init_ray(num_cpus)
    import ray.data
    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup
    path = synth_bench_corpus(n_docs)
    ds = ray.data.read_parquet(path)
    out: dict[str, dict] = {}
    hashes = {}
    # ALTERNATE the two paths and keep each path's best-of-N: this
    # host's CPU speed drifts 2-3x on a minutes timescale, so a single
    # local-then-distributed sequence confounds path cost with drift
    # (r3/r4 first-cut artifacts did exactly that); alternation puts
    # both paths through the same host phases and best-of strips the
    # slow phases from both equally.  Each leg records a probe.
    legs: dict[str, list] = {"local": [], "distributed": []}
    for _rep in range(max(2, BENCH_REPS)):
        for name, thr in (("local", 20_000_000), ("distributed", 0)):
            probe = _cpu_probe()
            t0 = time.time()
            res = run_dedup(ds, DedupConfig(), check_html=False,
                            uf_local_threshold=thr).materialize()
            dt = time.time() - t0
            hashes[name] = _assignments_hash(res)
            legs[name].append({"wall_sec": round(dt, 2),
                               "cpu_probe_sec": probe})
            del res
    for name in legs:
        best = min(legs[name], key=lambda r: r["wall_sec"])
        out[name] = {"wall_sec": best["wall_sec"],
                     "docs_per_sec": round(n_docs / best["wall_sec"], 1),
                     "assign_sha256": hashes[name][:16],
                     "legs": legs[name]}
    return {"metric": "union-find path comparison", "docs": n_docs,
            "num_cpus": num_cpus,
            "paths_identical": hashes["local"] == hashes["distributed"],
            "dist_over_local": round(out["distributed"]["wall_sec"] /
                                     out["local"]["wall_sec"], 2),
            **out}


def run_fuzzy_decon_scale(num_cpus: int, n_docs: int | None = None) -> dict:
    """Fuzzy (MinHash) decontamination scale probe: the full bench
    corpus as the train side probed against a 4k-doc benchmark — the
    op's contract is ZERO train-side shuffle (sign + searchsorted probe
    inside one map_batches), so throughput should track the signing
    rate of the headline pipeline's minhash stage."""
    n_docs = n_docs or BENCH_DOCS
    _init_ray(num_cpus)
    import ray.data
    from dedup.minhash import minhash_decontaminate
    from dedup.synth import write_pages
    train = ray.data.read_parquet(synth_bench_corpus(n_docs),
                                  columns=["url", "text"])
    bpaths = write_pages("/tmp/dedup_pages_recall", n_docs=4000, seed=42)
    bpdf = ray.data.read_parquet(bpaths["pages"], columns=["text"]) \
        .to_pandas()
    bpdf.insert(0, "doc_id", range(len(bpdf)))
    import pyarrow as pa_
    bench = ray.data.from_arrow(pa_.Table.from_pandas(
        bpdf, preserve_index=False))
    t0 = time.time()
    out = minhash_decontaminate(train, bench, id_col="url",
                                bench_id_col="doc_id", threshold=0.5)
    n_flagged = int(out.sum("near_contaminated"))
    dt = time.time() - t0
    return {"metric": "fuzzy decontamination throughput",
            "docs": n_docs, "num_cpus": num_cpus,
            "bench_docs": int(len(bpdf)),
            "wall_sec": round(dt, 2),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_flagged": int(n_flagged)}


def run_overlap_scale(num_cpus: int, n_docs: int | None = None) -> dict:
    """source_overlap family at bench scale: host-keyed overlap report
    + hash-slice dup-ratio estimate + shuffle-free sketch over the
    1.5M-doc pages corpus (url host = source).  Records wall + output
    sizes; the estimate leg also reports the full-corpus exact ratio
    so the slice's error is visible in the artifact."""
    n_docs = n_docs or BENCH_DOCS
    _init_ray(num_cpus)
    import ray
    import ray.data
    import pyarrow as pa
    from dedup.keys import url_host
    from dedup.overlap import (dup_ratio_estimate, source_overlap,
                               source_overlap_sketch)
    path = synth_bench_corpus(n_docs)

    def _hosted(t: pa.Table) -> pa.Table:
        hosts = [url_host(u) for u in t["url"].to_pylist()]
        return pa.table({"source": pa.array(hosts, pa.string()),
                         "text": t["text"]})

    def _corpus():
        return ray.data.read_parquet(path, columns=["url", "text"]) \
            .map_batches(_hosted, batch_format="pyarrow")

    out: dict = {"docs": n_docs, "num_cpus": num_cpus}
    t0 = time.time()
    ov = source_overlap(_corpus()).materialize()
    out["exact"] = {"wall_sec": round(time.time() - t0, 2),
                    "pairs": ov.count()}
    t0 = time.time()
    sk = source_overlap_sketch(_corpus()).materialize()
    out["sketch"] = {"wall_sec": round(time.time() - t0, 2),
                     "pairs": sk.count()}
    t0 = time.time()
    est = dup_ratio_estimate(_corpus(), slice_hex="28").materialize()
    est_rows = est.to_pandas()
    t_est = round(time.time() - t0, 2)
    t0 = time.time()
    exact = dup_ratio_estimate(_corpus(), slice_hex="zz").materialize() \
        .to_pandas()
    t_exact = round(time.time() - t0, 2)
    r_est = int(1e6 * est_rows.n_dup.sum() / max(est_rows.n_sampled.sum(), 1))
    r_ex = int(1e6 * exact.n_dup.sum() / max(exact.n_sampled.sum(), 1))
    out["estimate"] = {"wall_sec": t_est, "slice_hex": "28",
                       "n_sampled": int(est_rows.n_sampled.sum()),
                       "dup_ratio_e6": r_est}
    out["exact_ratio"] = {"wall_sec": t_exact, "dup_ratio_e6": r_ex,
                          "abs_err_e6": abs(r_est - r_ex)}
    return out


def run_footprint(num_cpus: int, n_docs: int | None = None) -> dict:
    """Resident-footprint evidence (VERDICT r3 #1): for an exact-only
    config nothing downstream of prepare consumes the text column, so
    the materialized prepare stage must not carry it.  Measures
    ``size_bytes()`` of the materialized prep with keep_text on (the
    round-3 behavior — both materializations carried full text) vs off
    (the round-4 default), and asserts the end-to-end assignments are
    hash-identical either way.  Round 4 also stopped materializing the
    ok-filtered 'active' copy, so the old resident footprint was
    ~2x prep_with_text and the new one is 1x prep_without_text."""
    n_docs = n_docs or BENCH_DOCS
    _init_ray(num_cpus)
    import ray.data
    from dedup.config import DedupConfig
    from dedup.ingest import prepare
    from dedup.pipeline import run_dedup
    path = synth_bench_corpus(n_docs)
    ds = ray.data.read_parquet(path)
    cfg = DedupConfig(near=False, simhash=False, substring=False)
    sizes = {}
    for kt in (True, False):
        prep = prepare(ds, cfg, check_html=False, keep_text=kt).materialize()
        sizes[kt] = int(prep.size_bytes())
        del prep
    t0 = time.time()
    res = run_dedup(ds, cfg, check_html=False).materialize()
    dt = time.time() - t0
    h = _assignments_hash(res)
    return {
        "metric": "exact-only resident footprint (materialized prepare)",
        "docs": n_docs, "num_cpus": num_cpus,
        "prep_bytes_with_text": sizes[True],
        "prep_bytes_without_text": sizes[False],
        "bytes_ratio": round(sizes[True] / max(1, sizes[False]), 2),
        "old_resident_copies": "2x with-text (prep + materialized active)",
        "new_resident_copies": "1x without-text (active derived lazily)",
        "exact_only_wall_sec": round(dt, 2),
        "exact_only_docs_per_sec": round(n_docs / dt, 1),
        "assign_sha256": h[:16],
    }


XOVER_BENCH_DOCS = int(os.environ.get("DEDUP_XOVER_BENCH_DOCS", "10000"))
XOVER_TOKENS = int(os.environ.get("DEDUP_XOVER_TOKENS", "1000"))


def run_bloom_crossover(num_cpus: int) -> dict:
    """Bloom-decontamination crossover evidence (VERDICT r3 #6): at
    sf0.1 benchmark sizes (~100k distinct grams) the broadcast path wins
    3.2x — this leg measures the scale the bloom path EXISTS for.  The
    benchmark is ~10M distinct 8-grams (globally-unique tokens, so every
    gram is distinct): the broadcast path must collect the full distinct
    gram set on the driver, ray.put a ~600MB string array, and rebuild a
    10M-entry is_in hash table per train batch; the bloom path
    broadcasts ~18MB of bits and confirms hits exactly in a
    co-partitioned shuffle bounded by true contamination + fpp.  Both
    modes are run on the same train side (100k pages + 200 docs of true
    benchmark text) and the output tables are asserted hash-identical —
    the same oracle-invariance discipline as run_reduce_path."""
    _init_ray(num_cpus)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from dedup.corpus import ngram_decontaminate

    nb, T = XOVER_BENCH_DOCS, XOVER_TOKENS
    bench_path = f"/tmp/dedup_xover_bench_{nb}_{T}.parquet"
    if not os.path.exists(bench_path):
        texts, k = [], 0
        for _i in range(nb):
            texts.append(" ".join(f"t{j}" for j in range(k, k + T)))
            k += T
        pq.write_table(
            pa.table({"doc_id": pa.array(range(nb), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            bench_path)
    bench = ray.data.read_parquet(bench_path)
    n_grams = nb * (T - 7)
    pages = ray.data.read_parquet(synth_bench_corpus(),
                                  columns=["url", "text"])
    bt = pq.read_table(bench_path).slice(0, min(200, nb))
    cont = ray.data.from_arrow(pa.table({
        "url": pa.array([f"bench://{i}" for i in range(bt.num_rows)],
                        pa.string()),
        "text": bt["text"].combine_chunks(),
    }))
    train = pages.union(cont)
    out: dict[str, dict] = {}
    hashes = {}
    for mode in ("bloom", "broadcast"):
        t0 = time.time()
        res = ngram_decontaminate(train, bench, id_col="url",
                                  mode=mode).materialize()
        dt = time.time() - t0
        n_cont = int(res.sum("contaminated"))
        hashes[mode] = _assignments_hash(res)
        out[mode] = {"wall_sec": round(dt, 2),
                     "n_contaminated": n_cont,
                     "out_sha256": hashes[mode][:16]}
    return {"metric": "bloom-vs-broadcast decontamination crossover",
            "bench_docs": nb, "bench_distinct_grams": n_grams,
            "train_docs": BENCH_DOCS + bt.num_rows, "num_cpus": num_cpus,
            "outputs_identical": hashes["bloom"] == hashes["broadcast"],
            "bloom_speedup": round(out["broadcast"]["wall_sec"] /
                                   max(out["bloom"]["wall_sec"], 1e-9), 2),
            **out}


def run_suite() -> dict:
    _init_ray(NUM_CPUS)
    import __ray_entry__ as E
    qs = E.queries()
    picks = ["exact_dedup", "full_dedup", "token_count", "doc_stats",
             "top_tokens", "lang_group_stats", "lang_id", "doc_fingerprints",
             "knn_brute", "embedding_dup_pairs_lsh", "repetition_stats",
             "line_dedup", "decontaminate", "url_dedup", "span_dedup",
             "incremental_dedup_bloom", "source_dup_report", "semdedup",
             "paragraph_dedup", "doc_line_dedup", "sliding_windows",
             "heavy_hitters", "tfidf_top_terms",
             # round-3 fifth-session operators
             "incremental_dedup_bucketed", "curation_funnel",
             "normalize_text",
             # round-3 seventh-session operators
             "decontaminate_bloom", "fuzzy_decontaminate_recall",
             # round-5 operators
             "source_overlap", "dup_ratio_estimate", "soft_dedup",
             "span_decontaminate"]
    # headline pages pipeline runs FIRST — before the suite queries build
    # up object-store pressure — and is bracketed by single-core probes so
    # the recorded number carries its own host-drift evidence
    # (VERDICT r3 #5: r3's headline ran last and recorded a drift
    # artifact, not an engine regression)
    probe_before = _cpu_probe()
    pages = run_pages_dedup(NUM_CPUS)
    probe_after = _cpu_probe()
    out: dict[str, float] = {}
    for name in picks:
        t0 = time.time()
        _consume(qs[name](SF_DIR))
        out[name] = round(time.time() - t0, 2)
    out["pages_dedup"] = pages["wall_sec"]
    # hot-band skew stress (salted vs unsalted LSH; separate key so the
    # suite 'value' stays comparable across rounds)
    hotband = run_hotband(NUM_CPUS)
    return {
        "metric": "dedup pipeline suite wall time",
        "value": round(sum(out.values()), 2),
        "unit": "sec",
        "queries": out,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_docs_per_sec": pages["docs_per_sec"],
        "pages_docs": pages["docs"],
        "pages_reps_best_of": BENCH_REPS,
        "pages_cpu_probes_sec": [probe_before, probe_after],
        "hotband": hotband,
    }


def _cpu_probe() -> float:
    """Single-core speed probe (seconds to sort 8M uint64).  This host's
    effective CPU speed drifts 2-3x over tens of minutes (shared VM,
    invisible steal); the probe is recorded next to each scaling leg so
    a drift-skewed efficiency number is visible as such."""
    import numpy as np
    x = np.random.default_rng(0).integers(0, 2 ** 63, size=8_000_000,
                                          dtype=np.uint64)
    t0 = time.time()
    np.sort(x)
    return round(time.time() - t0, 3)


SCALING_PAIRS = int(os.environ.get("DEDUP_SCALING_PAIRS", "3"))


def run_scaling() -> dict:
    """N-vs-4N sandbox protocol, drift-robust: this host's effective CPU
    speed swings 2-3x on a minutes timescale (shared VM, invisible
    steal), so any single 8-vs-32 comparison is hostage to which phase
    each leg landed in.  Protocol: SCALING_PAIRS adjacent (8-cpu,
    32-cpu) fresh-process leg PAIRS over the same pre-synthesized
    corpus; each pair yields its own efficiency ((dps32/dps8)/4) from
    two legs as close in time as possible; the reported value is the
    MEDIAN pair efficiency.  Each leg records a single-core probe so
    residual drift is visible in the artifact."""
    synth_bench_corpus_sub(SCALING_DOCS)
    env = {**os.environ, "DEDUP_BENCH_DOCS": str(SCALING_DOCS),
           "DEDUP_BENCH_REPS": "1"}

    def _leg(cpus: int) -> dict:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pages-only",
             "--cpus", str(cpus)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)

    # a pair QUALIFIES when the three probes bracketing its two legs
    # (before 8, between, after 32) agree within PROBE_BAND: both legs
    # then ran in one host-speed phase and the ratio is trustworthy
    PROBE_BAND = 1.5
    pairs = []
    max_pairs = 2 * SCALING_PAIRS
    while len(pairs) < max_pairs:
        p0 = _cpu_probe()
        l8 = _leg(8)
        p1 = _cpu_probe()
        l32 = _leg(32)
        p2 = _cpu_probe()
        probes = [p0, p1, p2]
        l8["cpu_probe_sec"], l32["cpu_probe_sec"] = p0, p1
        qual = max(probes) / min(probes) <= PROBE_BAND
        pairs.append({
            "eff": round((l32["docs_per_sec"] / l8["docs_per_sec"]) / 4.0, 3),
            "probes": probes,
            "qualified": qual,
            "legs": [l8, l32],
        })
        if sum(p["qualified"] for p in pairs) >= SCALING_PAIRS:
            break
    qualified = [p for p in pairs if p["qualified"]]
    use = qualified or pairs
    effs = sorted(p["eff"] for p in use)
    eff = effs[len(effs) // 2] if len(effs) % 2 else \
        round((effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
    mid = sorted(use, key=lambda p: p["eff"])[len(use) // 2]
    results = {8: mid["legs"][0], 32: mid["legs"][1]}
    basis = "median of probe-qualified adjacent leg pairs" if qualified \
        else ("median of ALL adjacent leg pairs — no pair passed the "
              "probe band, host speed drifted through every pair")
    out = {
        "metric": f"scaling efficiency (8 -> 32 cpus, fresh processes, "
                  f"{basis})",
        "value": eff,
        "unit": "efficiency",
        "runs": results,
        "pairs": pairs,
        "n_qualified": sum(p["qualified"] for p in pairs),
        "docs": SCALING_DOCS,
    }
    _record_baseline(results, eff)
    return out


def run_semdedup_scale(num_cpus: int, n_vecs: int | None = None) -> dict:
    """SemDeDup scale probe: 500k 32-dim vectors (20% planted
    near-copies), auto-sized k-means cells (k = n / 4096), one
    cell-keyed shuffle.  Reports wall, vecs/s, and found-vs-planted
    deletes — the evidence that the semantic-dedup path holds beyond
    the 2k-row sf embeddings table."""
    n_vecs = n_vecs or int(os.environ.get("DEDUP_SEMDEDUP_VECS", "500000"))
    _init_ray(num_cpus)
    import pyarrow.compute as pc
    import ray.data
    from dedup import ann
    from dedup.synth import write_embedding_corpus
    info = write_embedding_corpus(f"/tmp/dedup_semdedup_scale_{n_vecs}",
                                  n_vecs=n_vecs)
    ds = ray.data.read_parquet(info["embeddings"])
    ray.data.range(num_cpus * 8, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b).materialize()
    t0 = time.time()
    out = ann.semdedup(ds, threshold=0.9, num_partitions=num_cpus * 2)
    n_del = 0
    n_rows = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        n_rows += b.num_rows
        n_del += int(pc.sum(pc.cast(pc.equal(b["state"], "delete"),
                                    "int64")).as_py() or 0)
    dt = time.time() - t0
    n_dups = int(info["n_dups"])
    return {
        "metric": "semdedup scale probe",
        "n_vecs": n_vecs,
        "dim": 32,
        "num_cpus": num_cpus,
        "wall_sec": round(dt, 2),
        "vecs_per_sec": round(n_vecs / dt, 1),
        "rows_out": n_rows,
        "planted_dups": n_dups,
        "deletes": n_del,
        "delete_recall_e6": int(round(n_del / n_dups * 1e6)) if n_dups else -1,
    }


def synth_bench_corpus_sub(n_docs: int) -> None:
    subprocess.run([sys.executable, "-c",
                    "import sys; sys.path.insert(0, %r); "
                    "import bench; bench.synth_bench_corpus(%d)"
                    % (os.path.dirname(os.path.abspath(__file__)), n_docs)],
                   check=True)


def _record_baseline(results: dict, eff: float) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
    try:
        text = open(path).read()
    except OSError:
        return
    r8, r32 = results[8], results[32]
    table = (
        "| Run | num_cpus | Input rows | Wall time (s) | Throughput (docs/s) | Recall | Scaling eff. |\n"
        "| --- | --- | --- | --- | --- | --- | --- |\n"
        f"| small-8 | 8 | {r8['docs']} | {r8['wall_sec']} | {r8['docs_per_sec']} | 1.0 (planted, see tests) | — |\n"
        f"| small-32 | 32 | {r32['docs']} | {r32['wall_sec']} | {r32['docs_per_sec']} | 1.0 (planted, see tests) | {eff:.3f} |\n"
    )
    marker = "## 3. Measured"
    if marker in text:
        head = text[: text.index(marker)]
        text = head + marker + " (to be filled by bench runs → `BENCH/BASELINE.md`)\n\n" + table
        with open(path, "w") as fh:
            fh.write(text)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pages-only", action="store_true")
    ap.add_argument("--hotband", action="store_true")
    ap.add_argument("--semdedup-scale", action="store_true")
    ap.add_argument("--span-density", action="store_true")
    ap.add_argument("--substring-scale", action="store_true")
    ap.add_argument("--reduce-path", action="store_true")
    ap.add_argument("--uf-path", action="store_true")
    ap.add_argument("--fuzzy-decon-scale", action="store_true")
    ap.add_argument("--footprint", action="store_true")
    ap.add_argument("--bloom-crossover", action="store_true")
    ap.add_argument("--overlap-scale", action="store_true")
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    args = ap.parse_args()
    import ray
    if args.pages_only:
        print(json.dumps(run_pages_dedup(args.cpus)))
    elif args.hotband:
        print(json.dumps(run_hotband(args.cpus)))
    elif args.semdedup_scale:
        print(json.dumps(run_semdedup_scale(args.cpus)))
    elif args.span_density:
        print(json.dumps(run_span_density(args.cpus)))
    elif args.substring_scale:
        print(json.dumps(run_substring_scale()))
    elif args.reduce_path:
        print(json.dumps(run_reduce_path(args.cpus)))
    elif args.uf_path:
        print(json.dumps(run_uf_path(args.cpus)))
    elif args.fuzzy_decon_scale:
        print(json.dumps(run_fuzzy_decon_scale(args.cpus)))
    elif args.footprint:
        print(json.dumps(run_footprint(args.cpus)))
    elif args.bloom_crossover:
        print(json.dumps(run_bloom_crossover(args.cpus)))
    elif args.overlap_scale:
        print(json.dumps(run_overlap_scale(args.cpus)))
    elif args.scaling:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
