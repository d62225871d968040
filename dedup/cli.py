"""CLI entrypoint — the shape a ``ray job submit`` run uses:

    ray job submit --working-dir . -- python -m dedup.cli run \\
        --input /data/pages --output /runs/out --config cfg.json

Subcommands:
  run    read pages parquet/csv/jsonl -> full dedup -> write assignments
         parquet (+ checkpoints/metrics when --checkpoint-dir or cfg
         sets one); --ref-input = cross-snapshot closure dedup,
         --ref-index = storage-partitioned cross-snapshot exact dedup
  index  build a bucketed reference index (--kind exact | bands), one
         dir per corpus dump, self-describing via _index.json
  filter near-dup filter of a new snapshot against band indexes
  overlap   cross-source content-overlap report (exact counts +
            Jaccard, or --sketch for the shuffle-free estimate)
  estimate  pre-flight dup-ratio estimate from a content-hash-space
            slice (is dedup worth the shuffle?)
  soften    relax an existing run to keep-up-to-k copies per cluster
  bench  two fresh-process runs at different --cpus for the scaling
         protocol (delegates to bench.py)

This module owns its Ray session (guarded init), unlike the library /
__ray_entry__ which never call ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init(num_cpus: int | None) -> None:
    import ray
    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kw)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    from dedup.dist import quiet_empty_schema_warnings
    quiet_empty_schema_warnings()


def _load_cfg(args: argparse.Namespace):
    from .config import DedupConfig
    if getattr(args, "config", None):
        cfg = DedupConfig.from_json(open(args.config).read())
    else:
        cfg = DedupConfig()
    if getattr(args, "checkpoint_dir", None):
        cfg = cfg.with_(checkpoint_dir=args.checkpoint_dir)
    return cfg


def _read_source(path: str, cfg, fmt_arg: str) -> tuple:
    """Column-pruned read in the declared/inferred format; the html
    extract-invariant check runs only when the source has the column
    (parquet metadata sniff — csv/jsonl sources carry extracted text,
    not raw html)."""
    from .ingest import _infer_format, read_input
    fmt = fmt_arg if fmt_arg != "auto" else _infer_format(path)
    has_html = False
    if fmt == "parquet":
        import glob
        import pyarrow.parquet as pq
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
            if os.path.isdir(path) else [path]
        if files:
            has_html = "html" in pq.read_schema(files[0]).names
    return read_input(path, cfg, has_html=has_html, format=fmt), has_html


def cmd_run(args: argparse.Namespace) -> int:
    _init(args.cpus)
    import ray
    import ray.data
    from .pipeline import run_dedup, state_stats
    from .incremental import incremental_dedup

    cfg = _load_cfg(args)
    ds, has_html = _read_source(args.input, cfg, args.format)
    t0 = time.time()
    if args.ref_input and args.ref_index:
        raise SystemExit("--ref-input and --ref-index are exclusive")
    if args.ref_input or args.ref_index:
        # cross-snapshot mode: dedup the input against a previously-kept
        # reference corpus (plus within itself)
        if cfg.checkpoint_dir:
            raise SystemExit(
                "--checkpoint-dir is not supported in cross-snapshot mode")
    if args.ref_input:
        ref, _ = _read_source(args.ref_input, cfg, args.format)
        out = incremental_dedup(ds, ref, cfg, check_html=has_html)
    elif args.ref_index:
        # storage-partitioned mode: the reference is a bucketed exact-key
        # index written by `dedup index --kind exact`; no ref-side shuffle
        from .incremental import (incremental_exact_dedup_bucketed,
                                  read_index_meta)
        dirs = args.ref_index.split(",")
        meta = read_index_meta(dirs[0], "exact")
        out = incremental_exact_dedup_bucketed(
            ds, dirs, cfg, n_buckets=meta["n_buckets"],
            check_html=has_html)
    else:
        out = run_dedup(ds, cfg, check_html=has_html)
    os.makedirs(args.output, exist_ok=True)
    assign_dir = os.path.join(args.output, "assignments")
    if os.path.isdir(assign_dir):  # rerun: replace, don't append files
        import shutil
        shutil.rmtree(assign_dir)
    out.write_parquet(assign_dir)
    stats = {r["state"]: r["count()"] for r in state_stats(
        ray.data.read_parquet(os.path.join(args.output, "assignments"))
    ).iter_rows()}
    report = {
        "input": args.input,
        "ref_input": args.ref_input,
        "ref_index": args.ref_index,
        "output": args.output,
        "config_fingerprint": cfg.fingerprint(),
        "wall_sec": round(time.time() - t0, 2),
        "states": stats,
    }
    with open(os.path.join(args.output, "run.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    with open(os.path.join(args.output, "config.json"), "w") as fh:
        fh.write(cfg.to_json())
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_index(args: argparse.Namespace) -> int:
    """Build a bucketed reference index (dir per dump): kind=exact for
    the storage-partitioned exact dedup, kind=bands for the LSH near-dup
    filter.  The index is self-describing (_index.json) and probes
    validate bucket count + key-affecting knobs."""
    _init(args.cpus)
    import ray
    from .incremental import write_band_index, write_key_index

    cfg = _load_cfg(args)
    ds, _ = _read_source(args.input, cfg, args.format)
    t0 = time.time()
    fn = write_key_index if args.kind == "exact" else write_band_index
    out = fn(ds, cfg, args.output, n_buckets=args.buckets)
    report = {
        "input": args.input,
        "output": out,
        "kind": args.kind,
        "buckets": args.buckets,
        "config_fingerprint": cfg.fingerprint(),
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_filter(args: argparse.Namespace) -> int:
    """Cross-snapshot NEAR-dup filter against band indexes: writes
    (id, ref_near, n_band_hits) parquet + a flag-count report."""
    _init(args.cpus)
    import ray
    import ray.data
    from .incremental import incremental_minhash_filter, read_index_meta

    cfg = _load_cfg(args)
    ds, _ = _read_source(args.input, cfg, args.format)
    dirs = args.band_index.split(",")
    meta = read_index_meta(dirs[0], "bands")
    t0 = time.time()
    out = incremental_minhash_filter(ds, dirs, cfg,
                                     n_buckets=meta["n_buckets"])
    os.makedirs(args.output, exist_ok=True)
    flags_dir = os.path.join(args.output, "flags")
    if os.path.isdir(flags_dir):  # rerun: replace, don't append
        import shutil
        shutil.rmtree(flags_dir)
    out.write_parquet(flags_dir)
    import pyarrow.compute as pc
    flagged = total = 0
    for b in ray.data.read_parquet(flags_dir, columns=["ref_near"]) \
            .iter_batches(batch_format="pyarrow"):
        total += b.num_rows
        flagged += int(pc.sum(pc.cast(b["ref_near"], "int64")).as_py() or 0)
    report = {
        "input": args.input,
        "band_index": dirs,
        "output": args.output,
        "n_docs": total,
        "n_flagged": flagged,
        "wall_sec": round(time.time() - t0, 2),
    }
    with open(os.path.join(args.output, "filter.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_remark(args: argparse.Namespace) -> int:
    """Post-hoc keeper re-marking over a finished run directory (the
    reference's manual keep<->delete toggle, MainWindow.xaml.cs:15-37):
    --keeper <id> becomes its cluster's keeper; assignments are
    rewritten in place (write-to-tmp + atomic directory swap, so a
    crashed remark never leaves a half-written table) and any sink
    outputs present in the run dir (delete_manifest/, survivors/) are
    re-derived from the new assignments so every artifact stays
    consistent.  run.json's state counts are refreshed and the remark is
    appended to a remarks.json audit log."""
    _init(args.cpus)
    import shutil

    import ray
    import ray.data
    from .config import DedupConfig
    from .pipeline import remark_keeper, state_stats
    from .sinks import write_action_manifest, write_survivors

    cfg_path = os.path.join(args.run, "config.json")
    cfg = DedupConfig.from_json(open(cfg_path).read()) \
        if os.path.exists(cfg_path) else _load_cfg(args)
    assign_dir = os.path.join(args.run, "assignments")
    if not os.path.isdir(assign_dir):
        raise SystemExit(f"no assignments/ under {args.run}")
    t0 = time.time()
    assignments = ray.data.read_parquet(assign_dir)
    id_type = assignments.schema().base_schema.field(cfg.id_col).type
    import pyarrow as pa
    keeper = args.keeper if (pa.types.is_string(id_type)
                             or pa.types.is_large_string(id_type)) \
        else int(args.keeper)
    out = remark_keeper(assignments, keeper, id_col=cfg.id_col)
    tmp = assign_dir + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    out.write_parquet(tmp)
    old = assign_dir + ".old"
    os.rename(assign_dir, old)
    os.rename(tmp, assign_dir)
    shutil.rmtree(old)
    new_assign = ray.data.read_parquet(assign_dir)
    rederived = []
    if os.path.isdir(os.path.join(args.run, "delete_manifest")):
        write_action_manifest(new_assign, args.run, id_col=cfg.id_col)
        rederived.append("delete_manifest")
    if os.path.isdir(os.path.join(args.run, "survivors")):
        if not args.input:
            raise SystemExit(
                "run dir has survivors/ — pass --input <pages> so the "
                "survivor content join can be re-derived")
        pages, _ = _read_source(args.input, cfg, args.format)
        write_survivors(pages, new_assign, args.run, id_col=cfg.id_col)
        rederived.append("survivors")
    stats = {r["state"]: r["count()"]
             for r in state_stats(new_assign).iter_rows()}
    report = {
        "run": args.run,
        "keeper": args.keeper,
        "rederived": rederived,
        "states": stats,
        "wall_sec": round(time.time() - t0, 2),
    }
    run_json = os.path.join(args.run, "run.json")
    if os.path.exists(run_json):
        rj = json.load(open(run_json))
        rj["states"] = stats
        with open(run_json, "w") as fh:
            json.dump(rj, fh, indent=2)
    audit = os.path.join(args.run, "remarks.json")
    log = json.load(open(audit)) if os.path.exists(audit) else []
    log.append(report)
    with open(audit, "w") as fh:
        json.dump(log, fh, indent=2)
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "bench.py")]
    if args.scaling:
        cmd.append("--scaling")
    return subprocess.call(cmd)


def cmd_compact(args: argparse.Namespace) -> int:
    """Merge several per-dump index dirs into one (periodic index
    maintenance — restores one file per bucket; probe-equivalent)."""
    _init(args.cpus)
    import ray
    from .incremental import compact_index

    t0 = time.time()
    rep = compact_index(args.indexes.split(","), args.output)
    rep.update({"output": args.output,
                "wall_sec": round(time.time() - t0, 2)})
    print(json.dumps(rep))
    ray.shutdown()
    return 0


def _read_columns(path: str, fmt_arg: str, columns: list[str]):
    """Generic pruned read for report verbs (no dedup working-table
    construction — these operate on arbitrary (source, text) tables)."""
    import ray.data
    from .ingest import _infer_format
    fmt = fmt_arg if fmt_arg != "auto" else _infer_format(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    if fmt == "csv":
        return ray.data.read_csv(path).select_columns(columns)
    return ray.data.read_json(path).select_columns(columns)


def cmd_overlap(args: argparse.Namespace) -> int:
    """Cross-source content-overlap report: which sources share distinct
    texts, with Jaccard (exact by default; --sketch switches to the
    shuffle-free MinHash union-sketch estimate)."""
    _init(args.cpus)
    import ray
    from .overlap import source_overlap, source_overlap_sketch

    ds = _read_columns(args.input, args.format,
                       [args.source_col, args.text_col])
    t0 = time.time()
    if args.sketch:
        out = source_overlap_sketch(ds, source_col=args.source_col,
                                    text_col=args.text_col)
    else:
        out = source_overlap(ds, source_col=args.source_col,
                             text_col=args.text_col)
    os.makedirs(args.output, exist_ok=True)
    rep_dir = os.path.join(args.output, "overlap")
    if os.path.isdir(rep_dir):
        import shutil
        shutil.rmtree(rep_dir)
    out.write_parquet(rep_dir)
    n = ray.data.read_parquet(rep_dir).count()
    print(json.dumps({"input": args.input, "output": rep_dir,
                      "mode": "sketch" if args.sketch else "exact",
                      "pairs": n,
                      "wall_sec": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_estimate(args: argparse.Namespace) -> int:
    """Pre-flight duplicate-ratio estimate from a deterministic slice of
    content-hash space (the 'is dedup worth the shuffle' check)."""
    _init(args.cpus)
    import ray
    from .overlap import dup_ratio_estimate

    ds = _read_columns(args.input, args.format,
                       [args.source_col, args.text_col])
    t0 = time.time()
    out = dup_ratio_estimate(ds, slice_hex=args.slice,
                             source_col=args.source_col,
                             text_col=args.text_col)
    rows = [dict(r) for r in out.iter_rows()]   # <= #sources rows
    total = sum(r["n_sampled"] for r in rows)
    dup = sum(r["n_dup"] for r in rows)
    print(json.dumps({
        "input": args.input, "slice_hex": args.slice,
        "n_sampled": total, "n_dup": dup,
        "dup_ratio_e6": int(1e6 * dup / total) if total else 0,
        "per_source": rows,
        "wall_sec": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_soften(args: argparse.Namespace) -> int:
    """Relax an existing run's keeper policy to keep-up-to-k copies per
    cluster (soft dedup post-pass; matching work fully reused)."""
    _init(args.cpus)
    import ray
    import ray.data
    from .pipeline import soft_dedup, state_stats

    asn_dir = os.path.join(args.assignments, "assignments") \
        if os.path.isdir(os.path.join(args.assignments, "assignments")) \
        else args.assignments
    asn = ray.data.read_parquet(asn_dir)
    id_col = args.id_col or asn.schema().names[0]
    t0 = time.time()
    out = soft_dedup(asn, k=args.k, id_col=id_col)
    os.makedirs(args.output, exist_ok=True)
    out_dir = os.path.join(args.output, "assignments")
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    out.write_parquet(out_dir)
    stats = {r["state"]: r["count()"] for r in state_stats(
        ray.data.read_parquet(out_dir)).iter_rows()}
    print(json.dumps({"assignments": asn_dir, "output": out_dir,
                      "k": args.k, "id_col": id_col, "states": stats,
                      "wall_sec": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dedup")
    sub = ap.add_subparsers(dest="cmd", required=True)
    rp = sub.add_parser("run", help="full dedup over a pages parquet dir")
    rp.add_argument("--input", required=True)
    rp.add_argument("--output", required=True)
    rp.add_argument("--config", default=None, help="DedupConfig JSON path")
    rp.add_argument("--ref-input", default=None,
                    help="previously-kept reference corpus parquet: dedup "
                         "--input against it (cross-snapshot mode; matched "
                         "docs become state=ref_dup)")
    rp.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "csv", "jsonl"),
                    help="input format (auto = sniff by file extension)")
    rp.add_argument("--ref-index", default=None,
                    help="comma-separated bucketed exact-key index dirs "
                         "(dedup index --kind exact): storage-partitioned "
                         "cross-snapshot mode, no reference-side shuffle")
    rp.add_argument("--checkpoint-dir", default=None)
    rp.add_argument("--cpus", type=int, default=None)
    rp.set_defaults(fn=cmd_run)
    ip = sub.add_parser("index", help="build a bucketed reference index")
    ip.add_argument("--input", required=True)
    ip.add_argument("--output", required=True)
    ip.add_argument("--kind", default="exact", choices=("exact", "bands"))
    ip.add_argument("--buckets", type=int, default=256)
    ip.add_argument("--config", default=None)
    ip.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "csv", "jsonl"))
    ip.add_argument("--cpus", type=int, default=None)
    ip.set_defaults(fn=cmd_index)
    fp = sub.add_parser("filter",
                        help="near-dup filter against band indexes")
    fp.add_argument("--input", required=True)
    fp.add_argument("--band-index", required=True,
                    help="comma-separated band index dirs "
                         "(dedup index --kind bands)")
    fp.add_argument("--output", required=True)
    fp.add_argument("--config", default=None)
    fp.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "csv", "jsonl"))
    fp.add_argument("--cpus", type=int, default=None)
    fp.set_defaults(fn=cmd_filter)
    cp = sub.add_parser("compact",
                        help="merge per-dump index dirs into one")
    cp.add_argument("--indexes", required=True,
                    help="comma-separated index dirs (same kind/buckets)")
    cp.add_argument("--output", required=True)
    cp.add_argument("--cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)
    mp = sub.add_parser("remark",
                        help="re-mark a cluster's keeper in a finished "
                             "run dir and re-derive its sinks")
    mp.add_argument("--run", required=True,
                    help="run output dir (contains assignments/)")
    mp.add_argument("--keeper", required=True,
                    help="id of the member to promote to keeper")
    mp.add_argument("--input", default=None,
                    help="original pages source (required only when the "
                         "run dir has survivors/ to re-derive)")
    mp.add_argument("--config", default=None)
    mp.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "csv", "jsonl"))
    mp.add_argument("--cpus", type=int, default=None)
    mp.set_defaults(fn=cmd_remark)
    op = sub.add_parser("overlap",
                        help="cross-source content-overlap report "
                             "(exact, or --sketch for shuffle-free)")
    op.add_argument("--input", required=True)
    op.add_argument("--output", required=True)
    op.add_argument("--source-col", default="source")
    op.add_argument("--text-col", default="text")
    op.add_argument("--sketch", action="store_true")
    op.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "csv", "jsonl"))
    op.add_argument("--cpus", type=int, default=None)
    op.set_defaults(fn=cmd_overlap)
    ep = sub.add_parser("estimate",
                        help="pre-flight dup-ratio estimate from a "
                             "content-hash-space slice")
    ep.add_argument("--input", required=True)
    ep.add_argument("--slice", default="28",
                    help="2-hex-char md5-prefix bound ('28' ~ 15.6%%; "
                         "'zz' = exact full corpus)")
    ep.add_argument("--source-col", default="source")
    ep.add_argument("--text-col", default="text")
    ep.add_argument("--format", default="auto",
                    choices=("auto", "parquet", "csv", "jsonl"))
    ep.add_argument("--cpus", type=int, default=None)
    ep.set_defaults(fn=cmd_estimate)
    sp = sub.add_parser("soften",
                        help="relax an existing run to keep-up-to-k "
                             "copies per cluster")
    sp.add_argument("--assignments", required=True,
                    help="run output dir (or its assignments/ subdir)")
    sp.add_argument("--output", required=True)
    sp.add_argument("--k", type=int, required=True)
    sp.add_argument("--id-col", default=None,
                    help="id column (default: first column)")
    sp.add_argument("--cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_soften)
    bp = sub.add_parser("bench", help="benchmark suite / scaling runs")
    bp.add_argument("--scaling", action="store_true")
    bp.set_defaults(fn=cmd_bench)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
