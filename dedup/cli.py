"""CLI entrypoint — the shape a ``ray job submit`` run uses:

    ray job submit --working-dir . -- python -m dedup.cli run \\
        --input /data/pages --output /runs/out --config cfg.json

Subcommands:
  run    read pages parquet -> full dedup -> write assignments parquet
         (+ checkpoints/metrics when --checkpoint-dir or cfg sets one)
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


def cmd_run(args: argparse.Namespace) -> int:
    _init(args.cpus)
    import ray
    import ray.data
    from .config import DedupConfig
    from .pipeline import run_dedup, state_stats
    from .incremental import incremental_dedup

    if args.config:
        cfg = DedupConfig.from_json(open(args.config).read())
    else:
        cfg = DedupConfig()
    if args.checkpoint_dir:
        cfg = cfg.with_(checkpoint_dir=args.checkpoint_dir)

    from .ingest import _infer_format, read_input

    def _read(path: str) -> tuple:
        """Column-pruned read in the declared/inferred format; the html
        extract-invariant check runs only when the source has the
        column (parquet metadata sniff — csv/jsonl sources carry
        extracted text, not raw html)."""
        fmt = args.format if args.format != "auto" else _infer_format(path)
        has_html = False
        if fmt == "parquet":
            import glob
            import pyarrow.parquet as pq
            files = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
                if os.path.isdir(path) else [path]
            if files:
                has_html = "html" in pq.read_schema(files[0]).names
        return read_input(path, cfg, has_html=has_html, format=fmt), has_html

    ds, has_html = _read(args.input)
    t0 = time.time()
    if args.ref_input:
        # cross-snapshot mode: dedup the input against a previously-kept
        # reference corpus (plus within itself), closure semantics
        if cfg.checkpoint_dir:
            raise SystemExit(
                "--checkpoint-dir is not supported in --ref-input mode")
        ref, _ = _read(args.ref_input)
        out = incremental_dedup(ds, ref, cfg, check_html=has_html)
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


def cmd_bench(args: argparse.Namespace) -> int:
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "bench.py")]
    if args.scaling:
        cmd.append("--scaling")
    return subprocess.call(cmd)


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
    rp.add_argument("--checkpoint-dir", default=None)
    rp.add_argument("--cpus", type=int, default=None)
    rp.set_defaults(fn=cmd_run)
    bp = sub.add_parser("bench", help="benchmark suite / scaling runs")
    bp.add_argument("--scaling", action="store_true")
    bp.set_defaults(fn=cmd_bench)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
