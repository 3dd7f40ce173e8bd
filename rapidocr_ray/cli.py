"""CLI entry — the batch-engine replacement for the reference's CLI
(rapid_ocr_api.py:186-193 with init_args, utils.py:172-215) and the
``ray job submit`` entry point of the north rule.

    python -m rapidocr_ray.cli --input '/data/pages/*.parquet' \
        --output /data/out --files-per-partition 4 \
        --set det_box_thresh=0.6 --set text_score=0.5

Owns the Ray session (guarded init); resumable by default: re-running
with the same --output skips partitions whose manifests exist.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def parse_overrides(pairs: list[str]) -> dict:
    """--set key=value, with the reference's prefix-routing semantics
    (det_*/cls_*/rec_* -> sections, utils.py:218-287)."""
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        key, raw = pair.split("=", 1)
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        out[key] = value
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rapidocr_ray")
    ap.add_argument("--input", required=True, help="parquet file, dir or glob of pages")
    ap.add_argument("--output", required=True, help="output directory (resumable)")
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        help="config override key=value (prefix-routed: det_*/cls_*/rec_*/html_*)",
    )
    args = ap.parse_args(argv)

    files = sorted(glob.glob(args.input))
    if not files:
        import os

        if os.path.isdir(args.input):
            files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files match {args.input!r}")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rapidocr_ray.config import PipelineConfig
    from rapidocr_ray.state.manifest import run_resumable

    cfg = PipelineConfig().with_overrides(**parse_overrides(args.overrides))
    report = run_resumable(
        files,
        args.output,
        cfg=cfg,
        files_per_partition=args.files_per_partition,
        dedup=not args.no_dedup,
    )
    summary = {
        "out_dir": report["out_dir"],
        "n_partitions": report["n_partitions"],
        "skipped": report["skipped"],
        "row_count": report["row_count"],
    }
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
