"""spark-submit job entrypoint: validate a clips table end-to-end.

Run locally:

    python -m marshmallow_spark --synth 50000 --output /tmp/msk_run

On a cluster (north_rule packaging: ``spark-submit --py-files``):

    python -m marshmallow_spark --make-pyfiles /tmp/marshmallow_spark.zip
    spark-submit --py-files /tmp/marshmallow_spark.zip \
        scripts/validate_job.py --input s3://bucket/clips --output s3://bucket/run1

The job is resumable: completed buckets (per-partition manifests under
``<output>/manifest/``) are skipped on re-invocation, so a killed run
continues where it stopped (SURVEY.md §4.2(3), A8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def build_pyfiles_zip(dest: str) -> str:
    """Package this library for ``spark-submit --py-files``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return dest


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="marshmallow_spark",
        description="Validate an audio clips table (full constraint suite).",
    )
    p.add_argument("--input", help="parquet path (or table name under --sf-dir)")
    p.add_argument("--synth", type=int, default=None,
                   help="generate a deterministic synthetic clips table of N rows instead of --input")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR"))
    p.add_argument("--output", help="run directory (violations + manifests)")
    p.add_argument("--num-buckets", type=int, default=64,
                   help="stable hash(clip_id) buckets for checkpointing")
    p.add_argument("--buckets-per-batch", type=int, default=16)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--no-audio", action="store_true", help="skip the audio SNR invariant")
    p.add_argument("--salted", action="store_true", help="salted two-phase uniqueness agg")
    p.add_argument("--quality", default=None, metavar="JSON",
                   help='opt-in signal-quality gate thresholds, e.g. '
                        '\'{"min_rms_dbfs": -60, "max_clipping_ratio": 0.001}\' '
                        "(fused into the invariant decode when both audio checks run)")
    p.add_argument("--speech-rate", default=None, metavar="LO,HI",
                   help="flag transcripts outside LO..HI chars/sec of claimed duration")
    p.add_argument("--audio-dedup", action="store_true",
                   help="flag acoustic-duplicate clips (fingerprint clusters) "
                        "against their cluster representative")
    p.add_argument("--fail-fast", action="store_true",
                   help="exit nonzero if any violation was found (Schema.load parity)")
    p.add_argument("--snapshot-id", default=None)
    p.add_argument("--incremental", action="store_true",
                   help="validate only rows appended since the last validated "
                        "snapshot of a snapshot-manifest table --input "
                        "(lineage + per-snapshot violations under --output); "
                        "the nightly-append deployment mode")
    p.add_argument("--master", default=None)
    p.add_argument("--make-pyfiles", metavar="ZIP",
                   help="write a --py-files zip of this package and exit")
    args = p.parse_args(argv)

    if args.make_pyfiles:
        path = build_pyfiles_zip(args.make_pyfiles)
        print(json.dumps({"pyfiles": path}))
        return 0
    if not args.output:
        p.error("--output is required")
    if not args.input and args.synth is None:
        p.error("one of --input or --synth is required")

    from .plans.checkpoint import CheckpointedRun
    from .plans.pipeline import ClipValidationSuite
    from .session import get_spark
    from .sources.synth import codecs_dim, synth_clips
    from .sources.tables import current_snapshot_id, load_table

    spark = get_spark("marshmallow_spark_validate", master=args.master)
    if args.synth is not None:
        df = synth_clips(spark, args.synth, num_partitions=args.num_buckets)
    else:
        if args.snapshot_id is None:
            # pin the current Iceberg snapshot so resumed invocations
            # read the exact same data even if upstream appends
            args.snapshot_id = current_snapshot_id(spark, args.input)
        df = load_table(spark, args.input, sf_dir=args.sf_dir,
                        snapshot_id=args.snapshot_id)
        expected = {"clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"}
        missing = expected - set(df.columns)
        if missing:
            print(json.dumps({
                "error": "input is not a clips table",
                "missing_columns": sorted(missing),
                "expected": sorted(expected),
            }))
            spark.stop()
            return 2

    speech_rate = None
    if args.speech_rate:
        lo, hi = (float(x) for x in args.speech_rate.split(","))
        speech_rate = (lo, hi)
    suite = ClipValidationSuite(
        codecs_dim(spark),
        check_audio=not args.no_audio,
        salted_uniqueness=args.salted,
        quality_thresholds=json.loads(args.quality) if args.quality else None,
        speech_rate_bounds=speech_rate,
        audio_dedup=args.audio_dedup,
    )
    if args.incremental:
        from .sources.snapshots import SnapshotTable, SnapshotValidationLog

        if args.synth is not None or not args.input:
            p.error("--incremental requires --input pointing at a snapshot-manifest table")
        log = SnapshotValidationLog(SnapshotTable(args.input), args.output)
        manifest = log.validate_increment(spark, suite)
        summary = (
            {"up_to_date": True, "last_validated": log.last_validated()}
            if manifest is None
            else {"up_to_date": False, **manifest}
        )
        summary["output"] = args.output
        print(json.dumps(summary))
        spark.stop()
        if args.fail_fast and summary.get("violations", 0) > 0:
            return 1
        return 0

    run = CheckpointedRun(
        suite, args.output,
        num_buckets=args.num_buckets,
        snapshot_id=args.snapshot_id,
    )
    resumed_from = len(run.completed_buckets())
    written = run.run(
        df,
        buckets_per_batch=args.buckets_per_batch,
        max_batches=args.max_batches,
    )
    manifests = run.manifests()
    summary = {
        "buckets_total": args.num_buckets,
        "buckets_completed": len(manifests),
        "buckets_resumed_from": resumed_from,
        "buckets_this_run": len(written),
        "rows": sum(m["rows"] for m in manifests),
        "violations": sum(m["violations"] for m in manifests),
        "buckets_passed": sum(1 for m in manifests if m["passed"]),
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()
    if args.fail_fast and summary["violations"] > 0:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
