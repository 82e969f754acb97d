#!/usr/bin/env python
"""spark-submit entrypoint for the STREAMING 1m rollup → tier-upsert path.

Cluster usage (the deployment shape the north rule asks for):
    spark-submit --py-files forecaster_spark.zip jobs/run_stream_rollup.py \
        --input <parquet dir watched as a file stream> --tier <tier dir> \
        [--watermark "10 minutes"] [--checkpoint <dir>] [--follow]

Sandbox usage (local mode, drains whatever is in --input and exits):
    python jobs/run_stream_rollup.py --input <dir> --tier /tmp/tier_1m

By default the job drains all available input synchronously and exits
(processAllAvailable — CI/smoke shape). ``--follow`` keeps the stream
running and upserting as new files land (the production shape; stop with
SIGINT). Pass ``--checkpoint`` to make the stream resumable across
restarts — combined with the keyed idempotent upsert, a crashed job
re-running a micro-batch converges to the same tier.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")  # --py-files lands modules on sys.path on a cluster

from forecaster_spark.session import get_spark  # noqa: E402
from forecaster_spark.streaming.rollup_stream import stream_rollup_to_tier  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet directory watched as a file stream")
    ap.add_argument("--tier", required=True, help="output 1m tier directory")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--checkpoint", default=None, help="streaming checkpoint dir (resumable)")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores (sandbox only)")
    ap.add_argument("--no-exact", action="store_true", help="plain double sums")
    ap.add_argument(
        "--follow",
        action="store_true",
        help="keep running and upserting as new files land (production shape)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("stream_rollup_job", cpus=args.cpus)
    if args.follow:
        # long-running shape: re-drain in a loop; each drain blocks until
        # the currently-visible files are processed
        import time as _time

        try:
            while True:
                stream_rollup_to_tier(
                    spark, args.input, args.tier,
                    watermark=args.watermark, checkpoint_dir=args.checkpoint,
                    exact=not args.no_exact,
                )
                _time.sleep(5)
        except KeyboardInterrupt:
            pass
    else:
        stream_rollup_to_tier(
            spark, args.input, args.tier,
            watermark=args.watermark, checkpoint_dir=args.checkpoint,
            exact=not args.no_exact,
        )
    n = spark.read.parquet(args.tier).count()
    print(json.dumps({"tier": args.tier, "rolled_points": n}))
    spark.stop()


if __name__ == "__main__":
    main()
