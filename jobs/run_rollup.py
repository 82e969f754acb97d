#!/usr/bin/env python
"""spark-submit entrypoint for the tiered rollup pipeline.

Cluster usage (the deployment shape the north rule asks for):
    spark-submit --py-files forecaster_spark.zip jobs/run_rollup.py \
        --corpus <parquet path or 'synthetic:N_DOCS'> --out <dir> [--salt 16]

Sandbox usage (local mode):
    python jobs/run_rollup.py --corpus synthetic:20000 --out /tmp/rollup_out
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # --py-files lands modules on sys.path on a cluster

from forecaster_spark.datagen import gen_corpus  # noqa: E402
from forecaster_spark.plans.pipeline import run_rollup_pipeline  # noqa: E402
from forecaster_spark.session import get_spark  # noqa: E402
from forecaster_spark.sources import read_corpus  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet path or synthetic:N_DOCS")
    ap.add_argument("--out", required=True)
    ap.add_argument("--salt", type=int, default=0, help="salt buckets for the raw rollup (0=off)")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores (sandbox only)")
    ap.add_argument("--no-exact", action="store_true", help="plain double sums")
    ap.add_argument(
        "--checksum",
        default="xxhash",
        choices=["xxhash", "poly", "poly_native"],
        help="per-doc token checksum: xxhash (native, scan-speed) or poly "
        "(reference-exact polynomial, Arrow kernel)",
    )
    ap.add_argument(
        "--runs",
        type=int,
        default=1,
        help="run the pipeline N times (fresh output dir per run, suffix _r{i}); "
        "one JSON line per run. Run 0 doubles as JVM/JIT/codegen warm-up for "
        "steady-state benchmarking — a cluster job amortizes that warm-up "
        "over hours, so steady-state is what scales.",
    )
    args = ap.parse_args(argv)

    spark = get_spark("rollup_pipeline", cpus=args.cpus)
    if args.corpus.startswith("synthetic:"):
        corpus = gen_corpus(spark, int(args.corpus.split(":", 1)[1]))
    else:
        corpus = read_corpus(spark, args.corpus)

    for i in range(args.runs):
        out = args.out if args.runs == 1 else f"{args.out}_r{i}"
        t0 = time.time()
        result = run_rollup_pipeline(
            spark, corpus, out, exact=not args.no_exact, n_salt=args.salt or None,
            checksum=args.checksum,
        )
        wall = time.time() - t0
        counts = result["counts"]
        print(
            json.dumps(
                {
                    "run": i,
                    "wall_sec": round(wall, 3),
                    "rolled_points": counts["total_rolled_points"],
                    "rolled_points_per_sec": round(counts["total_rolled_points"] / wall, 1),
                    "tiers": {k: v for k, v in counts.items() if k != "total_rolled_points"},
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
