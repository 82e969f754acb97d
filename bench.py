#!/usr/bin/env python
"""Benchmark runner (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and the full tiered rollup pipeline on the
seeded synthetic token corpus sized to the same SF, then prints ONE JSON
line.

Headline metric (BASELINE.md): rolled-points/sec across all retention tiers.
Corpus generation is *untimed* (written to parquet first); the timed pipeline
reads parquet → seriesify → 1m/1h/1d (+gap-fill +Gorilla) with
checkpoint/lineage enabled — i.e. the full production path, cold.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from forecaster_spark.datagen import gen_corpus  # noqa: E402
from forecaster_spark.plans.pipeline import run_rollup_pipeline  # noqa: E402
from forecaster_spark.session import get_spark  # noqa: E402

DOCS_PER_SF = 2_000_000  # sf0.1 → 200k docs (FIXTURES.md F1)


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _force(df) -> int:
    """Materialize every column (noop sink — count() alone would let
    Catalyst prune the computed columns)."""
    df.write.format("noop").mode("overwrite").save()
    return 1


def _spin_ms() -> float:
    """Single-thread CPU calibration (20M-iteration integer loop): this
    shared VM's per-core speed swings ~3× between time windows (measured
    1.4→4.0 s for this loop within one hour, 0% steal, no local load), so
    every recorded benchmark carries the host speed it ran under —
    round-over-round comparisons divide by this weather."""
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return round((time.time() - t0) * 1000, 1)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    sf = _sf_from_dir(sf_dir)
    spark = get_spark("bench", cpus=cpus)

    # warm the JVM/JIT/python-worker pool AND the parquet scan path once (a
    # fresh session's first job carries ~6 s of one-time warm-up, and the
    # first parquet read pays its own codegen — both would otherwise be
    # booked to whichever query runs first). Also warm the three heavy
    # machinery classes the queries share — window functions, shuffle
    # aggregation, Arrow pandas-UDF workers — with one tiny job each:
    # measured cold-vs-warm deltas of 3-5 s per query class otherwise land
    # on whichever query hits the class first (asof_join: 6.4 s cold /
    # 1.7 s warm at sf0.1).
    from pyspark.sql import functions as _F

    _force(spark.range(100_000).selectExpr("id", "xxhash64(id) h"))
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    _force(
        spark.range(10_000)
        .selectExpr("id % 7 AS k", "id AS v")
        .selectExpr("k", "v", "sum(v) OVER (PARTITION BY k ORDER BY v) AS rs")
        .groupBy("k")
        .agg(_F.sum("rs"))
    )
    _warm_udf = _F.pandas_udf(lambda s: s + 1, "long")
    _force(spark.range(10_000).select(_warm_udf(_F.col("id"))))

    spin_before = _spin_ms()

    # 32-way JVM probe: single-thread spin does NOT certify a usable window
    # on this host — an interleaved r1-vs-r3 A/B (BENCH/BASELINE.md) caught
    # the pipeline at 26–86 s for identical work while spin stayed at
    # 1.4–1.7 s, i.e. co-tenant contention can cut PARALLEL throughput
    # 5–15× with per-core speed intact. This fixed JVM aggregate measures
    # the resource Spark will actually get.
    t0 = time.time()
    spark.range(0, 1_600_000_000, 1, cpus).selectExpr(
        "sum(id % 7) AS s"
    ).collect()
    probe32 = round((time.time() - t0) * 1000, 1)

    # allocation-heavy probe: spin and probe32 allocate nothing, so they
    # were blind to the round-3 G1 pathology (48g heap → multi-second young
    # evacuation pauses on parquet token scans while ALU probes read
    # healthy; see BENCH/BASELINE.md "Round-3 RESOLUTION"). This fixed job
    # allocates one small array per row across all cores — if recorded
    # numbers are slow while spin/probe32 are fast but THIS is also slow,
    # suspect heap/GC configuration before host weather.
    t0 = time.time()
    spark.range(0, 40_000_000, 1, cpus).selectExpr(
        "sum(xxhash64(array(id, id + 1, id + 2, id + 3))) AS s"
    ).collect()
    probe_alloc = round((time.time() - t0) * 1000, 1)

    # HEADLINE FIRST: the host slows under its own sustained load (measured
    # pipeline walls degrading 6→14→24 s across back-to-back runs in one
    # session, single-thread spin swinging ~3× between windows) — so the
    # headline pipeline is measured right after warm-up, NOT after ~150
    # sustained query jobs have heated the window.
    n_docs = max(int(DOCS_PER_SF * sf), 2000)
    work = tempfile.mkdtemp(prefix="fs_bench_")
    corpus_path = f"{work}/corpus"
    gen_corpus(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # steady-state protocol (same as tools/bench_scaling.py): one warm-up
    # run absorbs plan compile + python-worker spin-up, then best of FIVE
    # timed runs — at sf0.1 the pipeline is job-latency-bound and warm runs
    # measured 4.7-11.0 s within ONE session (2.3x spread, healthy probes);
    # with that variance a best-of-3 under-reads the engine by ~40% in an
    # unlucky draw, and the extra two runs cost ~15 s per bench
    run_rollup_pipeline(spark, corpus, f"{work}/rollup_warm")
    pipeline_wall = float("inf")
    for i in range(5):
        t0 = time.time()
        result = run_rollup_pipeline(spark, corpus, f"{work}/rollup_{i}")
        pipeline_wall = min(pipeline_wall, time.time() - t0)
    points = result["counts"]["total_rolled_points"]
    rps = points / pipeline_wall

    # best-of-2 per query: the shared host's external load spikes mid-suite
    # (observed 0.5 → 15 within a 3-minute bench), and a single sample books
    # whatever spike it landed on as that query's cost; the better of two
    # runs is a far more stable round-over-round signal
    query_times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        query_times[name] = round(best, 3)

    payload = {
        "metric": "rolled_points_per_sec",
        "value": round(rps, 1),
        "unit": "points/sec",
        "queries": query_times,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "rolled_points": points,
        "pipeline_wall_sec": round(pipeline_wall, 3),
        "queries_wall_sec": round(sum(query_times.values()), 3),
        "spin_ms_before": spin_before,
        "spin_ms_after": _spin_ms(),
        "probe32_ms": probe32,
        "probe_alloc_ms": probe_alloc,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
