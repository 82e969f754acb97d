"""SparkSession factory with the engine's standard configuration.

Local mode is the sandbox proxy for a multi-executor cluster: partitioning
decisions (shuffle partition count, salting, broadcast thresholds) are made
as if executors were remote, so the same plan scales to a real cluster via
``spark-submit --py-files`` (see jobs/run_rollup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "forecaster_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    - ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.
    - shuffle partitions default to 2×cores locally (AQE coalesces down);
      on a real cluster this would be sized to total executor cores.
    - UTC session timezone pins timestamp semantics for the DuckDB oracle.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # classic (non-ANSI) arithmetic: the token checksum relies on Java
        # long wraparound, and the DuckDB oracle comparison expects
        # permissive casts
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16g, NOT "all the RAM": an oversized local-mode heap is a measured
        # 5-15x slowdown, not headroom. At 48g, G1 lets the young gen balloon
        # to tens of GB; allocation-heavy stages (vectorized parquet reads of
        # token arrays) then hit 0.8-7.3s evacuation pauses and the same scan
        # swings 3s -> 90s (identical loop at 8g: 0.9-1.4s, steady). Local
        # mode puts executor tasks in the driver JVM, so this one value sizes
        # the whole engine; 16g = ~500MB/task at 32 threads, ample at bench
        # scale while keeping young-gen evacuation millisecond-cheap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # cap plan-string rendering: the SQL listener stringifies every
        # executed plan, and an unbounded (default ~2GB) cap lets one
        # pathological plan tree OOM the driver building a UI string for a
        # UI that is disabled anyway. 1MB is plenty for .explain() use.
        .config("spark.sql.maxPlanStringLength", "1048576")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
