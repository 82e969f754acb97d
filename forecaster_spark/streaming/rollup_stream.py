"""Structured Streaming wrapper over the 1m rollup (optional north-rule
extension; the batch pipeline with resumable stages is the primary path —
SURVEY.md §1.2).

The same aggregate algebra as ``operators.rollup`` runs over a file stream
with an event-time watermark for late data. In production the source would
be Kafka/files landing in the corpus directory and the sink a ``foreachBatch``
upsert into the 1m tier (idempotent by (source, window)); here the memory
sink + ``processAllAvailable`` drives it synchronously for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SERIES_SCHEMA = "source string, ts timestamp, y double"


def stream_rollup_1m(
    stream: DataFrame, watermark: str = "10 minutes", tie_break: bool = False, exact: bool = False
) -> DataFrame:
    """Event-time windowed 1m rollup over a streaming series DataFrame.
    ``exact=True`` sums in integer micro-units like the batch operator, so
    the streamed result is bit-identical to the batch rollup regardless of
    micro-batch boundaries (stream ≡ batch is the driver-checkable
    invariant)."""
    if tie_break:
        first = F.min(F.struct(F.col("ts").alias("t"), F.col("y").alias("v"))).getField("v")
        last = F.max(F.struct(F.col("ts").alias("t"), F.col("y").alias("v"))).getField("v")
    else:
        first = F.min_by("y", "ts")
        last = F.max_by("y", "ts")
    if exact:
        sm = F.sum(F.round(F.col("y") * 1_000_000).cast("long"))
        sum_y, mean_y = (sm / 1_000_000), (sm / 1_000_000 / F.count("y"))
    else:
        sum_y, mean_y = F.sum("y"), (F.sum("y") / F.count("y"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", "1 minute"))
        .agg(
            F.count("y").alias("cnt"),
            sum_y.alias("sum_y"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            mean_y.alias("mean_y"),
            first.alias("first_y"),
            last.alias("last_y"),
        )
        .select(
            "source",
            F.col("window.start").alias("bucket_start"),
            "cnt", "sum_y", "min_y", "max_y", "mean_y", "first_y", "last_y",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, input_dir: str, query_name: str = "rollup_stream", watermark: str = "10 minutes"
) -> DataFrame:
    """Drive a parquet-directory stream to completion synchronously and
    return the rolled result (test/smoke harness)."""
    stream = (
        spark.readStream.schema(SERIES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    rolled = stream_rollup_1m(stream, watermark)
    q = (
        rolled.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
