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


def stream_rollup_to_tier(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
    exact: bool = True,
    tie_break: bool = False,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive a file stream into an on-disk 1m tier via a ``foreachBatch``
    keyed upsert — the production sink shape the memory-sink harnesses
    stand in for.

    UPDATE output mode emits each changed window with its fully recomputed
    aggregate, so the upsert is a plain key replacement: drop the tier rows
    whose (source, bucket_start) appear in the micro-batch, union the
    batch, rewrite. Idempotent per key — replaying a micro-batch converges
    to the same tier — which is exactly what foreachBatch's at-least-once
    delivery needs. Late rows inside the watermark update their window's
    tier row on arrival; the final tier equals the batch rollup of all
    input (test-asserted).

    The local-FS rewrite (write tmp dir, swap) is the sandbox stand-in for
    a real table format's atomic row-level MERGE (Iceberg/Delta); the
    dataflow — update-mode windows keyed-upserted into the tier — is the
    part that carries to a cluster. Synchronous (processAllAvailable);
    pass ``checkpoint_dir`` to make the stream itself resumable."""
    import shutil
    import tempfile

    stream = (
        spark.readStream.schema(SERIES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    rolled = stream_rollup_1m(stream, watermark=watermark, exact=exact, tie_break=tie_break)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        import os

        sess = batch_df.sparkSession
        cols = batch_df.columns
        try:
            existing = sess.read.parquet(tier_dir).select(*cols)
            has_tier = True
        except Exception:
            has_tier = False
        if has_tier:
            merged = existing.join(
                batch_df.select("source", "bucket_start"),
                ["source", "bucket_start"],
                "left_anti",
            ).unionByName(batch_df)
        else:
            merged = batch_df
        # the tmp hop exists because `merged` lazily reads tier_dir — writing
        # tier_dir in place would clobber the job's own input. One Spark write
        # into tmp materializes the merge; the swap is then a filesystem
        # rename, NOT a second write+read (which would double the sink's I/O
        # per micro-batch). The tmp dir is a SIBLING of the tier dir so the
        # rename never crosses a mount (os.rename raises EXDEV across
        # filesystems; TMPDIR is often a different mount than the data path).
        parent = os.path.dirname(os.path.abspath(tier_dir)) or "."
        os.makedirs(parent, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="_tier_upsert_", dir=parent) + "/t"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(tier_dir, ignore_errors=True)
        os.rename(tmp, tier_dir)
        shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)

    writer = rolled.writeStream.outputMode("update").foreachBatch(upsert)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


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
