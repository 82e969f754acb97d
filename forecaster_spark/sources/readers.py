"""Sources & sinks (SURVEY.md §2.1).

The reference's only source is a CSV scan + column projection
(Examples/Example_Covid19.py:122-126) and its only sink is stdout
(forecaster.py:433-443). The engine generalizes to schema-declared Parquet
readers (Iceberg-layout partitioned directories; a real Iceberg catalog needs
its jars, gated behind try-import) and partitioned Parquet sinks for rollup /
lineage / metrics tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forecaster_spark.datagen import CORPUS_SCHEMA

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of a driver testdata table; Catalyst handles column
    pruning + predicate pushdown on the downstream plan."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a token corpus with the declared schema (no inference) —
    (doc_id, tokens array<int>, n_tok, source)."""
    return spark.read.schema(CORPUS_SCHEMA).parquet(path)


def read_csv_series(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """Reference-parity CSV source: header scan + column projection
    (Example_Covid19.py:122-126 does pd.read_csv → df[cols])."""
    return spark.read.csv(path, header=True, inferSchema=True).select(*columns)


def write_tiered(df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite") -> None:
    """Partitioned Parquet sink (Iceberg-style layout: partition columns in
    directory structure → partition pruning on read)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed Parquet sink: pay the shuffle ONCE at write time so every
    later equi-join / aggregation on ``key`` is co-located — the read-side
    plan contains no Exchange at all (pytest-asserted on the physical
    plan). This is the 100-TB co-location lever the partitioned sink
    (:func:`write_tiered`) doesn't give: directory partitioning prunes
    scans, bucketing removes JOIN/AGG shuffles. The intended deployment:
    write the raw→tier tables bucketed by ``source`` and every per-source
    stage (tier merges, as-of joins, window features) runs shuffle-free.

    ``sortBy(key)`` additionally persists within-bucket order so sort-merge
    joins can skip the sort when files-per-bucket is 1.

    Hive-style bucketing (``bucketBy`` + ``saveAsTable`` with an explicit
    external path) is the sandbox stand-in for an Iceberg bucket-partition
    transform — the image carries no Iceberg jars (:func:`try_iceberg`)."""
    (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def try_iceberg(spark: SparkSession) -> bool:
    """True if an Iceberg catalog is usable in this session (jars present).
    The sandbox image has no Iceberg jars, so tables fall back to
    Iceberg-layout partitioned Parquet directories."""
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS spark_catalog.fs_probe")
        return True
    except Exception:
        return False


def read_jsonl_series(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with a DECLARED schema — never inference: schema
    inference on JSONL is a full extra pass over the data (a non-starter at
    100-TB scale) and silently unifies drifting types. Malformed rows stay
    visible via Spark's default PERMISSIVE nulls rather than killing the
    scan; pair with a count-based quality gate downstream."""
    return spark.read.schema(schema).json(path)
