"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; each ``queries()[name]`` runs at
sf=0.01 and is compared against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash). Every operator from
SURVEY.md §2 claimed as done has an entry here; non-SQL-expressible kernels
(recursive forecast, Gorilla, weighted backcast) get rows-only checks.

Float determinism: contract queries use the rollup operators' ``exact`` mode
(integer micro-unit sums) so Spark and DuckDB produce bit-identical doubles —
plain double sums are add-order-dependent at the ulp level across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from forecaster_spark.operators.rollup import rollup_cascade, rollup_raw, rollup_tiers
from forecaster_spark.operators.seriesify import events_as_series
from forecaster_spark.sources import read_table

ROLLUP_ORDER = ["source", "bucket_start", "cnt", "sum_y", "min_y", "max_y", "mean_y", "first_y", "last_y"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiered continuous aggregate (1m→1h cascade) over the events
    table treated as per-event_type series."""
    events = read_table(spark, "/root/testdata/sf0.001", "events")
    tiers = rollup_tiers(events_as_series(events))
    return tiers["1h"].select(*ROLLUP_ORDER)


def _events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_series(read_table(spark, sf_dir, "events"))


def q_rollup_1m(spark, sf_dir):
    return rollup_raw(_events_series(spark, sf_dir), "1m", exact=True).select(*ROLLUP_ORDER)


def q_rollup_1h_cascade(spark, sf_dir):
    t1m = rollup_raw(_events_series(spark, sf_dir), "1m", exact=True)
    return rollup_cascade(t1m, "1h", exact=True).select(*ROLLUP_ORDER)


def q_rollup_1d_cascade(spark, sf_dir):
    t = rollup_tiers(_events_series(spark, sf_dir), exact=True)
    return t["1d"].select(*ROLLUP_ORDER)


_ROLLUP_SQL = """
WITH series AS (
  SELECT event_type AS source, ts, value AS y FROM events
), t1m AS (
  SELECT source, date_trunc('minute', ts) AS bucket_start,
         count(y) AS cnt,
         sum(CAST(round(y * 1000000) AS BIGINT)) / 1000000.0 AS sum_y,
         min(y) AS min_y, max(y) AS max_y,
         sum(CAST(round(y * 1000000) AS BIGINT)) / 1000000.0 / count(y) AS mean_y,
         (min(struct_pack(t := ts, v := y))).v AS first_y,
         (max(struct_pack(t := ts, v := y))).v AS last_y,
         sum(CAST(round(y * 1000000) AS BIGINT)) AS sum_micro
  FROM series GROUP BY 1, 2
)
"""

_CASCADE_1H = """
, t1h AS (
  SELECT source, date_trunc('hour', bucket_start) AS bucket_start,
         sum(cnt) AS cnt, sum(sum_micro) / 1000000.0 AS sum_y,
         min(min_y) AS min_y, max(max_y) AS max_y,
         sum(sum_micro) / 1000000.0 / sum(cnt) AS mean_y,
         min_by(first_y, bucket_start) AS first_y,
         max_by(last_y, bucket_start) AS last_y,
         sum(sum_micro) AS sum_micro
  FROM t1m GROUP BY 1, 2
)
"""

_SEL = "SELECT source, bucket_start, cnt, sum_y, min_y, max_y, mean_y, first_y, last_y FROM "


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m_events": q_rollup_1m,
        "rollup_1h_cascade_events": q_rollup_1h_cascade,
        "rollup_1d_cascade_events": q_rollup_1d_cascade,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m_events": _ROLLUP_SQL + _SEL + "t1m",
        "rollup_1h_cascade_events": _ROLLUP_SQL + _CASCADE_1H + _SEL + "t1h",
        "rollup_1d_cascade_events": _ROLLUP_SQL + _CASCADE_1H + """
, t1d AS (
  SELECT source, date_trunc('day', bucket_start) AS bucket_start,
         sum(cnt) AS cnt, sum(sum_micro) / 1000000.0 AS sum_y,
         min(min_y) AS min_y, max(max_y) AS max_y,
         sum(sum_micro) / 1000000.0 / sum(cnt) AS mean_y,
         min_by(first_y, bucket_start) AS first_y,
         max_by(last_y, bucket_start) AS last_y
  FROM t1h GROUP BY 1, 2
)
""" + _SEL + "t1d",
    }
