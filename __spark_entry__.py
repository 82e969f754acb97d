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

from pyspark.sql import functions as F

from forecaster_spark.models.metrics import qof_native
from forecaster_spark.operators import features as FT
from forecaster_spark.operators.gapfill import linear_interp, locf
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

_SERIES_SQL = "WITH series AS (SELECT event_type AS source, ts, value AS y, event_id FROM events)\n"


# -- W1/W3/P1/P8: window feature operators ----------------------------------

_ORD = ["ts", "event_id"]  # deterministic series order under ts ties


def _ev(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return ev.select(F.col("event_type").alias("source"), "ts", F.col("value").alias("y"), "event_id")


def q_lag_features(spark, sf_dir):
    """Reference lag semantics W1: out-of-range lags ← series' first value."""
    out = FT.with_lags(_ev(spark, sf_dir), "y", 3, order=_ORD)
    return out.select("source", "event_id", "y", "y_lag3", "y_lag2", "y_lag1")


def q_lead_targets(spark, sf_dir):
    """W3: lead targets, zero-padded tail."""
    out = FT.with_leads(_ev(spark, sf_dir), "y", 4, order=_ORD)
    return out.select("source", "event_id", "y", "y_lead1", "y_lead2", "y_lead3")


def q_trend_time_index(spark, sf_dir):
    """P1 (spec=3: linear + quadratic — exact arithmetic only) + P8 time index."""
    out = FT.with_trend(FT.with_time_index(_ev(spark, sf_dir), order=_ORD), spec=3)
    return out.select("source", "event_id", "t", "trend1", "trend2")


def q_minmax_scale(spark, sf_dir):
    """P6: reference MinMax (0,4) scaling per source."""
    s = _ev(spark, sf_dir).drop("ts")
    out = FT.transform_minmax(s, FT.fit_minmax(s, ["y"]), ["y"])
    return out.select("source", "event_id", "y", "y_mm")


def _ev_nulled(spark, sf_dir):
    return _ev(spark, sf_dir).withColumn(
        "y", F.when(F.col("event_id") % 7 == 3, F.lit(None)).otherwise(F.col("y"))
    )


def q_locf(spark, sf_dir):
    """Gap-fill locf over a deterministically nulled-out signal."""
    return locf(_ev_nulled(spark, sf_dir), "y", order=_ORD).select("source", "event_id", "y")


def q_linear_interp(spark, sf_dir):
    """Gap-fill time-weighted linear interpolation (nulled-out signal)."""
    return linear_interp(_ev_nulled(spark, sf_dir), "y", order=_ORD).select("source", "event_id", "y")


def q_qof_persistence(spark, sf_dir):
    """A6-A11 QoF metrics of a lag-h persistence baseline per (source, h)."""
    s = FT.with_lags(_ev(spark, sf_dir), "y", 3, order=_ORD, pad_first=False)
    pairs = None
    for h in (1, 2, 3):
        p = s.select(
            "source", F.lit(h).alias("h"), F.col("y").alias("y_true"), F.col(f"y_lag{h}").alias("y_hat")
        ).where(F.col(f"y_lag{h}").isNotNull())
        pairs = p if pairs is None else pairs.unionAll(p)
    return qof_native(pairs, ["source", "h"], exact=True).select(
        "source", "h", "mse", "mae", "r2", "r2bar", "smape", "m"
    )


# window clauses shared by the oracle SQL
_W = "PARTITION BY source ORDER BY ts, event_id"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m_events": q_rollup_1m,
        "rollup_1h_cascade_events": q_rollup_1h_cascade,
        "rollup_1d_cascade_events": q_rollup_1d_cascade,
        "lag_features_events": q_lag_features,
        "lead_targets_events": q_lead_targets,
        "trend_time_index_events": q_trend_time_index,
        "minmax_scale_events": q_minmax_scale,
        "locf_events": q_locf,
        "linear_interp_events": q_linear_interp,
        "qof_persistence_events": q_qof_persistence,
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
        "lag_features_events": _SERIES_SQL + f"""
SELECT source, event_id, y,
       coalesce(lag(y, 3) OVER w, first_value(y) OVER w) AS y_lag3,
       coalesce(lag(y, 2) OVER w, first_value(y) OVER w) AS y_lag2,
       coalesce(lag(y, 1) OVER w, first_value(y) OVER w) AS y_lag1
FROM series WINDOW w AS ({_W})""",
        "lead_targets_events": _SERIES_SQL + f"""
SELECT source, event_id, y,
       coalesce(lead(y, 1) OVER w, 0.0) AS y_lead1,
       coalesce(lead(y, 2) OVER w, 0.0) AS y_lead2,
       coalesce(lead(y, 3) OVER w, 0.0) AS y_lead3
FROM series WINDOW w AS ({_W})""",
        "trend_time_index_events": _SERIES_SQL + f"""
SELECT source, event_id, t,
       t / m AS trend1,
       (t - m/2.0) * (t - m/2.0) / ((m/2.0) * (m/2.0)) AS trend2
FROM (
  SELECT source, event_id,
         CAST(row_number() OVER ({_W}) - 1 AS DOUBLE) AS t,
         count(*) OVER (PARTITION BY source) AS m
  FROM series
)""",
        "minmax_scale_events": _SERIES_SQL + """
SELECT source, event_id, y,
       (y - mn) / (CASE WHEN mx - mn = 0.0 THEN 1.0 ELSE mx - mn END) * 4.0 + 0.0 AS y_mm
FROM (
  SELECT source, event_id, y,
         min(y) OVER (PARTITION BY source) AS mn,
         max(y) OVER (PARTITION BY source) AS mx
  FROM series
)""",
        "locf_events": f"""
WITH nulled AS (
  SELECT event_type AS source, ts, event_id,
         CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS y
  FROM events
)
SELECT source, event_id,
       last_value(y IGNORE NULLS) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
FROM nulled""",
        "linear_interp_events": f"""
WITH nulled AS (
  SELECT event_type AS source, ts, event_id, epoch_us(ts) AS tus,
         CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS y
  FROM events
), ctx AS (
  SELECT source, event_id, y, tus,
         last_value(y IGNORE NULLS) OVER wb AS prev_v,
         last_value(CASE WHEN y IS NOT NULL THEN tus END IGNORE NULLS) OVER wb AS prev_t,
         first_value(y IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN y IS NOT NULL THEN tus END IGNORE NULLS) OVER wf AS next_t
  FROM nulled
  WINDOW wb AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS ({_W} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT source, event_id,
       CASE WHEN y IS NOT NULL THEN y
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            ELSE prev_v + (next_v - prev_v) *
                 (CAST(tus - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
       END AS y
FROM ctx""",
        "qof_persistence_events": _SERIES_SQL + f"""
, lagged AS (
  SELECT source, y,
         lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2, lag(y, 3) OVER w AS l3
  FROM series WINDOW w AS ({_W})
), pairs AS (
  SELECT source, 1 AS h, y AS y_true, l1 AS y_hat FROM lagged WHERE l1 IS NOT NULL
  UNION ALL
  SELECT source, 2, y, l2 FROM lagged WHERE l2 IS NOT NULL
  UNION ALL
  SELECT source, 3, y, l3 FROM lagged WHERE l3 IS NOT NULL
), sums AS (
  SELECT source, h, count(*) AS m,
         CAST(sum(CAST(floor(y_true * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_y,
         CAST(sum(CAST(floor(y_true * y_true * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_y2,
         CAST(sum(CAST(floor((y_true - y_hat) * (y_true - y_hat) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS ss_res,
         CAST(sum(CAST(floor(abs(y_true - y_hat) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_abs,
         CAST(sum(CAST(floor(2.0 * abs(y_true - y_hat) / (abs(y_true) + abs(y_hat) + 1e-10) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_sm
  FROM pairs GROUP BY source, h
)
SELECT source, h,
       ss_res / m AS mse,
       sum_abs / m AS mae,
       CASE WHEN abs(sum_y2 - sum_y * sum_y / m) < 1e-300 THEN 0.0
            ELSE 1.0 - ss_res / (sum_y2 - sum_y * sum_y / m) END AS r2,
       CASE WHEN m <= 2 THEN CAST('nan' AS DOUBLE)
            ELSE 1.0 - (1.0 - (CASE WHEN abs(sum_y2 - sum_y * sum_y / m) < 1e-300 THEN 0.0
                                    ELSE 1.0 - ss_res / (sum_y2 - sum_y * sum_y / m) END))
                       * (m - 1) / (m - 1 - 1) END AS r2bar,
       100.0 * sum_sm / m AS smape,
       m
FROM sums""",
    }
