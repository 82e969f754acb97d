"""Hierarchical forecast reconciliation over the retention tiers.

Tiered rollups (1m -> 1h -> 1d) form a temporal HIERARCHY: every daily
bucket is exactly the sum of its hourly children.  Forecasts made
independently per level are generally INCOHERENT — the sum of the hourly
forecasts disagrees with the direct daily forecast — and the forecasting
literature's standard fix is bottom-up / trace-minimization reconciliation
(Hyndman et al., "Optimal combination forecasts for hierarchical time
series", CSDA 2011 — public literature).  The reference Forecaster models
one series at one grain (forecaster.py rolls a single y); reconciliation
is an engine-added capability that only makes sense BECAUSE this engine
maintains the tier cascade.

:func:`bottom_up_daily` materializes the two classic candidates on the
exact integer tier signal and scores them:

* **direct**: daily persistence — forecast(day d) = actual(day d-1);
* **bottom-up**: the sum over day d's hours of the hourly persistence
  forecast (each hour forecast by the previous OBSERVED hour, crossing
  day boundaries — gaps fall back to the latest earlier hour, LOCF-style).

It reports each candidate's sum of absolute errors and the coherence gap
|direct - bottom_up| — the quantity reconciliation drives to zero.

Exactness
---------
Everything is BIGINT arithmetic on the hourly tier's exact micro-unit
sums (``sum_micro``): daily actuals are integer sums of hourly sums, both
forecasts are lagged integers, and all three reported statistics are sums
of absolute BIGINT differences — bit-exact cross-engine with no division
anywhere.  Days whose hourly forecast set is incomplete (the series' very
first hour has no predecessor) and each series' first day (no daily lag)
are excluded from scoring on both engines.

Design for scale
----------------
One shuffle on the series key covers the hourly lag window, the daily
re-aggregation (map-side partials ride the same partitioning), the daily
lag window, and the final per-source hash aggregate — Exchange reuse
end-to-end, all codegen.  Daily row counts are retention-bounded
(~30/source/month) regardless of raw row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bottom_up_daily(
    hourly: DataFrame,
    partition: str = "source",
    order: str = "bucket_start",
    value: str = "sum_micro",
) -> DataFrame:
    """Score direct-daily vs bottom-up-from-hourly persistence forecasts.

    ``hourly``: one row per (source, hour bucket) with an exact BIGINT
    ``value`` (the tier's micro-unit sum).  Output one row per source:

    (source, n_days, sae_direct, sae_bottom_up, coherence_gap) — all
    exact BIGINT micro-unit sums; lower SAE wins, coherence_gap is the
    total |direct - bottom_up| disagreement reconciliation removes.
    """
    wh = Window.partitionBy(partition).orderBy("_hb")
    h = hourly.select(
        partition,
        F.col(order).alias("_hb"),
        F.col(value).cast("long").alias("_s"),
    ).withColumn("_f", F.lag("_s", 1).over(wh))
    d = h.groupBy(partition, F.date_trunc("day", F.col("_hb")).alias("_day")).agg(
        F.sum("_s").cast("long").alias("_actual"),
        F.sum("_f").cast("long").alias("_bu"),
        F.count(F.lit(1)).alias("_cnt"),
        F.count("_f").alias("_cntf"),
    )
    wd = Window.partitionBy(partition).orderBy("_day")
    dd = d.withColumn("_direct", F.lag("_actual", 1).over(wd)).where(
        F.col("_direct").isNotNull() & (F.col("_cntf") == F.col("_cnt"))
    )
    return dd.groupBy(partition).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("_actual") - F.col("_direct"))).cast("long").alias("sae_direct"),
        F.sum(F.abs(F.col("_actual") - F.col("_bu"))).cast("long").alias("sae_bottom_up"),
        F.sum(F.abs(F.col("_direct") - F.col("_bu"))).cast("long").alias("coherence_gap"),
    )
