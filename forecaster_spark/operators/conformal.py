"""Split-conformal prediction intervals over rolled series.

Public method: split (inductive) conformal regression — Papadopoulos et
al. (ECML 2002), Vovk et al. "Algorithmic Learning in a Random World"
(2005), popularized for time series as the residual-quantile band: hold
out a calibration set, take the ceil((n_cal+1)(1-alpha))-th smallest
absolute residual as the radius q, and report [fc - q, fc + q], which
carries a finite-sample >= 1-alpha marginal coverage guarantee under
exchangeability.  The reference Forecaster reports point forecasts and
QoF aggregates only (reference qof.py, forecaster.py:forecast); interval
calibration is an engine addition a production forecasting pipeline
needs before anyone pages on a breach.

Forecaster choice: one-step persistence (fc_t = y_{t-1}) — the same
baseline the reference's QoF suite scores against (reference qof.py
persistence rows).  Persistence residuals |y_t - y_{t-1}| are exact
BIGINTs on the integer-valued rolled signal, so the conformal radius is
an ORDER STATISTIC of exact integers: sort + row_number pick, the same
cross-engine-exact selection recipe as the Theil-Sen median (CLAUDE.md
"sort + middle-row pick").  No float quantile interpolation — both
engines agree bit-for-bit, and the pick is the textbook conformal rank,
not an approximation.

Rank arithmetic stays integral: k = ceil((n_cal+1) * (1-a)) with
a = alpha_num/alpha_den is ((n_cal+1)*(alpha_den-alpha_num)
+ alpha_den-1) div alpha_den — non-negative operands, so Spark ``div``
(truncating) and DuckDB ``//`` (flooring) agree.

Plan shape (100-TB lens): everything partitions by the series key — one
window pass for (idx, n, lag) over (ts) on the rolled tier (bounded
rows/series by construction), a second ordered window over the
calibration residuals for the rank pick riding the SAME hash partitioning
(Exchange reuse, no extra shuffle), and a broadcast join of the per-series
radius (one row per series) back onto the tail rows.  No collect, no
cross join; series count scales the parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conformal_interval(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: str = "ts",
    hh: int = 6,
    alpha_num: int = 1,
    alpha_den: int = 8,
) -> DataFrame:
    """Split-conformal persistence intervals for the last ``hh`` points of
    each series.

    ``df``: one row per (series, bucket) with an integer-valued ``value``
    column (the exact-rollup tiers produce these).  The last ``hh`` rows
    per series are the test window; every earlier row with a predecessor
    is calibration.  Returns one row per test point:

    (partition, order, y, fc, q, lo, hi, covered) — all BIGINT except the
    original order column; ``covered`` is the conformal guarantee's
    per-point outcome (marginal coverage >= 1 - alpha_num/alpha_den in
    expectation over exchangeable series).

    Series too short to calibrate (fewer than hh + 2 rows) drop out via
    the inner radius join — deterministically on both engines.
    """
    w = Window.partitionBy(partition).orderBy(order)
    base = df.select(
        F.col(partition),
        F.col(order),
        F.col(value).cast("long").alias("yv"),
    ).withColumn("idx", F.row_number().over(w) - F.lit(1))
    base = base.withColumn("n", F.count("*").over(Window.partitionBy(partition)))
    base = base.withColumn("fc", F.lag("yv", 1).over(w))

    # calibration: residual rows strictly before the test tail
    cal = base.filter((F.col("idx") >= 1) & (F.col("idx") <= F.col("n") - hh - 1)).select(
        partition,
        "idx",
        F.abs(F.col("yv") - F.col("fc")).alias("r"),
        (F.col("n") - hh - 1).alias("ncal"),
    )
    rw = Window.partitionBy(partition).orderBy("r", "idx")
    keep = alpha_den - alpha_num
    radius = (
        cal.withColumn("rk", F.row_number().over(rw))
        .withColumn(
            "k",
            F.least(
                F.expr(f"((ncal + 1) * {keep} + {alpha_den - 1}) div {alpha_den}"),
                F.col("ncal"),
            ),
        )
        .filter(F.col("rk") == F.col("k"))
        .select(partition, F.col("r").alias("q"))
    )

    test = base.filter(F.col("idx") >= F.col("n") - hh)
    out = test.join(F.broadcast(radius), on=partition, how="inner")
    return out.select(
        partition,
        order,
        F.col("yv").alias("y"),
        "fc",
        "q",
        (F.col("fc") - F.col("q")).alias("lo"),
        (F.col("fc") + F.col("q")).alias("hi"),
        ((F.col("yv") >= F.col("fc") - F.col("q")) & (F.col("yv") <= F.col("fc") + F.col("q"))).alias(
            "covered"
        ),
    )


def winkler_score(
    intervals: DataFrame,
    partition: str = "source",
    alpha_num: int = 1,
    alpha_den: int = 8,
) -> DataFrame:
    """Winkler interval score (Winkler, JASA 1972; the M4/M5 competitions'
    prediction-interval metric) aggregated per series over a conformal
    band: for each test point with interval [lo, hi],

        W = (hi - lo) + (2/alpha)*(lo - y)+ + (2/alpha)*(y - hi)+

    — width plus a breach penalty on each side.  Lower is better; a
    well-calibrated band minimizes expected W.  This closes the loop the
    reference's point-QoF suite leaves open (reference qof.py scores
    point errors only): conformal_interval GUARANTEES coverage, Winkler
    PRICES the width it paid.

    Exactness: with alpha = alpha_num/alpha_den such that 2*alpha_den is
    a multiple of alpha_num (alpha = 1/8 -> penalty 16), every per-point
    score is an exact BIGINT on the integer tier signal; the mean and the
    empirical coverage are the only divisions.

    Plan shape: one hash aggregate over the interval rows — map-side
    partials, codegen; rides whatever partitioning the band came with.

    Output: (partition, n, cov_cnt, sum_winkler, mean_winkler, coverage).
    """
    assert (2 * alpha_den) % alpha_num == 0, "2/alpha must be an integer"
    pen = (2 * alpha_den) // alpha_num
    w = (
        (F.col("hi") - F.col("lo"))
        + F.lit(pen) * F.greatest(F.col("lo") - F.col("y"), F.lit(0))
        + F.lit(pen) * F.greatest(F.col("y") - F.col("hi"), F.lit(0))
    )
    ag = intervals.groupBy(partition).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("covered").cast("long")).cast("long").alias("cov_cnt"),
        F.sum(w).cast("long").alias("sum_winkler"),
    )
    return ag.select(
        partition,
        "n",
        "cov_cnt",
        "sum_winkler",
        (F.col("sum_winkler").cast("double") / F.col("n").cast("double")).alias("mean_winkler"),
        (F.col("cov_cnt").cast("double") / F.col("n").cast("double")).alias("coverage"),
    )


def crps_ensemble(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: str = "ts",
    lags: tuple[int, int, int] = (1, 2, 24),
) -> DataFrame:
    """CRPS of a three-member lag ensemble (naive, naive-2, seasonal-naive)
    against the observed integer tier signal — the continuous ranked
    probability score (Gneiting & Raftery, JASA 2007; the M5-Uncertainty /
    meteorology standard), scoring the WHOLE predictive distribution where
    Winkler prices one interval and pinball one quantile.

    For an m-member empirical ensemble x_1..x_m the closed form is

        CRPS = (1/m) * sum_i |x_i - y|  -  (1/(2m^2)) * sum_ij |x_i - x_j|.

    Exactness: with m = 3 members that are exact BIGINT lags of the
    integer tier signal, 18*CRPS = 6*sum_i|x_i - y| - 2*(|x1-x2| +
    |x1-x3| + |x2-x3|) is an exact BIGINT per point; the per-series mean
    is the single correctly-rounded division sum18 / (18*n).  (The lag
    members double as the standard M-competition baselines, so the score
    also ranks how much ensemble spread buys over any single member.)

    Plan shape: three lag windows on one series-key partitioning
    (Exchange reuse), rows with any null member dropped, one hash
    aggregate with map-side partials — one shuffle, codegen end-to-end.

    Output: (partition, n, sum_crps18, mean_crps).
    """
    w = Window.partitionBy(partition).orderBy(order)
    yv = F.col(value).cast("long")
    m1, m2, m3 = (F.lag(yv, k).over(w) for k in lags)
    pts = df.select(
        partition,
        yv.alias("_y"),
        m1.alias("_m1"),
        m2.alias("_m2"),
        m3.alias("_m3"),
    ).where(F.col("_m1").isNotNull() & F.col("_m2").isNotNull() & F.col("_m3").isNotNull())
    a = (
        F.abs(F.col("_m1") - F.col("_y"))
        + F.abs(F.col("_m2") - F.col("_y"))
        + F.abs(F.col("_m3") - F.col("_y"))
    )
    bsum = (
        F.abs(F.col("_m1") - F.col("_m2"))
        + F.abs(F.col("_m1") - F.col("_m3"))
        + F.abs(F.col("_m2") - F.col("_m3"))
    )
    ag = pts.groupBy(partition).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.lit(6) * a - F.lit(2) * bsum).cast("long").alias("sum_crps18"),
    )
    return ag.select(
        partition,
        "n",
        "sum_crps18",
        (F.col("sum_crps18").cast("double") / (F.lit(18) * F.col("n")).cast("double")).alias(
            "mean_crps"
        ),
    )
