"""ARX feature pipeline as native window/projection operators (SURVEY.md
§2.2 P1-P8, §2.3 W1-W3).

The reference builds a dense design matrix per series; here each feature is a
DataFrame column over ``Window.partitionBy(source).orderBy(ts)`` so Catalyst
fuses the whole pipeline into one window stage + projections (single shuffle
on source). Exact reference semantics preserved:

- lags pad out-of-range positions with the series' *first* value, not null
  (Util/build_matrix.py:131-159, column order farthest-lag-first);
- leads zero-pad the tail (Util/build_matrix.py:163-186);
- trend features are cumulative by spec over the 0-based time index t and
  series length m (Util/build_matrix.py:88-129);
- symbolic transforms are x^1.5, x^0.5, log1p applied before lagging
  (arx_symb.py:83-89);
- scalers fit on the full series per source (arx.py:134-151) — expressed as
  per-source aggregates broadcast-joined back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LWAVE = 20  # reference default wavelength (Util/build_matrix.py:88)


def _w(partition: str, order):
    """order may be a column name or a list of names (pass a tie-breaker
    column when timestamps can collide — window results must be
    deterministic)."""
    cols = order if isinstance(order, (list, tuple)) else [order]
    return Window.partitionBy(partition).orderBy(*cols)


def with_time_index(df: DataFrame, partition: str = "source", order: str = "ts", out: str = "t") -> DataFrame:
    """0-based per-series time index (forecaster.py:169-171 last Yf column)."""
    return df.withColumn(out, F.row_number().over(_w(partition, order)) - F.lit(1))


def with_lags(
    df: DataFrame,
    col: str = "y",
    p: int = 6,
    partition: str = "source",
    order: str = "ts",
    pad_first: bool = True,
) -> DataFrame:
    """Add ``{col}_lag{k}`` for k = p..1 (farthest first, mirroring the
    reference's column order). ``pad_first`` replaces out-of-range lags with
    the series' first value (reference W1); False leaves nulls."""
    w = _w(partition, order)
    first = F.first(col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    out = df
    for k in range(p, 0, -1):
        lagged = F.lag(col, k).over(w)
        out = out.withColumn(f"{col}_lag{k}", F.coalesce(lagged, first) if pad_first else lagged)
    return out


def with_leads(
    df: DataFrame,
    col: str = "y",
    hh: int = 1,
    partition: str = "source",
    order: str = "ts",
    zero_tail: bool = True,
) -> DataFrame:
    """Add ``{col}_lead{h}`` for h = 1..hh−1 (column 0 of the reference's Y
    is y itself). ``zero_tail`` zero-pads beyond the series end (W3)."""
    w = _w(partition, order)
    out = df
    for h in range(1, hh):
        led = F.lead(col, h).over(w)
        out = out.withColumn(f"{col}_lead{h}", F.coalesce(led, F.lit(0.0)) if zero_tail else led)
    return out


def with_trend(
    df: DataFrame,
    spec: int = 1,
    lwave: int = LWAVE,
    partition: str = "source",
    order: str = "ts",
    t_col: str = "t",
) -> DataFrame:
    """Cumulative trend columns trend1..trend{spec-1} (P1). Requires/creates
    the time index and the per-series length m."""
    if spec == 1:
        return df
    out = df if t_col in df.columns else with_time_index(df, partition, order, t_col)
    m = F.count("*").over(Window.partitionBy(partition))
    t = F.col(t_col).cast("double")
    if spec >= 2:
        out = out.withColumn("trend1", t / m)
    if spec >= 3:
        half = m / 2.0
        d = t - half
        # explicit multiply (not pow): bit-identical to the oracle's x**2
        out = out.withColumn("trend2", d * d / (half * half))
    if spec >= 4:
        out = out.withColumn("trend3", F.sin(t * (2.0 * math.pi / lwave)))
    if spec == 5:
        out = out.withColumn("trend4", F.cos(t * (2.0 * math.pi / lwave)))
    return out


def with_symbolic(df: DataFrame, col: str = "y") -> DataFrame:
    """Default symbolic transforms of the reference (P2): x^1.5, x^0.5,
    log1p(x) as ``{col}_pow15 / {col}_sqrt / {col}_log1p``."""
    c = F.col(col)
    return (
        df.withColumn(f"{col}_pow15", F.pow(c, 1.5))
        .withColumn(f"{col}_sqrt", F.sqrt(c))
        .withColumn(f"{col}_log1p", F.log1p(c))
    )


def with_cross(df: DataFrame, ycol: str, xcols: list[str]) -> DataFrame:
    """ENDO×EXO cross terms (P4, arx_symb.py:212-214)."""
    out = df
    for x in xcols:
        out = out.withColumn(f"{ycol}_x_{x}", F.col(ycol) * F.col(x))
    return out


def rectify(df: DataFrame, cols: list[str]) -> DataFrame:
    """Non-negativity clip (P5, forecaster.py:335-352)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.greatest(F.col(c), F.lit(0.0)))
    return out


# -- scalers as aggregates + broadcast-joined projections -------------------

def fit_minmax(df: DataFrame, cols: list[str], partition: str = "source") -> DataFrame:
    """Per-source min/max params for each column (P6)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    return df.groupBy(partition).agg(*aggs)


def transform_minmax(
    df: DataFrame,
    params: DataFrame,
    cols: list[str],
    partition: str = "source",
    lo: float = 0.0,
    hi: float = 4.0,
    suffix: str = "_mm",
) -> DataFrame:
    """Apply the reference MinMax((0,4)) transform; params side is tiny
    (one row per source) → broadcast join, no shuffle of the big side."""
    out = df.join(F.broadcast(params), on=partition)
    for c in cols:
        mn, mx = F.col(f"{c}__min"), F.col(f"{c}__max")
        rng = F.when(mx - mn == 0.0, F.lit(1.0)).otherwise(mx - mn)
        out = out.withColumn(f"{c}{suffix}", (F.col(c) - mn) / rng * (hi - lo) + lo)
    drop = [f"{c}__min" for c in cols] + [f"{c}__max" for c in cols]
    return out.drop(*drop)


def fit_robust(
    df: DataFrame, cols: list[str], partition: str = "source", quantum: int = 100
) -> DataFrame:
    """Per-source median/IQR params for each column — the robust scaler
    (sklearn ``RobustScaler`` semantics: center by the median, scale by
    ``q75 - q25``; outliers move neither parameter, unlike mean/std P7).

    Cross-engine exactness: each value is quantized to integers
    (``round(x * quantum)``), then QUADRUPLED before ``percentile``. At
    the quartile positions ``g = 0.25*(n-1)`` the interpolation fraction
    is always one of {0, .25, .5, .75}, so on 4×-scaled integers the
    interpolated quantile ``(1-g)*a + g*b`` is itself an exact integer —
    identical no matter which algebraic form of the interpolation either
    engine uses (Spark ``percentile`` ↔ DuckDB ``quantile_cont``), so
    the params are bit-exact doubles. One row per source — broadcast."""
    aggs = []
    for c in cols:
        q4 = F.round(F.col(c) * quantum).cast("long") * 4
        aggs += [
            F.percentile(q4, F.lit(0.5)).alias(f"{c}__med4"),
            (F.percentile(q4, F.lit(0.75)) - F.percentile(q4, F.lit(0.25))).alias(
                f"{c}__iqr4"
            ),
        ]
    return df.groupBy(partition).agg(*aggs)


def transform_robust(
    df: DataFrame,
    params: DataFrame,
    cols: list[str],
    partition: str = "source",
    quantum: int = 100,
    suffix: str = "_rs",
) -> DataFrame:
    """Apply ``(x - median) / IQR`` with the quarter-quanta exact params:
    the numerator ``4*q - med4`` is an exact integer-valued double, the
    single division is correctly rounded on every IEEE engine → the
    scaled output replays bit-for-bit in SQL. Zero-IQR sources scale by
    1 quantum-unit (mirroring the min==max guard in MinMax). Params side
    is one row per source → broadcast join, no shuffle of the big side."""
    out = df.join(F.broadcast(params), on=partition)
    for c in cols:
        q4 = F.round(F.col(c) * quantum).cast("long") * 4
        iqr = F.col(f"{c}__iqr4")
        safe = F.when(iqr == 0.0, F.lit(4.0)).otherwise(iqr)
        out = out.withColumn(f"{c}{suffix}", (q4 - F.col(f"{c}__med4")) / safe)
    drop = [f"{c}__med4" for c in cols] + [f"{c}__iqr4" for c in cols]
    return out.drop(*drop)


def fit_standard(df: DataFrame, cols: list[str], partition: str = "source") -> DataFrame:
    """Per-source mean/population-std params (P7)."""
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"{c}__mean"), F.stddev_pop(c).alias(f"{c}__std")]
    return df.groupBy(partition).agg(*aggs)


def transform_standard(
    df: DataFrame, params: DataFrame, cols: list[str], partition: str = "source", suffix: str = "_std"
) -> DataFrame:
    out = df.join(F.broadcast(params), on=partition)
    for c in cols:
        mean, std = F.col(f"{c}__mean"), F.col(f"{c}__std")
        safe = F.when(std == 0.0, F.lit(1.0)).otherwise(std)
        out = out.withColumn(f"{c}{suffix}", (F.col(c) - mean) / safe)
    drop = [f"{c}__mean" for c in cols] + [f"{c}__std" for c in cols]
    return out.drop(*drop)


def cross_rank(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Cross-SECTIONAL rank features: at each time bucket, rank every
    series' value against the other series (deterministic (value, source)
    tie-break) plus the ppm percentile — the relative-performance features
    (cross-sectional momentum / cohort position) that per-series windows
    cannot express. The reference models one series at a time
    (forecaster.py:33-34); this is the across-series axis.

    All-integer (input must be the integer-valued rolled signal); the
    percentile is BIGINT ``((rk − 1) · 1e6) div max(n − 1, 1)``.

    Plan note: shuffles on the TIME bucket — the transpose of every other
    operator's source-keyed partitioning. Buckets are naturally balanced
    (|sources| rows each), so no skew; at 10^12 scale this is the layout
    a bucket-keyed write (write_bucketed) serves with zero extra Exchange.
    Output: input + (yq, rk, n_src, pct_ppm)."""
    yq = F.col(value).cast("long")
    w = Window.partitionBy(ts).orderBy(yq, F.col(partition))
    wb = Window.partitionBy(ts)
    return (
        df.withColumn("yq", yq)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n_src", F.count(F.lit(1)).over(wb).cast("long"))
        .withColumn(
            "pct_ppm",
            F.expr("((rk - 1) * 1000000) div greatest(n_src - 1, 1)"),
        )
    )
