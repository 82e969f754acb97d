"""Native (Catalyst-expression) QoF metrics over long-format forecasts
(SURVEY.md §2.4 A6-A11).

Input: rows of (group cols..., y_true, y_hat). Output: one row per group
with MSE / MAE / R² / adjusted R² / SMAPE / m, matching Util/tools.py:42-178:
- R² = 0 when SStot == 0 (tools.py:96-98)
- R²Bar = NaN when m ≤ k+1, k defaults to 1 (diagnose's n_features default,
  tools.py:147-178)
- SMAPE = 100·mean(2|Δ|/(|y|+|ŷ|+1e-10))

These are single-pass aggregates (sums/counts only → map-side partials;
avg(y) folded in via sum/count), so the whole table is one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qof_native(
    df: DataFrame,
    group_cols: list[str],
    y_true: str = "y_true",
    y_hat: str = "y_hat",
    n_features: int = 1,
    exact: bool = False,
) -> DataFrame:
    """``exact=True`` runs the sums in DECIMAL(38,12) so the aggregate is
    add-order independent (bit-identical across partitionings and engines);
    the final metric arithmetic happens in double on identical inputs."""
    yt, yp = F.col(y_true), F.col(y_hat)
    err = yt - yp
    m = F.count(F.lit(1))
    if exact:
        # floor-quantized micro-unit sums: floor (unlike round / decimal
        # casts) has no tie cases, so every engine quantizes each term to the
        # identical long and the sum is add-order independent
        def s(expr):
            return F.sum(F.floor(expr * 1e6).cast("long")).cast("double") / 1e6

        sum_y = s(yt)
        sum_y2 = s(yt * yt)
        ss_res = s(err * err)
        mae = s(F.abs(err)) / m
        smape_expr = 100.0 * s(2.0 * F.abs(err) / (F.abs(yt) + F.abs(yp) + 1e-10)) / m
    else:
        sum_y = F.sum(yt)
        sum_y2 = F.sum(yt * yt)
        ss_res = F.sum(err * err)
        mae = F.avg(F.abs(err))
        smape_expr = 100.0 * F.avg(2.0 * F.abs(err) / (F.abs(yt) + F.abs(yp) + 1e-10))
    # SStot = Σy² − (Σy)²/m  (population form of Σ(y−ȳ)²)
    ss_tot = sum_y2 - sum_y * sum_y / m
    r2 = F.when(F.abs(ss_tot) < 1e-300, F.lit(0.0)).otherwise(1.0 - ss_res / ss_tot)
    k = F.lit(n_features)
    r2bar = F.when(m <= k + 1, F.lit(float("nan"))).otherwise(
        1.0 - (1.0 - r2) * (m - 1) / (m - k - 1)
    )
    return df.groupBy(*group_cols).agg(
        (ss_res / m).alias("mse"),
        mae.alias("mae"),
        r2.alias("r2"),
        r2bar.alias("r2bar"),
        smape_expr.alias("smape"),
        m.alias("m"),
    )
