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


def pinball_qof(
    df: DataFrame,
    group_cols: list[str],
    y_true: str = "y_true",
    y_hat: str = "y_hat",
    taus: tuple = ((1, 4), (2, 4), (3, 4)),
) -> DataFrame:
    """Pinball (quantile) loss per group and quantile — the quantile-
    forecast companion of :func:`qof_native` and the scoring rule of the
    M5 Uncertainty competition (Makridakis et al., IJF 2022): L_tau(y,f)
    = tau(y-f) if y >= f else (1-tau)(f-y).  The reference's QoF suite
    (reference qof.py) scores point forecasts only; once the engine emits
    quantile bands (conformal_interval), this is how you grade them.

    Exactness discipline: inputs are the integer-valued rolled signal and
    an integer forecast; with tau = num/den the SCALED loss den*L =
    greatest(num*(y-f), (num-den)*(y-f)) is a single integer expression
    both engines evaluate identically — the rational quantile never
    becomes a float.  ``den_loss_sum`` is the exact BIGINT sum;
    ``mean_milli = (1000*sum) div (n*den)`` is one integer floor
    division.  Bound: |y-f| <= ~2^20 on the tiers x den <= 100 x n <=
    ~2^20 rows/group stays far under 2^63, ANSI-safe.

    Plan shape: one hash aggregate on (group, tau) with map-side partials
    — the tau fan-out is a broadcast literal explode (x|taus| rows before
    the partial agg, standard and shuffle-free).

    Output: (group cols..., tau_num, tau_den, n, den_loss_sum, mean_milli).
    """
    tau_rows = F.array(
        *[
            F.struct(F.lit(int(n)).cast("long").alias("tau_num"), F.lit(int(d)).cast("long").alias("tau_den"))
            for n, d in taus
        ]
    )
    e = df.select(
        *group_cols,
        F.col(y_true).cast("long").alias("_y"),
        F.col(y_hat).cast("long").alias("_f"),
        F.explode(tau_rows).alias("_t"),
    ).select(
        *group_cols,
        F.col("_t.tau_num").alias("tau_num"),
        F.col("_t.tau_den").alias("tau_den"),
        F.greatest(
            F.col("_t.tau_num") * (F.col("_y") - F.col("_f")),
            (F.col("_t.tau_num") - F.col("_t.tau_den")) * (F.col("_y") - F.col("_f")),
        ).alias("_dl"),
    )
    return (
        e.groupBy(*group_cols, "tau_num", "tau_den")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_dl").alias("den_loss_sum"))
        .select(
            *group_cols,
            "tau_num",
            "tau_den",
            "n",
            "den_loss_sum",
            F.expr("(1000 * den_loss_sum) div (n * tau_den)").alias("mean_milli"),
        )
    )
