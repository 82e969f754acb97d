"""Nonparametric statistical tests over rolled series: Mann-Kendall trend,
two-sample Kolmogorov-Smirnov drift, ordinal (permutation) pattern counts,
and the seasonal-naive forecast baseline QoF.

Public formulas: Mann (1945) / Kendall (1975) trend test with the tie
correction from Kendall's rank-correlation book; the discrete two-sample
KS statistic (sup of ECDF differences evaluated at sample points); ordinal
pattern analysis after Bandt & Pompe (PRL 2002, "Permutation entropy");
seasonal-naive is the standard M-competition baseline.  The reference
Forecaster ships trend diagnostics and baseline QoF through its
``rollValidate``/``diagnose`` path (reference forecaster.py, qof.py);
these operators expose the nonparametric complements the reference's OLS
diagnostics assume away.

Exactness discipline (CLAUDE.md): every statistic is accumulated in
BIGINT integer quanta and any continuous column is a SINGLE IEEE division
(or a fixed left-assoc chain written identically in the SQL mirror) of
exact integers — no sqrt, no pow, no engine-varying math.  Quanta bounds:
micro-unit values |v| <= ~6e8 here, pair counts <= ~3e5 per series on the
hourly tier, so n(n-1)(2n+5) <= ~1.5e9 and n2*cum1 <= n1*n2 <= 1e8 — all
orders of magnitude under 2^63, ANSI-safe.

Plan shape (100-TB lens): Mann-Kendall uses the collect-per-group +
double-explode pair generator (ONE shuffle, pairs materialize inside the
JVM — the Theil-Sen lesson: per-group Arrow kernels cost 13+ s of
machinery where this codegens); it is O(n^2) per SERIES, so feed rolled
tiers (bounded rows/series), never raw hot series.  KS, patterns, and the
seasonal baseline are pure window + hash-aggregate plans: one shuffle on
the series key, map-side partials, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mann_kendall(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Mann-Kendall trend test per series: S = sum over all i<j of
    sign(v_j - v_i), with the tie-corrected variance numerator
    ``var18 = 18*Var(S) = n(n-1)(2n+5) - sum_k t_k(t_k-1)(2t_k+5)``
    (t_k = size of each tied-value group) kept as an exact BIGINT so no
    sqrt ever happens engine-side.  ``tau`` (Kendall's tau-a) is the one
    emitted double: ``(2*S)/(n*(n-1))`` — a single IEEE division of exact
    integers, bit-identical cross-engine.

    Monotone-trend direction = sign(S); callers needing a z-score compute
    ``(S -/+ 1)/sqrt(var18/18)`` driver-side from the exact columns.

    Output: (partition, n, s_stat, var18, tau).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    g = b.groupBy("source").agg(
        F.collect_list(F.struct("_b", "_v")).alias("pts"),
        F.count(F.lit(1)).alias("n"),
    )
    s = (
        g.select("source", "n", "pts", F.explode("pts").alias("pa"))
        .select(
            "source",
            "n",
            F.col("pa._b").alias("ba"),
            F.col("pa._v").alias("va"),
            F.explode("pts").alias("pb"),
        )
        .filter(F.col("pb._b") > F.col("ba"))
        .groupBy("source", "n")
        .agg(
            F.sum(
                F.when(F.col("pb._v") > F.col("va"), F.lit(1))
                .when(F.col("pb._v") < F.col("va"), F.lit(-1))
                .otherwise(F.lit(0))
            ).alias("s_stat")
        )
    )
    ties = (
        b.groupBy("source", "_v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("source")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - F.lit(1)) * (F.lit(2) * F.col("t") + F.lit(5))
            ).alias("tie_term")
        )
    )
    out = s.join(F.broadcast(ties), "source")
    return out.select(
        "source",
        "n",
        F.col("s_stat").cast("long").alias("s_stat"),
        (
            F.col("n") * (F.col("n") - F.lit(1)) * (F.lit(2) * F.col("n") + F.lit(5))
            - F.col("tie_term")
        ).cast("long").alias("var18"),
        (
            (F.lit(2) * F.col("s_stat")).cast("double")
            / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
        ).alias("tau"),
    )


def ks_two_sample(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
    quantum: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per series: split each
    series at its midpoint in (ts, event_id) order (first ``n div 2`` rows
    vs the rest) and take the sup of |ECDF_1 - ECDF_2| over the observed
    support — the standard early-vs-late distribution-drift check
    complementing the chi-square histogram drift operator.

    Integer form: with per-value counts c1, c2 and cumulative counts
    cum1, cum2 over ascending micro-unit value, the sup is
    ``d_num = max |n2*cum1 - n1*cum2|`` (exact BIGINT; the discrete ECDFs
    only change at sample points, so scanning grouped distinct values is
    exact).  ``ks_stat = d_num/(n1*n2)`` is the one division.

    Output: (partition, n1, n2, d_num, ks_stat).
    """
    w_ord = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    w_all = Window.partitionBy(partition)
    b = df.select(
        F.col(partition).alias("source"),
        F.round(F.col(value) * quantum).cast("long").alias("_v"),
        F.row_number().over(w_ord).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    ).select(
        "source",
        "_v",
        F.expr("_n div 2").alias("n1"),
        (F.col("_n") - F.expr("_n div 2")).alias("n2"),
        F.when(F.col("_rn") <= F.expr("_n div 2"), F.lit(1)).otherwise(F.lit(2)).alias("_half"),
    )
    per_v = b.groupBy("source", "n1", "n2", "_v").agg(
        F.sum(F.when(F.col("_half") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("_half") == 2, 1).otherwise(0)).alias("c2"),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        "source",
        "n1",
        "n2",
        (F.col("n2") * F.sum("c1").over(w_cum) - F.col("n1") * F.sum("c2").over(w_cum)).alias(
            "_d"
        ),
    )
    return cum.groupBy("source", "n1", "n2").agg(
        F.max(F.abs(F.col("_d"))).cast("long").alias("d_num")
    ).select(
        "source",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "d_num",
        (F.col("d_num").cast("double") / (F.col("n1") * F.col("n2")).cast("double")).alias(
            "ks_stat"
        ),
    )


def permutation_patterns(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Ordinal pattern distribution (Bandt-Pompe, m=3) per series: every
    length-3 window is classified by the sign triple
    ``(sign(v1-v0), sign(v2-v1), sign(v2-v0))`` — 27 classes encoding the
    13 realizable ordinal patterns INCLUDING tie classes (ties are real in
    quantized tiers; collapsing them loses the flat-motif signal).
    ``pattern_id = 9*(s01+1) + 3*(s12+1) + (s02+1)``.

    The permutation-entropy reading ``-sum p ln p`` needs ln (not
    bit-exact cross-engine), so this operator emits the exact integer
    sufficient statistics instead: per-pattern count and its ppm share
    ``(1_000_000*cnt) div n_windows`` (floor on both engines); entropy is
    a driver-side fold over <=27 rows per series.

    Output: (partition, pattern_id, cnt, n_windows, share_ppm).
    """
    w = Window.partitionBy(partition).orderBy(order)
    v0 = F.col(value).cast("long")
    b = df.select(
        F.col(partition).alias("source"),
        v0.alias("_v0"),
        F.lead(v0, 1).over(w).alias("_v1"),
        F.lead(v0, 2).over(w).alias("_v2"),
    ).where(F.col("_v2").isNotNull())
    sgn = lambda a, b_: F.when(a > b_, 2).when(a < b_, 0).otherwise(1)  # sign+1
    pat = b.select(
        "source",
        (
            F.lit(9) * sgn(F.col("_v1"), F.col("_v0"))
            + F.lit(3) * sgn(F.col("_v2"), F.col("_v1"))
            + sgn(F.col("_v2"), F.col("_v0"))
        ).alias("pattern_id"),
    )
    w_src = Window.partitionBy("source")
    return (
        pat.groupBy("source", "pattern_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "source",
            F.col("pattern_id").cast("long").alias("pattern_id"),
            "cnt",
            F.sum("cnt").over(w_src).alias("n_windows"),
        )
        .select(
            "source",
            "pattern_id",
            "cnt",
            "n_windows",
            F.expr("(1000000 * cnt) div n_windows").alias("share_ppm"),
        )
    )


def seasonal_naive_qof(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
    season: int = 24,
) -> DataFrame:
    """Seasonal-naive baseline QoF per series: forecast v[t] = v[t-season]
    (the M-competition baseline every seasonal model must beat — the
    seasonal analogue of the reference's lag-h persistence QoF,
    reference qof.py diagnose) and score it with exact integer errors.

    Centi-unit errors keep n*sum(e^2) far under 2^63 (|e| <= ~1.2e5 centi,
    n <= ~10^3 on rolled tiers).  Emitted doubles are fixed left-assoc
    chains of exact BIGINTs: ``mse = (sse/m)/1e4``, ``mae = (sae/m)/1e2``
    — written identically in the SQL mirror.

    Output: (partition, m, sse_centi2, sae_centi, mse, mae).
    """
    vc = F.expr(f"{value} div 10000")
    b = (
        df.select(
            F.col(partition).alias("source"),
            vc.alias("_vc"),
            F.lag(vc, season).over(
                Window.partitionBy(partition).orderBy(order)
            ).alias("_hat"),
        )
        .where(F.col("_hat").isNotNull())
        .select("source", (F.col("_vc") - F.col("_hat")).alias("_e"))
    )
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("_e") * F.col("_e")).cast("long").alias("sse_centi2"),
        F.sum(F.abs(F.col("_e"))).cast("long").alias("sae_centi"),
    ).select(
        "source",
        "m",
        "sse_centi2",
        "sae_centi",
        (
            (F.col("sse_centi2").cast("double") / F.col("m").cast("double")) / F.lit(10000.0)
        ).alias("mse"),
        (
            (F.col("sae_centi").cast("double") / F.col("m").cast("double")) / F.lit(100.0)
        ).alias("mae"),
    )


def spearman_pairs(
    buckets: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Spearman rank correlation between every pair of series on their
    SHARED bucket grid — the robust (monotone-invariant) companion of the
    squared-distance series join: which sources co-move in RANK, immune
    to level shifts and monotone rescalings that break Euclidean distance.

    Tie-safe exact form: average ranks are computed in DOUBLED quanta
    (``2·avg_rank = 2·min_rank + tie_count − 1`` — integers even under
    ties), and the Pearson-of-ranks pieces ``num = n·Σxy − Σx·Σy``,
    ``d1 = n·Σx² − (Σx)²``, ``d2`` likewise stay exact BIGINTs (≤ ~4n³ ≈
    1.5e9 at month-long hourly tiers — far under 2^53 AND 2^63).  The one
    float step is ``rho = (num/sqrt(d1))/sqrt(d2)``: IEEE-754 requires
    sqrt and division correctly rounded, and both engines comply, so even
    this chain is bit-identical cross-engine (NULL on zero rank variance).

    Plan: self-equi-join on the bucket, two rank windows per pair key,
    one hash aggregate.  Pair count is the output size — run over sources
    / rolled tiers, prefilter with SAX buckets for 10^5+ series.

    Output: (source_a, source_b, n_shared, num, d1, d2, rho).
    """
    left = buckets.select(
        F.col(partition).alias("source_a"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_va"),
    )
    right = buckets.select(
        F.col(partition).alias("source_b"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_vb"),
    )
    j = left.join(right, "_b").where(F.col("source_a") < F.col("source_b"))
    wp = ["source_a", "source_b"]
    rx = (
        F.lit(2) * F.rank().over(Window.partitionBy(*wp).orderBy("_va"))
        + F.count(F.lit(1)).over(Window.partitionBy(*wp, "_va"))
        - F.lit(1)
    ).cast("long")
    ry = (
        F.lit(2) * F.rank().over(Window.partitionBy(*wp).orderBy("_vb"))
        + F.count(F.lit(1)).over(Window.partitionBy(*wp, "_vb"))
        - F.lit(1)
    ).cast("long")
    r = j.select("source_a", "source_b", rx.alias("_rx"), ry.alias("_ry"))
    agg = r.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
    )
    num = (F.col("n_shared") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("long")
    d1 = (F.col("n_shared") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("long")
    d2 = (F.col("n_shared") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("long")
    return agg.select(
        "source_a",
        "source_b",
        "n_shared",
        num.alias("num"),
        d1.alias("d1"),
        d2.alias("d2"),
        F.when(
            (d1 > 0) & (d2 > 0),
            (num.cast("double") / F.sqrt(d1.cast("double"))) / F.sqrt(d2.cast("double")),
        ).alias("rho"),
    )


def runs_test(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Wald-Wolfowitz runs test per series: label each point above/below
    the series MEDIAN (doubled-quanta exact median; points equal to it are
    discarded, the standard treatment), count the sign runs, and emit the
    null-expected run count ``E[R] = 1 + 2·n_pos·n_neg/n`` — too few runs
    ⇒ trending/clustered, too many ⇒ oscillating.  Complements
    ``longest_runs`` (strictly-increasing runs) with the median-crossing
    randomness check.

    All counts are exact integers; ``expected_runs`` is the one division
    of exact BIGINTs (fixed form ``1.0 + num/den`` both engines).

    Output: (partition, n_pos, n_neg, n_runs, expected_runs).  A
    constant series discards every point and emits NO row (both engines).
    """
    w_src = Window.partitionBy(partition)
    v2 = (F.col(value).cast("long") * 2).alias("_v2")
    b = df.select(F.col(partition).alias("source"), F.col(order).alias("_o"), v2)
    b = b.withColumn("_m2", F.percentile("_v2", 0.5).over(Window.partitionBy("source")))
    s = b.select(
        "source",
        "_o",
        F.when(F.col("_v2").cast("double") > F.col("_m2"), F.lit(1))
        .when(F.col("_v2").cast("double") < F.col("_m2"), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("_sgn"),
    ).where(F.col("_sgn") != 0)
    w_ord = Window.partitionBy("source").orderBy("_o")
    brk = (
        s.withColumn("_prev", F.lag("_sgn").over(w_ord))
        .select(
            "source",
            "_sgn",
            F.when(
                F.col("_prev").isNull() | (F.col("_sgn") != F.col("_prev")), 1
            ).otherwise(0).alias("_brk"),
        )
    )
    return brk.groupBy("source").agg(
        F.sum(F.when(F.col("_sgn") == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("_sgn") == -1, 1).otherwise(0)).alias("n_neg"),
        F.sum("_brk").alias("n_runs"),
    ).select(
        "source",
        "n_pos",
        "n_neg",
        "n_runs",
        (
            F.lit(1.0)
            + (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double")
            / (F.col("n_pos") + F.col("n_neg")).cast("double")
        ).alias("expected_runs"),
    )


def pearson_pairs(
    buckets: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Pearson linear correlation between every pair of series on their
    SHARED bucket grid — the level-sensitive complement of
    :func:`spearman_pairs` (CCF at lag 0, but across ALL pairs): which
    sources co-move LINEARLY.

    Centi-unit quanta keep every product exact: |v| <= ~6e4 centi,
    n <= ~10^3 on month-long hourly tiers, so n·Σxy <= ~1.6e15 and
    Σx·Σy <= ~1.6e15 — under 2^53 (exact as doubles) and far under 2^63
    (ANSI-safe).  ``r = (num/sqrt(d1))/sqrt(d2)`` rides the same
    correctly-rounded IEEE sqrt/div chain the Spearman operator proved
    bit-identical cross-engine; NULL on zero variance.

    Plan: self-equi-join on the bucket + one hash aggregate per pair.

    Output: (source_a, source_b, n_shared, num, d1, d2, r).
    """
    vc = F.expr(f"{value} div 10000")
    left = buckets.select(
        F.col(partition).alias("source_a"), F.col(order).alias("_b"), vc.alias("_va")
    )
    right = buckets.select(
        F.col(partition).alias("source_b"), F.col(order).alias("_b"), vc.alias("_vb")
    )
    j = left.join(right, "_b").where(F.col("source_a") < F.col("source_b"))
    agg = j.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum("_va").alias("_sx"),
        F.sum("_vb").alias("_sy"),
        F.sum(F.col("_va") * F.col("_va")).alias("_sxx"),
        F.sum(F.col("_vb") * F.col("_vb")).alias("_syy"),
        F.sum(F.col("_va") * F.col("_vb")).alias("_sxy"),
    )
    num = (F.col("n_shared") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("long")
    d1 = (F.col("n_shared") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("long")
    d2 = (F.col("n_shared") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("long")
    return agg.select(
        "source_a",
        "source_b",
        "n_shared",
        num.alias("num"),
        d1.alias("d1"),
        d2.alias("d2"),
        F.when(
            (d1 > 0) & (d2 > 0),
            (num.cast("double") / F.sqrt(d1.cast("double"))) / F.sqrt(d2.cast("double")),
        ).alias("r"),
    )


def winsorized_mean(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    alpha_pct: int = 10,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Rank-based winsorized mean per series: values below the k-th order
    statistic (k = floor(alpha·n) + 1) are REPLACED by it, values above
    the (n-k+1)-th by that — the clamp-don't-drop robust location
    estimator completing the robust family (median / MAD / trimmed mean /
    Theil-Sen): unlike the trimmed mean it keeps n constant, so it
    composes with downstream counts.

    Rank-based bounds (order statistics, not interpolated quantiles) keep
    everything integer: the k-th smallest micro-unit value is exact on
    both engines regardless of tie order (the VALUE at a row_number is
    deterministic even when ties make the row assignment arbitrary), the
    clamped sum is an exact BIGINT, and the mean is one fixed left-assoc
    division chain ``(sum/n)/1e6``.

    Output: (partition, n, lo_micro, hi_micro, win_sum_micro, win_mean).
    """
    w_rn = Window.partitionBy(partition).orderBy(F.col("_vm"))
    w_src = Window.partitionBy(partition)
    vm = F.round(F.col(value) * quantum).cast("long")
    b = (
        df.select(F.col(partition).alias("source"), vm.alias("_vm"))
        .withColumn("_rn", F.row_number().over(w_rn.partitionBy("source")))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("source")))
        .withColumn("_k", F.expr(f"({alpha_pct} * _n) div 100 + 1"))
    )
    bounds = b.groupBy("source", "_n", "_k").agg(
        F.min(F.when(F.col("_rn") == F.col("_k"), F.col("_vm"))).alias("lo"),
        F.min(F.when(F.col("_rn") == F.col("_n") - F.col("_k") + 1, F.col("_vm"))).alias(
            "hi"
        ),
    )
    c = b.join(F.broadcast(bounds.select("source", "lo", "hi")), "source")
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("_vm")))
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lo").alias("lo_micro"),
        F.min("hi").alias("hi_micro"),
        F.sum(clamped).alias("win_sum_micro"),
    ).select(
        "source",
        "n",
        "lo_micro",
        "hi_micro",
        "win_sum_micro",
        (
            (F.col("win_sum_micro").cast("double") / F.col("n").cast("double"))
            / F.lit(1000000.0)
        ).alias("win_mean"),
    )


def moments(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
) -> DataFrame:
    """Higher-moment shape profile per series: central moment sums m2/m3/m4
    around the truncating integer mean, plus floor-quantized skewness g1 and
    kurtosis g2 = n*m4/m2^2 (Pearson, non-excess). The reference's QoF layer
    stops at second-order statistics (mse/r2 — reference qof.py); the shape
    moments are the standard next diagnostics (heavy tails break the OLS
    residual assumptions ARX inherits).

    Exactness: values quantize to UNIT integers and center on the floored
    integer mean, so every moment sum is exact BIGINT (bound: n*max|z|^4
    < 2^63 → |z| <= ~5,500 at n = 1e8 rows/series; raw |v| here <= ~561).
    The continuous g1/g2 are fixed-shape chains of correctly-rounded ops on
    exact-integer doubles — sqrt and arithmetic are IEEE correctly-rounded
    in both engines, so floor-quantized outputs match bit-for-bit:
      g1 = (m3/n) / s^3 with s = sqrt(m2/n)    (computed as written)
      g2 = (n*m4) / (m2*m2)
    Zero-variance series emit NULL quantized moments.

    Plan: two hash aggregates over one broadcast-join (mean table is
    |sources| rows) — map-side partials, no window, one shuffle.
    Output: (source, n, mu_unit, m2, m3, m4, skew_q6, kurt_q6)."""
    vq = F.round(F.col(value)).cast("long")
    mu_tbl = (
        df.groupBy(partition)
        .agg(F.sum(vq).alias("_s"), F.count(F.lit(1)).alias("n"))
        .withColumn("mu_unit", F.expr("_s div n"))
        .select(partition, "mu_unit")
    )
    z = vq - F.col("mu_unit")
    agg = (
        df.join(F.broadcast(mu_tbl), partition)
        .groupBy(partition, "mu_unit")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(z * z).alias("m2"),
            F.sum(z * z * z).alias("m3"),
            F.sum(z * z * z * z).alias("m4"),
        )
    )
    nd = F.col("n").cast("double")
    s = F.sqrt(F.col("m2").cast("double") / nd)
    g1 = (F.col("m3").cast("double") / nd) / ((s * s) * s)
    g2 = (nd * F.col("m4").cast("double")) / (
        F.col("m2").cast("double") * F.col("m2").cast("double")
    )
    q = F.lit(1000000.0)
    return agg.select(
        partition,
        "n",
        "mu_unit",
        "m2",
        "m3",
        "m4",
        F.when(F.col("m2") > 0, F.floor(g1 * q)).alias("skew_q6"),
        F.when(F.col("m2") > 0, F.floor(g2 * q)).alias("kurt_q6"),
    )


def rescaled_range(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order=("ts", "event_id"),
) -> DataFrame:
    """Rescaled-range (R/S) statistic per series — the Hurst-exponent
    ingredient (Hurst 1951; Mandelbrot & Wallis 1969): the range of the
    mean-adjusted cumulative deviations divided by the population standard
    deviation. R/S >> sqrt(n) signals long-range dependence the reference's
    AR diagnostics (short-memory by construction) cannot see.

    Exactness: with unit-quantized values, dev_i = n*cumsum_i - i*total is
    the n-scaled cumulative deviation — exact BIGINT (bound n^2*max|v|
    < 2^63 → n <= ~4e6 rows/series at |v| <= 561; feed rolled tiers).
    R_scaled = max(dev) - min(dev) = n*R and n^2*var = n*sum(v^2) - total^2
    are exact integers, and R/S = R_scaled / sqrt(n^2*var) is ONE division
    of a correctly-rounded sqrt — bit-identical cross-engine; quantized by
    floor to ppm. Constant series emit NULL (S = 0).

    Plan: one cumulative window + one hash agg on the same single shuffle.
    Output: (source, n, r_scaled, s2_scaled, rs_q6)."""
    vq = F.round(F.col(value)).cast("long")
    w = (
        Window.partitionBy(partition)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_tbl = (
        df.groupBy(partition)
        .agg(F.sum(vq).alias("_tot"), F.count(F.lit(1)).alias("_n"))
    )
    b = (
        df.withColumn("_cum", F.sum(vq).over(w))
        .withColumn("_i", F.row_number().over(
            Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
        ))
        .withColumn("_v2", vq * vq)
        .join(F.broadcast(tot_tbl), partition)
        .withColumn("_dev", F.col("_n") * F.col("_cum") - F.col("_i") * F.col("_tot"))
    )
    agg = b.groupBy(partition).agg(
        F.max("_n").alias("n"),
        (F.max("_dev") - F.min("_dev")).alias("r_scaled"),
        (F.max("_n") * F.sum("_v2") - F.max("_tot") * F.max("_tot")).alias("s2_scaled"),
    )
    rs = F.col("r_scaled").cast("double") / F.sqrt(F.col("s2_scaled").cast("double"))
    return agg.select(
        partition,
        "n",
        "r_scaled",
        "s2_scaled",
        F.when(F.col("s2_scaled") > 0, F.floor(rs * F.lit(1000000.0))).alias("rs_q6"),
    )


def binseg_changepoint(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order=("ts", "event_id"),
) -> DataFrame:
    """Offline single-changepoint detection by binary segmentation (the
    first split of BinSeg / PELT, Scott & Knott 1974; Killick et al. 2012):
    the split index minimizing total within-segment squared error,
    SSE(i) = (A_i − B_i²/i) + (A_r − B_r²/r) over prefix sums A = Σv²,
    B = Σv — the offline complement of the online :func:`cusum` detector.

    Exactness: milli-quantized prefix sums are exact BIGINTs; the cost is
    a fixed-shape chain of correctly-rounded casts/mults/divs (BIGINT→
    DOUBLE is correctly rounded in both engines), floored to an integer
    cost. The argmin is tie-broken to the SMALLEST index by a two-step
    min: min cost per series, then min i at that cost — no struct min
    (keeps HashAggregate), no sequential scan. Bound: Σv² ≤ n·(1000·max|v|)²
    < 2^63 → n ≤ ~2.9e7 rows/series at |v| ≤ 560.

    Plan: one ordered cumulative window + whole-partition windows (totals
    and the min cost) on the SAME single shuffle — no join-back, so the
    window chain is evaluated once — then one tiny aggregate.
    Output: (source, n, split_i, min_cost_q) — split_i = size of the left
    segment; NULL when n < 2 (no interior split)."""
    vq = F.round(F.col(value) * 1000).cast("long")
    cols = [F.col(c) for c in order]
    wc = (
        Window.partitionBy(partition)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy(partition)
    b = (
        df.withColumn("_i", F.row_number().over(Window.partitionBy(partition).orderBy(*cols)).cast("long"))
        .withColumn("_bi", F.sum(vq).over(wc))
        .withColumn("_ai", F.sum(vq * vq).over(wc))
        .withColumn("_n", F.count(F.lit(1)).over(wa))
        .withColumn("_bn", F.sum(vq).over(wa))
        .withColumn("_an", F.sum(vq * vq).over(wa))
        .where(F.col("_i") < F.col("_n"))
    )
    i_d = F.col("_i").cast("double")
    r = F.col("_n") - F.col("_i")
    br = F.col("_bn") - F.col("_bi")
    ar = F.col("_an") - F.col("_ai")
    cost = (
        F.col("_ai").cast("double")
        - (F.col("_bi").cast("double") * F.col("_bi").cast("double")) / i_d
    ) + (ar.cast("double") - (br.cast("double") * br.cast("double")) / r.cast("double"))
    c = b.withColumn("_cost_q", F.floor(cost)).withColumn(
        "_wmin", F.min(F.floor(cost)).over(wa)
    )
    return (
        c.where(F.col("_cost_q") == F.col("_wmin"))
        .groupBy(partition)
        .agg(
            F.max("_n").alias("n"),
            F.min("_i").alias("split_i"),
            F.min("_wmin").alias("min_cost_q"),
        )
        .select(partition, "n", "split_i", "min_cost_q")
    )


# Benford expected first-digit frequencies, floor(log10(1 + 1/d) * 1e6):
# fixed PUBLISHED integer literals (Benford 1938; Hill 1995) written
# identically into the SQL mirror, so no engine ever evaluates a log.
BENFORD_PPM = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)


def benford_digits(
    df: DataFrame,
    value: str = "value",
    partition: str = "source",
) -> DataFrame:
    """First-significant-digit profile per group vs Benford's law — the
    classic forensic data-quality screen (Benford 1938; Hill, Statistical
    Science 1995): synthetic, clipped, or fat-fingered numeric feeds skew
    the leading-digit distribution long before summary stats move.  The
    reference Forecaster assumes clean inputs (its example notebooks load
    curated CSVs); at 100-TB ingest this is the cheap tripwire in front
    of the rollup tiers.

    Exactness discipline: values quantize to micro-unit BIGINTs (zero
    drops out — zero has no leading digit); the leading digit is the
    first character of the BIGINT's decimal string, which both engines
    render identically (no float formatting anywhere).  Shares are ppm by
    integer floor division of non-negative counts (Spark ``div`` ==
    DuckDB ``//`` there), deviations are differences against the
    published integer Benford table, and ``tvd_ppm`` (total variation
    x 2e6) is an integer window sum over the 9-digit spine — digits with
    zero observations still contribute their expected mass.

    Plan shape (100-TB lens): one hash aggregate on (group, digit) with
    map-side partials — at most 9 rows per group survive the shuffle —
    then a broadcast 9-row spine join and a 9-row window per group.
    Whole-stage codegen end to end; no kernel, no collect.

    Output: (partition, digit, cnt, n, obs_ppm, exp_ppm, dev_ppm, tvd_ppm).
    """
    m = df.select(
        F.col(partition),
        F.expr(f"abs(CAST(round({value} * 1000000) AS BIGINT))").alias("am"),
    ).filter(F.col("am") > 0)
    d = m.select(
        partition, F.substring(F.col("am").cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = d.groupBy(partition, "digit").agg(F.count("*").alias("cnt"))
    spine = (
        d.select(partition)
        .distinct()
        .select(
            partition,
            F.explode(F.sequence(F.lit(1).cast("long"), F.lit(9).cast("long"))).alias("digit"),
            F.element_at(
                F.array(*[F.lit(p).cast("long") for p in BENFORD_PPM]),
                F.col("digit").cast("int"),
            ).alias("exp_ppm"),
        )
    )
    full = (
        spine.join(counts, on=[partition, "digit"], how="left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(partition)))
        .withColumn("obs_ppm", F.expr("(cnt * 1000000) div n"))
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("exp_ppm"))
        .withColumn("tvd_ppm", F.sum(F.abs("dev_ppm")).over(Window.partitionBy(partition)))
    )
    return full.select(partition, "digit", "cnt", "n", "obs_ppm", "exp_ppm", "dev_ppm", "tvd_ppm")


def granger_pairs(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Pairwise Granger-causality screen at lag 1 (Granger 1969): for
    every ordered series pair (y, x), fit the restricted AR model
    y_t ~ [1, y_{t-1}] and the full model y_t ~ [1, y_{t-1}, x_{t-1}] by
    exact OLS and report the F-ratio ((RSS_r - RSS_f)(n-3)) / RSS_f — the
    exogenous-selection companion of :func:`~forecaster_spark.operators.
    timeweight.ccf` that answers "does x's past IMPROVE y's forecast
    beyond y's own past?", i.e. which exo columns deserve a slot in the
    reference's ARX design (reference arx.py exo blocks take that choice
    as given).

    Exactness discipline (the pacf/exact-Cramer recipe, CLAUDE.md): the
    integer-valued rolled signal gives exact BIGINT normal-equation sums;
    both solves are integer Cramer — 2x2 ratios and 3x3 determinants as
    exact Python ints, each divided ONCE through the DuckDB
    HUGEINT->DOUBLE cast mimic (oracle/ref.py hugeint_to_double), with the
    singular-design intercept-only fallback (dd = 0 -> [Sy/n, 0, ...])
    mirrored from models/exact_sql.py; residuals are fixed left-assoc
    float chains ((b0 + l1y*b1) + l1x*b2) and RSS is the add-order-
    independent BIGINT sum of floor(e*e*1e6) micro-units; the F-ratio is
    one IEEE division of two exact BIGINTs (< 2^57 on the tiers).
    Determinant bound: 3x3 terms ~ n*Sll*Sxx <= ~2^65 at tier scale —
    inside HUGEINT/Python int, OUTSIDE int64, which is why the dets are
    Python ints, never numpy.

    Plan shape (100-TB lens): one equi-join of the rolled tier with
    itself on the time bucket (tier-bounded: |sources| x |buckets| rows),
    then ONE shuffle on the (y,x) pair key into a per-pair Arrow kernel
    — normal-equation sums are int64 numpy dots; pair count scales the
    parallelism, each task is one bounded series pair.

    Output: (y_source, x_source, n, rss_r_q, rss_f_q, b_cross, f_ratio).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField("y_source", part_field.dataType),
            T.StructField("x_source", part_field.dataType),
            T.StructField("n", T.LongType()),
            T.StructField("rss_r_q", T.LongType()),
            T.StructField("rss_f_q", T.LongType()),
            T.StructField("b_cross", T.DoubleType()),
            T.StructField("f_ratio", T.DoubleType()),
        ]
    )
    t = df.select(F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v"))
    a, c = t.alias("a"), t.alias("c")
    pr = a.join(
        c,
        (F.col("a._b") == F.col("c._b")) & (F.col(f"a.{partition}") != F.col(f"c.{partition}")),
    ).select(
        F.col(f"a.{partition}").alias("y_source"),
        F.col(f"c.{partition}").alias("x_source"),
        F.col("a._b").alias("_b"),
        F.col("a._v").alias("_y"),
        F.col("c._v").alias("_x"),
    )

    def det3(m):
        (a_, b_, c_), (d_, e_, f_), (g_, h_, i_) = m
        return a_ * (e_ * i_ - f_ * h_) - b_ * (d_ * i_ - f_ * g_) + c_ * (d_ * h_ - e_ * g_)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        yy = pdf["_y"].to_numpy()
        xx = pdf["_x"].to_numpy()
        yv, l1y, l1x = yy[1:], yy[:-1], xx[:-1]
        n = len(yv)
        cols = [f.name for f in out_schema.fields]
        if n < 4:
            return pd.DataFrame(columns=cols)
        sl, sx, sy = int(l1y.sum()), int(l1x.sum()), int(yv.sum())
        sll = int(np.dot(l1y, l1y))
        slx = int(np.dot(l1y, l1x))
        sxx = int(np.dot(l1x, l1x))
        syl = int(np.dot(yv, l1y))
        syx = int(np.dot(yv, l1x))
        # restricted 2x2 Cramer
        d2 = n * sll - sl * sl
        if d2 == 0:
            b0r, b1r = h2d(sy) / h2d(n), 0.0
        else:
            b0r = h2d(sy * sll - sl * syl) / h2d(d2)
            b1r = h2d(n * syl - sl * sy) / h2d(d2)
        # full 3x3 Cramer (exact Python ints — terms exceed int64)
        A = [[n, sl, sx], [sl, sll, slx], [sx, slx, sxx]]
        cv = [sy, syl, syx]
        d3 = det3(A)
        if d3 == 0:
            b0f, b1f, b2f = h2d(sy) / h2d(n), 0.0, 0.0
        else:
            num = [
                det3([[cv[i] if j == jj else A[i][jj] for jj in range(3)] for i in range(3)])
                for j, _ in enumerate(range(3))
            ]
            b0f = h2d(num[0]) / h2d(d3)
            b1f = h2d(num[1]) / h2d(d3)
            b2f = h2d(num[2]) / h2d(d3)
        f8 = np.float64
        er = yv.astype(f8) - (b0r + l1y.astype(f8) * b1r)
        ef = yv.astype(f8) - ((b0f + l1y.astype(f8) * b1f) + l1x.astype(f8) * b2f)
        rss_r = int(np.floor(er * er * 1e6).astype(np.int64).sum())
        rss_f = int(np.floor(ef * ef * 1e6).astype(np.int64).sum())
        if rss_f > 0 and n > 3:
            f_ratio = float((rss_r - rss_f) * (n - 3)) / float(rss_f)
        else:
            f_ratio = None
        return pd.DataFrame(
            [
                (
                    pdf["y_source"].iat[0],
                    pdf["x_source"].iat[0],
                    n,
                    rss_r,
                    rss_f,
                    b2f,
                    f_ratio,
                )
            ],
            columns=cols,
        )

    return pr.groupBy("y_source", "x_source").applyInPandas(kernel, schema=out_schema)


def dickey_fuller(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Dickey-Fuller unit-root screen per series (Dickey & Fuller 1979,
    constant-only lag-0 form): regress dy_t = a + b*y_{t-1} and report
    b's t-ratio against the 5% asymptotic critical value (-2.86, Fuller's
    tau_mu table; MacKinnon 1994) — the stationarity gate in front of the
    reference's AR/ARX fits (reference ar_yw.py assumes a stationary
    series; this is the check its notebooks do by eye).

    Exactness discipline: integer signal -> exact BIGINT normal-equation
    sums; 2x2 Cramer ratios divided once through the HUGEINT->DOUBLE
    mimic; residual RSS as the order-independent BIGINT sum of
    floor(e*e*1e6); then a FIXED chain of correctly-rounded IEEE ops
    written identically in the SQL mirror: s2 = double(rss)/1e6/(n-2),
    se = sqrt(s2 * double(n) / double(d2)), t = b/se.  sqrt is exactly
    rounded per IEEE-754 (the temperature_mixture precedent), so the
    t-stat is bit-identical cross-engine.  d2 <= n*Szz ~ 2^37 at tier
    scale — every cast stays under 2^53, exact.

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel over the tier-bounded array (int64 numpy dots, Python-int
    Cramer).  Output: (partition, n, b_hat, rss_q, t_stat,
    stationary_5pct).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("n", T.LongType()),
            T.StructField("b_hat", T.DoubleType()),
            T.StructField("rss_q", T.LongType()),
            T.StructField("t_stat", T.DoubleType()),
            T.StructField("stationary_5pct", T.BooleanType()),
        ]
    )
    b = df.select(F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        vv = pdf["_v"].to_numpy()
        cols = [f.name for f in out_schema.fields]
        if len(vv) < 4:
            return pd.DataFrame(columns=cols)
        z = vv[:-1]
        dy = vv[1:] - vv[:-1]
        n = len(dy)
        sz, sd = int(z.sum()), int(dy.sum())
        szz = int(np.dot(z, z))
        sdz = int(np.dot(dy, z))
        d2 = n * szz - sz * sz
        if d2 == 0:
            bh, ah = 0.0, 0.0  # mirror the SQL CASE: singular -> zeros
        else:
            bh = h2d(n * sdz - sz * sd) / h2d(d2)
            ah = h2d(sd * szz - sz * sdz) / h2d(d2)
        f8 = np.float64
        e = dy.astype(f8) - (ah + z.astype(f8) * bh)
        rss_q = int(np.floor(e * e * 1e6).astype(np.int64).sum())
        if rss_q > 0 and n > 2 and d2 != 0:
            s2 = float(rss_q) / 1e6 / (n - 2)
            se = math.sqrt(s2 * float(n) / float(d2))
            t = bh / se
            stat = bool(t < -2.86)
        else:
            t, stat = None, None
        return pd.DataFrame(
            [(pdf[partition].iat[0], n, bh, rss_q, t, stat)], columns=cols
        )

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)



def kpss_level(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """KPSS level-stationarity statistic per series (Kwiatkowski,
    Phillips, Schmidt & Shin 1992, lag-0 short-run variance variant) —
    the complement of :func:`dickey_fuller`: KPSS takes STATIONARITY as
    the null, so "DF rejects unit root AND KPSS fails to reject
    stationarity" is the agreement band that actually clears a series
    for the reference's AR fits.

    Estimator (documented, engine-exact): centering must be EXACT here —
    a truncated integer mean leaves an O(1)-per-step drift whose partial
    sums dominate the statistic (measured: iid-noise eta 0.85 vs the
    correct 0.24) — so deviations are scaled integers D_i = n*v_i - s
    (exactly zero-mean, no division); the statistic is scale-invariant:
    eta = sum(S'_t^2) / (n * sum(D^2)) with S'_t = cumsum(D).  S'_t fits
    int64 at tier scale but sum(S'^2) can reach ~2^69 on trending series,
    so the squares accumulate in PYTHON ints (kernel) / HUGEINT (SQL),
    and the single division runs both operands through the
    HUGEINT->DOUBLE cast mimic (pacf recipe).  Compared against the
    published 5% critical value 0.463 (KPSS Table 1, level case).

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel (int64 cumsum + Python-int square sums over the tier-bounded
    array).

    Output: (partition, n, s2_sum_d, dev2_sum, eta, level_stationary_5pct)
    — s2_sum_d is the (possibly >2^63) square sum as its DOUBLE cast.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("n", T.LongType()),
            T.StructField("s2_sum_d", T.DoubleType()),
            T.StructField("dev2_sum", T.LongType()),
            T.StructField("eta", T.DoubleType()),
            T.StructField("level_stationary_5pct", T.BooleanType()),
        ]
    )
    b = df.select(F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        vv = pdf["_v"].to_numpy()
        n = len(vv)
        cols = [f.name for f in out_schema.fields]
        if n < 2:
            return pd.DataFrame(columns=cols)
        s = int(vv.sum())
        dd = n * vv - s  # exactly zero-mean scaled deviations (int64-safe)
        st = np.cumsum(dd)
        s2 = sum(int(x) * int(x) for x in st)  # may exceed int64: Python ints
        d2 = int(np.dot(dd, dd))
        if d2 == 0:
            eta, flag = None, None
        else:
            eta = h2d(s2) / h2d(n * d2)
            flag = bool(eta < 0.463)
        return pd.DataFrame(
            [(pdf[partition].iat[0], n, h2d(s2), d2, eta, flag)], columns=cols
        )

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def arch_lm(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Engle ARCH-LM test per series (Engle 1982, one-lag form):
    volatility clustering shows up as autocorrelation in SQUARED
    first differences — regress u_t = dy_t^2 on [1, u_{t-1}] and report
    LM = n*R^2 against chi-square(1) 5% = 3.84.  The heteroskedasticity
    companion of :func:`dickey_fuller`/:func:`~forecaster_spark.
    operators.timeweight.ljung_box`: OLS forecast intervals (and the
    conformal band's exchangeability assumption) are only honest when
    this fails to reject.

    Exactness discipline (the dickey_fuller recipe on u = dy^2): exact
    BIGINT sums (u <= ~2^40 on the tiers -> all normal-equation terms
    inside int64/HUGEINT), 2x2 Cramer through the HUGEINT->DOUBLE mimic,
    MILLI-quantized RSS and TSS — u is already a square, so e*e is
    degree FOUR in the signal and the micro quantum would overflow int64
    (e^2*1e6 <= ~6e16/row x 720 rows > 2^63); floor(e*e*1e3) keeps the
    sum under ~2^56 with the same cross-engine exactness — then a fixed
    IEEE chain: r2 = 1 - double(rss)/double(tss), lm = double(n) * r2.
    TSS uses the same quantization (d = u - ubar, ubar = the exact-ratio
    mean via one division) so the ratio compares like-with-like.

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel.  Output: (partition, n, rss_q, tss_q, lm_stat, arch_5pct).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("n", T.LongType()),
            T.StructField("rss_q", T.LongType()),
            T.StructField("tss_q", T.LongType()),
            T.StructField("lm_stat", T.DoubleType()),
            T.StructField("arch_5pct", T.BooleanType()),
        ]
    )
    b = df.select(F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        vv = pdf["_v"].to_numpy()
        cols = [f.name for f in out_schema.fields]
        if len(vv) < 5:
            return pd.DataFrame(columns=cols)
        dy = vv[1:] - vv[:-1]
        u = dy * dy
        yv, z = u[1:], u[:-1]
        n = len(yv)
        sz, sy = int(z.sum()), int(yv.sum())
        szz = int(np.dot(z, z))
        syz = int(np.dot(yv, z))
        d2 = n * szz - sz * sz
        if d2 == 0:
            bh, ah = 0.0, 0.0
        else:
            bh = h2d(n * syz - sz * sy) / h2d(d2)
            ah = h2d(sy * szz - sz * syz) / h2d(d2)
        f8 = np.float64
        e = yv.astype(f8) - (ah + z.astype(f8) * bh)
        rss = int(np.floor(e * e * 1e3).astype(np.int64).sum())
        ubar = h2d(sy) / h2d(n)  # exact-ratio mean, one division
        d = yv.astype(f8) - ubar
        tss = int(np.floor(d * d * 1e3).astype(np.int64).sum())
        if tss > 0 and d2 != 0:
            r2 = 1.0 - float(rss) / float(tss)
            lm = float(n) * r2
            flag = bool(lm > 3.84)
        else:
            lm, flag = None, None
        return pd.DataFrame(
            [(pdf[partition].iat[0], n, rss, tss, lm, flag)], columns=cols
        )

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def turning_points(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Turning-point randomness test per series (Kendall's rank-correlation
    book; Brockwell & Davis, Introduction to Time Series, §1.6): count the
    interior points that are STRICT local extrema — ``v[i-1] < v[i] > v[i+1]``
    or ``v[i-1] > v[i] < v[i+1]`` (ties break the pattern and never count, so
    the statistic stays well-defined on quantized signals).  Under iid the
    expectation is ``2(n-2)/3`` and ``90·Var = 16n - 29``; both are emitted
    as exact integers (`exp3` = ``2(n-2)``, the numerator over 3; `var90`)
    so a z-score needs no engine-side sqrt.  ``tp_rate = tp_count/(n-2)``
    is the one IEEE division — iid series sit near 2/3, smooth/trending
    series far below.

    Plan shape: one shuffle on the series key, two lag/lead window columns,
    hash aggregate — whole-stage codegen end to end; O(n) per series.

    Output: (partition, n, tp_count, exp3, var90, tp_rate).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    ).select(
        "source",
        "_v",
        F.lag("_v").over(
            Window.partitionBy("source").orderBy("_b")
        ).alias("_p"),
        F.lead("_v").over(
            Window.partitionBy("source").orderBy("_b")
        ).alias("_x"),
    )
    is_tp = (
        F.col("_p").isNotNull()
        & F.col("_x").isNotNull()
        & (
            ((F.col("_p") < F.col("_v")) & (F.col("_v") > F.col("_x")))
            | ((F.col("_p") > F.col("_v")) & (F.col("_v") < F.col("_x")))
        )
    )
    return (
        b.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_tp, 1).otherwise(0)).cast("long").alias("tp_count"),
        )
        .where(F.col("n") >= F.lit(3))
        .select(
            "source",
            "n",
            "tp_count",
            (F.lit(2) * (F.col("n") - F.lit(2))).cast("long").alias("exp3"),
            (F.lit(16) * F.col("n") - F.lit(29)).cast("long").alias("var90"),
            (
                F.col("tp_count").cast("double")
                / (F.col("n") - F.lit(2)).cast("double")
            ).alias("tp_rate"),
        )
    )


def cox_stuart(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Cox-Stuart trend test per series (Cox & Stuart 1955): pair the i-th
    point with the (i + ceil(n/2))-th and count the sign of each pairwise
    difference — a distribution-free trend screen whose null is a symmetric
    binomial on the non-tied pairs (the sign-test complement of
    :func:`mann_kendall`, O(n) instead of O(n^2) pairs).  Convention:
    ``c = n - n div 2`` (the middle point of an odd series joins no pair),
    pairs ``i = 1 .. n div 2``; ties are counted (`n_ties`) and excluded
    from the binomial.  All outputs are exact integers except
    ``pos_share = pos/(pos+neg)`` — one IEEE division.

    Plan shape: one row_number window + a self-equi-join on
    (series, shifted position) — shuffles on the composite key, no
    cartesian anywhere; O(n) rows joined per series.

    Output: (partition, n, n_pairs, pos, neg, n_ties, pos_share).
    """
    w = Window.partitionBy("source").orderBy("_b")
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    ).select(
        "source",
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("_n"),
    )
    lo = b.where(F.col("_rn") <= F.expr("_n div 2")).select(
        "source", F.col("_n").alias("n"), F.col("_rn").alias("_i"), F.col("_v").alias("_va")
    )
    hi = b.select(
        "source",
        (F.col("_rn") - (F.col("_n") - F.expr("_n div 2"))).alias("_i"),
        F.col("_v").alias("_vb"),
    ).where(F.col("_i") >= F.lit(1))
    j = lo.join(hi, ["source", "_i"])
    return j.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("_vb") > F.col("_va"), 1).otherwise(0)).cast("long").alias("pos"),
        F.sum(F.when(F.col("_vb") < F.col("_va"), 1).otherwise(0)).cast("long").alias("neg"),
        F.sum(F.when(F.col("_vb") == F.col("_va"), 1).otherwise(0)).cast("long").alias("n_ties"),
    ).select(
        "source",
        "n",
        "n_pairs",
        "pos",
        "neg",
        "n_ties",
        F.when(
            (F.col("pos") + F.col("neg")) > 0,
            F.col("pos").cast("double") / (F.col("pos") + F.col("neg")).cast("double"),
        ).alias("pos_share"),
    )


def bartels_rank(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Bartels' rank version of the von Neumann ratio (Bartels, JASA 1982):
    replace values by their within-series ranks and form
    ``RVN = sum (R[i+1]-R[i])^2 / sum (R[i] - (n+1)/2)^2`` — a randomness
    test robust to any monotone marginal (the rank companion of
    :func:`von_neumann_ratio`; iid ~ 2, trending << 2, oscillating >> 2).

    Tie-safe exact form (the spearman_pairs recipe): DOUBLED average ranks
    ``r2 = 2*min_rank + tie_count - 1`` are integers; both the numerator and
    the denominator scale by 4, so ``RVN = nm/den`` is unchanged and is the
    single IEEE division.  Rank bounds make everything int64-trivial:
    nm <= n*(2n)^2, den <= n*n^2 (n <= ~10^3 on rolled tiers).

    Plan shape: two windows (rank by value, lead by time) + one hash
    aggregate — one shuffle on the series key; O(n log n) per series.

    Output: (partition, n, nm_num, d_den, rvn).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    wv = Window.partitionBy("source").orderBy("_v")
    wt = Window.partitionBy("source", "_v")
    wo = Window.partitionBy("source").orderBy("_b")
    r = b.select(
        "source",
        "_b",
        (
            F.lit(2) * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - F.lit(1)
        ).cast("long").alias("_r2"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("_n"),
    ).select(
        "source",
        "_n",
        "_r2",
        F.lead("_r2").over(wo).alias("_r2n"),
    )
    d = F.col("_r2n") - F.col("_r2")
    c = F.col("_r2") - (F.col("_n") + F.lit(1))
    out = r.groupBy("source").agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(F.when(F.col("_r2n").isNotNull(), d * d).otherwise(F.lit(0))).cast("long").alias("nm_num"),
        F.sum(c * c).cast("long").alias("d_den"),
    )
    return out.select(
        "source",
        "n",
        "nm_num",
        "d_den",
        F.when(
            F.col("d_den") > 0,
            F.col("nm_num").cast("double") / F.col("d_den").cast("double"),
        ).alias("rvn"),
    )


def von_neumann_ratio(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Von Neumann ratio per series (von Neumann 1941): the mean squared
    successive difference over the variance,
    ``VN = [sum d^2/(n-1)] / [sum (v - vbar)^2 / n]`` — the classic
    serial-correlation screen (iid ~ 2, positive autocorrelation < 2,
    alternation > 2); the value-domain companion of :func:`bartels_rank`.

    Exact form on the whole-unit integer tier signal (the kpss_level
    feed): scaled deviations ``D_i = n*v_i - sum(v)`` are exactly
    zero-mean integers, and ``VN = (n^2 * sum d^2) / ((n-1) * sum D^2)``
    because ``sum (v-vbar)^2 = sum D^2 / n^2``.  Bounds: whole-unit
    |v| <= ~10^3 and n <= ~10^3 on rolled monthly tiers keep
    ``n^2*sum(d^2) <= n^3*(2v)^2 ~ 4e15`` and ``(n-1)*sum(D^2) <= n^4*v^2
    ~ 1e18`` inside int64 (document the ``n^4*v^2 < 2^63`` feed bound —
    year-long hourly tiers need deci-unit inputs).  One IEEE division.

    Plan shape: lag window + hash aggregate + a broadcast join of the
    per-series (n, sum) row back onto the series — two passes, one shuffle
    each, codegen throughout.

    Output: (partition, n, sum_d2, dev2_sum, vn_ratio).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(ts).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    wo = Window.partitionBy("source").orderBy("_b")
    dcol = F.col("_v") - F.lag("_v").over(wo)
    diffs = b.select("source", dcol.alias("_d")).where(F.col("_d").isNotNull())
    d2 = diffs.groupBy("source").agg(F.sum(F.col("_d") * F.col("_d")).cast("long").alias("sum_d2"))
    ag = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_v").cast("long").alias("_s")
    )
    dev = (
        b.join(F.broadcast(ag), "source")
        .select("source", "n", (F.col("n") * F.col("_v") - F.col("_s")).alias("_dd"))
        .groupBy("source", "n")
        .agg(F.sum(F.col("_dd") * F.col("_dd")).cast("long").alias("dev2_sum"))
    )
    out = dev.join(F.broadcast(d2), "source").where(F.col("n") >= F.lit(2))
    return out.select(
        "source",
        "n",
        "sum_d2",
        "dev2_sum",
        F.when(
            F.col("dev2_sum") > 0,
            (F.col("n") * F.col("n") * F.col("sum_d2")).cast("double")
            / ((F.col("n") - F.lit(1)) * F.col("dev2_sum")).cast("double"),
        ).alias("vn_ratio"),
    )


def grubbs_stat(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Grubbs' maximum-studentized-deviation statistic per series (Grubbs
    1950): ``G = max|v - vbar| / s`` with the sample (n-1) standard
    deviation — the single-outlier screen complementing the rolling MAD
    anomaly operator (global, not windowed; feeds the decision to run
    :func:`winsorized_mean`-style rectification before model fits).

    Exact-integer core on the whole-unit tier signal: ``maxD =
    max|n*v - sum(v)|`` and ``sum D^2`` are exact int64 (same feed bound
    as :func:`von_neumann_ratio`), and because ``s = sqrt(sum D^2 /
    (n^2 (n-1)))`` while ``max|v-vbar| = maxD/n``, the n's cancel:
    ``G = maxD / sqrt(sum D^2 / (n-1))``.  The float tail is one division
    inside one correctly-rounded sqrt then one division — the proven
    dickey_fuller cross-engine-exact chain (CLAUDE.md: single sqrt on
    exact operands is bit-reproducible; log/exp/pow stay banned).

    Plan shape: hash aggregate + broadcast join back + hash aggregate —
    one shuffle on the series key per pass, codegen throughout.

    Output: (partition, n, max_dev_scaled, dev2_sum, grubbs_g).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(value).cast("long").alias("_v"),
    )
    ag = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_v").cast("long").alias("_s")
    )
    dd = F.col("n") * F.col("_v") - F.col("_s")
    g = (
        b.join(F.broadcast(ag), "source")
        .select("source", "n", dd.alias("_dd"))
        .groupBy("source", "n")
        .agg(
            F.max(F.abs(F.col("_dd"))).cast("long").alias("max_dev_scaled"),
            F.sum(F.col("_dd") * F.col("_dd")).cast("long").alias("dev2_sum"),
        )
        .where(F.col("n") >= F.lit(2))
    )
    return g.select(
        "source",
        "n",
        "max_dev_scaled",
        "dev2_sum",
        F.when(
            F.col("dev2_sum") > 0,
            F.col("max_dev_scaled").cast("double")
            / F.sqrt(
                F.col("dev2_sum").cast("double") / (F.col("n") - F.lit(1)).cast("double")
            ),
        ).alias("grubbs_g"),
    )


def gesd_outliers(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    rounds: int = 3,
) -> DataFrame:
    """Generalized ESD multi-outlier screen (Rosner 1983): iterate the
    Grubbs maximum-studentized-deviation statistic ``rounds`` times, each
    round removing the most-deviant point before recomputing — the
    multi-outlier extension of :func:`grubbs_stat` (which masks secondary
    outliers: one huge spike inflates s and hides the second spike).

    Exact-integer core per round r over the remaining n_r points: with
    dd_i = n_r·v_i − Σv (integers), the statistic is
    ``R_r = max|dd| / sqrt(Σdd² / (n_r − 1))`` (the grubbs_stat n-cancel
    identity), one division inside one correctly-rounded sqrt then one
    division — cross-engine bit-exact. The removed point is the row
    maximizing (|dd|, v, −t) — deterministic tie-break mirrored by the SQL
    oracle's ``ORDER BY ad DESC, v DESC, t``. Critical-value comparison
    (t-quantile λ_r) is left to the caller — quantiles of the t
    distribution need incomplete-beta, not SQL-expressible; the screen
    emits the ranked statistics.

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel; the loop runs over the tier-bounded array driver-free (int64
    numpy sums — dd² ≤ (n·v)² with Σ under 2⁶³ at tier scale). Output one
    row per (series, round): (partition, round, n, removed_t, removed_v,
    max_dev_scaled, dev2_sum, r_stat).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("round", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("removed_t", T.LongType()),
            T.StructField("removed_v", T.LongType()),
            T.StructField("max_dev_scaled", T.LongType()),
            T.StructField("dev2_sum", T.LongType()),
            T.StructField("r_stat", T.DoubleType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    b = df.select(
        F.col(partition).alias(partition),
        F.col(ts).alias("_ts"),
        F.col(value).cast("long").alias("_v"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        v = pdf["_v"].to_numpy(dtype=np.int64)
        t = np.arange(len(v), dtype=np.int64)
        out = []
        for r in range(1, rounds + 1):
            n = len(v)
            if n < 2:
                break
            s = int(v.sum())
            dd = n * v - s
            ad = np.abs(dd)
            dev2 = int((dd * dd).sum())
            # argmax by (|dd| DESC, v DESC, t ASC)
            pick = int(np.lexsort((t, -v, -ad))[0])
            r_stat = (
                float(int(ad[pick])) / math.sqrt(float(dev2) / float(n - 1))
                if dev2 > 0
                else None
            )
            out.append(
                (
                    pdf[partition].iat[0],
                    r,
                    n,
                    int(t[pick]),
                    int(v[pick]),
                    int(ad[pick]),
                    dev2,
                    r_stat,
                )
            )
            keep = np.ones(n, dtype=bool)
            keep[pick] = False
            v, t = v[keep], t[keep]
        return pd.DataFrame(out, columns=cols)

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def friedman_blocks(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Friedman blocked-rank test across series (Friedman, JASA 1937):
    treat each time bucket where ALL k series report as a complete block,
    rank the k series within the block, and test whether any series is
    systematically high/low — the nonparametric one-way ANOVA over the
    shared grid (the k-sample companion of the pairwise
    :func:`spearman_pairs`).

    Tie-safe exact form: doubled average ranks ``r2 = 2*min_rank +
    tie_count - 1`` (integers), per-series rank sums ``R2_j = sum r2``;
    with R_j = R2_j/2 the classic statistic ``chi2 = 12/(n k(k+1)) *
    sum R_j^2 - 3n(k+1)`` becomes ``3*sum(R2_j^2)/(n*k*(k+1)) -
    3*n*(k+1)`` — exact BIGINTs, ONE division, one subtraction of an
    exactly-representable integer double (r2 <= 2k, R2_j <= 2kn,
    sum R2^2 <= k*(2kn)^2 ~ 1e10 at k~10, n~10^3).  Tie correction is
    deliberately omitted (documented; ranks are within tiny blocks where
    quantized ties are rare) — chi2 is the uncorrected statistic.

    Plan shape: per-bucket completeness filter (count window over the
    bucket key), within-bucket rank windows (k rows each), one hash
    aggregate per series, then a single-row global aggregate broadcast
    back — shuffles on (bucket) then (series); no cartesian.

    Output: (partition, n_blocks, k, rank2_sum, chi2) — chi2 repeated
    per row (global statistic).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    k_row = b.select(F.countDistinct("source").alias("k"))
    wb = Window.partitionBy("_b")
    complete = (
        b.join(F.broadcast(k_row))
        .withColumn("_bc", F.count(F.lit(1)).over(wb))
        .where(F.col("_bc") == F.col("k"))
    )
    wv = Window.partitionBy("_b").orderBy("_v")
    wt = Window.partitionBy("_b", "_v")
    ranked = complete.select(
        "source",
        "k",
        (
            F.lit(2) * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - F.lit(1)
        ).cast("long").alias("_r2"),
    )
    per = ranked.groupBy("source", "k").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("_r2").cast("long").alias("rank2_sum"),
    )
    tot = per.groupBy().agg(
        F.sum(F.col("rank2_sum") * F.col("rank2_sum")).cast("long").alias("_tot")
    )
    out = per.join(F.broadcast(tot))
    chi2 = (
        (F.lit(3) * F.col("_tot")).cast("double")
        / (
            F.col("n_blocks") * F.col("k") * (F.col("k") + F.lit(1))
        ).cast("double")
        - (F.lit(3) * F.col("n_blocks") * (F.col("k") + F.lit(1))).cast("double")
    )
    return out.select(
        "source",
        "n_blocks",
        F.col("k").cast("long").alias("k"),
        "rank2_sum",
        F.when(F.col("n_blocks") > 0, chi2).alias("chi2"),
    )


def kruskal_wallis_stats(
    df: DataFrame,
    value: str = "value",
    partition: str = "source",
    quantum: int = 1_000_000,
    n_shards: int = 32,
) -> DataFrame:
    """Kruskal-Wallis sufficient statistics across series (Kruskal &
    Wallis, JASA 1952): global average ranks of every observation across
    ALL series, per-series rank sums, and the global tie-cube term — the
    exact integer pieces of ``H = [12/(N(N+1)) * sum_g n_g (Rbar_g -
    (N+1)/2)^2] / [1 - sum(t^3-t)/(N^3-N)]``.  H itself mixes per-group
    divisions (sum of IEEE terms whose order differs cross-engine), so —
    the permutation_patterns discipline — the contract emits the exact
    sufficient statistics plus one division (`mean_rank2 = rank2_sum/n_g`,
    the doubled average rank per series); H assembles driver-side.

    Scale note: global ranks are computed WITHOUT a global sort OR a
    single-partition window — two-pass range-sharded ranking over the
    DISTINCT-value table: (1) equi-depth shard boundaries from an
    approx-quantile sketch (driver holds ≤ n_shards doubles), (2) a
    per-shard running-offset window (parallel across shards), (3) shard
    base offsets = cumulative per-shard totals (n_shards rows collected,
    broadcast back). Ranks are exact integers, so sharding changes the
    plan, never the values — doubled average ranks ``r2_v =
    2*(base_sh + cum_in_shard) + c_v + 1`` join back on the value key.
    Bounds: r2 <= 2N, rank2_sum <= 2*N*n_g, tie_cubes <= N^3 — int64 for
    N to ~10^6 rows per run; at larger N feed a rolled tier (the hourly
    contract feed) or raise the quantum.

    Output: (partition, n_g, rank2_sum, n_total, tie_cubes, mean_rank2).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.round(F.col(value) * quantum).cast("long").alias("_vm"),
    )
    pv = b.groupBy("source", "_vm").agg(F.count(F.lit(1)).alias("_c_sv"))
    tv = pv.groupBy("_vm").agg(F.sum("_c_sv").cast("long").alias("_c_v"))
    # the quantile sketch, the shard-totals collect, AND the final job each
    # consume tv — pin the tiny distinct-value table after ONE evaluation of
    # the raw scan + two aggregations (the eager-localCheckpoint-of-a-tiny-
    # derived-table pattern), instead of re-executing the upstream 3×
    tv = tv.localCheckpoint(eager=True)
    # pass 1: equi-depth boundaries over the distinct-value table (sketch;
    # boundary placement only balances work — every distinct value lands
    # in exactly one shard, so ties never straddle shards)
    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = sorted(set(tv.stat.approxQuantile("_vm", qs, 0.001)))
    shard = F.lit(0)
    for bd in bounds:
        shard = shard + F.when(F.col("_vm") > F.lit(int(bd)), 1).otherwise(0)
    tvs = tv.withColumn("_sh", shard.cast("int"))
    # pass 2a: shard base offsets (|shards| rows — bounded collect)
    totals = {
        r["_sh"]: r["_tot"]
        for r in tvs.groupBy("_sh").agg(F.sum("_c_v").alias("_tot")).collect()
    }
    offs, acc = [], 0
    for s in sorted(totals):
        offs.append((s, acc))
        acc += int(totals[s])
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs or [(0, 0)], "_sh int, _base long")
    # pass 2b: within-shard running offsets, parallel across shards
    wv = (
        Window.partitionBy("_sh").orderBy("_vm").rowsBetween(Window.unboundedPreceding, -1)
    )
    tv2 = tvs.join(F.broadcast(off_df), "_sh").select(
        "_vm",
        "_c_v",
        (
            F.lit(2) * (F.col("_base") + F.coalesce(F.sum("_c_v").over(wv), F.lit(0)))
            + F.col("_c_v")
            + F.lit(1)
        ).cast("long").alias("_r2"),
    )
    joined = pv.join(tv2, "_vm")
    per = joined.groupBy("source").agg(
        F.sum("_c_sv").cast("long").alias("n_g"),
        F.sum(F.col("_c_sv") * F.col("_r2")).cast("long").alias("rank2_sum"),
    )
    glob = tv.groupBy().agg(
        F.sum("_c_v").cast("long").alias("n_total"),
        F.sum(F.col("_c_v") * F.col("_c_v") * F.col("_c_v") - F.col("_c_v"))
        .cast("long")
        .alias("tie_cubes"),
    )
    return per.join(F.broadcast(glob)).select(
        "source",
        "n_g",
        "rank2_sum",
        "n_total",
        "tie_cubes",
        (F.col("rank2_sum").cast("double") / F.col("n_g").cast("double")).alias(
            "mean_rank2"
        ),
    )


def snaive_mase(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
    season: int = 24,
) -> DataFrame:
    """Seasonal-naive MASE and tracking signal per series — the two
    remaining M-competition QoF metrics beside mse/mae/smape/pinball
    (Hyndman & Koehler 2006 "Another look at measures of forecast
    accuracy"; tracking signal after Trigg 1964): with seasonal-naive
    errors ``e_t = v_t - v_{t-season}`` and naive-1 scale terms
    ``d_t = v_t - v_{t-1}``,

    - ``MASE = mean|e| / mean|d| = (sae*(n-1)) / (sad*(n-season))``
    - ``tracking_signal = sum(e)/MAD = (sum_e*(n-season)) / sae``

    Both are single IEEE divisions of exact BIGINT micro-unit sums
    (|e| <= ~2^31 micro, n <= ~10^3 on rolled tiers -> products <=
    ~2^52, also exact as doubles).  Sign of sum_e gives persistent
    over/under-forecast; |TS| > ~4 is the classic re-fit trigger.

    Plan shape: two lag windows + one hash aggregate — one shuffle on
    the series key, codegen throughout.

    Output: (partition, n, sum_e, sae, sad, mase, tracking_signal).
    """
    wo = Window.partitionBy("source").orderBy("_b")
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    ).select(
        "source",
        "_v",
        (F.col("_v") - F.lag("_v", season).over(wo)).alias("_e"),
        (F.col("_v") - F.lag("_v", 1).over(wo)).alias("_d"),
    )
    ag = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_e").cast("long").alias("sum_e"),
        F.sum(F.abs(F.col("_e"))).cast("long").alias("sae"),
        F.sum(F.abs(F.col("_d"))).cast("long").alias("sad"),
    ).where(F.col("n") > F.lit(season))
    return ag.select(
        "source",
        "n",
        "sum_e",
        "sae",
        "sad",
        F.when(
            F.col("sad") > 0,
            (F.col("sae") * (F.col("n") - F.lit(1))).cast("double")
            / (F.col("sad") * (F.col("n") - F.lit(season))).cast("double"),
        ).alias("mase"),
        F.when(
            F.col("sae") > 0,
            (F.col("sum_e") * (F.col("n") - F.lit(season))).cast("double")
            / F.col("sae").cast("double"),
        ).alias("tracking_signal"),
    )


def _paired_loss(
    df: DataFrame,
    value: str,
    partition: str,
    order: str,
    season: int,
) -> DataFrame:
    """Absolute-error loss differential of the two canonical baselines on
    an integer series: persistence ``fc1 = v[t-1]`` vs seasonal-naive
    ``fc2 = v[t-season]``, ``d_t = |e1_t| - |e2_t|`` on the rows where
    BOTH are defined (t > season).  Exact BIGINTs throughout — the shared
    feed of :func:`dm_test` and :func:`wilcoxon_signed_rank`."""
    wo = Window.partitionBy("source").orderBy("_b")
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    ).select(
        "source",
        (F.abs(F.col("_v") - F.lag("_v", 1).over(wo))
         - F.abs(F.col("_v") - F.lag("_v", season).over(wo))).alias("_d"),
    )
    return b.where(F.col("_d").isNotNull())


def dm_test(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: str = "ts",
    season: int = 24,
) -> DataFrame:
    """Diebold-Mariano equal-predictive-accuracy test (Diebold & Mariano,
    JBES 1995) at h=1 between the persistence and seasonal-naive
    baselines, absolute-error loss: with loss differential ``d_t`` and
    the h=1 variance estimator (no autocovariance terms at one step),

        DM = dbar / sqrt(s2_d / n),  s2_d = sum (d - dbar)^2 / (n-1).

    Exact cross-engine form (the von_neumann scaled-deviation recipe):
    ``D_i = n*d_i - S`` are exactly zero-mean BIGINTs with
    ``sum D^2 = n^2*sum(d^2) - n*S^2``, and the statistic collapses to

        DM = S * sqrt(n*(n-1)) / sqrt(sum D^2)

    — one integer product under each sqrt (both correctly rounded), one
    multiply, one divide: bit-exact on exact inputs (the grubbs /
    dickey_fuller chain).  Feed WHOLE-unit tier signals: the int64 bound
    is ``n^3 * d^2 < 2^63`` (hourly monthly tier: 720^3 * 1120^2 ~ 5e14).
    Negative DM = persistence beats seasonal-naive on this series.

    Plan shape: two lag windows + one hash aggregate, one shuffle on the
    series key, codegen throughout.

    Output: (partition, n, sum_d, dd2_sum, dm_stat).
    """
    d = _paired_loss(df, value, partition, order, season)
    ag = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_d").cast("long").alias("sum_d"),
        F.sum(F.col("_d") * F.col("_d")).cast("long").alias("_q"),
    ).where(F.col("n") >= F.lit(2))
    dd2 = (
        F.col("n") * F.col("n") * F.col("_q") - F.col("n") * F.col("sum_d") * F.col("sum_d")
    ).cast("long")
    return ag.select(
        "source",
        "n",
        "sum_d",
        dd2.alias("dd2_sum"),
        F.when(
            dd2 > 0,
            F.col("sum_d").cast("double")
            * F.sqrt((F.col("n") * (F.col("n") - F.lit(1))).cast("double"))
            / F.sqrt(dd2.cast("double")),
        ).alias("dm_stat"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: str = "ts",
    season: int = 24,
) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon, Biometrics 1945) on the same
    paired loss differentials as :func:`dm_test` — the nonparametric
    companion robust to heavy-tailed losses: drop zero differentials,
    rank ``|d|`` with tie-averaged ranks, ``W+ = sum of ranks where
    d > 0``, and the normal approximation with tie correction

        z = (W+ - n(n+1)/4) / sqrt([n(n+1)(2n+1) - sum(t^3 - t)/2] / 24).

    Exact integer form: DOUBLED tie-averaged ranks ``r2 = 2*rank +
    ties - 1`` (the bartels/spearman recipe) make ``w2_plus = 2*W+``
    exact; the tie cube term arrives WITHOUT a second aggregate because
    each row of a tie group of size c contributes ``c^2 - 1``:
    ``sum_rows (c^2 - 1) = sum_groups (c^3 - c)``.  Scaled integers
    ``num4 = 2*w2_plus - n(n+1) = 4*(W+ - mu)`` and ``var48 = 48*sigma^2
    = 2n(n+1)(2n+1) - tie_cubes`` give

        z = num4 * sqrt(3) / sqrt(var48)

    (sqrt(48)/4 = sqrt(3); each factor correctly rounded, fixed order —
    bit-exact).  Bounds: w2_plus <= 2n^2, var48 <= ~4n^3 — int64-trivial
    on rolled tiers.

    Plan shape: two lag windows, a rank window + tie-count window on the
    same series key, one hash aggregate — one shuffle, codegen.

    Output: (partition, n_nz, w2_plus, num4, var48, z_stat).
    """
    d = _paired_loss(df, value, partition, order, season).where(F.col("_d") != 0)
    wv = Window.partitionBy("source").orderBy(F.abs(F.col("_d")))
    wt = Window.partitionBy("source", F.abs(F.col("_d")))
    r = d.select(
        "source",
        "_d",
        (F.lit(2) * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - F.lit(1))
        .cast("long")
        .alias("_r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("_c"),
    )
    ag = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_nz"),
        F.sum(F.when(F.col("_d") > 0, F.col("_r2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.col("_c") * F.col("_c") - F.lit(1)).cast("long").alias("_tc"),
    ).where(F.col("n_nz") >= F.lit(2))
    num4 = (F.lit(2) * F.col("w2_plus") - F.col("n_nz") * (F.col("n_nz") + F.lit(1))).cast("long")
    var48 = (
        F.lit(2) * F.col("n_nz") * (F.col("n_nz") + F.lit(1)) * (F.lit(2) * F.col("n_nz") + F.lit(1))
        - F.col("_tc")
    ).cast("long")
    return ag.select(
        "source",
        "n_nz",
        "w2_plus",
        num4.alias("num4"),
        var48.alias("var48"),
        F.when(
            var48 > 0,
            num4.cast("double") * F.sqrt(F.lit(3).cast("double")) / F.sqrt(var48.cast("double")),
        ).alias("z_stat"),
    )


def pettitt_changepoint(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Pettitt single-changepoint test (Pettitt, JRSS-C 1979): the
    rank-based CUSUM — with tie-averaged within-series ranks ``rbar_i``,

        U_t = 2 * sum_{i<=t} rbar_i - t*(n+1),   K = max_{1<=t<n} |U_t|,

    and the change point is the earliest argmax.  The distribution-free
    complement of :func:`binseg_changepoint`'s SSE split (robust to any
    monotone marginal), and the offline twin of the cusum drift monitor.

    Exact integer form: DOUBLED ranks make ``R2_t = sum 2*rbar`` a BIGINT
    running sum and ``u2_t = R2_t - t*(n+1) = 2*U_t`` exact; K2 = 2K.
    Bounds: |u2| <= n^2 — int64-trivial.  Ties in |u2| break to the
    EARLIEST bucket (deterministic on both engines).

    Plan shape: rank + tie windows over the value order, a running-sum
    window over the time order, and an argmax row_number window — all on
    the one series-key partitioning (Exchange reuse, single shuffle).

    Output: (partition, n, t_star, change_bucket, k2_stat).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    wv = Window.partitionBy("source").orderBy("_v")
    wt = Window.partitionBy("source", "_v")
    wo = Window.partitionBy("source").orderBy("_b")
    r = b.select(
        "source",
        "_b",
        (F.lit(2) * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - F.lit(1))
        .cast("long")
        .alias("_r2"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).cast("long").alias("_n"),
    )
    u = r.select(
        "source",
        "_b",
        "_n",
        F.row_number().over(wo).cast("long").alias("_t"),
        F.sum("_r2").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("_rr2"),
    ).select(
        "source",
        "_b",
        "_n",
        "_t",
        (F.col("_rr2") - F.col("_t") * (F.col("_n") + F.lit(1))).alias("_u2"),
    ).where((F.col("_t") < F.col("_n")) & (F.col("_n") >= F.lit(2)))
    pick = F.row_number().over(
        Window.partitionBy("source").orderBy(F.abs(F.col("_u2")).desc(), F.col("_b").asc())
    )
    return u.withColumn("_pk", pick).where(F.col("_pk") == 1).select(
        "source",
        F.col("_n").alias("n"),
        F.col("_t").alias("t_star"),
        F.col("_b").alias("change_bucket"),
        F.abs(F.col("_u2")).alias("k2_stat"),
    )


def mann_whitney_drift(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum two-sample test (Mann & Whitney,
    AMS 1947) of the first half of each series against the second half —
    the LOCATION-shift drift screen that completes the within-series drift
    triad: KS (any distributional change), Pettitt (rank-CUSUM change
    POINT), Mann-Whitney (directional level shift + effect size).  Also
    emits Cliff's delta (Cliff, Psych. Bull. 1993), the standard
    nonparametric effect size: delta = 2*U1/(n1*n2) - 1 in [-1, 1].

    Exact integer form: DOUBLED tie-averaged ranks ``r2 = 2*rank + ties -
    1`` over the COMBINED sample make ``u2 = 2*U1 = sum(r2 | first half) -
    n1*(n1+1)`` exact; the tie cube term folds into the row aggregate
    (``sum_rows(c^2 - 1) = sum_groups(c^3 - c)``, the wilcoxon recipe).
    With ``num = u2 - n1*n2 = 2*(U1 - mu)``, ``f1 = n1*n2`` and ``f2 =
    (n+1)*n*(n-1) - tie_cubes`` (so Var(U) = f1*f2 / (12*n*(n-1))),

        z = num * sqrt(3*n*(n-1)) / sqrt(f1) / sqrt(f2)

    as a FIXED left-associated chain of correctly-rounded IEEE ops —
    bit-exact cross-engine (the wilcoxon/grubbs recipe).  The factored
    form keeps every integer <= n^3 (int64-safe to n ~ 2*10^6 buckets,
    i.e. two CENTURIES of hourly retention) where the fused product
    f1*f2 ~ n^5 would overflow past n ~ 10^4.  Cliff's delta = num/f1 is
    one correctly-rounded division.

    Plan shape: a time row_number + count window, a rank + tie window on
    the same series key, one hash aggregate — one shuffle, codegen.

    Output: (partition, n1, n2, u2, num_z, f2, z_stat, cliffs_delta).
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    wo = Window.partitionBy("source").orderBy("_b")
    wv = Window.partitionBy("source").orderBy("_v")
    wt = Window.partitionBy("source", "_v")
    r = b.select(
        "source",
        (F.row_number().over(wo).cast("long") <= F.expr("count(1) over (partition by source) div 2"))
        .alias("_g1"),
        (F.lit(2) * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - F.lit(1))
        .cast("long")
        .alias("_r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("_c"),
    )
    ag = r.groupBy("source").agg(
        F.sum(F.col("_g1").cast("long")).cast("long").alias("n1"),
        F.sum((~F.col("_g1")).cast("long")).cast("long").alias("n2"),
        F.sum(F.when(F.col("_g1"), F.col("_r2")).otherwise(F.lit(0))).cast("long").alias("_rs2"),
        F.sum(F.col("_c") * F.col("_c") - F.lit(1)).cast("long").alias("_tc"),
    ).where((F.col("n1") >= F.lit(1)) & (F.col("n2") >= F.lit(1)))
    n = (F.col("n1") + F.col("n2")).cast("long")
    u2 = (F.col("_rs2") - F.col("n1") * (F.col("n1") + F.lit(1))).cast("long")
    f1 = (F.col("n1") * F.col("n2")).cast("long")
    f2 = ((n + F.lit(1)) * n * (n - F.lit(1)) - F.col("_tc")).cast("long")
    num = (u2 - f1).cast("long")
    sq3 = F.sqrt((F.lit(3) * n * (n - F.lit(1))).cast("double"))
    return ag.select(
        "source",
        "n1",
        "n2",
        u2.alias("u2"),
        num.alias("num_z"),
        f2.alias("f2"),
        F.when(
            f2 > 0,
            num.cast("double") * sq3 / F.sqrt(f1.cast("double")) / F.sqrt(f2.cast("double")),
        ).alias("z_stat"),
        (num.cast("double") / f1.cast("double")).alias("cliffs_delta"),
    )


def shesd_outliers(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    order: tuple | None = None,
    rounds: int = 3,
    window: int = 49,
) -> DataFrame:
    """Seasonal-Hybrid ESD anomaly screen (Twitter AnomalyDetection,
    Hochenbaum-Vallis-Kejariwal 2017): run the generalized ESD iteration
    on the RESIDUAL of the robust seasonal decomposition instead of the
    raw series — a daily cycle or trend ramp stops masquerading as (or
    masking) point anomalies, which is exactly the failure mode of
    :func:`gesd_outliers` on seasonal telemetry.

    Composition of two certified pieces: ``seasonal_decompose`` (median
    trend + hour-of-day seasonal fold, residual exact in half-micro
    units) feeds ``gesd_outliers`` on ``floor(resid)`` — unit-floor
    quantization keeps every GESD integer (n·v sums, squared deviations)
    far inside int64 at tier scale (the raw half-micro residuals would
    overflow dev2 = Σ(n·v − Σv)² past 2^63 on long series). The floor is
    cross-engine robust: a nonzero residual fraction is ≥ 1/2e6, nine
    orders above double rounding error, so the boundary can't flip.

    Plan shape: one shuffle on the series key into the decompose kernel,
    one more into the GESD kernel — both tier-bounded Arrow kernels; no
    joins, no windows over raw data. Output = gesd_outliers schema with
    removed_v in floored residual units.
    """
    from forecaster_spark.operators.timeweight import seasonal_decompose

    order = tuple(order) if order is not None else (ts,)
    dec = seasonal_decompose(
        df, value=value, partition=partition, ts=ts, order=order, window=window
    )
    b = dec.select(
        F.col(partition),
        F.col(ts).alias("_sts"),
        F.floor("resid").cast("long").alias("_rv"),
    )
    return gesd_outliers(b, value="_rv", partition=partition, ts="_sts", rounds=rounds)


def segmented_trend(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Piecewise-linear trend with one knot (the Prophet-style segmented
    trend, ruptures BinSeg + per-segment OLS): find the binary-segmentation
    split minimizing within-segment SSE (the :func:`binseg_changepoint`
    cost on the integer series, unit quanta), then fit an EXACT-Cramer OLS
    line per side on the local index x = 0..m−1 — level + slope before and
    after the break, the two-regime complement of the single global trend
    feature (reference P1, modeling/forecasting/arx.py trend spec).

    Exactness: the split cost is the pinned float chain
    ``(ai − bi²/i) + (ar − br²/r)`` of BIGINT→DOUBLE casts (each correctly
    rounded), floored; argmin tie-breaks to the smallest index. Segment
    fits use Python-int normal equations (no int64 overflow at any SF) and
    divide ONCE per coefficient through the HUGEINT→DOUBLE cast mimic
    (oracle/ref.py hugeint_to_double), so slope/intercept match the SQL
    oracle's ``CAST(hugeint AS DOUBLE)`` divisions bit-for-bit; a
    single-point segment emits NULLs (det = 0).

    Plan shape: ONE shuffle on the series key into a per-series Arrow
    kernel (tier-bounded input, the model-kernel contract) — the split
    search and both fits share the same numpy prefix sums; no windows, no
    join-back. Output: (partition, n, split_i, seg, m, slope, intercept),
    two rows per series with n ≥ 2.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("n", T.LongType()),
            T.StructField("split_i", T.LongType()),
            T.StructField("seg", T.StringType()),
            T.StructField("m", T.LongType()),
            T.StructField("slope", T.DoubleType()),
            T.StructField("intercept", T.DoubleType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]
    b = df.select(
        F.col(partition),
        F.col(ts).alias("_ts"),
        F.col(value).cast("long").alias("_v"),
    )

    def _ols(v: np.ndarray) -> tuple[float | None, float | None]:
        m = len(v)
        sx = m * (m - 1) // 2
        sxx = (m - 1) * m * (2 * m - 1) // 6
        sy = int(v.sum())
        sxy = int((np.arange(m, dtype=np.int64) * v).sum())
        det = m * sxx - sx * sx
        if det == 0:
            return None, None
        slope = h2d(m * sxy - sx * sy) / h2d(det)
        intercept = h2d(sxx * sy - sx * sxy) / h2d(det)
        return slope, intercept

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        v = pdf["_v"].to_numpy(dtype=np.int64)
        n = len(v)
        if n < 2:
            return pd.DataFrame([], columns=cols)
        bi = np.cumsum(v)
        ai = np.cumsum(v * v)
        bn, an = bi[-1], ai[-1]
        i = np.arange(1, n, dtype=np.int64)
        bi, ai = bi[:-1], ai[:-1]
        i_d = i.astype(np.float64)
        r_d = (n - i).astype(np.float64)
        cost = (
            ai.astype(np.float64) - bi.astype(np.float64) * bi.astype(np.float64) / i_d
        ) + (
            (an - ai).astype(np.float64)
            - (bn - bi).astype(np.float64) * (bn - bi).astype(np.float64) / r_d
        )
        split = 1 + int(np.argmin(np.floor(cost)))  # first min == smallest i
        src = pdf[partition].iat[0]
        out = []
        for seg, vs in (("left", v[:split]), ("right", v[split:])):
            slope, intercept = _ols(vs)
            out.append((src, n, split, seg, len(vs), slope, intercept))
        return pd.DataFrame(out, columns=cols)

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def var1_pairs(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    hh: int = 3,
) -> DataFrame:
    """Pairwise VAR(1) vector-autoregression forecast (Sims 1980): for
    every unordered series pair (A, B) aligned on the time bucket, fit the
    two-equation system

        a_t = a0 + a1·a_{t-1} + a2·b_{t-1}
        b_t = b0 + b1·a_{t-1} + b2·b_{t-1}

    by exact per-equation OLS (the design matrix is shared, so two 3×3
    Cramer solves over ONE set of normal-equation sums), then roll the
    coupled recursion ``hh`` steps ahead from the last jointly-observed
    point. This is the multivariate companion of the ARX family: where
    :func:`granger_pairs` asks whether B's past helps A, VAR(1) uses the
    full cross-coupling of both pasts to forecast BOTH series — the
    reference's ARX exo machinery (arx.py exo blocks) generalized to a
    joint system.

    Exactness (the granger/pacf recipe, CLAUDE.md): integer tier values →
    exact BIGINT/Python-int normal equations, 3×3 determinants as Python
    ints divided ONCE through the DuckDB HUGEINT→DOUBLE cast mimic,
    singular fallback d3=0 → intercept-only [mean, 0, 0]; the h-step
    recursion is a fixed left-assoc float chain ``(c0 + ah·c1) + bh·c2``
    replayed verbatim by the SQL mirror (models/exact_sql.py
    var1_pairs_sql).

    Plan shape (100-TB lens): one tier self-join on the time bucket
    (|sources|·|buckets| rows, tier-bounded), ONE shuffle on the pair key
    into a per-pair Arrow kernel; each task is one bounded series pair,
    pair count scales the parallelism.

    Output: (sa, sb, n, h, a_hat, b_hat) — hh rows per eligible pair.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField("sa", part_field.dataType),
            T.StructField("sb", part_field.dataType),
            T.StructField("n", T.LongType()),
            T.StructField("h", T.LongType()),
            T.StructField("a_hat", T.DoubleType()),
            T.StructField("b_hat", T.DoubleType()),
        ]
    )
    t = df.select(F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v"))
    a, c = t.alias("a"), t.alias("c")
    pr = a.join(
        c,
        (F.col("a._b") == F.col("c._b")) & (F.col(f"a.{partition}") < F.col(f"c.{partition}")),
    ).select(
        F.col(f"a.{partition}").alias("sa"),
        F.col(f"c.{partition}").alias("sb"),
        F.col("a._b").alias("_b"),
        F.col("a._v").alias("_va"),
        F.col("c._v").alias("_vb"),
    )

    def det3(m):
        (a_, b_, c_), (d_, e_, f_), (g_, h_, i_) = m
        return a_ * (e_ * i_ - f_ * h_) - b_ * (d_ * i_ - f_ * g_) + c_ * (d_ * h_ - e_ * g_)

    def solve3(A, cv, n, s_target):
        d3 = det3(A)
        if d3 == 0:
            return h2d(s_target) / h2d(n), 0.0, 0.0
        num = [
            det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)])
            for j in range(3)
        ]
        return h2d(num[0]) / h2d(d3), h2d(num[1]) / h2d(d3), h2d(num[2]) / h2d(d3)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        av = pdf["_va"].to_numpy()
        bv = pdf["_vb"].to_numpy()
        ay, by_, a1, b1 = av[1:], bv[1:], av[:-1], bv[:-1]
        n = len(ay)
        cols = [f.name for f in out_schema.fields]
        if n < 4:
            return pd.DataFrame(columns=cols)
        sa1, sb1 = int(a1.sum()), int(b1.sum())
        saa = int(np.dot(a1, a1))
        sab = int(np.dot(a1, b1))
        sbb = int(np.dot(b1, b1))
        A = [[n, sa1, sb1], [sa1, saa, sab], [sb1, sab, sbb]]
        sya, tya_a, tya_b = int(ay.sum()), int(np.dot(ay, a1)), int(np.dot(ay, b1))
        syb, tyb_a, tyb_b = int(by_.sum()), int(np.dot(by_, a1)), int(np.dot(by_, b1))
        ca0, ca1, ca2 = solve3(A, [sya, tya_a, tya_b], n, sya)
        cb0, cb1, cb2 = solve3(A, [syb, tyb_a, tyb_b], n, syb)
        xh, yh = float(av[-1]), float(bv[-1])
        rows = []
        for h in range(1, hh + 1):
            xh, yh = (ca0 + xh * ca1) + yh * ca2, (cb0 + xh * cb1) + yh * cb2
            rows.append((pdf["sa"].iloc[0], pdf["sb"].iloc[0], n, h, xh, yh))
        return pd.DataFrame(rows, columns=cols)

    return pr.groupBy("sa", "sb").applyInPandas(kernel, out_schema)


def markov_transitions(
    df: DataFrame,
    value: str = "value",
    partition: str = "event_type",
    ts: str = "ts",
    tie_break: str = "event_id",
    lo: float = 25.0,
    hi: float = 75.0,
) -> DataFrame:
    """First-order Markov transition matrix per source over the value
    terciles (low < ``lo`` ≤ mid < ``hi`` ≤ high — the same state map as
    the time-in-state report): counts of consecutive state transitions in
    event order, with the row-conditional transition probability
    ``p = n / n_from``. The sequence-dynamics summary the pointwise
    stats battery lacks — persistence sits on the diagonal, oscillation
    off it, and the empirical matrix feeds any downstream chain analysis.

    Exactness: counts are exact BIGINTs off one lag window (with the
    (ts, tie_break) ordering discipline); ``p`` is ONE IEEE division.
    Plan: one shuffle for the per-source lag window, one hash aggregate,
    the row totals as a window over the ≤ 9-row-per-source result —
    no second scan. Output: (source, from_state, to_state, n, n_from, p).
    """
    st = (
        F.when(F.col(value) < lo, "low").when(F.col(value) < hi, "mid").otherwise("high")
    )
    w = Window.partitionBy("source").orderBy(ts, tie_break)
    t = (
        df.select(F.col(partition).alias("source"), F.col(ts), F.col(tie_break), st.alias("state"))
        .withColumn("from_state", F.lag("state", 1).over(w))
        .where(F.col("from_state").isNotNull())
    )
    ag = t.groupBy("source", "from_state", F.col("state").alias("to_state")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wt = Window.partitionBy("source", "from_state")
    return ag.withColumn("n_from", F.sum("n").over(wt).cast("long")).select(
        "source",
        "from_state",
        "to_state",
        "n",
        "n_from",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
    )


def arch1_vol_forecast(
    df: DataFrame,
    value: str = "v",
    partition: str = "source",
    order: str = "ts",
) -> DataFrame:
    """ARCH(1) conditional-variance forecast per series (Engle 1982 — the
    volatility MODEL beside :func:`arch_lm`'s volatility TEST): regress
    squared persistence residuals u_t = (v_t − v_{t−1})² on [1, u_{t−1}]
    by exact 2×2 Cramer, then forecast the next-step conditional variance
    σ²_{T+1} = a0 + a1·u_T. Nothing else in the engine emits a variance
    band that widens after a shock; this is the missing heteroskedastic
    companion of the conformal/OLS interval operators.

    Exactness: the caller feeds an INTEGER-quantized signal whose scale
    bounds every normal-equation product inside int64 — with |v| ≤ V:
    u ≤ 4V², and the largest term sy·szz ≤ (n·4V²)·(n·16V⁴) must stay
    < 2^63 (the hourly contract feed uses floor(mean/8), V ≤ 42, n ≤ 10³:
    ≤ 2·10^17, ≥ 45× headroom; ANSI-safe). Every emitted float is ONE
    division of BIGINT-exact numerators: a0 = num0/det, a1 = num1/det,
    and σ²_{T+1} = (num0 + u_T·num1)/det — the predict chain folded into
    a single ratio so no cross-engine addition order exists. det = 0
    (constant u) degrades to the intercept-only fit a0 = Σu/n, a1 = 0.

    Plan shape: two lag windows + one hash aggregate riding the series
    key — one shuffle, all codegen, no kernel.

    Output: (partition, n, u_last, a0, a1, sigma2_next)."""
    b = df.select(
        F.col(partition).alias("_p"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    w = Window.partitionBy("_p").orderBy("_b")
    u = (
        b.withColumn("_dy", F.col("_v") - F.lag("_v", 1).over(w))
        .where(F.col("_dy").isNotNull())
        .select("_p", "_b", (F.col("_dy") * F.col("_dy")).alias("_u"))
    )
    uz = u.withColumn("_z", F.lag("_u", 1).over(w)).where(F.col("_z").isNotNull())
    ag = uz.groupBy("_p").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_z").alias("sz"),
        F.sum("_u").alias("sy"),
        F.sum(F.col("_z") * F.col("_z")).alias("szz"),
        F.sum(F.col("_u") * F.col("_z")).alias("syz"),
        F.max_by("_u", "_b").alias("u_last"),
    )
    det = F.col("n") * F.col("szz") - F.col("sz") * F.col("sz")
    num1 = F.col("n") * F.col("syz") - F.col("sz") * F.col("sy")
    num0 = F.col("sy") * F.col("szz") - F.col("sz") * F.col("syz")
    mean_u = F.col("sy").cast("double") / F.col("n").cast("double")
    return ag.select(
        F.col("_p").alias(partition),
        "n",
        "u_last",
        F.when(det == 0, mean_u)
        .otherwise(num0.cast("double") / det.cast("double"))
        .alias("a0"),
        F.when(det == 0, F.lit(0.0))
        .otherwise(num1.cast("double") / det.cast("double"))
        .alias("a1"),
        F.when(det == 0, mean_u)
        .otherwise(
            (num0 + F.col("u_last") * num1).cast("double") / det.cast("double")
        )
        .alias("sigma2_next"),
    )


def mbb_mean_ci(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
    w: int = 24,
    B: int = 200,
    seed: int = 11,
) -> DataFrame:
    """Moving-block-bootstrap confidence interval for the per-series mean
    (Künsch 1989; percentile bootstrap at 95%) — the uncertainty number a
    rollup report should print next to every tier mean, which no point
    statistic in the engine provides. Dependence-aware: blocks of ``w``
    consecutive points preserve the autocorrelation an iid bootstrap
    destroys.

    DETERMINISTIC resampling: replicate r's block j starts at
    ``splitmix64((2·seed+1)·(r·2^20 + j)) mod (n−w+1)`` — the repo's
    order-invariant splitmix discipline, replayed bit-for-bit by the SQL
    oracle (no RNG state, no partition dependence). Replicates concatenate
    k = ceil(n/w) blocks trimmed to n points (the last block contributes
    n−(k−1)·w values).

    Exactness: block sums are differences of integer prefix sums; replicate
    totals are exact int64 (micro-unit values × tier-bounded n stay ≪ 2^53,
    so each emitted mean is ONE exactly-representable-integer division).
    Bounds are ORDER STATISTICS of the replicate totals (sorted by
    (total, r) — total order equals mean order since n is fixed), picked at
    ranks max(1, ⌊25·(B+1)/1000⌋) and B+1−that (the (B+1)-convention
    percentile bootstrap). Sources with n ≤ w emit nothing (no valid block
    start).

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel (tier-bounded series; B·k ≈ 6.4k resample indices per source as
    vectorized numpy gathers).

    Output: (partition, n, n_boot, total, mean, lo_total, hi_total,
    mean_lo, mean_hi)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.functions import xhash

    mult = np.uint64(2 * seed + 1)
    cols = [
        "n", "n_boot", "total", "mean", "lo_total", "hi_total", "mean_lo", "mean_hi",
    ]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b")
        v = pdf["_v"].to_numpy(np.int64)
        n = len(v)
        if n <= w:
            return pd.DataFrame(columns=["_p", *cols])
        pre = np.concatenate(([0], np.cumsum(v)))
        k = -(-n // w)
        r = np.repeat(np.arange(B, dtype=np.uint64), k)
        j = np.tile(np.arange(k, dtype=np.uint64), B)
        h = xhash.splitmix64((r * np.uint64(1 << 20) + j) * mult)
        s = (h % np.uint64(n - w + 1)).astype(np.int64)
        L = np.where(j.astype(np.int64) == k - 1, n - (k - 1) * w, w)
        T = (pre[s + L] - pre[s]).reshape(B, k).sum(axis=1)
        ordT = np.lexsort((np.arange(B), T))  # (total, r) ascending
        lo_rank = max(1, (25 * (B + 1)) // 1000)
        hi_rank = B + 1 - lo_rank
        lo_t = int(T[ordT[lo_rank - 1]])
        hi_t = int(T[ordT[hi_rank - 1]])
        tot = int(pre[n])
        return pd.DataFrame(
            [
                (
                    pdf["_p"].iat[0], n, B, tot, float(tot) / float(n),
                    lo_t, hi_t, float(lo_t) / float(n), float(hi_t) / float(n),
                )
            ],
            columns=["_p", *cols],
        )

    b = df.select(
        F.col(partition).alias("_p"),
        F.col(order).alias("_b"),
        F.col(value).cast("long").alias("_v"),
    )
    out = b.groupBy("_p").applyInPandas(
        kernel,
        schema=(
            "_p string, n long, n_boot long, total long, mean double, "
            "lo_total long, hi_total long, mean_lo double, mean_hi double"
        ),
    )
    return out.withColumnRenamed("_p", partition)
