"""Technical-indicator operators: Bollinger bands, Cutler RSI, run-length
statistics, and pairwise series distances.

Classic sliding-window signal diagnostics (public formulas: Bollinger 1983;
Cutler's SMA RSI variant of Wilder 1978; run tests from basic
nonparametric statistics).  The reference Forecaster computes rolling
means/variances inside its QoF and scaler paths (reference
forecaster.py rollValidate, modeling/scalers); these operators expose the
same rolling first/second moments as standalone per-row signals with
engine-exact integer arithmetic.

Exactness discipline (CLAUDE.md): every comparison that mixes a mean and a
standard deviation is CROSS-MULTIPLIED into pure integer form —
``(n·v − Σv)² vs k²·(n·Σv² − (Σv)²)`` — so no sqrt or division ever
happens before a boolean; emitted continuous columns are single IEEE
divisions of exact BIGINTs (bit-identical cross-engine).  Quanta are
chosen so every product stays far under 2^63 (ANSI-safe): centi-units for
raw-event windows (|v| ≤ ~10^5 centi ⇒ n·Σv² ≤ 10^13 at n=24), micro-units
only where no squared-sum appears.

Plan shape: every operator is one shuffle on ``source`` + Catalyst window
frames (whole-stage codegen, no Python).  At 10^12-sequence scale these run
over rolled tiers (bounded rows/series); the raw-event variants document
their window caps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bollinger(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
    window: int = 24,
    k: int = 2,
) -> DataFrame:
    """Bollinger band position per row: is the point above/below
    mean ± k·stddev of the trailing ``window`` rows (population σ,
    current row included — the standard band definition).

    Integer form: with centi-units v, n = rows in frame, S = Σv,
    Q = Σv², the breakout test ``|v − S/n| > k·σ`` cross-multiplies to
    ``(n·v − S)² > k²·(n·Q − S²)`` — exact BIGINTs end to end.  Emitted
    ``mean`` is the single division S/(100·n).

    Output: input columns + ``mean`` (double) + ``above``/``below``
    (boolean breakout flags) + ``n_in_frame``.
    """
    wf = (
        Window.partitionBy(partition)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(window - 1), 0)
    )
    vc = F.round(F.col(value) * 100).cast("long")
    b = (
        df.withColumn("_vc", vc)
        .withColumn("_s", F.sum("_vc").over(wf))
        .withColumn("_q", F.sum(F.col("_vc") * F.col("_vc")).over(wf))
        .withColumn("_n", F.count("_vc").over(wf))
    )
    dev = F.col("_n") * F.col("_vc") - F.col("_s")  # n·v − S
    var_n2 = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")  # n²·σ²
    kk = F.lit(int(k * k))
    return (
        b.withColumn("mean", F.col("_s") / (F.col("_n") * 100.0))
        .withColumn("above", (dev > 0) & (dev * dev > kk * var_n2))
        .withColumn("below", (dev < 0) & (dev * dev > kk * var_n2))
        .withColumn("n_in_frame", F.col("_n"))
        .drop("_vc", "_s", "_q", "_n")
    )


def rsi_cutler(
    df: DataFrame,
    value_micro: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
    window: int = 14,
) -> DataFrame:
    """Cutler's RSI (the SMA variant of Wilder's relative strength index —
    chosen over Wilder's EMA form because simple sums of integer deltas
    are engine-exact, no smoothing recurrence).  Over the trailing
    ``window`` deltas: G = Σ max(Δ,0), L = Σ max(−Δ,0),
    ``rsi_ppm = (10^6·G) div (G+L)`` (floor — integer on both engines);
    NULL until a full window of deltas exists or when G+L = 0 (flat
    series).

    Input is a rolled tier with an exact BIGINT ``value_micro`` signal.
    Bound: 10^6·G ≤ 10^6·window·2·max|v| — ~10^16 for micro-unit event
    means at window 14, ANSI-safe.

    Output: (partition, order, rsi_ppm bigint, rsi double = ppm/10^4).
    """
    wo = Window.partitionBy(partition).orderBy(order)
    wf = wo.rowsBetween(-(window - 1), 0)
    d = F.col(value_micro) - F.lag(value_micro, 1).over(wo)
    # CASE (not greatest) so a NULL head delta contributes 0 on BOTH
    # engines — Spark's greatest skips NULLs, DuckDB's semantics shifted
    # across releases; the explicit conditional is version-proof
    gain = F.when(F.col("_d") > 0, F.col("_d")).otherwise(F.lit(0))
    loss = F.when(F.col("_d") < 0, -F.col("_d")).otherwise(F.lit(0))
    b = (
        df.withColumn("_d", d)
        .withColumn("_g", F.sum(gain).over(wf))
        .withColumn("_l", F.sum(loss).over(wf))
        .withColumn("_nd", F.count("_d").over(wf))
    )
    gl = F.col("_g") + F.col("_l")
    # integer floor division, expressed with `div` so both engines floor
    b = b.withColumn(
        "rsi_ppm",
        F.when(
            (F.col("_nd") == window) & (gl > 0),
            F.expr("(1000000 * _g) div (_g + _l)"),
        ).cast("long"),
    )
    return (
        b.withColumn("rsi", F.col("rsi_ppm") / 10_000.0)
        .drop("_d", "_g", "_l", "_nd")
    )


def longest_runs(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
) -> DataFrame:
    """Longest strictly-increasing run per series (gaps-and-islands):
    the nonparametric trend/randomness diagnostic — an i.i.d. series has
    short runs; a trending or periodic one has long ones.

    Construction: a ``break`` flag where v_t ≤ v_{t−1} (micro-units, exact),
    a running sum of breaks assigns each row a run id, then two
    aggregations give per-run lengths and the per-series maximum.  Pure
    Catalyst (window + 2 hash aggregates), one shuffle on ``partition``.

    Output: (partition, max_run, n_runs, n_rows) — BIGINTs.  Ties in the
    raw order column are broken by the ``order`` tuple (CLAUDE.md
    invariant).
    """
    wo = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    vm = F.round(F.col(value) * 1_000_000).cast("long")
    b = df.withColumn("_vm", vm)
    prev = F.lag("_vm", 1).over(wo)
    brk = F.when(prev.isNull() | (F.col("_vm") <= prev), 1).otherwise(0)
    b = b.withColumn("_run", F.sum(brk).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    runs = b.groupBy(partition, "_run").agg(F.count(F.lit(1)).alias("_len"))
    return runs.groupBy(partition).agg(
        F.max("_len").alias("max_run"),
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("_len").alias("n_rows"),
    )


def series_distance_pairs(
    buckets: DataFrame,
    value_centi: str = "v_centi",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Exact squared Euclidean distance between every pair of series on
    their SHARED bucket grid — the series-similarity join (which sources
    co-move?).  Inner-join on the bucket timestamp keeps only co-observed
    points; distances are BIGINT sums of centi-unit squared diffs
    (≤ ~10^13 for month-long hourly tiers — ANSI-safe).

    Plan: self-equi-join on the bucket column (sort-merge or broadcast
    per AQE), one hash aggregate on the (a,b) pair.  The number of SERIES
    pairs is the output size — run over sources, not raw keys; for
    10^5+ sources prefilter with SAX/fingerprint buckets first.

    Output: (source_a, source_b, sq_dist, n_shared) with source_a <
    source_b.
    """
    left = buckets.select(
        F.col(partition).alias("source_a"), F.col(order).alias("_b"), F.col(value_centi).alias("_va")
    )
    right = buckets.select(
        F.col(partition).alias("source_b"), F.col(order).alias("_b"), F.col(value_centi).alias("_vb")
    )
    j = left.join(right, "_b").where(F.col("source_a") < F.col("source_b"))
    d = F.col("_va") - F.col("_vb")
    return (
        j.groupBy("source_a", "source_b")
        .agg(F.sum(d * d).alias("sq_dist"), F.count(F.lit(1)).alias("n_shared"))
    )


def max_drawdown(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
    quantum: int = 1_000_000,
) -> DataFrame:
    """Maximum drawdown per series: the largest peak-to-trough drop of the
    running maximum — the classic worst-case-decline diagnostic (paired
    with Bollinger/RSI it completes the technical-indicator family; the
    reference's QoF never looks at path-dependent loss).

    Exact integers end to end: micro-unit values, running peak via a
    rows-frame max (unboundedPreceding..currentRow — the DESC-window
    lesson does not apply, a running MAX forward frame is the cheap
    direction), drawdown = peak − v, one hash aggregate for the max.
    ``max_dd`` is the single division by 1e6.

    Output: (partition, n_rows, max_dd_micro, max_dd).  The peak/trough
    ROW is deliberately not emitted: the maximal drawdown can tie at
    several rows and any argmax pick would be nondeterministic vs the
    oracle (the min_by-tie lesson).
    """
    w = (
        Window.partitionBy(partition)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vm = F.round(F.col(value) * quantum).cast("long")
    b = df.select(
        F.col(partition).alias("source"),
        vm.alias("_vm"),
        F.max(vm).over(w).alias("_peak"),
    ).select("source", "_peak", (F.col("_peak") - F.col("_vm")).alias("_dd"))
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("_dd").alias("max_dd_micro"),
        (F.max("_dd").cast("double") / F.lit(1000000.0)).alias("max_dd"),
    )


def peak_detect(
    df: DataFrame,
    window_n: int = 12,
    prominence_milli: int = 20_000,
    value: str = "y",
    partition: str = "source",
    order=("ts", "event_id"),
) -> DataFrame:
    """Windowed local-extrema (peak) detection with a prominence floor —
    the event-extraction primitive (scipy.signal.find_peaks' window+
    prominence core) the reference's forecast-only pipeline lacks: a point
    is a peak iff it strictly exceeds every value in the ``window_n``
    points before it, is >= every value after (plateaus flag their FIRST
    point only, deterministically), and rises at least ``prominence_milli``
    above the lower of the two windowed base minima.

    Exact milli-unit integers end to end; edge points compare against an
    empty side via coalesce(·, LONG_MIN/vq), so series boundaries can
    still produce peaks (standard find_peaks edge behavior). Three rolling
    min/max over ONE window partitioning — single shuffle, pure codegen.

    Output: input + (prominence_milli_out, is_peak)."""
    vq = F.round(F.col(value) * 1000).cast("long")
    cols = [F.col(c) for c in order]
    wl = Window.partitionBy(partition).orderBy(*cols).rowsBetween(-window_n, -1)
    wr = Window.partitionBy(partition).orderBy(*cols).rowsBetween(1, window_n)
    neg_inf = F.lit(-(1 << 62)).cast("long")
    b = (
        df.withColumn("_vq", vq)
        .withColumn("_lmax", F.coalesce(F.max(vq).over(wl), neg_inf))
        .withColumn("_rmax", F.coalesce(F.max(vq).over(wr), neg_inf))
        .withColumn("_lmin", F.coalesce(F.min(vq).over(wl), vq))
        .withColumn("_rmin", F.coalesce(F.min(vq).over(wr), vq))
    )
    prom = F.col("_vq") - F.least(F.col("_lmin"), F.col("_rmin"))
    return (
        b.withColumn("prominence_milli_out", prom)
        .withColumn(
            "is_peak",
            (F.col("_vq") > F.col("_lmax"))
            & (F.col("_vq") >= F.col("_rmax"))
            & (prom >= F.lit(int(prominence_milli))),
        )
        .drop("_vq", "_lmax", "_rmax", "_lmin", "_rmin")
    )


def dtw_distance_pairs(
    buckets: DataFrame,
    value: str = "v_unit",
    partition: str = "source",
    order: str = "bucket_start",
) -> DataFrame:
    """Dynamic-time-warping distance between every pair of series
    (Sakoe-Chiba 1978, full window; |·| local cost) — elastic similarity
    that matches shapes under phase shift/speed variation, where the
    lock-step :func:`series_distance_pairs` penalizes any misalignment.
    The standard row recurrence ``dp[i][j] = c_ij + min(dp[i−1][j],
    dp[i−1][j−1], dp[i][j−1])`` is reshaped into its prefix-scan form —
    with ``m_j = min(prev_j, prev_{j−1})`` and ``S_j = Σ_{l≤j} c_il``:
    ``dp[i][j] = S_j + min_{k≤j}(m_k − S_{k−1})`` — so each row is one
    vectorized cumsum + pairwise min + running min (numpy), and the SQL
    mirror replays the IDENTICAL row walk as a recursive CTE whose step
    is one window chain (no per-cell recursion). All-integer on the
    unit-quantized tier: costs ≤ 2·max|v|, the total path ≤
    (n_a+n_b)·2·max|v| — exact BIGINTs at any SF.

    Plan shape: one collect_list per series on the tier shuffle (720
    longs/series at sf0.1), a self-join of the tiny per-source array
    table (series-count² pair rows — run over SOURCES; prefilter pairs
    via SAX/fingerprint blocking when sources ≥ 10^4), then an Arrow
    kernel does the O(n·m) DP per pair. Output: (source_a, source_b,
    n_a, n_b, dtw, dtw_norm = dtw/(n_a+n_b) one IEEE division).
    """
    from pyspark.sql import types as T

    sv = buckets.groupBy(F.col(partition).alias("s")).agg(
        F.expr(f"transform(array_sort(collect_list(struct({order} AS o, CAST({value} AS BIGINT) AS v))), x -> x.v)").alias("vs"),
    )
    a = sv.select(F.col("s").alias("source_a"), F.col("vs").alias("_va"))
    b = sv.select(F.col("s").alias("source_b"), F.col("vs").alias("_vb"))
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))

    @F.pandas_udf(T.LongType())
    def dtw_udf(va_s: pd.Series, vb_s: pd.Series) -> pd.Series:
        out = np.empty(len(va_s), dtype=np.int64)
        INF = 1 << 60
        for r, (va, vb) in enumerate(zip(va_s, vb_s)):
            av = np.asarray(va, dtype=np.int64)
            bv = np.asarray(vb, dtype=np.int64)
            prev = np.cumsum(np.abs(av[0] - bv))
            for i in range(1, len(av)):
                c = np.abs(av[i] - bv)
                s = np.cumsum(c)
                m = np.minimum(prev, np.concatenate(([INF], prev[:-1])))
                pm = np.minimum.accumulate(m - (s - c))
                prev = s + pm
            out[r] = int(prev[-1])
        return pd.Series(out)

    return pairs.select(
        "source_a",
        "source_b",
        F.size("_va").cast("long").alias("n_a"),
        F.size("_vb").cast("long").alias("n_b"),
        dtw_udf("_va", "_vb").alias("dtw"),
    ).withColumn(
        "dtw_norm",
        F.col("dtw").cast("double") / (F.col("n_a") + F.col("n_b")).cast("double"),
    )
