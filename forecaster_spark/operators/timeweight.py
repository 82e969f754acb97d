"""Time-weighted aggregates over irregular series — the TimescaleDB
``time_weight`` / ``counter_agg`` analogues (the reference has no notion of
irregular sampling; the north rule's tiered engine needs both).

- :func:`time_weighted_avg`: per (source, bucket) trapezoidal mean —
  irregular gaps weight their neighboring observations by duration, unlike
  the plain rollup mean which over-counts burst periods. Single-point (or
  zero-span) buckets fall back to the plain micro-exact mean.
- :func:`counter_delta`: PromQL ``increase``-style reset-corrected total
  rise of a monotonic counter: a drop is a reset, contributing the
  post-reset value instead of a negative delta.

Both are pure window+agg expressions (one shuffle on source, integer
micro-unit sums → bit-reproducible cross-engine and order-independent
under any partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def time_weighted_avg(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    order=("ts", "event_id"),
    bucket_unit: str = "hour",
) -> DataFrame:
    """Trapezoidal time-weighted average per (source, time bucket):
    ``Σ (v_i + v_{i+1})·Δt_i / (2·span)`` over consecutive in-bucket pairs
    (no cross-bucket interpolation). Values quantize to micro-units so the
    pair sums are exact integers (order-free); the final division chain is
    fixed-order, making the result bit-reproducible in SQL.

    Output: (source, bucket_start, twa, n_points, span_ms). Time is
    millisecond-integer (event times carry microseconds; µs pair terms could
    overflow int64 within an hour bucket, ms terms cannot)."""
    w = Window.partitionBy(partition, "bucket_start").orderBy(*[F.col(c) for c in order])
    vq = F.round(F.col(value) * MICRO).cast("long")
    tsec = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / 1000).cast("long")
    b = df.withColumn("bucket_start", F.date_trunc(bucket_unit, F.col(ts)))
    b = (
        b.withColumn("_vq", vq)
        .withColumn("_t", tsec)
        .withColumn("_pv", F.lag("_vq").over(w))
        .withColumn("_pt", F.lag("_t").over(w))
    )
    term = F.when(
        F.col("_pv").isNotNull(), (F.col("_pv") + F.col("_vq")) * (F.col("_t") - F.col("_pt"))
    ).otherwise(F.lit(0).cast("long"))
    g = b.groupBy(partition, "bucket_start").agg(
        F.sum(term).alias("_num"),
        (F.max("_t") - F.min("_t")).alias("span_ms"),
        F.sum("_vq").alias("_sv"),
        F.count(F.lit(1)).alias("n_points"),
    )
    twa = F.when(
        F.col("span_ms") > 0,
        F.col("_num") / MICRO / 2.0 / F.col("span_ms"),
    ).otherwise(F.col("_sv") / MICRO / F.col("n_points"))
    return g.select(
        partition, "bucket_start", twa.alias("twa"), "n_points", "span_ms"
    )


def counter_delta(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order=("ts", "event_id"),
) -> DataFrame:
    """Reset-corrected total increase of a per-source monotonic counter
    (PromQL ``increase`` / TimescaleDB ``counter_agg`` delta): each step
    contributes ``v_i − v_{i−1}`` when non-negative, else ``v_i`` (the
    counter reset and re-accumulated). Micro-exact integer sums.

    Output: (source, increase, n_resets, n_points)."""
    w = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    vq = F.round(F.col(value) * MICRO).cast("long")
    b = df.withColumn("_vq", vq).withColumn("_pv", F.lag("_vq").over(w))
    step = F.when(F.col("_pv").isNull(), F.lit(0).cast("long")).otherwise(
        F.when(F.col("_vq") >= F.col("_pv"), F.col("_vq") - F.col("_pv")).otherwise(
            F.col("_vq")
        )
    )
    reset = F.when(
        F.col("_pv").isNotNull() & (F.col("_vq") < F.col("_pv")), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        b.groupBy(partition)
        .agg(
            (F.sum(step) / MICRO).alias("increase"),
            F.sum(reset).cast("long").alias("n_resets"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )


def linear_deriv(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    bucket_unit: str = "hour",
    predict_ahead_s: int = 1800,
) -> DataFrame:
    """Per-(source, bucket) least-squares slope of value over time (PromQL
    ``deriv``) plus the linear extrapolation ``predict_ahead_s`` past the
    bucket start (PromQL ``predict_linear``).

    All moments are exact integers: time in SECONDS relative to the bucket
    start (≤ 3600), values in MILLI-units — each per-row product then fits
    int64 for |value| ≤ ~7e5 units (same per-row bound discipline as
    rolling_zscore), and the SUMS + cross moments accumulate in
    DECIMAL(38,0): exact to ~10^38 (the same domain as the oracle's
    HUGEINT), so an adversarially dense bucket can NEVER silently wrap —
    int64 sums would (n·Σtv ≥ 2^63 at ~4M dense rows/bucket); decimal
    overflow surfaces as NULL/error instead. The slope and prediction
    divide once each in a fixed left-to-right chain, so SQL replays them
    bit-for-bit (moments beyond 2^64 would differ from DuckDB's quirky
    HUGEINT→DOUBLE cast by 1 ulp — 11 orders of magnitude past any real
    density). Zero time-variance buckets (n=1, or all events in one
    second) get slope 0 and predict the mean.

    Output: (source, bucket_start, n_points, deriv, predicted)."""
    MILLI = 1_000
    DEC = "decimal(38,0)"
    vq = F.round(F.col(value) * MILLI).cast("long")
    b = df.withColumn("bucket_start", F.date_trunc(bucket_unit, F.col(ts)))
    trel = (
        F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col("bucket_start"))
    ).cast("long")
    g = (
        b.withColumn("_v", vq)
        .withColumn("_t", trel)
        .groupBy(partition, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_t").cast(DEC)).alias("st"),
            F.sum(F.col("_v").cast(DEC)).alias("sv"),
            F.sum((F.col("_t") * F.col("_t")).cast(DEC)).alias("stt"),
            F.sum((F.col("_t") * F.col("_v")).cast(DEC)).alias("stv"),
        )
    )
    nd = F.col("n").cast(DEC)
    num = (nd * F.col("stv") - F.col("st") * F.col("sv")).cast("double")
    den = (nd * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    slope = F.when(den != 0, num / den).otherwise(F.lit(0.0))  # milli-units/sec
    t_pred = predict_ahead_s
    pred_m = (
        F.col("sv").cast("double")
        + F.col("_slope") * (nd * F.lit(t_pred) - F.col("st")).cast("double")
    ) / F.col("n").cast("double")
    return (
        g.withColumn("_slope", slope)
        .select(
            partition,
            "bucket_start",
            F.col("n").alias("n_points"),
            (F.col("_slope") / MILLI).alias("deriv"),
            (pred_m / MILLI).alias("predicted"),
        )
    )


def ewma(
    df: DataFrame,
    alpha: float,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
) -> DataFrame:
    """Exponentially weighted moving average per source:
    ``e_t = y_t·α + e_{t-1}·(1−α)``, seeded with ``e_0 = y_0``. Sequential by
    nature → per-source Arrow kernel with a fixed-order float chain (each
    step ``(y·α) + (e·(1−α))``), which a row-stepping recursive-CTE oracle
    replays bit-for-bit. Like the model kernels, feed it rolled tiers
    (bounded rows per source), never raw hot series.

    The chain loop stays PLAIN PYTHON deliberately: any numpy scan
    (log-space prefix products, blocked linear recurrence e_t = c_t+d_t·e_0)
    reassociates the float chain and breaks bit-parity with the SQL oracle,
    and the measured alternatives are no faster anyway — the loop runs at
    ~14.5M elems/s (Python float ops ARE IEEE doubles) vs ~9.7M for
    ``itertools.accumulate`` with a lambda. A 1M-point tier costs ~70 ms;
    on tier-bounded inputs this is never the bottleneck.
    Output: input columns + ``ewma``."""
    import pandas as pd
    from pyspark.sql import types as T

    beta = 1.0 - alpha
    # build a NEW StructType — StructType.add mutates in place, and df.schema
    # is cached on the DataFrame, so .add would poison df's own column list
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("ewma", T.DoubleType())])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        y = pdf[value].tolist()
        e = []
        prev = None
        for v in y:
            prev = v if prev is None else v * alpha + prev * beta
            e.append(prev)
        pdf["ewma"] = e
        return pdf

    return df.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def rolling_zscore(
    df: DataFrame,
    window_n: int,
    value: str = "y",
    partition: str = "source",
    order=("ts", "event_id"),
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over the trailing ``window_n``
    observations (inclusive): ``z = (n·y − Σy) / sqrt(n·Σy² − (Σy)²)``
    — the population-std z-score with every sum exact-integer (micro-unit
    quantization), so the scores are order-independent AND bit-reproducible
    in SQL window frames. Zero-variance windows score 0. Pure window
    expressions — no Python, one shuffle on source.

    Quantization is MILLI-unit: with micro units the windowed Σv² would
    exceed int64 (5e8² · 50 rows ≈ 1.2e19) and Spark's non-ANSI longs wrap
    silently where DuckDB's HUGEINTs don't. Even at milli units, n·Σv² must
    stay under 2⁶³ — bounded by window_n²·max(v·1000)² — so windows are
    capped at 4096 (safe for |v| ≤ ~700k); larger windows need a coarser
    quantum.

    Skew note: the window partitions by ``source`` alone, so one giant raw
    source serializes into a single sort task — same caveat as plain LOCF;
    at hot-source scale run it over rolled tiers (bounded rows/source) or
    decompose into blocks with windowed carry like
    ``gapfill.fill_bucket_gaps_blocked`` (the trailing sums are associative
    scans).

    Output: input columns + ``z`` + ``is_anomaly``."""
    if window_n > 4096:
        raise ValueError("rolling_zscore window capped at 4096 (int64 sum bound)")
    w = (
        Window.partitionBy(partition)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(window_n - 1), 0)
    )
    vq = F.round(F.col(value) * 1000).cast("long")
    b = df.withColumn("_vq", vq)
    n = F.count("_vq").over(w)
    s1 = F.sum("_vq").over(w)
    s2 = F.sum(F.col("_vq") * F.col("_vq")).over(w)
    num = (F.col("_vq") * n - s1).cast("double")
    var_n2 = (n * s2 - s1 * s1).cast("double")
    z = F.when(var_n2 > 0, num / F.sqrt(var_n2)).otherwise(F.lit(0.0))
    return (
        b.withColumn("z", z)
        .withColumn("is_anomaly", F.abs(F.col("z")) > threshold)
        .drop("_vq")
    )


def holt_linear(
    df: DataFrame,
    alpha: float,
    beta: float,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per source —
    the natural next step from :func:`ewma` and the classic trend-aware
    forecasting baseline (reference analogue: the trend term of
    ``ARX.rescale`` trend specs, see modeling/forecasting/arx.py):

    - ``l_t = y_t·α + (l_{t−1} + b_{t−1})·(1−α)``, seeded ``l_0 = y_0``
    - ``b_t = (l_t − l_{t−1})·β + b_{t−1}·(1−β)``, seeded ``b_0 = 0``
    - one-step forecast ``fc1 = l_t + b_t``

    Sequential by nature → same design as :func:`ewma`: per-source Arrow
    kernel with fixed-order float chains; every expression is written in the
    exact shape the recursive-CTE oracle repeats (including recomputing
    ``l_t`` inside the ``b_t`` update — identical IEEE expression, identical
    bits), so the contract check is bit-exact. Tier-bounded inputs only.

    Output: input columns + ``level``, ``trend``, ``fc1``."""
    import pandas as pd
    from pyspark.sql import types as T

    a1, b1 = 1.0 - alpha, 1.0 - beta
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("fc1", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        ys = pdf[value].tolist()
        ls, bs, fs = [], [], []
        l = b = None
        for y in ys:
            if l is None:
                l, b = y, 0.0
            else:
                ln = y * alpha + (l + b) * a1
                b = (ln - l) * beta + b * b1
                l = ln
            ls.append(l)
            bs.append(b)
            fs.append(l + b)
        pdf["level"], pdf["trend"], pdf["fc1"] = ls, bs, fs
        return pdf

    return df.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def holt_damped(
    df: DataFrame,
    alpha: float,
    beta: float,
    phi: float,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
) -> DataFrame:
    """Damped-trend Holt smoothing per source (Gardner & McKenzie 1985) —
    the M-competition workhorse that fixes plain Holt's chronic
    over-extrapolation by geometrically damping the trend with φ∈(0,1):

    - ``l_t = y_t·α + (l_{t−1} + φ·b_{t−1})·(1−α)``, seeded ``l_0 = y_0``
    - ``b_t = (l_t − l_{t−1})·β + b_{t−1}·φ·(1−β)``, seeded ``b_0 = 0``
    - one-step forecast ``fc1 = l_t + φ·b_t``
      (h-step heads toward ``l + b·φ(1−φ^h)/(1−φ)``, a finite asymptote)

    Same contract discipline as :func:`holt_linear`: per-source Arrow
    kernel, fixed-order IEEE chains repeated verbatim by the
    recursive-CTE oracle, and — the CLAUDE.md smoothing-chain rule — every
    coefficient (α, 1−α, β, φ·(1−β), φ) passed as a BINARY-EXACT literal
    on both engines (e.g. α=0.25, β=0.5, φ=0.875 → φ(1−β)=0.4375), never
    derived arithmetic that could differ by an ulp.  Tier-bounded inputs.

    Output: input columns + ``level``, ``trend``, ``fc1``."""
    import pandas as pd
    from pyspark.sql import types as T

    a1, pb1 = 1.0 - alpha, phi * (1.0 - beta)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("fc1", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        ys = pdf[value].tolist()
        ls, bs, fs = [], [], []
        l = b = None
        for y in ys:
            if l is None:
                l, b = y, 0.0
            else:
                ln = y * alpha + (l + b * phi) * a1
                b = (ln - l) * beta + b * pb1
                l = ln
            ls.append(l)
            bs.append(b)
            fs.append(l + b * phi)
        pdf["level"], pdf["trend"], pdf["fc1"] = ls, bs, fs
        return pdf

    return df.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def time_in_state(
    df: DataFrame,
    state: str = "state",
    partition: str = "source",
    ts: str = "ts",
    order=("ts", "event_id"),
) -> DataFrame:
    """Time-in-state aggregation (TimescaleDB ``state_agg`` analogue): each
    observation's state holds until the next observation of the same source;
    per (source, state) report total held duration, number of entries
    (transitions into the state, first observation counts), and point count.
    The last observation of a source holds for 0 ms (no closing edge — same
    convention as ``state_agg`` without an interpolated boundary).

    Pure window+agg, integer millisecond durations (``epoch_us // 1000``,
    the proven cross-engine construct) → exact BIGINT sums, one shuffle.

    Output: (source, state, dur_ms, n_entries, n_points)."""
    w = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    tms = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / 1000).cast("long")
    b = (
        df.withColumn("_t", tms)
        .withColumn("_nt", F.lead("_t").over(w))
        .withColumn("_ps", F.lag(state).over(w))
    )
    dur = F.coalesce(F.col("_nt") - F.col("_t"), F.lit(0).cast("long"))
    entered = F.when(
        F.col("_ps").isNull() | (F.col("_ps") != F.col(state)), F.lit(1)
    ).otherwise(F.lit(0))
    return b.groupBy(partition, state).agg(
        F.sum(dur).alias("dur_ms"),
        F.sum(entered).cast("long").alias("n_entries"),
        F.count(F.lit(1)).alias("n_points"),
    )


def heartbeat_agg(
    df: DataFrame,
    threshold_ms: int,
    partition: str = "source",
    ts: str = "ts",
    order=("ts", "event_id"),
) -> DataFrame:
    """Liveness from heartbeats (TimescaleDB ``heartbeat_agg`` analogue):
    each observation asserts the source live for ``threshold_ms``; a gap to
    the next observation beyond that is dead time. Per source report live /
    dead ms, the largest gap, the number of dead gaps, and heartbeat count —
    the uptime primitive over the raw event stream.

    Convention: the final heartbeat contributes no live time (span-bounded,
    like ``state_agg`` above) so ``live_ms + dead_ms = span_ms`` exactly.
    Integer-ms window+agg only — exact cross-engine, one shuffle.

    Output: (source, n_heartbeats, live_ms, dead_ms, max_gap_ms,
    n_dead_gaps)."""
    w = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    tms = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / 1000).cast("long")
    b = df.withColumn("_t", tms).withColumn("_nt", F.lead("_t").over(w))
    gap = F.col("_nt") - F.col("_t")
    thr = F.lit(int(threshold_ms)).cast("long")
    zero = F.lit(0).cast("long")
    live = F.when(gap.isNull(), zero).otherwise(F.least(gap, thr))
    dead = F.when(gap.isNull(), zero).otherwise(F.greatest(gap - thr, zero))
    return b.groupBy(partition).agg(
        F.count(F.lit(1)).alias("n_heartbeats"),
        F.sum(live).alias("live_ms"),
        F.sum(dead).alias("dead_ms"),
        F.coalesce(F.max(gap), zero).alias("max_gap_ms"),
        F.sum(F.when(gap > thr, 1).otherwise(0)).cast("long").alias("n_dead_gaps"),
    )


def ohlc(
    df: DataFrame,
    value: str = "y",
    bucket_unit: str = "hour",
    partition: str = "source",
    ts: str = "ts",
    tie_break: bool = True,
) -> DataFrame:
    """OHLC / candlestick aggregate (TimescaleDB ``candlestick_agg``
    analogue): per (source, bucket) the first (open) and last (close)
    observation by ``ts``, the min/max (low/high), and the point count.

    open/close are pure selections — no arithmetic — so the result is exact
    on any engine; one aggregate shuffle, no window sort. Same tie
    convention as ``rollup.rollup_raw``: ``tie_break=True`` is
    deterministic under duplicate ts (lexicographic (ts, value) struct
    min/max — forces SortAggregate); ``tie_break=False`` is the
    primitive-buffer ``min_by``/``max_by`` HashAggregate fast path, correct
    when ts is unique within (source, bucket).

    Output: (source, bucket_start, open, high, low, close, n)."""
    if tie_break:
        first = F.min(
            F.struct(F.col(ts).alias("t"), F.col(value).alias("v"))
        ).getField("v").alias("open")
        last = F.max(
            F.struct(F.col(ts).alias("t"), F.col(value).alias("v"))
        ).getField("v").alias("close")
    else:
        first = F.min_by(value, ts).alias("open")
        last = F.max_by(value, ts).alias("close")
    return (
        df.withColumn("_b", F.date_trunc(bucket_unit, F.col(ts)))
        .groupBy(partition, F.col("_b").alias("bucket_start"))
        .agg(
            first,
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            last,
            F.count(F.lit(1)).alias("n"),
        )
    )


def cusum(
    df: DataFrame,
    slack_milli: int,
    threshold_milli: int,
    value: str = "y",
    partition: str = "source",
    order=("ts", "event_id"),
) -> DataFrame:
    """Two-sided CUSUM change detection per source, exact integer
    arithmetic end to end (milli-unit quantization):

    - target ``mu`` = per-source truncating integer mean of the quantized
      signal (``sum div n`` — equals floor for the nonnegative signals this
      targets; documented requirement),
    - ``s+_t = max(0, s+_{t-1} + (x_t - mu - k))`` and the mirrored ``s-``,
      with slack ``k`` and alarm threshold ``h`` in milli-units.

    The max(0, ·) reset recurrence is NOT computed sequentially: with
    ``c_t = cumsum(d)``, ``s_t = c_t - min(0, min_{j<=t} c_j)`` — so both
    sides are one cumulative-sum window plus one running-min window, pure
    Catalyst codegen, no Python. Overflow bound: |d| * rows-per-source must
    stay under 2^63 (milli-unit devs ~2^20 leave room for ~2^42 rows/source).

    Output: input + (s_pos, s_neg, is_change)."""
    vq = F.round(F.col(value) * 1000).cast("long")
    mu_tbl = (
        df.groupBy(partition)
        .agg(F.sum(vq).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .withColumn("_mu", F.expr("_s div _n"))
        .select(partition, "_mu")
    )
    w = (
        Window.partitionBy(partition)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    k = F.lit(int(slack_milli)).cast("long")
    h = F.lit(int(threshold_milli)).cast("long")
    zero = F.lit(0).cast("long")
    b = (
        df.join(F.broadcast(mu_tbl), partition)
        .withColumn("_dp", vq - F.col("_mu") - k)
        .withColumn("_dn", F.col("_mu") - vq - k)
        .withColumn("_cp", F.sum("_dp").over(w))
        .withColumn("_cn", F.sum("_dn").over(w))
        .withColumn("s_pos", F.col("_cp") - F.least(zero, F.min("_cp").over(w)))
        .withColumn("s_neg", F.col("_cn") - F.least(zero, F.min("_cn").over(w)))
    )
    return b.withColumn(
        "is_change", (F.col("s_pos") > h) | (F.col("s_neg") > h)
    ).drop("_mu", "_dp", "_dn", "_cp", "_cn")


def seasonal_profile(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Seasonal (hour-of-day) profile per source — the seasonal-naive
    baseline fold: exact micro-unit sums per (source, hour-of-day) phase and
    the truncating integer mean (``div`` — floor on the nonnegative signals
    this targets). Map-side-combinable single hash aggregate over at most
    24·|sources| cells.

    Output: (source, hod, n, sum_micro, mean_micro)."""
    vq = F.round(F.col(value) * 1_000_000).cast("long")
    return (
        df.groupBy(partition, F.hour(F.col(ts)).cast("long").alias("hod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(vq).alias("sum_micro"))
        .withColumn("mean_micro", F.expr("sum_micro div n"))
    )


def mad_anomaly(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    k_milli: int = 3000,
) -> DataFrame:
    """Robust (median/MAD) anomaly detection per series — the outlier
    filter that survives the contamination a rolling z-score doesn't:
    median and MAD have a 50% breakdown point, so a burst of bad points
    can't drag the threshold with it (mean/std-based scores mask exactly
    the anomalies they should flag).

    Exactness: values quantize to micro-units; medians are computed in
    DOUBLED units so the even-count interpolation (mean of two middles)
    stays integer-valued — ``(2a+2b)/2 = a+b`` exactly — and Spark's
    sort-based ``percentile`` matches DuckDB's ``quantile_cont`` bit-equal
    (same (n−1)·p rule, proven by the quantiles contract query). The flag
    compares ``1000·dev ≥/> k_milli·MAD`` in quadrupled-micro integers
    (both sides < 2⁵³, exact in doubles), so verdicts are deterministic
    cross-engine; zero-MAD series (≥50% identical values) flag any
    deviation, the standard degenerate MAD behavior.

    Plan shape: two whole-partition window aggregates over one hash
    partitioning — a single shuffle on ``partition``, no Python. Skew
    caveat as for LOCF: one giant source serializes into one task; at
    hot-source scale run it over rolled tiers (bounded rows/source).

    Output: input columns + ``med``, ``mad`` (doubles, original units) +
    ``is_anomaly``."""
    w = Window.partitionBy(partition)
    v2 = (F.round(F.col(value) * 1_000_000).cast("long") * 2).alias("_v2")
    b = df.withColumn("_v2", v2)
    b = b.withColumn("_m2", F.percentile("_v2", 0.5).over(w))
    dev2 = F.abs(F.col("_v2") - F.col("_m2")).cast("long")
    b = b.withColumn("_dev2", dev2)
    b = b.withColumn("_mad4", F.percentile(F.col("_dev2") * 2, 0.5).over(w))
    return (
        b.withColumn("med", F.col("_m2") / 2_000_000.0)
        .withColumn("mad", F.col("_mad4") / 4_000_000.0)
        .withColumn(
            "is_anomaly",
            (F.col("_dev2") * 2000).cast("double") > F.lit(float(k_milli)) * F.col("_mad4"),
        )
        .drop("_v2", "_m2", "_dev2", "_mad4")
    )


def rolling_median(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
    window: int = 7,
) -> DataFrame:
    """Trailing rolling median — the robust sliding smoother (a rolling
    mean follows a single spike; the median of the last ``window`` points
    ignores it until spikes are half the frame). Pairs with
    :func:`mad_anomaly`: that one is whole-series robust location, this is
    the local robust level for drifting series.

    Exactness: medians in DOUBLED micro-units so the even-count
    interpolation stays integer-valued (head frames have < ``window``
    rows, so frame parity varies row to row); Spark ``percentile`` over a
    rows frame ≡ DuckDB windowed ``quantile_cont`` bit-equal.

    Plan shape: one shuffle on ``partition``; the frame percentile is
    re-evaluated per row (O(window·log window) each) — fine for the small
    odometer-style frames this is for (7..101); for giant frames use the
    rollup tiers instead. Skew caveat as for LOCF.

    Output: input columns + ``med_roll`` (double, original units)."""
    wf = (
        Window.partitionBy(partition)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(window - 1), 0)
    )
    v2 = (F.round(F.col(value) * 1_000_000).cast("long") * 2).alias("_v2")
    return (
        df.withColumn("_v2", v2)
        .withColumn("med_roll", F.percentile("_v2", 0.5).over(wf) / 2_000_000.0)
        .drop("_v2")
    )


def acf(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
    max_lag: int = 5,
) -> DataFrame:
    """Integer-centered autocorrelation function per series, lags
    ``1..max_lag`` — the model-selection primitive behind the reference's
    Yule-Walker AR fit (autocovariances ARE the Yule-Walker inputs,
    cf. reference ar_yw.py:88-94 building rho from y): pick p where the
    ACF cuts off, feed the same sums to the AR solver.

    Estimator (documented, engine-exact): values quantize to centi-units;
    the series is centered by the TRUNCATING integer mean (within one
    centi-unit of the exact mean — immaterial for correlation structure,
    exact cross-engine); ``gamma_k = Σ_{t>k} dev_t·dev_{t-k}`` as exact
    BIGINTs (unnormalized — both engines hash the same integer);
    ``rho_k = gamma_k / gamma_0`` is a single IEEE division of two exact
    integers, bit-identical cross-engine while ``n·max_dev² < 2^53``
    (~5·10^5 rows/series at the events table's value range; beyond that,
    roll the tiers first — ACF of 20M raw points isn't a statistic you
    want anyway).

    Plan shape: one shuffle on ``partition`` into a per-series Arrow kernel
    — the lag products are int64 numpy dot products of shifted deviation
    views (exact: no BLAS path for ints) and the truncating mean replays
    Spark ``div`` explicitly (numpy ``//`` floors, so sign-trunc by hand).
    The earlier all-JVM shape (per-row lag-struct array + explode + hash
    agg + g0 join-back) re-sorted the partition in the window pass and
    evaluated 6 lag windows per row: 1.25 s at sf0.1 vs 0.47 s for the
    kernel, bit-identical (same input-scale crossover as
    :func:`seasonal_decompose` — A/B at the operator's real feed).

    Output: (partition, lag, gamma, rho, n_used)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("lag", T.LongType()),
            T.StructField("gamma", T.LongType()),
            T.StructField("rho", T.DoubleType()),
            T.StructField("n_used", T.LongType()),
        ]
    )
    b = df.select(
        F.col(partition),
        *[F.col(c) for c in order],
        F.round(F.col(value) * 100).cast("long").alias("_vc"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        vc = pdf["_vc"].to_numpy()
        n = len(vc)
        s = int(vc.sum())
        m = abs(s) // n * (1 if s >= 0 else -1)  # Spark div truncates to zero
        dev = vc - m
        g0 = int(np.dot(dev, dev))
        rows = []
        for k in range(1, max_lag + 1):
            if n <= k:
                break
            gk = int(np.dot(dev[k:], dev[:-k]))
            # 0/0 → NaN like Spark's non-ANSI double division, never raises
            rows.append(
                (pdf[partition].iat[0], k, gk, float(np.float64(gk) / np.float64(g0)), n - k)
            )
        return pd.DataFrame(rows, columns=[partition, "lag", "gamma", "rho", "n_used"])

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def _pacf_kernel(it):
    """Arrow kernel over the tiny per-source gamma rows: exact Python-int
    Toeplitz determinants (Yule-Walker Cramer, lags 1..3) + the DuckDB
    HUGEINT->DOUBLE cast mimic so the final division is bit-identical to
    the SQL oracle. One row in, <=3 rows out — no driver collect, scales
    with the number of sources."""
    import pandas as pd

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    def ratio(num: int, den: int):
        if den == 0:
            return None
        return h2d(num) / h2d(den)

    for pdf in it:
        out = []
        for r in pdf.itertuples(index=False):
            g0, g1, g2, g3 = int(r.g0), int(r.g1), int(r.g2), int(r.g3)
            out.append((r.source, 1, g1, ratio(g1, g0), int(r.n1)))
            num2 = g0 * g2 - g1 * g1
            den2 = g0 * g0 - g1 * g1
            out.append((r.source, 2, g2, ratio(num2, den2), int(r.n2)))
            num3 = (
                g0 * (g0 * g3 - g2 * g1)
                - g1 * (g1 * g3 - g2 * g2)
                + g1 * (g1 * g1 - g0 * g2)
            )
            den3 = (
                g0 * (g0 * g0 - g1 * g1)
                - g1 * (g1 * g0 - g1 * g2)
                + g2 * (g1 * g1 - g0 * g2)
            )
            out.append((r.source, 3, g3, ratio(num3, den3), int(r.n3)))
        yield pd.DataFrame(
            out, columns=["source", "lag", "gamma", "pacf", "n_used"]
        )


def pacf(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
) -> DataFrame:
    """Yule-Walker partial autocorrelation function per series, lags 1..3
    — the AR-order selection primitive paired with :func:`acf` (reference
    ar_yw.py solves exactly these Toeplitz systems; PACF(k) is the last
    coefficient of the order-k solve, statsmodels ``pacf_yw`` semantics).

    Estimator (documented, engine-exact): values quantize to DECI-units
    (coarser than acf's centi — the lag-3 determinant is a degree-3
    polynomial in the autocovariances, and deci keeps it inside DuckDB's
    HUGEINT: gamma <= n*maxdev^2 ~ 2^39 at sf0.1, so |det| < 6*2^117 <
    2^127; the bound is pinned by a pytest); the series is centered by the
    truncating integer mean; gamma_k are exact BIGINT sums of deviation
    products; PACF(k) = det(R_k with last column := r) / det(R_k) by
    Cramer on the k-by-k Toeplitz autocovariance matrix, both determinants
    exact Python ints, divided once through the HUGEINT->DOUBLE cast mimic
    (oracle/ref.py hugeint_to_double) so the double matches the SQL oracle
    bit-for-bit. Unnormalized gammas are fine: scaling every entry by c
    scales BOTH determinants by c^k, so the ratio is invariant.

    Plan shape: one shuffle on ``partition`` into a per-series Arrow kernel
    computing the exact int64 gamma dot products (same kernelization and
    the same measured crossover as :func:`acf` — the window-lag + hash-agg
    form paid a per-row window evaluation), then the existing O(1)-per-row
    Toeplitz kernel. Output: (source, lag, gamma, pacf, n_used)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    b = df.select(
        F.col(partition),
        *[F.col(c) for c in order],
        F.round(F.col(value) * 10).cast("long").alias("_vc"),
    )
    g_schema = T.StructType(
        [df.select(F.col(partition)).schema.fields[0]]
        + [
            T.StructField(c, T.LongType())
            for c in ("g0", "g1", "n1", "g2", "n2", "g3", "n3")
        ]
    )

    def gammas(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        vc = pdf["_vc"].to_numpy()
        n = len(vc)
        s = int(vc.sum())
        m = abs(s) // n * (1 if s >= 0 else -1)  # Spark div truncates to zero
        dev = vc - m
        row = [pdf[partition].iat[0], int(np.dot(dev, dev))]
        for k in (1, 2, 3):
            gk = int(np.dot(dev[k:], dev[:-k])) if n > k else 0
            row += [gk, max(n - k, 0)]
        return pd.DataFrame(
            [row], columns=[partition, "g0", "g1", "n1", "g2", "n2", "g3", "n3"]
        )

    g = b.groupBy(partition).applyInPandas(gammas, schema=g_schema)
    return g.mapInPandas(
        _pacf_kernel,
        schema="source string, lag long, gamma long, pacf double, n_used long",
    ).select("source", "lag", "gamma", "pacf", "n_used")


def dominant_period(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts",),
    min_lag: int = 2,
    max_lag: int = 48,
) -> DataFrame:
    """Seasonality detection: the lag in ``min_lag..max_lag`` with the
    largest autocovariance per series — the order-selection step the
    reference leaves to the analyst before fixing its seasonal/AR spec
    (reference ar_yw.py consumes a chosen p; seasonal configs hard-code
    the period).  Feed the hourly tier and a daily cycle surfaces as
    period=24; the engine then wires that period into seasonal-naive /
    Holt-Winters / seasonal-profile without a human in the loop.

    Estimator (documented, engine-exact): the integer-valued rolled
    signal is centered by the truncating integer mean (replaying Spark
    ``div``); ``gamma_k = sum_{t>k} dev_t * dev_{t-k}`` are exact BIGINTs;
    the winner is argmax gamma with the SMALLEST-lag tie-break, an integer
    comparison both engines settle identically; ``rho = gamma / gamma_0``
    is one IEEE division of exact ints (< 2^53 on the tiers: 720 rows x
    dev^2 <= ~2.5e5 -> ~2e8).  min_lag=2 skips the trivial lag-1
    autocorrelation every smooth series has.

    Plan shape (100-TB lens): ONE shuffle on the series key into a
    per-series Arrow kernel; the lag sweep is max_lag int64 numpy dot
    products over shifted views of a tier-bounded array (the acf kernel's
    measured shape — 6 JVM lag windows lost 2.7x to it at sf0.1, and the
    sweep here is 8x wider).  Output: one row per series.

    (partition, period, gamma, rho, g0, n)
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("period", T.LongType()),
            T.StructField("gamma", T.LongType()),
            T.StructField("rho", T.DoubleType()),
            T.StructField("g0", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    b = df.select(
        F.col(partition),
        *[F.col(c) for c in order],
        F.col(value).cast("long").alias("_vi"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        vi = pdf["_vi"].to_numpy()
        n = len(vi)
        if n <= min_lag:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        s = int(vi.sum())
        m = abs(s) // n * (1 if s >= 0 else -1)  # Spark div truncates to zero
        dev = vi - m
        g0 = int(np.dot(dev, dev))
        best_lag, best_g = -1, None
        for k in range(min_lag, min(max_lag, n - 1) + 1):
            gk = int(np.dot(dev[k:], dev[:-k]))
            if best_g is None or gk > best_g:  # strict: smallest lag wins ties
                best_lag, best_g = k, gk
        rho = float(np.float64(best_g) / np.float64(g0)) if g0 else float("nan")
        return pd.DataFrame(
            [(pdf[partition].iat[0], best_lag, best_g, rho, g0, n)],
            columns=[f.name for f in out_schema.fields],
        )

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def ccf(
    df: DataFrame,
    x_source: str,
    y_source: str,
    partition: str = "source",
    ts: str = "ts",
    value: str = "y",
    bucket: str = "minute",
    max_lag: int = 3,
) -> DataFrame:
    """Cross-correlation function between two series at lags
    ``-max_lag..max_lag`` — the exogenous-variable selection primitive for
    the reference's ARX family (which exo, at which lag, drives the endo?
    cf. reference arx.py exo lag columns): ``r(k) ~ corr(x_t, y_{t-k})``,
    so a peak at k>0 means y LEADS x by k buckets.

    Both series are first rolled to the shared ``bucket`` grid with
    truncating-integer centi-unit means and inner-joined on the bucket
    (only co-observed buckets enter — a documented estimator choice that
    keeps the pair count identical cross-engine), then centered by the
    truncating integer mean over the joined grid. ``gxy_k =
    sum(devx_t * devy_{t-k})`` are exact BIGINTs; ``r = gxy /
    sqrt(double(gx0) * double(gy0))`` is three correctly-rounded IEEE ops
    in a fixed order, bit-identical cross-engine while the integer sums
    stay < 2^53 (bucket grid <= ~2^20 rows x centi-dev^2 <= 2^33 — roll
    to a coarser tier first beyond that, which is also the statistically
    sane move).

    Plan shape: two hash aggregates (one per source filter pushed into
    the scan), a bucket equi-join, then ONE single-partition window over
    the joined GRID — bounded by the tier's bucket count (minutes of the
    retention window), not raw rows; at 100-TB scale the grid after a 1m
    tier is ~5*10^5 rows/year. Output: (lag, gxy, r, n_used)."""
    vc = F.round(F.col(value) * 100).cast("long")
    b = df.select(
        F.col(partition).alias("_s"), F.date_trunc(bucket, F.col(ts)).alias("_b"), vc.alias("_vc")
    )

    def grid(src):
        return (
            b.where(F.col("_s") == src)
            .groupBy("_b")
            .agg((F.sum("_vc").cast("long")).alias("_sum"), F.count(F.lit(1)).alias("_n"))
            .select("_b", F.expr("_sum div _n").alias("_m"))
        )

    j = (
        grid(x_source)
        .withColumnRenamed("_m", "_xm")
        .join(grid(y_source).withColumnRenamed("_m", "_ym"), "_b")
    )
    w = Window.orderBy("_b")
    j = j.select(
        "_b",
        (F.col("_xm") - F.expr("sum(_xm) over () div count(_xm) over ()")).alias("_dx"),
        (F.col("_ym") - F.expr("sum(_ym) over () div count(_ym) over ()")).alias("_dy"),
    )
    lags = list(range(-max_lag, max_lag + 1))
    prods = j.select(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    (
                        F.col("_dx")
                        * (F.lag("_dy", k).over(w) if k >= 0 else F.lead("_dy", -k).over(w))
                    ).alias("p"),
                )
                for k in lags
            ]
        ).alias("_ps"),
        (F.col("_dx") * F.col("_dx")).alias("_dx2"),
        (F.col("_dy") * F.col("_dy")).alias("_dy2"),
    )
    tot = prods.select(
        F.sum("_dx2").alias("gx0"), F.sum("_dy2").alias("gy0")
    )
    g = (
        prods.select(F.explode("_ps").alias("kp"))
        .where(F.col("kp.p").isNotNull())
        .groupBy(F.col("kp.lag").alias("lag"))
        .agg(F.sum("kp.p").alias("gxy"), F.count(F.lit(1)).alias("n_used"))
    )
    # total over the lag spine: a grid shorter than max_lag must still emit
    # every lag row (gxy/r NULL, n_used 0) — the SQL mirror's UNION of
    # per-lag selects is total by construction, and at tiny SF the joined
    # grid genuinely is that short
    # broadcast the aggregated RIGHT side: a LeftOuter BroadcastHashJoin can
    # only build-right, so a hint on the left spine would be silently dropped
    spine = df.sparkSession.createDataFrame([(k,) for k in lags], "lag int")
    g = spine.join(F.broadcast(g), "lag", "left")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "gxy",
            (
                F.col("gxy").cast("double")
                / F.sqrt(F.col("gx0").cast("double") * F.col("gy0").cast("double"))
            ).alias("r"),
            F.coalesce("n_used", F.lit(0)).cast("long").alias("n_used"),
        )
        .orderBy("lag")
    )


def trimmed_mean(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    tie_break: str = "event_id",
    trim_pct: int = 5,
) -> DataFrame:
    """Rank-based trimmed mean per series — the robust location estimate
    completing the MAD/median family (a mean the tail can't drag: drop
    the lowest and highest ``ceil(trim_pct% * n)`` observations by exact
    rank, average the rest). Unlike winsorizing against interpolated
    percentile BOUNDS (fractional, float-sum drift), rank trimming keeps
    every retained value an exact integer: micro-unit sum, truncating
    integer mean, ONE final /1e6 — bit-reproducible cross-engine.

    Rank = row_number over (value, tie_break) — fully deterministic under
    ties. Plan: one shuffle on ``partition``, one window pass, one hash
    aggregate. Output: (partition, n, n_kept, trimmed_mean)."""
    m = 1_000_000
    vm = F.round(F.col(value) * m).cast("long")
    w = Window.partitionBy(partition).orderBy(F.col("_vm"), F.col(tie_break))
    b = df.select(F.col(partition), vm.alias("_vm"), F.col(tie_break)).withColumn(
        "_rk", F.row_number().over(w)
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(partition)))
    k = F.expr(f"({trim_pct} * _n + 99) div 100")
    kept = b.where((F.col("_rk") > k) & (F.col("_rk") <= F.col("_n") - k))
    return kept.groupBy(partition).agg(
        F.max("_n").alias("n"),
        F.count(F.lit(1)).alias("n_kept"),
        (F.expr("sum(_vm) div count(_vm)") / F.lit(float(m))).alias("trimmed_mean"),
    )


def seasonal_decompose(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    order: tuple = ("ts", "event_id"),
    window: int = 49,
) -> DataFrame:
    """Classical per-series decomposition ``y = trend + seasonal + resid``
    (statsmodels ``seasonal_decompose`` analogue, robust variant): trend =
    trailing rolling MEDIAN over ``window`` points (spike-proof, cf.
    :func:`rolling_median`), seasonal = hour-of-day mean of the detrended
    series (the :func:`seasonal_profile` fold), resid = the exact
    remainder — reconstruction is bit-exact BY CONSTRUCTION, pinned in
    pytest.

    Exactness: everything is computed in DOUBLED micro-units so the
    even-frame median interpolation stays integer-valued; the seasonal
    mean uses an explicit floor-division ``(s - ((s % n + n) % n)) div n``
    because the detrended values can be negative and Spark ``div``
    (truncates toward zero) would disagree with a floor there; three
    final /2e6 divisions per row return original units.

    Plan shape: ONE shuffle on ``partition`` into a per-series Arrow
    kernel that does the whole decomposition — sliding median via numpy's
    ``sliding_window_view`` + a vectorized column-median, hour-of-day fold
    via exact int64 ``np.add.at`` bins, floor-division seasonal means
    (numpy ``//`` IS floor, so the JVM's explicit floor-mod trick isn't
    needed). The previous all-JVM shape paid 1.65 s at sf0.1 in the
    percentile window alone (Spark re-evaluates the percentile buffer per
    row, single-threaded per source partition); the kernel computes the
    identical medians in 0.67 s and the hour fold rides along for free
    (same-window A/B; bit-identical output, pinned in pytest + the driver
    oracle). Bin sums are int64: |d2| ≤ 2e9 supports ~4.6e9 rows per
    (source, hour) cell — far past the tier bound; hour-of-day is
    computed JVM-side (codegen) so the kernel never parses timestamps.
    The per-source serialization bound is the same tier-bounded-input
    contract as the model kernels (the JVM window partitioned by source
    too). Output: (partition, *order, y, trend, seasonal, resid)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    m2 = 2_000_000.0
    b = df.select(
        F.col(partition),
        *[F.col(c) for c in order],
        F.col(value).alias("_y"),
        (F.round(F.col(value) * 1_000_000).cast("long") * 2).alias("_y2"),
        F.hour(F.col(ts)).cast("long").alias("_hod"),
    )
    in_f = {f.name: f for f in b.schema.fields}
    out_schema = T.StructType(
        [in_f[partition]]
        + [in_f[c] for c in order]
        + [
            T.StructField(value, df.schema[value].dataType),
            T.StructField("trend", T.DoubleType()),
            T.StructField("seasonal", T.DoubleType()),
            T.StructField("resid", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        y2 = pdf["_y2"].to_numpy()
        n = len(y2)
        med = np.empty(n, np.int64)
        if n >= window:
            sw = np.lib.stride_tricks.sliding_window_view(y2, window)
            # even frame of doubled units → (a+b)/2 is an exact integer
            # double; truncating cast == the JVM's cast("long")
            med[window - 1 :] = np.median(sw, axis=1).astype(np.int64)
        for i in range(min(window - 1, n)):  # partial leading frames
            med[i] = int(np.median(y2[: i + 1]))
        d2 = y2 - med
        hod = pdf["_hod"].to_numpy()
        s = np.zeros(24, np.int64)
        np.add.at(s, hod, d2)  # exact int64 cell sums
        cnt = np.bincount(hod, minlength=24)
        s2 = s // np.maximum(cnt, 1)  # floor division, exact on negatives
        seas = s2[hod]
        out = pdf[[partition, *order]].copy()
        out[value] = pdf["_y"]
        out["trend"] = med / m2
        out["seasonal"] = seas / m2
        out["resid"] = (d2 - seas) / m2
        return out

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def croston(
    df: DataFrame,
    alpha: float = 0.25,
    partition: str = "source",
    minute: str = "m",
    demand: str = "d",
) -> DataFrame:
    """Croston's method for INTERMITTENT demand — the forecasting family
    member the smooth-series models (EWMA/Holt/ARX) mishandle: series
    that are zero most periods (idle token sources, sparse purchases).
    Input is the COMPRESSED form — one row per nonzero-demand period
    ``(partition, m, d)`` with ``m`` the integer period index and ``d``
    the exact integer demand; zero periods are implicit (they only widen
    the intervals), so the 10^12-scale zero grid is never materialized.

    Chain (Croston 1972): two coupled exponential smoothers stepped only
    at demand points — size ``z' = d·α + z·(1−α)`` and inter-demand
    interval ``q' = i·α + q·(1−α)`` with ``i = m_t − m_{t−1}``; seeds
    ``z = d_1, q = 1`` (documented choice). Demand rate = ``z/q`` per
    period. ``α`` defaults to 0.25 because 1−α must be EXACT in binary
    (``1.0 − 0.2`` ≠ the literal ``0.8`` by 1 ulp — the oracle writes
    literals); the fixed-order float chain is replayed bit-for-bit by a
    row-stepping recursive-CTE oracle, like :func:`ewma`.

    Plan: one shuffle on ``partition``, per-series Arrow kernel over the
    DEMAND rows only (tier-bounded), one output row per series.
    Output: (partition, n_demands, z, q, rate) with rate in
    centi-units/period ÷ 100 → original units."""
    import pandas as pd

    beta = 1.0 - alpha
    assert alpha + beta == 1.0 and (1.0 - alpha) == beta

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(minute).reset_index(drop=True)
        ms = pdf[minute].tolist()
        ds = pdf[demand].tolist()
        z = float(ds[0])
        q = 1.0
        for j in range(1, len(ds)):
            z = float(ds[j]) * alpha + z * beta
            q = float(ms[j] - ms[j - 1]) * alpha + q * beta
        return pd.DataFrame(
            {
                partition: [pdf[partition].iloc[0]],
                "n_demands": [len(ds)],
                "z": [z],
                "q": [q],
                "rate": [z / q / 100.0],
            }
        )

    return df.groupBy(partition).applyInPandas(
        kernel,
        schema=f"{partition} string, n_demands long, z double, q double, rate double",
    )


def burstiness(
    df: DataFrame,
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Index of dispersion (Fano factor) of per-minute event COUNTS per
    series — the burstiness gate for ingest monitoring: ~1 for a Poisson
    arrival stream, >>1 for bursty/hot sources (the ones the salted
    rollup path exists for), <1 for metronome-regular feeds.

    Zero-count minutes matter (a source that bursts once an hour is NOT
    Poisson) but are never materialized: over the N grid minutes spanned
    by the series, ``Σ(c_i − μ)² = Σc² − S²/N`` with S = Σc, so with
    exact integer S, Σc², and N, the dispersion ``var/mean = (N·Σc² −
    S²)/(N·S)`` is ONE IEEE division of exact integers (< 2^53 for
    ~10^6 events x 10^3-event minutes per series; roll coarser first
    beyond that — same bound discipline as acf).

    Plan: one map-side-combinable hash aggregate to per-minute counts,
    one per-series aggregate. Output: (partition, n_minutes_spanned,
    n_minutes_active, n_events, dispersion)."""
    m = F.expr(f"unix_micros(date_trunc('minute', {ts})) div 60000000")
    per_min = df.groupBy(F.col(partition), m.alias("_m")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    g = per_min.groupBy(partition).agg(
        (F.max("_m") - F.min("_m") + 1).alias("n_minutes_spanned"),
        F.count(F.lit(1)).alias("n_minutes_active"),
        F.sum("_c").alias("n_events"),
        F.sum(F.col("_c") * F.col("_c")).alias("_c2"),
    )
    nn = F.col("n_minutes_spanned")
    s = F.col("n_events")
    disp = (nn * F.col("_c2") - s * s).cast("double") / (nn * s).cast("double")
    return g.select(
        partition, "n_minutes_spanned", "n_minutes_active", "n_events",
        disp.alias("dispersion"),
    )


def theil_sen(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    bucket_unit: str = "hour",
) -> DataFrame:
    """Theil-Sen robust slope per (source, bucket) — the median of all
    pairwise slopes (statsmodels ``theilslopes``; 29% breakdown vs 0% for
    the least-squares ``linear_deriv``): one wild point bends OLS, not
    the pairwise median. Completes the robust family (median / MAD /
    trimmed mean / Theil-Sen).

    Exactness with NO floats until the end: each pairwise slope is the
    FLOOR-divided integer ``(dv_centi*1000) fd dt_sec`` (1e-5 units/sec
    quanta; floor-div because dv goes negative where truncation and floor
    disagree cross-engine — ``(a - ((a % b + b) % b)) div b`` makes the
    numerator exactly divisible so Spark's truncating ``div`` IS floor,
    matching the SQL mirror's explicit floor-mod), the median is taken in
    DOUBLED quanta so even-count midpoints stay integral (``percentile``'s
    0.5-interpolation ``(a+b)/2`` of two even longs is an exact double),
    and ONE final /2e5 returns units/sec. Same-timestamp pairs are
    excluded (slope undefined); buckets with no positive-dt pair emit no
    row on both engines.

    Plan: pure JVM codegen — ONE shuffle on (partition, bucket) collects
    each bounded bucket into an array (``n_points`` = size, free), a
    double explode emits the O(n²) positive-dt pairs inside the JVM, and
    a hash re-aggregate takes the exact median. Replaced the r3
    per-bucket ``applyInPandas`` kernel: with 3,600 tiny groups the
    Arrow/pandas per-group machinery cost 13-17 s at sf0.1 where this
    plan runs in well under a second (a TRIVIAL pandas kernel over the
    same grouping still cost 13 s — the overhead is per-group, not the
    pair math; same lesson as the sliding-median A/B in CLAUDE.md). The
    O(n²) bound is per tier bucket (~10²-10³ points; feed rolled tiers,
    never raw hot buckets — the same contract as the model kernels).
    Output: (partition, bucket_start, n_points, n_pairs, slope)."""
    b = df.select(
        F.col(partition).alias("source"),
        F.date_trunc(bucket_unit, F.col(ts)).alias("bucket_start"),
        F.expr(f"unix_micros(cast({ts} as timestamp)) div 1000000").alias("_t"),
        F.round(F.col(value) * 100).cast("long").alias("_v"),
    )
    g = b.groupBy("source", "bucket_start").agg(
        F.collect_list(F.struct("_t", "_v")).alias("pts")
    )
    pairs = (
        g.select(
            "source",
            "bucket_start",
            F.size("pts").alias("n_points"),
            "pts",
            F.explode("pts").alias("pa"),
        )
        .select(
            "source",
            "bucket_start",
            "n_points",
            F.col("pa._t").alias("ta"),
            F.col("pa._v").alias("va"),
            F.explode("pts").alias("pb"),
        )
        .filter(F.col("pb._t") > F.col("ta"))
        .selectExpr(
            "source",
            "bucket_start",
            "n_points",
            "(pb._v - va) * 1000L AS dv",
            "pb._t - ta AS dt",
        )
        .selectExpr(
            "source",
            "bucket_start",
            "n_points",
            "((dv - ((dv % dt + dt) % dt)) div dt) * 2L AS s2",
        )
    )
    # median via sort + middle-row pick instead of percentile():
    # percentile's ObjectHashAggregate buffers every slope per group in an
    # OpenHashMap (measured 1.9 s vs 1.36 s for this window plan at sf0.1,
    # bit-identical output); the window's required distribution is satisfied
    # by the collect_list exchange, so this adds a sort but no shuffle, and
    # sorts spill gracefully where aggregate buffers cannot. Odd counts pick
    # the middle row twice-as-one ((c+1) div 2 == c div 2 + 1); even counts
    # pick both middles, and avg of two even longs is the exact (a+b)/2 the
    # percentile interpolation computed.
    wm = Window.partitionBy("source", "bucket_start").orderBy("s2")
    wc = Window.partitionBy("source", "bucket_start")
    return (
        pairs.withColumn("rn", F.row_number().over(wm))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .where(
            (F.col("rn") == F.expr("(cnt + 1) div 2"))
            | (F.col("rn") == F.expr("cnt div 2 + 1"))
        )
        .groupBy("source", "bucket_start", "n_points")
        .agg(
            F.max("cnt").alias("n_pairs"),
            (F.avg("s2") / F.lit(200000.0)).alias("slope"),
        )
    )


def histogram_drift(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    bin_centi: int = 2500,
) -> DataFrame:
    """Two-sample distribution-drift histogram per partition: split each
    series at the midpoint of the GLOBAL time span, histogram the value
    in fixed integer bins on each side, and emit the per-bin chi-square
    dispersion term ``(c1-c2)^2 / (c1+c2)`` — the standard two-sample
    chi-square / PSI-style drift monitor, with counts instead of
    log-ratios so every emitted number is exact (PSI's ``ln(p1/p2)`` is
    not bit-reproducible cross-engine; the chi-square term is one
    correctly-rounded division of exact integers).

    The split point is ``(min_us + max_us) div 2`` over the whole input
    (integer microseconds; ANSI-safe — no wrap below ~292,000 years) so
    both engines derive the identical boundary from the data. Bins are
    floor-divided quantized values (floor-mod identity, not truncating
    ``div``, so negative values bin identically to DuckDB's ``//``).

    Plan: one tiny global agg broadcast back onto the scan, then ONE
    shuffle on (partition, bin) with map-side partial counts — the same
    shape at 100 TB. Output: (partition, bin, bin_lo, c1, c2,
    chi2_term) — one row per non-empty bin.
    """
    tmic = F.expr(f"unix_micros(cast({ts} as timestamp))")
    b = df.select(
        F.col(partition).alias("source"),
        tmic.alias("_tm"),
        F.round(F.col(value) * 100).cast("long").alias("_v"),
    )
    bounds = b.agg(
        F.min("_tm").alias("_mn"), F.max("_tm").alias("_mx")
    ).selectExpr("(_mn + _mx) div 2 AS _mid")
    w = bin_centi
    binned = (
        b.crossJoin(F.broadcast(bounds))
        .selectExpr(
            "source",
            f"(_v - ((_v % {w} + {w}) % {w})) div {w} AS bin",
            "CASE WHEN _tm <= _mid THEN 1 ELSE 0 END AS in1",
        )
        .groupBy("source", "bin")
        .agg(
            F.sum("in1").alias("c1"),
            F.sum(F.expr("1 - in1")).alias("c2"),
        )
    )
    d = F.col("c1") - F.col("c2")
    return binned.select(
        "source",
        "bin",
        (F.col("bin") * w).alias("bin_lo"),
        "c1",
        "c2",
        ((d * d).cast("double") / (F.col("c1") + F.col("c2")).cast("double")).alias(
            "chi2_term"
        ),
    )


def holt_winters(
    df: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
    multiplicative: bool = False,
) -> DataFrame:
    """Holt-Winters triple exponential smoothing (level + trend +
    seasonal, period ``m``) per source — completes the classical smoothing
    family (:func:`ewma` → :func:`holt_linear` → here; reference analogue:
    the trend+seasonal specs of ``ARX.rescale``). Additive by default:

    - ``l_t = (y_t − s_{t−m})·α + (l_{t−1} + b_{t−1})·(1−α)``
    - ``b_t = (l_t − l_{t−1})·β + b_{t−1}·(1−β)``
    - ``s_t = (y_t − (l_{t−1} + b_{t−1}))·γ + s_{t−m}·(1−γ)``
    - one-step forecast ``fc1 = (l_t + b_t) + s_{t+1−m}``

    Seeds: ``l_0 = y_0``, ``b_0 = 0``, and the pre-history seasonals are 0
    (``s_j = 0`` for j < 1, and ``s_0 = 0``) — the filter behaves like Holt
    for the first season while the seasonal ring fills; a documented,
    cross-engine-trivial convention (classical mean-of-first-season seeds
    add a division whose operand order is easy to get wrong in SQL).

    With ``multiplicative=True`` the seasonal component is a RATIO
    (Winters' original multiplicative form, the standard choice for
    positive count series whose seasonal swing scales with the level):
    ``l_t = (y_t / s_{t−m})·α + (l_{t−1} + b_{t−1})·(1−α)``,
    ``s_t = (y_t / (l_{t−1} + b_{t−1}))·γ + s_{t−m}·(1−γ)``,
    ``fc1 = (l_t + b_t)·s_{t+1−m}``, seasonal seeds 1 (the multiplicative
    identity). Each step adds two single IEEE divisions — still
    cross-engine exact. Feed POSITIVE series (e.g. bucket counts);
    non-positive levels make the classical form ill-defined.

    Sequential by nature → same design as :func:`holt_linear`: per-source
    Arrow kernel with fixed-order float chains, every expression written in
    the exact IEEE shape a recursive-CTE oracle carrying a LENGTH-m LIST of
    trailing seasonals replays bit-for-bit. Pick α/β/γ with binary-exact
    complements (0.25/0.5/0.125 …) — ``1−α`` is a LITERAL on both engines.
    Tier-bounded inputs only (bounded rows per source, like the model
    kernels). Output: input columns + ``level``, ``trend``, ``seasonal``,
    ``fc1``."""
    import pandas as pd
    from pyspark.sql import types as T

    a1, b1, g1 = 1.0 - alpha, 1.0 - beta, 1.0 - gamma
    m = period
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("seasonal", T.DoubleType()),
            T.StructField("fc1", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        ys = pdf[value].tolist()
        seed = 1.0 if multiplicative else 0.0
        ring = [seed] * m  # ring[t % m] holds s_{t-m} until step t overwrites
        ls, bs, ss, fs = [], [], [], []
        l = b = None
        for i, y in enumerate(ys):
            if l is None:
                l, b, s = y, 0.0, seed
            else:
                s_old = ring[i % m]
                if multiplicative:
                    ln = (y / s_old) * alpha + (l + b) * a1
                    bn = (ln - l) * beta + b * b1
                    s = (y / (l + b)) * gamma + s_old * g1
                else:
                    ln = (y - s_old) * alpha + (l + b) * a1
                    bn = (ln - l) * beta + b * b1
                    s = (y - (l + b)) * gamma + s_old * g1
                l, b = ln, bn
            ring[i % m] = s
            ls.append(l)
            bs.append(b)
            ss.append(s)
            if multiplicative:
                fs.append((l + b) * ring[(i + 1) % m])
            else:
                fs.append((l + b) + ring[(i + 1) % m])
        pdf["level"], pdf["trend"], pdf["seasonal"], pdf["fc1"] = ls, bs, ss, fs
        return pdf

    return df.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def kalman_level(
    df: DataFrame,
    q: float,
    r: float,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
) -> DataFrame:
    """Kalman filter for the LOCAL-LEVEL state-space model per source
    (random-walk state x, observation y = x + noise; process variance
    ``q``, observation variance ``r``) — the optimal-gain counterpart of
    the fixed-gain :func:`ewma`, and the engine's state-space family
    opener. Per step, in this exact order:

    - ``P⁻ = P + q``             (predicted variance; x⁻ = x)
    - ``K  = P⁻ / (P⁻ + r)``     (gain)
    - ``x  = x + K·(y − x)``     (filtered level)
    - ``P  = (1 − K)·P⁻``        (filtered variance)

    Seeds: ``x₀ = y₀``, ``P₀ = r`` (diffuse-ish: first gain ≈ ½ for q≪r).
    As t→∞ the gain converges and the filter becomes an EWMA whose α
    solves the steady-state Riccati equation — the pytest pins that.

    Sequential → per-source Arrow kernel (the :func:`holt_linear` design)
    with fixed-order float chains: every step is two adds, one multiply
    and ONE division, each singly-rounded, so a recursive-CTE oracle
    carrying (x, P) replays the whole walk bit-for-bit — no quantization
    needed even though the gain is a full-precision quotient. Pick q/r as
    binary-exact literals. Tier-bounded inputs only. Output: input
    columns + ``x`` (filtered level), ``gain``, ``p_var``."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("x", T.DoubleType()),
            T.StructField("gain", T.DoubleType()),
            T.StructField("p_var", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        ys = pdf[value].tolist()
        xs, ks, ps = [], [], []
        x = p = None
        for y in ys:
            if x is None:
                x, k, p = y, 0.0, r
            else:
                pp = p + q
                k = pp / (pp + r)
                x = x + k * (y - x)
                p = (1.0 - k) * pp
            xs.append(x)
            ks.append(k)
            ps.append(p)
        pdf["x"], pdf["gain"], pdf["p_var"] = xs, ks, ps
        return pdf

    return df.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def theta_forecast(
    df: DataFrame,
    alpha: float = 0.25,
    hh: int = 3,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000, in the
    Hyndman & Billah 2003 "SES with drift" form that won M3): h-step
    forecast = SES level + h * (OLS trend slope) / 2 — the simple-but-
    strong baseline between :func:`ewma` (no trend) and :func:`holt_linear`
    (adaptive trend). Reference analogue: the trend specs of ARX.rescale
    (reference modeling/forecasting/arx.py) fit the same global line.

    Exactness: the input must be the integer-valued rolled signal. The
    slope is exact integer Cramer on the 0-based time index (bn = n*Σty −
    Σt·Σy, bd = n*Σt² − (Σt)²; bound n ≤ ~2e5 rows/series at |y| ≤ 1e3 —
    tier-bounded inputs only), the level is the :func:`ewma` fixed-order
    chain (α = 0.25, binary-exact), and the forecast is the fixed shape
    ``level + (h * (bn/bd)) * 0.5`` — correctly-rounded ops on exact-int
    doubles, bit-identical in SQL. Single-point series (bd = 0) emit NULL.

    Plan: the ewma kernel's single shuffle + one hash agg + a broadcast
    join of two |sources|-row tables, then a row-local explode of the
    horizon — no extra shuffle. Output: (source, h, level, fc)."""
    cols = [F.col(c) for c in order]
    w = Window.partitionBy(partition).orderBy(*cols)
    b = (
        df.withColumn("_t", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("_yq", F.col(value).cast("long"))
    )
    sums = b.groupBy(partition).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_yq").alias("_sy"),
        F.sum("_t").alias("_st"),
        F.sum(F.col("_t") * F.col("_t")).alias("_st2"),
        F.sum(F.col("_t") * F.col("_yq")).alias("_sty"),
    ).select(
        partition,
        (F.col("_n") * F.col("_sty") - F.col("_st") * F.col("_sy")).alias("_bn"),
        (F.col("_n") * F.col("_st2") - F.col("_st") * F.col("_st")).alias("_bd"),
    )
    lvl = (
        ewma(df, alpha=alpha, value=value, partition=partition, order=order)
        .groupBy(partition)
        .agg(F.expr(f"max_by(ewma, {order[0]})").alias("level"))
    )
    slope = F.col("_bn").cast("double") / F.col("_bd").cast("double")
    fc = F.col("level") + (F.col("h").cast("double") * slope) * F.lit(0.5)
    return (
        lvl.join(F.broadcast(sums), partition)
        .withColumn("h", F.explode(F.sequence(F.lit(1), F.lit(int(hh)))))
        .select(
            partition,
            F.col("h").cast("long").alias("h"),
            "level",
            F.when(F.col("_bd") != 0, fc).alias("fc"),
        )
    )


def stl_strength(decomposed: DataFrame, partition: str = "source") -> DataFrame:
    """Trend / seasonal strength indices over a :func:`seasonal_decompose`
    output (Wang, Smith & Hyndman 2006; FPP3 §4.3):

        F_T = max(0, 1 − Var(R) / Var(T + R))
        F_S = max(0, 1 − Var(R) / Var(S + R))

    — the standard [0,1] "how much signal does the trend/seasonal component
    carry" features for series classification and monitoring.

    Exactness: the decomposition's components are bit-certified doubles, so
    ``y − seasonal`` / ``y − trend`` / ``resid`` are engine-identical;
    they quantize to UNIT integers by floor (exact on negatives, unlike
    round/div), variances use the n-scaled integer form n·Σx² − (Σx)², and
    each strength is one double division inside a fixed chain, ppm-floored
    then clamped at 0. Degenerate variances emit NULL.

    Plan: one hash aggregate over the decomposition (which itself is two
    shuffles); strengths are |sources| rows.
    Output: (source, n, ft_q6, fs_q6)."""
    r = F.floor(F.col("resid")).cast("long")
    a = F.floor(F.col("y") - F.col("seasonal")).cast("long")  # T + R
    b = F.floor(F.col("y") - F.col("trend")).cast("long")  # S + R
    agg = decomposed.groupBy(partition).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r).alias("_sr"),
        F.sum(r * r).alias("_qr"),
        F.sum(a).alias("_sa"),
        F.sum(a * a).alias("_qa"),
        F.sum(b).alias("_sb"),
        F.sum(b * b).alias("_qb"),
    )
    n = F.col("n")
    vr = n * F.col("_qr") - F.col("_sr") * F.col("_sr")
    va = n * F.col("_qa") - F.col("_sa") * F.col("_sa")
    vb = n * F.col("_qb") - F.col("_sb") * F.col("_sb")
    zero = F.lit(0).cast("long")

    def strength(vx):
        q = F.floor(
            (F.lit(1.0) - (vr.cast("double") / vx.cast("double"))) * F.lit(1000000.0)
        )
        return F.when(vx > 0, F.greatest(zero, q))

    return agg.select(
        partition, "n", strength(va).alias("ft_q6"), strength(vb).alias("fs_q6")
    )


def ar_order_select(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    f_crit: float = 3.84,
) -> DataFrame:
    """Automatic AR order selection by sequential partial F-tests
    (forward: accept lag p+1 iff F = (RSS_p - RSS_{p+1})(n-k)/RSS_{p+1}
    exceeds the 5% chi-square/F critical value 3.84) over p in {1,2,3} —
    the model-order decision the reference leaves to the analyst
    (reference ar_yw.py takes p as given; its notebooks eyeball
    ACF/PACF).  Paired with :func:`acf`/:func:`pacf` this closes the
    Box-Jenkins identification loop inside the engine.

    All three fits share the SAME conditional sample (rows where lag 3
    exists), so the RSS values are nested and comparable — the textbook
    conditional-likelihood setup.

    Exactness discipline (the granger/pacf recipe): exact BIGINT
    normal-equation sums; 2x2 ratios, 3x3 and 4x4 determinants as exact
    Python ints (cofactor expansion — any order yields the same integer;
    4x4 terms ~ n*(Syy)^3 exceed int64 by far, inside HUGEINT/Python
    int), each divided once through the HUGEINT->DOUBLE cast mimic with
    the singular intercept-only fallback; residuals are fixed left-assoc
    chains (((b0 + l1*b1) + l2*b2) + l3*b3); RSS is the order-independent
    BIGINT sum of floor(e*e*1e6); each F is one IEEE division of exact
    BIGINTs.

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel over the tier-bounded array (numpy int64 dots for the sums,
    Python-int Cramer).  Output: (partition, n, rss1_q, rss2_q, rss3_q,
    f21, f32, selected_p).
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
            T.StructField("rss1_q", T.LongType()),
            T.StructField("rss2_q", T.LongType()),
            T.StructField("rss3_q", T.LongType()),
            T.StructField("f21", T.DoubleType()),
            T.StructField("f32", T.DoubleType()),
            T.StructField("selected_p", T.LongType()),
        ]
    )
    b = df.select(F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v"))

    def det(m):
        k = len(m)
        if k == 1:
            return m[0][0]
        tot = 0
        for j in range(k):
            minor = [[m[r][c] for c in range(k) if c != j] for r in range(1, k)]
            tot += (1 if j % 2 == 0 else -1) * m[0][j] * det(minor)
        return tot

    def solve(A, c):
        """Cramer with the intercept-only singular fallback; returns the
        coefficient tuple (floats through the HUGEINT->DOUBLE mimic)."""
        dd = det(A)
        k = len(A)
        if dd == 0:
            return (h2d(c[0]) / h2d(A[0][0]),) + (0.0,) * (k - 1)
        out = []
        for j in range(k):
            Aj = [[c[i] if jj == j else A[i][jj] for jj in range(k)] for i in range(k)]
            out.append(h2d(det(Aj)) / h2d(dd))
        return tuple(out)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        vv = pdf["_v"].to_numpy()
        cols = [f.name for f in out_schema.fields]
        if len(vv) < 8:
            return pd.DataFrame(columns=cols)
        yv, l1, l2, l3 = vv[3:], vv[2:-1], vv[1:-2], vv[:-3]
        n = len(yv)
        S = lambda a, bb: int(np.dot(a, bb))  # noqa: E731
        one = np.ones_like(yv)
        sy, s1, s2, s3 = S(yv, one), S(l1, one), S(l2, one), S(l3, one)
        s11, s12, s13 = S(l1, l1), S(l1, l2), S(l1, l3)
        s22, s23, s33 = S(l2, l2), S(l2, l3), S(l3, l3)
        sy1, sy2, sy3 = S(yv, l1), S(yv, l2), S(yv, l3)
        b0a, b1a = solve([[n, s1], [s1, s11]], [sy, sy1])
        b0b, b1b, b2b = solve(
            [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]], [sy, sy1, sy2]
        )
        b0c, b1c, b2c, b3c = solve(
            [[n, s1, s2, s3], [s1, s11, s12, s13], [s2, s12, s22, s23], [s3, s13, s23, s33]],
            [sy, sy1, sy2, sy3],
        )
        f8 = np.float64
        yd, d1, d2_, d3_ = yv.astype(f8), l1.astype(f8), l2.astype(f8), l3.astype(f8)
        e1 = yd - (b0a + d1 * b1a)
        e2 = yd - ((b0b + d1 * b1b) + d2_ * b2b)
        e3 = yd - (((b0c + d1 * b1c) + d2_ * b2c) + d3_ * b3c)
        q = lambda e: int(np.floor(e * e * 1e6).astype(np.int64).sum())  # noqa: E731
        r1, r2, r3 = q(e1), q(e2), q(e3)
        f21 = float((r1 - r2) * (n - 3)) / float(r2) if r2 > 0 and n > 3 else None
        f32 = float((r2 - r3) * (n - 4)) / float(r3) if r3 > 0 and n > 4 else None
        if f21 is None:
            sel = None
        elif f21 <= f_crit:
            sel = 1
        elif f32 is None:
            sel = None
        else:
            sel = 3 if f32 > f_crit else 2
        return pd.DataFrame(
            [(pdf[partition].iat[0], n, r1, r2, r3, f21, f32, sel)], columns=cols
        )

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def ljung_box(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order: tuple = ("ts", "event_id"),
    max_lag: int = 5,
    chi2_crit: float = 11.07,
) -> DataFrame:
    """Ljung-Box portmanteau white-noise test per series (Ljung & Box,
    Biometrika 1978): Q = n(n+2) * sum_{k=1..h} rho_k^2/(n-k) against
    chi-square(h) — the "is there anything left to model?" diagnostic
    that completes the Box-Jenkins loop (:func:`acf`/:func:`pacf`
    identify, :func:`ar_order_select` picks the order, this rejects
    white noise / validates residual whiteness).  Default h=5 with the
    published 5% critical value chi2_0.95(5) = 11.07.

    Estimator (documented, engine-exact): centi-unit quantization and
    truncating-integer-mean centering exactly as :func:`acf`; each
    rho_k = gamma_k/gamma_0 is one IEEE division of exact BIGINTs; Q is
    a FIXED left-assoc chain written identically in the SQL mirror —
    t_k = ((rho_k*rho_k)/(n-k)), S = ((((t1+t2)+t3)+t4)+t5),
    Q = double(n*(n+2)) * S — all correctly-rounded IEEE ops in a pinned
    order, bit-identical cross-engine.

    Plan shape: the acf kernel shape — ONE shuffle on the series key,
    int64 numpy dot products over shifted deviation views, one row out
    per series.  Output: (partition, n, q_stat, white_noise_5pct).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("n", T.LongType()),
            T.StructField("q_stat", T.DoubleType()),
            T.StructField("white_noise_5pct", T.BooleanType()),
        ]
    )
    b = df.select(
        F.col(partition),
        *[F.col(c) for c in order],
        F.round(F.col(value) * 100).cast("long").alias("_vc"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        vc = pdf["_vc"].to_numpy()
        n = len(vc)
        cols = [f.name for f in out_schema.fields]
        if n <= max_lag + 1:
            return pd.DataFrame(columns=cols)
        s = int(vc.sum())
        m = abs(s) // n * (1 if s >= 0 else -1)  # Spark div truncates to zero
        dev = vc - m
        g0 = int(np.dot(dev, dev))
        if g0 == 0:
            return pd.DataFrame([(pdf[partition].iat[0], n, None, None)], columns=cols)
        acc = np.float64(0.0)
        for k in range(1, max_lag + 1):
            gk = int(np.dot(dev[k:], dev[:-k]))
            rho = np.float64(gk) / np.float64(g0)
            acc = acc + (rho * rho) / np.float64(n - k)
        q = np.float64(n * (n + 2)) * acc
        return pd.DataFrame(
            [(pdf[partition].iat[0], n, float(q), bool(q < chi2_crit))], columns=cols
        )

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def auto_seasonal_qof(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    min_lag: int = 2,
    max_lag: int = 48,
) -> DataFrame:
    """Auto-seasonal baseline QoF: detect each series' dominant period
    with :func:`dominant_period`, forecast seasonal-naive AT THAT PERIOD
    (f_t = y_{t-P}, P per series), and score it — the zero-config
    composition of the engine's detect -> forecast -> score pieces (the
    reference hard-codes the period into its seasonal configs; here the
    pipeline picks it per series).  Evaluation rows share one fixed skip
    (t >= max_lag) so every series scores the same window regardless of
    its detected P.

    Exactness: the detected period is an exact integer (argmax of exact
    BIGINT gammas); the forecast is a row lookup (self-join on the
    computed key idx - P — LAG with a variable offset is not portable,
    an equi-join is); errors are exact BIGINTs and ``mae_milli =
    (1000*sae) div n`` one integer floor division.

    Plan shape (100-TB lens): one shuffle for the per-series kernel
    (period detection), the tiny (one row per series) period table
    broadcast back, then a tier self-join on (series, idx-P) = (series,
    idx) — both sides hash-partition on the series key, tier-bounded —
    and a map-side-partial hash aggregate.

    Output: (partition, period, n, sae, sse, mae_milli).
    """
    from pyspark.sql import Window

    dp = dominant_period(
        df, value=value, partition=partition, order=(ts,), min_lag=min_lag, max_lag=max_lag
    ).select(partition, "period")
    w = Window.partitionBy(partition).orderBy(ts)
    o = df.select(
        F.col(partition), F.col(ts).alias("_b"), F.col(value).cast("long").alias("_v")
    ).withColumn("idx", F.row_number().over(Window.partitionBy(partition).orderBy("_b")) - 1)
    a = o.join(F.broadcast(dp), on=partition).filter(F.col("idx") >= max_lag)
    b = o.select(
        F.col(partition).alias("_bsrc"), F.col("idx").alias("bidx"), F.col("_v").alias("_f")
    )
    j = a.join(
        b,
        (F.col(partition) == F.col("_bsrc"))
        & (F.col("idx") - F.col("period") == F.col("bidx")),
    ).select(F.col(partition).alias("src"), "period", "_v", "_f")
    return (
        j.groupBy("src", "period")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("_v") - F.col("_f"))).alias("sae"),
            F.sum((F.col("_v") - F.col("_f")) * (F.col("_v") - F.col("_f"))).alias("sse"),
        )
        .select(
            F.col("src").alias(partition),
            "period",
            "n",
            "sae",
            "sse",
            F.expr("(1000 * sae) div n").alias("mae_milli"),
        )
    )


def demand_class(
    df: DataFrame,
    partition: str = "source",
    minute: str = "m",
    demand: str = "d",
) -> DataFrame:
    """Syntetos-Boylan demand classification (Syntetos & Boylan, IJF
    2005; Croston 1972): place each series in the
    smooth / intermittent / erratic / lumpy quadrant by ADI (average
    inter-demand interval) and CV^2 (squared coefficient of variation of
    nonzero demand sizes) against the published cutoffs 1.32 and 0.49 —
    the router that decides whether a series belongs to the smooth
    models (EWMA/Holt/ARX) or to :func:`croston`.  Input is croston's
    compressed form: one row per nonzero-demand period
    (partition, m, d), zero periods implicit.

    Exactness: ADI compares as INTEGERS — adi_milli = (1000*span) div
    n_nz vs 1320 (span = m_max - m_min + 1 observed periods); CV^2 is
    one IEEE division of exact BIGINTs via the identity var/mu^2 =
    (n*sum(d^2) - (sum d)^2) / (sum d)^2 — no mean subtraction, no
    float accumulation.  Bound: n*sum(d^2) <= n^2*dmax^2 must stay under
    2^63 (n*dmax < 3e9 — any tier-bounded feed; ANSI-safe).

    Plan shape: ONE hash aggregate with map-side partials, whole-stage
    codegen, no kernel — the cheapest operator in the suite by
    construction.  Output: (partition, n_nz, span, adi_milli, cv2,
    demand_class).
    """
    agg = df.groupBy(partition).agg(
        F.count(F.lit(1)).alias("n_nz"),
        F.sum(F.col(demand)).alias("sd"),
        F.sum(F.col(demand) * F.col(demand)).alias("sd2"),
        (F.max(minute) - F.min(minute) + F.lit(1)).alias("span"),
    )
    cv2 = (
        (F.col("n_nz") * F.col("sd2") - F.col("sd") * F.col("sd")).cast("double")
        / (F.col("sd") * F.col("sd")).cast("double")
    )
    out = agg.select(
        partition,
        "n_nz",
        "span",
        F.expr("(1000 * span) div n_nz").alias("adi_milli"),
        F.when(F.col("sd") != 0, cv2).alias("cv2"),
    )
    return out.withColumn(
        "demand_class",
        F.when(
            F.col("cv2").isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.when(
                F.col("adi_milli") < 1320,
                F.when(F.col("cv2") < 0.49, F.lit("smooth")).otherwise(F.lit("erratic")),
            ).otherwise(
                F.when(F.col("cv2") < 0.49, F.lit("intermittent")).otherwise(F.lit("lumpy"))
            )
        ),
    )


def ensemble_qof(
    df: DataFrame,
    value: str = "v_micro",
    partition: str = "source",
    order: str = "bucket_start",
    season: int = 24,
) -> DataFrame:
    """Equal-weight forecast-combination QoF (Bates & Granger 1969; the
    M-competition's "combining beats components" result): score the mean
    of three one-step baselines — persistence y[t−1], moving-average
    MA(3), seasonal-naive y[t−season] — against each component, per
    series, with EXACT integers throughout: the combined error is kept in
    9-scaled centi units, ``e9 = 9y − (4·l1 + l2 + l3 + 3·l_s)`` (the
    ×9 clears both the /3 ensemble mean and the /3 inside MA(3)), and the
    component errors are scaled by the same 9 so all four SAE columns are
    directly comparable BIGINTs. ``regret9`` = combined SAE minus the
    best single model's — ≤ 0 means the combination won outright (the
    M4 diversification gain); the average-loss bound guarantees it never
    exceeds the WORST component.

    One window (four lags on one (series, order) sort) + one hash
    aggregate riding the same shuffle; conditioning on rows where ALL
    lags exist keeps every model scored on the identical sample (the
    ar_order_select nested-sample rule). Emitted doubles are fixed
    left-assoc chains ``((sae9/m)/9)/100`` mirrored in SQL.

    Output: (partition, m, sae9_ens, sae9_persist, sae9_ma3, sae9_snaive,
    regret9, mae_ens, mae_best_single).
    """
    vc = F.expr(f"{value} div 10000")
    w = Window.partitionBy(partition).orderBy(order)
    b = (
        df.select(
            F.col(partition).alias("source"),
            vc.alias("_y"),
            F.lag(vc, 1).over(w).alias("_l1"),
            F.lag(vc, 2).over(w).alias("_l2"),
            F.lag(vc, 3).over(w).alias("_l3"),
            F.lag(vc, season).over(w).alias("_ls"),
        )
        .where(
            F.col("_l1").isNotNull()
            & F.col("_l2").isNotNull()
            & F.col("_l3").isNotNull()
            & F.col("_ls").isNotNull()
        )
        .select(
            "source",
            (
                F.lit(9) * F.col("_y")
                - (
                    F.lit(4) * F.col("_l1")
                    + F.col("_l2")
                    + F.col("_l3")
                    + F.lit(3) * F.col("_ls")
                )
            ).alias("_e_ens"),
            (F.lit(9) * (F.col("_y") - F.col("_l1"))).alias("_e_p"),
            (
                F.lit(9) * F.col("_y")
                - F.lit(3) * (F.col("_l1") + F.col("_l2") + F.col("_l3"))
            ).alias("_e_m"),
            (F.lit(9) * (F.col("_y") - F.col("_ls"))).alias("_e_s"),
        )
    )
    agg = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.abs(F.col("_e_ens"))).cast("long").alias("sae9_ens"),
        F.sum(F.abs(F.col("_e_p"))).cast("long").alias("sae9_persist"),
        F.sum(F.abs(F.col("_e_m"))).cast("long").alias("sae9_ma3"),
        F.sum(F.abs(F.col("_e_s"))).cast("long").alias("sae9_snaive"),
    )
    best = F.least("sae9_persist", "sae9_ma3", "sae9_snaive")
    return agg.select(
        F.col("source").alias(partition),
        "m",
        "sae9_ens",
        "sae9_persist",
        "sae9_ma3",
        "sae9_snaive",
        (F.col("sae9_ens") - best).cast("long").alias("regret9"),
        (
            (F.col("sae9_ens").cast("double") / F.col("m").cast("double"))
            / F.lit(9.0)
            / F.lit(100.0)
        ).alias("mae_ens"),
        (
            (best.cast("double") / F.col("m").cast("double"))
            / F.lit(9.0)
            / F.lit(100.0)
        ).alias("mae_best_single"),
    )


def isotonic_fit(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Isotonic (monotone nondecreasing) regression per series by Pool
    Adjacent Violators (Barlow et al. 1972; sklearn ``IsotonicRegression``
    semantics with x = time order, unit weights): the unique least-squares
    nondecreasing fit. PAVA maintains a stack of blocks (sum, count); each
    new point pushes a singleton block, then adjacent blocks merge while
    the previous block's mean EXCEEDS the top's (strict violation —
    equal-mean neighbors stay separate blocks, a convention the oracle
    replays exactly; fitted values are identical either way). Every
    point's fit is its block mean sum/count — EXACT integers compared by
    cross-multiplication (``sum_prev·cnt_top > sum_top·cnt_prev``), so no
    float enters the merge decision, and the emitted ``fit`` is one
    correctly-rounded IEEE division of small exact integers.

    Use cases on telemetry: monotone calibration of a quality score
    against observed pass rates, enforcing cumulative-counter monotonicity
    after counter-reset repair, and monotone trend extraction with
    level-exact plateaus (where OLS smears a step).

    Plan shape: one shuffle on the series key into a per-series Arrow
    kernel; the stack walk is O(n) amortized (each point is pushed and
    merged at most once) over the tier-bounded series — the same
    sequential-chain contract as EWMA/Holt, with an O(2n)-step
    recursive-CTE state machine as the SQL mirror. Output one row per
    BLOCK: (partition, block_i 1-based, start_t, m, sum_v, fit).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            part_field,
            T.StructField("block_i", T.LongType()),
            T.StructField("start_t", T.LongType()),
            T.StructField("m", T.LongType()),
            T.StructField("sum_v", T.LongType()),
            T.StructField("fit", T.DoubleType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]
    b = df.select(
        F.col(partition),
        F.col(ts).alias("_ts"),
        F.col(value).cast("long").alias("_v"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        v = pdf["_v"].to_numpy(dtype=np.int64)
        sums: list[int] = []
        cnts: list[int] = []
        for x in v:
            s, c = int(x), 1
            while sums and sums[-1] * c > s * cnts[-1]:
                s += sums.pop()
                c += cnts.pop()
            sums.append(s)
            cnts.append(c)
        src = pdf[partition].iat[0]
        out = []
        start = 0
        for bi, (s, c) in enumerate(zip(sums, cnts), start=1):
            out.append((src, bi, start, c, s, float(s) / float(c)))
            start += c
        return pd.DataFrame(out, columns=cols)

    return b.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def freshness_report(
    df: DataFrame,
    partition: str = "source",
    ts: str = "ts",
    bucket_s: int = 3600,
    trailing: int = 24,
) -> DataFrame:
    """Per-source data-freshness / staleness report — the ingestion
    monitor every tiered pipeline runs between refreshes (TimescaleDB's
    continuous-aggregate lag diagnostics; Prometheus ``time() - max(ts)``
    staleness): last observation, lag behind the corpus frontier, and
    trailing-window bucket coverage (which sources silently stopped
    reporting some hours?).

    Exactness: all times are ``floor(epoch(ts))`` integer seconds (the
    sessionize recipe); the frontier is a window MAX over the per-source
    aggregate table (5-10^5 rows — no second raw scan, no scalar-join
    BNLJ); trailing coverage counts DISTINCT buckets of the tier table
    inside ``(frontier_bucket - trailing, frontier_bucket]``.

    Plan: one shuffle to the (source, bucket) tier, one hash re-aggregate
    to sources, one whole-table window on the tiny source table. Output:
    (partition, n_events, last_s, frontier_s, staleness_s, buckets_24h,
    missing_24h, stale) — stale fires when staleness exceeds one bucket.
    """
    eb = F.unix_timestamp(F.col(ts).cast("timestamp")).cast("long")
    tier = df.groupBy(
        F.col(partition).alias("source"),
        F.expr(
            f"CAST(unix_timestamp(CAST({ts} AS TIMESTAMP)) AS BIGINT) div {bucket_s}"
        ).alias("_b"),
    ).agg(F.count(F.lit(1)).alias("_n"), F.max(eb).alias("_last"))
    per_src = tier.groupBy("source").agg(
        F.sum("_n").cast("long").alias("n_events"),
        F.max("_last").alias("last_s"),
        F.max("_b").alias("_last_b"),
    )
    w = Window.partitionBy()
    per_src = per_src.withColumn("frontier_s", F.max("last_s").over(w)).withColumn(
        "_front_b", F.max("_last_b").over(w)
    )
    cov = (
        tier.join(per_src.select("source", "_front_b"), "source")
        .where(
            (F.col("_b") > F.col("_front_b") - trailing)
            & (F.col("_b") <= F.col("_front_b"))
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("buckets_24h"))
    )
    return (
        per_src.join(cov, "source", "left")
        .select(
            F.col("source").alias(partition),
            "n_events",
            "last_s",
            "frontier_s",
            (F.col("frontier_s") - F.col("last_s")).cast("long").alias("staleness_s"),
            F.coalesce("buckets_24h", F.lit(0)).cast("long").alias("buckets_24h"),
            (F.lit(trailing) - F.coalesce("buckets_24h", F.lit(0)))
            .cast("long")
            .alias("missing_24h"),
            (F.col("frontier_s") - F.col("last_s") > bucket_s).alias("stale"),
        )
    )


def interarrival_stats(
    df: DataFrame,
    partition: str = "source",
    ts: str = "ts",
    order_tb: str = "event_id",
) -> DataFrame:
    """Per-source event inter-arrival distribution — arrival-process
    diagnostics feeding the burstiness/heartbeat monitors: mean / median /
    p95 / max gap in exact integer seconds. Gaps are differences of
    ``floor(epoch(ts))`` over the (ts, tie-break) order (CLAUDE.md window
    invariant); mean is ONE division of exact BIGINTs; median/p95 use the
    interpolated percentile both engines compute bit-equally on integer
    inputs (the certified quantiles recipe: Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``).

    Plan: one (source)-shuffle window for the lag + one hash aggregate on
    the same partitioning. Output: (partition, n_gaps, sum_gap_s,
    mean_gap_s, median_gap_s, p95_gap_s, max_gap_s).
    """
    eb = F.unix_timestamp(F.col(ts).cast("timestamp")).cast("long")
    w = Window.partitionBy(partition).orderBy(ts, order_tb)
    b = (
        df.select(F.col(partition).alias("source"), F.col(ts), F.col(order_tb), eb.alias("_s"))
        .withColumn("_gap", F.col("_s") - F.lag("_s", 1).over(w))
        .where(F.col("_gap").isNotNull())
    )
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("_gap").cast("long").alias("sum_gap_s"),
        (F.sum("_gap").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_gap_s"
        ),
        F.expr("percentile(_gap, 0.5)").alias("median_gap_s"),
        F.expr("percentile(_gap, 0.95)").alias("p95_gap_s"),
        F.max("_gap").cast("long").alias("max_gap_s"),
    )


def siegel_slopes(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
) -> DataFrame:
    """Siegel repeated-median regression per series (Siegel, Biometrika
    1982): slope = median over i of ( median over j≠i of pairwise slope
    (v_j−v_i)/(t_j−t_i) ), intercept = median over i of v_i − slope·t_i.
    The 50%-breakdown upgrade of :func:`theil_sen` (29%): half the points
    can be arbitrarily corrupted before the fit moves, because each point
    gets ONE vote — its own median slope — instead of n−1 pair votes.

    Exactness (the theil_sen recipe, two levels deep): pairwise slopes
    are floor-divided DOUBLED milli-quanta longs (the explicit floor-mod
    trick keeps Spark's truncating ``div`` ≡ SQL floor; symmetric under
    direction, so each pair is computed once and voted to both
    endpoints); the per-point median averages two EVEN longs (exact
    integral double), the repeated median averages two integral doubles
    (exact), and ONE final /2000.0 returns units/bucket. The intercept
    residuals are the fixed chain ``v − slope·t`` with the same
    sort-and-middle-pick median. No percentile() aggregate anywhere —
    windows ride the collect exchange (the ObjectHashAggregate lesson).

    Plan: ONE shuffle collects each bounded series; the O(n²) pair
    explosion and both median levels stay inside the JVM on that
    partitioning. Feed rolled tiers (the model-kernel contract).
    Output: (source, n_points, slope, intercept) — series with < 2
    points emit no row.
    """
    b = df.select(
        F.col(partition).alias("source"),
        F.col(ts).alias("_ts"),
        F.col(value).cast("long").alias("_v"),
    ).withColumn("_i", F.row_number().over(Window.partitionBy("source").orderBy("_ts")) - 1)
    g = b.groupBy("source").agg(
        F.collect_list(F.struct("_i", "_v")).alias("pts"), F.count(F.lit(1)).alias("n_points")
    )
    # first explode to one row per LEFT endpoint, then SPREAD those rows
    # before the second explode: the per-source group table has only
    # |sources| rows, so without the repartition the whole O(n²) pair
    # fan-out of a source runs in ONE task (measured 4.4 s warm at sf0.1
    # with 5 sources; ~1.3 s after). This is the opposite call from the
    # "don't repartition before Arrow kernels" note — here the shuffle
    # moves |points| array rows to unlock |points|-way JVM parallelism.
    lefts = g.select("source", "n_points", "pts", F.explode("pts").alias("pa")).select(
        "source",
        "n_points",
        F.col("pa._i").alias("ia"),
        F.col("pa._v").alias("va"),
        "pts",
    )
    pairs = (
        lefts.repartition("source", "ia")
        .select("source", "n_points", "ia", "va", F.explode("pts").alias("pb"))
        .filter(F.col("pb._i") > F.col("ia"))
        .selectExpr(
            "source",
            "n_points",
            "ia",
            "pb._i AS ib",
            "(pb._v - va) * 1000L AS dv",
            "pb._i - ia AS dt",
        )
        .selectExpr(
            "source",
            "n_points",
            "ia",
            "ib",
            "((dv - ((dv % dt + dt) % dt)) div dt) * 2L AS s2",
        )
    )
    # both endpoint votes from ONE evaluation of the pair stream — a
    # self-union would re-run the O(n²) explosion for each leg
    ep = pairs.select(
        "source",
        "n_points",
        F.explode(
            F.array(
                F.struct(F.col("ia").alias("i"), F.col("s2").alias("s2")),
                F.struct(F.col("ib").alias("i"), F.col("s2").alias("s2")),
            )
        ).alias("e"),
    ).select("source", "n_points", F.col("e.i").alias("i"), F.col("e.s2").alias("s2"))
    wm = Window.partitionBy("source", "i").orderBy("s2")
    wc = Window.partitionBy("source", "i")
    medi = (
        ep.withColumn("rn", F.row_number().over(wm))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .where((F.col("rn") == F.expr("(cnt + 1) div 2")) | (F.col("rn") == F.expr("cnt div 2 + 1")))
        .groupBy("source", "n_points", "i")
        .agg(F.avg("s2").alias("medq"))
    )
    w2 = Window.partitionBy("source").orderBy("medq")
    w2c = Window.partitionBy("source")
    sl = (
        medi.withColumn("rn", F.row_number().over(w2))
        .withColumn("cnt", F.count(F.lit(1)).over(w2c))
        .where((F.col("rn") == F.expr("(cnt + 1) div 2")) | (F.col("rn") == F.expr("cnt div 2 + 1")))
        .groupBy("source", "n_points")
        .agg((F.avg("medq") / F.lit(2000.0)).alias("slope"))
    )
    res = b.join(F.broadcast(sl), "source").select(
        "source",
        "n_points",
        "slope",
        (F.col("_v").cast("double") - F.col("slope") * F.col("_i")).alias("r"),
    )
    wr = Window.partitionBy("source").orderBy("r")
    wrc = Window.partitionBy("source")
    return (
        res.withColumn("rn", F.row_number().over(wr))
        .withColumn("cnt", F.count(F.lit(1)).over(wrc))
        .where((F.col("rn") == F.expr("(cnt + 1) div 2")) | (F.col("rn") == F.expr("cnt div 2 + 1")))
        .groupBy("source", "n_points", "slope")
        .agg(F.avg("r").alias("intercept"))
        .select("source", "n_points", "slope", "intercept")
    )


def prewhitened_ccf(
    df: DataFrame,
    x_source: str,
    y_source: str,
    partition: str = "source",
    ts: str = "ts",
    value: str = "y",
    bucket: str = "minute",
    max_lag: int = 3,
    q_scale: int = 256,
) -> DataFrame:
    """Prewhitened cross-correlation (Box-Jenkins exo identification,
    the textbook companion of :func:`ccf`): plain CCF on autocorrelated
    series shows spurious peaks at every lag; the procedure fits an AR(2)
    to the INPUT series x, filters BOTH series with the identical affine
    operator, and cross-correlates the residuals — surviving peaks
    identify genuine lead/lag structure.

    Exactness chain (each step a certified repo recipe):

    1. shared minute grid, truncating centi-unit means, then WHOLE units
       (``_m div 100``) so the AR normal equations stay far inside int64
       and the SQL oracle's 3×3 HUGEINT Cramer determinants inside int128;
    2. conditional AR(2)+intercept fit on x (rows t ≥ 2, most-recent lag
       first) by exact integer Cramer — the 9 sums collect driver-side
       (ONE bounded row, the pooled_ar pattern) and each coefficient is
       ONE division through the DuckDB HUGEINT→DOUBLE cast mimic, so the
       float64 literals re-entering the plan equal the oracle's own
       divisions bit-for-bit; degenerate det → intercept-only;
    3. residuals e = v − ((b0 + l1·φ1) + l2·φ2) — fixed left-assoc chain
       of correctly-rounded IEEE ops on exactly-representable inputs —
       quantized eq = floor(e·q_scale) with q_scale a power of two;
    4. centering by m = floor(double(Σeq)/double(n)) (signed-safe: Spark
       ``div`` truncates toward zero while DuckDB ``//`` floors, so the
       negative-capable residual means go through ONE identical IEEE
       division + floor on both engines instead);
    5. integer CCF on the centered quantized residuals over the lag spine
       (total like :func:`ccf`: short grids still emit every lag row);
       ``r = gxy / sqrt(double(gx0)·double(gy0))``.

    Output: (lag, gxy, r, n_used) — gxy in quantized-residual units².
    """
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    vc = F.round(F.col(value) * 100).cast("long")
    b = df.select(
        F.col(partition).alias("_s"),
        F.date_trunc(bucket, F.col(ts)).alias("_b"),
        vc.alias("_vc"),
    )

    def grid(src):
        return (
            b.where(F.col("_s") == src)
            .groupBy("_b")
            .agg((F.sum("_vc").cast("long")).alias("_sum"), F.count(F.lit(1)).alias("_n"))
            .select("_b", F.expr("(_sum div _n) div 100").alias("_m"))
        )

    j = (
        grid(x_source)
        .withColumnRenamed("_m", "_xv")
        .join(grid(y_source).withColumnRenamed("_m", "_yv"), "_b")
    )
    w = Window.orderBy("_b")
    lg = j.select(
        "_b",
        "_xv",
        "_yv",
        F.lag("_xv", 1).over(w).alias("_l1x"),
        F.lag("_xv", 2).over(w).alias("_l2x"),
        F.lag("_yv", 1).over(w).alias("_l1y"),
        F.lag("_yv", 2).over(w).alias("_l2y"),
    ).where(F.col("_l2x").isNotNull() & F.col("_l2y").isNotNull())
    s = lg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_l1x").alias("s1"),
        F.sum("_l2x").alias("s2"),
        F.sum(F.col("_l1x") * F.col("_l1x")).alias("s11"),
        F.sum(F.col("_l1x") * F.col("_l2x")).alias("s12"),
        F.sum(F.col("_l2x") * F.col("_l2x")).alias("s22"),
        F.sum("_xv").alias("sy"),
        F.sum(F.col("_xv") * F.col("_l1x")).alias("sy1"),
        F.sum(F.col("_xv") * F.col("_l2x")).alias("sy2"),
    ).collect()[0]
    n = int(s["n"])
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [], "lag long, gxy long, r double, n_used long"
        )
    s1, s2 = int(s["s1"]), int(s["s2"])
    s11, s12, s22 = int(s["s11"]), int(s["s12"]), int(s["s22"])
    sy, sy1, sy2 = int(s["sy"]), int(s["sy1"]), int(s["sy2"])

    def det3(m):
        (a_, b_, c_), (d_, e_, f_), (g_, h_, i_) = m
        return a_ * (e_ * i_ - f_ * h_) - b_ * (d_ * i_ - f_ * g_) + c_ * (
            d_ * h_ - e_ * g_
        )

    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    c = [sy, sy1, sy2]
    dd = det3(A)
    if dd == 0:
        b0, f1, f2 = h2d(sy) / h2d(n), 0.0, 0.0
    else:
        ds = [
            det3([[c[i] if jj == k else A[i][jj] for jj in range(3)] for i in range(3)])
            for k in range(3)
        ]
        b0, f1, f2 = (h2d(d) / h2d(dd) for d in ds)

    pred_x = (F.lit(b0) + F.col("_l1x") * F.lit(f1)) + F.col("_l2x") * F.lit(f2)
    pred_y = (F.lit(b0) + F.col("_l1y") * F.lit(f1)) + F.col("_l2y") * F.lit(f2)
    q = F.lit(float(q_scale))
    e = lg.select(
        "_b",
        F.floor((F.col("_xv") - pred_x) * q).cast("long").alias("_ex"),
        F.floor((F.col("_yv") - pred_y) * q).cast("long").alias("_ey"),
    )
    tot = e.agg(
        F.sum("_ex").alias("sx"), F.sum("_ey").alias("syq"), F.count(F.lit(1)).alias("cnt")
    )
    e = e.crossJoin(F.broadcast(tot)).select(
        "_b",
        (
            F.col("_ex")
            - F.floor(F.col("sx").cast("double") / F.col("cnt").cast("double")).cast("long")
        ).alias("_dx"),
        (
            F.col("_ey")
            - F.floor(F.col("syq").cast("double") / F.col("cnt").cast("double")).cast("long")
        ).alias("_dy"),
    )
    lags = list(range(-max_lag, max_lag + 1))
    prods = e.select(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    (
                        F.col("_dx")
                        * (F.lag("_dy", k).over(w) if k >= 0 else F.lead("_dy", -k).over(w))
                    ).alias("p"),
                )
                for k in lags
            ]
        ).alias("_ps"),
        (F.col("_dx") * F.col("_dx")).alias("_dx2"),
        (F.col("_dy") * F.col("_dy")).alias("_dy2"),
    )
    tot2 = prods.select(F.sum("_dx2").alias("gx0"), F.sum("_dy2").alias("gy0"))
    g = (
        prods.select(F.explode("_ps").alias("kp"))
        .where(F.col("kp.p").isNotNull())
        .groupBy(F.col("kp.lag").alias("lag"))
        .agg(F.sum("kp.p").alias("gxy"), F.count(F.lit(1)).alias("n_used"))
    )
    spine = spark.createDataFrame([(k,) for k in lags], "lag int")
    g = spine.join(F.broadcast(g), "lag", "left")
    return (
        g.crossJoin(F.broadcast(tot2))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "gxy",
            (
                F.col("gxy").cast("double")
                / F.sqrt(F.col("gx0").cast("double") * F.col("gy0").cast("double"))
            ).alias("r"),
            F.coalesce("n_used", F.lit(0)).cast("long").alias("n_used"),
        )
        .orderBy("lag")
    )
