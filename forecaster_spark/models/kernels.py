"""Per-series model kernels: ARX / ARX_Symb (recursive), ARX_D / ARX_Symb_D
(direct), AR_YW — fit, multi-horizon forecast, rolling validation — as
``groupBy(source).applyInPandas`` Arrow kernels (SURVEY.md §2.4 A1-A5, §2.5
C1-C6).

Why a kernel and not pure DataFrame ops: the recursive multi-horizon forecast
("forge", arx.py:264-265/293-324) feeds horizon h−1 forecasts into horizon h
features, and rollValidate (forecaster.py:388-419) refits every rc steps —
both sequential in h/origin but *vectorized over t* inside NumPy. One Arrow
batch crosses the JVM↔Python boundary per series; within the kernel the math
is the same ``forecaster_spark.oracle`` code the tests use as the golden, so
distributed output ≡ single-series oracle bit-for-bit.

Scale: one group per source. Series length is bounded by the retention tier
the model reads (e.g. 1d tier: ≤ a few thousand points/source even at 10^12
raw rows), so a hot source cannot blow kernel memory — the rollup tiers are
the skew-control layer, kernels always consume rolled (bounded) series.

Forecasts are emitted long-format ``(source, t, h, y_hat)`` — horizons as
rows (idiomatic Spark), not the reference's (n, hh+2) Yf matrix; ``t`` is the
0-based index of the forecast origin row in the series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from forecaster_spark.oracle.model import RefARX


def _build(pdf: pd.DataFrame, order: str, y: str, exo_cols, cfg) -> RefARX:
    pdf = pdf.sort_values(order)
    yv = pdf[y].to_numpy(dtype=float)
    xe = pdf[list(exo_cols)].to_numpy(dtype=float) if exo_cols else None
    return RefARX(
        yv,
        hh=cfg["hh"],
        xe=xe,
        p=cfg.get("p", 6),
        q=cfg.get("q", 0),
        spec=cfg.get("spec", 1),
        cross=cfg.get("cross", False),
        skip=cfg.get("skip"),
        design=cfg.get("design", "arx"),
        mode=cfg.get("mode", "recursive"),
        scaler=cfg.get("scaler"),
        yw_method=cfg.get("yw_method", "mle"),
        solver=cfg.get("solver", "pinv"),
        ridge_lam=cfg.get("ridge_lam", 0),
        symb_funcs=cfg.get("symb_funcs"),
        exo_symb_funcs=cfg.get("exo_symb_funcs"),
    )


def _run(m: RefARX, cfg) -> tuple[np.ndarray, int]:
    if cfg.get("validation", "insample") == "roll":
        yf = m.roll_validate(rc=cfg.get("rc", 2), growing=cfg.get("growing", False))
        return yf, m.tr_size
    return m.in_sample(), m.skip


def forecast_long(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    exo_cols: list[str] | None = None,
    **cfg,
) -> DataFrame:
    """Distributed multi-horizon forecast. cfg keys: hh (required), p, q,
    spec, cross, skip, design ('arx'|'symb'), mode ('recursive'|'direct'|
    'ar_yw'), scaler (None|'minmax'|'standard'), yw_method, validation
    ('insample'|'roll'), rc, growing.

    Output: (source, t, h, y_hat) with y_hat inverse-transformed to the raw
    scale (reference Yf semantics, forecaster.py:151-172)."""
    exo_cols = exo_cols or []

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = _build(pdf, order, y, exo_cols, cfg)
        yf, t0 = _run(m, cfg)
        yf = m.inverse_y(yf)
        n, hh = yf.shape
        return pd.DataFrame(
            {
                "source": pdf[partition].iloc[0],
                "t": np.repeat(np.arange(t0, t0 + n), hh),
                "h": np.tile(np.arange(1, hh + 1), n),
                "y_hat": yf.ravel(),
            }
        )

    return df.groupBy(partition).applyInPandas(
        kernel, schema=f"{partition} string, t long, h int, y_hat double"
    )


def arma_hr_forecast(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    hh: int = 4,
    skip: int = 2,
    q_scale: int = 8,
) -> DataFrame:
    """Distributed in-sample ARMA(1,1) forecast via Hannan–Rissanen two-stage
    exact-Cramer OLS (``oracle.ref.arma11_hr_forecast``) — the engine's MA-
    family extension of the reference's AR/ARX stack (which has no MA term;
    arx.py fits pure lag designs). Same kernel shape and scale posture as
    :func:`forecast_long`: one Arrow batch per source, series bounded by the
    rollup tier feeding it. Output long-format (source, t, h, y_hat)."""
    from forecaster_spark.oracle import ref

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        yv = pdf[y].to_numpy(dtype=float)
        yf = ref.arma11_hr_forecast(yv, hh=hh, skip=skip, q_scale=q_scale)
        n = yf.shape[0]
        return pd.DataFrame(
            {
                "source": pdf[partition].iloc[0],
                "t": np.repeat(np.arange(skip, skip + n), hh),
                "h": np.tile(np.arange(1, hh + 1), n),
                "y_hat": yf.ravel(),
            }
        )

    return df.groupBy(partition).applyInPandas(
        kernel, schema=f"{partition} string, t long, h int, y_hat double"
    )


def fit_params(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    exo_cols: list[str] | None = None,
    **cfg,
) -> DataFrame:
    """Distributed model fit → (source, model, h, coef array<double>)
    (intercept first; one row per horizon for direct models, h=0 row for
    recursive/AR whose single parameter vector serves all horizons)."""
    exo_cols = exo_cols or []

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = _build(pdf, order, y, exo_cols, cfg)
        params = m.fit()
        label = f"{cfg.get('design','arx')}/{cfg.get('mode','recursive')}"
        if params.ndim == 1:
            return pd.DataFrame(
                {"source": [pdf[partition].iloc[0]], "model": [label], "h": [0], "coef": [params.tolist()]}
            )
        return pd.DataFrame(
            {
                "source": pdf[partition].iloc[0],
                "model": label,
                "h": np.arange(1, params.shape[1] + 1),
                "coef": [params[:, j].tolist() for j in range(params.shape[1])],
            }
        )

    return df.groupBy(partition).applyInPandas(
        kernel, schema=f"{partition} string, model string, h int, coef array<double>"
    )


def qof_table(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    exo_cols: list[str] | None = None,
    **cfg,
) -> DataFrame:
    """Distributed QoF diagnosis — per (source, horizon) metrics matching the
    reference's diagnose_all/fit_map exactly (forecaster.py:355-384,
    Util/tools.py:147-230), incl. TnT truncation when validation='roll'."""
    exo_cols = exo_cols or []

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = _build(pdf, order, y, exo_cols, cfg)
        tnt = cfg.get("validation", "insample") == "roll"
        yf, _ = _run(m, cfg)
        rows = m.diagnose_all(yf, tnt=tnt)
        out = pd.DataFrame(rows)
        out.insert(0, "source", pdf[partition].iloc[0])
        return out.rename(
            columns={"MSE": "mse", "MAE": "mae", "R2": "r2", "R2Bar": "r2bar", "SMAPE": "smape"}
        )

    return df.groupBy(partition).applyInPandas(
        kernel,
        schema=f"{partition} string, h int, mse double, mae double, r2 double, r2bar double, smape double, m long",
    )


def feature_topk(
    df: DataFrame,
    feature_cols: list[str],
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    k: int = 3,
) -> DataFrame:
    """Top-k feature selection per source by squared-correlation relevance —
    the engine's torch-free analogue of the reference's attention-based
    feature selection (MHAttn heat-map mean → sorted top-k,
    Example_Covid19.py:103-118; the MHAttn regressor itself is excluded as
    "UNDER DEVELOPMENT" torch code, but the *capability* — pick the k most
    relevant design-matrix columns — is reproduced with a deterministic,
    SQL-certifiable relevance score). Ties break by feature-list position,
    matching the reference's stable sort. Output: (source, feature, score,
    rank)."""
    from forecaster_spark.oracle import ref

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        scores = ref.feature_scores_exact(
            pdf[list(feature_cols)].to_numpy(dtype=float), pdf[y].to_numpy(dtype=float)
        )
        top = sorted(range(len(feature_cols)), key=lambda j: (-scores[j], j))[:k]
        return pd.DataFrame(
            {
                "source": pdf[partition].iloc[0],
                "feature": [feature_cols[j] for j in top],
                "score": [scores[j] for j in top],
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    return df.groupBy(partition).applyInPandas(
        kernel, schema=f"{partition} string, feature string, score double, rank int"
    )


def pooled_ar_forecast(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    hh: int = 4,
) -> DataFrame:
    """GLOBAL pooled AR(2) forecast — one model fit across ALL series, then
    a per-series recursive forecast from each series' last two points (the
    cross-learning / global-model regime of N-BEATS & DeepAR fame, reduced
    to its exact-OLS core: where the per-source ARX family fits |sources|
    independent models, this pools every series' (y_t ~ [1, y_{t-1},
    y_{t-2}]) row into ONE normal-equation system).

    Exactness: integer tier values → the pooled normal equations are exact
    BIGINT sums (map-side partials, one tiny global aggregate), the 3×3
    Cramer solve runs driver-side in Python ints (the determinant exceeds
    int64 at pooled scale — HUGEINT territory), each coefficient divided
    ONCE through the DuckDB HUGEINT→DOUBLE cast mimic; the h-step
    recursion is the fixed left-assoc chain ``(b0 + prev·b1) + prev2·b2``
    written with LITERAL coefficients into row-local column expressions.

    Plan shape (100-TB lens): lag windows per source (one shuffle on
    source — already the tier's layout), partial aggregation down to ONE
    9-sum row collected driver-side (parameter-server style, like the IVF
    centroids), coefficients re-enter the plan as literals — no second
    shuffle; the per-source forecast reads only each source's last 2 rows.

    Output: (source, n_pool, h, y_hat) — hh rows per source with ≥ 2
    points; sources contribute to the fit only rows where both lags exist.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    t = df.select(F.col(partition), F.col(order).alias("_b"), F.col(y).cast("long").alias("_v"))
    w = Window.partitionBy(partition).orderBy("_b")
    lg = (
        t.withColumn("_l1", F.lag("_v", 1).over(w))
        .withColumn("_l2", F.lag("_v", 2).over(w))
        .where(F.col("_l2").isNotNull())
    )
    s = lg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_l1").alias("s1"),
        F.sum("_l2").alias("s2"),
        F.sum(F.col("_l1") * F.col("_l1")).alias("s11"),
        F.sum(F.col("_l1") * F.col("_l2")).alias("s12"),
        F.sum(F.col("_l2") * F.col("_l2")).alias("s22"),
        F.sum("_v").alias("sy"),
        F.sum(F.col("_v") * F.col("_l1")).alias("sy1"),
        F.sum(F.col("_v") * F.col("_l2")).alias("sy2"),
    ).collect()[0]
    if int(s["n"] or 0) == 0:
        # no series has >= 3 points: every lag sum is NULL — degrade to an
        # empty result like the SQL oracle does instead of int(None) raising.
        # Schema matches the non-empty path: the partition field keeps the
        # INPUT column's type; n_pool int (F.lit of a small count) and h
        # long (the stack()'s long literals)
        from pyspark.sql import types as T

        part_field = df.select(partition).schema.fields[0]
        empty_schema = T.StructType(
            [
                part_field,
                T.StructField("n_pool", T.IntegerType()),
                T.StructField("h", T.LongType()),
                T.StructField("y_hat", T.DoubleType()),
            ]
        )
        return df.sparkSession.createDataFrame([], empty_schema)
    n, s1, s2 = int(s["n"]), int(s["s1"]), int(s["s2"])
    s11, s12, s22 = int(s["s11"]), int(s["s12"]), int(s["s22"])
    sy, sy1, sy2 = int(s["sy"]), int(s["sy1"]), int(s["sy2"])

    def det3(m):
        (a_, b_, c_), (d_, e_, f_), (g_, h_, i_) = m
        return a_ * (e_ * i_ - f_ * h_) - b_ * (d_ * i_ - f_ * g_) + c_ * (d_ * h_ - e_ * g_)

    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    cv = [sy, sy1, sy2]
    d3 = det3(A)
    if d3 == 0:
        b0, b1, b2 = h2d(sy) / h2d(n), 0.0, 0.0
    else:
        num = [
            det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)])
            for j in range(3)
        ]
        b0, b1, b2 = h2d(num[0]) / h2d(d3), h2d(num[1]) / h2d(d3), h2d(num[2]) / h2d(d3)

    wd = Window.partitionBy(partition).orderBy(F.col("_b").desc())
    lastv = (
        t.withColumn("_rn", F.row_number().over(wd))
        .where(F.col("_rn") <= 2)
        .groupBy(partition)
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("_v"))).cast("double").alias("_y1"),
            F.max(F.when(F.col("_rn") == 2, F.col("_v"))).cast("double").alias("_y2"),
            F.count(F.lit(1)).alias("_c"),
        )
        .where(F.col("_c") == 2)
    )
    prev, prev2 = F.col("_y1"), F.col("_y2")
    hcols = []
    for h in range(1, hh + 1):
        cur = (F.lit(b0) + prev * F.lit(b1)) + prev2 * F.lit(b2)
        hcols.append(cur.alias(f"_h{h}"))
        prev, prev2 = cur, prev
    stacked = ", ".join(f"{h}L, _h{h}" for h in range(1, hh + 1))
    return (
        lastv.select(partition, *hcols)
        .selectExpr(partition, f"stack({hh}, {stacked}) AS (h, y_hat)")
        .select(partition, F.lit(n).alias("n_pool"), "h", "y_hat")
    )


def pooled_ar_fe_forecast(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    hh: int = 4,
) -> DataFrame:
    """Per-source FIXED-EFFECTS pooled AR(2) — the cross-learning regime
    between :func:`pooled_ar_forecast` (one global model) and the per-series
    ARX family (|sources| independent models): shared slopes b1, b2 learned
    from ALL series, per-source intercepts α_s (the classic within/FE panel
    estimator — one dummy column per series, eliminated by block
    elimination rather than materialized).

    Exactness without division: on a BALANCED panel the within-estimator's
    per-source centered cross-products scale to integers,
    ``T_ab,s = n_s·Σab − Σa·Σb`` (the kpss scaled-deviation trick), and the
    1/n_s factors cancel in the 2×2 slope Cramer — so b1, b2 are ratios of
    exact Python-int determinants through the HUGEINT→DOUBLE cast mimic,
    and α_s is the fixed left-assoc chain ``((sy − s1·b1) − s2·b2)/n``.
    Balance is ENFORCED relationally — and since within-demeaning never
    compares sources at the same timestamp, balance needs equal COUNTS,
    not aligned buckets: each source keeps its trailing ``m`` buckets
    where ``m`` = the global minimum per-source bucket count (a 1-row
    scalar broadcast, the friedman pattern, structurally whitelisted).
    The r5-review's first cut — intersecting bucket sets across sources —
    collapsed to an EMPTY panel whenever no bucket appeared in every
    source (true at sf0.001), killing forecasts for all sources because
    one series had patchy coverage; the trailing-window form keeps every
    source and is just as deterministic/SQL-mirrorable.

    Plan shape (100-TB lens): same as pooled_ar — lag windows ride the
    tier's (source) layout, partial aggregation to |sources| rows collected
    parameter-server style, coefficients re-enter as literals/one tiny
    broadcast alpha table; the spine table is calendar-bounded (grows with
    retention, not corpus).

    Output: (source, n_obs, h, y_hat); singular pooled design degrades to
    b1 = b2 = 0 with α_s = each source's mean (the formula's own limit).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    t = df.select(
        F.col(partition).alias("_s"), F.col(order).alias("_b"), F.col(y).cast("long").alias("_v")
    )
    m1 = t.groupBy("_s").agg(F.count(F.lit(1)).alias("_c")).agg(
        F.min("_c").alias("_m")
    )
    wd0 = Window.partitionBy("_s").orderBy(F.col("_b").desc())
    r = (
        t.withColumn("_rd", F.row_number().over(wd0))
        .join(F.broadcast(m1), F.col("_rd") <= F.col("_m"))
        .drop("_rd", "_m")
    )
    w = Window.partitionBy("_s").orderBy("_b")
    lg = (
        r.withColumn("_l1", F.lag("_v", 1).over(w))
        .withColumn("_l2", F.lag("_v", 2).over(w))
        .where(F.col("_l2").isNotNull())
    )
    per = (
        lg.groupBy("_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_l1").alias("s1"),
            F.sum("_l2").alias("s2"),
            F.sum(F.col("_l1") * F.col("_l1")).alias("s11"),
            F.sum(F.col("_l1") * F.col("_l2")).alias("s12"),
            F.sum(F.col("_l2") * F.col("_l2")).alias("s22"),
            F.sum("_v").alias("sy"),
            F.sum(F.col("_v") * F.col("_l1")).alias("sy1"),
            F.sum(F.col("_v") * F.col("_l2")).alias("sy2"),
        )
        .collect()
    )
    part_field = df.select(partition).schema.fields[0]
    if not per:
        empty_schema = T.StructType(
            [
                part_field,
                T.StructField("n_obs", T.LongType()),
                T.StructField("h", T.LongType()),
                T.StructField("y_hat", T.DoubleType()),
            ]
        )
        return df.sparkSession.createDataFrame([], empty_schema)
    T11 = T12 = T22 = T1y = T2y = 0
    stats = {}
    for row in per:
        n, s1, s2 = int(row["n"]), int(row["s1"]), int(row["s2"])
        s11, s12, s22 = int(row["s11"]), int(row["s12"]), int(row["s22"])
        sy, sy1, sy2 = int(row["sy"]), int(row["sy1"]), int(row["sy2"])
        T11 += n * s11 - s1 * s1
        T12 += n * s12 - s1 * s2
        T22 += n * s22 - s2 * s2
        T1y += n * sy1 - s1 * sy
        T2y += n * sy2 - s2 * sy
        stats[row["_s"]] = (n, s1, s2, sy)
    den = T11 * T22 - T12 * T12
    if den == 0:
        b1 = b2 = 0.0
    else:
        b1 = h2d(T1y * T22 - T2y * T12) / h2d(den)
        b2 = h2d(T11 * T2y - T12 * T1y) / h2d(den)
    alpha_rows = [
        (s, ((float(sy) - float(s1) * b1) - float(s2) * b2) / float(n), n)
        for s, (n, s1, s2, sy) in stats.items()
    ]
    fe = df.sparkSession.createDataFrame(
        alpha_rows,
        T.StructType(
            [
                T.StructField("_s", part_field.dataType),
                T.StructField("_a", T.DoubleType()),
                T.StructField("_n", T.LongType()),
            ]
        ),
    )
    wd = Window.partitionBy("_s").orderBy(F.col("_b").desc())
    lastv = (
        r.withColumn("_rn", F.row_number().over(wd))
        .where(F.col("_rn") <= 2)
        .groupBy("_s")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("_v"))).cast("double").alias("_y1"),
            F.max(F.when(F.col("_rn") == 2, F.col("_v"))).cast("double").alias("_y2"),
            F.count(F.lit(1)).alias("_c"),
        )
        .where(F.col("_c") == 2)
    )
    j = lastv.join(F.broadcast(fe), "_s")
    prev, prev2 = F.col("_y1"), F.col("_y2")
    hcols = []
    for h in range(1, hh + 1):
        cur = (F.col("_a") + prev * F.lit(b1)) + prev2 * F.lit(b2)
        hcols.append(cur.alias(f"_h{h}"))
        prev, prev2 = cur, prev
    stacked = ", ".join(f"{h}L, _h{h}" for h in range(1, hh + 1))
    return (
        j.select("_s", "_n", *hcols)
        .selectExpr("_s", "_n", f"stack({hh}, {stacked}) AS (h, y_hat)")
        .select(
            F.col("_s").alias(partition), F.col("_n").alias("n_obs"), "h", "y_hat"
        )
    )


def arima210_forecast(
    df: DataFrame,
    partition: str = "source",
    order: str = "ts",
    y: str = "y",
    hh: int = 4,
) -> DataFrame:
    """ARIMA(2,1,0) per series — the INTEGRATED member of the AR family
    (Box & Jenkins): first-difference the integer tier signal, fit AR(2)
    with intercept on the diffs by exact Cramer, forecast the diffs
    recursively and integrate back from the last level. Captures
    stochastic-trend series the stationary ARX family underfits (the
    intercept on diffs = drift).

    Exactness (the granger recipe): integer diffs → exact BIGINT/Python-
    int normal equations per series, 3×3 Cramer divided ONCE through the
    HUGEINT→DOUBLE cast mimic, singular fallback [mean, 0, 0]; the diff
    recursion is the fixed chain ``(b0 + prev·b1) + prev2·b2`` and the
    integration the left-assoc ladder ``yhat_h = yhat_{h-1} + dhat_h``,
    both replayed verbatim by ``exact_sql.arima210_sql``.

    Plan shape: ONE shuffle on the series key into a per-series Arrow
    kernel; each task is one tier-bounded series. Output:
    (source, n, h, d_hat, y_hat) — hh rows per series with ≥ 4 usable
    diff rows.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    part_field = df.select(F.col(partition)).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField("source", part_field.dataType),
            T.StructField("n", T.LongType()),
            T.StructField("h", T.LongType()),
            T.StructField("d_hat", T.DoubleType()),
            T.StructField("y_hat", T.DoubleType()),
        ]
    )
    t = df.select(F.col(partition), F.col(order).alias("_b"), F.col(y).cast("long").alias("_v"))

    def det3(m):
        (a_, b_, c_), (d_, e_, f_), (g_, h_, i_) = m
        return a_ * (e_ * i_ - f_ * h_) - b_ * (d_ * i_ - f_ * g_) + c_ * (d_ * h_ - e_ * g_)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_b").reset_index(drop=True)
        vv = pdf["_v"].to_numpy()
        cols = [f.name for f in out_schema.fields]
        if len(vv) < 7:  # ≥ 4 target rows need ≥ 7 levels
            return pd.DataFrame(columns=cols)
        dd = vv[1:] - vv[:-1]
        dv, l1, l2 = dd[2:], dd[1:-1], dd[:-2]
        n = len(dv)
        s1, s2, sy = int(l1.sum()), int(l2.sum()), int(dv.sum())
        s11 = int(np.dot(l1, l1))
        s12 = int(np.dot(l1, l2))
        s22 = int(np.dot(l2, l2))
        sy1 = int(np.dot(dv, l1))
        sy2 = int(np.dot(dv, l2))
        A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
        cv = [sy, sy1, sy2]
        d3 = det3(A)
        if d3 == 0:
            b0, b1, b2 = h2d(sy) / h2d(n), 0.0, 0.0
        else:
            num = [
                det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)])
                for j in range(3)
            ]
            b0, b1, b2 = h2d(num[0]) / h2d(d3), h2d(num[1]) / h2d(d3), h2d(num[2]) / h2d(d3)
        prev, prev2 = float(dd[-1]), float(dd[-2])
        yh = float(vv[-1])
        rows = []
        for h in range(1, hh + 1):
            dh = (b0 + prev * b1) + prev2 * b2
            yh = yh + dh
            rows.append((pdf[partition].iloc[0], n, h, dh, yh))
            prev2, prev = prev, dh
        return pd.DataFrame(rows, columns=cols)

    return t.groupBy(partition).applyInPandas(kernel, out_schema)
