"""LTTB downsampling — Largest-Triangle-Three-Buckets (Steinarsson 2013;
the TimescaleDB ``lttb`` hyperfunction analogue): reduce each source's
series to k visually-representative points, always keeping the endpoints
and, per bucket, the point forming the largest triangle with the previously
selected point and the next bucket's average.

Exactness design (the selection is certified value-for-value by a DuckDB
recursive-CTE oracle, ``lttb_sql``): coordinates are integers — millisecond
time offsets and micro-unit values, both computed in SPARK expressions so
kernel and SQL quantize identically — and the triangle-area comparison is
scaled by the next bucket's point count, turning the fractional average
into integer arithmetic:

    A' = | (t_prev·c − Σt)·(v − v_prev) − (t_prev − t)·(Σv − v_prev·c) |

Ties break by smallest (t, id). The bucket scan is sequential by nature
(each selection feeds the next bucket's triangles) → per-source Arrow
kernel, Python-int exact areas (they exceed int64).

Scale: kernels consume per-source series bounded by the retention tier they
read, like the model kernels; output is k rows/source.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def lttb(
    df: DataFrame,
    k: int,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Select k LTTB points per source → (source, event_id, sel_order).
    Series with ≤ k points pass through whole."""
    vq = F.round(F.col(value) * MICRO).cast("long")
    tms = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / 1000).cast("long")
    src = df.select(
        partition, F.col(id_col).alias("_id"), vq.alias("_vq"), tms.alias("_tms")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_tms", "_id"]).reset_index(drop=True)
        n = len(pdf)
        ids = pdf["_id"].tolist()
        name = pdf[partition].iloc[0]
        if n <= k:
            sel = list(range(n))
        else:
            t_raw = pdf["_tms"].tolist()
            t0 = min(t_raw)
            t = [x - t0 for x in t_raw]
            v = pdf["_vq"].tolist()
            nb = k - 2
            sel = [0]
            prev = 0
            for b in range(nb):
                lo = 1 + (b * (n - 2)) // nb
                hi = 1 + ((b + 1) * (n - 2)) // nb
                if b < nb - 1:
                    nlo = 1 + ((b + 1) * (n - 2)) // nb
                    nhi = 1 + ((b + 2) * (n - 2)) // nb
                else:
                    nlo, nhi = n - 1, n
                c = nhi - nlo
                st = sum(t[nlo:nhi])
                sv = sum(v[nlo:nhi])
                tp, vp = t[prev], v[prev]
                best_key, best_i = None, lo
                for i in range(lo, hi):
                    area = abs((tp * c - st) * (v[i] - vp) - (tp - t[i]) * (sv - vp * c))
                    key = (-area, t[i], ids[i])
                    if best_key is None or key < best_key:
                        best_key, best_i = key, i
                prev = best_i
                sel.append(prev)
            sel.append(n - 1)
        return pd.DataFrame(
            {
                partition: name,
                id_col: [ids[i] for i in sel],
                "sel_order": np.arange(len(sel), dtype=np.int32),
            }
        )

    return src.groupBy(partition).applyInPandas(
        kernel, schema=f"{partition} string, {id_col} long, sel_order int"
    )


def lttb_sql(k: int = 20) -> str:
    """DuckDB oracle for :func:`lttb` over the driver events table: the
    sequential bucket walk becomes a recursive CTE whose step picks each
    bucket's winner with a correlated NOT EXISTS (no aggregate/window in the
    recursive term); integer HUGEINT areas make every comparison exact."""
    nb = k - 2

    def area(p: str) -> str:
        return (
            f"abs((f.t * bk.c - bk.st) * ({p}.v - f.v)"
            f" - (f.t - {p}.t) * (bk.sv - f.v * bk.c))"
        )

    return f"""
WITH RECURSIVE s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vq,
         epoch_us(ts) // 1000 AS tms
  FROM events
), o AS (
  SELECT source, event_id, vq, tms,
         row_number() OVER (PARTITION BY source ORDER BY tms, event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY source) AS n,
         min(tms) OVER (PARTITION BY source) AS t0
  FROM s
), pts AS (
  SELECT source, idx, n, event_id AS eid,
         CAST(tms - t0 AS HUGEINT) AS t, CAST(vq AS HUGEINT) AS v
  FROM o
), bounds AS (
  SELECT source, max(n) AS n FROM pts GROUP BY source
), bks0 AS (
  SELECT source, n, unnest(range({nb})) AS b FROM bounds
), bks1 AS (
  SELECT source, n, b,
         1 + (b * (n - 2)) // {nb} AS lo,
         1 + ((b + 1) * (n - 2)) // {nb} AS hi,
         CASE WHEN b < {nb - 1} THEN 1 + ((b + 1) * (n - 2)) // {nb} ELSE n - 1 END AS nlo,
         CASE WHEN b < {nb - 1} THEN 1 + ((b + 2) * (n - 2)) // {nb} ELSE n END AS nhi
  FROM bks0
), bks AS (
  SELECT k1.source, k1.b, k1.lo, k1.hi,
         CAST(k1.nhi - k1.nlo AS HUGEINT) AS c,
         sum(p.t) AS st, sum(p.v) AS sv
  FROM bks1 k1 JOIN pts p ON p.source = k1.source AND p.idx >= k1.nlo AND p.idx < k1.nhi
  GROUP BY 1, 2, 3, 4, 5
), sel(source, b, idx, eid, t, v) AS (
  SELECT source, -1, idx, eid, t, v FROM pts WHERE idx = 0
  UNION ALL
  SELECT f.source, bk.b, p.idx, p.eid, p.t, p.v
  FROM sel f
  JOIN bks bk ON bk.source = f.source AND bk.b = f.b + 1
  JOIN pts p ON p.source = f.source AND p.idx >= bk.lo AND p.idx < bk.hi
  WHERE NOT EXISTS (
    SELECT 1 FROM pts p2
    WHERE p2.source = f.source AND p2.idx >= bk.lo AND p2.idx < bk.hi
      AND ({area("p2")} > {area("p")}
           OR ({area("p2")} = {area("p")}
               AND (p2.t < p.t OR (p2.t = p.t AND p2.eid < p.eid))))
  )
)
SELECT source, eid AS event_id, CAST(b + 1 AS INT) AS sel_order FROM sel
UNION ALL
SELECT source, eid, CAST({k - 1} AS INT) FROM pts WHERE idx = n - 1"""


def sax_symbols(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
    width: int = 8,
    alphabet: str = "abcd",
) -> DataFrame:
    """SAX-style symbolic discretization per source: PAA (piecewise
    aggregate approximation — the series in bucket order, cut into
    segments of ``width`` points, one aggregate per segment) followed by
    alphabet assignment, the classic time-series indexing/motif primitive
    (Lin et al., "Symbolic Aggregate approXimation").

    Exactness variant, documented deviation from the textbook: classical
    SAX z-normalizes (needs sqrt — not bit-reproducible cross-engine) and
    cuts at GAUSSIAN breakpoints; this implementation ranks each segment
    against the source's own EMPIRICAL quartiles instead — the same
    discretization capability (relative-level symbols), but every number
    stays exact: the trailing partial segment is dropped so segments have
    identical width and the integer segment SUM is a faithful proxy for
    the PAA mean; quartiles are taken on QUADRUPLED integer sums (the
    :func:`~forecaster_spark.operators.features.fit_robust` trick — the
    0.25-step interpolation lands on exact integers, independent of the
    interpolation's algebraic form), and symbol assignment is integer-vs-
    integral-double comparison. Equality goes to the higher symbol on
    both engines (``< q`` strictly).

    Plan: one shuffle for the per-source row index, one hash agg to
    segments, per-source quartiles as a tiny broadcast join. Alphabet is
    fixed at 4 symbols (quartiles) — the exactness argument is per-0.25
    steps; larger alphabets would need eighth-quanta etc.

    Output: (partition, seg, n_points, seg_sum, symbol)."""
    if alphabet != "abcd":
        raise ValueError("quartile SAX supports exactly 4 symbols ('abcd')")
    from pyspark.sql import Window

    w = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    idx = F.row_number().over(w) - 1
    segs = (
        df.withColumn("_seg", (idx / width).cast("long"))
        .groupBy(partition, F.col("_seg").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col(value).cast("long")).alias("seg_sum"),
        )
        .where(F.col("n_points") == width)
    )
    q = segs.groupBy(partition).agg(
        F.percentile(F.col("seg_sum") * 4, F.lit(0.25)).alias("_q1"),
        F.percentile(F.col("seg_sum") * 4, F.lit(0.5)).alias("_q2"),
        F.percentile(F.col("seg_sum") * 4, F.lit(0.75)).alias("_q3"),
    )
    s4 = F.col("seg_sum") * 4
    sym = (
        F.when(s4 < F.col("_q1"), F.lit("a"))
        .when(s4 < F.col("_q2"), F.lit("b"))
        .when(s4 < F.col("_q3"), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        segs.join(F.broadcast(q), partition)
        .select(partition, "seg", "n_points", "seg_sum", sym.alias("symbol"))
    )


def haar_multires(
    df: DataFrame,
    levels: int = 3,
    value: str = "y",
    partition: str = "source",
    order=("ts",),
) -> DataFrame:
    """Unnormalized Haar multi-resolution transform per series — the
    lossless complement of the tiered mean rollup: level-l smooth
    coefficients ARE 2^l-point block sums (what a rollup keeps), and the
    detail coefficients d_l,k = (first-half sum) − (second-half sum) are
    exactly the information each rollup tier throws away. Keep tiers +
    details and any resolution reconstructs bit-exactly (pinned in pytest);
    details also give the standard multi-scale energy/variance profile
    (Percival & Walden, "Wavelet Methods for Time Series Analysis").
    The 1/sqrt(2)^l normalization is deliberately omitted so every
    coefficient stays an exact BIGINT of the integer-valued input.

    Trailing blocks with fewer than 2^l points are dropped at that level
    (standard truncation; the completeness flag is the ``n`` filter).

    Plan shape: ONE ordered window to index rows, then a rollup-style
    cascade — level l aggregates level l−1's smooth sums pairwise, so data
    shrinks 2× per step (identical shape to the 1m→1h→1d cascade; no
    re-scan of the input per level). Overflow bound: 2^levels·max|y|
    < 2^63. Output: (partition, level, k, n, s_sum, d_diff)."""
    w = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    b = (
        df.withColumn("_idx", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("_yq", F.col(value).cast("long"))
    )
    sign1 = F.when(F.col("_idx") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    cur = b.groupBy(partition, F.expr("_idx div 2").alias("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_yq").alias("s_sum"),
        F.sum(F.col("_yq") * sign1).alias("d_diff"),
    )
    outs = [
        cur.where(F.col("n") == 2).select(
            partition, F.lit(1).cast("long").alias("level"), "k", "n", "s_sum", "d_diff"
        )
    ]
    for lev in range(2, levels + 1):
        signk = F.when(F.col("k") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
        cur = cur.groupBy(partition, F.expr("k div 2").alias("k")).agg(
            F.sum("n").alias("n"),
            F.sum("s_sum").alias("s_sum"),
            F.sum(F.col("s_sum") * signk).alias("d_diff"),
        )
        outs.append(
            cur.where(F.col("n") == (1 << lev)).select(
                partition,
                F.lit(lev).cast("long").alias("level"),
                "k",
                "n",
                "s_sum",
                "d_diff",
            )
        )
    out = outs[0]
    for g in outs[1:]:
        out = out.unionByName(g)
    return out
