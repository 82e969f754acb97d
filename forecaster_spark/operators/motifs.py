"""Matrix profile — all-subsequence nearest-neighbor distances per series.

The matrix profile (Yeh et al., "Matrix Profile I", ICDM 2016 — public
literature) is the modern workhorse for motif discovery (minima = the two
most similar subsequences) and discord/anomaly detection (maxima = the
subsequence least like any other).  The reference Forecaster has no motif
operator; this is an engine-added capability for the rolled tiers, the same
role its AR diagnostics play for model order selection (reference
ar_yw.py builds autocovariances; the profile is the non-linear analogue).

Design for scale
----------------
The profile is computed per SERIES over a ROLLED tier (1h buckets → n is
bounded by the retention span, ~720 points/month, regardless of raw row
count), never over raw events.  One shuffle on ``source`` feeds an Arrow
``applyInPandas`` kernel; each task is O(n²·m) integer ops on a few
thousand points — microseconds of numpy per series, embarrassingly
parallel across sources.  At 10^12-sequence scale the cost is the rollup
(already tiered); the profile adds a bounded per-series pass.

Exactness
---------
Distances are UNNORMALIZED SQUARED Euclidean on the floor-quantized
integer micro-unit bucket means (``sum_micro div cnt``): every distance is
an exact BIGINT, reproducible bit-for-bit in SQL (DuckDB self-join over
the same lag matrix).  No sqrt, no z-normalization — those introduce
BLAS/libm floats that are not cross-engine reproducible (CLAUDE.md); for
motif RANKING on a single series' scale the squared distance is
order-equivalent.  Bound: with |v| ≤ V micro-units, mp ≤ m·(2V)²; for the
events corpus (V ≈ 6·10^8, m=4) that is ~1.4·10^18 < 2^63 — documented,
ANSI-safe.  Trivial matches are excluded with the standard |i-j| >= m
zone.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def matrix_profile_kernel(v: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact int64 squared-distance matrix profile of one series.

    Returns (mp, nn): for each of the n-m+1 subsequences, the minimum
    squared distance to any subsequence starting at |i-j| >= m, and the
    position of that nearest neighbor (smallest j on ties — matches the
    SQL oracle's ``ORDER BY d, j LIMIT 1``).  O(n²·m) int64 ops, n is
    tier-bounded.
    """
    v = v.astype(np.int64)
    n_sub = v.size - m + 1
    if n_sub < 1:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # lag matrix: subs[i, k] = v[i + k]
    subs = np.lib.stride_tricks.sliding_window_view(v, m).astype(np.int64)
    # full pairwise squared distances, accumulated one lag at a time to
    # keep peak memory at O(n_sub²) int64 (no n_sub²·m intermediate)
    d = np.zeros((n_sub, n_sub), dtype=np.int64)
    for k in range(m):
        diff = subs[:, k][:, None] - subs[None, :, k]
        d += diff * diff
    idx = np.arange(n_sub)
    excl = np.abs(idx[:, None] - idx[None, :]) < m
    big = np.iinfo(np.int64).max
    d[excl] = big
    nn = np.argmin(d, axis=1)  # first minimum = smallest j on ties
    mp = d[idx, nn]
    # a series shorter than 2m has no valid neighbor for some positions
    valid = mp != big
    return np.where(valid, mp, -1), np.where(valid, nn, -1)


def matrix_profile(
    buckets: DataFrame,
    m: int = 4,
    value_micro: str = "v_micro",
    order: str = "bucket_start",
) -> DataFrame:
    """Squared-distance matrix profile per source over a rolled tier.

    ``buckets``: one row per (source, bucket) with an exact BIGINT
    ``value_micro`` signal (e.g. ``sum_micro div cnt``) — gap-free or not;
    positions index the ORDERED bucket sequence, as in the SQL oracle.

    Output: (source, pos, mp_sq, nn_pos) — BIGINTs; mp_sq = -1 where no
    valid neighbor exists (series shorter than 2m).
    Plan: one shuffle on source; Arrow kernel per series.
    """
    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("pos", LongType()),
            StructField("mp_sq", LongType()),
            StructField("nn_pos", LongType()),
        ]
    )

    def _per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        v = pdf[value_micro].to_numpy(np.int64)
        mp, nn = matrix_profile_kernel(v, m)
        return pd.DataFrame(
            {
                "source": pdf["source"].iloc[0],
                "pos": np.arange(mp.size, dtype=np.int64),
                "mp_sq": mp,
                "nn_pos": nn,
            }
        )

    return (
        buckets.select("source", order, value_micro)
        .groupBy("source")
        .applyInPandas(_per_series, schema)
    )


def discords(profile: DataFrame, k: int = 3) -> DataFrame:
    """Top-k discords per source: positions whose nearest neighbor is
    FARTHEST (the classic matrix-profile anomaly read).  Deterministic
    tie-break on position.  Output: (source, rank, pos, mp_sq)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("mp_sq"), F.asc("pos"))
    )
    return (
        profile.where(F.col("mp_sq") >= 0)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("source", "rank", "pos", "mp_sq")
    )
