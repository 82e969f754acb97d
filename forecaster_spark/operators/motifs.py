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


def sample_entropy_kernel(v: np.ndarray, m: int = 2) -> tuple[int, int, int]:
    """Exact SampEn match counts for one integer series.

    Returns (r4, b_cnt, a_cnt): r4 = 4*IQR as an exact integer (quartiles
    by the standard linear interpolation at (n-1)/4 and 3(n-1)/4, whose
    quadrupled values are integers — the robust-scaler recipe); b_cnt =
    #{i<j : max_{k<m} |v[i+k]-v[j+k]| <= IQR/2} (compared as
    8*|diff| <= r4, all integers); a_cnt = the same with m+1.
    O(n^2) int64 ops; n is tier-bounded.
    """
    v = v.astype(np.int64)
    n = v.size
    vs = np.sort(v)
    def _q4(num: int) -> int:
        lo, r = divmod(num, 4)
        hi = min(lo + 1, n - 1)
        return int(vs[lo]) * (4 - r) + int(vs[hi]) * r
    r4 = _q4(3 * (n - 1)) - _q4(n - 1)
    c = 8 * np.abs(v[:, None] - v[None, :]) <= r4
    if n < m + 2:
        return r4, 0, 0
    # Richman-Moorman convention: BOTH counts range over the n-m template
    # starts 0..n-m-1 (so every length-m template has an (m+1)-extension)
    sz = n - m
    bmat = c[:sz, :sz].copy()
    for k in range(1, m):
        bmat &= c[k : k + sz, k : k + sz]
    b_cnt = int(np.triu(bmat, 1).sum())
    amat = bmat & c[m : m + sz, m : m + sz]
    a_cnt = int(np.triu(amat, 1).sum())
    return r4, b_cnt, a_cnt


def sample_entropy(
    buckets: DataFrame,
    m: int = 2,
    value_micro: str = "v_micro",
    order: str = "bucket_start",
) -> DataFrame:
    """Sample-entropy match counts per series (Richman & Moorman, Am. J.
    Physiol. 2000) over a rolled tier — the regularity/complexity screen:
    SampEn = -ln(A/B) where B counts length-m template matches within
    tolerance r and A counts length-(m+1) matches.  Low A/B (high SampEn)
    = irregular series; A/B near 1 = highly self-similar.  The
    complexity companion of the Bandt-Pompe ordinal patterns (which see
    only ORDER, not amplitude) and the matrix profile (nearest neighbor
    only; SampEn counts ALL near template pairs).

    Exactness: tolerance r = IQR/2 with quadrupled-integer quartiles
    (engine-independent of the interpolation's algebraic form), matches
    compared as 8*|diff| <= r4 — every count is an exact integer; ln is
    deliberately NOT taken (libm is banned) — the ratio A/B is the single
    correctly-rounded division, monotone in SampEn.

    Plan shape: one shuffle on the series key into an Arrow kernel;
    O(n^2) boolean numpy per series, n tier-bounded (~720/month).  The
    SQL oracle replays the pair counts as a DuckDB self-join.

    Output: (source, n, r4, b_cnt, a_cnt, ratio).
    """
    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("n", LongType()),
            StructField("r4", LongType()),
            StructField("b_cnt", LongType()),
            StructField("a_cnt", LongType()),
        ]
    )

    def _per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        v = pdf[value_micro].to_numpy(np.int64)
        if v.size < 2:
            return pd.DataFrame(
                {"source": pdf["source"].iloc[:0], "n": [], "r4": [], "b_cnt": [], "a_cnt": []}
            )
        r4, b_cnt, a_cnt = sample_entropy_kernel(v, m)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n": [v.size],
                "r4": [r4],
                "b_cnt": [b_cnt],
                "a_cnt": [a_cnt],
            }
        )

    out = (
        buckets.select("source", order, value_micro)
        .groupBy("source")
        .applyInPandas(_per_series, schema)
    )
    return out.select(
        "source",
        "n",
        "r4",
        "b_cnt",
        "a_cnt",
        F.when(
            F.col("b_cnt") > 0, F.col("a_cnt").cast("double") / F.col("b_cnt").cast("double")
        ).alias("ratio"),
    )
