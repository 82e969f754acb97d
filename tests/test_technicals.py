"""Kernel-level tests for the round-3 indicator operators: the matrix
profile numpy kernel against a brute-force Python reference (Hypothesis
fuzz — exactness is claimed as BIGINT-exact, so the comparison is ==),
plus golden cases for the Bollinger cross-multiplied breakout algebra and
the Cutler RSI floor division, checked against plain-float formulas on
tie-free inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from forecaster_spark.operators.motifs import matrix_profile_kernel


def _brute_profile(v, m):
    """O(n²·m) pure-Python reference with the same |i-j| >= m zone and
    smallest-j tie-break."""
    n_sub = len(v) - m + 1
    mp, nn = [], []
    for i in range(n_sub):
        best, bj = None, -1
        for j in range(n_sub):
            if abs(i - j) < m:
                continue
            d = sum((v[i + k] - v[j + k]) ** 2 for k in range(m))
            if best is None or d < best:
                best, bj = d, j
        mp.append(-1 if best is None else best)
        nn.append(bj)
    return mp, nn


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(-(10**8), 10**8), min_size=1, max_size=40),
    st.integers(2, 5),
)
def test_matrix_profile_kernel_matches_brute(vals, m):
    v = np.array(vals, dtype=np.int64)
    mp, nn = matrix_profile_kernel(v, m)
    bmp, bnn = _brute_profile(vals, m)
    assert mp.tolist() == bmp
    assert nn.tolist() == bnn


def test_matrix_profile_short_series():
    # shorter than one subsequence → empty; shorter than 2m → all -1
    mp, nn = matrix_profile_kernel(np.array([1, 2], dtype=np.int64), 4)
    assert mp.size == 0
    mp, nn = matrix_profile_kernel(np.array([1, 2, 3, 4, 5], dtype=np.int64), 4)
    assert mp.tolist() == [-1, -1] and nn.tolist() == [-1, -1]


def test_matrix_profile_planted_motif():
    # two identical subsequences far apart → both get mp 0, pointing at
    # each other; the spike position is the discord (max mp)
    rng = np.random.default_rng(7)
    v = rng.integers(0, 1000, 64).astype(np.int64)
    v[10:14] = [5, 9, 5, 9]
    v[40:44] = [5, 9, 5, 9]
    v[25] = 10**6
    mp, nn = matrix_profile_kernel(v, 4)
    assert mp[10] == 0 and nn[10] == 40
    assert mp[40] == 0 and nn[40] == 10
    assert int(np.argmax(mp)) in range(22, 26)  # spike window dominates


def _bollinger_flags(vals, window, k):
    """Exact-rational reference for the integer cross-multiplied breakout
    test. Must be Fraction, not float: at exact ties (dev² == k²·σ², e.g.
    vals=[1,1,1,1,0]) float rounding of mu=4/5 flips the strict comparison,
    while both the integer form and this reference agree the tie is not a
    breakout (Hypothesis found the tie case)."""
    from fractions import Fraction

    out = []
    for i in range(len(vals)):
        fr = vals[max(0, i - window + 1) : i + 1]
        n = len(fr)
        mu = Fraction(sum(fr), n)
        var = sum((x - mu) ** 2 for x in fr) / n
        dev = vals[i] - mu
        out.append((dev > 0 and dev * dev > k * k * var,
                    dev < 0 and dev * dev > k * k * var))
    return out


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 10**5), min_size=1, max_size=60))
def test_bollinger_integer_form_matches_float(vals):
    # (n·v − S)² > k²(n·Q − S²)  ≡  (v − S/n)² > k²·σ²  for exact ints
    # (Fraction-free: both sides of the integer form are the float form
    # scaled by n², and all magnitudes here are far below 2^53)
    window, k = 24, 2
    S = Q = 0
    flags = []
    buf = []
    for v in vals:
        buf.append(v)
        if len(buf) > window:
            buf.pop(0)
        n = len(buf)
        S = sum(buf)
        Q = sum(x * x for x in buf)
        dev = n * v - S
        var_n2 = n * Q - S * S
        flags.append((dev > 0 and dev * dev > k * k * var_n2,
                      dev < 0 and dev * dev > k * k * var_n2))
    assert flags == _bollinger_flags(vals, window, k)


def test_rsi_floor_division_golden():
    # window of deltas: +10, -5, +5, 0 → G=15, L=5 → rsi = 75%
    g, l = 15, 5
    assert (1_000_000 * g) // (g + l) == 750_000
    # all-gain → 100%, all-loss → 0%
    assert (1_000_000 * 7) // 7 == 1_000_000
    assert (1_000_000 * 0) // 9 == 0


def test_dtw_pairs_vs_brute_dp(spark):
    """The prefix-scan row DP must equal the textbook three-way-min DP on
    random integer pairs, give 0 for identical series, and beat lock-step
    distance on a phase-shifted copy."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.technicals import dtw_distance_pairs

    def brute(a, b):
        INF = float("inf")
        n, m = len(a), len(b)
        dp = [[INF] * (m + 1) for _ in range(n + 1)]
        dp[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                c = abs(a[i - 1] - b[j - 1])
                dp[i][j] = c + min(dp[i - 1][j], dp[i - 1][j - 1], dp[i][j - 1])
        return dp[n][m]

    rng = np.random.RandomState(7)
    base = list(rng.randint(0, 200, size=40))
    shifted = base[3:] + base[:3]
    series = {
        "a_base": base,
        "b_shift": shifted,
        "c_rand": list(rng.randint(0, 200, size=33)),
        "d_same": list(base),
    }
    rows = []
    for src, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (src, (pd.Timestamp("2025-01-01") + pd.Timedelta(hours=i)).to_pydatetime(), float(v))
            )
    df = spark.createDataFrame(rows, "source string, ts timestamp, y double")
    out = {
        (r["source_a"], r["source_b"]): r
    for r in dtw_distance_pairs(df, value="y", order="ts").collect()}
    assert len(out) == 6
    for (sa, sb), r in out.items():
        want = brute(series[sa], series[sb])
        assert r["dtw"] == want, (sa, sb, r["dtw"], want)
        assert r["dtw_norm"] == r["dtw"] / (r["n_a"] + r["n_b"])
    assert out[("a_base", "d_same")]["dtw"] == 0
    # elastic: DTW of the shifted copy is far below its lock-step distance
    lock = sum(abs(x - y) for x, y in zip(base, shifted))
    assert out[("a_base", "b_shift")]["dtw"] < lock // 3
