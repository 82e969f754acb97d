"""Hypothesis fuzz of the round-3 session-8 additions against independent
references (the driver gate certifies Spark ≡ DuckDB; this closes the
both-engines-wrong gap): PAVA vs the exact minimax characterization, the
DTW prefix-scan row DP vs the textbook three-way-min DP, and the
trending-token slope numerator vs Fraction polyfit."""

from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _pava_blocks(vals):
    sums, cnts = [], []
    for x in vals:
        s, c = int(x), 1
        while sums and sums[-1] * c > s * cnts[-1]:
            s += sums.pop()
            c += cnts.pop()
        sums.append(s)
        cnts.append(c)
    return sums, cnts


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=12))
def test_pava_matches_minimax(vals):
    sums, cnts = _pava_blocks(vals)
    fit = []
    for s, c in zip(sums, cnts):
        fit += [Fraction(s, c)] * c
    n = len(vals)
    assert len(fit) == n and sum(cnts) == n and sum(sums) == sum(vals)
    for i in range(n):
        want = max(
            min(Fraction(sum(vals[j : k + 1]), k + 1 - j) for k in range(i, n))
            for j in range(i + 1)
        )
        assert fit[i] == want


def _dtw_rows(a, b):
    INF = 1 << 60
    av = np.asarray(a, dtype=np.int64)
    bv = np.asarray(b, dtype=np.int64)
    prev = np.cumsum(np.abs(av[0] - bv))
    for i in range(1, len(av)):
        c = np.abs(av[i] - bv)
        s = np.cumsum(c)
        m = np.minimum(prev, np.concatenate(([INF], prev[:-1])))
        pm = np.minimum.accumulate(m - (s - c))
        prev = s + pm
    return int(prev[-1])


def _dtw_brute(a, b):
    INF = float("inf")
    n, m = len(a), len(b)
    dp = [[INF] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            dp[i][j] = c + min(dp[i - 1][j], dp[i - 1][j - 1], dp[i][j - 1])
    return dp[n][m]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=15),
    st.lists(st.integers(0, 1000), min_size=1, max_size=15),
)
def test_dtw_prefix_scan_matches_brute(a, b):
    assert _dtw_rows(a, b) == _dtw_brute(a, b)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 40), min_size=8, max_size=8))
def test_trending_slope_numerator_matches_polyfit(counts):
    D = 8
    sum_d = D * (D - 1) // 2
    den = D * (D - 1) * D * (2 * D - 1) // 6 - sum_d * sum_d
    num = D * sum(d * c for d, c in enumerate(counts)) - sum_d * sum(counts)
    want = Fraction(num, den)
    # independent least-squares slope via Fraction normal equations
    n = D
    sx = Fraction(sum(range(D)))
    sy = Fraction(sum(counts))
    sxx = Fraction(sum(d * d for d in range(D)))
    sxy = Fraction(sum(d * c for d, c in enumerate(counts)))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert want == slope


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=25, max_size=60))
def test_ensemble_error_identity(vals):
    """9-scaled combined error == 9 * (y - mean of the three baselines)."""
    for t in range(24, len(vals)):
        y, l1, l2, l3, ls = vals[t], vals[t - 1], vals[t - 2], vals[t - 3], vals[t - 24]
        e9 = 9 * y - (4 * l1 + l2 + l3 + 3 * ls)
        f = Fraction(l1 + ls + Fraction(l1 + l2 + l3, 3), 3)
        assert Fraction(e9, 9) == y - f
