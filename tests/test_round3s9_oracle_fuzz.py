"""Independent-reference fuzz of the round-3 session-9 additions (the
driver gate certifies Spark ≡ DuckDB; these close the both-engines-wrong
gap): winnowing vs a brute per-window reference + the MOSS shared-run
guarantee, VAR(1) vs a Fraction-exact normal-equation solve, largest-
remainder allocation vs Fraction quotas, readability vs the Fraction
formulas, and UL2 layout vs a pure-python splitmix replay."""

from fractions import Fraction

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from forecaster_spark.functions import xhash

duckdb = pytest.importorskip("duckdb")

WORDS = ["a", "bb", "ccc", "dd", "e", "fff", "gg", "über", "naï", "x1"]


def _brute_winnow(words, k=3, w=4):
    """Reference winnowing: explicit per-window (hash, pos) lexicographic min."""
    if len(words) < k:
        return set()
    hs = xhash.word_hash_flat(words)
    g = np.zeros(len(hs) - (k - 1), dtype=np.uint64)
    pw = xhash.pow_table(k)
    for j in range(k):
        g += hs[j : len(hs) - (k - 1) + j] * pw[j]
    g = xhash.splitmix64(g)
    mg = len(g)
    out = set()
    n_starts = mg - w + 1 if mg >= w else 1
    for s in range(n_starts):
        win = [(int(g[i]), i) for i in range(s, min(s + w, mg))]
        out.add(min(win)[::-1])
    return {(p, h) for p, h in out}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(WORDS), min_size=3, max_size=25))
def test_winnowing_sql_matches_brute(words):
    from forecaster_spark.functions.xhash_sql import winnowing_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [" ".join(words)])
    got = {
        (int(p), int(h) % (1 << 64))
        for _, p, h in con.execute(winnowing_sql()).fetchall()
    }
    assert got == _brute_winnow(words)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.sampled_from(WORDS), min_size=6, max_size=15),
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
)
def test_winnowing_moss_guarantee(shared, pre, post):
    """Two docs sharing a run of ≥ w+k−1 = 6 words share a fingerprint hash."""
    fp_a = {h for _, h in _brute_winnow(pre + shared)}
    fp_b = {h for _, h in _brute_winnow(shared + post)}
    assert fp_a & fp_b


def _frac_ols3(rows):
    """Fraction-exact [1, a1, b1] normal-equation solve; None if singular."""
    n = len(rows)
    s1 = sum(r[1] for r in rows)
    s2 = sum(r[2] for r in rows)
    s11 = sum(r[1] * r[1] for r in rows)
    s12 = sum(r[1] * r[2] for r in rows)
    s22 = sum(r[2] * r[2] for r in rows)
    sy = sum(r[0] for r in rows)
    sy1 = sum(r[0] * r[1] for r in rows)
    sy2 = sum(r[0] * r[2] for r in rows)
    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    cv = [sy, sy1, sy2]

    def det3(m):
        (a, b, c), (d, e, f), (g, h, i) = m
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    d = det3(A)
    if d == 0:
        return None
    return [
        Fraction(det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]), d)
        for j in range(3)
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-30, 30), min_size=6, max_size=20),
    st.lists(st.integers(-30, 30), min_size=6, max_size=20),
)
def test_var1_coefficients_near_fraction_exact(av, bv):
    """The kernel's h2d-division Cramer coefficients sit within 4 ulp of the
    Fraction-exact solution (each is ONE division of the same exact ints)."""
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    m = min(len(av), len(bv))
    av, bv = av[:m], bv[:m]
    rows_a = [(av[i], av[i - 1], bv[i - 1]) for i in range(1, m)]
    exact = _frac_ols3(rows_a)
    if exact is None:
        return
    n = len(rows_a)
    s1 = sum(r[1] for r in rows_a)
    s2 = sum(r[2] for r in rows_a)
    s11 = sum(r[1] * r[1] for r in rows_a)
    s12 = sum(r[1] * r[2] for r in rows_a)
    s22 = sum(r[2] * r[2] for r in rows_a)
    sy = sum(r[0] for r in rows_a)
    sy1 = sum(r[0] * r[1] for r in rows_a)
    sy2 = sum(r[0] * r[2] for r in rows_a)
    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    cv = [sy, sy1, sy2]

    def det3(mm):
        (a, b, c), (d, e, f), (g, h, i) = mm
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    d3 = det3(A)
    for j in range(3):
        num = det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)])
        got = h2d(num) / h2d(d3)
        want = float(exact[j])
        assert got == want or abs(got - want) <= 4 * abs(np.spacing(want))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(1, 10**9), min_size=1, max_size=12), st.integers(1, 10**5))
def test_largest_remainder_properties(weights, budget):
    """Σalloc = budget and every alloc within 1 of its Fraction quota."""
    tot = sum(weights)
    base = [budget * w // tot for w in weights]
    rem = [budget * w % tot for w in weights]
    left = budget - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = base[:]
    for i in order[:left]:
        alloc[i] += 1
    assert sum(alloc) == budget
    for w, a in zip(weights, alloc):
        q = Fraction(budget * w, tot)
        assert Fraction(a) >= q - 1 and Fraction(a) <= q + 1


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 3000), st.integers(1, 60), st.integers(0, 4000))
def test_readability_polynomials_match_fractions(W, S, Y):
    fk = Fraction(39 * W * W + 1180 * Y * S - 1559 * S * W, 100 * S * W)
    direct = Fraction(39, 100) * Fraction(W, S) + Fraction(118, 10) * Fraction(Y, W) - Fraction(1559, 100)
    assert fk == direct
    re_ = Fraction(206835 * S * W - 1015 * W * W - 84600 * Y * S, 1000 * S * W)
    dre = Fraction(206835, 1000) - Fraction(1015, 1000) * Fraction(W, S) - Fraction(846, 10) * Fraction(Y, W)
    assert re_ == dre


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 400))
def test_ul2_layout_invariants(doc_id, n):
    """Pure-python replay of the UL2 branch math: spans in bounds,
    non-overlapping for R/X (one per stratum), S covers the final quarter."""
    d = int(xhash.splitmix64(np.uint64(doc_id) * np.uint64(2654435761) + np.uint64(101)) % np.uint64(3))
    if d == 0 and n >= 3:
        L, k = 3, max(1, n * 15 // 300)
    elif d == 1 and n >= 12:
        L, k = 12, max(1, n // 40)
    elif d == 2 and n >= 4:
        s = n - n // 4
        assert 0 < n // 4 <= n and s + n // 4 == n
        return
    else:
        return
    prev_end = -1
    for i in range(k):
        lo, hi = i * n // k, (i + 1) * n // k
        wd = hi - lo - (L - 1)
        assert wd >= 1, (d, n, k, i)
        off = int(xhash.splitmix64(np.uint64(doc_id) * np.uint64(1000003) + np.uint64(i) * np.uint64(23)) % np.uint64(wd))
        start = lo + off
        assert lo <= start and start + L <= hi <= n
        assert start > prev_end
        prev_end = start + L - 1


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-40, 40), min_size=7, max_size=24))
def test_arima210_fraction_exact_coefficients(levels):
    """ARIMA(2,1,0) diff-AR coefficients via h2d-division Cramer sit within
    4 ulp of the Fraction-exact normal-equation solution, and the
    integrated forecast replays the kernel's exact chain."""
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    vv = np.asarray(levels, dtype=np.int64)
    dd = vv[1:] - vv[:-1]
    rows = [(int(dd[i]), int(dd[i - 1]), int(dd[i - 2])) for i in range(2, len(dd))]
    exact = _frac_ols3(rows)
    if exact is None:
        return
    n = len(rows)
    s1 = sum(r[1] for r in rows); s2 = sum(r[2] for r in rows)
    s11 = sum(r[1] * r[1] for r in rows); s12 = sum(r[1] * r[2] for r in rows)
    s22 = sum(r[2] * r[2] for r in rows)
    sy = sum(r[0] for r in rows)
    sy1 = sum(r[0] * r[1] for r in rows); sy2 = sum(r[0] * r[2] for r in rows)
    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    cv = [sy, sy1, sy2]

    def det3(mm):
        (a, b, c), (d, e, f), (g, h, i) = mm
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    d3 = det3(A)
    got = []
    for j in range(3):
        num = det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)])
        gj = h2d(num) / h2d(d3)
        want = float(exact[j])
        assert gj == want or abs(gj - want) <= 4 * abs(np.spacing(want))
        got.append(gj)
    b0, b1, b2 = got
    prev, prev2, yh = float(dd[-1]), float(dd[-2]), float(vv[-1])
    for _ in range(4):
        dh = (b0 + prev * b1) + prev2 * b2
        yh = yh + dh
        assert np.isfinite(yh)
        prev2, prev = prev, dh


def _brute_rake(texts, stopwords, k=30):
    import re
    from collections import defaultdict

    freq, deg = defaultdict(int), defaultdict(int)
    for t in texts:
        words = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        run, runs = [], []
        for w in words:
            if w in stopwords:
                if run:
                    runs.append(run)
                run = []
            else:
                run.append(w)
        if run:
            runs.append(run)
        for r in runs:
            for w in r:
                freq[w] += 1
                deg[w] += len(r)
    rows = sorted(
        ((w, freq[w], deg[w], deg[w] / freq[w]) for w in freq),
        key=lambda r: (-r[3], r[0]),
    )
    return rows[:k]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["the", "and", "of", "fox", "data", "query", "big", "x1", "roll"]),
            min_size=0,
            max_size=20,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_rake_sql_matches_brute(texts):
    import __spark_entry__ as entry
    from forecaster_spark.operators.textops import STOPWORDS

    sw = {w for sws in STOPWORDS.values() for w in sws}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = con.execute(entry.oracle_sql()["rake_keywords_documents"]).fetchall()
    want = _brute_rake(texts, sw)
    assert [(r[0], r[1], r[2]) for r in got] == [(r[0], r[1], r[2]) for r in want]
    for g, w in zip(got, want):
        assert g[3] == w[3]


def _brute_siegel_quantized(vals):
    """Brute reference of the quantized Siegel recipe: per-point median of
    doubled-milli floor-div pair slopes, then the median of medians."""
    n = len(vals)

    def med(xs):
        xs = sorted(xs)
        c = len(xs)
        a, b = xs[(c + 1) // 2 - 1], xs[c // 2]
        return (a + b) / 2

    per_i = []
    for i in range(n):
        slopes = []
        for j in range(n):
            if j == i:
                continue
            dv, dt = (vals[j] - vals[i]) * 1000, j - i
            slopes.append((dv - ((dv % dt + dt) % dt)) // dt * 2 if dt > 0
                          else ((-dv) - (((-dv) % (-dt) + (-dt)) % (-dt))) // (-dt) * 2)
        per_i.append(med(slopes))
    slope = med(per_i) / 2000.0
    resid = [float(v) - slope * i for i, v in enumerate(vals)]
    return slope, med(resid)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=2, max_size=14))
def test_siegel_sql_matches_brute(vals):
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    base = 1_700_000_000_000_000
    for i, v in enumerate(vals):
        con.execute(
            "INSERT INTO events VALUES (?, make_timestamp(?), 0, 's', ?, '')",
            [i, base + i * 3_600_000_000, float(v)],
        )
    rows = con.execute(entry.oracle_sql()["siegel_slopes_events_1h"]).fetchall()
    assert len(rows) == 1
    _, n_points, slope, intercept = rows[0]
    bs, bi = _brute_siegel_quantized(vals)
    assert n_points == len(vals) and slope == bs and intercept == bi


def test_siegel_breakdown_beats_theil_sen_style_corruption():
    """40% of points corrupted upward: the repeated median still recovers
    the clean slope (quantized), where the plain pair-median would not."""
    clean = [3 * i for i in range(20)]
    corrupted = list(clean)
    for i in range(0, 20, 5):  # 4/20 points wild
        corrupted[i] += 10_000
    for i in range(1, 20, 7):  # +3 more → 7/20 = 35%
        corrupted[i] += 7_000
    slope, _ = _brute_siegel_quantized(corrupted)
    assert abs(slope - 3.0) < 0.5
