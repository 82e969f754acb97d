"""Hypothesis fuzz of the round-3 session-3 contract ORACLES against
independent pure-Python references (same design as
test_round3_oracle_fuzz.py: the driver gate certifies Spark ≡ DuckDB;
this closes the both-engines-wrong gap).  No Spark session — each
example replays the oracle SQL in a fresh in-memory DuckDB."""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import assume, given, settings
from hypothesis import strategies as st

spec = importlib.util.spec_from_file_location("entry_fuzz_s3", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)
ORACLES = _entry.oracle_sql()

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _events_pdf(milli_vals, step_minutes=20, event_type="s"):
    rows = []
    for i, mv in enumerate(milli_vals):
        rows.append(
            {
                "event_id": i,
                "ts": (_T0 + timedelta(minutes=step_minutes * i)).replace(tzinfo=None),
                "user_id": i % 7,
                "event_type": event_type,
                "value": mv / 1000.0,
            }
        )
    return pd.DataFrame(rows)


def _run(key, events=None, documents=None):
    con = duckdb.connect()
    if events is not None:
        con.register("events", events)
    if documents is not None:
        con.register("documents", documents)
    return con.execute(ORACLES[key]).df()


def _hourly(milli_vals, step_minutes=20):
    """Replay the oracle's hourly CTE: floor(sum(round(v*1e6))/1e6/cnt)
    per hour bucket, in the same IEEE op order."""
    buckets = {}
    for i, mv in enumerate(milli_vals):
        h = (step_minutes * i) // 60
        micro = round((mv / 1000.0) * 1e6)
        buckets.setdefault(h, []).append(int(micro))
    out = []
    for h in sorted(buckets):
        ms = buckets[h]
        out.append(int(math.floor(sum(ms) / 1e6 / len(ms))))
    return out


milli_series = st.lists(st.integers(0, 600_000), min_size=24, max_size=90)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_conformal_oracle_vs_brute(mv):
    y = _hourly(mv)
    hh = 6
    assume(len(y) >= hh + 3)
    got = _run("conformal_interval_events_1h", events=_events_pdf(mv))
    n = len(y)
    ncal = n - hh - 1
    res = sorted(
        (abs(y[t] - y[t - 1]), t) for t in range(1, n - hh)
    )  # (r, idx) — rank ties broken by idx exactly like the ORDER BY
    k = min((((ncal + 1) * 7) + 7) // 8, ncal)
    q = res[k - 1][0]
    assert len(got) == hh
    g = got.sort_values("ts").reset_index(drop=True)
    for j in range(hh):
        t = n - hh + j
        assert int(g.loc[j, "y"]) == y[t]
        assert int(g.loc[j, "fc"]) == y[t - 1]
        assert int(g.loc[j, "q"]) == q
        assert bool(g.loc[j, "covered"]) == (abs(y[t] - y[t - 1]) <= q)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_dominant_period_oracle_vs_brute(mv):
    y = _hourly(mv)
    assume(len(y) >= 4)
    got = _run("dominant_period_events_1h", events=_events_pdf(mv)).iloc[0]
    n = len(y)
    s = sum(y)
    m = abs(s) // n * (1 if s >= 0 else -1)
    dev = [v - m for v in y]
    best = None
    for k in range(2, min(48, n - 1) + 1):
        g = sum(dev[i] * dev[i - k] for i in range(k, n))
        if best is None or g > best[1]:
            best = (k, g)
    assert (int(got.period), int(got.gamma)) == best


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-(10**9), 10**9), min_size=1, max_size=80))
def test_benford_oracle_vs_brute(mv):
    got = _run("benford_digits_events", events=_events_pdf(mv))
    micro = [round((m / 1000.0) * 1e6) for m in mv]
    nz = [abs(int(x)) for x in micro if x != 0]
    assume(nz)
    counts = {d: 0 for d in range(1, 10)}
    for x in nz:
        counts[int(str(x)[0])] += 1
    n = len(nz)
    g = got.set_index("digit")
    assert len(g) == 9
    from forecaster_spark.operators.stats_tests import BENFORD_PPM

    tvd = 0
    for d in range(1, 10):
        assert int(g.loc[d, "cnt"]) == counts[d]
        obs = (counts[d] * 1_000_000) // n
        tvd += abs(obs - BENFORD_PPM[d - 1])
        assert int(g.loc[d, "obs_ppm"]) == obs
    assert set(int(x) for x in g["tvd_ppm"]) == {tvd}


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_pinball_oracle_vs_brute(mv):
    y = _hourly(mv)
    assume(len(y) >= 2)
    got = _run("pinball_qof_events_1h", events=_events_pdf(mv))
    pairs = [(y[t], y[t - 1]) for t in range(1, len(y))]
    for num, den in ((1, 4), (2, 4), (3, 4)):
        row = got[(got.tau_num == num)].iloc[0]
        dl = sum(max(num * (a - f), (num - den) * (a - f)) for a, f in pairs)
        assert int(row.den_loss_sum) == dl
        assert int(row.mean_milli) == (1000 * dl) // (len(pairs) * den)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_kpss_oracle_vs_brute(mv):
    y = _hourly(mv)
    assume(len(y) >= 2)
    got = _run("kpss_level_events_1h", events=_events_pdf(mv)).iloc[0]
    n, s = len(y), sum(y)
    dd = [n * v - s for v in y]
    st_, acc = 0, []
    for d in dd:
        st_ += d
        acc.append(st_)
    s2 = sum(x * x for x in acc)
    d2 = sum(x * x for x in dd)
    assert int(got.dev2_sum) == d2
    if d2:
        from forecaster_spark.oracle.ref import hugeint_to_double as h2d

        assert got.eta == h2d(s2) / h2d(n * d2)
        assert bool(got.level_stationary_5pct) == (got.eta < 0.463)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_dickey_fuller_oracle_vs_reference(mv):
    y = _hourly(mv)
    assume(len(y) >= 4)
    got = _run("dickey_fuller_events_1h", events=_events_pdf(mv)).iloc[0]
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    z = y[:-1]
    dy = [y[t] - y[t - 1] for t in range(1, len(y))]
    n = len(dy)
    sz, sd = sum(z), sum(dy)
    szz = sum(a * a for a in z)
    sdz = sum(a * b for a, b in zip(dy, z))
    d2 = n * szz - sz * sz
    bh = h2d(n * sdz - sz * sd) / h2d(d2) if d2 else 0.0
    ah = h2d(sd * szz - sz * sdz) / h2d(d2) if d2 else 0.0
    rss = sum(int(math.floor((e * e) * 1e6)) for e in (float(v) - (ah + zz * bh) for v, zz in zip(dy, z)))
    assert got.b_hat == bh
    assert int(got.rss_q) == rss
    if rss > 0 and n > 2 and d2 != 0:
        s2 = float(rss) / 1e6 / (n - 2)
        t = bh / math.sqrt(s2 * float(n) / float(d2))
        assert got.t_stat == t


@settings(max_examples=60, deadline=None)
@given(milli_series)
def test_ar_order_select_oracle_vs_reference(mv):
    y = _hourly(mv)
    assume(len(y) >= 8)
    got = _run("ar_order_select_events_1h", events=_events_pdf(mv)).iloc[0]
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    yv = y[3:]
    lags = [y[3 - k : len(y) - k] for k in (1, 2, 3)]
    n = len(yv)

    def det(m):
        k = len(m)
        if k == 1:
            return m[0][0]
        return sum(
            (1 if j % 2 == 0 else -1)
            * m[0][j]
            * det([[m[r][c] for c in range(k) if c != j] for r in range(1, k)])
            for j in range(k)
        )

    def fit(p):
        cols = [[1] * n] + lags[:p]
        A = [[sum(a * b for a, b in zip(cols[i], cols[j])) for j in range(p + 1)] for i in range(p + 1)]
        c = [sum(a * b for a, b in zip(cols[i], yv)) for i in range(p + 1)]
        dd = det(A)
        if dd == 0:
            beta = [h2d(c[0]) / h2d(A[0][0])] + [0.0] * p
        else:
            beta = [
                h2d(det([[c[i] if jj == j else A[i][jj] for jj in range(p + 1)] for i in range(p + 1)]))
                / h2d(dd)
                for j in range(p + 1)
            ]
        rss = 0
        for t in range(n):
            fc = beta[0]
            for k in range(1, p + 1):
                fc = fc + float(lags[k - 1][t]) * beta[k]
            e = float(yv[t]) - fc
            rss += int(math.floor((e * e) * 1e6))
        return rss

    r1, r2, r3 = fit(1), fit(2), fit(3)
    assert (int(got.rss1_q), int(got.rss2_q), int(got.rss3_q)) == (r1, r2, r3)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 600_000), min_size=24, max_size=60),
    st.lists(st.integers(0, 600_000), min_size=24, max_size=60),
)
def test_granger_oracle_vs_reference(mva, mvb):
    n_shared = min(len(mva), len(mvb))
    mva, mvb = mva[:n_shared], mvb[:n_shared]
    ea = _events_pdf(mva, event_type="a")
    eb = _events_pdf(mvb, event_type="b")
    eb["event_id"] += len(ea)
    ya, yb = _hourly(mva), _hourly(mvb)
    assume(len(ya) == len(yb) >= 5)
    got = _run("granger_pairs_events_1h", events=pd.concat([ea, eb], ignore_index=True))
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    def ref(y, x):
        yv, l1y, l1x = y[1:], y[:-1], x[:-1]
        n = len(yv)
        sl, sx, sy = sum(l1y), sum(l1x), sum(yv)
        sll = sum(a * a for a in l1y)
        slx = sum(a * b for a, b in zip(l1y, l1x))
        sxx = sum(a * a for a in l1x)
        syl = sum(a * b for a, b in zip(yv, l1y))
        syx = sum(a * b for a, b in zip(yv, l1x))
        d2 = n * sll - sl * sl
        if d2 == 0:
            b0r, b1r = h2d(sy) / h2d(n), 0.0
        else:
            b0r = h2d(sy * sll - sl * syl) / h2d(d2)
            b1r = h2d(n * syl - sl * sy) / h2d(d2)

        def det3(m):
            (a, b, c), (d, e, f), (g, h, i) = m
            return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

        A = [[n, sl, sx], [sl, sll, slx], [sx, slx, sxx]]
        cv = [sy, syl, syx]
        d3 = det3(A)
        if d3 == 0:
            b0f, b1f, b2f = h2d(sy) / h2d(n), 0.0, 0.0
        else:
            nums = [
                det3([[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)])
                for j in range(3)
            ]
            b0f, b1f, b2f = (h2d(v) / h2d(d3) for v in nums)
        rr = sum(
            int(math.floor((e * e) * 1e6))
            for e in (float(v) - (b0r + float(l) * b1r) for v, l in zip(yv, l1y))
        )
        rf = sum(
            int(math.floor((e * e) * 1e6))
            for e in (
                float(v) - ((b0f + float(l) * b1f) + float(xx) * b2f)
                for v, l, xx in zip(yv, l1y, l1x)
            )
        )
        return rr, rf, b2f

    g = got.set_index(["y_source", "x_source"])
    for ys, xs, yy, xx in (("a", "b", ya, yb), ("b", "a", yb, ya)):
        rr, rf, b2f = ref(yy, xx)
        row = g.loc[(ys, xs)]
        assert int(row.rss_r_q) == rr and int(row.rss_f_q) == rf
        assert row.b_cross == b2f


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 600_000), min_size=55, max_size=90))
def test_auto_seasonal_oracle_vs_brute(mv):
    # one event per hour so the tier has >= 52 buckets (t>=48 window + slack)
    y = _hourly(mv, step_minutes=60)
    assume(len(y) >= 52)
    got = _run("auto_seasonal_qof_events_1h", events=_events_pdf(mv, step_minutes=60)).iloc[0]
    n = len(y)
    s = sum(y)
    m = abs(s) // n * (1 if s >= 0 else -1)
    dev = [v - m for v in y]
    best = None
    for k in range(2, min(48, n - 1) + 1):
        g = sum(dev[i] * dev[i - k] for i in range(k, n))
        if best is None or g > best[1]:
            best = (k, g)
    P = best[0]
    errs = [y[t] - y[t - P] for t in range(48, n)]
    assert int(got.period) == P
    assert int(got.sae) == sum(abs(e) for e in errs)
    assert int(got.sse) == sum(e * e for e in errs)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_arch_lm_oracle_vs_reference(mv):
    y = _hourly(mv)
    assume(len(y) >= 5)
    got = _run("arch_lm_events_1h", events=_events_pdf(mv)).iloc[0]
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    u = [(y[t] - y[t - 1]) ** 2 for t in range(1, len(y))]
    yv, z = u[1:], u[:-1]
    n = len(yv)
    sz, sy = sum(z), sum(yv)
    szz = sum(a * a for a in z)
    syz = sum(a * b for a, b in zip(yv, z))
    d2 = n * szz - sz * sz
    bh = h2d(n * syz - sz * sy) / h2d(d2) if d2 else 0.0
    ah = h2d(sy * szz - sz * syz) / h2d(d2) if d2 else 0.0
    rss = sum(int(math.floor((e * e) * 1e3)) for e in (float(v) - (ah + zz * bh) for v, zz in zip(yv, z)))
    ubar = h2d(sy) / h2d(n)
    tss = sum(int(math.floor((d * d) * 1e3)) for d in (float(v) - ubar for v in yv))
    assert (int(got.rss_q), int(got.tss_q)) == (rss, tss)
    if tss > 0 and d2 != 0:
        assert got.lm_stat == float(n) * (1.0 - float(rss) / float(tss))
