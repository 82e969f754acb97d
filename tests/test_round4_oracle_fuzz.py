"""Hypothesis fuzz of the round-4 contract ORACLES against independent
pure-Python references (the established fuzz-net design: the driver gate
certifies Spark ≡ DuckDB; this closes the both-engines-wrong gap).

Covered: arch1_vol_forecast (exact 2×2 Cramer on squared persistence
residuals, σ² folded into one division), retract_rebuild (full-recompute
oracle replay on a retraction-filtered frame)."""

import importlib.util
import math
import pathlib
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

spec = importlib.util.spec_from_file_location(
    "entry_fuzz_r4", str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py")
)
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


def _run(key, events):
    con = duckdb.connect()
    con.register("events", events)
    return con.execute(ORACLES[key]).df()


milli_series = st.lists(st.integers(0, 600_000), min_size=26, max_size=90)


@settings(max_examples=150, deadline=None)
@given(milli_series)
def test_arch1_vol_oracle_vs_brute(series):
    pdf = _events_pdf(series)
    got = _run("arch1_vol_forecast_events_1h", pdf)

    # independent replay: hourly floor(sum_micro/1e6/cnt/8.0) signal
    buckets = {}
    for i, mv in enumerate(series):
        h = (20 * i) // 60
        buckets.setdefault(h, []).append(int(round((mv / 1000.0) * 1e6)))
    v = [int(math.floor(sum(b) / 1e6 / len(b) / 8.0)) for _, b in sorted(buckets.items())]
    dy = [v[i] - v[i - 1] for i in range(1, len(v))]
    u = [d * d for d in dy]
    pairs = [(u[i - 1], u[i]) for i in range(1, len(u))]
    if not pairs:
        assert len(got) == 0
        return
    n = len(pairs)
    sz = sum(z for z, _ in pairs)
    sy = sum(y for _, y in pairs)
    szz = sum(z * z for z, _ in pairs)
    syz = sum(y * z for z, y in pairs)
    u_last = pairs[-1][1]
    det = n * szz - sz * sz
    if det == 0:
        a0 = float(sy) / float(n)
        a1 = 0.0
        s2 = a0
    else:
        a0 = float(sy * szz - sz * syz) / float(det)
        a1 = float(n * syz - sz * sy) / float(det)
        s2 = float((sy * szz - sz * syz) + u_last * (n * syz - sz * sy)) / float(det)
    assert len(got) == 1
    r = got.iloc[0]
    assert int(r["n"]) == n and int(r["u_last"]) == u_last
    assert r["a0"] == a0 and r["a1"] == a1 and r["sigma2_next"] == s2


@settings(max_examples=100, deadline=None)
@given(milli_series, st.integers(2, 13))
def test_retract_rebuild_oracle_is_filtered_rollup(series, mod):
    """The retract oracle must equal the plain rollup oracle evaluated on
    the frame with event_id % 97 == 0 rows REMOVED (oracle-vs-oracle
    consistency: the certified property really is 'full recompute over
    survivors')."""
    pdf = _events_pdf(series, step_minutes=mod)
    got = _run("retract_rebuild_1m_events", pdf)
    survivors = pdf[pdf["event_id"] % 97 != 0].reset_index(drop=True)
    want = _run("rollup_1m_events", survivors)
    key = ["source", "bucket_start"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 600_000), min_size=60, max_size=120))
def test_mbb_mean_ci_oracle_vs_brute(series):
    """Independent replay of the deterministic moving-block bootstrap:
    hourly micro-mean signal, splitmix starts, trimmed block sums from
    prefix sums, (total, r) order statistics at ranks 5/196 of B=200."""
    import numpy as np

    from forecaster_spark.functions import xhash

    pdf = _events_pdf(series)
    got = _run("mbb_mean_ci_events_1h", pdf)

    buckets = {}
    for i, mv in enumerate(series):
        h = (20 * i) // 60
        buckets.setdefault(h, []).append(int(round((mv / 1000.0) * 1e6)))
    v = [sum(b) // len(b) for _, b in sorted(buckets.items())]
    n, w, B = len(v), 24, 200
    if n <= w:
        assert len(got) == 0
        return
    pre = [0]
    for x in v:
        pre.append(pre[-1] + x)
    k = -(-n // w)
    totals = []
    for r in range(B):
        t = 0
        for j in range(k):
            h64 = int(
                xhash.splitmix64(np.array([np.uint64((r * (1 << 20) + j) * 23)]))[0]
            )
            s = h64 % (n - w + 1)
            L = n - (k - 1) * w if j == k - 1 else w
            t += pre[s + L] - pre[s]
        totals.append((t, r))
    totals.sort()
    lo_t, hi_t = totals[4][0], totals[195][0]
    tot = pre[n]
    assert len(got) == 1
    r0 = got.iloc[0]
    assert (int(r0["n"]), int(r0["total"])) == (n, tot)
    assert (int(r0["lo_total"]), int(r0["hi_total"])) == (lo_t, hi_t)
    assert r0["mean"] == float(tot) / float(n)
    assert r0["mean_lo"] == float(lo_t) / float(n)
    assert r0["mean_hi"] == float(hi_t) / float(n)
    # percentile bootstrap is NOT anchored at the plug-in mean (a lone
    # spike can push the whole resampling distribution past it) — the
    # guaranteed invariant is ordering of the order statistics
    assert r0["mean_lo"] <= r0["mean_hi"]


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(0, 600_000), min_size=12, max_size=60),
    st.data(),
)
def test_prewhitened_ccf_oracle_vs_brute(xs, data):
    """Independent replay of the full prewhitening chain: whole-unit
    grid, conditional AR(2) Cramer through the HUGEINT→DOUBLE mimic,
    fixed-order residual filtering, ×256 floor quantization,
    floor-of-division centering, integer CCF at lags −3..3."""
    import math
    from datetime import timedelta

    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    ys = data.draw(
        st.lists(st.integers(0, 600_000), min_size=len(xs), max_size=len(xs))
    )
    rows, eid = [], 0
    for i, (a, b) in enumerate(zip(xs, ys)):
        ts = (_T0 + timedelta(minutes=i)).replace(tzinfo=None)
        for src, mv in (("click", a), ("view", b)):
            rows.append(
                {
                    "event_id": eid, "ts": ts, "user_id": 0,
                    "event_type": src, "value": mv / 1000.0,
                }
            )
            eid += 1
    got = _run("prewhitened_ccf_events", pd.DataFrame(rows)).sort_values("lag")

    xv = [int(round((a / 1000.0) * 100)) // 100 for a in xs]
    yv = [int(round((b / 1000.0) * 100)) // 100 for b in ys]
    n_all = len(xv)
    cond = list(range(2, n_all))
    n = len(cond)
    l1x = [xv[t - 1] for t in cond]
    l2x = [xv[t - 2] for t in cond]
    xc = [xv[t] for t in cond]
    s1, s2 = sum(l1x), sum(l2x)
    s11 = sum(a * a for a in l1x)
    s12 = sum(a * b for a, b in zip(l1x, l2x))
    s22 = sum(b * b for b in l2x)
    sy = sum(xc)
    sy1 = sum(y * a for y, a in zip(xc, l1x))
    sy2 = sum(y * b for y, b in zip(xc, l2x))

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
    ex = [
        int(math.floor((xv[t] - ((b0 + xv[t - 1] * f1) + xv[t - 2] * f2)) * 256.0))
        for t in cond
    ]
    ey = [
        int(math.floor((yv[t] - ((b0 + yv[t - 1] * f1) + yv[t - 2] * f2)) * 256.0))
        for t in cond
    ]
    mx = int(math.floor(float(sum(ex)) / float(n)))
    my = int(math.floor(float(sum(ey)) / float(n)))
    dx = [e - mx for e in ex]
    dy = [e - my for e in ey]
    gx0 = sum(d * d for d in dx)
    gy0 = sum(d * d for d in dy)
    want = {}
    for k in range(-3, 4):
        ps = [
            dx[t] * dy[t - k]
            for t in range(n)
            if 0 <= t - k < n
        ]
        want[k] = (sum(ps), len(ps))
    assert list(got["lag"]) == list(range(-3, 4))
    for _, r0 in got.iterrows():
        k = int(r0["lag"])
        g, m = want[k]
        if m == 0:
            assert pd.isna(r0["gxy"]) and int(r0["n_used"]) == 0
        else:
            assert int(r0["gxy"]) == g and int(r0["n_used"]) == m
            den = math.sqrt(float(gx0) * float(gy0))
            if den == 0.0:  # constant residuals: 0/0 → NaN on both engines
                assert math.isnan(r0["r"])
            else:
                assert r0["r"] == float(g) / den
