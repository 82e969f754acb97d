"""Hypothesis fuzz of the round-4 contract ORACLES against independent
pure-Python references (the established fuzz-net design: the driver gate
certifies Spark ≡ DuckDB; this closes the both-engines-wrong gap).

Covered: arch1_vol_forecast (exact 2×2 Cramer on squared persistence
residuals, σ² folded into one division), retract_rebuild (full-recompute
oracle replay on a retraction-filtered frame)."""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

spec = importlib.util.spec_from_file_location("entry_fuzz_r4", "/root/repo/__spark_entry__.py")
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
