"""Hypothesis fuzz of the round-3 session-4 (second batch) contract
ORACLES against independent pure-Python references (same design as
test_round3s4_oracle_fuzz.py: the driver gate certifies Spark ≡ DuckDB;
this closes the both-engines-wrong gap).  No Spark session — each
example replays the oracle SQL in a fresh in-memory DuckDB.

Covered oracles: dm_test, wilcoxon_signed_rank, pettitt, winkler_score."""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import assume, given, settings
from hypothesis import strategies as st

spec = importlib.util.spec_from_file_location("entry_fuzz_s4b", "/root/repo/__spark_entry__.py")
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


def _hourly_micro(milli_vals, step_minutes=20):
    buckets = {}
    for i, mv in enumerate(milli_vals):
        h = (step_minutes * i) // 60
        buckets.setdefault(h, []).append(int(round((mv / 1000.0) * 1e6)))
    return [sum(b) // len(b) for _, b in sorted(buckets.items())]


def _hourly_whole(milli_vals, step_minutes=60):
    buckets = {}
    for i, mv in enumerate(milli_vals):
        h = (step_minutes * i) // 60
        buckets.setdefault(h, []).append(int(round((mv / 1000.0) * 1e6)))
    return [int(math.floor(sum(b) / 1e6 / len(b))) for _, b in sorted(buckets.items())]


def _loss_diffs(y, season=24):
    """d_t = |y_t − y_{t−1}| − |y_t − y_{t−season}| on rows where both
    lags exist — the shared persistence-vs-seasonal loss differential."""
    return [abs(y[t] - y[t - 1]) - abs(y[t] - y[t - season]) for t in range(season, len(y))]


hour_series = st.lists(st.integers(0, 600_000), min_size=26, max_size=80)
milli_series = st.lists(st.integers(0, 600_000), min_size=24, max_size=90)
# near-constant series maximize loss-differential zeros and rank ties
tie_series = st.lists(st.integers(0, 3), min_size=26, max_size=60)


@settings(max_examples=100, deadline=None)
@given(hour_series)
def test_dm_oracle_vs_brute(mv):
    y = _hourly_whole(mv)
    assume(len(y) >= 26)
    ds = _loss_diffs(y)
    n = len(ds)
    got = _run("dm_test_events_1h", _events_pdf(mv, step_minutes=60)).iloc[0]
    s, q = sum(ds), sum(d * d for d in ds)
    dd2 = n * n * q - n * s * s
    assert (int(got.n), int(got.sum_d), int(got.dd2_sum)) == (n, s, dd2)
    if dd2 > 0:
        assert float(got.dm_stat) == float(s) * math.sqrt(float(n * (n - 1))) / math.sqrt(
            float(dd2)
        )
    else:
        assert pd.isna(got.dm_stat)


def _check_wilcoxon(mv):
    y = _hourly_whole(mv)
    assume(len(y) >= 26)
    dz = [d for d in _loss_diffs(y) if d != 0]
    m = len(dz)
    res = _run("wilcoxon_signed_rank_events_1h", _events_pdf(mv, step_minutes=60))
    if m < 2:
        assert len(res) == 0
        return
    got = res.iloc[0]
    absd = [abs(d) for d in dz]
    r2 = [2 * (1 + sum(1 for x in absd if x < a)) + absd.count(a) - 1 for a in absd]
    assert sum(r2) == m * (m + 1)  # doubled-rank sum identity
    w2 = sum(r for d, r in zip(dz, r2) if d > 0)
    tc = sum(absd.count(a) ** 2 - 1 for a in absd)
    num4 = 2 * w2 - m * (m + 1)
    var48 = 2 * m * (m + 1) * (2 * m + 1) - tc
    assert (int(got.n_nz), int(got.w2_plus), int(got.num4), int(got.var48)) == (
        m,
        w2,
        num4,
        var48,
    )
    if var48 > 0:
        assert float(got.z_stat) == float(num4) * math.sqrt(3.0) / math.sqrt(float(var48))
    else:
        assert pd.isna(got.z_stat)


@settings(max_examples=100, deadline=None)
@given(hour_series)
def test_wilcoxon_oracle_vs_brute(mv):
    _check_wilcoxon(mv)


@settings(max_examples=60, deadline=None)
@given(tie_series)
def test_wilcoxon_oracle_ties_and_zeros(mv):
    _check_wilcoxon([v * 1000 for v in mv])


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_pettitt_oracle_vs_brute(mv):
    y = _hourly_micro(mv)
    n = len(y)
    assume(n >= 2)
    got = _run("pettitt_events_1h", _events_pdf(mv)).iloc[0]
    r2 = [2 * (1 + sum(1 for x in y if x < v)) + y.count(v) - 1 for v in y]
    best_t, best_k2 = None, -1
    run = 0
    for t in range(1, n):
        run += r2[t - 1]
        u2 = run - t * (n + 1)
        if abs(u2) > best_k2:  # strict > keeps the EARLIEST argmax
            best_t, best_k2 = t, abs(u2)
    assert (int(got.n), int(got.t_star), int(got.k2_stat)) == (n, best_t, best_k2)
    assert pd.Timestamp(got.change_bucket) == pd.Timestamp(
        (_T0 + timedelta(hours=best_t - 1)).replace(tzinfo=None)
    )


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 600_000), min_size=8, max_size=60))
def test_winkler_oracle_vs_brute(mv):
    y = _hourly_whole(mv)
    n = len(y)
    assume(n >= 8)
    got = _run("winkler_score_events_1h", _events_pdf(mv, step_minutes=60)).iloc[0]
    ncal = n - 7
    res = sorted(abs(y[i] - y[i - 1]) for i in range(1, n - 6))
    k = min(((ncal + 1) * 7 + 7) // 8, ncal)
    q = res[k - 1]
    scores, cov = [], 0
    for i in range(n - 6, n):
        lo, hi = y[i - 1] - q, y[i - 1] + q
        scores.append((hi - lo) + 16 * max(lo - y[i], 0) + 16 * max(y[i] - hi, 0))
        cov += 1 if lo <= y[i] <= hi else 0
    assert (int(got.n), int(got.cov_cnt), int(got.sum_winkler)) == (6, cov, sum(scores))
    assert float(got.mean_winkler) == float(sum(scores)) / 6.0
    assert float(got.coverage) == float(cov) / 6.0
