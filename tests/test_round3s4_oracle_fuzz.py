"""Hypothesis fuzz of the round-3 session-4 contract ORACLES against
independent pure-Python references (same design as
test_round3_oracle_fuzz.py / test_round3s3_oracle_fuzz.py: the driver
gate certifies Spark ≡ DuckDB; this closes the both-engines-wrong gap).
No Spark session — each example replays the oracle SQL in a fresh
in-memory DuckDB.

Covered oracles: turning_points, cox_stuart, bartels_rank, von_neumann,
grubbs, friedman, kruskal_wallis, snaive_mase, holt_damped."""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import assume, given, settings
from hypothesis import strategies as st

spec = importlib.util.spec_from_file_location("entry_fuzz_s4", "/root/repo/__spark_entry__.py")
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


def _multi_events_pdf(series_by_source, step_minutes=60):
    """One row per (source, index) at shared timestamps — shared hourly
    buckets across sources for the k-sample tests."""
    rows = []
    eid = 0
    for src, vals in series_by_source.items():
        for i, mv in enumerate(vals):
            rows.append(
                {
                    "event_id": eid,
                    "ts": (_T0 + timedelta(minutes=step_minutes * i)).replace(tzinfo=None),
                    "user_id": eid % 7,
                    "event_type": src,
                    "value": mv / 1000.0,
                }
            )
            eid += 1
    return pd.DataFrame(rows)


def _run(key, events):
    con = duckdb.connect()
    con.register("events", events)
    return con.execute(ORACLES[key]).df()


def _hourly_micro(milli_vals, step_minutes=20):
    """Replay the mb CTE: v_micro = sum(round(v*1e6)) // cnt per hour
    (values are nonnegative here so floor == trunc — no // ambiguity)."""
    buckets = {}
    for i, mv in enumerate(milli_vals):
        h = (step_minutes * i) // 60
        buckets.setdefault(h, []).append(int(round((mv / 1000.0) * 1e6)))
    return [sum(b) // len(b) for _, b in sorted(buckets.items())]


def _hourly_whole(milli_vals, step_minutes=20):
    """Replay the th CTE: floor(sum(micro)/1e6/cnt), same IEEE order."""
    buckets = {}
    for i, mv in enumerate(milli_vals):
        h = (step_minutes * i) // 60
        buckets.setdefault(h, []).append(int(round((mv / 1000.0) * 1e6)))
    return [int(math.floor(sum(b) / 1e6 / len(b))) for _, b in sorted(buckets.items())]


def _rank2(vals):
    """Doubled tie-averaged ranks: 2*min_rank + tie_count - 1 (ints)."""
    s = sorted(vals)
    return [2 * (1 + sum(1 for x in vals if x < v)) + vals.count(v) - 1 for v in vals]


milli_series = st.lists(st.integers(0, 600_000), min_size=24, max_size=90)
hour_series = st.lists(st.integers(0, 600_000), min_size=26, max_size=80)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_turning_points_oracle_vs_brute(mv):
    y = _hourly_micro(mv)
    assume(len(y) >= 3)
    got = _run("turning_points_events_1h", _events_pdf(mv)).iloc[0]
    n = len(y)
    tp = sum(
        1
        for i in range(1, n - 1)
        if (y[i - 1] < y[i] > y[i + 1]) or (y[i - 1] > y[i] < y[i + 1])
    )
    assert int(got.n) == n
    assert int(got.tp_count) == tp
    assert int(got.exp3) == 2 * (n - 2)
    assert int(got.var90) == 16 * n - 29
    assert float(got.tp_rate) == float(tp) / float(n - 2)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_cox_stuart_oracle_vs_brute(mv):
    y = _hourly_micro(mv)
    n = len(y)
    m = n // 2
    c = n - m
    assume(m >= 1)
    got = _run("cox_stuart_events_1h", _events_pdf(mv)).iloc[0]
    pos = sum(1 for i in range(m) if y[i + c] > y[i])
    neg = sum(1 for i in range(m) if y[i + c] < y[i])
    ties = m - pos - neg
    assert (int(got.n), int(got.n_pairs)) == (n, m)
    assert (int(got.pos), int(got.neg), int(got.n_ties)) == (pos, neg, ties)
    if pos + neg > 0:
        assert float(got.pos_share) == float(pos) / float(pos + neg)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_bartels_rank_oracle_vs_brute(mv):
    y = _hourly_micro(mv)
    n = len(y)
    assume(n >= 2)
    got = _run("bartels_rank_events_1h", _events_pdf(mv)).iloc[0]
    r2 = _rank2(y)
    nm = sum((r2[i + 1] - r2[i]) ** 2 for i in range(n - 1))
    den = sum((r - (n + 1)) ** 2 for r in r2)
    assert int(got.n) == n
    assert int(got.nm_num) == nm
    assert int(got.d_den) == den
    if den > 0:
        assert float(got.rvn) == float(nm) / float(den)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_von_neumann_oracle_vs_brute(mv):
    y = _hourly_whole(mv)
    n = len(y)
    assume(n >= 2)
    got = _run("von_neumann_events_1h", _events_pdf(mv)).iloc[0]
    s = sum(y)
    sum_d2 = sum((y[i] - y[i - 1]) ** 2 for i in range(1, n))
    dev2 = sum((n * v - s) ** 2 for v in y)
    assert int(got.n) == n
    assert int(got.sum_d2) == sum_d2
    assert int(got.dev2_sum) == dev2
    if dev2 > 0:
        assert float(got.vn_ratio) == float(n * n * sum_d2) / float((n - 1) * dev2)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_grubbs_oracle_vs_brute(mv):
    y = _hourly_whole(mv)
    n = len(y)
    assume(n >= 2)
    got = _run("grubbs_events_1h", _events_pdf(mv)).iloc[0]
    s = sum(y)
    maxd = max(abs(n * v - s) for v in y)
    dev2 = sum((n * v - s) ** 2 for v in y)
    assert (int(got.n), int(got.max_dev_scaled), int(got.dev2_sum)) == (n, maxd, dev2)
    if dev2 > 0:
        assert float(got.grubbs_g) == float(maxd) / math.sqrt(float(dev2) / float(n - 1))
        # sanity: G is bounded by (n-1)/sqrt(n) (Shiffler 1988)
        assert float(got.grubbs_g) <= (n - 1) / math.sqrt(n) + 1e-9


multi = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(st.integers(0, 600_000), min_size=3, max_size=30),
    min_size=2,
    max_size=3,
)


@settings(max_examples=80, deadline=None)
@given(multi)
def test_friedman_oracle_vs_brute(series):
    pdf = _multi_events_pdf(series)
    got = _run("friedman_events_1h", pdf)
    srcs = sorted(series)
    k = len(srcs)
    nb = min(len(v) for v in series.values())  # complete hourly blocks
    assume(nb >= 1)
    r2sum = {s: 0 for s in srcs}
    for i in range(nb):
        block = [int(round((series[s][i] / 1000.0) * 1e6)) for s in srcs]
        r2 = _rank2(block)
        for s, r in zip(srcs, r2):
            r2sum[s] += r
    tot = sum(v * v for v in r2sum.values())
    chi2 = float(3 * tot) / float(nb * k * (k + 1)) - float(3 * nb * (k + 1))
    assert len(got) == k
    g = got.set_index("source")
    for s in srcs:
        assert int(g.loc[s, "n_blocks"]) == nb
        assert int(g.loc[s, "k"]) == k
        assert int(g.loc[s, "rank2_sum"]) == r2sum[s]
        assert float(g.loc[s, "chi2"]) == chi2


@settings(max_examples=80, deadline=None)
@given(multi)
def test_kruskal_wallis_oracle_vs_brute(series):
    pdf = _multi_events_pdf(series)
    got = _run("kruskal_wallis_events", pdf)
    allv = [int(round((m / 1000.0) * 1e6)) for v in series.values() for m in v]
    n_total = len(allv)
    from collections import Counter

    cnt = Counter(allv)
    tie_cubes = sum(c * c * c - c for c in cnt.values())
    g = got.set_index("source")
    for s, vals in series.items():
        vm = [int(round((m / 1000.0) * 1e6)) for m in vals]
        r2s = sum(
            2 * sum(1 for x in allv if x < v) + cnt[v] + 1 for v in vm
        )
        assert int(g.loc[s, "n_g"]) == len(vm)
        assert int(g.loc[s, "rank2_sum"]) == r2s
        assert int(g.loc[s, "n_total"]) == n_total
        assert int(g.loc[s, "tie_cubes"]) == tie_cubes
        assert float(g.loc[s, "mean_rank2"]) == float(r2s) / float(len(vm))
    # global identity: sum of doubled ranks over everything = N(N+1)
    assert int(got["rank2_sum"].sum()) == n_total * (n_total + 1)


@settings(max_examples=100, deadline=None)
@given(hour_series)
def test_snaive_mase_oracle_vs_brute(mv):
    y = _hourly_micro(mv, step_minutes=60)
    n = len(y)
    assume(n > 24)
    got = _run("snaive_mase_events_1h", _events_pdf(mv, step_minutes=60)).iloc[0]
    es = [y[t] - y[t - 24] for t in range(24, n)]
    ds = [y[t] - y[t - 1] for t in range(1, n)]
    sum_e, sae, sad = sum(es), sum(abs(e) for e in es), sum(abs(d) for d in ds)
    assert (int(got.n), int(got.sum_e), int(got.sae), int(got.sad)) == (
        n,
        sum_e,
        sae,
        sad,
    )
    if sad > 0:
        assert float(got.mase) == float(sae * (n - 1)) / float(sad * (n - 24))
    if sae > 0:
        assert float(got.tracking_signal) == float(sum_e * (n - 24)) / float(sae)


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_holt_damped_oracle_vs_walk(mv):
    y = [float(v) for v in _hourly_whole(mv)]
    assume(len(y) >= 2)
    got = _run("holt_damped_events_1h", _events_pdf(mv)).sort_values("ts").reset_index(drop=True)
    l, b = y[0], 0.0
    levels, trends = [l], [b]
    for v in y[1:]:
        ln = v * 0.25 + (l + b * 0.875) * 0.75
        b = (ln - l) * 0.5 + b * 0.4375
        l = ln
        levels.append(l)
        trends.append(b)
    assert len(got) == len(y)
    for i in range(len(y)):
        assert float(got.loc[i, "level"]) == levels[i]
        assert float(got.loc[i, "trend"]) == trends[i]
        assert float(got.loc[i, "fc1"]) == levels[i] + trends[i] * 0.875
