"""Hypothesis fuzz of the round-3 session-5 contract ORACLES against
independent pure-Python references (same design as the s4/s4b fuzz
files: the driver gate certifies Spark ≡ DuckDB; this closes the
both-engines-wrong gap).  No Spark session — each example replays the
oracle SQL in a fresh in-memory DuckDB.

Covered: mann_whitney (vs the brute pair-count definition of U),
crps_ensemble (vs the closed form, plus per-point CRPS >= 0),
hier_reconcile (vs a brute daily re-aggregation), sample_entropy
(oracle AND the Arrow kernel vs a brute O(n^2) template scan with
np.quantile quartiles — quarter fractions are binary-exact so the
quadrupled quantile is an exact integer check).
"""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import numpy as np
import pandas as pd
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from forecaster_spark.operators.motifs import sample_entropy_kernel

spec = importlib.util.spec_from_file_location("entry_fuzz_s5", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)
ORACLES = _entry.oracle_sql()

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _events_pdf(milli_vals, step_minutes=60, event_type="s"):
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


def _hourly_micro(milli_vals, step_minutes=60):
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


micro_series = st.lists(st.integers(0, 600_000), min_size=4, max_size=70)
tie_series = st.lists(st.integers(0, 3), min_size=4, max_size=50)


def _check_mann_whitney(mv):
    y = _hourly_micro(mv)
    n = len(y)
    assume(n >= 2)
    n1 = n // 2
    n2 = n - n1
    g1, g2 = y[:n1], y[n1:]
    got = _run("mann_whitney_events_1h", _events_pdf(mv)).iloc[0]
    # independent definition: 2*U1 = 2*#(a>b) + #(a==b) over g1 x g2 pairs
    u2 = sum(2 if a > b else (1 if a == b else 0) for a in g1 for b in g2)
    tc = sum(y.count(v) ** 2 - 1 for v in y)
    f1 = n1 * n2
    f2 = (n + 1) * n * (n - 1) - tc
    num = u2 - f1
    assert (int(got.n1), int(got.n2), int(got.u2), int(got.num_z), int(got.f2)) == (
        n1,
        n2,
        u2,
        num,
        f2,
    )
    if f2 > 0:
        assert float(got.z_stat) == float(num) * math.sqrt(float(3 * n * (n - 1))) / math.sqrt(
            float(f1)
        ) / math.sqrt(float(f2))
    else:
        assert pd.isna(got.z_stat)
    assert float(got.cliffs_delta) == float(num) / float(f1)
    assert -1.0 <= float(got.cliffs_delta) <= 1.0


@settings(max_examples=100, deadline=None)
@given(micro_series)
def test_mann_whitney_oracle_vs_brute(mv):
    _check_mann_whitney(mv)


@settings(max_examples=60, deadline=None)
@given(tie_series)
def test_mann_whitney_oracle_ties(mv):
    # heavy ties: f2 can collapse to 0 (all-equal series) — z must be NULL
    _check_mann_whitney([v * 1000 for v in mv])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 600_000), min_size=26, max_size=80))
def test_crps_oracle_vs_brute(mv):
    y = _hourly_whole(mv)
    assume(len(y) >= 25)
    res = _run("crps_ensemble_events_1h", _events_pdf(mv))
    pts = []
    for t in range(24, len(y)):
        ms = (y[t - 1], y[t - 2], y[t - 24])
        a = sum(abs(m - y[t]) for m in ms)
        b = abs(ms[0] - ms[1]) + abs(ms[0] - ms[2]) + abs(ms[1] - ms[2])
        c18 = 6 * a - 2 * b
        assert c18 >= 0  # CRPS of any ensemble is nonnegative
        pts.append(c18)
    got = res.iloc[0]
    assert (int(got.n), int(got.sum_crps18)) == (len(pts), sum(pts))
    assert float(got.mean_crps) == float(sum(pts)) / float(18 * len(pts))
    # degenerate-ensemble identity: if all members equal, 18*CRPS = 18*|x-y|
    for t in range(24, len(y)):
        if y[t - 1] == y[t - 2] == y[t - 24]:
            assert pts[t - 24] == 18 * abs(y[t - 1] - y[t])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 600_000), min_size=30, max_size=100))
def test_hier_reconcile_oracle_vs_brute(mv):
    # one value per hour -> hours 0..len-1, micro sums = single-row sums
    s = {h: int(round((v / 1000.0) * 1e6)) for h, v in enumerate(mv)}
    hours = sorted(s)
    f = {hours[i]: s[hours[i - 1]] for i in range(1, len(hours))}
    days = {}
    for h in hours:
        days.setdefault(h // 24, []).append(h)
    actual = {d: sum(s[h] for h in hs) for d, hs in days.items()}
    rows = []
    dsorted = sorted(days)
    for i, d in enumerate(dsorted):
        hs = days[d]
        if i == 0 or any(h not in f for h in hs):
            continue
        bu = sum(f[h] for h in hs)
        direct = actual[dsorted[i - 1]]
        rows.append((abs(actual[d] - direct), abs(actual[d] - bu), abs(direct - bu)))
    res = _run("hier_reconcile_events", _events_pdf(mv))
    if not rows:
        assert len(res) == 0
        return
    got = res.iloc[0]
    assert (int(got.n_days), int(got.sae_direct), int(got.sae_bottom_up), int(got.coherence_gap)) == (
        len(rows),
        sum(r[0] for r in rows),
        sum(r[1] for r in rows),
        sum(r[2] for r in rows),
    )


def _sampen_brute(v):
    n = len(v)
    arr = np.asarray(v, dtype=np.int64)
    q25 = np.quantile(arr, 0.25) * 4.0
    q75 = np.quantile(arr, 0.75) * 4.0
    assert q25 == int(q25) and q75 == int(q75)  # quarter fractions are exact
    r4 = int(q75) - int(q25)
    b_cnt = a_cnt = 0
    for i in range(n - 2):
        for j in range(i + 1, n - 2):
            if 8 * abs(v[i] - v[j]) <= r4 and 8 * abs(v[i + 1] - v[j + 1]) <= r4:
                b_cnt += 1
                if 8 * abs(v[i + 2] - v[j + 2]) <= r4:
                    a_cnt += 1
    return r4, b_cnt, a_cnt


def _check_sampen(mv):
    y = _hourly_micro(mv)
    n = len(y)
    assume(n >= 2)
    r4, b_cnt, a_cnt = _sampen_brute(y)
    # Arrow kernel vs brute (Spark side)
    kr4, kb, ka = sample_entropy_kernel(np.asarray(y, dtype=np.int64), m=2)
    assert (kr4, kb, ka) == (r4, b_cnt, a_cnt)
    # DuckDB oracle vs brute
    got = _run("sample_entropy_events_1h", _events_pdf(mv)).iloc[0]
    assert (int(got.n), int(got.r4), int(got.b_cnt), int(got.a_cnt)) == (n, r4, b_cnt, a_cnt)
    if b_cnt > 0:
        assert float(got.ratio) == float(a_cnt) / float(b_cnt)
        assert 0.0 <= float(got.ratio) <= 1.0  # A-templates are a subset of B
    else:
        assert pd.isna(got.ratio)


@settings(max_examples=100, deadline=None)
@given(micro_series)
def test_sample_entropy_oracle_and_kernel_vs_brute(mv):
    _check_sampen(mv)


@settings(max_examples=60, deadline=None)
@given(tie_series)
def test_sample_entropy_ties(mv):
    # constant / near-constant series: r4 = 0 still matches exact ties
    _check_sampen([v * 1000 for v in mv])
