"""Hypothesis fuzz of the round-3 contract ORACLES (DuckDB side) against
independent pure-Python references.

The driver gate certifies Spark ≡ DuckDB; these tests close the other gap —
both engines agreeing on a WRONG answer — by replaying the exact oracle SQL
strings from ``__spark_entry__.oracle_sql()`` over Hypothesis-generated
tables and checking them against loop-level references (Fraction / Python
ints, written independently of the SQL formulations). No Spark session:
each example is a fresh in-memory DuckDB run, so hundreds of examples are
cheap."""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

spec = importlib.util.spec_from_file_location("entry_fuzz", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)
ORACLES = _entry.oracle_sql()

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _events_pdf(milli_vals, step_minutes=1):
    rows = []
    for i, mv in enumerate(milli_vals):
        rows.append(
            {
                "event_id": i,
                "ts": (_T0 + timedelta(minutes=step_minutes * i)).replace(tzinfo=None),
                "user_id": i % 7,
                "event_type": "s",
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


milli_series = st.lists(st.integers(0, 600_000), min_size=2, max_size=60)


@settings(max_examples=120, deadline=None)
@given(milli_series)
def test_binseg_oracle_vs_brute(mv):
    got = _run("binseg_changepoint_events", events=_events_pdf(mv)).iloc[0]

    def cost(i):
        l, r = mv[:i], mv[i:]

        def sse(seg):
            a, b, k = sum(x * x for x in seg), sum(seg), len(seg)
            return float(a) - (float(b) * float(b)) / float(k)

        return math.floor(sse(l) + sse(r))

    best = min(range(1, len(mv)), key=lambda i: (cost(i), i))
    assert int(got.split_i) == best
    assert int(got.min_cost_q) == cost(best)


@settings(max_examples=120, deadline=None)
@given(milli_series)
def test_moments_oracle_vs_int_reference(mv):
    vals = [m / 1000.0 for m in mv]
    got = _run("moments_events", events=_events_pdf(mv)).iloc[0]
    # half-away rounding like SQL round (Python round is half-even)
    vq = [int(v // 1) + (1 if (v % 1) >= 0.5 else 0) for v in vals]
    n = len(vq)
    mu = sum(vq) // n
    z = [v - mu for v in vq]
    m2, m3, m4 = (sum(x**k for x in z) for k in (2, 3, 4))
    assert (int(got.n), int(got.mu_unit)) == (n, mu)
    assert (int(got.m2), int(got.m3), int(got.m4)) == (m2, m3, m4)
    if m2 > 0:
        sd = math.sqrt(m2 / n)
        assert int(got.skew_q6) == math.floor(((m3 / n) / ((sd * sd) * sd)) * 1e6)
        assert int(got.kurt_q6) == math.floor(((n * m4) / (m2 * m2)) * 1e6)


@settings(max_examples=120, deadline=None)
@given(milli_series)
def test_rescaled_range_oracle_vs_int_reference(mv):
    vals = [m / 1000.0 for m in mv]
    vq = [int(v // 1) + (1 if (v % 1) >= 0.5 else 0) for v in vals]
    got = _run("rescaled_range_events", events=_events_pdf(mv)).iloc[0]
    n, tot = len(vq), sum(vq)
    cum, devs = 0, []
    for i, v in enumerate(vq, start=1):
        cum += v
        devs.append(n * cum - i * tot)
    assert int(got.r_scaled) == max(devs) - min(devs)
    assert int(got.s2_scaled) == n * sum(v * v for v in vq) - tot * tot


@settings(max_examples=100, deadline=None)
@given(milli_series)
def test_peak_detect_oracle_vs_loop(mv):
    got = (
        _run("peak_detect_events", events=_events_pdf(mv))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    n, w, neg = len(mv), 12, -(1 << 62)
    for i in range(n):
        left = mv[max(0, i - w) : i]
        right = mv[i + 1 : i + 1 + w]
        lmax = max(left) if left else neg
        rmax = max(right) if right else neg
        lmin = min(left) if left else mv[i]
        rmin = min(right) if right else mv[i]
        prom = mv[i] - min(lmin, rmin)
        flag = mv[i] > lmax and mv[i] >= rmax and prom >= 20_000
        assert int(got.loc[i].prominence_milli_out) == prom
        assert bool(got.loc[i].is_peak) == flag


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1200), min_size=2, max_size=60))
def test_haar_oracle_vs_direct(units):
    # one event per hour with integer value -> hourly signal == the value
    ev = _events_pdf([u * 1000 for u in units], step_minutes=60)
    got = _run("haar_multires_events_1h", events=ev)
    for lev in (1, 2, 3):
        size, half = 1 << lev, 1 << (lev - 1)
        sub = got[got.level == lev].sort_values("k").reset_index(drop=True)
        n_complete = len(units) // size
        assert list(sub.k) == list(range(n_complete))
        for k in range(n_complete):
            blk = units[k * size : (k + 1) * size]
            assert int(sub.loc[k].s_sum) == sum(blk)
            assert int(sub.loc[k].d_diff) == sum(blk[:half]) - sum(blk[half:])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1200), min_size=2, max_size=60))
def test_theta_oracle_vs_replay(units):
    ev = _events_pdf([u * 1000 for u in units], step_minutes=60)
    got = _run("theta_forecast_events_1h", events=ev).sort_values("h")
    level = float(units[0])
    for u in units[1:]:
        level = float(u) * 0.25 + level * 0.75
    n = len(units)
    st_, st2 = sum(range(n)), sum(t * t for t in range(n))
    sy = sum(units)
    sty = sum(t * u for t, u in enumerate(units))
    bn, bd = n * sty - st_ * sy, n * st2 - st_ * st_
    for r in got.itertuples():
        assert r.level == level
        assert r.fc == level + (float(r.h) * (bn / bd)) * 0.5


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 600)),
        min_size=1,
        max_size=50,
    )
)
def test_gini_oracle_vs_rank_formula(docs):
    pdf = pd.DataFrame(
        [
            {"doc_id": i, "source": g, "n_chars": x, "text": "", "lang": "en"}
            for i, (g, x) in enumerate(docs)
        ]
    )
    got = _run("gini_doclen_documents", documents=pdf).set_index("source")
    for g in {g for g, _ in docs}:
        xs = sorted(x for gg, x in docs if gg == g)
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        expect = ((2 * six - (n + 1) * sx) * 1_000_000) // (n * sx)
        assert int(got.loc[g].gini_ppm) == expect


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 600_000), min_size=1, max_size=200))
def test_compaction_plan_oracle_vs_loop(mv):
    # spread events over minutes -> one day here, so vary the day via step
    ev = _events_pdf(mv, step_minutes=720)  # 2 batches/day
    got = _run("compaction_plan_events", events=ev).sort_values("day").reset_index(drop=True)
    # reference: group rows count per day, walk in day order
    days = ev.ts.dt.floor("D").value_counts().sort_index()
    before, expect = 0, []
    for d, n_rows in days.items():
        expect.append((d, n_rows, before // 500))
        before += n_rows
    assert len(got) == len(expect)
    for i, (d, n_rows, b) in enumerate(expect):
        assert got.loc[i].n_rows == n_rows and int(got.loc[i].file_bin) == b
