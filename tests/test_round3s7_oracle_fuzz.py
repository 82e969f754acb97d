"""Hypothesis fuzz of the round-3 session-7 additions against independent
references (the driver gate certifies Spark ≡ DuckDB; this closes the
both-engines-wrong gap).

Covered:
- arma11_hr_fit_exact vs a float two-stage lstsq replay of the same
  Hannan–Rissanen recipe (independent linear-algebra path — BLAS lstsq vs
  integer Cramer) with the identical fixed-point innovation quantization;
- the full arma_hr_forecast_events_1h DuckDB oracle (fresh connection per
  example) vs ref.arma11_hr_forecast on the identically-rolled series —
  bit-exact, including the floor-quantized mean rollup feeding it.
"""

import importlib.util
import math
from datetime import datetime, timedelta, timezone

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from forecaster_spark.oracle import ref

spec = importlib.util.spec_from_file_location("entry_fuzz_s7", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)
ORACLES = _entry.oracle_sql()

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _hr_float_replay(y, q_scale=8):
    """Two-stage Hannan–Rissanen with float lstsq — the independent check
    on the exact-Cramer path (identical design matrices and quantization)."""
    y = np.asarray(y, dtype=float)
    L = ref.lag_matrix(y, 2)
    X1 = np.column_stack((np.ones(len(y)), L))
    a, *_ = np.linalg.lstsq(X1, y, rcond=None)
    e = y - X1 @ a
    eq = np.floor(e * float(q_scale))
    m1 = np.concatenate(([eq[0]], eq[:-1]))
    X2 = np.column_stack((np.ones(len(y)), L[:, 1], m1))
    b, *_ = np.linalg.lstsq(X2, y, rcond=None)
    return a, b, eq


@settings(max_examples=60, deadline=None)
@given(st.integers(8, 40), st.randoms(use_true_random=False))
def test_arma_hr_fit_matches_lstsq_replay(n, rnd):
    y = np.array([rnd.randint(0, 300) for _ in range(n)], dtype=float)
    a_np, b_np, eq_np = _hr_float_replay(y)
    # guard near-singular designs: Cramer's one-rounding and lstsq's SVD
    # legitimately diverge there (the exact path's fallback is pinned below)
    L = ref.lag_matrix(y, 2)
    X1 = np.column_stack((np.ones(n), L))
    if np.linalg.cond(X1.T @ X1) > 1e8:
        return
    a_ex, b_ex, eq_ex = ref.arma11_hr_fit_exact(y)
    assert np.max(np.abs(a_ex - a_np)) < 1e-6 * max(1.0, np.abs(a_np).max())
    # stage 2 consumes stage-1 residuals: quantization makes eq exactly
    # comparable only when the stage-1 fits agree to quantum resolution
    if np.array_equal(eq_ex, eq_np):
        X2 = np.column_stack((np.ones(n), L[:, 1], eq_np_lag := np.concatenate(([eq_np[0]], eq_np[:-1]))))
        if np.linalg.cond(X2.T @ X2) < 1e8:
            assert np.max(np.abs(b_ex - b_np)) < 1e-6 * max(1.0, np.abs(b_np).max())


def test_arma_hr_constant_series_degenerate():
    """Constant series → singular lag design → intercept-only fallback on
    both stages; every horizon forecasts the constant."""
    y = np.full(12, 7.0)
    yf = ref.arma11_hr_forecast(y, hh=4, skip=2)
    assert yf.shape == (10, 4)
    assert np.allclose(yf, 7.0)


def test_split_leakage_flags_planted_straddling_duplicate():
    """A document duplicated across the train and test splits must be
    flagged leaked with n_shared == its shingle count; unrelated train
    docs must stay at 0. Split membership is found by replaying the
    hash_split bucketing, so the planted ids genuinely straddle."""
    from forecaster_spark.functions import xhash

    ids = np.arange(0, 4000, dtype=np.int64)
    buckets = xhash.splitmix64(ids.view(np.uint64) * np.uint64(85)) % np.uint64(1_000_000)
    b = buckets.view(np.int64)
    test_id = int(ids[b >= 990_000][0])
    train_ids = [int(i) for i in ids[b < 980_000][:3]]
    dup_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        {"doc_id": test_id, "text": dup_text},
        {"doc_id": train_ids[0], "text": dup_text},
        {"doc_id": train_ids[1], "text": "one two three four five six seven"},
        {"doc_id": train_ids[2], "text": "red orange yellow green blue indigo"},
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    got = (
        con.execute(ORACLES["split_leakage_documents"]).df()
        .set_index("doc_id")
        .sort_index()
    )
    assert test_id not in got.index  # holdout docs are not emitted
    dup = got.loc[train_ids[0]]
    assert dup["n_shared"] == dup["n_shingles"] == 8  # 10 words -> 8 3-shingles
    assert bool(dup["leaked"])
    for tid in train_ids[1:]:
        assert got.loc[tid]["n_shared"] == 0 and not bool(got.loc[tid]["leaked"])


def _gesd_replay(vals, rounds=3):
    """Pure-Python GESD replay: exact scaled deviations, (|dd|, v, −t)
    argmax removal, Grubbs-identity statistic."""
    v = list(map(int, vals))
    t = list(range(len(v)))
    out = []
    for r in range(1, rounds + 1):
        n = len(v)
        if n < 2:
            break
        s = sum(v)
        dd = [n * x - s for x in v]
        ad = [abs(d) for d in dd]
        dev2 = sum(d * d for d in dd)
        pick = min(range(n), key=lambda i: (-ad[i], -v[i], t[i]))
        r_stat = (
            float(ad[pick]) / math.sqrt(float(dev2) / float(n - 1)) if dev2 > 0 else None
        )
        out.append((r, n, t[pick], v[pick], ad[pick], dev2, r_stat))
        del v[pick], t[pick]
    return out


@settings(max_examples=25, deadline=None)
@given(st.integers(4, 40), st.randoms(use_true_random=False))
def test_gesd_sql_oracle_matches_python_replay(n_hours, rnd):
    rows = [
        {
            "event_type": "s0",
            "ts": _T0 + timedelta(hours=i),
            "value": float(rnd.randint(0, 300)),
            "event_id": i,
            "user_id": 1,
        }
        for i in range(n_hours)
    ]
    events = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("events", events)
    got = (
        con.execute(ORACLES["gesd_outliers_events_1h"]).df()
        .sort_values("round")
        .reset_index(drop=True)
    )
    exp = _gesd_replay([r["value"] for r in rows])
    assert len(got) == len(exp)
    for i, (r, n, rt, rv, md, d2, rs) in enumerate(exp):
        row = got.iloc[i]
        assert (row["round"], row["n"], row["removed_t"], row["removed_v"]) == (r, n, rt, rv)
        assert (row["max_dev_scaled"], row["dev2_sum"]) == (md, d2)
        if rs is None:
            assert pd.isna(row["r_stat"])
        else:
            assert row["r_stat"] == rs


def test_gesd_unmasks_second_outlier():
    """Two equal spikes in an otherwise-flat series: round 1 removes one,
    round 2's statistic on the survivors still towers over round 3's —
    the masking scenario the single-round Grubbs misses."""
    y = np.array([10.0] * 20 + [200.0, 200.0] + [10.0] * 20)
    res = _gesd_replay(y.astype(int).tolist())
    assert res[0][3] == 200 and res[1][3] == 200  # both spikes removed
    # unmasking: round-2 statistic GROWS once the first spike stops
    # inflating s (the single-round Grubbs would have stopped at res[0])
    assert res[1][6] > res[0][6]
    assert res[2][6] is None  # survivors are constant: dev2 = 0


@settings(max_examples=25, deadline=None)
@given(st.integers(6, 30), st.integers(1, 3), st.randoms(use_true_random=False))
def test_arma_hr_sql_oracle_matches_ref(n_hours, n_sources, rnd):
    rows = []
    for s in range(n_sources):
        for i in range(n_hours):
            for _ in range(rnd.randint(1, 3)):
                rows.append(
                    {
                        "event_type": f"s{s}",
                        "ts": _T0 + timedelta(hours=i, minutes=rnd.randint(0, 59)),
                        "value": rnd.randint(0, 300) + rnd.random(),
                        "event_id": len(rows),
                        "user_id": 1,
                    }
                )
    events = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("events", events)
    got = con.execute(ORACLES["arma_hr_forecast_events_1h"]).df()
    got = got.sort_values(["source", "t", "h"]).reset_index(drop=True)
    # replay the rollup exactly: floor(exact-micro mean) per hour
    exp_rows = []
    for s, gs in events.groupby("event_type"):
        gs = gs.copy()
        gs["b"] = gs["ts"].dt.floor("h")
        y = []
        for b, gb in gs.groupby("b"):
            micro = sum(int(np.round(v * 1_000_000)) for v in gb["value"])
            y.append(math.floor(micro / 1_000_000.0 / len(gb)))
        yv = np.array(y, dtype=float)
        yf = ref.arma11_hr_forecast(yv, hh=4, skip=2)
        for i, t in enumerate(range(2, len(yv))):
            for h in range(1, 5):
                exp_rows.append({"source": s, "t": t, "h": h, "y_hat": yf[i, h - 1]})
    exp = pd.DataFrame(exp_rows).sort_values(["source", "t", "h"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert list(got["source"]) == list(exp["source"])
    assert np.array_equal(got["y_hat"].to_numpy(), exp["y_hat"].to_numpy())
