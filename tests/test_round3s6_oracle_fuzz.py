"""Hypothesis fuzz of the round-3 session-6 additions against independent
references (same design as the earlier fuzz files: the driver gate certifies
Spark ≡ DuckDB; this closes the both-engines-wrong gap).

Covered:
- ridge_fit_exact vs numpy's float solve of the penalized normal equations
  (independent linear-algebra path — BLAS LU vs integer Cramer);
- the data_loader oracle SQL (fresh DuckDB per example) vs a pure-Python
  replay of split/batch/checksum on randomized event series.
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

spec = importlib.util.spec_from_file_location("entry_fuzz_s6", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)
ORACLES = _entry.oracle_sql()

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(5, 35),
    st.integers(0, 10**6),
    st.randoms(use_true_random=False),
)
def test_ridge_exact_matches_numpy_solve(n, lam, rnd):
    X = np.array([[rnd.randint(0, 300) for _ in range(2)] for _ in range(n)], dtype=float)
    y = np.array([rnd.randint(-200, 200) for _ in range(n)], dtype=float)
    X1 = np.column_stack((np.ones(n), X))
    A = X1.T @ X1 + lam * np.diag([0.0, 1.0, 1.0])
    if abs(np.linalg.det(A)) < 1e-6 * max(1.0, np.abs(A).max() ** 3):
        return  # near-singular: the exact path's fallback is pinned elsewhere
    b_np = np.linalg.solve(A, X1.T @ y)
    b_ex = ref.ridge_fit_exact(X, y, lam)
    scale = max(1.0, float(np.abs(b_np).max()))
    assert np.max(np.abs(b_ex - b_np)) < 1e-7 * scale


def _loader_replay(vals):
    """Pure-Python replay of the data_loader manifest over one source."""
    M31, W, BS, P = 1 << 31, 1 << 64, 64, 3
    toks = [((int(math.floor(v * 1000)) % M31) + M31) % M31 for v in vals]
    n = len(toks)
    rows = []
    for i in range(n):
        lags = [toks[i - k] if i - k >= 0 else toks[0] for k in range(P, 0, -1)]
        rows.append(lags + [toks[i]])
    n_test = (n + 4) // 5
    out = {}
    for split, part in (("train", rows[: n - n_test]), ("test", rows[n - n_test :])):
        for b in range((len(part) + BS - 1) // BS if part else 0):
            batch = part[b * BS : (b + 1) * BS]
            acc = 0
            for r in batch:
                for t in r:
                    acc = (acc * 31 + t) % W
            out[(split, b)] = (len(batch), acc - W if acc >= 1 << 63 else acc)
    return out


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-(10**6), 10**6), min_size=2, max_size=220))
def test_data_loader_oracle_matches_python_replay(milli_vals):
    vals = [mv / 1000.0 for mv in milli_vals]
    events = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": [
                (_T0 + timedelta(minutes=7 * i)).replace(tzinfo=None)
                for i in range(len(vals))
            ],
            "user_id": [i % 5 for i in range(len(vals))],
            "event_type": "s",
            "value": vals,
        }
    )
    con = duckdb.connect()
    con.register("events", events)
    got = con.execute(ORACLES["data_loader_batches_events"]).fetchall()
    exp = _loader_replay(vals)
    assert len(got) == len(exp)
    for source, split, batch_id, n_rows, chk in got:
        e_n, e_chk = exp[(split, batch_id)]
        assert (n_rows, chk) == (e_n, e_chk), (split, batch_id)


def _fluency_replay(texts):
    """Pure-Python replay of bigram_fluency over (doc_id, text) pairs."""
    from forecaster_spark.functions import xhash

    toks = {}
    for did, tx in texts:
        words = tx.lower().split(" ")  # fixture texts use single spaces only
        toks[did] = [int(h % (1 << 31)) for h in xhash.word_hash_flat(words)]
    cab, ca = {}, {}
    for did, ts in toks.items():
        for a, b in zip(ts, ts[1:]):
            cab[(a, b)] = cab.get((a, b), 0) + 1
            ca[a] = ca.get(a, 0) + 1
    out = {}
    for did, ts in toks.items():
        if len(ts) < 2:
            continue
        terms = [
            math.floor((1000000.0 * cab[(a, b)]) / ca[a]) for a, b in zip(ts, ts[1:])
        ]
        s = sum(terms)
        out[did] = (len(terms), s, s / len(terms))
    return out


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=40).map(" ".join),
        min_size=1,
        max_size=25,
    )
)
def test_bigram_fluency_oracle_matches_python_replay(texts):
    docs = pd.DataFrame(
        {"doc_id": [f"d-{i:09d}" for i in range(len(texts))], "text": texts}
    )
    con = duckdb.connect()
    con.register("documents", docs)
    got = con.execute(ORACLES["bigram_fluency_documents"]).fetchall()
    exp = _fluency_replay(zip(docs["doc_id"], docs["text"]))
    assert len(got) == len(exp)
    for did, n, s, mean in got:
        e_n, e_s, e_mean = exp[did]
        assert (n, s) == (e_n, e_s)
        assert mean == e_mean
