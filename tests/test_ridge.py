"""Exact ridge solver (ref.ridge_fit_exact) and the exact_ridge kernel path."""

import numpy as np
import pandas as pd

from forecaster_spark.models.kernels import forecast_long
from forecaster_spark.oracle import ref
from forecaster_spark.oracle.model import RefARX


def _design(n=60, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.integers(0, 200, size=(n, 2)).astype(float)
    y = np.floor(3 + 0.5 * X[:, 0] - 0.2 * X[:, 1] + rng.integers(-5, 6, n)).astype(float)
    return X, y


def test_lambda_zero_is_ols():
    X, y = _design()
    np.testing.assert_array_equal(ref.ridge_fit_exact(X, y, 0), ref.ols_fit_exact(X, y))


def test_shrinkage_monotone_to_zero():
    X, y = _design()
    prev = None
    for lam in (0, 10, 1_000, 100_000, 10**9):
        b = ref.ridge_fit_exact(X, y, lam)
        norm = float(np.dot(b[1:], b[1:]))
        if prev is not None:
            assert norm <= prev + 1e-12  # penalized-norm monotone in λ
        prev = norm
    assert abs(b[1]) < 1e-3 and abs(b[2]) < 1e-3  # λ→∞ kills slopes


def test_ridge_solves_penalized_normal_equations():
    X, y = _design(n=40, seed=9)
    lam = 500
    b = ref.ridge_fit_exact(X, y, lam)
    X1 = np.column_stack((np.ones(len(X)), X))
    A = X1.T @ X1 + lam * np.diag([0.0, 1.0, 1.0])
    resid = A @ b - X1.T @ y
    # float check only (the exact path rounds per coefficient): residual of
    # the penalized normal equations is ~machine-precision of the system scale
    assert np.max(np.abs(resid)) < 1e-6 * np.max(np.abs(A))


def test_exact_ridge_kernel_matches_oracle(spark):
    rng = np.random.default_rng(11)
    rows = []
    for s in range(2):
        y = np.floor(np.abs(rng.normal(80, 15, 50))).astype(float)
        ts = pd.Timestamp("2025-01-01") + pd.to_timedelta(np.arange(50), unit="h")
        rows.append(pd.DataFrame({"source": f"s{s}", "ts": ts, "y": y}))
    pdf = pd.concat(rows, ignore_index=True)
    cfg = dict(hh=3, p=2, spec=1, skip=2, solver="exact_ridge", ridge_lam=777)
    got = (
        forecast_long(spark.createDataFrame(pdf), **cfg)
        .toPandas()
        .sort_values(["source", "t", "h"])
        .reset_index(drop=True)
    )
    for s, g in pdf.groupby("source"):
        m = RefARX(g.sort_values("ts")["y"].to_numpy(), **cfg)
        yf = m.inverse_y(m.in_sample())
        sub = got[got["source"] == s]
        np.testing.assert_array_equal(
            sub["y_hat"].to_numpy(), yf.ravel()
        )
