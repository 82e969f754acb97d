"""Self-consistency invariants of the oracle's recursive-forecast machinery
(beyond point checks): these hold by the *definition* of the reference
semantics, so they validate the re-derivation independently of any single
fixture."""

import numpy as np

from forecaster_spark.oracle import ref
from forecaster_spark.oracle.model import RefARX


def test_forge_with_true_values_reproduces_lag_matrix():
    """If the 'forecasts' fed to the forge are the true y values, the forged
    endo features for horizon h at row t must equal the plain lag features
    at row t+h-1 (spec=1, no exo): the forge is exactly 'slide the lag
    window forward, substituting forecasts for unknown actuals'."""
    rng = np.random.default_rng(4)
    y = rng.normal(10, 2, 80)
    p, hh = 4, 4
    X = ref.lag_matrix(y, p)
    t_st, t_en = p, 70
    # y_fcast[:, k] = true y at origin+k (what a perfect model would emit)
    n = t_en - t_st
    yf = np.column_stack([y[t_st + k : t_en + k] for k in range(hh)])
    params = np.zeros(p + 1)  # unused by the forge itself

    for h in range(2, hh + 1):
        Xw = X[t_st:t_en]
        endo0 = 0
        act = Xw[:, endo0 + (h - 1) : endo0 + p]
        i_fc = max(act.shape[1] - (p - h + 1), 0)
        forged = np.column_stack((act, yf[:, i_fc : h - 1]))
        want = X[t_st + h - 1 : t_en + h - 1]
        np.testing.assert_allclose(forged, want, rtol=0)


def test_recursive_forecast_with_perfect_model_is_exact():
    """An AR model whose params perfectly reproduce the series (y linear in
    its own lag: y[t] = a + b·y[t-1]) must forecast every horizon exactly —
    exercises the full recursive path (predict → forge → predict)."""
    a, b = 2.0, 1.01
    y = np.empty(60)
    y[0] = 5.0
    for t in range(1, 60):
        y[t] = a + b * y[t - 1]
    m = RefARX(y, hh=5, p=1, skip=1)
    # inject the exact generating params (an OLS fit would include the
    # z[0]-padded warm-up row — reference lag semantics — and be inexact)
    m.params = np.array([a, b])
    yf = m.forecast()
    for h in range(1, 6):
        # ŷ(t, h) predicts y[t+h-1]
        pred = yf[: 59 - (h - 1) - 0, h - 1]
        true = y[1 + (h - 1) :]
        np.testing.assert_allclose(pred[: len(true)], true, rtol=1e-9)


def test_hide_blocks_future_exo():
    """_hide semantics: at horizon h, exo lags newer than the forecast
    origin are replaced by the last known column (arx.py:327-353)."""
    z = np.arange(12, dtype=float).reshape(3, 4)  # rows: [0,1,2,3],[4..7],[8..11]
    h2 = ref._hide_exo_block(z, 2)
    np.testing.assert_allclose(h2, np.column_stack((z[:, 1:], z[:, -1:])))
    h_big = ref._hide_exo_block(z, 9)
    np.testing.assert_allclose(h_big, np.repeat(z[:, -1:], 4, axis=1))


def test_backfill_idempotent_and_preserves_nonzero():
    rng = np.random.default_rng(1)
    col = np.concatenate([np.zeros(4), np.abs(rng.normal(5, 1, 30))])
    once = ref.backfill_column(col)
    twice = ref.backfill_column(once)
    np.testing.assert_allclose(once, twice)  # no leading zeros remain
    np.testing.assert_allclose(once[4:], col[4:])  # data untouched
    assert (once[:4] > 0).all()


def test_yule_walker_recovers_ar_coefficients():
    rng = np.random.default_rng(7)
    phi_true = np.array([0.6, -0.3])
    n = 20000
    eps = rng.normal(0, 1, n)
    y = np.zeros(n)
    for t in range(2, n):
        y[t] = phi_true[0] * y[t - 1] + phi_true[1] * y[t - 2] + eps[t]
    for method in ("mle", "adjusted"):
        params = ref.ar_yule_walker_fit(y, 2, method)
        np.testing.assert_allclose(params[1:], phi_true, atol=0.03)
    params_ols = ref.ar_autoreg_ols_fit(y, 2)
    np.testing.assert_allclose(params_ols[1:], phi_true, atol=0.03)
