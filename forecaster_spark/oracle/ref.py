"""NumPy golden oracle for the reference Forecaster's numerical semantics.

Each function cites the reference code (path:line under ``/root/reference``)
whose observable output it reproduces; reproduction was verified by executing
the reference during the survey (SURVEY.md §2, ✔exec marks). No code is
copied — the reference depends on sklearn/statsmodels which are unavailable
here, so scalers, OLS, and Yule-Walker are derived from their published
definitions.
"""

from __future__ import annotations

import numpy as np

#: number of following values used by the weighted backcast
#: (reference: Util/build_matrix.py:20)
Q_MEAN = 2


# ---------------------------------------------------------------------------
# backfill / backcast  (Util/build_matrix.py:22-86)
# ---------------------------------------------------------------------------

def backcast_weighted(z: np.ndarray, i: int = 0) -> float:
    """Weighted average of the next ``Q_MEAN`` values, weights [1..q]/sum
    applied to the *reversed* slice ``z[i:i+q][::-1]``.

    Reference: Util/build_matrix.py:22-42 (``backcast``).
    With q=2 this is ``(1*z[i+1] + 2*z[i]) / 3``.
    """
    w = np.arange(1, Q_MEAN + 1, dtype=float)
    w /= w.sum()
    return float(w @ z[i : i + Q_MEAN][::-1])


def backfill_column(col: np.ndarray) -> np.ndarray:
    """Replace *leading zeros* of a 1-D series right-to-left with backcasts.

    Reference: Util/build_matrix.py:44-65 (``backfill``). A zero sentinel is
    prepended, the index of the first non-zero found, and positions are
    filled from that index down to 0 — each fill sees previously filled
    values (sequential dependency).
    ✔exec: [0,0,0,5,7,9] → [0.185185, 0.555556, 1.666667, 5, 7, 9].
    """
    z = np.concatenate(([0.0], np.asarray(col, dtype=float)))
    first_nz = int(np.argmax(z != 0.0)) - 1
    for k in range(first_nz, -1, -1):
        z[k] = backcast_weighted(z, k)
    return z[1:]


def backfill_matrix(xe: np.ndarray) -> np.ndarray:
    """Column-wise ``backfill_column``. Reference: Util/build_matrix.py:67-86."""
    out = np.asarray(xe, dtype=float).copy()
    for j in range(out.shape[1]):
        out[:, j] = backfill_column(out[:, j])
    return out


# ---------------------------------------------------------------------------
# trend / lag / lead matrices  (Util/build_matrix.py:88-186)
# ---------------------------------------------------------------------------

def trend_matrix(m: int, spec: int = 1, lwave: int = 20) -> np.ndarray:
    """Cumulative trend features by ``spec``: 2→t/m, 3→((t−m/2)²)/(m/2)²,
    4→sin(2πt/lwave), 5→cos(2πt/lwave). Shape (m, spec−1).

    Reference: Util/build_matrix.py:88-129 (``build_trend_matrix``).
    """
    if spec not in (1, 2, 3, 4, 5):
        raise ValueError("trend spec must be in 1..5")
    t = np.arange(m, dtype=float)
    cols = []
    if spec >= 2:
        cols.append(t / m)
    if spec >= 3:
        half = m / 2.0
        cols.append((t - half) ** 2 / half**2)
    w = 2.0 * np.pi / lwave  # single-rounded wavelength factor, as reference
    if spec >= 4:
        cols.append(np.sin(t * w))
    if spec == 5:
        cols.append(np.cos(t * w))
    return np.column_stack(cols) if cols else np.zeros((m, 0))


def lag_matrix(z: np.ndarray, p: int) -> np.ndarray:
    """Lagged matrix: row t = [z[t−p], …, z[t−1]] (farthest lag first), with
    out-of-range positions replaced by z[0].

    Reference: Util/build_matrix.py:131-159 (``build_lagged_matrix``); the
    docstring there claims column i = lag i+1 but execution shows column i
    holds lag p−i (SURVEY.md §1.1) — this matches the executed behavior.
    """
    z = np.asarray(z, dtype=float)
    n = len(z)
    padded = np.concatenate((np.full(p, z[0]), z[:-1]))
    idx = np.arange(n)[:, None] + np.arange(p)[None, :]
    return padded[idx]


def lead_matrix(y: np.ndarray, hh: int) -> np.ndarray:
    """Direct-forecast target matrix: column i = y shifted left by i, tail
    zero-padded. Reference: Util/build_matrix.py:163-186 (``build_matrix_Y``).
    """
    y = np.asarray(y, dtype=float)
    if hh <= 1:
        return y.reshape(-1, 1)
    padded = np.concatenate((y, np.zeros(hh - 1)))
    idx = np.arange(len(y))[:, None] + np.arange(hh)[None, :]
    return padded[idx]


# ---------------------------------------------------------------------------
# scalers  (sklearn-equivalent, fit on full data; forecaster.py:63-64,
#           arx.py:134-151)
# ---------------------------------------------------------------------------

class MinMaxScaler:
    """Column-wise min-max scaler onto ``feature_range`` (reference default
    (0,4) — forecaster.py:64 ``_lu``). Matches sklearn's formula
    ``x_scaled = (x − min)/(max − min) * (hi − lo) + lo`` with the
    zero-range guard (scale divisor of 0 treated as 1).
    """

    def __init__(self, feature_range: tuple[float, float] = (0.0, 4.0)):
        self.lo, self.hi = feature_range

    def fit(self, x: np.ndarray) -> "MinMaxScaler":
        x = np.asarray(x, dtype=float)
        self.data_min_ = x.min(axis=0)
        self.data_max_ = x.max(axis=0)
        rng = self.data_max_ - self.data_min_
        rng = np.where(rng == 0.0, 1.0, rng)
        self.scale_ = (self.hi - self.lo) / rng
        return self

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, dtype=float) - self.data_min_) * self.scale_ + self.lo

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, dtype=float) - self.lo) / self.scale_ + self.data_min_


class StandardScaler:
    """Column-wise (x − mean)/std with population std, matching sklearn.
    Using it as the y-scaler disables non-negativity rectification
    (reference: arx.py:136)."""

    def fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, dtype=float)
        self.mean_ = x.mean(axis=0)
        std = x.std(axis=0)
        self.scale_ = np.where(std == 0.0, 1.0, std)
        return self

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, dtype=float) - self.mean_) / self.scale_

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x, dtype=float) * self.scale_ + self.mean_


# ---------------------------------------------------------------------------
# QoF metrics  (Util/tools.py:42-178)
# ---------------------------------------------------------------------------

def mse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Util/tools.py:42-58."""
    return float(np.mean((y_true - y_pred) ** 2))


def mae(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Util/tools.py:61-77."""
    return float(np.mean(np.abs(y_true - y_pred)))


def r2(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """1 − SSres/SStot, returning 0.0 when SStot == 0. Util/tools.py:80-100."""
    ss_tot = float(np.sum((y_true - np.mean(y_true)) ** 2))
    if ss_tot == 0.0:
        return 0.0
    return float(1.0 - np.sum((y_true - y_pred) ** 2) / ss_tot)


def r2_adjusted(y_true: np.ndarray, y_pred: np.ndarray, n_features: int) -> float:
    """NaN when m ≤ k+1. Util/tools.py:103-125."""
    m = len(y_true)
    if m <= n_features + 1:
        return float("nan")
    return float(1.0 - (1.0 - r2(y_true, y_pred)) * (m - 1) / (m - n_features - 1))


def smape(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """100·mean(2|Δ|/(|y|+|ŷ|+1e-10)). Util/tools.py:128-144."""
    denom = np.abs(y_true) + np.abs(y_pred) + 1e-10
    return float(100.0 * np.mean(2.0 * np.abs(y_true - y_pred) / denom))


def diagnose_exact(y_true: np.ndarray, y_pred: np.ndarray, n_features: int = 1) -> dict:
    """QoF metrics with SEQUENTIAL left-fold accumulation (the order a SQL
    engine's ordered list_reduce uses) instead of numpy's pairwise sums —
    bit-reproducible cross-engine. y_true must be integer-valued (its mean
    divides an exact integer sum). Same values as :func:`diagnose` up to
    summation-order ulp."""
    m = len(y_true)
    yt = [float(v) for v in y_true]
    yp = [float(v) for v in y_pred]
    iv = [int(v) for v in yt]
    if iv != yt:
        raise ValueError("diagnose_exact requires integer-valued y_true")
    sse = sae = ssm = 0.0
    for a, b in zip(yt, yp):
        d = a - b
        sse = sse + d * d
        sae = sae + abs(d)
        ssm = ssm + (2.0 * abs(d)) / ((abs(a) + abs(b)) + 1e-10)
    mean = float(sum(iv)) / m
    sst = 0.0
    for a in yt:
        d = a - mean
        sst = sst + d * d
    r2v = 0.0 if sst == 0.0 else 1.0 - sse / sst
    r2b = (
        float("nan")
        if m <= n_features + 1
        else 1.0 - (1.0 - r2v) * (m - 1) / (m - n_features - 1)
    )
    return {
        "MSE": sse / m,
        "MAE": sae / m,
        "R2": r2v,
        "R2Bar": r2b,
        "SMAPE": 100.0 * (ssm / m),
        "m": m,
    }


def diagnose(y_true: np.ndarray, y_pred: np.ndarray, n_features: int = 1) -> dict:
    """All QoF metrics; n_features defaults to 1 as in the reference's
    per-horizon report path (Util/tools.py:147-178, fit_map at :182-230)."""
    return {
        "MSE": mse(y_true, y_pred),
        "MAE": mae(y_true, y_pred),
        "R2": r2(y_true, y_pred),
        "R2Bar": r2_adjusted(y_true, y_pred, n_features),
        "SMAPE": smape(y_true, y_pred),
        "m": len(y_true),
    }


# ---------------------------------------------------------------------------
# linear model fits  (arx.py:203-226, arx_d.py:185-213, ar_yw.py:71-94)
# ---------------------------------------------------------------------------

def ols_fit(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """OLS with intercept via pseudo-inverse (same least-squares solution as
    statsmodels ``sm.OLS(y, add_constant(X))`` — arx.py:220-223 — which also
    solves via pinv). Returns params with the intercept first."""
    X1 = np.column_stack((np.ones(len(X)), X))
    return np.linalg.pinv(X1) @ np.asarray(y, dtype=float)


def ols_fit_multi(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Multi-output OLS: one regression per column of Y, params stacked as
    (k+1, hh). Reference: arx_d.py:202-213."""
    X1 = np.column_stack((np.ones(len(X)), X))
    return np.linalg.pinv(X1) @ np.asarray(Y, dtype=float)


# -- exact (cross-engine deterministic) solvers -----------------------------
#
# pinv/lstsq coefficients depend on BLAS blocking/FMA, so no SQL engine can
# reproduce them bit-for-bit. For integer-valued inputs the normal equations
# are exact integers; solving them by Cramer with arbitrary-precision
# determinants and rounding ONLY at the final float(det_i)/float(det) gives
# coefficients any engine with 128-bit integers reproduces exactly (DuckDB:
# HUGEINT sums → CAST AS DOUBLE → one division). Same least-squares solution
# as pinv up to conditioning; bit-exact across engines by construction.

def _int_det(m: list[list[int]]) -> int:
    """Exact integer determinant (Bareiss fraction-free elimination)."""
    m = [row[:] for row in m]
    n = len(m)
    sign, prev = 1, 1
    for i in range(n - 1):
        if m[i][i] == 0:
            for r in range(i + 1, n):
                if m[r][i] != 0:
                    m[i], m[r] = m[r], m[i]
                    sign = -sign
                    break
            else:
                return 0
        for r in range(i + 1, n):
            for c in range(i + 1, n):
                m[r][c] = (m[r][c] * m[i][i] - m[r][i] * m[i][c]) // prev
        prev = m[i][i]
    return sign * m[-1][-1]


def hugeint_to_double(d: int) -> float:
    """Bit-exact mimic of DuckDB's HUGEINT→DOUBLE cast (duckdb 1.0
    CastBigintToFloating): result = upper·(2⁶⁴−1) + lower + upper in double
    arithmetic, with the upper == −1 fast path — NOT the correctly-rounded
    ``float(int)`` (they differ by 1 ulp beyond 64 bits). The exact solvers
    round determinants through this so coefficients match the SQL oracle
    bit-for-bit. Verified against DuckDB on 8000 random 1-126 bit values."""
    if not -(1 << 127) <= d < (1 << 127):
        raise OverflowError("determinant exceeds HUGEINT range — exact mode unusable")
    upper = d >> 64
    lower = d & ((1 << 64) - 1)
    if upper == -1:
        return -float((1 << 64) - 1 - lower) - 1.0
    return float(upper) * 18446744073709551615.0 + float(lower) + float(upper)


def _as_int_cols(X1: np.ndarray) -> list[list[int]]:
    cols = []
    for j in range(X1.shape[1]):
        c = X1[:, j]
        ci = np.round(c)
        if not np.array_equal(c, ci):
            raise ValueError("exact solver requires integer-valued inputs")
        cols.append([int(v) for v in ci])
    return cols


def ols_fit_exact(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """OLS with intercept for integer-valued (X, y) via exact integer normal
    equations + Cramer; coefficients round once at float(det_j)/float(det)."""
    X1 = np.column_stack((np.ones(len(X)), np.asarray(X, dtype=float)))
    cols = _as_int_cols(X1)
    yv = _as_int_cols(np.asarray(y, dtype=float).reshape(-1, 1))[0]
    k1 = len(cols)
    A = [[sum(a * b for a, b in zip(cols[i], cols[j])) for j in range(k1)] for i in range(k1)]
    c = [sum(a * b for a, b in zip(cols[i], yv)) for i in range(k1)]
    det = _int_det(A)
    if det == 0:
        # degenerate design (e.g. constant series → lag columns collinear
        # with the intercept): deterministic intercept-only fallback
        # b = [mean(y), 0, …] — a least-squares solution, SQL-expressible
        # (pinv's minimum-norm solution is not)
        out = np.zeros(k1)
        out[0] = hugeint_to_double(c[0]) / hugeint_to_double(A[0][0])
        return out
    out = np.empty(k1)
    for j in range(k1):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(k1)] for i in range(k1)]
        out[j] = hugeint_to_double(_int_det(Aj)) / hugeint_to_double(det)
    return out


def ols_fit_multi_exact(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Per-column :func:`ols_fit_exact`, params stacked (k+1, hh)."""
    Y = np.asarray(Y, dtype=float)
    return np.column_stack([ols_fit_exact(X, Y[:, h]) for h in range(Y.shape[1])])


def ridge_fit_exact(X: np.ndarray, y: np.ndarray, lam: int) -> np.ndarray:
    """Ridge (L2-regularized) OLS with intercept for integer-valued (X, y):
    exact integer normal equations ``(X1ᵀX1 + λ·diag(0,1,…,1))·b = X1ᵀy``
    (intercept unpenalized — the textbook convention) solved by the same
    Cramer + HUGEINT-cast rounding as :func:`ols_fit_exact`, so the SQL
    oracle reproduces every coefficient bit-for-bit. λ is an integer in the
    quantized-y² unit system (the design is integer-valued by contract).
    λ > 0 makes the penalized block strictly positive-definite, so the
    dd = 0 fallback only ever fires on an empty window; it is kept for
    branch parity with the OLS path. Engine-side use: collinear lag windows
    (near-constant series) get shrunk, finite coefficients instead of the
    huge cancelling pairs plain Cramer OLS produces."""
    X1 = np.column_stack((np.ones(len(X)), np.asarray(X, dtype=float)))
    cols = _as_int_cols(X1)
    yv = _as_int_cols(np.asarray(y, dtype=float).reshape(-1, 1))[0]
    k1 = len(cols)
    lam = int(lam)
    A = [
        [
            sum(a * b for a, b in zip(cols[i], cols[j])) + (lam if i == j and i > 0 else 0)
            for j in range(k1)
        ]
        for i in range(k1)
    ]
    c = [sum(a * b for a, b in zip(cols[i], yv)) for i in range(k1)]
    det = _int_det(A)
    if det == 0:
        out = np.zeros(k1)
        out[0] = hugeint_to_double(c[0]) / hugeint_to_double(A[0][0])
        return out
    out = np.empty(k1)
    for j in range(k1):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(k1)] for i in range(k1)]
        out[j] = hugeint_to_double(_int_det(Aj)) / hugeint_to_double(det)
    return out


def feature_scores_exact(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Per-feature squared Pearson correlation with the target — the
    engine's torch-free analogue of the reference's attention-heat-map
    feature selection (MHAttn heatMap.mean → sorted top-k,
    Example_Covid19.py:103-118, mhattn_regressor.py:15-96): rank features by
    marginal relevance, keep the top k. Exact integer sums (order-free) with
    one DuckDB-cast rounding per ratio, so the SQL oracle reproduces every
    score bit-for-bit. Zero-variance features score 0."""
    cols = _as_int_cols(np.asarray(X, dtype=float))
    yv = _as_int_cols(np.asarray(y, dtype=float).reshape(-1, 1))[0]
    n = len(yv)
    sy = sum(yv)
    syy = sum(v * v for v in yv)
    deny = n * syy - sy * sy
    out = np.empty(len(cols))
    for j, c in enumerate(cols):
        sx = sum(c)
        sxx = sum(v * v for v in c)
        sxy = sum(a * b for a, b in zip(c, yv))
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * deny
        out[j] = (
            0.0 if den == 0 else hugeint_to_double(num * num) / hugeint_to_double(den)
        )
    return out


def ar_yule_walker_fit_exact(y: np.ndarray, p: int, method: str = "mle") -> np.ndarray:
    """Yule-Walker (mle) for integer-valued y with exact arithmetic: center
    as z_t = n·y_t − Σy (integers), so the Toeplitz system scaled by n³ is
    the integer system [ΣZ_|i−j|]·φ = [ΣZ_k]; solve by Cramer, round once
    per coefficient. Values equal :func:`ar_yule_walker_fit` up to solver
    rounding; bit-reproducible in SQL."""
    if method != "mle":
        raise ValueError("exact Yule-Walker implements method='mle' only")
    yv = _as_int_cols(np.asarray(y, dtype=float).reshape(-1, 1))[0]
    n = len(yv)
    sy = sum(yv)
    z = [n * v - sy for v in yv]
    Z = [sum(z[t] * z[t + k] for t in range(n - k)) for k in range(p + 1)]
    A = [[Z[abs(i - j)] for j in range(p)] for i in range(p)]
    c = [Z[k] for k in range(1, p + 1)]
    det = _int_det(A)
    if det == 0:
        # zero-variance series: φ = 0, intercept = mean (degenerate AR)
        phi = np.zeros(p)
        mean = float(sy) / n
        return np.concatenate(([mean], phi))
    phi = np.empty(p)
    for j in range(p):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(p)] for i in range(p)]
        phi[j] = hugeint_to_double(_int_det(Aj)) / hugeint_to_double(det)
    mean = float(sy) / n
    acc = 0.0
    for v in phi:
        acc = acc + v
    intercept = mean * (1.0 - acc)
    return np.concatenate(([intercept], phi))


def ar_yule_walker_fit(y: np.ndarray, p: int, method: str = "mle") -> np.ndarray:
    """AR(p) via Yule-Walker on the demeaned series, intercept =
    mean(y)·(1−Σφ). ``method='adjusted'`` divides autocovariance lag k by
    n−k, ``'mle'`` by n — the published statsmodels definition used at
    ar_yw.py:92-94.
    """
    y = np.asarray(y, dtype=float)
    x = y - y.mean()
    n = len(x)
    adj = 1 if method == "adjusted" else 0
    r = np.empty(p + 1)
    r[0] = x @ x / n
    for k in range(1, p + 1):
        r[k] = x[:-k] @ x[k:] / (n - k * adj)
    # Toeplitz system R φ = r[1:]
    R = np.empty((p, p))
    for i in range(p):
        for j in range(p):
            R[i, j] = r[abs(i - j)]
    phi = np.linalg.solve(R, r[1:])
    intercept = y.mean() * (1.0 - phi.sum())
    return np.concatenate(([intercept], phi))


def ar_autoreg_ols_fit(y: np.ndarray, p: int) -> np.ndarray:
    """AR(p) by conditional OLS: regress y[p:] on [1, y[t−1], …, y[t−p]]
    (most-recent lag first — statsmodels AutoReg param order), matching
    ``AutoReg(y, lags=p).fit().params`` used at ar_yw.py:88-90."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    rows = np.arange(p, n)
    lags = np.column_stack([y[rows - k] for k in range(1, p + 1)])
    return ols_fit(lags, y[rows])


def ar_autoreg_ols_fit_exact(y: np.ndarray, p: int) -> np.ndarray:
    """Exact-Cramer variant of :func:`ar_autoreg_ols_fit` for integer-valued
    series: same conditional design (rows t ≥ p, most-recent lag first),
    solved via :func:`ols_fit_exact` so DuckDB HUGEINT sums reproduce every
    coefficient bit-for-bit."""
    y = np.asarray(y, dtype=float)
    rows = np.arange(p, len(y))
    lags = np.column_stack([y[rows - k] for k in range(1, p + 1)])
    return ols_fit_exact(lags, y[rows])


def arma11_hr_fit_exact(
    y: np.ndarray, q_scale: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ARMA(1,1) by Hannan–Rissanen two-stage least squares, exact path —
    the engine's first moving-average-family model (the reference's AR/ARX
    stack has no MA term; HR is the classical OLS-only route to one, so it
    composes with the integer-Cramer machinery).

    Stage 1: long-AR(2) OLS on the z[0]-padded lag matrix (the reference's
    lag convention, Util/build_matrix.py:131-159), fixed left-to-right
    prediction chain → residuals e_t. Stage 2: the innovations are fed back
    as a *fixed-point* regressor eq_t = floor(e_t·q_scale) with q_scale a
    power of two (the multiply is exact, the floor is exact, so both engines
    quantize identically — the quantized-certification pattern); OLS of y on
    [y_{t−1}, eq_{t−1}] (both z[0]-padded) gives the ARMA coefficients.

    Returns (stage1 params a0,a1,a2 — a1 on lag-2, a2 on lag-1;
             stage2 params b0,b1,b2 — b1 on y lag-1, b2 on eq lag-1;
             eq — the quantized innovation series, integral floats)."""
    yv = np.asarray(y, dtype=float)
    L = lag_matrix(yv, 2)  # columns [lag2, lag1], z[0]-padded
    a = ols_fit_exact(L, yv)
    yp = np.full(len(yv), a[0])
    for j in range(2):
        yp = yp + L[:, j] * a[j + 1]
    e = yv - yp
    eq = np.floor(e * float(q_scale))
    m1 = np.concatenate(([eq[0]], eq[:-1]))
    b = ols_fit_exact(np.column_stack((L[:, 1], m1)), yv)
    return a, b, eq


def arma11_hr_forecast(
    y: np.ndarray, hh: int, skip: int = 2, q_scale: int = 8
) -> np.ndarray:
    """In-sample multi-horizon recursive ARMA(1,1)-HR forecast with rectify
    (rows t = skip..n−1, columns h = 1..hh). h=1 predicts from the observed
    lag pair (y_{t−1}, eq_{t−1}); h ≥ 2 forges the y lag with the previous
    horizon's forecast and sets future innovations to zero (the MA term
    vanishes — standard ARMA forecasting convention), so the chain is
    f_h = max(b0 + f_{h−1}·b1, 0) with no explicit zero term (skipping it
    keeps the float chain identical on both engines, ±0.0 hazards avoided).
    """
    _, b, eq = arma11_hr_fit_exact(y, q_scale)
    yv = np.asarray(y, dtype=float)
    n = len(yv)
    l1 = np.concatenate(([yv[0]], yv[:-1]))
    m1 = np.concatenate(([eq[0]], eq[:-1]))
    rows = np.arange(skip, n)
    out = np.empty((n - skip, hh))
    prev = np.maximum((b[0] + l1[rows] * b[1]) + m1[rows] * b[2], 0.0)
    out[:, 0] = prev
    for h in range(1, hh):
        prev = np.maximum(b[0] + prev * b[1], 0.0)
        out[:, h] = prev
    return out


def ar_dynamic_forecast(
    y: np.ndarray, params: np.ndarray, t: int, hh: int, ordered: bool = False
) -> np.ndarray:
    """hh-step dynamic AR forecast from origin ``t``: lags before t come from
    actual y, at/after t from the model's own forecasts — the semantics of
    ``AutoReg.predict(params, start=t, end=t+hh−1, dynamic=True)`` called in
    a loop at ar_yw.py:124-128. params = [intercept, φ1..φp]."""
    c, phi = params[0], params[1:]
    p = len(phi)
    buf = list(np.asarray(y, dtype=float)[max(0, t - p) : t])
    out = np.empty(hh)
    for h in range(hh):
        hist = buf[::-1][:p]  # most recent first
        if ordered:
            val = c
            for j in range(len(hist)):
                val = val + phi[j] * hist[j]
        else:
            val = c + float(np.dot(phi[: len(hist)], hist))
        out[h] = val
        buf.append(val)
    return out


# ---------------------------------------------------------------------------
# ARX design matrices  (arx.py:155-200, arx_symb.py:162-225)
# ---------------------------------------------------------------------------

DEFAULT_SYMB_FUNCS = (
    lambda x: np.power(x, 1.5),
    lambda x: np.power(x, 0.5),
    np.log1p,
)
"""Default symbolic transforms (arx_symb.py:83-85)."""

#: named transforms for configurable symbolic designs (the reference's
#: ARX_Symb accepts arbitrary ff/gg lists — arx_symb.py:60-66). "square" is
#: written as x*x, NOT np.power(x, 2): pow differs across engines at ulp
#: level while multiplication is IEEE-identical, and squaring preserves
#: integrality — which is what lets a symbolic design go through the exact
#: solver and its SQL oracle.
SYMB_FUNC_REGISTRY = {
    "pow1_5": lambda x: np.power(x, 1.5),
    "sqrt": lambda x: np.power(x, 0.5),
    "log1p": np.log1p,
    "square": lambda x: x * x,
    "cube": lambda x: (x * x) * x,
}


def arx_design_matrix(
    y: np.ndarray,
    p: int,
    q: int = 0,
    spec: int = 1,
    xe: np.ndarray | None = None,
    y_scaler=None,
    exo_scaler=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Plain ARX design matrix. Column layout: [trend(spec−1) | y lags(p) |
    per-exo lags(q each)], exo backfilled (and scaled when scalers given)
    before lagging. Returns (X, y_used) where y_used is the (possibly
    scaled) series the lags were built from.

    Reference: arx.py:155-200 (``ARX._build_matrix``); scaling path
    arx.py:96-152 (``ARX.rescale``).
    """
    y = np.asarray(y, dtype=float)
    if y_scaler is not None:
        y = y_scaler.fit_transform(y.reshape(-1, 1)).ravel()
    X = lag_matrix(y, p)
    if xe is not None:
        xe_f = backfill_matrix(np.atleast_2d(np.asarray(xe, dtype=float).T).T if xe.ndim == 1 else xe)
        if y_scaler is not None:
            xe_f = exo_scaler.fit_transform(xe_f)
        exo_lagged = np.column_stack([lag_matrix(xe_f[:, j], q) for j in range(xe_f.shape[1])])
        X = np.column_stack((X, exo_lagged))
    if spec > 1:
        X = np.column_stack((trend_matrix(len(y), spec), X))
    return X, y


def arx_symb_design_matrix(
    y: np.ndarray,
    p: int,
    q: int,
    spec: int = 1,
    cross: bool = False,
    xe: np.ndarray | None = None,
    f_endo=DEFAULT_SYMB_FUNCS,
    f_exo=DEFAULT_SYMB_FUNCS,
    y_scaler=None,
    endo_scaler=None,
    exo_scaler=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Symbolic ARX design matrix. Layout: [trend | lags of (y, f1(y)…fk(y))
    p each | lags of (xe, f1(xe)…, cross y·xe) q each]. Transforms are
    applied to the *raw* y before the y-scaler; the endo-feature block gets
    its own scaler. Reference: arx_symb.py:162-225.
    """
    y = np.asarray(y, dtype=float)
    # f_endo may be empty (reference allows an empty ff list — the design
    # then carries only raw-y lags on the endo side, e.g. a cross-terms-only
    # symbolic config)
    endo_feats = np.column_stack([f(y) for f in f_endo]) if len(f_endo) else None
    if y_scaler is not None:
        y = y_scaler.fit_transform(y.reshape(-1, 1)).ravel()
        if endo_feats is not None:
            endo_feats = endo_scaler.fit_transform(endo_feats)
    endo_all = np.column_stack((y, endo_feats)) if endo_feats is not None else y.reshape(-1, 1)
    X = np.column_stack([lag_matrix(endo_all[:, j], p) for j in range(endo_all.shape[1])])

    if xe is not None:
        xe_f = backfill_matrix(xe)
        if len(f_exo) > 0:
            exo_all = np.column_stack((xe_f, np.column_stack([f(xe_f) for f in f_exo])))
        else:
            exo_all = xe_f.copy()
        if cross:
            exo_all = np.column_stack(
                (exo_all, np.column_stack([y * xe_f[:, j] for j in range(xe_f.shape[1])]))
            )
        if y_scaler is not None:
            exo_all = exo_scaler.fit_transform(exo_all)
        exo_lagged = np.column_stack([lag_matrix(exo_all[:, j], q) for j in range(exo_all.shape[1])])
        X = np.column_stack((X, exo_lagged))

    if spec > 1:
        X = np.column_stack((trend_matrix(len(y), spec), X))
    return X, y


# ---------------------------------------------------------------------------
# recursive / direct multi-horizon forecasting  (arx.py:229-353,
# arx_symb.py:228-295, arx_d.py:216-253, forecaster.py:305-419)
# ---------------------------------------------------------------------------

def _hide_exo_block(z: np.ndarray, h: int) -> np.ndarray:
    """Shift a (n, q) lagged-exo block for horizon h: keep columns h−1…q−1,
    repeat the last known column into the vacated slots (as-of masking of
    exo data not yet observable at the forecast origin).
    Reference: arx.py:327-353 (``ARX._hide``, fill=True path)."""
    q = z.shape[1]
    last = z[:, -1:]
    if h > q:
        return np.repeat(last, q, axis=1)
    return np.column_stack((z[:, h - 1 :], np.repeat(last, h - 1, axis=1)))


def _predict(params: np.ndarray, X: np.ndarray, nneg: bool, ordered: bool = False) -> np.ndarray:
    if ordered:
        # fixed left-to-right accumulation (b0 + x0·b1) + x1·b2 + … — the
        # order a SQL engine's left-associative expression uses, so exact-
        # solver forecasts are bit-reproducible cross-engine (X @ params
        # delegates to BLAS whose blocking/FMA differs)
        yp = np.full(len(X), params[0])
        for j in range(X.shape[1]):
            yp = yp + X[:, j] * params[j + 1]
    else:
        yp = params[0] + X @ params[1:]
    return np.maximum(yp, 0.0) if nneg else yp


def recursive_forecast(
    X: np.ndarray,
    params: np.ndarray,
    t_st: int,
    t_en: int,
    hh: int,
    p: int,
    q: int,
    spec: int,
    n_exo: int,
    nneg: bool = True,
    n_f_endo: int = 0,
    n_f_exo: int = 0,
    cross: bool = False,
    y_scaler=None,
    endo_scaler=None,
    f_endo=DEFAULT_SYMB_FUNCS,
    ordered: bool = False,
) -> np.ndarray:
    """Multi-horizon recursive forecast over rows [t_st, t_en).

    h=1 predicts from X directly; h≥2 rebuilds ("forges") features by
    splicing actual lags with the model's own earlier-horizon forecasts,
    hiding unobservable exo lags, and (symbolic case) re-applying the endo
    transforms to inverse-scaled forecasts ("scale correction").

    Reference: plain ARX arx.py:229-324; symbolic arx_symb.py:228-295.
    When ``n_f_endo`` > 0 the symbolic layout/forge is used.
    """
    Xw = X[t_st:t_en]
    n = t_en - t_st
    yf = np.zeros((n, hh))
    yf[:, 0] = _predict(params, Xw, nneg, ordered)
    n_trend = spec - 1

    for h in range(2, hh + 1):
        # the plain forge is only valid for the plain layout: a symbolic
        # design with exo transforms or cross terms carries extra exo-region
        # series the plain branch would neither place nor hide, even when
        # the endo transform list is empty
        if n_f_endo == 0 and n_f_exo == 0 and not cross:
            # plain ARX forge (arx.py:293-324)
            endo0 = n_trend
            exo0 = endo0 + p
            act = Xw[:, endo0 + (h - 1) : endo0 + p]
            i_fc = max(act.shape[1] - (p - h + 1), 0)
            parts = [Xw[:, :n_trend], act, yf[:, i_fc : h - 1]]
            if n_exo > 0:
                for j in range(n_exo):
                    parts.append(_hide_exo_block(Xw[:, exo0 + j * q : exo0 + (j + 1) * q], h))
            Xh = np.column_stack(parts)
        else:
            # symbolic forge (arx_symb.py:228-266)
            n_endo_series = 1 + n_f_endo
            endo0 = n_trend
            exo0 = endo0 + n_endo_series * p
            acts = [
                Xw[:, endo0 + k * p + (h - 1) : endo0 + (k + 1) * p]
                for k in range(n_endo_series)
            ]
            i_fc = max(acts[0].shape[1] - (p - h + 1), 0)
            raw_fc = yf[:, i_fc : h - 1]
            fc_blocks = [raw_fc] + _scale_correction(raw_fc, f_endo, y_scaler, endo_scaler)
            endo_cols = np.column_stack(
                [np.column_stack((acts[k], fc_blocks[k])) for k in range(n_endo_series)]
            )
            parts = [Xw[:, :n_trend], endo_cols]
            if n_exo > 0:
                n_cross = n_exo if cross else 0
                n_exo_series = (1 + n_f_exo) * n_exo + n_cross
                for k in range(n_exo_series):
                    parts.append(_hide_exo_block(Xw[:, exo0 + k * q : exo0 + (k + 1) * q], h))
            Xh = np.column_stack(parts)
        yf[:, h - 1] = _predict(params, Xh, nneg, ordered)
    return yf


def _scale_correction(yfh, f_endo, y_scaler, endo_scaler):
    """Transformed-forecast feature blocks for the symbolic forge: when
    scaled, inverse-transform forecasts, apply each endo transform, re-scale
    with the endo scaler. Reference: arx_symb.py:269-295."""
    if yfh.shape[1] == 0:
        return [yfh.copy() for _ in f_endo]
    if y_scaler is None:
        return [f(yfh) for f in f_endo]
    out_per_col = []
    for j in range(yfh.shape[1]):
        raw = y_scaler.inverse_transform(yfh[:, j : j + 1])
        feats = np.column_stack([f(raw) for f in f_endo])
        out_per_col.append(endo_scaler.transform(feats))
    return [
        np.column_stack([out_per_col[j][:, k : k + 1] for j in range(yfh.shape[1])])
        for k in range(len(f_endo))
    ]


def direct_forecast(
    X: np.ndarray, params: np.ndarray, t_st: int, t_en: int, nneg: bool = True,
    ordered: bool = False,
) -> np.ndarray:
    """Direct multi-horizon forecast: ŷ = [1|X]·params, clipped at 0 when
    nneg. params shape (k+1, hh). Reference: arx_d.py:216-253. ``ordered``
    uses the fixed-accumulation predict per horizon (see :func:`_predict`)."""
    Xw = X[t_st:t_en]
    if ordered:
        yp = np.column_stack(
            [_predict(params[:, h], Xw, False, True) for h in range(params.shape[1])]
        )
    else:
        yp = params[0] + Xw @ params[1:]
    return np.maximum(yp, 0.0) if nneg else yp


def roll_validate(
    y: np.ndarray,
    X: np.ndarray,
    hh: int,
    forecast_fn,
    fit_fn,
    rc: int = 2,
    growing: bool = False,
    te_ratio: float = 0.2,
) -> np.ndarray:
    """Rolling validation: every ``rc`` steps over the test span, refit on
    the (fixed or growing) window ending at the forecast origin, then
    forecast the next rc rows. Returns (te_size, hh).

    ``fit_fn(y_win, X_win) -> params``; ``forecast_fn(params, t0, t1) ->
    (t1−t0, hh)``. Reference: forecaster.py:388-419.
    """
    n = len(y)
    tr_size = int((1.0 - te_ratio) * n)
    te_size = n - tr_size
    yf = np.zeros((te_size, hh))
    for i in range(0, te_size, rc):
        lo = 0 if growing else i
        t = tr_size + i
        params = fit_fn(y[lo:t], X[lo:t] if X is not None else None)
        hi = t + rc if i + rc < te_size else n
        yf[i : hi - tr_size, :] = forecast_fn(params, t, hi)
    return yf
