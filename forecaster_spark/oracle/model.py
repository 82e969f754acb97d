"""High-level oracle model driver stitching the ref.py primitives into the
reference's end-to-end entry points (in-sample test, rolling validation,
multi-horizon QoF). Used as the pytest golden and re-used *inside* the Spark
``applyInPandas`` kernels (forecaster_spark.models) so distributed results are
bit-identical to the single-series oracle.

Reference lifecycles replicated (SURVEY.md §3):
- E1 construct + inSample_Test:   forecaster.py:422-443
- E2 trainNtest_Test/rollValidate: forecaster.py:388-419,446-466
- E3 direct multi-horizon:         arx_d.py, forecaster_d.py
"""

from __future__ import annotations

import numpy as np

from forecaster_spark.oracle import ref


class RefARX:
    """One-series oracle for ARX / ARX_Symb (recursive) and ARX_D /
    ARX_Symb_D (direct) and AR_YW models.

    Parameters mirror the reference ``args`` dict (forecaster.py:85-91):
    spec (trend 1-5), p (endo lags), q (exo lags), cross, skip (default p),
    hh (max horizon). ``design`` ∈ {"arx", "symb"}; ``mode`` ∈ {"recursive",
    "direct", "ar_yw"}; ``scaler`` ∈ {None, "minmax", "standard"};
    ``yw_method`` ∈ {"sm_ols", "mle", "adjusted"} for mode="ar_yw".
    """

    TE_RATIO = 0.2  # forecaster.py:63
    LU = (0.0, 4.0)  # forecaster.py:64

    def __init__(
        self,
        y: np.ndarray,
        hh: int,
        xe: np.ndarray | None = None,
        p: int = 6,
        q: int = 0,
        spec: int = 1,
        cross: bool = False,
        skip: int | None = None,
        design: str = "arx",
        mode: str = "recursive",
        scaler: str | None = None,
        yw_method: str = "mle",
        solver: str = "pinv",
        ridge_lam: int = 0,
        symb_funcs: tuple | list | None = None,
        exo_symb_funcs: tuple | list | None = None,
    ):
        y = np.asarray(y, dtype=float)
        if xe is not None:
            xe = np.asarray(xe, dtype=float)
            if xe.ndim == 1:
                xe = xe.reshape(-1, 1)
        self.y_raw = y
        self.xe = xe
        self.hh = hh
        self.p, self.q, self.spec, self.cross = p, q, spec, cross
        self.skip = p if skip is None else skip
        self.design, self.mode = design, mode
        self.yw_method = yw_method
        # "exact": integer-Cramer fits + fixed-order predicts — bit-exact
        # cross-engine (DuckDB oracle-able); requires integer-valued inputs
        # and no scalers. "pinv" (default): BLAS least squares.
        self.solver = solver
        # "exact_ridge": exact solver with L2 penalty λ = ridge_lam on the
        # non-intercept normal-equation diagonal (ref.ridge_fit_exact);
        # shares every fixed-order predict/diagnose path with "exact"
        self._exact = solver in ("exact", "exact_ridge")
        self.ridge_lam = int(ridge_lam)
        if self._exact and scaler is not None:
            raise ValueError("exact solver does not compose with scalers")
        if solver == "exact_ridge" and mode != "recursive":
            raise ValueError("exact_ridge is implemented for the recursive ARX path")
        self.n = len(y)
        self.tr_size = int((1.0 - self.TE_RATIO) * self.n)
        self.te_size = self.n - self.tr_size
        self.n_exo = 0 if xe is None else xe.shape[1]
        # symb_funcs / exo_symb_funcs: names from ref.SYMB_FUNC_REGISTRY or
        # callables — SEPARATE endo/exo transform lists, mirroring the
        # reference ARX_Symb ff/gg lists (arx_symb.py:60-66); exo defaults
        # to the endo list when not given (the engine's historical default)

        def _resolve(fs):
            return tuple(ref.SYMB_FUNC_REGISTRY[f] if isinstance(f, str) else f for f in fs)

        self.f_endo = _resolve(symb_funcs) if symb_funcs is not None else ref.DEFAULT_SYMB_FUNCS
        self.f_exo = _resolve(exo_symb_funcs) if exo_symb_funcs is not None else self.f_endo
        self.n_f_endo = len(self.f_endo) if design == "symb" else 0
        self.n_f_exo = len(self.f_exo) if design == "symb" else 0

        mk = {None: lambda: None, "minmax": lambda: ref.MinMaxScaler(self.LU),
              "standard": ref.StandardScaler}[scaler]
        self.y_scaler = mk()
        self.endo_scaler = mk()
        self.exo_scaler = mk()
        # StandardScaler on y disables non-negativity (arx.py:136)
        self.nneg = not (scaler == "standard")

        if mode == "ar_yw":
            # AR_YW forces skip >= p (ar_yw.py:66-68) and never rectifies/scales
            self.skip = max(self.skip, p)
            self.X = None
            self.y = y
            self.Y = None
        else:
            if design == "symb":
                self.X, self.y = ref.arx_symb_design_matrix(
                    y, p, q, spec, cross, xe,
                    f_endo=self.f_endo, f_exo=self.f_exo,
                    y_scaler=self.y_scaler if scaler else None,
                    endo_scaler=self.endo_scaler if scaler else None,
                    exo_scaler=self.exo_scaler if scaler else None,
                )
            else:
                self.X, self.y = ref.arx_design_matrix(
                    y, p, q, spec, xe,
                    y_scaler=self.y_scaler if scaler else None,
                    exo_scaler=self.exo_scaler if scaler else None,
                )
            self.Y = ref.lead_matrix(self.y, hh) if mode == "direct" else None
        self.scaled = scaler is not None
        self.params = None

    # -- fitting ----------------------------------------------------------
    def fit(self, y_=None, X_=None):
        """Train on (y_, X_) windows (defaults: full series). arx.py:203-226,
        arx_d.py:185-213, ar_yw.py:71-94. For direct mode y_ is the lead
        matrix window."""
        exact = self._exact
        if self.mode == "ar_yw":
            yw = self.y if y_ is None else y_
            if self.yw_method == "sm_ols":
                fit = ref.ar_autoreg_ols_fit_exact if exact else ref.ar_autoreg_ols_fit
                self.params = fit(yw, self.p)
            elif exact:
                self.params = ref.ar_yule_walker_fit_exact(yw, self.p, self.yw_method)
            else:
                self.params = ref.ar_yule_walker_fit(yw, self.p, self.yw_method)
        elif self.mode == "direct":
            Yw = self.Y if y_ is None else y_
            Xw = self.X if X_ is None else X_
            self.params = (ref.ols_fit_multi_exact if exact else ref.ols_fit_multi)(Xw, Yw)
        else:
            yw = self.y if y_ is None else y_
            Xw = self.X if X_ is None else X_
            if self.solver == "exact_ridge":
                self.params = ref.ridge_fit_exact(Xw, yw, self.ridge_lam)
            else:
                self.params = (ref.ols_fit_exact if exact else ref.ols_fit)(Xw, yw)
        return self.params

    # -- forecasting -------------------------------------------------------
    def forecast(self, t_start: int = -1, t_end: int = -1) -> np.ndarray:
        """Forecast matrix (rows t_start..t_end, cols horizon 1..hh) in the
        *scaled* space (matching the reference's internal y_fcast)."""
        t_st = self.skip if t_start == -1 else t_start
        t_en = self.n if t_end == -1 else t_end
        ordered = self._exact
        if self.mode == "ar_yw":
            yf = np.empty((t_en - t_st, self.hh))
            for t in range(t_st, t_en):
                yf[t - t_st] = ref.ar_dynamic_forecast(
                    self.y, self.params, t, self.hh, ordered
                )
            return yf
        if self.mode == "direct":
            return ref.direct_forecast(self.X, self.params, t_st, t_en, self.nneg, ordered)
        return ref.recursive_forecast(
            self.X, self.params, t_st, t_en, self.hh,
            self.p, self.q, self.spec, self.n_exo, self.nneg,
            n_f_endo=self.n_f_endo, n_f_exo=self.n_f_exo, cross=self.cross,
            y_scaler=self.y_scaler if self.scaled else None,
            endo_scaler=self.endo_scaler if self.scaled else None,
            f_endo=self.f_endo,
            ordered=ordered,
        )

    def inverse_y(self, arr: np.ndarray) -> np.ndarray:
        if not self.scaled:
            return arr
        shape = arr.shape
        return self.y_scaler.inverse_transform(arr.reshape(-1, 1)).reshape(shape)

    # -- reference entry points --------------------------------------------
    def in_sample(self) -> np.ndarray:
        """train-on-all → forecast [skip, n) (forecaster.py:422-443).
        Returns the scaled-space forecast matrix."""
        self.fit()
        return self.forecast()

    def roll_validate(self, rc: int = 2, growing: bool = False) -> np.ndarray:
        """Every ``rc`` steps over the test span, refit on the fixed/growing
        window ending at the origin, forecast the next rc rows
        (forecaster.py:388-419; direct variant forecaster_d.py:117-148).
        Returns (te_size, hh) in the scaled space."""
        yf = np.zeros((self.te_size, self.hh))
        for i in range(0, self.te_size, rc):
            lo = 0 if growing else i
            t = self.tr_size + i
            X_win = self.X[lo:t] if self.X is not None else None
            if self.mode == "direct":
                self.fit(self.Y[lo:t], X_win)
            else:
                self.fit(self.y[lo:t], X_win)
            hi = t + rc if i + rc < self.te_size else self.n
            yf[i : hi - self.tr_size, :] = self.forecast(t, hi)
        return yf

    # -- QoF ---------------------------------------------------------------
    def diagnose_all(self, yf: np.ndarray, tnt: bool = False) -> list[dict]:
        """Per-horizon QoF rows. Recursive/AR path: forecaster.py:355-384
        (truth = y shifted by horizon). Direct path: forecaster_d.py:86-114
        (truth = lead-matrix column, zero tail included)."""
        out = []
        if self.mode == "direct":
            Yt = self.Y[self.tr_size:] if tnt else self.Y[self.skip:]
            ll = Yt.shape[0]
            for h in range(self.hh):
                yt = self.inverse_y(Yt[: ll - h, h])
                yp = self.inverse_y(yf[: ll - h, h])
                out.append({"h": h + 1, **ref.diagnose(yt, yp)})
        else:
            diag = ref.diagnose_exact if self._exact else ref.diagnose
            y_true = self.y[self.tr_size:] if tnt else self.y[self.skip:]
            y_true = self.inverse_y(y_true.copy())
            ll = len(y_true)
            for h in range(self.hh):
                yt = y_true[h:]
                yp = self.inverse_y(yf[: ll - h, h])
                out.append({"h": h + 1, **diag(yt, yp)})
        return out
