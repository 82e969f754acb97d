"""Distributed model kernels ≡ single-series oracle (SURVEY.md §5 item 1:
OLS params A1-A3, Yule-Walker A4-A5, recursive C1, direct C2, rollValidate
C4, QoF A6-A11)."""

import numpy as np
import pandas as pd
import pytest

from forecaster_spark.models import fit_params, forecast_long, qof_native, qof_table
from forecaster_spark.oracle import ref
from forecaster_spark.oracle.model import RefARX
from tests.conftest import mk_series_pdf


def _exo_pdf(n=120, n_sources=3, seed=11):
    rng = np.random.default_rng(seed)
    frames = []
    for s in range(n_sources):
        m = n + 13 * s
        y = np.abs(rng.normal(20, 4, m)).cumsum() / 9
        x1 = np.concatenate([np.zeros(2 + s), np.abs(rng.normal(6, 1, m - 2 - s))])
        x2 = np.abs(rng.normal(3, 1, m))
        ts = pd.Timestamp("2025-01-01") + pd.to_timedelta(np.arange(m) * 60, unit="s")
        frames.append(pd.DataFrame({"source": f"s{s}", "ts": ts, "y": y, "x1": x1, "x2": x2}))
    return pd.concat(frames, ignore_index=True)


CONFIGS = [
    dict(hh=4, p=4, q=3, spec=2, skip=2, design="arx", mode="recursive", exo=True),
    dict(hh=4, p=4, q=3, spec=1, design="symb", mode="recursive", scaler="minmax", exo=True, skip=2),
    dict(hh=3, p=5, q=0, spec=3, design="arx", mode="recursive", scaler="standard", exo=False),
    dict(hh=4, p=4, q=3, spec=1, mode="direct", scaler="minmax", exo=True, skip=2),
    dict(hh=3, p=4, mode="ar_yw", yw_method="mle", exo=False),
    dict(hh=3, p=4, mode="ar_yw", yw_method="sm_ols", exo=False),
    # ARX_Symb_D: symbolic design + direct multi-output fit (arx_symb_d.py)
    dict(hh=3, p=3, q=2, design="symb", mode="direct", scaler="minmax", exo=True, skip=2),
    # symbolic recursive with ENDO×EXO cross terms (arx_symb.py cross=True)
    dict(hh=3, p=3, q=2, spec=2, design="symb", cross=True, scaler="minmax", exo=True, skip=2),
    # AR_YW adjusted (bias-corrected Yule-Walker)
    dict(hh=3, p=4, mode="ar_yw", yw_method="adjusted", exo=False),
]


def _oracle(pdf_src, cfg, validation="insample"):
    kw = {k: v for k, v in cfg.items() if k != "exo"}
    xe = pdf_src[["x1", "x2"]].to_numpy() if cfg["exo"] else None
    m = RefARX(pdf_src["y"].to_numpy(), xe=xe, **kw)
    if validation == "roll":
        yf = m.roll_validate()
        t0 = m.tr_size
    else:
        yf = m.in_sample()
        t0 = m.skip
    return m, m.inverse_y(yf), t0


@pytest.mark.parametrize("cfg", CONFIGS, ids=[f"cfg{i}" for i in range(len(CONFIGS))])
def test_forecast_long_matches_oracle(spark, cfg):
    pdf = _exo_pdf()
    df = spark.createDataFrame(pdf)
    kw = {k: v for k, v in cfg.items() if k != "exo"}
    exo = ["x1", "x2"] if cfg["exo"] else None
    got = forecast_long(df, exo_cols=exo, **kw).toPandas()
    for s, g in got.groupby("source"):
        src = pdf[pdf.source == s].sort_values("ts")
        _, yf, t0 = _oracle(src, cfg)
        piv = g.pivot(index="t", columns="h", values="y_hat").sort_index()
        assert piv.index[0] == t0
        np.testing.assert_allclose(piv.to_numpy(), yf, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("validation", ["insample", "roll"])
def test_qof_table_matches_oracle(spark, validation):
    cfg = CONFIGS[0]
    pdf = _exo_pdf()
    df = spark.createDataFrame(pdf)
    kw = {k: v for k, v in cfg.items() if k != "exo"}
    got = qof_table(df, exo_cols=["x1", "x2"], validation=validation, **kw).toPandas()
    for s, g in got.groupby("source"):
        src = pdf[pdf.source == s].sort_values("ts")
        m, yf, _ = _oracle(src, cfg, validation)
        # diagnose_all works in scaled space on the raw yf
        yf_scaled = yf if not m.scaled else None
        mm, yf2, _ = _oracle(src, cfg, validation)
        rows = mm.diagnose_all(mm.roll_validate() if validation == "roll" else mm.in_sample(),
                               tnt=(validation == "roll"))
        want = pd.DataFrame(rows).sort_values("h")
        g = g.sort_values("h")
        np.testing.assert_allclose(g["mse"], want["MSE"], rtol=1e-9)
        np.testing.assert_allclose(g["r2"], want["R2"], rtol=1e-9)
        np.testing.assert_allclose(g["smape"], want["SMAPE"], rtol=1e-9)
        np.testing.assert_allclose(g["r2bar"], want["R2Bar"], rtol=1e-9)
        assert (g["m"].to_numpy() == want["m"].to_numpy()).all()


def test_fit_params_matches_oracle(spark):
    pdf = _exo_pdf()
    df = spark.createDataFrame(pdf)
    # recursive: single param vector (h=0)
    got = fit_params(df, exo_cols=["x1", "x2"], hh=4, p=4, q=3, spec=2, skip=2).toPandas()
    for s, g in got.groupby("source"):
        src = pdf[pdf.source == s].sort_values("ts")
        m = RefARX(src["y"].to_numpy(), hh=4, xe=src[["x1", "x2"]].to_numpy(), p=4, q=3, spec=2, skip=2)
        np.testing.assert_allclose(np.array(g["coef"].iloc[0]), m.fit(), rtol=1e-9)
    # direct: one row per horizon
    got_d = fit_params(df, exo_cols=["x1", "x2"], hh=3, p=4, q=3, mode="direct").toPandas()
    for s, g in got_d.groupby("source"):
        src = pdf[pdf.source == s].sort_values("ts")
        m = RefARX(src["y"].to_numpy(), hh=3, xe=src[["x1", "x2"]].to_numpy(), p=4, q=3, mode="direct")
        P = m.fit()
        g = g.sort_values("h")
        for j, (_, row) in enumerate(g.iterrows()):
            np.testing.assert_allclose(np.array(row["coef"]), P[:, j], rtol=1e-9)


def test_qof_native_matches_oracle(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "source": np.repeat(["a", "b"], 50),
            "h": np.tile(np.repeat([1, 2], 25), 2),
            "y_true": rng.normal(10, 3, 100),
            "y_hat": rng.normal(10, 3, 100),
        }
    )
    got = qof_native(spark.createDataFrame(pdf), ["source", "h"]).toPandas()
    for (s, h), g in pdf.groupby(["source", "h"]):
        want = ref.diagnose(g["y_true"].to_numpy(), g["y_hat"].to_numpy())
        row = got[(got.source == s) & (got.h == h)].iloc[0]
        np.testing.assert_allclose(
            [row.mse, row.mae, row.r2, row.r2bar, row.smape, row.m],
            [want["MSE"], want["MAE"], want["R2"], want["R2Bar"], want["SMAPE"], want["m"]],
            rtol=1e-8,
        )
    # constant series → R2 = 0 exactly (tools.py:96-98)
    const = pd.DataFrame({"source": ["c"] * 5, "h": [1] * 5, "y_true": [2.0] * 5, "y_hat": [1.0] * 5})
    row = qof_native(spark.createDataFrame(const), ["source", "h"]).toPandas().iloc[0]
    assert row["r2"] == 0.0


def test_exact_solver_matches_pinv_and_is_deterministic():
    """solver='exact' (integer-Cramer fit + fixed-order predict) is the same
    least-squares solution as pinv up to conditioning, for every mode."""
    import numpy as np

    from forecaster_spark.oracle.model import RefARX

    rng = np.random.default_rng(7)
    y = np.floor(rng.uniform(0, 300, 150))
    for mode in ("recursive", "direct", "ar_yw"):
        a = RefARX(y, hh=4, p=2, spec=1, skip=2, mode=mode, solver="exact").in_sample()
        b = RefARX(y, hh=4, p=2, spec=1, skip=2, mode=mode).in_sample()
        assert np.allclose(a, b, rtol=1e-8, atol=1e-8), mode
        # bit-determinism across repeated runs
        a2 = RefARX(y, hh=4, p=2, spec=1, skip=2, mode=mode, solver="exact").in_sample()
        assert (a == a2).all(), mode


def test_exact_solver_rejects_non_integer_inputs():
    import numpy as np
    import pytest as _pytest

    from forecaster_spark.oracle import ref

    with _pytest.raises(ValueError, match="integer-valued"):
        ref.ols_fit_exact(np.array([[1.5], [2.0], [3.0]]), np.array([1.0, 2.0, 3.0]))


def test_pooled_ar_fe_matches_dummy_design_lstsq(spark):
    """The FE panel estimator's integer-Cramer slopes and per-source
    intercepts equal the full dummy-design least-squares solution (one
    indicator column per source + shared lag slopes) computed by numpy —
    an algebraically different route to the same estimator, certifying
    the within/scaled-deviation derivation itself."""
    import pandas as _pd

    from forecaster_spark.models.kernels import pooled_ar_fe_forecast

    rng = np.random.default_rng(23)
    base = _pd.Timestamp("2030-01-01")
    rows = []
    series = {}
    for si, src in enumerate(["a", "b", "c"]):
        v = np.floor(rng.uniform(0, 200, 60)).astype(np.int64)
        series[src] = v
        for t, val in enumerate(v):
            rows.append((src, base + _pd.Timedelta(hours=t), float(val)))
    df = spark.createDataFrame(_pd.DataFrame(rows, columns=["source", "ts", "y"]))
    got = pooled_ar_fe_forecast(df, hh=2).toPandas().set_index(["source", "h"])

    # numpy dummy design: columns [1_a, 1_b, 1_c, l1, l2] over pooled rows
    X, Y = [], []
    for si, src in enumerate(["a", "b", "c"]):
        v = series[src]
        for t in range(2, len(v)):
            d = [0.0, 0.0, 0.0]
            d[si] = 1.0
            X.append(d + [float(v[t - 1]), float(v[t - 2])])
            Y.append(float(v[t]))
    beta, *_ = np.linalg.lstsq(np.array(X), np.array(Y), rcond=None)
    alphas, b1, b2 = beta[:3], beta[3], beta[4]
    for si, src in enumerate(["a", "b", "c"]):
        v = series[src]
        prev, prev2 = float(v[-1]), float(v[-2])
        for h in (1, 2):
            cur = (alphas[si] + prev * b1) + prev2 * b2
            assert got.loc[(src, h), "y_hat"] == pytest.approx(cur, rel=1e-9), (src, h)
            prev, prev2 = cur, prev
    # balanced by construction: n_obs = 58 everywhere
    assert (got["n_obs"] == 58).all()


def test_pooled_ar_fe_common_spine_balance(spark):
    """Unbalanced input: every source is trimmed to its trailing m buckets
    (m = the global minimum per-source count) — n_obs = m - 2 for all, and
    sources are NOT silently dropped (the r5-review lesson: a bucket-set
    intersection emptied the whole panel on disjoint coverage)."""
    import pandas as _pd

    from forecaster_spark.models.kernels import pooled_ar_fe_forecast

    rng = np.random.default_rng(5)
    base = _pd.Timestamp("2030-01-01")
    rows = []
    for src, hours in (("a", range(50)), ("b", list(range(10)) + list(range(20, 50)))):
        for t in hours:
            rows.append((src, base + _pd.Timedelta(hours=t), float(rng.integers(0, 100))))
    df = spark.createDataFrame(_pd.DataFrame(rows, columns=["source", "ts", "y"]))
    got = pooled_ar_fe_forecast(df, hh=3).toPandas()
    assert set(got["source"]) == {"a", "b"}
    assert (got["n_obs"] == 38).all()  # m = min(50, 40) = 40 buckets, minus 2 lags
    # DISJOINT coverage must still produce a panel (the intersection-spine
    # failure mode): two sources with no common bucket at all
    rows2 = []
    for src, hours in (("x", range(0, 30)), ("y", range(100, 140))):
        for t in hours:
            rows2.append((src, base + _pd.Timedelta(hours=t), float(rng.integers(0, 100))))
    df2 = spark.createDataFrame(_pd.DataFrame(rows2, columns=["source", "ts", "y"]))
    got2 = pooled_ar_fe_forecast(df2, hh=2).toPandas()
    assert set(got2["source"]) == {"x", "y"}
    assert (got2["n_obs"] == 28).all()  # m = min(30, 40) = 30, minus 2
