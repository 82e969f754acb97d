"""Gap-fill operators vs reference/pandas oracles; native feature pipeline
(lags/leads/trend/symbolic/scalers) vs the NumPy oracle (SURVEY.md §5 item 1)."""

import numpy as np
import pandas as pd

from forecaster_spark.operators import features as FT
from forecaster_spark.operators.gapfill import (
    backcast_fill,
    fill_bucket_gaps,
    fill_bucket_gaps_blocked,
    linear_interp,
    locf,
)
from forecaster_spark.operators.rollup import rollup_raw
from forecaster_spark.oracle import ref
from tests.conftest import mk_series_pdf


def _gappy_pdf():
    pdf = mk_series_pdf(n=300, n_sources=2)
    rng = np.random.default_rng(3)
    idx = rng.choice(len(pdf), size=60, replace=False)
    pdf = pdf.copy()
    pdf.loc[pdf.index[idx], "y"] = np.nan
    # leading nulls for one source
    first_src = pdf["source"].iloc[0]
    head = pdf[pdf.source == first_src].index[:5]
    pdf.loc[head, "y"] = np.nan
    return pdf


def test_locf_matches_pandas(spark):
    pdf = _gappy_pdf()
    got = locf(spark.createDataFrame(pdf), "y").toPandas().sort_values(["source", "ts"])
    want = pdf.sort_values(["source", "ts"])
    want = want.assign(y=want.groupby("source")["y"].ffill())
    assert np.allclose(got["y"].to_numpy(), want["y"].to_numpy(), equal_nan=True)


def test_linear_interp_matches_pandas(spark):
    pdf = _gappy_pdf()
    got = linear_interp(spark.createDataFrame(pdf), "y").toPandas().sort_values(["source", "ts"])
    def interp(g):
        s = g.set_index("ts")["y"]
        out = s.interpolate(method="index").ffill().bfill()
        return out.to_numpy()
    want = np.concatenate([interp(g) for _, g in pdf.sort_values(["source", "ts"]).groupby("source")])
    assert np.allclose(got["y"].to_numpy(), want, equal_nan=True)


def test_backcast_fill_matches_reference(spark):
    rows = []
    for s, zeros in (("a", 3), ("b", 0), ("c", 5)):
        y = np.concatenate([np.zeros(zeros), np.abs(np.random.default_rng(1).normal(5, 1, 40))])
        ts = pd.Timestamp("2025-01-01") + pd.to_timedelta(np.arange(len(y)), unit="min")
        rows.append(pd.DataFrame({"source": s, "ts": ts, "y": y}))
    pdf = pd.concat(rows, ignore_index=True)
    got = backcast_fill(spark.createDataFrame(pdf), ["y"]).toPandas().sort_values(["source", "ts"])
    for s, g in got.groupby("source"):
        orig = pdf[pdf.source == s].sort_values("ts")["y"].to_numpy()
        np.testing.assert_allclose(g["y"].to_numpy(), ref.backfill_column(orig), rtol=1e-12)


def test_fill_bucket_gaps(spark):
    pdf = mk_series_pdf(n=500, n_sources=2)
    # remove a chunk to create bucket gaps
    pdf = pdf[~((pdf.ts.dt.minute % 7 == 3))]
    tier = rollup_raw(spark.createDataFrame(pdf), "1m")
    filled = fill_bucket_gaps(tier, 60, ["mean_y"], method="locf").toPandas()
    for s, g in filled.groupby("source"):
        g = g.sort_values("bucket_start")
        dt = g["bucket_start"].diff().dropna().dt.total_seconds()
        assert (dt == 60).all()          # dense grid
        assert g["mean_y"].notna().all()  # locf filled
        assert g["is_gap"].any()


def test_fill_bucket_gaps_blocked_equals_plain(spark):
    """The skew-bounded two-phase LOCF produces the identical densified +
    filled table as the per-source-window version, including with blocks
    small enough that gaps span block boundaries."""
    pdf = mk_series_pdf(n=600, n_sources=3)
    pdf = pdf[~((pdf.ts.dt.minute % 5).isin([1, 2]))]  # multi-bucket gaps
    tier = rollup_raw(spark.createDataFrame(pdf), "1m")
    plain = (
        fill_bucket_gaps(tier, 60, ["mean_y"], method="locf")
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    for block_buckets in (7, 64):  # force cross-block carry, then few blocks
        blocked = (
            fill_bucket_gaps_blocked(tier, 60, ["mean_y"], block_buckets=block_buckets)
            .toPandas()
            .sort_values(["source", "bucket_start"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            blocked[plain.columns], plain, check_dtype=False
        )


def test_pack_tiers_gorilla_single_stage(spark):
    """Multi-tier pack ≡ per-tier packs, tier column added."""
    from forecaster_spark.functions.gorilla import pack_rollup_gorilla, pack_tiers_gorilla
    from forecaster_spark.operators.rollup import rollup_tiers

    pdf = mk_series_pdf(n=400, n_sources=2)
    tiers = rollup_tiers(spark.createDataFrame(pdf))
    allp = pack_tiers_gorilla(tiers, "mean_y").toPandas()
    assert set(allp["tier"]) == {"1m", "1h", "1d"}
    for name, df in tiers.items():
        solo = pack_rollup_gorilla(df, "mean_y").toPandas().sort_values(["source", "block_id"]).reset_index(drop=True)
        sub = (
            allp[allp.tier == name]
            .drop(columns="tier")
            .sort_values(["source", "block_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(sub, solo, check_dtype=False)


def test_lags_match_oracle(spark):
    pdf = mk_series_pdf(n=80, n_sources=2)
    p = 4
    got = FT.with_lags(spark.createDataFrame(pdf), "y", p).toPandas().sort_values(["source", "ts"])
    for s, g in got.groupby("source"):
        X = ref.lag_matrix(g["y"].to_numpy(), p)
        lag_cols = [f"y_lag{k}" for k in range(p, 0, -1)]  # farthest first
        np.testing.assert_allclose(g[lag_cols].to_numpy(), X, rtol=0)


def test_leads_match_oracle(spark):
    pdf = mk_series_pdf(n=50, n_sources=2)
    hh = 4
    got = FT.with_leads(spark.createDataFrame(pdf), "y", hh).toPandas().sort_values(["source", "ts"])
    for s, g in got.groupby("source"):
        Y = ref.lead_matrix(g["y"].to_numpy(), hh)
        cols = ["y"] + [f"y_lead{h}" for h in range(1, hh)]
        np.testing.assert_allclose(g[cols].to_numpy(), Y, rtol=0)


def test_trend_matches_oracle(spark):
    pdf = mk_series_pdf(n=64, n_sources=2)
    got = FT.with_trend(spark.createDataFrame(pdf), spec=5).toPandas().sort_values(["source", "ts"])
    for s, g in got.groupby("source"):
        Xt = ref.trend_matrix(len(g), 5)
        np.testing.assert_allclose(
            g[["trend1", "trend2", "trend3", "trend4"]].to_numpy(), Xt, rtol=0, atol=0
        )


def test_symbolic_and_cross(spark):
    pdf = mk_series_pdf(n=30, n_sources=1)
    pdf["x1"] = pdf["y"] * 0.5 + 1
    got = FT.with_cross(FT.with_symbolic(spark.createDataFrame(pdf), "y"), "y", ["x1"]).toPandas()
    np.testing.assert_allclose(got["y_pow15"], got["y"] ** 1.5)
    np.testing.assert_allclose(got["y_sqrt"], got["y"] ** 0.5)
    np.testing.assert_allclose(got["y_log1p"], np.log1p(got["y"]))
    np.testing.assert_allclose(got["y_x_x1"], got["y"] * got["x1"])


def test_scalers_match_oracle(spark):
    pdf = mk_series_pdf(n=60, n_sources=2)
    df = spark.createDataFrame(pdf)
    mm = FT.transform_minmax(df, FT.fit_minmax(df, ["y"]), ["y"]).toPandas().sort_values(["source", "ts"])
    st = FT.transform_standard(df, FT.fit_standard(df, ["y"]), ["y"]).toPandas().sort_values(["source", "ts"])
    for s, g in mm.groupby("source"):
        sc = ref.MinMaxScaler((0.0, 4.0))
        want = sc.fit_transform(g[["y"]].to_numpy()).ravel()
        np.testing.assert_allclose(g["y_mm"].to_numpy(), want, rtol=1e-12)
    for s, g in st.groupby("source"):
        sc = ref.StandardScaler()
        want = sc.fit_transform(g[["y"]].to_numpy()).ravel()
        np.testing.assert_allclose(g["y_std"].to_numpy(), want, rtol=1e-12)


def test_time_weighted_avg_matches_pandas_oracle(spark):
    """Trapezoid TWA per bucket vs a direct pandas computation, including a
    single-point bucket (span 0 → plain-mean fallback)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import time_weighted_avg

    rng = np.random.default_rng(3)
    rows = []
    for src in ("a", "b"):
        t0 = pd.Timestamp("2027-05-01")
        for i in range(400):
            t0 += pd.Timedelta(milliseconds=int(rng.integers(1_000, 600_000)))
            rows.append((src, t0, float(np.round(rng.uniform(0, 50), 3)), i))
    rows.append(("lone", pd.Timestamp("2027-05-02 03:04:05"), 7.5, 0))
    pdf = pd.DataFrame(rows, columns=["source", "ts", "y", "event_id"])
    got = (
        time_weighted_avg(spark.createDataFrame(pdf), bucket_unit="hour")
        .toPandas()
        .set_index(["source", "bucket_start"])
        .sort_index()
    )
    assert got.loc[("lone",)].iloc[0]["twa"] == 7.5  # span-0 fallback
    for (src, b), row in got.iterrows():
        grp = pdf[(pdf.source == src) & (pdf.ts.dt.floor("h") == b)].sort_values(
            ["ts", "event_id"]
        )
        assert row["n_points"] == len(grp)
        if len(grp) > 1 and row["span_ms"] > 0:
            t = (grp.ts.astype("int64") // 1_000_000).to_numpy()  # ms
            v = grp.y.to_numpy()
            num = float(((v[1:] + v[:-1]) * (t[1:] - t[:-1])).sum())
            want = num / 2.0 / (t[-1] - t[0])
            assert abs(row["twa"] - want) < 1e-9


def test_counter_delta_reset_correction(spark):
    """increase over a counter with known resets equals the true total rise."""
    import pandas as pd

    from forecaster_spark.operators.timeweight import counter_delta

    # counter climbs 0..9 then resets twice: true increase = sum of steps
    vals = [0, 2, 5, 9, 1, 4, 8, 0.5, 3]  # resets at 9→1 and 8→0.5
    pdf = pd.DataFrame(
        {
            "source": "c",
            "ts": pd.date_range("2027-01-01", periods=len(vals), freq="1min"),
            "y": vals,
            "event_id": range(len(vals)),
        }
    )
    out = counter_delta(spark.createDataFrame(pdf)).toPandas().iloc[0]
    # rises: 2,3,4 | reset→1, 3,4 | reset→0.5, 2.5  = 20
    assert out["increase"] == 20.0
    assert out["n_resets"] == 2
    assert out["n_points"] == len(vals)


def test_lttb_downsample_invariants_and_oracle(spark):
    """LTTB keeps both endpoints, returns exactly k points per source, and
    matches a direct float-arithmetic reference selection (the engine's
    integer-area argmax must pick the same points — areas only ever compare,
    so exact integer scaling preserves the selection)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.downsample import lttb

    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for src in ("a", "b"):
        t0 = pd.Timestamp("2028-01-01")
        for _ in range(500):
            t0 += pd.Timedelta(milliseconds=int(rng.integers(500, 120_000)))
            rows.append((src, t0, float(np.round(rng.normal(50, 20), 3)), eid))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["source", "ts", "y", "event_id"])
    k = 12
    got = lttb(spark.createDataFrame(pdf), k=k).toPandas()
    for src in ("a", "b"):
        g = got[got.source == src].sort_values("sel_order")
        grp = pdf[pdf.source == src].sort_values(["ts", "event_id"])
        assert len(g) == k
        assert g.event_id.iloc[0] == grp.event_id.iloc[0]
        assert g.event_id.iloc[-1] == grp.event_id.iloc[-1]
        assert list(g.sel_order) == list(range(k))
        # float-arithmetic reference walk (classic LTTB)
        t = (grp.ts.astype("int64") // 1_000_000).to_numpy(float)
        t -= t.min()
        v = np.round(grp.y.to_numpy() * 1e6)  # same quantization grid
        n = len(t)
        nb = k - 2
        sel = [0]
        prev = 0
        for b in range(nb):
            lo = 1 + (b * (n - 2)) // nb
            hi = 1 + ((b + 1) * (n - 2)) // nb
            if b < nb - 1:
                nlo = 1 + ((b + 1) * (n - 2)) // nb
                nhi = 1 + ((b + 2) * (n - 2)) // nb
            else:
                nlo, nhi = n - 1, n
            at, av = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            areas = np.abs(
                (t[prev] - at) * (v[lo:hi] - v[prev]) - (t[prev] - t[lo:hi]) * (av - v[prev])
            )
            prev = lo + int(np.argmax(areas))
            sel.append(prev)
        sel.append(n - 1)
        assert list(g.event_id) == [int(grp.event_id.iloc[i]) for i in sel]


def test_ewma_and_rolling_zscore(spark):
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import ewma, rolling_zscore

    rng = np.random.default_rng(21)
    pdf = pd.DataFrame(
        {
            "source": "s",
            "ts": pd.date_range("2028-02-01", periods=300, freq="1min"),
            "y": np.round(rng.normal(100, 5, 300), 3),
            "event_id": range(300),
        }
    )
    pdf.loc[250, "y"] = 500.0  # planted spike
    got = ewma(spark.createDataFrame(pdf), alpha=0.25).toPandas().sort_values("ts")
    want = pdf.y.ewm(alpha=0.25, adjust=False).mean()
    assert np.allclose(got.ewma.to_numpy(), want.to_numpy(), rtol=1e-12)

    z = (
        rolling_zscore(spark.createDataFrame(pdf), window_n=50)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert bool(z.loc[250, "is_anomaly"]) and z.loc[250, "z"] > 5
    assert (~z.loc[:249, "is_anomaly"]).mean() > 0.99  # quiet before the spike
    # matches a pandas rolling oracle on the quantized signal
    vq = np.round(pdf.y * 1000)
    roll = vq.rolling(50, min_periods=1)
    n = roll.count()
    s1, s2 = roll.sum(), (vq * vq).rolling(50, min_periods=1).sum()
    var = n * s2 - s1 * s1
    want_z = np.where(var > 0, (vq * n - s1) / np.sqrt(var), 0.0)
    assert np.allclose(z.z.to_numpy(), want_z, rtol=1e-9, atol=1e-12)


def test_linear_deriv_matches_numpy(spark):
    """deriv = per-bucket least-squares slope; predicted = extrapolation at
    1800 s. Checked against a numpy polyfit-free closed form on quantized
    inputs, incl. a zero-time-variance bucket (slope 0, predict mean)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import linear_deriv

    rows = []
    base = pd.Timestamp("2030-01-01 10:00:00")
    vals = [10.0, 12.5, 11.0, 15.25]
    secs = [60, 600, 1800, 3500]
    for v, s in zip(vals, secs):
        rows.append(("a", base + pd.Timedelta(seconds=s), v, len(rows)))
    rows.append(("b", base + pd.Timedelta(seconds=100), 7.5, 99))  # n=1 bucket
    pdf = pd.DataFrame(rows, columns=["source", "ts", "y", "event_id"])
    out = (
        linear_deriv(spark.createDataFrame(pdf), value="y")
        .toPandas()
        .set_index("source")
    )
    t = np.array(secs, dtype=np.int64)
    v = np.round(np.array(vals) * 1000).astype(np.int64)
    n = len(t)
    num = float(n * (t * v).sum() - t.sum() * v.sum())
    den = float(n * (t * t).sum() - t.sum() ** 2)
    slope = num / den
    pred = ((float(v.sum()) + slope * float(n * 1800 - t.sum())) / n) / 1000
    assert out.loc["a", "deriv"] == slope / 1000
    assert out.loc["a", "predicted"] == pred
    assert out.loc["b", "deriv"] == 0.0
    assert out.loc["b", "predicted"] == 7.5


def test_holt_linear_matches_loop_oracle(spark):
    """Holt (level+trend) vs an independently-grouped recurrence: the kernel
    chains l=(y·α)+((l+b)·(1−α)); the oracle groups as fma-free separate
    terms — equal to 1e-12 rtol; the seed row and fc1=level+trend are exact."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import holt_linear

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "source": ["s"] * 200 + ["t"] * 3,
            "ts": list(pd.date_range("2028-03-01", periods=200, freq="1h"))
            + list(pd.date_range("2028-03-01", periods=3, freq="1h")),
            "y": np.concatenate(
                [np.cumsum(rng.normal(0.5, 2.0, 200)) + 50, [1.0, 4.0, 9.0]]
            ),
        }
    )
    got = (
        holt_linear(spark.createDataFrame(pdf), alpha=0.25, beta=0.5)
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    for src, g in got.groupby("source"):
        ys = pdf[pdf.source == src].sort_values("ts").y.to_numpy()
        l, b = ys[0], 0.0
        want_l, want_b = [l], [b]
        for y in ys[1:]:
            ln = 0.25 * y + 0.75 * l + 0.75 * b  # different grouping on purpose
            b = 0.5 * (ln - l) + 0.5 * b
            l = ln
            want_l.append(l)
            want_b.append(b)
        gg = g.reset_index(drop=True)
        assert np.allclose(gg.level, want_l, rtol=1e-12)
        assert np.allclose(gg.trend, want_b, rtol=1e-12)
        assert (gg.fc1 == gg.level + gg.trend).all()
        assert gg.loc[0, "level"] == ys[0] and gg.loc[0, "trend"] == 0.0


def test_time_in_state_and_heartbeat_agg(spark):
    """state_agg / heartbeat_agg conventions on a hand-computed series:
    last point holds 0 ms, entries count transitions (first point included),
    live+dead partition the span exactly."""
    import pandas as pd

    from forecaster_spark.operators.timeweight import heartbeat_agg, time_in_state

    base = pd.Timestamp("2030-05-01 00:00:00")
    secs = [0, 60, 180, 200, 500]
    states = ["up", "up", "down", "up", "up"]
    pdf = pd.DataFrame(
        {
            "source": "a",
            "ts": [base + pd.Timedelta(seconds=s) for s in secs],
            "state": states,
            "event_id": range(5),
        }
    )
    tis = (
        time_in_state(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("state")
        .sort_index()
    )
    # up: [0,60)+[60,180)=180s then [200,500)=300s -> 480_000 ms, 2 entries, 4 pts
    assert tis.loc["up", "dur_ms"] == 480_000
    assert tis.loc["up", "n_entries"] == 2 and tis.loc["up", "n_points"] == 4
    # down: [180,200) = 20_000 ms, 1 entry, 1 pt
    assert tis.loc["down", "dur_ms"] == 20_000 and tis.loc["down", "n_entries"] == 1
    assert int(tis.dur_ms.sum()) == (secs[-1] - secs[0]) * 1000  # spans partition

    hb = (
        heartbeat_agg(spark.createDataFrame(pdf), threshold_ms=100_000)
        .toPandas()
        .iloc[0]
    )
    # gaps ms: 60k, 120k, 20k, 300k; thr=100k -> live 60+100+20+100, dead 20+200
    assert hb.n_heartbeats == 5
    assert hb.live_ms == 280_000 and hb.dead_ms == 220_000
    assert hb.live_ms + hb.dead_ms == (secs[-1] - secs[0]) * 1000
    assert hb.max_gap_ms == 300_000 and hb.n_dead_gaps == 2


def test_ohlc_both_tie_paths_and_values(spark):
    """OHLC hand values; the struct tie_break path stays deterministic under
    duplicate ts (lexicographic (ts, value)) and equals the min_by fast path
    on unique-ts data."""
    import pandas as pd

    from forecaster_spark.operators.timeweight import ohlc

    base = pd.Timestamp("2030-06-01 10:00:00")
    pdf = pd.DataFrame(
        {
            "source": "a",
            "ts": [base + pd.Timedelta(minutes=m) for m in (5, 20, 40, 55)],
            "y": [10.0, 30.0, 5.0, 12.0],
            "event_id": range(4),
        }
    )
    for tb in (True, False):
        row = ohlc(spark.createDataFrame(pdf), tie_break=tb).toPandas().iloc[0]
        assert (row["open"], row["high"], row["low"], row["close"], row["n"]) == (
            10.0,
            30.0,
            5.0,
            12.0,
            4,
        )
    # duplicate ts: struct path picks lexicographic min/max (ts, value)
    pdf2 = pdf.copy()
    pdf2.loc[1, "ts"] = pdf2.loc[0, "ts"]
    pdf2.loc[2, "ts"] = pdf2.loc[3, "ts"]
    row = ohlc(spark.createDataFrame(pdf2), tie_break=True).toPandas().iloc[0]
    assert row["open"] == 10.0 and row["close"] == 12.0


def test_cusum_matches_sequential_loop(spark):
    """The cumsum-minus-running-min window rewrite equals the textbook
    sequential max(0, s + dev) recurrence exactly (integer arithmetic)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import cusum

    rng = np.random.default_rng(11)
    y = np.round(rng.normal(50, 3, 400), 3)
    y[250:] += 20  # planted level shift
    pdf = pd.DataFrame(
        {
            "source": "a",
            "ts": pd.date_range("2030-01-01", periods=400, freq="1min"),
            "y": y,
            "event_id": range(400),
        }
    )
    k, h = 2_000, 30_000
    got = (
        cusum(spark.createDataFrame(pdf), slack_milli=k, threshold_milli=h)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    vq = np.round(y * 1000).astype(np.int64)
    mu = int(vq.sum()) // len(vq) if vq.sum() >= 0 else None
    sp = sn = 0
    want_p, want_n = [], []
    for v in vq:
        sp = max(0, sp + (int(v) - mu - k))
        sn = max(0, sn + (mu - int(v) - k))
        want_p.append(sp)
        want_n.append(sn)
    assert got.s_pos.tolist() == want_p
    assert got.s_neg.tolist() == want_n
    assert bool(got.is_change.iloc[-1]) and not bool(got.is_change.iloc[0])
    assert (got.is_change == ((got.s_pos > h) | (got.s_neg > h))).all()


def test_seasonal_profile_exact(spark):
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import seasonal_profile

    pdf = pd.DataFrame(
        {
            "source": "a",
            "ts": pd.date_range("2030-01-01", periods=48, freq="1h"),
            "y": np.arange(48, dtype=float) + 0.25,
            "event_id": range(48),
        }
    )
    out = seasonal_profile(spark.createDataFrame(pdf)).toPandas().set_index("hod")
    assert (out.n == 2).all() and len(out) == 24
    # hod h sees y = h+0.25 and h+24.25 -> sum_micro and truncating mean
    for h in (0, 7, 23):
        s = int(round((h + 0.25) * 1e6) + round((h + 24.25) * 1e6))
        assert out.loc[h, "sum_micro"] == s and out.loc[h, "mean_micro"] == s // 2


def test_mad_anomaly_matches_numpy(spark):
    """Window-percentile MAD flags equal a per-series numpy median/MAD
    computed in the same doubled-micro integer units, including the
    breakdown property: a 30% contamination burst is flagged while the
    clean points are not, and a zero-MAD series flags any deviation."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import mad_anomaly

    rng = np.random.default_rng(7)
    y = np.round(rng.normal(10, 0.5, 200), 3)
    y[:60] += 50.0  # 30% contamination burst
    pdf = pd.DataFrame(
        {
            "source": (["a"] * 200) + (["b"] * 5),
            "y": np.concatenate([y, [3.0, 3.0, 3.0, 3.0, 7.0]]),
            "event_id": range(205),
        }
    )
    got = (
        mad_anomaly(spark.createDataFrame(pdf), k_milli=3000)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for src, sub in got.groupby("source"):
        v2 = np.round(sub.y.to_numpy() * 1e6).astype(np.int64) * 2
        m2 = int(np.median(v2))  # integer: doubled units
        dev2 = np.abs(v2 - m2)
        mad4 = int(np.median(dev2 * 2))
        assert (np.round(sub.med.to_numpy() * 2e6).astype(np.int64) == m2).all()
        assert (np.round(sub.mad.to_numpy() * 4e6).astype(np.int64) == mad4).all()
        want = dev2 * 2000 > 3000 * mad4
        assert sub.is_anomaly.to_numpy().tolist() == want.tolist()
    a = got[got.source == "a"]
    assert a.is_anomaly.to_numpy()[:60].all() and not a.is_anomaly.to_numpy()[60:].any()
    b = got[got.source == "b"]
    assert b.mad.eq(0).all() and b.is_anomaly.tolist() == [False] * 4 + [True]


def test_rolling_median_matches_pandas(spark):
    """Trailing 7-frame window median equals pandas rolling median
    computed in the same doubled-micro integer units (head frames of
    every parity included)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import rolling_median

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 40 + ["b"] * 9,
            "ts": pd.date_range("2030-01-01", periods=49, freq="1min"),
            "y": np.round(rng.normal(100, 20, 49), 3),
            "event_id": range(49),
        }
    )
    got = (
        rolling_median(spark.createDataFrame(pdf), window=7)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for _, sub in pdf.groupby("source"):
        v2 = pd.Series(np.round(sub.y.to_numpy() * 1e6).astype(np.int64) * 2)
        want = v2.rolling(7, min_periods=1).median() / 2e6
        np.testing.assert_array_equal(
            got[got.event_id.isin(sub.event_id)].med_roll.to_numpy(), want.to_numpy()
        )


def test_acf_matches_numpy_loop(spark):
    """gamma_k equals the explicit truncated-mean-centered product sum;
    rho_1 of an alternating series is ~-1, of a smooth ramp ~+1."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import acf

    alt = 50.0 + 5.0 * np.array([1, -1] * 100, dtype=float)
    ramp = np.linspace(0, 100, 200)
    pdf = pd.DataFrame(
        {
            "source": ["alt"] * 200 + ["ramp"] * 200,
            "ts": list(pd.date_range("2030-01-01", periods=200, freq="1min")) * 2,
            "y": np.concatenate([alt, ramp]),
            "event_id": range(400),
        }
    )
    got = acf(spark.createDataFrame(pdf), max_lag=3).toPandas()
    for name, y in (("alt", alt), ("ramp", ramp)):
        vc = np.round(y * 100).astype(np.int64)
        m = int(vc.sum()) // len(vc)
        dev = vc - m
        g0 = int((dev * dev).sum())
        sub = got[got.source == name].set_index("lag")
        for k in (1, 2, 3):
            gk = int((dev[k:] * dev[:-k]).sum())
            assert sub.loc[k, "gamma"] == gk
            assert sub.loc[k, "rho"] == float(gk) / float(g0)
            assert sub.loc[k, "n_used"] == len(y) - k
    assert got.set_index(["source", "lag"]).loc[("alt", 1), "rho"] < -0.99
    assert got.set_index(["source", "lag"]).loc[("ramp", 1), "rho"] > 0.98


def test_acf_pacf_negative_mean_trunc_division(spark):
    """The Arrow kernels replay Spark ``div`` (truncation toward zero) for
    the centering mean — testdata means are all positive, so the negative
    branch (where trunc and numpy's floor ``//`` disagree by 1) is only
    pinned here. A floor-division regression shifts every deviation and
    every gamma."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import acf, pacf

    # sum of round(y*100) is negative and NOT divisible by n
    y = np.array(
        [-1.37, -0.11, 2.53, -3.89, -0.07, 1.01, -2.23] * 29 + [-0.13], dtype=float
    )
    n = len(y)
    pdf = pd.DataFrame(
        {
            "source": ["neg"] * n,
            "ts": pd.date_range("2030-01-01", periods=n, freq="1min"),
            "y": y,
            "event_id": range(n),
        }
    )
    sdf = spark.createDataFrame(pdf)

    def trunc_div(a: int, b: int) -> int:
        return abs(a) // b * (1 if a >= 0 else -1)

    for op, quantum in ((acf, 100), (pacf, 10)):
        vc = np.round(y * quantum).astype(np.int64)
        s = int(vc.sum())
        assert s < 0 and s % n != 0  # the case under test
        m = trunc_div(s, n)
        assert m != s // n  # floor would differ — the test has teeth
        dev = vc - m
        got = op(sdf).toPandas().set_index("lag")
        for k in (1, 2, 3):
            assert got.loc[k, "gamma"] == int((dev[k:] * dev[:-k]).sum())


def test_pacf_matches_float_yule_walker(spark):
    """PACF(k) from the exact-integer Cramer kernel equals the float
    Yule-Walker Toeplitz solve's last coefficient to ~1e-12 relative
    (the estimators share the same quantized gammas, so the only
    difference is float vs exact-rational determinant arithmetic), and
    an AR(1) series shows the textbook cutoff: |pacf_1| large,
    |pacf_2|, |pacf_3| near zero."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import pacf

    rng = np.random.RandomState(7)
    n = 400
    ar1 = np.zeros(n)
    for t in range(1, n):
        ar1[t] = 0.8 * ar1[t - 1] + rng.normal(0, 5)
    noise = rng.normal(50, 20, n)
    pdf = pd.DataFrame(
        {
            "source": ["ar1"] * n + ["noise"] * n,
            "ts": list(pd.date_range("2030-01-01", periods=n, freq="1min")) * 2,
            "y": np.concatenate([ar1 + 100, noise]),
            "event_id": range(2 * n),
        }
    )
    got = pacf(spark.createDataFrame(pdf)).toPandas().set_index(["source", "lag"])
    for name, y in (("ar1", ar1 + 100), ("noise", noise)):
        vc = np.round(y * 10).astype(np.int64)
        m = int(vc.sum()) // len(vc)
        dev = (vc - m).astype(float)
        g = [float((dev * dev).sum())] + [
            float((dev[k:] * dev[:-k]).sum()) for k in (1, 2, 3)
        ]
        for k in (1, 2, 3):
            R = np.array([[g[abs(i - j)] for j in range(k)] for i in range(k)])
            phi = np.linalg.solve(R, np.array(g[1 : k + 1]))
            want = phi[-1]
            have = got.loc[(name, k), "pacf"]
            assert abs(have - want) < 1e-9 * max(1.0, abs(want))
    assert got.loc[("ar1", 1), "pacf"] > 0.7
    assert abs(got.loc[("ar1", 2), "pacf"]) < 0.15
    assert abs(got.loc[("ar1", 3), "pacf"]) < 0.15


def test_pacf_hugeint_determinant_bound_sf01():
    """Pin the deci-unit magnitude bound that keeps the lag-3 Cramer
    determinants inside DuckDB's HUGEINT at the largest gate scale
    (sf0.1): |den3|,|num3| must stay below 2^120 (margin 2^6 under the
    2^126 cap; the operator docstring's scaling argument)."""
    import duckdb

    rows = duckdb.sql(
        """
        WITH s AS (
          SELECT event_type AS source,
                 CAST(round(value * 10) AS BIGINT) AS vc,
                 ts, event_id
          FROM '/root/testdata/sf0.1/events.parquet'
        ), c AS (
          SELECT source,
                 vc - CAST(sum(vc) OVER (PARTITION BY source)
                           // count(*) OVER (PARTITION BY source) AS BIGINT) AS dev,
                 ts, event_id
          FROM s
        ), l AS (
          SELECT source, dev,
                 lag(dev, 1) OVER w AS d1, lag(dev, 2) OVER w AS d2,
                 lag(dev, 3) OVER w AS d3
          FROM c WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)
        )
        SELECT source,
               CAST(sum(dev * dev) AS HUGEINT) AS g0,
               CAST(sum(dev * d1) AS HUGEINT) AS g1,
               CAST(sum(dev * d2) AS HUGEINT) AS g2,
               CAST(sum(dev * d3) AS HUGEINT) AS g3
        FROM l GROUP BY 1
        """
    ).fetchall()
    assert rows
    for _, g0, g1, g2, g3 in rows:
        g0, g1, g2, g3 = int(g0), int(g1), int(g2), int(g3)
        num3 = g0 * (g0 * g3 - g2 * g1) - g1 * (g1 * g3 - g2 * g2) + g1 * (
            g1 * g1 - g0 * g2
        )
        den3 = g0 * (g0 * g0 - g1 * g1) - g1 * (g1 * g0 - g1 * g2) + g2 * (
            g1 * g1 - g0 * g2
        )
        assert abs(num3) < 1 << 120
        assert abs(den3) < 1 << 120


def test_ccf_detects_lead_lag(spark):
    """x is y shifted forward by 2 buckets (x_t = y_{t-2}), so the CCF
    r(k) = corr(x_t, y_{t-k}) must peak at exactly k = +2 with r ~ 1,
    and the exact-integer gxy equal an explicit numpy replay."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import ccf

    rng = np.random.RandomState(11)
    n = 300
    y = rng.uniform(10, 200, n)
    x = np.roll(y, 2)  # x_t = y_{t-2} for t >= 2
    ts = pd.date_range("2030-01-01", periods=n, freq="1min")
    pdf = pd.DataFrame(
        {
            "source": ["x"] * n + ["y"] * n,
            "ts": list(ts) * 2,
            "y": np.concatenate([x, y]),
            "event_id": range(2 * n),
        }
    )
    got = (
        ccf(spark.createDataFrame(pdf), "x", "y", max_lag=3)
        .toPandas()
        .set_index("lag")
    )
    assert got.loc[2, "r"] > 0.95
    assert all(abs(got.loc[k, "r"]) < 0.3 for k in (-3, -2, -1, 0, 1, 3))
    # exact replay of the integer estimator for the peak lag
    xi = np.round(x * 100).astype(np.int64)
    yi = np.round(y * 100).astype(np.int64)
    dx = xi - int(xi.sum()) // n
    dy = yi - int(yi.sum()) // n
    assert got.loc[2, "gxy"] == int((dx[2:] * dy[:-2]).sum())
    assert got.loc[2, "n_used"] == n - 2


def test_trimmed_mean_resists_outliers(spark):
    """A 5% trimmed mean of clean data + huge outliers recovers the clean
    center (plain mean is dragged far off), and the exact integer
    estimator replays in numpy: drop ceil(5% n) per side by sorted rank,
    truncating micro-unit mean of the rest."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import trimmed_mean

    rng = np.random.RandomState(5)
    n = 1000
    y = rng.uniform(99, 101, n)
    y[:20] = 1e6  # 2% gross outliers
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n,
            "ts": pd.date_range("2030-01-01", periods=n, freq="1min"),
            "y": y,
            "event_id": range(n),
        }
    )
    got = (
        trimmed_mean(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("source")
        .loc["a"]
    )
    assert abs(got["trimmed_mean"] - 100.0) < 0.5
    assert y.mean() > 10000  # the plain mean is ruined
    vm = np.round(y * 1_000_000).astype(np.int64)
    order = np.lexsort((np.arange(n), vm))
    k = -(-5 * n // 100)
    kept = vm[order][k : n - k]
    assert got["n_kept"] == len(kept)
    assert got["trimmed_mean"] == (int(kept.sum()) // len(kept)) / 1_000_000


def test_seasonal_decompose_reconstructs_and_recovers_cycle(spark):
    """trend + seasonal + resid reconstructs y bit-exactly (the identity
    holds by construction in doubled micro-units), and an injected
    hour-of-day cycle on a linear drift lands in the seasonal component:
    the seasonal profile correlates >0.9 with the injected cycle shape
    and the residual variance is far below the cycle's."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import seasonal_decompose

    n = 24 * 40  # 40 days hourly
    t = np.arange(n)
    hod = t % 24
    cycle = 20.0 * np.sin(2 * np.pi * hod / 24)
    rng = np.random.RandomState(9)
    y = 500.0 + 0.01 * t + cycle + rng.normal(0, 0.5, n)
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n,
            "ts": pd.date_range("2030-01-01", periods=n, freq="1h"),
            "y": y,
            "event_id": range(n),
        }
    )
    got = (
        seasonal_decompose(spark.createDataFrame(pdf), window=25)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # exact reconstruction in doubled micro-units
    y2 = np.round(got["y"].to_numpy() * 1e6).astype(np.int64) * 2
    parts2 = np.round(
        (got["trend"] + got["seasonal"] + got["resid"]).to_numpy() * 2e6
    ).astype(np.int64)
    assert np.array_equal(y2, parts2)
    # the injected cycle is captured by the seasonal component
    prof = got.groupby(got["ts"].dt.hour)["seasonal"].mean()
    want = 20.0 * np.sin(2 * np.pi * prof.index.to_numpy() / 24)
    c = np.corrcoef(prof.to_numpy(), want)[0, 1]
    assert c > 0.9
    assert got["resid"].to_numpy().std() < cycle.std() / 3


def test_croston_golden_and_rate(spark):
    """Croston on a handcrafted intermittent series matches an explicit
    Python replay of the coupled smoothers exactly, and the rate lands
    between the naive mean-demand-over-all-periods and the mean nonzero
    size (the interval smoother divides the size estimate)."""
    import pandas as pd

    from forecaster_spark.operators.timeweight import croston

    # demands of 300, 600, 300 centi at minutes 0, 4, 6 (intervals 4, 2)
    pdf = pd.DataFrame(
        {"source": ["a"] * 3, "m": [100, 104, 106], "d": [300, 600, 300]}
    )
    got = croston(spark.createDataFrame(pdf)).toPandas().set_index("source").loc["a"]
    z, q = 300.0, 1.0
    for dd, ii in ((600.0, 4.0), (300.0, 2.0)):
        z = dd * 0.25 + z * 0.75
        q = ii * 0.25 + q * 0.75
    assert got["n_demands"] == 3
    assert got["z"] == z
    assert got["q"] == q
    assert got["rate"] == z / q / 100.0
    # rate below the mean nonzero size (q > 1 divides it down)
    assert got["rate"] < (3.0 + 6.0 + 3.0) / 3 / 1.0


def test_burstiness_poisson_vs_bursty(spark):
    """A uniform one-event-per-minute stream has dispersion ~0 (regular),
    a stream cramming the same events into 1-of-10 minutes is
    over-dispersed (Fano >> 1), and the closed-form zero-minute identity
    matches an explicit numpy replay over the materialized grid."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import burstiness

    t0 = pd.Timestamp("2030-01-01")
    n = 600
    regular = pd.DataFrame(
        {"source": "reg", "ts": [t0 + pd.Timedelta(minutes=i) for i in range(n)]}
    )
    bursty = pd.DataFrame(
        {
            "source": "burst",
            "ts": [
                t0 + pd.Timedelta(minutes=10 * (i // 10), seconds=i % 10)
                for i in range(n)
            ],
        }
    )
    df = spark.createDataFrame(pd.concat([regular, bursty], ignore_index=True))
    got = burstiness(df).toPandas().set_index("source")
    assert got.loc["reg", "dispersion"] == 0.0  # exactly 1 event/minute
    assert got.loc["burst", "dispersion"] > 5.0
    # replay: materialize the grid for the bursty source
    r = got.loc["burst"]
    counts = np.zeros(int(r["n_minutes_spanned"]), dtype=np.int64)
    for i in range(n):
        counts[(10 * (i // 10))] += 1
    want = counts.var() / counts.mean()
    assert abs(r["dispersion"] - want) < 1e-9
    assert r["n_events"] == n
    assert r["n_minutes_active"] == len(np.nonzero(counts)[0])


def test_theil_sen_robust_to_outlier(spark):
    """On a clean slope-2 line with one wild outlier, Theil-Sen recovers
    ~2 while the OLS slope is dragged far off; the quantized-integer
    estimator matches an explicit numpy pairwise replay exactly."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import theil_sen

    t0 = pd.Timestamp("2030-01-01")
    n = 40
    ys = [2.0 * i + 10 for i in range(n)]
    ys[7] = 5000.0  # wild point
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n,
            "ts": [t0 + pd.Timedelta(seconds=i) for i in range(n)],
            "y": ys,
            "event_id": range(n),
        }
    )
    got = theil_sen(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert abs(got["slope"] - 2.0) < 0.01
    # OLS on the same data is ruined by the single outlier
    tt = np.arange(n, dtype=float)
    ols = np.polyfit(tt, np.array(ys), 1)[0]
    assert abs(ols - 2.0) > 1.0
    # exact replay
    v = np.round(np.array(ys) * 100).astype(np.int64)
    t = np.arange(n, dtype=np.int64)
    iu, ju = np.triu_indices(n, k=1)
    s2 = (((v[ju] - v[iu]) * 1000) // (t[ju] - t[iu])) * 2
    assert got["slope"] == int(np.median(s2)) / 200000.0
    assert got["n_pairs"] == len(s2)


def test_robust_scale_outlier_immune(spark):
    """RobustScaler semantics: one wild outlier moves neither the median
    nor the IQR, and the quarter-quanta arithmetic reproduces the exact
    numpy quantile interpolation."""
    import numpy as np
    import pandas as pd

    ys = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 10000.0]
    pdf = pd.DataFrame(
        {"source": ["a"] * len(ys), "y": ys, "event_id": range(len(ys))}
    )
    df = spark.createDataFrame(pdf)
    out = (
        FT.transform_robust(df, FT.fit_robust(df, ["y"]), ["y"])
        .toPandas()
        .sort_values("event_id")
    )
    q4 = np.round(np.array(ys) * 100).astype(np.int64) * 4
    med4 = np.quantile(q4, 0.5)
    iqr4 = np.quantile(q4, 0.75) - np.quantile(q4, 0.25)
    want = (q4 - med4) / iqr4
    assert np.array_equal(out["y_rs"].to_numpy(), want)
    # the outlier's own scaled value is huge but the rest sit in ~[-1, 1]
    assert np.all(np.abs(want[:-1]) <= 1.0)
    # quantile positions on n-1 are quarter-integral -> med4/iqr4 integral
    assert med4 == int(med4) and iqr4 == int(iqr4)


def test_histogram_drift_detects_shift(spark):
    """A mean shift between the two time halves concentrates counts in
    disjoint bins -> large chi-square terms; identical halves -> zero."""
    import pandas as pd

    from forecaster_spark.operators.timeweight import histogram_drift

    t0 = pd.Timestamp("2030-01-01")
    rows = []
    for i in range(100):
        rows.append(("a", t0 + pd.Timedelta(minutes=i), 10.0, i))
    for i in range(100):
        rows.append(("a", t0 + pd.Timedelta(minutes=100 + i), 90.0, 100 + i))
    # a stable source: same value both halves
    for i in range(200):
        rows.append(("s", t0 + pd.Timedelta(minutes=i), 50.0, 400 + i))
    pdf = pd.DataFrame(rows, columns=["source", "ts", "y", "event_id"])
    out = histogram_drift(spark.createDataFrame(pdf)).toPandas()
    a = out[out.source == "a"].sort_values("bin")
    # two disjoint bins, each fully one-sided: term == count
    assert len(a) == 2
    assert set(zip(a.c1, a.c2)) == {(100, 0), (0, 100)}
    assert (a.chi2_term == 100.0).all()
    s = out[out.source == "s"]
    assert len(s) == 1 and float(s.chi2_term.iloc[0]) == 0.0
    assert int(s.c1.iloc[0]) == 100 and int(s.c2.iloc[0]) == 100


def test_holt_winters_seasonal_convergence(spark):
    """On a clean linear+seasonal signal HW's one-step forecast converges;
    during the first (zero-seeded) season its level/trend chain is
    bit-identical to plain Holt with the same alpha/beta."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import holt_linear, holt_winters

    m, n = 6, 120
    pattern = [0.0, 4.0, 8.0, 2.0, -6.0, -8.0]
    t0 = pd.Timestamp("2030-01-01")
    ys = [10.0 + 0.5 * i + pattern[i % m] for i in range(n)]
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n,
            "ts": [t0 + pd.Timedelta(hours=i) for i in range(n)],
            "y": ys,
        }
    )
    df = spark.createDataFrame(pdf)
    hw = (
        holt_winters(df, alpha=0.25, beta=0.5, gamma=0.5, period=m)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # late one-step forecasts track the signal closely (fc1[t] predicts y[t+1])
    err = np.abs(hw["fc1"].to_numpy()[:-1] - np.array(ys)[1:])
    assert err[-2 * m :].max() < 0.7
    # untrained start is far off (trend + seasonal unlearned) — HW earned it
    assert err[:m].max() > 3.0
    # first season (seasonal ring still zero-seeded): level/trend == Holt
    h = (
        holt_linear(df, alpha=0.25, beta=0.5)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    for col in ("level", "trend"):
        assert np.array_equal(
            hw[col].to_numpy()[:m], h[col].to_numpy()[:m]
        ), col


def test_kalman_level_steady_state(spark):
    """The local-level Kalman gain converges to the Riccati fixed point
    K* = p/(p+r), p = (q + sqrt(q^2 + 4qr))/2; a constant series is left
    untouched (x == y, innovation 0 every step)."""
    import math

    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.timeweight import kalman_level

    q, r, n = 0.25, 4.0, 120
    t0 = pd.Timestamp("2030-01-01")
    rng = np.random.default_rng(7)
    ys = (50 + rng.normal(0, 2, n).cumsum()).tolist()
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n + ["const"] * n,
            "ts": [t0 + pd.Timedelta(hours=i) for i in range(n)] * 2,
            "y": ys + [42.0] * n,
        }
    )
    out = kalman_level(spark.createDataFrame(pdf), q=q, r=r).toPandas()
    a = out[out.source == "a"].sort_values("ts")
    p_star = (q + math.sqrt(q * q + 4 * q * r)) / 2
    k_star = p_star / (p_star + r)
    assert abs(a["gain"].iloc[-1] - k_star) < 1e-9
    assert abs(a["gain"].iloc[-50] - k_star) < 1e-9
    c = out[out.source == "const"].sort_values("ts")
    assert (c["x"] == 42.0).all()


def test_tfidf_topk_scores_and_tiebreak(spark):
    """Hand-checked tf*N/df scores; equal scores rank by term ascending."""
    import pandas as pd

    from forecaster_spark.operators.textops import tfidf_topk

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["Apple banana APPLE", "banana cherry", "cherry Cherry durian"],
        }
    )
    out = tfidf_topk(spark.createDataFrame(docs), k=3).toPandas()
    d1 = out[out.doc_id == 1].sort_values("rnk")
    assert list(d1.term) == ["apple", "banana"]
    assert list(d1.score) == [6.0, 1.5]
    d3 = out[out.doc_id == 3].sort_values("rnk")
    # cherry and durian both score 3.0 -> term-asc tie-break
    assert list(d3.term) == ["cherry", "durian"]
    assert list(d3.score) == [3.0, 3.0]
    assert list(d3.tf) == [2, 1] and list(d3.df) == [2, 1]


def test_sax_symbols_quartile_alphabet(spark):
    """Four equal-width segments with strictly increasing sums map to
    'a','b','c','d'; a trailing partial segment is dropped."""
    import pandas as pd

    from forecaster_spark.operators.downsample import sax_symbols

    t0 = pd.Timestamp("2030-01-01")
    ys = [1.0] * 8 + [2.0] * 8 + [3.0] * 8 + [4.0] * 8 + [9.0] * 3  # partial tail
    pdf = pd.DataFrame(
        {
            "source": ["a"] * len(ys),
            "ts": [t0 + pd.Timedelta(hours=i) for i in range(len(ys))],
            "y": ys,
        }
    )
    out = (
        sax_symbols(spark.createDataFrame(pdf), width=8)
        .toPandas()
        .sort_values("seg")
    )
    assert list(out.seg) == [0, 1, 2, 3]  # tail segment (3 points) dropped
    assert list(out.seg_sum) == [8, 16, 24, 32]
    assert list(out.symbol) == ["a", "b", "c", "d"]
    assert (out.n_points == 8).all()
