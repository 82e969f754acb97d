"""Golden tests for the round-3 additions: split-conformal intervals,
ACF-argmax dominant period, and the Benford leading-digit screen.

Each test computes the expectation independently (plain Python/numpy, no
shared code with the operators beyond the documented estimator), so a
regression in kernel or plan shape cannot hide behind a shared oracle.
"""

import math

import numpy as np
import pandas as pd
import pytest

from forecaster_spark.operators.conformal import conformal_interval
from forecaster_spark.operators.stats_tests import BENFORD_PPM, benford_digits
from forecaster_spark.operators.timeweight import dominant_period


def _series_df(spark, y_by_source: dict):
    rows = []
    for src, ys in y_by_source.items():
        for i, y in enumerate(ys):
            rows.append((src, pd.Timestamp("2030-01-01") + pd.Timedelta(hours=i), float(y)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["source", "ts", "y"]))


class TestConformalInterval:
    def test_golden_hand_computed(self, spark):
        # 20 points, hh=4 -> cal residuals from idx 1..15 (ncal=15)
        y = [10, 12, 11, 15, 15, 14, 20, 18, 18, 19, 25, 24, 23, 30, 28, 29, 35, 33, 40, 38]
        df = _series_df(spark, {"a": y})
        got = (
            conformal_interval(df, hh=4, alpha_num=1, alpha_den=8)
            .toPandas()
            .sort_values("ts")
            .reset_index(drop=True)
        )
        n, hh = len(y), 4
        ncal = n - hh - 1
        res = sorted(abs(y[t] - y[t - 1]) for t in range(1, n - hh))
        k = min(math.ceil((ncal + 1) * 7 / 8), ncal)
        q = res[k - 1]
        assert len(got) == hh
        for j, row in got.iterrows():
            idx = n - hh + j
            assert row["y"] == y[idx]
            assert row["fc"] == y[idx - 1]
            assert row["q"] == q
            assert row["lo"] == y[idx - 1] - q
            assert row["hi"] == y[idx - 1] + q
            assert bool(row["covered"]) == (abs(y[idx] - y[idx - 1]) <= q)

    def test_rank_formula_alpha_quarter(self, spark):
        # alpha=1/4 -> k = ceil((ncal+1)*3/4); distinct residuals pin the pick
        y = [0, 1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 66]  # residuals 1,2,3,...
        df = _series_df(spark, {"s": y})
        got = conformal_interval(df, hh=3, alpha_num=1, alpha_den=4).toPandas()
        ncal = len(y) - 3 - 1  # 8 calibration residuals: 1..8
        k = math.ceil((ncal + 1) * 3 / 4)  # 7
        assert set(got["q"]) == {float(k)}

    def test_short_series_dropped(self, spark):
        df = _series_df(spark, {"tiny": [1, 2, 3], "ok": list(range(30))})
        got = conformal_interval(df, hh=6).toPandas()
        assert set(got["source"]) == {"ok"}
        # perfectly linear series: residual always 1, q=1, always covered
        assert got["covered"].all() and set(got["q"]) == {1.0}

    def test_residual_ties_deterministic(self, spark):
        # all residuals equal -> any rank picks the same q; earliest idx wins
        y = [5, 7, 5, 7, 5, 7, 5, 7, 5, 7, 5, 7]
        df = _series_df(spark, {"z": y})
        got = conformal_interval(df, hh=2).toPandas()
        assert set(got["q"]) == {2.0}


class TestDominantPeriod:
    def test_detects_planted_period(self, spark):
        # period-7 sawtooth + linear-free noise-free signal, 70 points
        y7 = [(i % 7) * 10 for i in range(70)]
        # period-24-ish square wave
        y24 = [100 if (i // 12) % 2 == 0 else 0 for i in range(96)]
        df = _series_df(spark, {"saw7": y7, "sq24": y24})
        got = dominant_period(df, min_lag=2, max_lag=30).toPandas().set_index("source")
        assert got.loc["saw7", "period"] == 7
        assert got.loc["sq24", "period"] == 24
        assert got.loc["saw7", "rho"] >= 0.9

    def test_matches_numpy_argmax(self, spark):
        rng = np.random.default_rng(3)
        y = np.floor(rng.normal(50, 10, 200)).astype(int)
        df = _series_df(spark, {"r": y.tolist()})
        got = dominant_period(df, min_lag=2, max_lag=48).toPandas().iloc[0]
        s = int(y.sum())
        m = abs(s) // len(y) * (1 if s >= 0 else -1)
        dev = y - m
        g0 = int(np.dot(dev, dev))
        gs = {k: int(np.dot(dev[k:], dev[:-k])) for k in range(2, 49)}
        best = min((-g, k) for k, g in gs.items())
        assert (got["period"], got["gamma"], got["g0"]) == (best[1], -best[0], g0)
        assert got["rho"] == np.float64(-best[0]) / np.float64(g0)

    def test_negative_mean_trunc_centering(self, spark):
        # negative, non-divisible sum: trunc-div (Spark) differs from floor
        y = [-3, -1, -4, -1, -5, -9, -2, -6, -5, -3, -4]
        df = _series_df(spark, {"neg": y})
        s, n = sum(y), len(y)
        assert s < 0 and s % n != 0
        m = abs(s) // n * -1
        assert m != s // n  # the branch under test
        dev = np.array(y) - m
        got = dominant_period(df, min_lag=2, max_lag=5).toPandas().iloc[0]
        gs = {k: int(np.dot(dev[k:], dev[:-k])) for k in range(2, 6)}
        best = min((-g, k) for k, g in gs.items())
        assert (got["period"], got["gamma"]) == (best[1], -best[0])

    def test_tiebreak_smallest_lag(self, spark):
        # constant series: all gammas equal (all devs 0) -> smallest lag wins
        df = _series_df(spark, {"c": [5.0] * 40})
        got = dominant_period(df, min_lag=2, max_lag=10).toPandas().iloc[0]
        assert got["period"] == 2 and got["gamma"] == 0


class TestBenfordDigits:
    def test_golden_counts_and_tvd(self, spark):
        # values engineered per leading digit of round(v*1e6)
        vals = [1.0] * 30 + [2.5] * 20 + [9.0] * 10 + [0.0] * 5 + [-3.0] * 7
        pdf = pd.DataFrame({"source": ["x"] * len(vals), "value": vals})
        got = (
            benford_digits(spark.createDataFrame(pdf))
            .toPandas()
            .set_index("digit")
            .sort_index()
        )
        assert len(got) == 9  # full spine, zero rows dropped
        n = 30 + 20 + 10 + 7  # zeros excluded, negatives kept by |.|
        assert set(got["n"]) == {n}
        assert got.loc[1, "cnt"] == 30 and got.loc[2, "cnt"] == 20
        assert got.loc[3, "cnt"] == 7 and got.loc[9, "cnt"] == 10
        assert got.loc[4, "cnt"] == 0  # spine keeps absent digits
        exp_tvd = sum(
            abs((int(got.loc[d, "cnt"]) * 1_000_000) // n - BENFORD_PPM[d - 1])
            for d in range(1, 10)
        )
        assert set(got["tvd_ppm"]) == {exp_tvd}

    def test_benford_like_sample_scores_low(self, spark):
        # a log-uniform sample IS Benford-distributed; uniform is not
        rng = np.random.default_rng(11)
        logu = np.power(10.0, rng.uniform(0, 4, 40_000))
        unif = rng.uniform(1, 10_000, 40_000)
        pdf = pd.DataFrame(
            {
                "source": ["logu"] * 40_000 + ["unif"] * 40_000,
                "value": np.concatenate([logu, unif]),
            }
        )
        got = benford_digits(spark.createDataFrame(pdf)).toPandas()
        tvd = got.groupby("source")["tvd_ppm"].first()
        assert tvd["logu"] < 30_000  # close to Benford
        assert tvd["unif"] > 200_000  # flagrantly not

    def test_fractional_values_use_micro_digits(self, spark):
        # 0.005 -> micro 5000 -> leading digit 5
        pdf = pd.DataFrame({"source": ["f", "f"], "value": [0.005, 0.07]})
        got = benford_digits(spark.createDataFrame(pdf)).toPandas()
        nz = got[got["cnt"] > 0].set_index("digit")
        assert set(nz.index) == {5, 7}


class TestPinballQof:
    def test_golden_hand_computed(self, spark):
        from forecaster_spark.models.metrics import pinball_qof

        pdf = pd.DataFrame(
            {
                "g": ["a"] * 6,
                "y_true": [10, 12, 8, 15, 9, 11],
                "y_hat": [11, 10, 8, 12, 14, 11],
            }
        )
        got = (
            pinball_qof(spark.createDataFrame(pdf), ["g"], taus=((1, 4), (3, 4)))
            .toPandas()
            .set_index("tau_num")
        )

        def pin(num, den):
            tot = 0
            for y, f in zip(pdf["y_true"], pdf["y_hat"]):
                e = y - f
                tot += max(num * e, (num - den) * e)
            return tot

        for num in (1, 3):
            assert got.loc[num, "den_loss_sum"] == pin(num, 4)
            assert got.loc[num, "mean_milli"] == (1000 * pin(num, 4)) // (6 * 4)

    def test_median_tau_is_half_mae(self, spark):
        # tau=2/4: L = |e|/2, den=4 -> den*L = 2|e| -> sum == 2*sum|e|
        from forecaster_spark.models.metrics import pinball_qof

        rng = np.random.default_rng(5)
        y = rng.integers(0, 100, 50)
        f = rng.integers(0, 100, 50)
        pdf = pd.DataFrame({"g": ["m"] * 50, "y_true": y, "y_hat": f})
        got = pinball_qof(spark.createDataFrame(pdf), ["g"], taus=((2, 4),)).toPandas()
        assert got["den_loss_sum"].iat[0] == 2 * int(np.abs(y - f).sum())


class TestDuplicatedSpans:
    def test_planted_duplicates(self, spark):
        from forecaster_spark.operators.dedup import duplicated_spans

        boiler = "all rights reserved by the example corporation"
        docs = [
            (i, f"u{i}a u{i}b u{i}c u{i}d " + (boiler if i % 2 == 0 else ""))
            for i in range(20)
        ]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = duplicated_spans(df, top_n=5).toPandas()
        assert list(got["rnk"]) == list(range(1, len(got) + 1))
        # boilerplate 3-grams appear in the 10 even docs
        assert got["n_docs"].max() == 10
        top = got[got["n_docs"] == 10]
        assert (top["first_doc"] == 0).all() and (top["last_doc"] == 18).all()

    def test_long_span_k16_planted_boilerplate(self, spark):
        """r5 span-length parameter: at k=16 (the Lee-et-al-scale window)
        a 21-word license preamble planted in 4 of 8 docs yields EXACTLY
        the 6 fully-in-preamble 16-gram windows as duplicated spans (every
        preamble→body window is doc-unique), all with n_docs = 4."""
        from forecaster_spark.operators.dedup import duplicated_spans

        boiler = (
            "all rights reserved this material is provided without warranty "
            "of any kind reproduction or distribution without prior written "
            "consent is prohibited"
        )  # 21 words -> 21-16+1 = 6 full 16-gram windows
        docs = [
            (i, (boiler + " " if i % 2 == 0 else "") + f"u{i}a u{i}b u{i}c u{i}d")
            for i in range(8)
        ]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = duplicated_spans(df, k=16, top_n=50).toPandas()
        assert len(got) == 6
        assert (got["n_docs"] == 4).all()
        assert (got["first_doc"] == 0).all() and (got["last_doc"] == 6).all()
        # and at k=3 the same corpus flags many more (shorter) spans
        got3 = duplicated_spans(df, k=3, top_n=50).toPandas()
        assert len(got3) == 19  # 21-3+1 boiler 3-grams, all in the 4 docs

    def test_long_span_k16_removal(self, spark):
        """Removal at k=16 strips exactly the preamble-covered positions:
        planted docs (unique tails) lose all 21 boilerplate words and
        keep their 4 tail words; clean docs are untouched."""
        from forecaster_spark.operators.dedup import remove_duplicated_spans

        boiler = (
            "all rights reserved this material is provided without warranty "
            "of any kind reproduction or distribution without prior written "
            "consent is prohibited"
        )
        docs = [
            (i, (boiler + " " if i % 2 == 0 else "") + f"u{i}a u{i}b u{i}c u{i}d")
            for i in range(8)
        ]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = (
            remove_duplicated_spans(df, k=16, top_n=50)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        for i in range(8):
            if i % 2 == 0:
                assert got.loc[i, "n_words"] == 25 and got.loc[i, "n_removed"] == 21
            else:
                assert got.loc[i, "n_words"] == 4 and got.loc[i, "n_removed"] == 0

    def test_cdc_shift_resistance(self, spark):
        """The CDC property fixed k-grams lack: a shared paragraph chunks
        identically at DIFFERENT offsets. Plant the same 21-word preamble
        at offset 0 in some docs and after unique prefixes of varying
        length in others — shared chunks must still surface with n_docs
        equal to ALL planted docs, and an unplanted control corpus must
        yield none of those hashes."""
        from forecaster_spark.operators.dedup import cdc_chunk_ledger

        boiler = (
            "all rights reserved this material is provided without warranty "
            "of any kind reproduction or distribution without prior written "
            "consent is prohibited"
        )
        docs = []
        for i in range(10):
            prefix = " ".join(f"p{i}w{j}" for j in range(i))  # 0..9 shift
            tail = f"t{i}a t{i}b"
            docs.append((i, f"{prefix} {boiler} {tail}".strip()))
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = cdc_chunk_ledger(df, g=4, mask_bits=3, top_n=50).toPandas()
        # interior boiler chunks (cuts fully inside the preamble) are
        # shared by every doc regardless of prefix length
        assert (got["n_docs"] == 10).any()
        full = got[got["n_docs"] == 10]
        assert (full["first_doc"] == 0).all() and (full["last_doc"] == 9).all()
        # control: unique-content corpus shares nothing
        ctrl = spark.createDataFrame(
            pd.DataFrame(
                [(i, " ".join(f"c{i}x{j}" for j in range(25))) for i in range(10)],
                columns=["doc_id", "text"],
            )
        )
        assert len(cdc_chunk_ledger(ctrl, top_n=50).toPandas()) == 0

    def test_no_duplicates_empty(self, spark):
        from forecaster_spark.operators.dedup import duplicated_spans

        docs = [(i, f"w{i}a w{i}b w{i}c alpha{i} beta{i} gamma{i}") for i in range(6)]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = duplicated_spans(df, top_n=5).toPandas()
        assert len(got) == 0

    def test_unsigned_tiebreak_order(self, spark):
        # ties on n_docs must order by the UNSIGNED hash: any negative
        # span_hash ranks after every positive one at the same n_docs
        from forecaster_spark.operators.dedup import duplicated_spans

        docs = [(i, "one two three four five six seven eight nine ten") for i in range(3)]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = duplicated_spans(df, top_n=50).toPandas()
        assert (got["n_docs"] == 3).all()
        h = got["span_hash"].to_list()
        uns = [x & ((1 << 64) - 1) for x in h]
        assert uns == sorted(uns)


class TestGrangerPairs:
    def _run(self, spark, data):
        from forecaster_spark.operators.stats_tests import granger_pairs

        rows = []
        for src, ys in data.items():
            for i, y in enumerate(ys):
                rows.append((src, pd.Timestamp("2030-01-01") + pd.Timedelta(hours=i), float(y)))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "ts", "y"]))
        return granger_pairs(df).toPandas().set_index(["y_source", "x_source"])

    def test_planted_causality_detected(self, spark):
        # y follows x's previous value exactly; z is independent noise
        rng = np.random.default_rng(7)
        x = rng.integers(0, 200, 120)
        noise = rng.integers(-3, 4, 120)
        y = np.concatenate([[50], x[:-1]]) + noise  # y_t ~ x_{t-1} + eps
        z = rng.integers(0, 200, 120)
        got = self._run(spark, {"x": x.tolist(), "y": y.tolist(), "z": z.tolist()})
        # x's past explains y up to small noise -> huge F; z's past does not
        assert got.loc[("y", "x"), "f_ratio"] > 100 * max(got.loc[("y", "z"), "f_ratio"], 1.0)
        assert abs(got.loc[("y", "x"), "b_cross"] - 1.0) < 0.05
        assert got.loc[("y", "x"), "rss_f_q"] <= got.loc[("y", "x"), "rss_r_q"]

    def test_matches_lstsq_reference(self, spark):
        rng = np.random.default_rng(13)
        a = np.floor(rng.normal(100, 20, 90)).astype(int)
        b = np.floor(rng.normal(100, 20, 90)).astype(int)
        got = self._run(spark, {"a": a.tolist(), "b": b.tolist()})
        yv, l1y, l1x = a[1:].astype(float), a[:-1].astype(float), b[:-1].astype(float)
        Xf = np.column_stack([np.ones_like(yv), l1y, l1x])
        bf, *_ = np.linalg.lstsq(Xf, yv, rcond=None)
        assert abs(got.loc[("a", "b"), "b_cross"] - bf[2]) < 1e-6
        rss_f = float(np.sum((yv - Xf @ bf) ** 2))
        # micro-quantized integer RSS within one quantum per row of BLAS RSS
        assert abs(got.loc[("a", "b"), "rss_f_q"] / 1e6 - rss_f) < len(yv) / 1e6 + 1e-3

    def test_row_count_and_n(self, spark):
        got = self._run(spark, {"p": list(range(40)), "q": list(range(40)), "r": list(range(40))})
        assert len(got) == 6  # 3 sources -> 6 ordered pairs
        assert set(got["n"]) == {39}


class TestDickeyFuller:
    def test_random_walk_vs_stationary(self, spark):
        from forecaster_spark.operators.stats_tests import dickey_fuller

        rng = np.random.default_rng(17)
        walk = np.cumsum(rng.integers(-5, 6, 300)) + 1000  # unit root
        nois = rng.integers(90, 110, 300)  # white noise around 100
        got = (
            dickey_fuller(_series_df(spark, {"walk": walk.tolist(), "flat": nois.tolist()}))
            .toPandas()
            .set_index("source")
        )
        assert bool(got.loc["flat", "stationary_5pct"])
        assert not bool(got.loc["walk", "stationary_5pct"])
        assert got.loc["flat", "t_stat"] < -2.86 < got.loc["walk", "t_stat"]

    def test_matches_lstsq_reference(self, spark):
        from forecaster_spark.operators.stats_tests import dickey_fuller

        rng = np.random.default_rng(23)
        y = np.floor(rng.normal(50, 12, 150)).astype(int)
        got = dickey_fuller(_series_df(spark, {"s": y.tolist()})).toPandas().iloc[0]
        z = y[:-1].astype(float)
        dy = np.diff(y).astype(float)
        X = np.column_stack([np.ones_like(z), z])
        beta, *_ = np.linalg.lstsq(X, dy, rcond=None)
        resid = dy - X @ beta
        rss = float(resid @ resid)
        n = len(dy)
        se = math.sqrt(rss / (n - 2) / np.sum((z - z.mean()) ** 2))
        assert abs(got["b_hat"] - beta[1]) < 1e-9
        assert abs(got["t_stat"] - beta[1] / se) < 1e-6

    def test_constant_series_null_stat(self, spark):
        from forecaster_spark.operators.stats_tests import dickey_fuller

        got = dickey_fuller(_series_df(spark, {"c": [7.0] * 30})).toPandas().iloc[0]
        assert got["rss_q"] == 0 and pd.isna(got["t_stat"])


class TestKpssLevel:
    def test_walk_vs_noise(self, spark):
        from forecaster_spark.operators.stats_tests import kpss_level

        rng = np.random.default_rng(29)
        walk = np.cumsum(rng.integers(-5, 6, 400)) + 1000
        nois = rng.integers(90, 110, 400)
        got = (
            kpss_level(_series_df(spark, {"walk": walk.tolist(), "flat": nois.tolist()}))
            .toPandas()
            .set_index("source")
        )
        assert bool(got.loc["flat", "level_stationary_5pct"])
        assert not bool(got.loc["walk", "level_stationary_5pct"])

    def test_matches_numpy_formula(self, spark):
        # exact scaled centering: D = n*y - sum(y), eta = sum(cumsum(D)^2)
        # / (n * sum(D^2)) — big square sum in Python ints
        from forecaster_spark.oracle.ref import hugeint_to_double as h2d
        from forecaster_spark.operators.stats_tests import kpss_level

        rng = np.random.default_rng(31)
        y = np.floor(rng.normal(80, 15, 200)).astype(int)
        got = kpss_level(_series_df(spark, {"s": y.tolist()})).toPandas().iloc[0]
        s, n = int(y.sum()), len(y)
        dd = n * y - s
        st = np.cumsum(dd)
        s2 = sum(int(x) * int(x) for x in st)
        d2 = int(dd @ dd)
        assert (got["s2_sum_d"], got["dev2_sum"]) == (h2d(s2), d2)
        assert got["eta"] == h2d(s2) / h2d(n * d2)

    def test_constant_series_null(self, spark):
        from forecaster_spark.operators.stats_tests import kpss_level

        got = kpss_level(_series_df(spark, {"c": [3.0] * 25})).toPandas().iloc[0]
        assert got["dev2_sum"] == 0 and pd.isna(got["eta"])
        assert got["s2_sum_d"] == 0.0


class TestArOrderSelect:
    def test_white_noise_selects_1(self, spark):
        from forecaster_spark.operators.timeweight import ar_order_select

        rng = np.random.default_rng(41)
        y = rng.integers(50, 150, 400)
        got = ar_order_select(_series_df(spark, {"wn": y.tolist()})).toPandas().iloc[0]
        assert got["selected_p"] == 1
        assert got["rss3_q"] <= got["rss2_q"] <= got["rss1_q"]

    def test_planted_ar2_selects_2(self, spark):
        from forecaster_spark.operators.timeweight import ar_order_select

        rng = np.random.default_rng(43)
        n = 500
        y = np.zeros(n)
        for t in range(2, n):
            y[t] = 0.55 * y[t - 1] - 0.35 * y[t - 2] + rng.normal(0, 8)
        y = np.floor(y + 500).astype(int)
        got = ar_order_select(_series_df(spark, {"ar2": y.tolist()})).toPandas().iloc[0]
        assert got["selected_p"] == 2
        assert got["f21"] > 3.84 >= got["f32"]

    def test_rss_matches_lstsq(self, spark):
        from forecaster_spark.operators.timeweight import ar_order_select

        rng = np.random.default_rng(47)
        y = np.floor(rng.normal(100, 20, 200)).astype(int)
        got = ar_order_select(_series_df(spark, {"s": y.tolist()})).toPandas().iloc[0]
        yv = y[3:].astype(float)
        for p, col in ((1, "rss1_q"), (2, "rss2_q"), (3, "rss3_q")):
            X = np.column_stack(
                [np.ones_like(yv)] + [y[3 - k : len(y) - k].astype(float) for k in range(1, p + 1)]
            )
            beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
            rss = float(np.sum((yv - X @ beta) ** 2))
            assert abs(got[col] / 1e6 - rss) < len(yv) / 1e6 + 1e-3


class TestLjungBox:
    def test_noise_vs_ar1(self, spark):
        from forecaster_spark.operators.timeweight import ljung_box

        rng = np.random.default_rng(53)
        wn = rng.integers(0, 100, 500)
        ar = np.zeros(500)
        for t in range(1, 500):
            ar[t] = 0.7 * ar[t - 1] + rng.normal(0, 5)
        ar = np.floor(ar + 200)
        rows = []
        for src, ys in (("wn", wn), ("ar", ar)):
            for i, y in enumerate(ys):
                rows.append((src, pd.Timestamp("2030-01-01") + pd.Timedelta(minutes=i), i, float(y)))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "ts", "event_id", "y"]))
        got = ljung_box(df).toPandas().set_index("source")
        assert bool(got.loc["wn", "white_noise_5pct"])
        assert not bool(got.loc["ar", "white_noise_5pct"])
        assert got.loc["ar", "q_stat"] > 100

    def test_matches_formula(self, spark):
        from forecaster_spark.operators.timeweight import ljung_box

        rng = np.random.default_rng(59)
        y = np.floor(rng.normal(40, 9, 300)).astype(int)
        rows = [
            ("s", pd.Timestamp("2030-01-01") + pd.Timedelta(minutes=i), i, float(v))
            for i, v in enumerate(y)
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "ts", "event_id", "y"]))
        got = ljung_box(df).toPandas().iloc[0]
        vc = np.round(y * 100).astype(np.int64)
        s, n = int(vc.sum()), len(vc)
        m = abs(s) // n * (1 if s >= 0 else -1)
        dev = vc - m
        g0 = int(dev @ dev)
        acc = np.float64(0.0)
        for k in range(1, 6):
            rho = np.float64(int(dev[k:] @ dev[:-k])) / np.float64(g0)
            acc = acc + (rho * rho) / np.float64(n - k)
        assert got["q_stat"] == float(np.float64(n * (n + 2)) * acc)


class TestAutoSeasonalQof:
    def test_planted_period_scores_zero(self, spark):
        from forecaster_spark.operators.timeweight import auto_seasonal_qof

        # pure period-24 signal: detected P=24, seasonal-naive is perfect
        y = [(i % 24) * 5 + 10 for i in range(120)]
        # period-7 signal with noise floor
        rng = np.random.default_rng(61)
        y7 = [((i % 7) * 20 + int(rng.integers(0, 3))) for i in range(120)]
        got = (
            auto_seasonal_qof(_series_df(spark, {"p24": y, "p7": y7}), max_lag=30)
            .toPandas()
            .set_index("source")
        )
        assert got.loc["p24", "period"] == 24
        assert got.loc["p24", "sae"] == 0 and got.loc["p24", "mae_milli"] == 0
        assert got.loc["p7", "period"] == 7
        assert got.loc["p7", "mae_milli"] < 2000  # within the noise band
        # shared window: both scored on idx >= max_lag
        assert set(got["n"]) == {120 - 30}

    def test_hand_computed_errors(self, spark):
        from forecaster_spark.operators.timeweight import auto_seasonal_qof

        rng = np.random.default_rng(67)
        base = [(i % 12) * 10 for i in range(100)]
        noise = rng.integers(-2, 3, 100)
        y = (np.array(base) + noise).tolist()
        got = auto_seasonal_qof(_series_df(spark, {"s": y}), max_lag=24).toPandas().iloc[0]
        P = int(got["period"])
        errs = [y[t] - y[t - P] for t in range(24, 100)]
        assert got["sae"] == sum(abs(e) for e in errs)
        assert got["sse"] == sum(e * e for e in errs)
        assert got["mae_milli"] == (1000 * sum(abs(e) for e in errs)) // len(errs)


class TestArchLm:
    def test_garch_like_vs_homoskedastic(self, spark):
        from forecaster_spark.operators.stats_tests import arch_lm

        rng = np.random.default_rng(71)
        # volatility-clustered: alternating calm/wild 50-step regimes
        vol = np.repeat([2, 40] * 5, 50)
        clustered = np.cumsum(rng.normal(0, 1, 500) * vol)
        clustered = np.floor(clustered + 5000)
        homo = np.floor(np.cumsum(rng.normal(0, 10, 500)) + 5000)
        got = (
            arch_lm(_series_df(spark, {"cl": clustered.tolist(), "ho": homo.tolist()}))
            .toPandas()
            .set_index("source")
        )
        assert bool(got.loc["cl", "arch_5pct"])
        assert got.loc["cl", "lm_stat"] > 3.84
        assert not bool(got.loc["ho", "arch_5pct"])

    def test_matches_formula(self, spark):
        from forecaster_spark.oracle.ref import hugeint_to_double as h2d
        from forecaster_spark.operators.stats_tests import arch_lm

        rng = np.random.default_rng(73)
        y = np.floor(rng.normal(300, 50, 150)).astype(int)
        got = arch_lm(_series_df(spark, {"s": y.tolist()})).toPandas().iloc[0]
        dy = np.diff(y)
        u = (dy * dy).astype(np.int64)
        yv, z = u[1:], u[:-1]
        n = len(yv)
        sz, sy = int(z.sum()), int(yv.sum())
        szz, syz = int(z @ z), int(yv @ z)
        d2 = n * szz - sz * sz
        bh = h2d(n * syz - sz * sy) / h2d(d2)
        ah = h2d(sy * szz - sz * syz) / h2d(d2)
        e = yv.astype(float) - (ah + z.astype(float) * bh)
        rss = int(np.floor(e * e * 1e3).astype(np.int64).sum())
        dd = yv.astype(float) - h2d(sy) / h2d(n)
        tss = int(np.floor(dd * dd * 1e3).astype(np.int64).sum())
        assert (got["rss_q"], got["tss_q"]) == (rss, tss)
        assert got["lm_stat"] == float(n) * (1.0 - float(rss) / float(tss))


class TestDemandClass:
    def _df(self, spark, series):
        rows = []
        for src, pts in series.items():
            for m, d in pts:
                rows.append((src, m, d))
        return spark.createDataFrame(pd.DataFrame(rows, columns=["source", "m", "d"]))

    def test_four_quadrants(self, spark):
        from forecaster_spark.operators.timeweight import demand_class

        rng = np.random.default_rng(79)
        # smooth: every period, near-constant sizes
        smooth = [(m, 100 + int(rng.integers(0, 3))) for m in range(100)]
        # erratic: every period, wildly varying sizes
        erratic = [(m, int(rng.choice([1, 1, 1, 500]))) for m in range(100)]
        # intermittent: sparse periods, near-constant sizes
        inter = [(m * 7, 100 + int(rng.integers(0, 3))) for m in range(30)]
        # lumpy: sparse periods, wild sizes
        lumpy = [(m * 7, int(rng.choice([1, 1, 1, 500]))) for m in range(30)]
        got = (
            demand_class(
                self._df(spark, {"s": smooth, "e": erratic, "i": inter, "l": lumpy})
            )
            .toPandas()
            .set_index("source")
        )
        assert got.loc["s", "demand_class"] == "smooth"
        assert got.loc["e", "demand_class"] == "erratic"
        assert got.loc["i", "demand_class"] == "intermittent"
        assert got.loc["l", "demand_class"] == "lumpy"

    def test_exact_formulas(self, spark):
        from forecaster_spark.operators.timeweight import demand_class

        pts = [(0, 10), (3, 20), (9, 40)]
        got = demand_class(self._df(spark, {"x": pts})).toPandas().iloc[0]
        n, sd, sd2, span = 3, 70, 100 + 400 + 1600, 10
        assert got["n_nz"] == n and got["span"] == span
        assert got["adi_milli"] == (1000 * span) // n
        assert got["cv2"] == float(n * sd2 - sd * sd) / float(sd * sd)


class TestSpanRemoval:
    @staticmethod
    def _checksum(words: list[str]) -> int:
        from forecaster_spark.functions import xhash

        toks = [int(h) & ((1 << 31) - 1) for h in xhash.word_hash_flat(words)]
        m = len(toks)
        v = sum(t * pow(31, m - 1 - i, 1 << 64) for i, t in enumerate(toks)) % (1 << 64)
        return v - (1 << 64) if v >= (1 << 63) else v

    def test_planted_boilerplate_removed(self, spark):
        from forecaster_spark.operators.dedup import remove_duplicated_spans

        boiler = "all rights reserved by the example corporation"
        docs = [
            (i, f"u{i}a u{i}b u{i}c u{i}d" + (" " + boiler if i % 2 == 0 else ""))
            for i in range(20)
        ]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = remove_duplicated_spans(df, top_n=20).toPandas().set_index("doc_id")
        for i in range(20):
            r = got.loc[i]
            if i % 2 == 0:
                # the 5 pure-boilerplate 3-grams cover all 7 boiler words;
                # prefix-spanning 3-grams contain a unique word, unflagged
                assert r["n_words"] == 11 and r["n_removed"] == 7
                assert r["clean_checksum"] == self._checksum(
                    [f"u{i}a", f"u{i}b", f"u{i}c", f"u{i}d"]
                )
            else:
                assert r["n_words"] == 4 and r["n_removed"] == 0
                assert r["clean_checksum"] == self._checksum(
                    [f"u{i}a", f"u{i}b", f"u{i}c", f"u{i}d"]
                )

    def test_fully_removed_doc_checksum_zero(self, spark):
        from forecaster_spark.operators.dedup import remove_duplicated_spans

        boiler = "terms of service apply here"
        docs = [(0, boiler), (1, boiler), (2, "totally unique words only")]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = remove_duplicated_spans(df, top_n=20).toPandas().set_index("doc_id")
        assert got.loc[0, "n_removed"] == 5 and got.loc[0, "clean_checksum"] == 0
        assert got.loc[1, "n_removed"] == 5 and got.loc[1, "clean_checksum"] == 0
        assert got.loc[2, "n_removed"] == 0
        assert got.loc[2, "clean_checksum"] == self._checksum(
            ["totally", "unique", "words", "only"]
        )

    def test_short_doc_whole_shingle_removed(self, spark):
        from forecaster_spark.operators.dedup import remove_duplicated_spans

        docs = [(0, "aa bb"), (1, "aa bb"), (2, "cc dd")]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = remove_duplicated_spans(df, top_n=20).toPandas().set_index("doc_id")
        assert got.loc[0, "n_removed"] == 2 and got.loc[0, "clean_checksum"] == 0
        assert got.loc[1, "n_removed"] == 2 and got.loc[1, "clean_checksum"] == 0
        assert got.loc[2, "n_removed"] == 0
        assert got.loc[2, "clean_checksum"] == self._checksum(["cc", "dd"])

    def test_repeated_occurrences_all_covered(self, spark):
        from forecaster_spark.operators.dedup import remove_duplicated_spans

        # the flagged 3-gram occurs TWICE in doc 0 (ledger is distinct
        # per doc; removal must cover every occurrence)
        docs = [
            (0, "x1 one two three x2 x3 one two three x4"),
            (1, "one two three y1 y2 y3"),
        ]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = remove_duplicated_spans(df, top_n=20).toPandas().set_index("doc_id")
        assert got.loc[0, "n_removed"] == 6
        assert got.loc[0, "clean_checksum"] == self._checksum(["x1", "x2", "x3", "x4"])
        assert got.loc[1, "n_removed"] == 3
        assert got.loc[1, "clean_checksum"] == self._checksum(["y1", "y2", "y3"])
