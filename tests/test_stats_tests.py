"""Spark-level tests for the nonparametric stats-test operators: each
distributed result is compared against an O(n²)/brute pure-Python
reference on small synthetic series — exactness is claimed as
BIGINT-exact, so comparisons are == (and a single-ulp-free division for
the emitted doubles)."""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from forecaster_spark.operators.stats_tests import (
    ks_two_sample,
    mann_kendall,
    permutation_patterns,
    seasonal_naive_qof,
)
from forecaster_spark.operators.technicals import max_drawdown
from forecaster_spark.operators.textops import vocab_stats


def _series_df(spark, vals_by_src):
    rows = []
    for src, vals in vals_by_src.items():
        for i, v in enumerate(vals):
            rows.append(
                (src, (pd.Timestamp("2025-01-01") + pd.Timedelta(hours=i)).to_pydatetime(), int(v))
            )
    return spark.createDataFrame(rows, "source string, bucket_start timestamp, v_micro long")


def _events_df(spark, vals_by_src):
    rows = []
    for src, vals in vals_by_src.items():
        for i, v in enumerate(vals):
            rows.append(
                (
                    src,
                    (pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=7 * i)).to_pydatetime(),
                    float(v),
                    i,
                )
            )
    return spark.createDataFrame(rows, "source string, ts timestamp, y double, event_id long")


_VALS = {
    "up": [1, 2, 3, 4, 5, 6, 7, 8],
    "tied": [5, 5, 3, 5, 1, 5, 3, 1],
    "noisy": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],
}


def _brute_mk(vals):
    n = len(vals)
    s = sum(
        (vals[j] > vals[i]) - (vals[j] < vals[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    return n, s, var18, (2.0 * s) / float(n * (n - 1))


def test_mann_kendall_matches_brute(spark):
    out = {
        r["source"]: r
        for r in mann_kendall(_series_df(spark, _VALS)).collect()
    }
    for src, vals in _VALS.items():
        n, s, var18, tau = _brute_mk(vals)
        r = out[src]
        assert (r["n"], r["s_stat"], r["var18"]) == (n, s, var18)
        assert r["tau"] == tau


def _brute_ks(vals):
    n = len(vals)
    n1 = n // 2
    n2 = n - n1
    a, b = vals[:n1], vals[n1:]
    d = 0
    for x in sorted(set(vals)):
        c1 = sum(1 for v in a if v <= x)
        c2 = sum(1 for v in b if v <= x)
        d = max(d, abs(n2 * c1 - n1 * c2))
    return n1, n2, d, d / float(n1 * n2)


def test_ks_two_sample_matches_brute(spark):
    shifted = {"drift": [1, 1, 2, 2, 1, 2, 8, 9, 8, 9, 9, 8], **_VALS}
    out = {r["source"]: r for r in ks_two_sample(_events_df(spark, shifted)).collect()}
    for src, vals in shifted.items():
        vm = [v * 1_000_000 for v in vals]
        n1, n2, d, ks = _brute_ks(vm)
        r = out[src]
        assert (r["n1"], r["n2"], r["d_num"]) == (n1, n2, d)
        assert r["ks_stat"] == ks
    # the planted drift series must dominate the stationary ones
    assert out["drift"]["ks_stat"] == max(r["ks_stat"] for r in out.values())


def _brute_patterns(vals):
    from collections import Counter

    sgn = lambda a, b: 2 if a > b else (0 if a < b else 1)
    pats = Counter(
        9 * sgn(vals[i + 1], vals[i]) + 3 * sgn(vals[i + 2], vals[i + 1]) + sgn(vals[i + 2], vals[i])
        for i in range(len(vals) - 2)
    )
    nw = sum(pats.values())
    return {p: (c, nw, (1_000_000 * c) // nw) for p, c in pats.items()}


def test_permutation_patterns_matches_brute(spark):
    out = permutation_patterns(_series_df(spark, _VALS)).collect()
    got = {(r["source"], r["pattern_id"]): (r["cnt"], r["n_windows"], r["share_ppm"]) for r in out}
    want = {
        (src, p): t for src, vals in _VALS.items() for p, t in _brute_patterns(vals).items()
    }
    assert got == want
    # strictly increasing series → a single pattern: all three signs "up"
    up_pats = [k for k in got if k[0] == "up"]
    assert up_pats == [("up", 9 * 2 + 3 * 2 + 2)]


def test_seasonal_naive_qof_exact(spark):
    vals = {"s": [i * 20_000 for i in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]]}
    out = seasonal_naive_qof(_series_df(spark, vals), season=3).collect()
    assert len(out) == 1
    r = out[0]
    vc = [v // 10_000 for v in vals["s"]]
    errs = [vc[i] - vc[i - 3] for i in range(3, len(vc))]
    m = len(errs)
    sse = sum(e * e for e in errs)
    sae = sum(abs(e) for e in errs)
    assert (r["m"], r["sse_centi2"], r["sae_centi"]) == (m, sse, sae)
    assert r["mse"] == (float(sse) / float(m)) / 10000.0
    assert r["mae"] == (float(sae) / float(m)) / 100.0


def test_max_drawdown_matches_brute(spark):
    vals = {"v": [10, 12, 8, 9, 15, 3, 4, 2, 11], "flat": [5, 5, 5], "up": [1, 2, 3]}
    out = {r["source"]: r for r in max_drawdown(_events_df(spark, vals)).collect()}
    for src, vs in vals.items():
        peak, dd = -(10**18), 0
        for v in vs:
            peak = max(peak, v * 1_000_000)
            dd = max(dd, peak - v * 1_000_000)
        r = out[src]
        assert (r["n_rows"], r["max_dd_micro"]) == (len(vs), dd)
        assert r["max_dd"] == dd / 1_000_000.0
    assert out["flat"]["max_dd_micro"] == 0 and out["up"]["max_dd_micro"] == 0


def test_vocab_stats_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "en"),
            (2, "The cat ran far", "en"),
            (3, "  spaced   words here ", "en"),
            (4, "uno dos dos tres tres tres", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in vocab_stats(docs).collect()}
    # en tokens: the cat sat the cat ran far spaced words here
    # freq: the=2 cat=2 sat=1 ran=1 far=1 spaced=1 words=1 here=1
    en = out["en"]
    assert (en["vocab"], en["total_tokens"], en["n_hapax"], en["n_dis"]) == (8, 10, 6, 2)
    assert en["hapax_ppm"] == (1_000_000 * 6) // 8
    es = out["es"]
    assert (es["vocab"], es["total_tokens"], es["n_hapax"], es["n_dis"]) == (3, 6, 1, 1)


def test_chunk_tokens_layout_and_checksums(spark):
    from forecaster_spark.operators.packing import chunk_tokens
    from forecaster_spark.operators.textops import text_tokens

    words = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_tokens(docs, size=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # null text drops; empty text is one token -> one chunk
    assert set(by_doc) == {1, 2, 3}
    # 150 tokens, stride 48 -> starts 0,48,96,144 -> lens 64,64,54,6
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [(r["chunk_start"], r["chunk_len"]) for r in c1] == [
        (0, 64), (48, 64), (96, 54), (144, 6)
    ]
    assert all(r["n_tok"] == 150 for r in c1)
    # every chunk checksum equals the polynomial fold of the token slice
    toks = {r["doc_id"]: r["tokens"] for r in text_tokens(docs).collect()}
    M = 1 << 64
    for r in out:
        sl = toks[r["doc_id"]][r["chunk_start"] : r["chunk_start"] + 64]
        acc = 0
        for t in sl:
            acc = (acc * 31 + t) % M
        want = acc - M if acc >= 1 << 63 else acc
        assert r["chunk_checksum"] == want, (r["doc_id"], r["chunk_idx"])
    # full coverage: consecutive chunks overlap by size - stride
    assert c1[1]["chunk_start"] - c1[0]["chunk_start"] == 48


def test_ngram_novelty_duplicate_doc_is_zero(spark):
    from forecaster_spark.operators.dedup import ngram_novelty

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(10, base), (20, base), (30, "totally different words entirely here now"),
         (40, "alpha beta gamma " + "novel tail content appended")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    # doc 20 is an exact dup of the earlier doc 10 -> zero novelty
    assert out[20]["n_novel"] == 0 and out[20]["novelty_ppm"] == 0
    # doc 10 owns all its shingles; doc 30 shares nothing
    assert out[10]["n_novel"] == out[10]["n_shingles"]
    assert out[30]["novelty_ppm"] == 1_000_000
    # doc 40 shares its leading 3-gram with doc 10 but owns the tail
    assert 0 < out[40]["n_novel"] < out[40]["n_shingles"]


def test_spearman_pairs_matches_brute(spark):
    from forecaster_spark.operators.stats_tests import spearman_pairs

    # perfectly monotone pair -> rho exactly 1; anti-monotone -> -1;
    # a tied/flat pair exercises the doubled-rank tie path
    vals = {
        "a": [1, 2, 3, 4, 5, 6],
        "b": [10, 40, 90, 160, 250, 360],   # monotone in a -> rho(a,b) = 1
        "c": [6, 5, 4, 3, 2, 1],            # reversed -> rho(a,c) = -1
        "d": [7, 7, 7, 7, 7, 7],            # constant -> zero variance, rho NULL
        "e": [2, 9, 4, 4, 8, 1],            # ties inside
    }
    out = {(r["source_a"], r["source_b"]): r for r in spearman_pairs(_series_df(spark, vals)).collect()}
    assert out[("a", "b")]["rho"] == 1.0
    assert out[("a", "c")]["rho"] == -1.0
    assert out[("a", "d")]["rho"] is None and out[("a", "d")]["d2"] == 0

    def brute(x, y):
        def dranks(v):
            sv = sorted(v)
            return [2 * (sv.index(t) + 1) + sv.count(t) - 1 for t in v]
        rx, ry = dranks(x), dranks(y)
        n = len(x)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(r * r for r in rx)
        syy = sum(r * r for r in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        return n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy

    for pair in (("a", "e"), ("c", "e"), ("b", "e")):
        num, d1, d2 = brute(vals[pair[0]], vals[pair[1]])
        r = out[pair]
        assert (r["num"], r["d1"], r["d2"]) == (num, d1, d2)
        import math
        assert r["rho"] == (num / math.sqrt(d1)) / math.sqrt(d2)


def test_runs_test_matches_brute(spark):
    from forecaster_spark.operators.stats_tests import runs_test

    vals = {
        "alt": [1, 9, 1, 9, 1, 9, 1, 9],        # perfect alternation -> max runs
        "trend": [1, 2, 3, 4, 9, 10, 11, 12],   # two blocks -> 2 runs
        "flat": [5, 5, 5, 5],                    # all == median -> NO row
        "mix": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3],
    }
    out = {r["source"]: r for r in runs_test(_series_df(spark, vals)).collect()}
    assert "flat" not in out
    assert out["alt"]["n_runs"] == 8 and out["alt"]["n_pos"] == 4
    assert out["trend"]["n_runs"] == 2
    for src in ("alt", "trend", "mix"):
        vs = vals[src]
        med = sorted(vs)[len(vs) // 2 - 1 : len(vs) // 2 + 1]
        med2 = sum(med) if len(vs) % 2 == 0 else 2 * sorted(vs)[len(vs) // 2]
        sgns = [1 if 2 * v > med2 else -1 for v in vs if 2 * v != med2]
        runs = 1 + sum(1 for i in range(1, len(sgns)) if sgns[i] != sgns[i - 1])
        r = out[src]
        assert (r["n_pos"], r["n_neg"], r["n_runs"]) == (
            sgns.count(1), sgns.count(-1), runs
        )
        assert r["expected_runs"] == 1.0 + (2 * sgns.count(1) * sgns.count(-1)) / float(len(sgns))


def test_pearson_pairs_matches_brute(spark):
    from forecaster_spark.operators.stats_tests import pearson_pairs

    # v_micro inputs; operator floors to centi internally (div 10000)
    vals = {
        "a": [i * 20_000 for i in (1, 2, 3, 4, 5, 6)],
        "b": [i * 20_000 for i in (2, 4, 6, 8, 10, 12)],   # r(a,b) = 1
        "c": [i * 20_000 for i in (6, 5, 4, 3, 2, 1)],      # r(a,c) = -1
        "d": [70_000] * 6,                                   # constant -> NULL
        "e": [i * 20_000 for i in (2, 9, 4, 4, 8, 1)],
    }
    out = {(r["source_a"], r["source_b"]): r for r in pearson_pairs(_series_df(spark, vals)).collect()}
    assert out[("a", "b")]["r"] == 1.0
    assert out[("a", "c")]["r"] == -1.0
    assert out[("a", "d")]["r"] is None and out[("a", "d")]["d2"] == 0
    import math
    x = [v // 10_000 for v in vals["a"]]
    y = [v // 10_000 for v in vals["e"]]
    n = len(x)
    num = n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
    d1 = n * sum(a * a for a in x) - sum(x) ** 2
    d2 = n * sum(b * b for b in y) - sum(y) ** 2
    r = out[("a", "e")]
    assert (r["num"], r["d1"], r["d2"]) == (num, d1, d2)
    assert r["r"] == (num / math.sqrt(d1)) / math.sqrt(d2)


def test_winsorized_mean_clamps_outliers(spark):
    from forecaster_spark.operators.stats_tests import winsorized_mean

    # 20 points, one huge outlier at each end; alpha 10% -> k = 3
    base = list(range(1, 19)) + [-1000, 1000]
    out = winsorized_mean(_events_df(spark, {"s": base})).collect()[0]
    vm = sorted(v * 1_000_000 for v in base)
    n = len(vm)
    k = (10 * n) // 100 + 1
    lo, hi = vm[k - 1], vm[n - k]
    want = [min(max(v, lo), hi) for v in (v * 1_000_000 for v in base)]
    assert (out["n"], out["lo_micro"], out["hi_micro"]) == (n, lo, hi)
    assert out["win_sum_micro"] == sum(want)
    assert out["win_mean"] == (float(sum(want)) / float(n)) / 1_000_000.0
    # the outliers are fully clamped: mean within the inlier hull
    assert 1.0 <= out["win_mean"] <= 18.0


def test_shesd_unmasks_seasonal_anomaly(spark):
    """On a strongly seasonal hourly series with ONE planted negative
    spike at the daily PEAK hour, raw GESD round 1 picks a seasonal peak
    (the cycle dwarfs the anomaly's deviation from the global mean),
    while S-H-ESD round 1 removes exactly the planted point — the
    decomposition unmasks it."""
    from forecaster_spark.operators.stats_tests import gesd_outliers, shesd_outliers

    n = 24 * 12
    base = [500 + (i % 24 - 12) ** 2 for i in range(n)]  # daily bowl, peak at h=0
    anom_at = 24 * 6  # peak hour of day 6
    vals = list(base)
    vals[anom_at] -= 170  # |dev from mean| ~ 26 raw (invisible), ~150 residual
    rows = [
        (
            "s1",
            (pd.Timestamp("2025-01-01") + pd.Timedelta(hours=i)).to_pydatetime(),
            float(v),
        )
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, y double")

    raw = gesd_outliers(df, value="y", partition="source", ts="ts", rounds=1).collect()
    assert raw[0]["removed_t"] != anom_at  # seasonality masks it
    assert raw[0]["removed_v"] == 644  # a plain seasonal peak wins instead

    sh = shesd_outliers(df, rounds=1).collect()
    assert sh[0]["removed_t"] == anom_at
    assert sh[0]["removed_v"] <= -140  # ~ the planted spike in residual units


def test_segmented_trend_planted_knot(spark):
    """Two planted linear regimes with a level/slope break: the split must
    land on the true knot and each segment's slope/intercept must equal
    numpy polyfit on that segment (the exact-Cramer solution) to float
    precision."""
    from forecaster_spark.operators.stats_tests import segmented_trend

    knot = 40
    vals = [100 + 2 * i + (3 if i % 7 == 0 else 0) for i in range(knot)] + [
        500 - 3 * j + (3 if (knot + j) % 7 == 0 else 0) for j in range(35)
    ]
    rows = [
        (
            "s1",
            (pd.Timestamp("2025-01-01") + pd.Timedelta(hours=i)).to_pydatetime(),
            float(v),
        )
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, y double")
    out = {r["seg"]: r for r in segmented_trend(df).collect()}
    assert out["left"]["split_i"] == knot and out["left"]["n"] == len(vals)
    for seg, vs in (("left", vals[:knot]), ("right", vals[knot:])):
        want_s, want_i = np.polyfit(np.arange(len(vs)), vs, 1)
        assert abs(out[seg]["slope"] - want_s) < 1e-9
        assert abs(out[seg]["intercept"] - want_i) < 1e-9
        assert out[seg]["m"] == len(vs)
    # single-point segment -> NULL fit, not a crash
    df2 = spark.createDataFrame(rows[:2], "source string, ts timestamp, y double")
    out2 = {r["seg"]: r for r in segmented_trend(df2).collect()}
    assert out2["left"]["slope"] is None and out2["left"]["m"] == 1


def test_ensemble_qof_exact_vs_python(spark):
    """Ensemble QoF on a handcrafted series must equal a plain-python
    replay (9-scaled integers), and the combined SAE can never exceed the
    WORST component (averaging bound)."""
    from forecaster_spark.operators.timeweight import ensemble_qof

    vals = [100, 140, 90, 200, 150, 150, 160, 90, 210, 130, 120, 180,
            100, 140, 95, 205, 150, 155, 165, 85, 215, 135, 125, 185,
            102, 138, 92, 198, 152, 148]
    df = _series_df(spark, {"s1": [v * 10000 for v in vals]})
    out = ensemble_qof(df).collect()[0]
    # python replay in centi units (v_micro // 10000 = v * 10000 // 10000)
    vc = vals
    se, sp, sm, ss = 0, 0, 0, 0
    m = 0
    for t in range(len(vc)):
        if t < 24:
            continue
        y, l1, l2, l3, ls = vc[t], vc[t - 1], vc[t - 2], vc[t - 3], vc[t - 24]
        se += abs(9 * y - (4 * l1 + l2 + l3 + 3 * ls))
        sp += abs(9 * (y - l1))
        sm += abs(9 * y - 3 * (l1 + l2 + l3))
        ss += abs(9 * (y - ls))
        m += 1
    assert (out["m"], out["sae9_ens"], out["sae9_persist"],
            out["sae9_ma3"], out["sae9_snaive"]) == (m, se, sp, sm, ss)
    assert out["regret9"] == se - min(sp, sm, ss)
    assert out["sae9_ens"] <= max(sp, sm, ss)  # averaging bound
    assert abs(out["mae_ens"] - se / m / 9.0 / 100.0) == 0.0


def test_isotonic_fit_minimax_characterization(spark):
    """PAVA output must satisfy the independent minimax characterization
    of isotonic regression: fit[i] = max_{j<=i} min_{k>=i} avg(v[j..k])
    (Robertson-Wright-Dykstra), checked with exact Fractions on several
    adversarial series; blocks must be nondecreasing, partition the
    series, and preserve sums."""
    from fractions import Fraction

    from forecaster_spark.operators.timeweight import isotonic_fit

    series = {
        "desc": [9, 8, 7, 6, 5],                      # one global pool
        "steps": [1, 3, 2, 2, 5, 4, 4, 6],            # local pools
        "ties": [2, 2, 1, 2, 2, 2],                   # equal-mean neighbors
        "mono": [1, 2, 3, 4],                          # untouched
        "vee": [5, 1, 5, 1, 5, 1, 9],
    }
    rows = []
    for src, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (src, (pd.Timestamp("2025-01-01") + pd.Timedelta(hours=i)).to_pydatetime(), float(v))
            )
    df = spark.createDataFrame(rows, "source string, ts timestamp, y double")
    out = isotonic_fit(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, vals in series.items():
        blocks = sorted(by_src[src], key=lambda r: r["block_i"])
        n = len(vals)
        # partition + sum preservation
        assert [b["start_t"] for b in blocks] == list(
            np.cumsum([0] + [b["m"] for b in blocks[:-1]])
        )
        assert sum(b["m"] for b in blocks) == n
        assert sum(b["sum_v"] for b in blocks) == sum(vals)
        # per-point fit from blocks
        fit = []
        for b in blocks:
            fit += [Fraction(b["sum_v"], b["m"])] * b["m"]
        assert all(a <= c for a, c in zip(fit, fit[1:]))
        # minimax characterization
        for i in range(n):
            want = max(
                min(
                    Fraction(sum(vals[j : k + 1]), k + 1 - j)
                    for k in range(i, n)
                )
                for j in range(i + 1)
            )
            assert fit[i] == want, (src, i, fit[i], want)
        # emitted double is the one correctly-rounded division
        for b in blocks:
            assert b["fit"] == b["sum_v"] / b["m"]


def test_freshness_and_interarrival_handcrafted(spark):
    """Handcrafted two-source feed: source b stops 3 hours before the
    frontier and skips a mid-window hour — staleness, bucket coverage and
    gap stats must be the exact integers."""
    from forecaster_spark.operators.timeweight import freshness_report, interarrival_stats

    t0 = pd.Timestamp("2025-03-01 00:00:00")
    rows = []
    eid = 0
    for h in range(26):  # source a: every hour, frontier owner
        rows.append(("a", (t0 + pd.Timedelta(hours=h)).to_pydatetime(), 1.0, eid)); eid += 1
    for h in range(23):  # source b: stops at h=22, skips h=7
        if h == 7:
            continue
        rows.append(("b", (t0 + pd.Timedelta(hours=h)).to_pydatetime(), 1.0, eid)); eid += 1
    df = spark.createDataFrame(rows, "source string, ts timestamp, y double, event_id long")
    fr = {r["source"]: r for r in freshness_report(df).collect()}
    assert fr["a"]["staleness_s"] == 0 and not fr["a"]["stale"]
    assert fr["b"]["staleness_s"] == 3 * 3600 and fr["b"]["stale"]
    assert fr["a"]["buckets_24h"] == 24 and fr["a"]["missing_24h"] == 0
    # b's trailing-24 window (frontier hour 25 back to hour 2) holds hours
    # 2..22 minus the skipped 7 => 20 buckets
    assert fr["b"]["buckets_24h"] == 20 and fr["b"]["missing_24h"] == 4
    ia = {r["source"]: r for r in interarrival_stats(df).collect()}
    assert ia["a"]["n_gaps"] == 25 and ia["a"]["mean_gap_s"] == 3600.0
    assert ia["a"]["median_gap_s"] == 3600.0 and ia["a"]["max_gap_s"] == 3600
    # b: 21 gaps, one of 7200 (the skipped hour)
    assert ia["b"]["n_gaps"] == 21 and ia["b"]["max_gap_s"] == 7200
    assert ia["b"]["sum_gap_s"] == 22 * 3600
