"""Mergeable-sketch tests: HLL register cascade + estimate accuracy, and
count-min merge/point-estimate guarantees. The cross-engine value parity of
both sketches is certified by the driver contract
(``hll_distinct_users_events_1h``, ``cmsketch_words_documents``); these tests
pin the *semantic* properties the contract can't express — estimator error
bounds and partial-merge algebra."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from forecaster_spark.functions import xhash
from forecaster_spark.operators import sketches


@pytest.fixture(scope="module")
def key_df(spark):
    """60k rows over 3 sources × 2 hours with known per-bucket distinct
    cardinalities (keys disjoint per bucket via arithmetic offsets)."""
    rows = []
    for si, (src, card) in enumerate([("a", 5000), ("b", 800), ("c", 37)]):
        for hour in range(2):
            base = (si * 2 + hour) * 1_000_000
            keys = np.arange(card) + base
            # each key appears 1-3 times (dup rows must not change the sketch)
            reps = np.tile(keys, 3)[: card * 2]
            ts = pd.Timestamp("2025-03-01") + pd.to_timedelta(
                hour * 3600 + (np.arange(len(reps)) % 3600), unit="s"
            )
            rows.append(pd.DataFrame({"source": src, "ts": ts, "user_id": reps}))
    return spark.createDataFrame(pd.concat(rows, ignore_index=True))


def test_hll_cascade_equals_direct(spark, key_df):
    """1m partials max-merged to 1h ≡ registers computed directly at 1h —
    the tier-cascade mergeability claim."""
    via_1m = sketches.hll_merge(
        sketches.hll_partials(key_df, bucket_unit="minute"), to_unit="hour"
    )
    direct = sketches.hll_partials(key_df, bucket_unit="hour")
    a = via_1m.toPandas().sort_values(["source", "bucket_start", "reg"]).reset_index(drop=True)
    b = direct.toPandas().sort_values(["source", "bucket_start", "reg"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_hll_estimate_accuracy(spark, key_df):
    """Relative error vs exact distinct within the m=64 expected band
    (σ ≈ 1.04/√64 = 13%; assert 3σ) for every (source, hour) bucket,
    across 3 orders of magnitude of cardinality."""
    regs = sketches.hll_partials(key_df, bucket_unit="hour")
    est = sketches.hll_estimate(regs).toPandas().set_index(["source", "bucket_start"])
    exact = (
        key_df.groupBy("source", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.countDistinct("user_id").alias("d"))
        .toPandas()
        .set_index(["source", "bucket_start"])
    )
    assert len(est) == len(exact) == 6
    for idx, row in exact.iterrows():
        e = est.loc[idx, "est"]
        rel = abs(e - row["d"]) / row["d"]
        assert rel < 0.40, (idx, e, row["d"])


def test_hll_nulls_and_duplicates(spark):
    """NULL keys are excluded (count-distinct semantics); duplicate keys are
    idempotent (register max)."""
    pdf = pd.DataFrame(
        {
            "source": ["s"] * 4,
            "ts": [pd.Timestamp("2025-03-01 00:00:05")] * 4,
            "user_id": pd.array([7, 7, 7, None], dtype="Int64"),
        }
    )
    regs = sketches.hll_partials(spark.createDataFrame(pdf)).toPandas()
    assert len(regs) == 1  # one distinct key → one occupied register
    h = int(xhash.splitmix64(np.uint64(7)))
    assert regs["reg"].iloc[0] == h % 64


def test_cm_merge_and_point_bounds(spark):
    """Sketch of the whole corpus ≡ cell-wise sum of two half sketches, and
    point estimates obey est ≥ true and est ≤ true + (e/width)·N."""
    words = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5
             + [f"w{i}" for i in range(200)])
    rng = np.random.default_rng(11)
    rng.shuffle(words)
    docs = [" ".join(words[i::10]) for i in range(10)]
    pdf = pd.DataFrame({"doc_id": range(10), "text": docs})
    df = spark.createDataFrame(pdf)

    whole = sketches.cm_sketch(df).toPandas()
    h1 = sketches.cm_sketch(df.where("doc_id < 5")).toPandas()
    h2 = sketches.cm_sketch(df.where("doc_id >= 5")).toPandas()
    merged = (
        pd.concat([h1, h2]).groupby(["depth", "col"], as_index=False)["cnt"].sum()
    )
    a = whole.sort_values(["depth", "col"]).reset_index(drop=True)
    b = merged.sort_values(["depth", "col"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    n_total = int(whole[whole["depth"] == 0]["cnt"].sum())
    rows = [tuple(r) for r in whole.itertuples(index=False)]
    est = sketches.cm_point_estimates(rows, ["alpha", "beta", "gamma"])
    eps_n = np.e / sketches.CM_WIDTH * n_total
    for w, true in [("alpha", 50), ("beta", 20), ("gamma", 5)]:
        assert est[w] >= true, (w, est[w], true)
        assert est[w] <= true + eps_n, (w, est[w], true, eps_n)


def test_cm_salts_stable():
    """Salts are frozen constants — the SQL oracle inlines them, so any
    change must be deliberate (and re-freezes the oracle)."""
    s = sketches.cm_salts()
    assert [int(v) for v in s] == [
        int(xhash.splitmix64(np.uint64(sketches.CM_SEED * (j + 1))))
        for j in range(sketches.CM_DEPTH)
    ]
    assert len(set(int(v) for v in s)) == sketches.CM_DEPTH


def test_hdr_quantiles_accuracy_and_merge(spark):
    """The HDR lower-bound estimate sits within one bin (relative width
    2^-sub_bits = 12.5%) BELOW the exact quantile, never above it; and
    merging 1m partials gives bit-identical results to a single-shot
    histogram (counter sum-merge associativity)."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.sketches import (
        hdr_histogram_partials,
        hdr_quantiles,
    )

    rng = np.random.RandomState(3)
    n = 5000
    y = rng.lognormal(3.0, 1.0, n)
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n,
            "ts": pd.date_range("2030-01-01", periods=n, freq="13s"),
            "y": y,
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        hdr_quantiles(hdr_histogram_partials(df))
        .toPandas()
        .set_index("source")
        .loc["a"]
    )
    vc = np.round(y * 100).astype(np.int64)
    for q in (50, 90, 99):
        k = -(-q * n // 100)  # ceil rank
        exact = np.sort(vc)[k - 1] / 100.0
        est = got[f"p{q}"]
        assert est <= exact
        assert est >= exact * (1 - 0.125) - 0.01
    # merge associativity: hour-grain partials == minute-grain partials
    per_min = hdr_histogram_partials(df, bucket="minute")
    per_hr = hdr_histogram_partials(df, bucket="hour")
    a = hdr_quantiles(per_min).toPandas().set_index("source")
    b = hdr_quantiles(per_hr).toPandas().set_index("source")
    assert a.equals(b)
