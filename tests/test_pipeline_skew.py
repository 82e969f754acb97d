"""Checkpoint/resume identity (SURVEY.md §5 item 5), salted ≡ unsalted
rollups (item 6), end-to-end pipeline + lineage/metrics tables."""

import shutil

import numpy as np
import pandas as pd
import pytest

from forecaster_spark.datagen import gen_corpus
from forecaster_spark.operators.rollup import rollup_raw
from forecaster_spark.operators.seriesify import seriesify
from forecaster_spark.plans.checkpoint import StageRunner
from forecaster_spark.plans.pipeline import run_rollup_pipeline
from forecaster_spark.plans.skew import hot_sources, salted_rollup_raw
from tests.conftest import assert_df_equal, mk_series_pdf


def test_salted_equals_unsalted(spark):
    corpus = gen_corpus(spark, 4000)
    series = seriesify(corpus)
    plain = rollup_raw(series, "1m", exact=True, checksum_col="tok_checksum").toPandas()
    salted = salted_rollup_raw(
        series, "1m", n_salt=8, exact=True, checksum_col="tok_checksum"
    ).toPandas()
    assert_df_equal(
        salted, plain, sort_cols=["source", "bucket_start"], check_dtype=False, check_like=True
    )


def test_checksum_carries_through_cascade(spark):
    """Token-array bit-exactness invariant at every retention tier: the chk
    column at each tier equals the wrapping sum of per-doc checksums."""
    from pyspark.sql import functions as F
    from forecaster_spark.operators.rollup import rollup_cascade

    corpus = gen_corpus(spark, 2000)
    series = seriesify(corpus)
    t1m = rollup_raw(series, "1m", checksum_col="tok_checksum", tie_break=False)
    t1d = rollup_cascade(rollup_cascade(t1m, "1h"), "1d")
    total_raw = series.agg(F.sum("tok_checksum")).first()[0]
    assert t1m.agg(F.sum("chk")).first()[0] == total_raw
    assert t1d.agg(F.sum("chk")).first()[0] == total_raw
    # tampering with one token would change chk: simulate by altering y? —
    # instead check per-source equality, a finer grain
    per_src_raw = {r["source"]: r["s"] for r in series.groupBy("source").agg(F.sum("tok_checksum").alias("s")).collect()}
    per_src_1d = {r["source"]: r["s"] for r in t1d.groupBy("source").agg(F.sum("chk").alias("s")).collect()}
    assert per_src_raw == per_src_1d


def test_hot_source_detection(spark):
    corpus = gen_corpus(spark, 3000)
    series = seriesify(corpus)
    hot = hot_sources(series, threshold_ratio=0.2)
    assert hot == ["src00"]  # Zipf head


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "roll")
    corpus = gen_corpus(spark, 3000)
    r1 = run_rollup_pipeline(spark, corpus, out)
    counts1 = r1["counts"]
    assert counts1["1m"] > counts1["1h"] > counts1["1d"] > 0
    assert counts1["total_rolled_points"] == counts1["1m"] + counts1["1h"] + counts1["1d"]

    # metrics/lineage recorded for every stage
    runner = r1["runner"]
    stages = {r["stage"] for r in runner.metrics().collect()}
    assert {"rollup_1m", "rollup_1h", "rollup_1d", "gapfill_1m", "gorilla"} <= stages

    # simulate crash: delete the 1d output, keep 1m/1h → resume recomputes
    # only what's missing and totals are identical
    shutil.rmtree(f"{out}/rollup_1d")
    r2 = run_rollup_pipeline(spark, corpus, out)
    assert r2["counts"] == counts1
    m = r2["runner"].metrics().toPandas().sort_values("recorded_at")
    # second run: 1m and 1h skipped-committed, 1d recomputed
    second = m.groupby("stage").tail(1).set_index("stage")["skipped"]
    assert bool(second["rollup_1m"]) and bool(second["rollup_1h"])
    assert not bool(second["rollup_1d"])

    # the recomputed 1d stage reproduces the identical content checksum
    chks = m[m.stage == "rollup_1d"]["checksum"].unique()
    assert len(chks) == 1
    # per-partition lineage rows exist for every computed stage
    lin = r2["runner"].lineage().toPandas()
    assert (lin.groupby("stage")["rows"].sum() > 0).all()


def test_stage_runner_checksum_stability(spark, tmp_path):
    pdf = mk_series_pdf(n=200, n_sources=2)
    runner = StageRunner(spark, str(tmp_path / "st"))
    df1 = runner.stage("s1", lambda: spark.createDataFrame(pdf).repartition(4))
    df2 = runner.stage("s1", lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")))
    assert df1.count() == df2.count() == len(pdf)


def test_partitioned_tiers_prune_and_match(spark, tmp_path):
    """partition_tiers=True: tier outputs hive-partitioned by bucket_date —
    a date filter prunes partitions at the scan (PartitionFilters), and the
    tier contents equal the unpartitioned run."""
    corpus = gen_corpus(spark, 3000)
    out_p = str(tmp_path / "part")
    out_u = str(tmp_path / "flat")
    # hourly cadence → the corpus spans many days, so several date partitions
    run_rollup_pipeline(spark, corpus, out_p, partition_tiers=True, cadence_s=3600)
    run_rollup_pipeline(spark, corpus, out_u, cadence_s=3600)

    t1m = spark.read.parquet(f"{out_p}/rollup_1m")
    dates = [r[0] for r in t1m.select("bucket_date").distinct().collect()]
    assert len(dates) > 1
    q = t1m.where(t1m.bucket_date == dates[0])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket_date" in plan[plan.index("PartitionFilters"):].splitlines()[0]

    import pandas as pd
    a = t1m.drop("bucket_date").toPandas().sort_values(["source", "bucket_start"]).reset_index(drop=True)
    b = spark.read.parquet(f"{out_u}/rollup_1m").toPandas().sort_values(["source", "bucket_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_stage_runner_ansi_safe(spark, tmp_path):
    """The driver owns the contract session and Spark 4 defaults ANSI ON —
    the lineage checksum must not rely on non-ANSI long wraparound (the r2
    driver-red: F.sum(xxhash64) threw ARITHMETIC_OVERFLOW). Run a full
    stage + resume under ANSI and assert checksums match the non-ANSI run
    bit-for-bit (the limb recombination is wrap-sum-identical)."""
    pdf = mk_series_pdf(n=400, n_sources=3)
    plain = StageRunner(spark, str(tmp_path / "plain"))
    plain.stage("s1", lambda: spark.createDataFrame(pdf).repartition(4))
    want = plain.manifest("s1")["checksum"]

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        runner = StageRunner(spark, str(tmp_path / "ansi"))
        runner.stage("s1", lambda: spark.createDataFrame(pdf).repartition(4))
        got = runner.manifest("s1")["checksum"]
        # resume path (verify_on_resume rescans + rechecksums) also ANSI-safe
        r2 = StageRunner(spark, str(tmp_path / "ansi"), verify_on_resume=True)
        out = r2.stage("s1", lambda: (_ for _ in ()).throw(AssertionError("no rebuild")))
        assert out.count() == len(pdf)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert got == want
