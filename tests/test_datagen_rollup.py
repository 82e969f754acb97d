"""Datagen determinism + seriesify + rollup tiers vs pandas oracle
(SURVEY.md §5 item 2: rollup-tier golden tests; cascade == direct)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from forecaster_spark.datagen import corpus_pandas, gen_corpus, source_sizes
from forecaster_spark.operators.rollup import rollup_cascade, rollup_raw, rollup_tiers
from forecaster_spark.operators.seriesify import seriesify, token_checksum

from tests.conftest import assert_df_equal, mk_series_pdf

N_DOCS = 3000


def test_source_sizes_sum_and_skew():
    sizes = source_sizes(N_DOCS, 20, 1.2)
    assert sizes.sum() == N_DOCS
    assert sizes[0] > 0.2 * N_DOCS  # hot source
    assert (sizes > 0).all()


def test_gen_corpus_matches_pandas_oracle_and_is_partition_invariant(spark):
    want = corpus_pandas(N_DOCS)
    for parts in (3, 16):
        got = gen_corpus(spark, N_DOCS, partitions=parts).toPandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        w = want.sort_values("doc_id").reset_index(drop=True)
        assert (got["doc_id"] == w["doc_id"]).all()
        assert (got["n_tok"] == w["n_tok"]).all()
        assert (got["source"] == w["source"]).all()
        # bit-exact token-array equality per doc_id (input_hint invariant)
        for a, b in zip(got["tokens"].iloc[:50], w["tokens"].iloc[:50]):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_seriesify_schema_and_checksum(spark):
    corpus = gen_corpus(spark, 500)
    s = seriesify(corpus, checksum="poly_native")
    pdf = s.orderBy("source", "seq").limit(200).toPandas()
    assert list(pdf.columns) == ["source", "seq", "ts", "y", "n_tok", "tok_checksum", "doc_id"]
    assert (pdf["y"] == pdf["n_tok"].astype(float)).all()
    # ts cadence = 7s within a source
    one = pdf[pdf.source == pdf.source.iloc[0]]
    dt = one["ts"].diff().dropna().dt.total_seconds()
    assert (dt == 7.0).all()
    # polynomial checksum matches a python recompute
    row = corpus.select("doc_id", "tokens", token_checksum(F.col("tokens")).alias("c")).first()
    acc = 0
    for t in row["tokens"]:
        acc = (acc * 31 + int(t)) & 0xFFFFFFFFFFFFFFFF
        if acc >= 1 << 63:
            acc -= 1 << 64
    assert acc == row["c"]
    # the vectorized Arrow kernel is bit-identical to the native fold
    a = seriesify(corpus, checksum="poly_native").select("doc_id", "tok_checksum").toPandas()
    b = seriesify(corpus, checksum="poly").select("doc_id", "tok_checksum").toPandas()
    merged = a.merge(b, on="doc_id", suffixes=("_n", "_f"))
    assert (merged.tok_checksum_n == merged.tok_checksum_f).all()
    # the default xxhash checksum is deterministic across runs/partitionings
    x1 = seriesify(corpus, checksum="xxhash").select("doc_id", "tok_checksum").toPandas()
    x2 = seriesify(gen_corpus(spark, 500, partitions=3), checksum="xxhash").select(
        "doc_id", "tok_checksum"
    ).toPandas()
    mx = x1.merge(x2, on="doc_id", suffixes=("_1", "_2"))
    assert (mx.tok_checksum_1 == mx.tok_checksum_2).all()


def _pandas_rollup(pdf, freq):
    g = pdf.sort_values(["ts", "y"]).groupby(["source", pd.Grouper(key="ts", freq=freq)])["y"]
    out = g.agg(cnt="count", sum_y="sum", min_y="min", max_y="max",
                first_y="first", last_y="last").reset_index()
    out["mean_y"] = out["sum_y"] / out["cnt"]
    return out.rename(columns={"ts": "bucket_start"})[
        ["source", "bucket_start", "cnt", "sum_y", "min_y", "max_y", "mean_y", "first_y", "last_y"]
    ]


def test_rollup_1m_matches_pandas(spark):
    pdf = mk_series_pdf(n=500, n_sources=3)
    df = spark.createDataFrame(pdf)
    got = rollup_raw(df, "1m").toPandas()
    want = _pandas_rollup(pdf, "1min")
    assert_df_equal(got, want, sort_cols=["source", "bucket_start"], check_dtype=False)


def test_cascade_equals_direct(spark):
    pdf = mk_series_pdf(n=4000, n_sources=4)
    df = spark.createDataFrame(pdf)
    tiers = rollup_tiers(df)
    for tier in ("1h", "1d"):
        direct = rollup_raw(df, tier).toPandas()
        casc = tiers[tier].toPandas()
        assert_df_equal(casc, direct, sort_cols=["source", "bucket_start"],
                        check_dtype=False, check_exact=False, rtol=1e-12)


def test_cascade_first_last(spark):
    pdf = mk_series_pdf(n=1000, n_sources=2)
    df = spark.createDataFrame(pdf)
    t1m = rollup_raw(df, "1m")
    t1h = rollup_cascade(t1m, "1h").toPandas()
    want = _pandas_rollup(pdf, "1h")
    assert_df_equal(t1h, want, sort_cols=["source", "bucket_start"],
                    check_dtype=False, check_exact=False, rtol=1e-12)


def test_incremental_merge_equals_full_rollup(spark):
    """Continuous-aggregate refresh: rollup(first batch) merged with
    rollup(second batch) ≡ rollup(all rows), bit-exact in exact mode —
    including buckets split across the batch boundary (first/last resolved
    by carried first_ts/last_ts) and the token checksum."""
    from forecaster_spark.operators.rollup import merge_rollup_increment

    corpus = gen_corpus(spark, 3000)
    series = seriesify(corpus).withColumn("par", F.col("seq") % 3)
    # split NOT on time: every bucket receives rows from both batches
    a = series.where(F.col("par") < 2).drop("par")
    b = series.where(F.col("par") == 2).drop("par")
    kw = dict(exact=True, keep_ts=True, checksum_col="tok_checksum", tie_break=False)
    merged = merge_rollup_increment(
        rollup_raw(a, "1m", **kw), rollup_raw(b, "1m", **kw), exact=True
    ).toPandas()
    full = rollup_raw(series.drop("par"), "1m", **kw).toPandas()
    assert_df_equal(
        merged, full, sort_cols=["source", "bucket_start"], check_dtype=False, check_like=True
    )


def test_incremental_merge_at_cascaded_tiers(spark):
    """keep_ts propagates through the cascade, so incremental refresh works
    at 1h/1d too: merge(cascade(rollup(a)), cascade(rollup(b))) ≡
    cascade(rollup(all)) bit-exactly."""
    from forecaster_spark.operators.rollup import merge_rollup_increment

    corpus = gen_corpus(spark, 3000)
    series = seriesify(corpus).withColumn("par", F.col("seq") % 2)
    a = series.where(F.col("par") == 0).drop("par")
    b = series.where(F.col("par") == 1).drop("par")
    kw = dict(exact=True, keep_ts=True, checksum_col="tok_checksum", tie_break=False)

    def t1h(s):
        return rollup_cascade(rollup_raw(s, "1m", **kw), "1h", exact=True)

    merged = merge_rollup_increment(t1h(a), t1h(b), exact=True).toPandas()
    full = t1h(series.drop("par")).toPandas()
    assert_df_equal(
        merged, full, sort_cols=["source", "bucket_start"], check_dtype=False, check_like=True
    )


def test_bucketed_join_and_agg_no_shuffle(spark, tmp_path):
    """Bucketed tables co-locate equi-joins and aggregations on the bucket
    key: the read-side physical plans contain NO Exchange (the shuffle was
    paid once at write), and results are exact."""
    from forecaster_spark.sources import write_bucketed

    a = spark.range(0, 10_000).select(
        (F.col("id") % 50).alias("source"), F.col("id").alias("x")
    )
    b = spark.range(0, 5_000).select(
        (F.col("id") % 50).alias("source"), F.col("id").alias("w")
    )
    write_bucketed(a, "bkt_a", str(tmp_path / "a"), "source", num_buckets=8)
    write_bucketed(b, "bkt_b", str(tmp_path / "b"), "source", num_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "source")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # 50 sources x (200 a-rows x 100 b-rows) pairs
        assert j.count() == 50 * 200 * 100
        g = spark.table("bkt_a").groupBy("source").count()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in gplan, gplan
        assert g.count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_retract_rebuild_tier_edges(spark):
    """Incremental retraction rebuild ≡ full recompute on a handcrafted
    frame covering the non-subtractable edges: retracting a bucket's min
    holder, its first-by-ts holder, and EVERY row of one bucket (the
    bucket must vanish). Untouched buckets must come through bit-identical
    from the base tier (anti-join path, not recomputation)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from forecaster_spark.operators.rollup import rollup_raw
    from forecaster_spark.plans.retract import retract_rebuild_tier

    rows = [
        # bucket A (minute 0): retract the min AND first row (id 1)
        (1, "s1", "2024-01-01 00:00:05", 1.0),
        (2, "s1", "2024-01-01 00:00:30", 9.0),
        (3, "s1", "2024-01-01 00:00:50", 5.0),
        # bucket B (minute 1): untouched
        (4, "s1", "2024-01-01 00:01:10", 7.0),
        (5, "s1", "2024-01-01 00:01:20", 2.0),
        # bucket C (minute 2): fully retracted → must vanish
        (6, "s1", "2024-01-01 00:02:01", 3.0),
        (7, "s1", "2024-01-01 00:02:02", 4.0),
        # other source, untouched
        (8, "s2", "2024-01-01 00:00:15", 11.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "source", "ts", "y"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    ev = spark.createDataFrame(pdf)
    retr = spark.createDataFrame(pd.DataFrame({"event_id": [1, 6, 7]}))

    got = (
        retract_rebuild_tier(ev, retr, tier="1m", exact=True)
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    want = (
        rollup_raw(
            ev.join(F.broadcast(retr), "event_id", "left_anti").drop("event_id"),
            "1m",
            exact=True,
        )
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
    a = got[(got.source == "s1")].reset_index(drop=True)
    assert len(a) == 2  # bucket C vanished
    assert a.iloc[0]["min_y"] == 5.0 and a.iloc[0]["first_y"] == 9.0  # min/first rebuilt
    assert a.iloc[1]["cnt"] == 2  # untouched bucket intact


def test_retract_rebuild_null_ts_row(spark):
    """Retracting a NULL-ts row (it lives in the NULL bucket) must actually
    remove its contribution — the bucket joins are null-SAFE; with plain
    equality the NULL-bucket tier row would silently survive the anti-join
    (r4 review finding)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from forecaster_spark.operators.rollup import rollup_raw
    from forecaster_spark.plans.retract import retract_rebuild_tier

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "source": ["s1", "s1", "s1", "s1"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:05", "2024-01-01 00:00:30", pd.NaT, pd.NaT]
            ),
            "y": [1.0, 9.0, 5.0, 7.0],
        }
    )
    ev = spark.createDataFrame(pdf)
    retr = spark.createDataFrame(pd.DataFrame({"event_id": [3]}))
    got = retract_rebuild_tier(ev, retr, tier="1m", exact=True).toPandas()
    want = rollup_raw(
        ev.join(F.broadcast(retr), "event_id", "left_anti").drop("event_id"),
        "1m",
        exact=True,
    ).toPandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, na_position="last").reset_index(drop=True),
        want[cols].sort_values(cols, na_position="last").reset_index(drop=True),
    )
    # the NULL bucket still exists (row 4 survives) with row 3's value gone
    nullb = got[got.bucket_start.isna()]
    assert len(nullb) == 1 and nullb.iloc[0]["cnt"] == 1 and nullb.iloc[0]["min_y"] == 7.0
