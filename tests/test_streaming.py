"""Structured Streaming 1m rollup ≡ batch rollup on the same input."""

from forecaster_spark.operators.rollup import rollup_raw
from forecaster_spark.streaming import run_stream_to_memory
from tests.conftest import assert_df_equal, mk_series_pdf


def test_stream_rollup_matches_batch(spark, tmp_path):
    pdf = mk_series_pdf(n=600, n_sources=2)
    src = str(tmp_path / "stream_src")
    df = spark.createDataFrame(pdf)
    df.repartition(8).write.parquet(src)  # several files → several triggers

    streamed = run_stream_to_memory(spark, src).toPandas()
    batch = rollup_raw(df, "1m", tie_break=False).toPandas()
    assert_df_equal(
        streamed,
        batch,
        sort_cols=["source", "bucket_start"],
        check_dtype=False,
        check_like=True,
        check_exact=False,
        rtol=1e-12,
    )
