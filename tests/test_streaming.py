"""Structured Streaming 1m rollup ≡ batch rollup on the same input; the
stateful cross-batch LOCF operator ≡ batch LOCF."""

import os
import time

import numpy as np
import pandas as pd

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


def test_stateful_stream_locf_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState LOCF: a null at the head of batch 2 must fill
    with the last observation from batch 1 (keyed state), and the end-to-end
    result must equal the batch locf operator on the concatenated input."""
    from forecaster_spark.operators.gapfill import locf
    from forecaster_spark.streaming.stateful import run_stream_locf_to_memory

    ts = pd.Timestamp("2025-01-01") + pd.to_timedelta(np.arange(20), unit="min")
    y = np.arange(20).astype(float)
    y[[3, 10, 11, 17]] = np.nan
    pdf = pd.DataFrame({"source": "s0", "ts": ts, "y": y})
    # batch boundary at row 10: rows 10,11 are null → must fill with row 9's
    # value carried in state
    src = str(tmp_path / "locf_src")
    os.makedirs(src)
    spark.createDataFrame(pdf.iloc[:10]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → deterministic file→batch order
    spark.createDataFrame(pdf.iloc[10:]).coalesce(1).write.mode("append").parquet(src)

    out = run_stream_locf_to_memory(spark, src).toPandas().sort_values("ts").reset_index(drop=True)
    assert len(out) == 20
    batch = (
        locf(spark.createDataFrame(pdf), "y", order="ts")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["y"].to_numpy(), batch["y"].to_numpy())
    assert out.loc[10, "y"] == 9.0 and out.loc[11, "y"] == 9.0  # cross-batch carry
    assert bool(out.loc[10, "filled"]) and not bool(out.loc[9, "filled"])
