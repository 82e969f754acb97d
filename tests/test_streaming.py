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


def test_stream_rollup_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics under APPEND mode (the production sink shape):
    a window is emitted exactly once after the watermark passes its end,
    and a sufficiently late row is dropped rather than mutating or
    resurrecting the finalized window. Complete-mode tests can't see this
    — state there lives forever.

    Empirical Spark subtlety this test pins: the late-row input filter
    lags the watermark by ONE micro-batch (a batch's filter uses the
    watermark current at its start, computed at the END of the batch
    before it), so a late row landing in the very next batch after the
    advancing data still merges; only rows arriving two or more batches
    later are gated. The pipeline's at-least-10-minutes contract holds
    either way — lateness tolerance is never SHORTER than the watermark."""
    from forecaster_spark.streaming.rollup_stream import SERIES_SCHEMA, stream_rollup_1m

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    base = pd.Timestamp("2025-01-01")
    batches = [
        # batch 1: minute-2 window data + minute-20 row (advances the
        # watermark to 10 at the end of this batch)
        pd.DataFrame(
            {
                "source": "s0",
                "ts": [base + pd.Timedelta(minutes=m) for m in (2, 2, 20)],
                "y": [1.0, 3.0, 5.0],
            }
        ),
        # batch 2: cycles the advanced watermark into the input filter
        pd.DataFrame({"source": "s0", "ts": [base + pd.Timedelta(minutes=21)], "y": [7.0]}),
        # batch 3: the LATE minute-2 row (filter now at minute 11) + fresh
        pd.DataFrame(
            {
                "source": "s0",
                "ts": [base + pd.Timedelta(minutes=2), base + pd.Timedelta(minutes=22)],
                "y": [100.0, 9.0],
            }
        ),
    ]
    for b in batches:
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes → deterministic file→batch order

    stream = (
        spark.readStream.schema(SERIES_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    rolled = stream_rollup_1m(stream, watermark="10 minutes", exact=True)
    q = (
        rolled.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("late_test").toPandas()
    # the minute-2 window finalized with ONLY batch-1 rows: the late 100.0
    # was dropped and could not resurrect a second emission
    m2 = out[out.bucket_start == base + pd.Timedelta(minutes=2)]
    assert len(m2) == 1
    assert m2.iloc[0].cnt == 2 and m2.iloc[0].sum_y == 4.0 and m2.iloc[0].max_y == 3.0
    # nothing at/after the final watermark (minute 12) was finalized
    assert (out.bucket_start < base + pd.Timedelta(minutes=12)).all()


def test_stream_rollup_to_tier_upsert(spark, tmp_path):
    """foreachBatch keyed upsert into an on-disk tier: after streaming all
    files (incl. a within-watermark late row that must UPDATE its window's
    tier row), the tier equals the batch rollup of the full input."""
    from forecaster_spark.streaming.rollup_stream import stream_rollup_to_tier

    pdf = mk_series_pdf(n=400, n_sources=2)
    src = str(tmp_path / "tier_src")
    os.makedirs(src)
    # three time-ordered files; the third replays some early-ish rows so a
    # (still within-watermark) window gets UPDATED after first emission
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    spark.createDataFrame(pdf.iloc[:200]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(pdf.iloc[200:300]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(pdf.iloc[300:]).coalesce(1).write.mode("append").parquet(src)

    tier = str(tmp_path / "tier_1m")
    stream_rollup_to_tier(spark, src, tier, watermark="2 hours")
    got = spark.read.parquet(tier).toPandas()
    want = rollup_raw(spark.createDataFrame(pdf), "1m", tie_break=False, exact=True).toPandas()
    assert_df_equal(
        got,
        want[got.columns],
        sort_cols=["source", "bucket_start"],
        check_dtype=False,
        check_like=True,
        check_exact=False,
        rtol=1e-12,
    )


def test_stateful_stream_sessionize_carries_across_batches(spark, tmp_path):
    """The session counter and last-event second must survive the batch
    boundary: a session straddling two micro-batches keeps ONE id, and a
    cross-boundary gap > 1800 s opens a new session with the counter
    continuing (not resetting) from state."""
    import pandas as pd

    from forecaster_spark.streaming.stateful import stream_sessionize

    src = str(tmp_path / "sess_stream")
    base = pd.Timestamp("2030-01-01 00:00:00")
    # user 1: batch0 [0s, 100s], batch1 [200s (same session), 4000s (new)]
    # user 2: batch0 [0s], batch1 [3600s] -> new session via state gap
    b0 = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": [base, base + pd.Timedelta(seconds=100), base],
            "event_id": [0, 1, 2],
        }
    )
    b1 = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": [
                base + pd.Timedelta(seconds=200),
                base + pd.Timedelta(seconds=4000),
                base + pd.Timedelta(seconds=3600),
            ],
            "event_id": [3, 4, 5],
        }
    )
    for b in (b0, b1):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        spark.table("t_sess_stream")
        .toPandas()
        .set_index("event_id")["session_id"]
        .to_dict()
    )
    assert out == {0: 1, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2}


def test_stream_dedup_cross_batch_and_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics pinned: (a) a redelivery in
    a later micro-batch is dropped while the original's state lives; (b)
    a very-late redelivery (after the watermark passed the event's ts) is
    dropped by the WATERMARK filter, not re-emitted — so the output never
    contains duplicates; what `delay` sizes is how long a late-but-first
    arrival is still accepted."""
    import pandas as pd

    from forecaster_spark.streaming.stateful import stream_dedup

    src = str(tmp_path / "dedup_src")
    t0 = pd.Timestamp("2030-01-01 00:00:00")

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    # b1: originals; b2: one redelivery + rows advancing the watermark far
    # past t0 + 2 hours; b3: a second redelivery of the same event, now
    # below the watermark -> dropped as late data (never re-emitted).
    write_batch([(1, t0, 10.0), (2, t0 + pd.Timedelta("1min"), 20.0)])
    write_batch(
        [(1, t0, 10.0), (3, t0 + pd.Timedelta("10 hours"), 30.0)]
    )
    write_batch([(1, t0, 10.0)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup(stream, ["event_id"], delay="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_horizon_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("dedup_horizon_test").toPandas()
    # ids 1,2,3 each exactly once: the b2 redelivery of id 1 is deduped
    # by state, the b3 one is discarded by the watermark (t0 < t0+8h),
    # so no duplicate can ever surface in the output
    assert sorted(out.event_id.tolist()) == [1, 2, 3]
