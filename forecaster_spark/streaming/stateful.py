"""Custom stateful streaming operator: cross-batch LOCF gap-fill via
``applyInPandasWithState`` (north-rule "custom stateful operator" slot).

Windowed aggregates cannot carry a value *across* micro-batches; LOCF needs
exactly that — the last observation of a series may live many batches back.
State per ``source`` is (last_ts_us, last_y): each batch sorts its rows by
event time, fills nulls with a running last-observation that is seeded from
state, then writes the new tail observation back to state.

Correctness contract: within-source event-time order across batches (e.g.
a Kafka topic partitioned by source). Out-of-order rows inside one batch are
handled (sorted); across batches they would need a watermark-buffered
reorder stage in front, which the 1m rollup's watermark already provides at
tier granularity.

Scale: state is O(#sources) — two scalars per key; batch work is the same
vectorized ffill as the batch operator, partitioned by source hash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("ts", TimestampType()),
        StructField("y", DoubleType()),
        StructField("filled", BooleanType()),
    ]
)

OUT_SCHEMA_ID = StructType(
    [
        StructField("source", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("y", DoubleType()),
        StructField("filled", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("last_ts_us", LongType()), StructField("last_y", DoubleType())]
)


def _locf_batch(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (source,) = key
    last_ts_us, last_y = state.get if state.exists else (None, None)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        # tie-break duplicate event times by event_id when present — a bare
        # ts sort is order-unstable under ties, which changes which value a
        # tied null row inherits
        order = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
        pdf = pdf.sort_values(order)
        y = pdf["y"]
        filled = y.isna()
        if last_y is not None:
            y = y.ffill().fillna(last_y)
        else:
            y = y.ffill()
        tail = y.dropna()
        if len(tail):
            last_y = float(tail.iloc[-1])
        # state ts must track the last *real* observation, not the batch's
        # final (possibly filled) row — otherwise state holds an inconsistent
        # (ts, value) pair the moment ts feeds staleness/timeout logic
        real_ts = pdf["ts"][~filled.to_numpy()]
        if len(real_ts):
            last_ts_us = int(real_ts.iloc[-1].value // 1000)
        out = {"source": source, "ts": pdf["ts"]}
        if "event_id" in pdf.columns:
            out["event_id"] = pdf["event_id"]
        out.update({"y": y, "filled": filled & y.notna()})
        yield pd.DataFrame(out)
    state.update((last_ts_us, last_y))


def stream_locf(stream: DataFrame) -> DataFrame:
    """Streaming LOCF over a ``(source, ts[, event_id], y)`` stream; nulls
    fill from the last observation, carried across micro-batches in keyed
    state. An ``event_id`` column, when present, tie-breaks duplicate event
    times and rides through to the output."""
    return stream.groupBy("source").applyInPandasWithState(
        _locf_batch,
        outputStructType=OUT_SCHEMA_ID if "event_id" in stream.columns else OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_locf_to_memory(spark, input_dir: str, query_name: str = "locf_stream") -> DataFrame:
    """Drive a parquet-directory stream (one file per micro-batch) through
    the stateful LOCF and return the collected output (test harness)."""
    stream = (
        spark.readStream.schema("source string, ts timestamp, y double")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream_locf(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


SESS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("session_id", LongType()),
    ]
)

SESS_STATE_SCHEMA = StructType(
    [StructField("last_sec", LongType()), StructField("n_sessions", LongType())]
)

SESSION_GAP_S = 1800


def _sessionize_batch(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user session assignment with the session counter and the last
    event's floor-second carried across micro-batches — the same integer
    gap rule as the batch sessionizer (``unix_timestamp`` floor seconds,
    new session when gap > 1800 s or first-ever event), so stream ≡ batch
    bit-for-bit."""
    (user_id,) = key
    last_sec, n_sessions = state.get if state.exists else (None, 0)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        sec = pdf["ts"].astype("int64") // 1_000_000_000
        prev = sec.shift(1)
        gap = sec - prev
        new_sess = gap.isna() | (gap > SESSION_GAP_S)
        if last_sec is not None:
            new_sess.iloc[0] = (int(sec.iloc[0]) - last_sec) > SESSION_GAP_S
        sid = n_sessions + new_sess.cumsum().astype("int64")
        n_sessions = int(sid.iloc[-1])
        last_sec = int(sec.iloc[-1])
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"],
                "session_id": sid,
            }
        )
    state.update((last_sec, n_sessions))


def stream_sessionize(stream: DataFrame) -> DataFrame:
    """Streaming sessionization over a ``(user_id, ts, event_id)`` stream:
    gap-based session windows (> 1800 s starts a new session) with the
    session counter in keyed state — the canonical custom stateful
    operator. State is two longs per user; requires within-user event-time
    order across batches (same contract as ``stream_locf``)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_batch,
        outputStructType=SESS_OUT_SCHEMA,
        stateStructType=SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    stream: DataFrame, keys: list[str], ts: str = "ts", delay: str = "30 days"
) -> DataFrame:
    """Streaming exact dedup on ``keys`` — the ingestion-side guard of the
    dedup pipeline (at-least-once sources like Kafka redeliver; the batch
    ``dedup_exact`` then never sees the duplicates). Built on
    ``dropDuplicatesWithinWatermark``: keyed state keeps one marker per
    key and expires it once the event-time watermark passes ``delay``
    beyond the key's timestamp, so state is bounded by the key arrival
    rate x the dedup horizon — NOT by stream lifetime (the classic
    unbounded ``dropDuplicates`` trap). The output NEVER contains
    duplicates: in-horizon redeliveries are deduped by state, and
    later-than-watermark ones are discarded by the watermark filter
    itself (pinned in pytest); what ``delay`` sizes is how long a
    late-but-FIRST arrival is still accepted. State is per-key
    hash-partitioned — scales with executors, no skew beyond the key
    distribution itself."""
    return stream.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)
