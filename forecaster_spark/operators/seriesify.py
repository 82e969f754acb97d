"""Seriesify: token corpus → per-source ordered time series.

The north rule treats the pre-tokenized corpus ``(doc_id, tokens, n_tok,
source)`` as one series per ``source`` with signal ``y = n_tok`` (SURVEY.md
§1.2). Event time is derived deterministically from the per-source sequence
index embedded in ``doc_id`` (``{source}-{seq:09d}``): ``ts = EPOCH0 + seq ·
cadence``. A per-document token checksum rides along so the bit-exact
token-array invariant (BASELINE.json input_hint) can be asserted across every
pipeline stage without carrying the arrays.

All expressions are native Catalyst (no Python UDFs): substring parse,
interval arithmetic, and ``F.aggregate`` over the token array stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPOCH0 = "2025-01-01 00:00:00"
DEFAULT_CADENCE_S = 7  # prime vs 60 so 1m buckets hold 8-9 points


def token_checksum(tokens: Column) -> Column:
    """Order-sensitive polynomial checksum of the token array (Java-long
    wraparound is deterministic): acc·31 + tok. Native ``F.aggregate`` —
    executes in codegen, no Python."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, x: acc * F.lit(31).cast("long") + x.cast("long"),
    )


def seriesify(corpus: DataFrame, cadence_s: int = DEFAULT_CADENCE_S) -> DataFrame:
    """(doc_id, tokens, n_tok, source) → (source, seq, ts, y, n_tok,
    tok_checksum, doc_id). ``y`` is the n_tok signal as double."""
    seq = F.substring_index("doc_id", "-", -1).cast("long")
    return corpus.select(
        "source",
        seq.alias("seq"),
        F.timestamp_seconds(
            F.unix_timestamp(F.to_timestamp(F.lit(EPOCH0))) + seq * cadence_s
        ).alias("ts"),
        F.col("n_tok").cast("double").alias("y"),
        "n_tok",
        token_checksum(F.col("tokens")).alias("tok_checksum"),
        "doc_id",
    )


def events_as_series(events: DataFrame) -> DataFrame:
    """Adapter: the driver testdata ``events`` table as a long-format series
    set — source = event_type, signal = value."""
    return events.select(
        F.col("event_type").alias("source"),
        F.col("ts"),
        F.col("value").alias("y"),
    )
