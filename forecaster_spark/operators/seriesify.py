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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPOCH0 = "2025-01-01 00:00:00"
DEFAULT_CADENCE_S = 7  # prime vs 60 so 1m buckets hold 8-9 points

_MAX_LEN = 1 << 16
# 31^k mod 2^64 (uint64 wraparound == Java long); built via python pow to
# avoid numpy overflow warnings at import
_POW31 = np.array([pow(31, k, 1 << 64) for k in range(_MAX_LEN)], dtype=np.uint64)


def token_checksum(tokens: Column) -> Column:
    """Order-sensitive polynomial checksum of the token array with Java-long
    wraparound: ``acc·31 + tok`` folded left, i.e. Σ tok_i·31^(n−1−i) mod
    2^64. Native ``F.aggregate`` reference form — exact but *interpreted*
    per element (higher-order lambdas don't enter whole-stage codegen), so
    it is the slow path; use :func:`token_checksum_fast` in scans."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, x: acc * F.lit(31).cast("long") + x.cast("long"),
    )


@F.pandas_udf(T.LongType())
def token_checksum_fast(tokens: pd.Series) -> pd.Series:
    """Bit-identical to :func:`token_checksum`, vectorized: flatten the
    Arrow batch, weight each token by the precomputed 31^(n−1−i) power
    (uint64 wraparound ≡ Java long), and ``add.reduceat`` per row — no
    per-row Python. ~50× the interpreted expression's throughput."""
    arrs = tokens.to_numpy()
    n = len(arrs)
    if n == 0:
        return pd.Series(np.empty(0, dtype=np.int64))
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(np.zeros(n, dtype=np.int64))
    flat = np.concatenate([np.asarray(a, dtype=np.uint64) for a in arrs])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    weights = _POW31[np.repeat(lens, lens) - 1 - pos]
    contrib = flat * weights
    out = np.zeros(n, dtype=np.uint64)
    nz = lens > 0
    sums = np.add.reduceat(contrib, starts[nz])
    out[nz] = sums
    return pd.Series(out.view(np.int64))


def seriesify(corpus: DataFrame, cadence_s: int = DEFAULT_CADENCE_S, checksum: str = "xxhash") -> DataFrame:
    """(doc_id, tokens, n_tok, source) → (source, seq, ts, y, n_tok,
    tok_checksum, doc_id). ``y`` is the n_tok signal as double.

    ``checksum`` picks the per-doc token-array checksum implementation:
    - "xxhash"      (default): native ``xxhash64(tokens)`` — whole-stage
                    codegen, runs at parquet-scan speed; the invariant is
                    Spark-internal (tier sums compared against raw sums).
    - "poly"        : Arrow/numpy kernel of the reference polynomial
                    (acc·31+tok) — bit-equal to "poly_native", ~3× the
                    interpreted cost in Arrow transfer of the token column.
    - "poly_native" : the ``F.aggregate`` fold — exact but interpreted per
                    element (slowest; measured 66 s vs 7 s for xxhash on a
                    400k-doc corpus).
    """
    seq = F.substring_index("doc_id", "-", -1).cast("long")
    chk = {
        "xxhash": lambda: F.xxhash64("tokens"),
        "poly": lambda: token_checksum_fast(F.col("tokens")),
        "poly_native": lambda: token_checksum(F.col("tokens")),
    }[checksum]()
    return corpus.select(
        "source",
        seq.alias("seq"),
        F.timestamp_seconds(
            F.unix_timestamp(F.to_timestamp(F.lit(EPOCH0))) + seq * cadence_s
        ).alias("ts"),
        F.col("n_tok").cast("double").alias("y"),
        "n_tok",
        chk.alias("tok_checksum"),
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
