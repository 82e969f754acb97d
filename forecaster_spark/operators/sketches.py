"""Mergeable sketch operators for the tiered-rollup engine.

At 100-TB scale, "how many distinct users per (source, bucket)?" and "which
tokens are heavy hitters?" cannot afford exact distinct/count tables at every
retention tier — the standard answer is *mergeable sketches* stored as tier
columns and combined exactly like the engine's other partial aggregates
(sum-of-sums, min-of-mins):

- :func:`hll_partials` / :func:`hll_merge` — HyperLogLog-style register
  sketches for distinct counting. Registers merge via ``max``, so a 1h
  sketch is the register-wise max of its 1m partials — the same cascade
  shape as ``rollup.cascade`` and certified the same way (cascaded result
  must equal direct-from-raw, which the DuckDB oracle computes).
- :func:`cm_sketch` — count-min sketch over document words for heavy-hitter
  token counting. Counters merge via ``+``; the kernel emits one partial
  counter table per Arrow batch (map-side combine: at most depth·width rows
  cross the shuffle per batch, regardless of corpus size).

Both sketches hash with the engine's cross-engine splitmix64 primitives
(:mod:`forecaster_spark.functions.xhash`) so the driver's DuckDB oracle
replays every register index / counter cell bit-for-bit — the sketches are
value-certified, not just rows-counted. ANSI-safe by construction: all
wraparound arithmetic lives in numpy uint64 kernels, and the native side
only does ``max``/``sum`` on small non-negative ints.

The reference has no sketches of any kind (SURVEY.md §2.4 "no approx
sketches"); these are engine additions for the north rule's 10^12-sequence
scale, where per-tier exact distinct would itself be a full shuffle of the
raw keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from forecaster_spark.functions import xhash
from forecaster_spark.operators.textops import WS_SPLIT

# ---------------------------------------------------------------------------
# HyperLogLog-style distinct registers
# ---------------------------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers; rho ranges 1..59 over the 58-bit remainder
HLL_M = 1 << HLL_P
_RHO_MAX = 64 - HLL_P + 1  # remainder == 0 → all 58 bits "zero" → 59


@F.pandas_udf(T.LongType())
def _splitmix64_long(v: pd.Series) -> pd.Series:
    """splitmix64 of an int64 column, returned as the int64 view of the
    uint64 hash (wraparound happens inside numpy — ANSI-safe)."""
    u = v.to_numpy(dtype=np.int64).view(np.uint64)
    return pd.Series(xhash.splitmix64(u).view(np.int64))


def hll_partials(
    df: DataFrame,
    key: str = "user_id",
    partition: str = "source",
    ts: str = "ts",
    bucket_unit: str = "minute",
) -> DataFrame:
    """Per-(partition, bucket) HLL register partials for distinct ``key``:
    ``(partition, bucket_start, reg, rho)`` with one row per *occupied*
    register (absent register ≡ rho 0).

    reg = low :data:`HLL_P` bits of splitmix64(key); rho = 1 + leading
    zeros of the remaining 58 bits (1..59). Only the splitmix hash needs a
    kernel; reg/rho derive natively — ``shiftrightunsigned`` + ``bin()``
    string length is the exact integer bit-length (the float ``log2`` trap
    near 2^64 documented in gorilla.py cannot occur), and both mirror
    DuckDB's ``bin()`` minimal binary string. NULL keys are excluded, as
    ``count(DISTINCT key)`` excludes them.

    One shuffle on (partition, bucket, reg); map-side partial ``max`` makes
    the shuffle at most m=64 rows per bucket per map task regardless of raw
    row count."""
    rem = F.shiftrightunsigned(F.col("_h"), HLL_P)
    rho = F.when(rem == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(rem))
    )
    return (
        df.where(F.col(key).isNotNull())
        .withColumn("bucket_start", F.date_trunc(bucket_unit, F.col(ts)))
        .withColumn("_h", _splitmix64_long(F.col(key)))
        .groupBy(
            partition,
            "bucket_start",
            F.col("_h").bitwiseAND(HLL_M - 1).cast("int").alias("reg"),
        )
        .agg(F.max(rho).cast("int").alias("rho"))
    )


def hll_merge(
    partials: DataFrame,
    to_unit: str = "hour",
    partition: str = "source",
) -> DataFrame:
    """Merge register partials to a coarser tier: register-wise ``max`` —
    associative/commutative/idempotent, so cascading 1m→1h→1d equals
    direct-from-raw at every tier (the contract oracle checks exactly
    this: Spark cascades, DuckDB recomputes from raw)."""
    return (
        partials.groupBy(
            partition,
            F.date_trunc(to_unit, F.col("bucket_start")).alias("bucket_start"),
            "reg",
        )
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    partition: str = "source",
    bucket: str = "bucket_start",
) -> DataFrame:
    """Cardinality estimate per bucket from a register table (Flajolet et
    al. 2007): raw = α_m·m²/Σ 2^−rho (absent registers contribute 2^0),
    with the small-range linear-counting correction m·ln(m/V) when raw ≤
    2.5m and V>0 zero registers remain. Float-transcendental (ln / 2^−rho
    harmonics) → NOT in the SQL contract; accuracy is pinned by pytest
    against exact distinct counts instead (the *registers* are the
    certified artifact)."""
    alpha = 0.709  # α_64
    m = float(HLL_M)
    agg = registers.groupBy(partition, bucket).agg(
        F.count(F.lit(1)).alias("_occupied"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_w_occ"),
    )
    zeros = F.lit(m) - F.col("_occupied")
    raw = F.lit(alpha * m * m) / (F.col("_w_occ") + zeros)
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(m) * F.log(F.lit(m) / zeros)
    ).otherwise(raw)
    return agg.select(
        partition, bucket, F.col("_occupied").alias("occupied"), est.alias("est")
    )


# ---------------------------------------------------------------------------
# Count-min sketch over document words
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 128
CM_SEED = 1337


def cm_salts(depth: int = CM_DEPTH, seed: int = CM_SEED) -> np.ndarray:
    """Per-row xor salts: splitmix64(seed·(j+1)) — inlined as literals in
    the SQL mirror (:func:`forecaster_spark.functions.xhash_sql.cm_sketch_sql`)."""
    return xhash.splitmix64(
        (np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(seed)).astype(np.uint64)
    )


def cm_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """Count-min sketch of word occurrences: ``(depth, col, cnt)`` with
    cell (j, c) = number of word occurrences whose
    splitmix64(word_hash ⊕ salt_j) lands in column c (= hash & (width−1);
    width is a power of two).

    Tokenization = the engine-wide cross-engine convention (lower + split
    on the explicit class ``[ \\t\\n\\x0B\\f\\r]+``, keep-empties, :func:`xhash.word_hash_flat` truncation), so
    the DuckDB mirror replays every cell count exactly.

    Scale shape: the kernel folds each Arrow batch into a local
    depth×width counter array (np.bincount) and emits ≤ depth·width partial
    rows per batch — a count-min's defining property is that partials sum,
    so the shuffle carries sketch cells, never words. Point estimates
    (min over depth rows) and mergeability are pinned in pytest."""
    assert width & (width - 1) == 0, "width must be a power of two"
    salts = cm_salts(depth, seed)
    out_schema = T.StructType(
        [
            T.StructField("depth", T.IntegerType()),
            T.StructField("col", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    mask = np.uint64(width - 1)

    def kernel(batches):
        acc = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            flat: list[str] = []
            for ws in pdf["_ws"].to_numpy():
                if ws is not None:
                    flat.extend(ws)
            if not flat:
                continue
            wh = xhash.word_hash_flat(flat)
            for j in range(depth):
                cols = (xhash.splitmix64(wh ^ salts[j]) & mask).astype(np.int64)
                acc[j] += np.bincount(cols, minlength=width)
        d, c = np.nonzero(acc)
        yield pd.DataFrame(
            {"depth": d.astype(np.int32), "col": c.astype(np.int32), "cnt": acc[d, c]}
        )

    words = df.where(F.col(text_col).isNotNull()).select(
        F.split(F.lower(F.col(text_col)), WS_SPLIT).alias("_ws")
    )
    return (
        words.mapInPandas(kernel, schema=out_schema)
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_point_estimates(sketch_rows: list[tuple], words: list[str],
                       depth: int = CM_DEPTH, width: int = CM_WIDTH,
                       seed: int = CM_SEED) -> dict[str, int]:
    """Driver-side point queries against a collected sketch: estimate(word)
    = min over depth rows of the word's cell — ≥ true count always, ≤ true
    + ε·N with probability 1−δ (ε = e/width, δ = e^−depth). Test helper."""
    acc = np.zeros((depth, width), dtype=np.int64)
    for d, c, cnt in sketch_rows:
        acc[d, c] = cnt
    salts = cm_salts(depth, seed)
    wh = xhash.word_hash_flat(words)
    cols = np.stack(
        [xhash.splitmix64(wh ^ s) & np.uint64(width - 1) for s in salts]
    ).astype(np.int64)  # (depth, n_words)
    ests = acc[np.arange(depth)[:, None], cols].min(axis=0)
    return {w: int(e) for w, e in zip(words, ests)}


def hdr_histogram_partials(
    df: DataFrame,
    value: str = "y",
    partition: str = "source",
    ts: str = "ts",
    bucket: str = "minute",
    sub_bits: int = 3,
) -> DataFrame:
    """Mergeable HDR-style log-bucket histogram partials per (partition,
    time bucket) — the Prometheus-native-histogram / HdrHistogram shape
    the tiered engine stores instead of raw values for percentile reads.

    Bin key = the value's own floor-quantization to ``sub_bits`` mantissa
    bits: ``lb = (vc >> sh) << sh`` with ``sh = max(bit_length(vc) - 1 -
    sub_bits, 0)`` on the non-negative centi-unit value. ``lb`` is
    monotone in ``vc``, self-describing (its own bit length recovers
    ``sh``), and exact-integer on both engines — bit_length via the
    binary-string length (Spark ``conv(v,10,2)`` ≡ DuckDB ``bin(v)``,
    verified 0/5/2^26-1), so no float ``log2`` tie-break risk. Relative
    bin width ≤ 2^-sub_bits (12.5% at the default — Prometheus schema-0
    coarseness; raise sub_bits for HdrHistogram-grade 2^-7).

    Counters merge via ``+`` exactly like the engine's other partial
    aggregates: 1m partials sum-merge to 1h/1d/global without touching
    raw data. Output: (partition, bucket_start, bin_lb, cnt)."""
    vc = F.greatest(F.round(F.col(value) * 100).cast("long"), F.lit(0))
    b = df.select(
        F.col(partition),
        F.date_trunc(bucket, F.col(ts)).alias("bucket_start"),
        vc.alias("_vc"),
    )
    b = b.withColumn("_bl", F.length(F.conv(F.col("_vc"), 10, 2)))
    b = b.withColumn(
        "_sh", F.greatest(F.col("_bl") - F.lit(1 + sub_bits), F.lit(0))
    )
    return (
        b.withColumn("bin_lb", F.expr("shiftleft(shiftright(_vc, _sh), _sh)"))
        .groupBy(partition, "bucket_start", "bin_lb")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles(
    partials: DataFrame,
    partition: str = "source",
    qs: tuple = (50, 90, 99),
) -> DataFrame:
    """Percentile estimates from merged HDR histogram partials: sum-merge
    the per-bucket counters to one histogram per ``partition`` (the tier
    cascade read path — raw data never re-scanned), then pick, for each
    q, the smallest bin lower bound whose cumulative count reaches
    ``ceil(q·n/100)`` (exact integer target ``(q·n + 99) div 100``; the
    lower-bound estimator under-reads by at most the bin's relative
    width). Everything is integer until one final /100.0 per output —
    bit-reproducible cross-engine and merge-order-independent.

    Plan: one hash aggregate (map-side combinable), one window over the
    per-partition BIN list (≤ ~64·2^sub_bits rows per partition — bins,
    not data), one final aggregate. Output: (partition, n, p<q>...)."""
    tot = partials.groupBy(partition, "bin_lb").agg(F.sum("cnt").alias("cnt"))
    wc = (
        Window.partitionBy(partition)
        .orderBy("bin_lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = tot.withColumn("_cum", F.sum("cnt").over(wc)).withColumn(
        "_n", F.sum("cnt").over(Window.partitionBy(partition))
    )
    aggs = [F.max("_n").alias("n")]
    for q in qs:
        tgt = F.expr(f"({q} * _n + 99) div 100")
        aggs.append(
            (
                F.min(F.when(F.col("_cum") >= tgt, F.col("bin_lb"))).cast(
                    "double"
                )
                / F.lit(100.0)
            ).alias(f"p{q}")
        )
    return c.groupBy(partition).agg(*aggs)
