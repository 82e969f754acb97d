"""Deterministic, distributed synthetic token-corpus generator.

Produces the engine's primary input table (BASELINE.json input_hint):
``(doc_id string, tokens array<int>, n_tok int, source string)`` with
Zipf-skewed per-source row counts (one hot source) so skew handling is
exercised. Everything derives from (seed, global row id) via counter-based
hashing — no wall clock, no RNG state — so any partitioning of
``spark.range`` yields the same corpus, and regeneration at any scale is
reproducible (the checkpoint/resume tests rely on this).

Scale note: generation is embarrassingly parallel over ``spark.range``
partitions; at 10^12 sequences the same code runs unchanged with more range
partitions — there is no driver-side state besides the (tiny) per-source
offset array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TOKEN_VOCAB = 50257
MAX_TOKENS = 2048
PHI64 = np.uint64(0x9E3779B97F4A7C15)
MIX1 = np.uint64(0xBF58476D1CE4E5B9)
MIX2 = np.uint64(0x94D049BB133111EB)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — counter-based hash, vectorized."""
    x = (x + PHI64).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= MIX1
    x ^= x >> np.uint64(27)
    x *= MIX2
    x ^= x >> np.uint64(31)
    return x


def source_sizes(n_docs: int, n_sources: int = 20, zipf_s: float = 1.2) -> np.ndarray:
    """Per-source row counts following a Zipf(s) share; the first source is
    the hot one (~30-50% of rows for s≈1.2, n_sources=20)."""
    w = 1.0 / np.arange(1, n_sources + 1) ** zipf_s
    w /= w.sum()
    sizes = np.maximum((w * n_docs).astype(np.int64), 1)
    sizes[0] += n_docs - sizes.sum()  # exact total, remainder to the hot source
    return sizes


def gen_corpus(
    spark: SparkSession,
    n_docs: int,
    n_sources: int = 20,
    seed: int = 42,
    zipf_s: float = 1.2,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed corpus build: ``spark.range(n_docs)`` → vectorized
    mapInPandas. Global row id → (source, per-source seq) via searchsorted on
    the broadcast offsets array; token arrays built flat then wrapped as an
    Arrow ListArray (no per-row Python objects)."""
    sizes = source_sizes(n_docs, n_sources, zipf_s)
    offsets = np.concatenate(([0], np.cumsum(sizes)))  # len n_sources+1
    names = np.array([f"src{i:02d}" for i in range(n_sources)])
    seed_u = np.uint64(seed)

    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 8)

    def build(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            u = ids.astype(np.uint64)
            src_idx = np.searchsorted(offsets, ids, side="right") - 1
            seq = ids - offsets[src_idx]
            h_len = _mix64(u ^ (np.uint64((int(seed_u) * 0x5851F42D4C957F2D) % (1 << 64))))
            n_tok = (h_len % np.uint64(MAX_TOKENS)).astype(np.int64) + 1
            starts = _mix64(u + seed_u)
            total = int(n_tok.sum())
            # flat token stream: tokens[i][k] = (start_i + k·PHI) mod V
            row_of = np.repeat(np.arange(len(ids)), n_tok)
            k = np.arange(total, dtype=np.uint64) - np.repeat(
                np.concatenate(([0], np.cumsum(n_tok)[:-1])).astype(np.uint64), n_tok
            )
            flat = ((starts[row_of] + k * PHI64) % np.uint64(TOKEN_VOCAB)).astype(np.int32)
            list_offsets = np.concatenate(([0], np.cumsum(n_tok))).astype(np.int32)
            tok_arr = pa.ListArray.from_arrays(pa.array(list_offsets), pa.array(flat))
            src = names[src_idx]
            doc_id = np.char.add(np.char.add(src, "-"), np.char.zfill(seq.astype(str), 9))
            yield pd.DataFrame(
                {
                    "doc_id": doc_id,
                    "tokens": tok_arr.to_pandas(),
                    "n_tok": n_tok.astype(np.int32),
                    "source": src,
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(build, schema=CORPUS_SCHEMA)
    )


def corpus_pandas(n_docs: int, n_sources: int = 20, seed: int = 42, zipf_s: float = 1.2) -> pd.DataFrame:
    """Driver-side oracle twin of :func:`gen_corpus` for small-scale tests."""
    sizes = source_sizes(n_docs, n_sources, zipf_s)
    offsets = np.concatenate(([0], np.cumsum(sizes)))
    names = np.array([f"src{i:02d}" for i in range(n_sources)])
    ids = np.arange(n_docs, dtype=np.int64)
    u = ids.astype(np.uint64)
    seed_u = np.uint64(seed)
    src_idx = np.searchsorted(offsets, ids, side="right") - 1
    seq = ids - offsets[src_idx]
    n_tok = (_mix64(u ^ (np.uint64((int(seed_u) * 0x5851F42D4C957F2D) % (1 << 64)))) % np.uint64(MAX_TOKENS)).astype(np.int64) + 1
    starts = _mix64(u + seed_u)
    toks = [
        ((starts[i] + np.arange(n_tok[i], dtype=np.uint64) * PHI64) % np.uint64(TOKEN_VOCAB)).astype(np.int32)
        for i in range(n_docs)
    ]
    src = names[src_idx]
    return pd.DataFrame(
        {
            "doc_id": np.char.add(np.char.add(src, "-"), np.char.zfill(seq.astype(str), 9)),
            "tokens": toks,
            "n_tok": n_tok.astype(np.int32),
            "source": src,
        }
    )
