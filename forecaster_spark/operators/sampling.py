"""Deterministic hash-based dataset splits and samples.

Training pipelines need split/sample decisions that are (a) stable across
runs, partitionings, and cluster sizes, (b) independent of row order, and
(c) reproducible by other engines for audit. Both come from the shared
cross-engine splitmix64 layer (:mod:`forecaster_spark.functions.xhash`):
``bucket = splitmix64(id · (2·seed+1)) mod 1e6`` — a pure function of the
row id, so the same row lands in the same split everywhere, and the DuckDB
oracle replays every assignment bit-for-bit (``xhash_sql.splitmix_cols``).

Engine-added operator (the reference has a positional 80/20 split only —
forecaster.py:52-54; positional splits are not stable under distributed
reordering, so the engine's canonical split is hash-based).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forecaster_spark.functions import xhash
from forecaster_spark.functions.xhash_sql import W, splitmix_cols, umul_c

BUCKETS = 1_000_000


def _thresholds(splits: list[tuple[str, float]]) -> list[tuple[str, int]]:
    total = sum(w for _, w in splits)
    if not (abs(total - 1.0) < 1e-9):
        raise ValueError(f"split weights must sum to 1, got {total}")
    out, acc = [], 0.0
    for name, w in splits:
        acc += w
        out.append((name, int(round(acc * BUCKETS))))
    out[-1] = (out[-1][0], BUCKETS)  # close rounding gaps at the top
    return out


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, float]] | None = None,
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Assign each row a split label from a hash of its integer id.
    Output: input columns + ``bucket`` (0..999999) + ``out`` label."""
    splits = splits or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    ths = _thresholds(splits)
    mult = np.uint64(2 * seed + 1)

    @F.pandas_udf(T.LongType())
    def bucket_of(ids: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        b = xhash.splitmix64(u * mult) % np.uint64(BUCKETS)
        return pd.Series(b.view(np.int64))

    b = F.col("bucket")
    expr = None
    for name, hi in ths[:-1]:  # ascending thresholds; first match wins
        expr = F.when(b < hi, name) if expr is None else expr.when(b < hi, name)
    label = F.lit(ths[-1][0]) if expr is None else expr.otherwise(ths[-1][0])
    return df.withColumn("bucket", bucket_of(F.col(id_col))).withColumn(out, label)


def hash_split_sql(
    id_col: str = "doc_id",
    splits: list[tuple[str, float]] | None = None,
    seed: int = 42,
    source_sql: str = "SELECT doc_id FROM documents",
) -> str:
    """DuckDB oracle for :func:`hash_split` → (id, bucket, split)."""
    splits = splits or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    ths = _thresholds(splits)
    mult = (2 * seed + 1) % W
    cases = " ".join(
        f"WHEN bucket < {hi} THEN '{name}'" for name, hi in ths[:-1]
    )
    return f"""
WITH src AS ({source_sql}),
hx AS (SELECT {id_col},
              {umul_c(f"(CAST({id_col} AS HUGEINT) % {W} + {W}) % {W}", mult)} AS x0
       FROM src),
hs AS (SELECT {id_col}, {splitmix_cols("x0", "h")} FROM hx),
bk AS (SELECT {id_col}, CAST(h % {BUCKETS} AS BIGINT) AS bucket FROM hs)
SELECT {id_col}, bucket,
       CASE {cases} ELSE '{ths[-1][0]}' END AS split
FROM bk"""
