"""Hot-source skew handling for aggregations (north rule; SURVEY.md §4).

The corpus is Zipf-skewed — one source holds ~30-50% of rows. AQE's skew
handling covers *joins*, not groupBy partials feeding a single reducer key,
so the engine salts explicitly:

``salted_rollup_raw`` runs the raw→1m rollup in two phases:
  phase 1: groupBy(source, bucket, salt) where salt = pmod(xxhash64(ts), n)
           — partial aggregates computed across n reducers per hot key;
  phase 2: groupBy(source, bucket) merging partials (the same algebra the
           1m→1h cascade uses, so the merge is already tested).

Because the rollup key (source, minute-bucket) is itself fine-grained, phase
1 salting mainly protects against pathological single-bucket floods (e.g.
backfill jobs writing one minute); the identity ``salted ≡ unsalted`` is
asserted in tests at every tier.

For per-source kernels (Gorilla pack, model fits) skew is bounded
structurally instead: kernels consume rolled tiers (bounded rows/source) or
deterministic sub-blocks (``pack_rollup_gorilla`` block ids), never raw
series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forecaster_spark.operators.rollup import MICRO, TIERS


def hot_sources(series: DataFrame, threshold_ratio: float = 0.2) -> list[str]:
    """Sources holding more than ``threshold_ratio`` of all rows (collected
    to the driver — the source dimension is tiny by construction)."""
    counts = series.groupBy("source").agg(F.count("*").alias("n")).collect()
    total = sum(r["n"] for r in counts)
    return [r["source"] for r in counts if r["n"] > threshold_ratio * total]


def salted_rollup_raw(
    series: DataFrame,
    tier: str = "1m",
    y: str = "y",
    ts: str = "ts",
    n_salt: int = 16,
    exact: bool = True,
    checksum_col: str | None = None,
) -> DataFrame:
    """Two-phase (salted) raw→tier rollup; output ≡ ``rollup_raw(...,
    exact=exact, tie_break=True)`` by construction and by test."""
    unit = TIERS[tier]
    salt = F.pmod(F.xxhash64(F.col(ts)), F.lit(n_salt)).alias("_salt")
    sm = F.sum(F.round(F.col(y) * MICRO).cast("long"))
    chk1 = [F.sum(checksum_col).alias("_chk_part")] if checksum_col else []
    phase1 = (
        series.groupBy(
            "source", F.date_trunc(unit, F.col(ts)).alias("bucket_start"), salt
        ).agg(
            F.count(y).alias("cnt"),
            F.min(y).alias("min_y"),
            F.max(y).alias("max_y"),
            F.min(F.struct(F.col(ts).alias("t"), F.col(y).alias("v"))).alias("first_s"),
            F.max(F.struct(F.col(ts).alias("t"), F.col(y).alias("v"))).alias("last_s"),
            (sm if exact else F.sum(y).cast("double")).alias("_sum_part"),
            *chk1,
        )
    )
    sm2 = F.sum("_sum_part")
    chk2 = [F.sum("_chk_part").alias("chk")] if checksum_col else []
    merged = phase1.groupBy("source", "bucket_start").agg(
        F.sum("cnt").alias("cnt"),
        ((sm2 / MICRO) if exact else sm2).alias("sum_y"),
        F.min("min_y").alias("min_y"),
        F.max("max_y").alias("max_y"),
        ((sm2 / MICRO / F.sum("cnt")) if exact else (sm2 / F.sum("cnt"))).alias("mean_y"),
        F.min("first_s").getField("v").alias("first_y"),
        F.max("last_s").getField("v").alias("last_y"),
        *([sm2.alias("sum_micro")] if exact else []),
        *chk2,
    )
    return merged
