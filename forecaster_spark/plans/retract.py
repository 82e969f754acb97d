"""Retraction-driven incremental tier rebuild — late corrections without a
full recompute.

A retention-tier store at 10^12-row scale cannot re-aggregate the world when
a batch of raw rows is retracted (GDPR deletes, upstream bug backfills,
late-arriving corrections). Additive statistics (cnt, sum_micro, checksums)
are subtractable, but ``min/max/first/last`` are NOT — retracting the row
that held a bucket's min cannot be fixed by arithmetic on the stored tier
row. The correct incremental plan therefore:

1. derives the AFFECTED bucket set from the retraction rows alone (tiny —
   |retractions| upper-bounds it; broadcastable);
2. keeps every untouched tier row as-is (anti-join against the broadcast
   affected set — with date-partitioned tier storage this prunes whole
   partitions and never rereads raw data for them);
3. re-aggregates ONLY the affected buckets from the surviving raw rows
   (broadcast semi-join on the bucket key pushes the bucket filter into the
   raw scan);
4. unions the kept rows with the recomputed rows.

Steps 2-4 are incremental only when the stored tier is supplied
(``base_tier=``); the self-contained contract query runs in harness mode
(base recomputed from raw) because the driver gives it no storage, which
certifies the SAME dataflow without the cost advantage.

The contract certifies the strong property: the incremental result must be
BIT-IDENTICAL to a full recompute over the surviving rows (the DuckDB
oracle is exactly that full recompute) — including buckets that vanish
because every one of their rows was retracted.

No reference counterpart (the reference has no storage/retraction layer);
engine-added per the north rule's checkpoint-resumable tier maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forecaster_spark.operators.rollup import TIERS, rollup_raw


def retract_rebuild_tier(
    series: DataFrame,
    retract_ids: DataFrame,
    id_col: str = "event_id",
    tier: str = "1m",
    exact: bool = True,
    tie_break: bool = True,
    base_tier: DataFrame | None = None,
) -> DataFrame:
    """Incrementally corrected tier after retracting ``retract_ids`` rows.

    ``series``: long-format raw rows (source, ts, y, ``id_col``).
    ``retract_ids``: one column ``id_col`` — the rows to retract. Must be
    small enough to broadcast (retraction batches are, by nature).
    ``base_tier``: the EXISTING stored tier (the output of a prior
    ``rollup_raw(series, tier)`` read back from storage). This is the
    argument that makes the plan incremental at scale — untouched tier
    rows come from it via the anti-join and raw data is only scanned for
    the retraction semi-join and the affected-bucket re-aggregation. When
    None (certification/harness mode, e.g. the self-contained contract
    query), the base is recomputed from ``series`` — correct but NOT
    cheaper than a full recompute; a real deployment always passes the
    stored tier.

    Returns the same schema as ``rollup_raw(series', tier)`` where
    ``series'`` excludes the retracted rows — affected buckets recomputed,
    everything else passed through.
    """
    unit = TIERS[tier]
    retr = series.join(F.broadcast(retract_ids), id_col, "left_semi")
    affected = retr.select(
        "source", F.date_trunc(unit, F.col("ts")).alias("bucket_start")
    ).distinct()
    base = (
        base_tier
        if base_tier is not None
        else rollup_raw(series.drop(id_col), tier, exact=exact, tie_break=tie_break)
    )
    # null-SAFE bucket equality: a retracted row with NULL ts lands in the
    # NULL bucket, and plain = would never match it in the anti/semi joins —
    # the retracted contribution would silently survive in the tier
    aff_keep = affected.select(
        F.col("source").alias("_as"), F.col("bucket_start").alias("_ab")
    )
    keep = base.join(
        F.broadcast(aff_keep),
        F.col("source").eqNullSafe(F.col("_as"))
        & F.col("bucket_start").eqNullSafe(F.col("_ab")),
        "left_anti",
    )
    survivors = series.join(F.broadcast(retract_ids), id_col, "left_anti")
    aff_rows = (
        survivors.withColumn("_bk", F.date_trunc(unit, F.col("ts")))
        .join(
            F.broadcast(aff_keep),
            F.col("source").eqNullSafe(F.col("_as"))
            & F.col("_bk").eqNullSafe(F.col("_ab")),
            "left_semi",
        )
        .drop("_bk")
    )
    corrected = rollup_raw(
        aff_rows.drop(id_col), tier, exact=exact, tie_break=tie_break
    )
    return keep.unionByName(corrected)
