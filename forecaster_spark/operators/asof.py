"""As-of join and retention operators.

Spark has no native ASOF JOIN (the reference has no joins at all —
SURVEY.md §2.7); time-series engines need one constantly (enrich each left
row with the most recent right-side observation ≤ its timestamp).

``asof_join`` implements it without any join at all: union the two sides
with a side tag, run one window pass per source ordered by (ts, side), and
carry the right side's values forward (locf) onto left rows. Cost = one
shuffle on source + one sort — the same as a single window stage, versus the
naive range-join's quadratic bucket explosion. Right-side ties on ts resolve
to the latest right row ≤ ts (left rows sort after right rows at equal ts,
matching standard ASOF semantics / pandas merge_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "source",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    suffix: str = "_r",
    block_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right-side values with
    right.ts ≤ left.ts (within ``tolerance_s`` if given). Output = left
    columns + ``{value}{suffix}`` columns (+ ``{ts}{suffix}``).

    ``block_s`` bounds skew: with it, the window partitions by (source,
    ⌊ts/block_s⌋) — every sort task is capped at one time block — and the
    last right-side values of earlier blocks are carried in via a tiny
    broadcast table (the same distributed prefix-scan decomposition as
    ``fill_bucket_gaps_blocked``). Without it one giant source serializes
    into a single window task. Identical output by construction and test."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]
    lt = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("__rts"),
    )
    rt = right.select(
        on,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
        F.col(ts).cast("timestamp").alias("__rts"),
    ).select(*lt.columns)  # align column order
    u = lt.unionByName(rt)

    rvs = [f"__rv_{c}" for c in value_cols] + ["__rts"]
    if block_s is None:
        part = [on]
    else:
        u = u.withColumn(
            "_blk", F.floor(F.unix_timestamp(F.col(ts).cast("timestamp")) / block_s)
        )
        part = [on, "_blk"]
        # per-(source, block) last *non-null* right-side value per column
        # (max_by over a ts keyed only on non-null rows — a plain max_by(c, ts)
        # would take the latest row's value even when NULL, diverging from the
        # plain path's last(ignorenulls) per column), locf'd across ALL
        # observed blocks — including blocks holding only left rows, which
        # must inherit the carry too. Right ts assumed unique per source, as
        # rollup buckets are; ties would resolve arbitrarily.
        lasts = u.where(F.col("_side") == 0).groupBy(on, "_blk").agg(
            *[F.max_by(c, F.when(F.col(c).isNotNull(), F.col(ts))).alias(c) for c in rvs]
        )
        all_blocks = u.select(on, "_blk").distinct()
        wb = Window.partitionBy(on).orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
        carries = all_blocks.join(lasts, on=[on, "_blk"], how="left").select(
            on, "_blk", *[F.last(c, ignorenulls=True).over(wb).alias(f"__carry_{c}") for c in rvs]
        )
        u = u.join(F.broadcast(carries), on=[on, "_blk"], how="left")

    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u
    for c in rvs:
        run = F.last(c, ignorenulls=True).over(w)
        filled = filled.withColumn(
            c, F.coalesce(run, F.col(f"__carry_{c}")) if block_s is not None else run
        )
    out = filled.where(F.col("_side") == 1)
    if block_s is not None:
        out = out.drop("_blk", *[f"__carry_{c}" for c in rvs])
    if tolerance_s is not None:
        in_tol = (
            F.unix_timestamp(F.col(ts).cast("timestamp")) - F.unix_timestamp(F.col("__rts"))
        ) <= tolerance_s
        for c in value_cols:
            out = out.withColumn(f"__rv_{c}", F.when(in_tol, F.col(f"__rv_{c}")))
        out = out.withColumn("__rts", F.when(in_tol, F.col("__rts")))
    renames = [F.col(c) for c in left.columns]
    renames += [F.col(f"__rv_{c}").alias(f"{c}{suffix}") for c in value_cols]
    renames += [F.col("__rts").alias(f"{ts}{suffix}")]
    return out.select(*renames)


def apply_retention(
    tier: DataFrame, keep_buckets: int, step_seconds: int, bucket: str = "bucket_start"
) -> DataFrame:
    """Retention window per tier: keep only the newest ``keep_buckets``
    buckets relative to the table's global max bucket (e.g. 1m tier keeps
    7 days of minutes, 1h keeps 90 days, 1d keeps forever).

    The horizon is resolved to a driver-side scalar first (one tiny agg job —
    a max with map-side partials, no shuffle of the tier rows), then applied
    as a LITERAL filter. An unpartitioned ``max().over(Window.partitionBy())``
    would funnel the whole tier through one window task — a 1m tier at
    10^12-row scale is itself huge — and a non-literal predicate can't prune
    date partitions. The literal comparison pushes down to the parquet scan
    and prunes whole date partitions on partitioned tiers."""
    horizon = tier.agg(F.max(bucket).alias("h")).collect()[0]["h"]
    if horizon is None:  # empty tier
        return tier
    cutoff = F.lit(horizon) - F.expr(f"INTERVAL {keep_buckets * step_seconds} SECONDS")
    return tier.where(F.col(bucket) > cutoff)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "ivl_start",
    end: str = "ivl_end",
    on=("source",),
    bucket: str = "hour",
) -> DataFrame:
    """Range (interval) join: every event row paired with every interval row
    of the same ``on`` keys satisfying ``start <= ts < end`` (half-open, the
    tier-bucket convention).

    Spark's native plan for a non-equi join is BroadcastNestedLoopJoin —
    fine only while one side fits in executor memory, a cliff at
    10^12-event scale. This instead grids time: each interval explodes into
    the ``bucket``-sized cells it overlaps (``sequence`` of truncated
    timestamps; half-open end via ``end − 1µs``), each event truncates to
    its cell, and the join is a plain equi-join on (on…, cell) with the
    exact range predicate applied afterward. One shuffle, fanout =
    interval-length / bucket (pick ``bucket`` at tier granularity), AQE
    handles hot cells; no broadcast required on either side.

    Intervals with ``end <= start`` are dropped. Output: event columns +
    interval columns (minus the helper cell)."""
    step = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}[bucket]
    iv = (
        intervals.where(F.col(end) > F.col(start))
        .withColumn(
            "_cell",
            F.explode(
                F.expr(
                    f"sequence(date_trunc('{bucket}', {start}),"
                    f" date_trunc('{bucket}', {end} - interval 1 microsecond),"
                    f" interval {step})"
                )
            ),
        )
    )
    ev = events.withColumn("_cell", F.date_trunc(bucket, F.col(ts)))
    keys = [*on, "_cell"]
    return (
        ev.join(iv, keys)
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_cell")
    )
