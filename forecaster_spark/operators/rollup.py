"""Tiered continuous aggregates (1m → 1h → 1d) over per-source series.

The reference has no aggregation tiers (SURVEY.md §2.4 — its aggregates are
QoF metrics and scaler fits); the north rule adds TimescaleDB-style
continuous aggregates with retention tiers. Everything here is native
Catalyst expressions — one shuffle per tier, and the 1h/1d tiers re-aggregate
the *partials* of the tier below (sum-of-sums, min-of-mins, min_by/max_by on
bucket_start for first/last) instead of rescanning raw data, which is the
scale-critical property: at 10^12 rows the raw scan happens exactly once.

Partial-merge algebra (cascade == direct-from-raw is asserted in tests):
  cnt   = Σ cnt          sum_y = Σ sum_y
  min_y = min min_y      max_y = max max_y
  first_y = min_by(first_y, bucket_start)   (value of earliest sub-bucket)
  last_y  = max_by(last_y,  bucket_start)
  mean_y  = sum_y / cnt  (derived, never averaged-of-averages)

first/last at the raw tier are the min/max of ``struct(ts, y)`` — i.e.
ties on ts break deterministically by value — so results are reproducible
across partitionings and match the DuckDB oracle exactly. struct min/max is
a plain aggregate: map-side partial aggregation still applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tier name → date_trunc unit
TIERS = {"1m": "minute", "1h": "hour", "1d": "day"}

ROLLUP_COLS = ["cnt", "sum_y", "min_y", "max_y", "mean_y", "first_y", "last_y"]


MICRO = 1_000_000  # micro-unit quantum for exact (order-independent) sums


def rollup_raw(
    series: DataFrame,
    tier: str = "1m",
    y: str = "y",
    ts: str = "ts",
    exact: bool = False,
    tie_break: bool = True,
    checksum_col: str | None = None,
    keep_ts: bool = False,
) -> DataFrame:
    """Roll raw points into one tier:
    groupBy(source, date_trunc(unit, ts)). first/last are min_by/max_by on
    the raw timestamp — no window, no sort; a single hash-aggregate with
    map-side partial aggregation.

    ``exact=True`` sums in integer micro-units (round(y·1e6) as long) so the
    result is bit-identical regardless of partitioning / add order — floating
    sums are order-dependent at the ulp level, which matters for cross-engine
    verification and for reproducible lineage checksums at cluster scale. The
    exact output carries ``sum_micro`` for further cascading.

    ``checksum_col`` adds a wrapping-long content checksum per bucket
    (sum of the per-row checksums — order-independent), carried up the tier
    cascade: the per-doc token-array invariant (BASELINE.json input_hint)
    becomes verifiable at every retention tier.

    ``keep_ts`` carries ``first_ts``/``last_ts`` per bucket — required for
    *same-grain* incremental merging (:func:`merge_rollup_increment`): when a
    later batch adds rows to an existing bucket, first/last can only be
    merged by comparing the actual observation timestamps.
    """
    unit = TIERS[tier]
    g = series.groupBy("source", F.date_trunc(unit, F.col(ts)).alias("bucket_start"))
    chk = [F.sum(checksum_col).alias("chk")] if checksum_col else []
    if keep_ts:
        chk = [F.min(ts).alias("first_ts"), F.max(ts).alias("last_ts"), *chk]
    if tie_break:
        # deterministic under duplicate ts (lexicographic (ts, y)); struct
        # min/max forces SortAggregate — use only when ts may collide
        first = F.min(F.struct(F.col(ts).alias("t"), F.col(y).alias("v"))).getField("v").alias("first_y")
        last = F.max(F.struct(F.col(ts).alias("t"), F.col(y).alias("v"))).getField("v").alias("last_y")
    else:
        # fast path: primitive agg buffers → HashAggregate with map-side
        # combine; correct when ts is unique within (source, bucket), as in
        # the token corpus (one row per seq)
        first = F.min_by(y, ts).alias("first_y")
        last = F.max_by(y, ts).alias("last_y")
    if exact:
        sm = F.sum(F.round(F.col(y) * MICRO).cast("long"))
        return g.agg(
            F.count(y).alias("cnt"),
            (sm / MICRO).alias("sum_y"),
            F.min(y).alias("min_y"),
            F.max(y).alias("max_y"),
            (sm / MICRO / F.count(y)).alias("mean_y"),
            first,
            last,
            sm.alias("sum_micro"),
            *chk,
        )
    return g.agg(
        F.count(y).alias("cnt"),
        F.sum(y).alias("sum_y"),
        F.min(y).alias("min_y"),
        F.max(y).alias("max_y"),
        (F.sum(y) / F.count(y)).alias("mean_y"),
        first,
        last,
        *chk,
    )


def rollup_cascade(lower: DataFrame, tier: str, exact: bool = False) -> DataFrame:
    """Next tier from the partials of the tier below (no raw rescan).
    ``first_ts``/``last_ts`` (from ``keep_ts=True``) propagate as min/max —
    and then give exact first/last merging too — so
    :func:`merge_rollup_increment` works at every tier, not just the raw
    one."""
    unit = TIERS[tier]
    g = lower.groupBy("source", F.date_trunc(unit, "bucket_start").alias("bucket_start"))
    if "first_ts" in lower.columns:
        first = F.min_by("first_y", "first_ts").alias("first_y")
        last = F.max_by("last_y", "last_ts").alias("last_y")
    else:
        first = F.min_by("first_y", "bucket_start").alias("first_y")
        last = F.max_by("last_y", "bucket_start").alias("last_y")
    chk = [F.sum("chk").alias("chk")] if "chk" in lower.columns else []
    if "first_ts" in lower.columns:
        chk = [F.min("first_ts").alias("first_ts"), F.max("last_ts").alias("last_ts"), *chk]
    if exact:
        sm = F.sum("sum_micro")
        return g.agg(
            F.sum("cnt").alias("cnt"),
            (sm / MICRO).alias("sum_y"),
            F.min("min_y").alias("min_y"),
            F.max("max_y").alias("max_y"),
            (sm / MICRO / F.sum("cnt")).alias("mean_y"),
            first,
            last,
            sm.alias("sum_micro"),
            *chk,
        )
    return g.agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_y").alias("sum_y"),
        F.min("min_y").alias("min_y"),
        F.max("max_y").alias("max_y"),
        (F.sum("sum_y") / F.sum("cnt")).alias("mean_y"),
        first,
        last,
        *chk,
    )


def merge_rollup_increment(existing: DataFrame, delta: DataFrame, exact: bool = False) -> DataFrame:
    """Incremental continuous-aggregate refresh (TimescaleDB-style): merge a
    new batch's tier partials into an existing tier at the SAME grain.
    Buckets touched by both sides merge with the full algebra — cnt/sums
    add, min/max fold, first/last resolve by the carried ``first_ts`` /
    ``last_ts`` (both inputs must come from ``rollup_raw(..., keep_ts=True)``)
    — untouched buckets pass through. With ``exact=True`` (integer micro-unit
    sums) ``merged ≡ rollup_raw(all raw rows)`` bit-exactly, as asserted in
    tests; in float mode sum_y/mean_y agree only to add-order ulp drift. The
    raw history is never rescanned either way.

    Scale: cost is one union + one hash-agg keyed (source, bucket) — i.e.
    proportional to |existing tier| + |delta|, independent of raw history
    size. With date-partitioned tiers, only partitions overlapping the delta
    need rewriting (merge-on-read engines push this further).
    """
    for c in ("first_ts", "last_ts"):
        if c not in existing.columns or c not in delta.columns:
            raise ValueError("merge requires tiers built with keep_ts=True")
    u = existing.unionByName(delta)
    g = u.groupBy("source", "bucket_start")
    first = F.min_by("first_y", "first_ts").alias("first_y")
    last = F.max_by("last_y", "last_ts").alias("last_y")
    span = [F.min("first_ts").alias("first_ts"), F.max("last_ts").alias("last_ts")]
    chk = [F.sum("chk").alias("chk")] if "chk" in u.columns else []
    if exact:
        sm = F.sum("sum_micro")
        return g.agg(
            F.sum("cnt").alias("cnt"),
            (sm / MICRO).alias("sum_y"),
            F.min("min_y").alias("min_y"),
            F.max("max_y").alias("max_y"),
            (sm / MICRO / F.sum("cnt")).alias("mean_y"),
            first,
            last,
            sm.alias("sum_micro"),
            *span,
            *chk,
        )
    return g.agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_y").alias("sum_y"),
        F.min("min_y").alias("min_y"),
        F.max("max_y").alias("max_y"),
        (F.sum("sum_y") / F.sum("cnt")).alias("mean_y"),
        first,
        last,
        *span,
        *chk,
    )


def rollup_tiers(
    series: DataFrame, y: str = "y", ts: str = "ts", exact: bool = False, tie_break: bool = True
) -> dict[str, DataFrame]:
    """All three retention tiers; 1m from raw, 1h/1d cascaded from partials."""
    t1m = rollup_raw(series, "1m", y, ts, exact=exact, tie_break=tie_break)
    t1h = rollup_cascade(t1m, "1h", exact=exact)
    t1d = rollup_cascade(t1h, "1d", exact=exact)
    return {"1m": t1m, "1h": t1h, "1d": t1d}
