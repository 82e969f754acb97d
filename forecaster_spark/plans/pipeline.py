"""The flagship staged pipeline: corpus → seriesify → 1m → 1h → 1d tiers →
gap-filled tier → Gorilla-packed blocks per tier, every stage
checkpoint-resumable with lineage + metrics (north rule end-to-end).

Shuffle budget (the scale argument):
  - seriesify: narrow (projection only) — no shuffle;
  - 1m rollup: ONE shuffle of partial aggregates (map-side combine first);
    optional salting for pathological bucket floods;
  - 1h / 1d: shuffles of *tier partials* (≥60× / ≥1440× smaller than raw);
  - gap-fill: blocked two-phase LOCF — every task bounded by the block size,
    a hot source spanning years cannot serialize the stage;
  - Gorilla pack: ONE stage for all tiers, groupBy (source, block) on tier
    rows — bounded groups, single commit.
Raw data is scanned exactly once regardless of tier count; tier row counts
come from stage manifests (no extra jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from forecaster_spark.functions.gorilla import pack_tiers_gorilla
from forecaster_spark.operators.gapfill import fill_bucket_gaps_blocked
from forecaster_spark.operators.rollup import rollup_cascade, rollup_raw
from forecaster_spark.operators.seriesify import seriesify
from forecaster_spark.plans.checkpoint import StageRunner
from forecaster_spark.plans.skew import salted_rollup_raw

TIER_STEP_S = {"1m": 60, "1h": 3600, "1d": 86400}


def run_rollup_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    out_root: str,
    exact: bool = True,
    n_salt: int | None = None,
    gapfill_method: str = "locf",
    pack_value: str = "mean_y",
    cadence_s: int = 7,
    carry_checksum: bool = True,
    checksum: str = "xxhash",
    partition_tiers: bool = False,
) -> dict:
    """Run (or resume) the full pipeline; returns {tier: rolled_point_count}
    plus lineage/metrics handles.

    ``carry_checksum`` propagates the per-doc token-array checksum into a
    per-bucket ``chk`` column at every tier (the bit-exactness invariant —
    this is what forces the token column scan, i.e. the dominant I/O+CPU at
    10^12-sequence scale; disable for signal-only reruns).

    ``checksum`` picks the per-doc implementation (see
    :func:`forecaster_spark.operators.seriesify.seriesify`): "xxhash"
    (native, scan-speed) or "poly" (the reference-exact polynomial via the
    Arrow kernel — the faithful token-array invariant, ~3× the scan cost)."""
    runner = StageRunner(spark, out_root)

    chk = "tok_checksum" if carry_checksum else None
    series = seriesify(corpus, cadence_s=cadence_s, checksum=checksum)

    if n_salt:
        t1m_fn = lambda: salted_rollup_raw(  # noqa: E731
            series, "1m", n_salt=n_salt, exact=exact, checksum_col=chk
        )
    else:
        t1m_fn = lambda: rollup_raw(  # noqa: E731
            series, "1m", exact=exact, tie_break=False, checksum_col=chk
        )

    if partition_tiers:
        # hive-partition each tier by bucket date → time-range reads and
        # retention drops prune whole partitions (PartitionFilters in the
        # scan); off by default at CI scale where file-count overhead wins
        from pyspark.sql import functions as _F

        def _dated(fn):
            return lambda: fn().withColumn("bucket_date", _F.to_date("bucket_start"))

        pcols = ["bucket_date"]
        t1m = runner.stage("rollup_1m", _dated(t1m_fn), partition_cols=pcols)
        t1h = runner.stage(
            "rollup_1h", _dated(lambda: rollup_cascade(t1m.drop("bucket_date"), "1h", exact=exact)), partition_cols=pcols
        )
        t1d = runner.stage(
            "rollup_1d", _dated(lambda: rollup_cascade(t1h.drop("bucket_date"), "1d", exact=exact)), partition_cols=pcols
        )
        t1m, t1h, t1d = (df.drop("bucket_date") for df in (t1m, t1h, t1d))
    else:
        t1m = runner.stage("rollup_1m", t1m_fn)
        t1h = runner.stage("rollup_1h", lambda: rollup_cascade(t1m, "1h", exact=exact))
        t1d = runner.stage("rollup_1d", lambda: rollup_cascade(t1h, "1d", exact=exact))

    tiers = {"1m": t1m, "1h": t1h, "1d": t1d}

    if gapfill_method == "locf":
        gap_fn = lambda: fill_bucket_gaps_blocked(  # noqa: E731
            t1m, TIER_STEP_S["1m"], ["mean_y"], method="locf"
        )
    else:  # interp has no blocked variant (needs a forward pass too)
        from forecaster_spark.operators.gapfill import fill_bucket_gaps

        gap_fn = lambda: fill_bucket_gaps(  # noqa: E731
            t1m, TIER_STEP_S["1m"], ["mean_y"], method=gapfill_method
        )
    runner.stage("gapfill_1m", gap_fn)
    runner.stage("gorilla", lambda: pack_tiers_gorilla(tiers, pack_value))

    # tier row counts come from the stage manifests (written at commit) —
    # no extra count() jobs on the checkpointed outputs
    counts = {name: runner.manifest(f"rollup_{name}")["rows"] for name in tiers}
    counts["total_rolled_points"] = sum(counts.values())
    return {"counts": counts, "runner": runner}
