"""The flagship staged pipeline: corpus → seriesify → 1m → 1h → 1d tiers →
gap-filled tier → Gorilla-packed blocks per tier, every stage
checkpoint-resumable with lineage + metrics (north rule end-to-end).

Shuffle budget (the scale argument):
  - seriesify: narrow (projection only) — no shuffle;
  - 1m rollup: ONE shuffle of partial aggregates (map-side combine first);
    optional salting for pathological bucket floods;
  - 1h / 1d: shuffles of *tier partials* (≥60× / ≥1440× smaller than raw);
  - gap-fill: window over (source) — one shuffle of the 1m tier;
  - Gorilla pack: groupBy (source, block) on tier rows — bounded groups.
Raw data is scanned exactly once regardless of tier count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from forecaster_spark.functions.gorilla import pack_rollup_gorilla
from forecaster_spark.operators.gapfill import fill_bucket_gaps
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
) -> dict:
    """Run (or resume) the full pipeline; returns {tier: rolled_point_count}
    plus lineage/metrics handles.

    ``carry_checksum`` propagates the per-doc token-array checksum into a
    per-bucket ``chk`` column at every tier (the bit-exactness invariant —
    this is what forces the token column scan, i.e. the dominant I/O+CPU at
    10^12-sequence scale; disable for signal-only reruns)."""
    runner = StageRunner(spark, out_root)

    chk = "tok_checksum" if carry_checksum else None
    series = seriesify(corpus, cadence_s=cadence_s)

    if n_salt:
        t1m_fn = lambda: salted_rollup_raw(  # noqa: E731
            series, "1m", n_salt=n_salt, exact=exact, checksum_col=chk
        )
    else:
        t1m_fn = lambda: rollup_raw(  # noqa: E731
            series, "1m", exact=exact, tie_break=False, checksum_col=chk
        )

    t1m = runner.stage("rollup_1m", t1m_fn)
    t1h = runner.stage("rollup_1h", lambda: rollup_cascade(t1m, "1h", exact=exact))
    t1d = runner.stage("rollup_1d", lambda: rollup_cascade(t1h, "1d", exact=exact))

    tiers = {"1m": t1m, "1h": t1h, "1d": t1d}

    runner.stage(
        "gapfill_1m",
        lambda: fill_bucket_gaps(t1m, TIER_STEP_S["1m"], ["mean_y"], method=gapfill_method),
    )
    for tier_name, tier_df in tiers.items():
        runner.stage(
            f"gorilla_{tier_name}",
            lambda df=tier_df: pack_rollup_gorilla(df, pack_value),
        )

    counts = {name: df.count() for name, df in tiers.items()}
    counts["total_rolled_points"] = sum(counts.values())
    return {"counts": counts, "runner": runner}
