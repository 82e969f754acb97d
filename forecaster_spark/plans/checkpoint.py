"""Checkpoint-resumable stage execution with per-partition lineage and a
stage metrics table (north rule; the reference has no persistence at all —
SURVEY.md §4).

Each stage writes its output as Parquet, then a JSON manifest *after* the
write completes (write-then-commit: a crash mid-write leaves no manifest, so
the stage re-runs; a present manifest marks the output durable). On re-run,
committed stages are skipped and served from disk — the resume test kills a
pipeline between stages and asserts identical final output plus
``skipped=True`` lineage rows.

Lineage rows are computed from the *written files* (read-back validates the
write): one row per output file-partition with row count and an
order-independent content checksum (wrapping sum of xxhash64 over all
columns), so any divergence between runs or cluster sizes is attributable to
a specific partition.

Cost: exactly two Spark jobs per computed stage — the output write and one
small checksum scan; lineage rows are collected (they are one row per file
partition — tiny by construction) and appended driver-side, metrics go to a
JSONL table. Skipped stages cost one checksum scan only when
``verify_on_resume`` is set, else zero jobs.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_forecaster_manifest.json"


def _partition_checksums(df: DataFrame) -> list[dict]:
    # ANSI-safe wrapping sum of xxhash64: the contract session is owned by
    # the driver and may run with spark.sql.ansi.enabled=true (Spark 4
    # default), where a plain F.sum over longs THROWS on overflow instead of
    # wrapping. Sum the two unsigned 32-bit limbs separately (each limb
    # ≤ 2^32-1, so the per-partition sum stays under 2^63 for any partition
    # below 2^31 rows — a Parquet file partition is bounded by
    # maxPartitionBytes, orders of magnitude smaller) and recombine mod 2^64
    # driver-side with exact Python ints. The recombined value is
    # bit-identical to the old non-ANSI wrapping long sum, so existing
    # manifests remain comparable.
    cols = [F.col(c) for c in df.columns]
    h = F.xxhash64(*cols)
    rows = (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            F.shiftrightunsigned(h, 32).alias("hi"),
            h.bitwiseAND(F.lit(0xFFFFFFFF)).alias("lo"),
        )
        .groupBy("partition_id")
        .agg(F.count("*").alias("rows"), F.sum("hi").alias("s_hi"), F.sum("lo").alias("s_lo"))
        .collect()
    )
    out = []
    for r in rows:
        csum = (((r["s_hi"] or 0) << 32) + (r["s_lo"] or 0)) % (1 << 64)
        if csum >= 1 << 63:
            csum -= 1 << 64
        out.append({"partition_id": r["partition_id"], "rows": r["rows"], "checksum": csum})
    return out


class StageRunner:
    """Runs named stages idempotently under a root directory.

    Layout: ``{root}/{stage}/`` parquet + manifest, ``{root}/lineage.jsonl``
    and ``{root}/metrics.jsonl`` append-only tables (JSONL: driver-side
    appends are atomic-enough per line and cost no Spark job; read back with
    ``spark.read.json`` or the ``lineage()``/``metrics()`` helpers).
    """

    def __init__(self, spark: SparkSession, root: str, verify_on_resume: bool = False):
        self.spark = spark
        self.root = root.rstrip("/")
        self.verify_on_resume = verify_on_resume
        os.makedirs(self.root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(f"{self._path(stage)}/{MANIFEST}")

    def manifest(self, stage: str) -> dict:
        """Committed stage's manifest (rows/checksum/n_partitions) — row
        counts without a Spark job."""
        with open(f"{self._path(stage)}/{MANIFEST}") as f:
            return json.load(f)

    def stage(self, name: str, build_fn, partition_cols: list[str] | None = None) -> DataFrame:
        """Return the stage output, computing+committing it if needed.

        ``build_fn() -> DataFrame`` is only invoked when the stage is not
        committed."""
        path = self._path(name)
        t0 = time.time()
        if self.is_committed(name):
            out = self.spark.read.parquet(path)
            if self.verify_on_resume:
                parts = _partition_checksums(out)
                self._append_lineage(name, parts, skipped=True)
                self._append_metrics(name, parts, skipped=True, wall_ms=0.0)
            else:
                with open(f"{path}/{MANIFEST}") as f:
                    man = json.load(f)
                self._append_metrics_row(
                    {
                        "stage": name,
                        "skipped": True,
                        "rows": man["rows"],
                        "checksum": man["checksum"],
                        "n_partitions": man["n_partitions"],
                        "wall_ms": 0.0,
                        "recorded_at": time.time(),
                    }
                )
            return out
        df = build_fn()
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        out = self.spark.read.parquet(path)
        parts = _partition_checksums(out)
        wall_ms = (time.time() - t0) * 1000.0
        self._append_lineage(name, parts, skipped=False)
        totals = self._append_metrics(name, parts, skipped=False, wall_ms=wall_ms)
        with open(f"{path}/{MANIFEST}", "w") as f:
            json.dump({"stage": name, "partition_cols": partition_cols or [], **totals}, f)
        return out

    # -- lineage / metrics tables ------------------------------------------
    def _append_lineage(self, name: str, parts: list[dict], skipped: bool) -> None:
        with open(f"{self.root}/lineage.jsonl", "a") as f:
            for p in parts:
                f.write(json.dumps({"stage": name, "skipped": skipped, **p}) + "\n")

    def _append_metrics(self, name: str, parts: list[dict], skipped: bool, wall_ms: float) -> dict:
        # two's-complement wrap keeps the total stable vs Spark's long sum
        csum = sum(p["checksum"] for p in parts) % (1 << 64)
        if csum >= 1 << 63:
            csum -= 1 << 64
        totals = {
            "rows": int(sum(p["rows"] for p in parts)),
            "checksum": int(csum),
            "n_partitions": len(parts),
        }
        self._append_metrics_row(
            {
                "stage": name,
                "skipped": skipped,
                **totals,
                "wall_ms": wall_ms,
                "recorded_at": time.time(),
            }
        )
        return totals

    def _append_metrics_row(self, row: dict) -> None:
        with open(f"{self.root}/metrics.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")

    def lineage(self) -> DataFrame:
        return self.spark.read.json(f"{self.root}/lineage.jsonl")

    def metrics(self) -> DataFrame:
        return self.spark.read.json(f"{self.root}/metrics.jsonl")
