"""Data-layout and table-maintenance operators — the Iceberg-side half of
a 100-TB rollup engine.

The north rule's engine stores rolled points in Iceberg-style tables; at
10^12-sequence scale, how rows are *laid out* inside files decides whether
a query scans 100 TB or 100 GB. Three operators cover the maintenance
loop every large table needs (the reference is a single-node modeling
library and has none of this — engine-added, like the dedup/ANN layer):

- :func:`zorder_key`: Morton (Z-order) bit-interleaving of two bounded
  integer dimensions. Sorting/clustering by ``zkey`` before a file write
  gives *both* dimensions locality, so per-file zone maps (min/max) prune
  2-D predicates (``source × time``, ``user × time``) instead of only the
  leading sort key — the same trick Delta/Iceberg ``OPTIMIZE ZORDER BY``
  applies. Pure integer bit arithmetic: exact on every engine.
- :func:`zonemap_blocks`: the pruning statistics themselves — per
  zkey-block min/max/count of each dimension, i.e. what a manifest file
  would carry. Demonstrates (and lets tests *assert*) the locality: under
  a Z-order layout both dims have tight per-block ranges.
- :func:`compaction_plan`: deterministic small-file compaction planning —
  assign ordered per-partition row batches to target-size output files by
  running-total division. The plan is a pure function of the partition
  stats (no row data moves through the planner), so a 100-TB compaction
  job plans on kilobytes of metadata.

All three are single-shuffle-or-less window/agg expressions (no Python),
exact BIGINT arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    dim_a,
    dim_b,
    bits: int = 12,
    out: str = "zkey",
) -> DataFrame:
    """Morton-interleave two non-negative integer dimension expressions
    (each must fit in ``bits`` bits — callers bucket/mod first) into a
    single clustering key: dim_a occupies the even bit positions, dim_b
    the odd ones. ``2·bits`` shift/mask terms, all inside whole-stage
    codegen; no shuffle (row-local).

    Writing files ordered by ``zkey`` is the scale story: a range of
    zkeys bounds BOTH dimensions (each zkey block is an axis-aligned
    rectangle in (a, b) space), so file-level min/max stats prune
    two-sided predicates that a lexicographic (a, b) sort can only prune
    on ``a``."""
    if not (1 <= bits <= 31):
        raise ValueError("bits must be in [1, 31] (2*bits fits a long)")
    a = dim_a.cast("long") if not isinstance(dim_a, str) else F.col(dim_a).cast("long")
    b = dim_b.cast("long") if not isinstance(dim_b, str) else F.col(dim_b).cast("long")
    key = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i))
        key = key.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1))
    return df.withColumn(out, key)


def zorder_sql_expr(dim_a: str, dim_b: str, bits: int = 12) -> str:
    """The equivalent portable-SQL Morton key (DuckDB oracle side) —
    arithmetic shifts written as ``//``/``%``/``*`` so no engine-specific
    bit operators are needed. Same exact integers as :func:`zorder_key`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({dim_a}) // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({dim_b}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zonemap_blocks(
    df: DataFrame,
    dims: list[str],
    zkey: str = "zkey",
    block: int = 4096,
) -> DataFrame:
    """Zone-map (manifest) statistics per zkey block: for each block of
    ``block`` consecutive zkey values, the row count and min/max of every
    listed dimension — exactly the per-file stats an Iceberg manifest
    carries for scan pruning. One map-side-combinable hash aggregate over
    ~|keyspace|/block cells.

    Output: (zblock, n, min_<dim>, max_<dim>...)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return (
        df.groupBy(F.expr(f"{zkey} div {int(block)}").alias("zblock"))
        .agg(*aggs)
    )


def compaction_plan(
    df: DataFrame,
    partition: str = "source",
    order_col: str = "day",
    rows_col: str = "n_rows",
    target_rows: int = 100_000,
    out: str = "file_bin",
) -> DataFrame:
    """Assign each (partition, order_col) batch of ``rows_col`` rows to an
    output file bin of ~``target_rows`` rows: ``bin = (running total of
    rows BEFORE this batch) div target``. Deterministic, order-stable, and
    a pure function of the metadata table — the planner never touches row
    data, so planning a 10^12-row compaction costs one window over the
    partition-stats table (thousands of rows, not trillions).

    This is the "roll consecutive day-batches into ~target-size files"
    policy (Iceberg ``rewrite_data_files`` binpack analogue restricted to
    in-order packing, which preserves the sort-order clustering above).
    A batch larger than ``target_rows`` gets its own bin(s) boundary —
    running-total division never splits a batch (file writers handle
    oversize batches by rolling over, outside the planner's contract).

    Output: input columns + ``out`` (0-based bin index per partition)."""
    w = (
        Window.partitionBy(partition)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(rows_col).over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("_before", before)
        .withColumn(out, F.expr(f"_before div {int(target_rows)}"))
        .drop("_before")
    )
