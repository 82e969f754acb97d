"""Training-data loader: chronological train/test split + fixed-size batches.

Reproduces the reference's ``Data_Loader`` (Util/data_loader.py:5-19) and its
``DataLoader(batch_size, shuffle=False)`` consumption pattern
(Examples/Example_Covid19.py:95-98) as a *distributed* operator — the last
SURVEY §2 component (C10). The reference builds the lagged matrix over the
WHOLE series, splits it 80/20 chronologically (sklearn
``train_test_split(test_size=0.2, shuffle=False)``: the test set is the
LAST ``ceil(0.2·n)`` rows, train the first ``n − n_test``), then batches
each split contiguously in time order. Torch tensors are replaced by
float64 array columns (``x`` row-major per batch, ``y``) — the only thing
torch added was device placement, out of scope per SURVEY §2.6.

Split rule, integer-exact: ``n_test = ceil(n/5) = (n + 4) div 5`` — sklearn
computes ``ceil(test_size · n)``; for ``test_size = 0.2`` the float product
never crosses an integer boundary (fl(0.2)·n errs by < ½ ulp for any
realistic n), so the pure-integer form is the same rule with no float in
the plan.

Certification: each batch carries an order-sensitive polynomial checksum
``Σ tok_j · 31^(L−1−j) mod 2^64`` over the flattened, milli-quantized
(lag₃, lag₂, lag₁, y) row tokens — the same fold as the north-rule token
invariant (``seriesify.token_checksum_fast``), mirrored in HUGEINT SQL by
the DuckDB oracle, so a checksum match certifies bit-exact batch CONTENT
and ORDER, not just row counts.

Plan shape / 100-TB notes: one shuffle for the per-source window (lags +
row_number), one for the (source, split, batch_id) groupBy; every group is
bounded by ``batch_size`` rows so ``collect_list`` state is O(batch_size)
regardless of corpus size. Skew caveat as for LOCF: one giant source
serializes its window into one task — feed rolled tiers (bounded
rows/source) at hot-source scale. No Python in the row path; the checksum
kernel is one Arrow batch per output row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from forecaster_spark.operators.seriesify import token_checksum_fast

_M31 = 1 << 31


def _batched(
    df: DataFrame,
    value: str,
    p: int,
    batch_size: int,
    partition: str,
    order: tuple[str, ...],
    quantum: int,
) -> DataFrame:
    """Shared stage: lagged matrix over the whole series (W1 first-value
    pad), sklearn-rule chronological split, contiguous batch assignment,
    one collected row-struct list per batch (sorted by in-batch position —
    deterministic, bounded by ``batch_size``)."""
    w = Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])
    # milli-quantized token per row: floor (never round — cross-engine
    # tie-breaks) then double-mod into [0, 2^31) so the polynomial fold's
    # per-token bound holds for any input sign/scale
    vq = F.floor(F.col(value) * quantum).cast("long")
    tok = ((vq % _M31) + _M31) % _M31
    b = df.withColumn("_tok", tok)
    first = F.first("_tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
    firstv = F.first(value).over(w.rowsBetween(Window.unboundedPreceding, 0))
    for k in range(p, 0, -1):  # farthest-first: reference lag column order
        b = b.withColumn(f"_tl{k}", F.coalesce(F.lag("_tok", k).over(w), first))
        b = b.withColumn(f"_xl{k}", F.coalesce(F.lag(value, k).over(w), firstv))
    b = b.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(partition))
    )
    n_test = F.expr("(_n + 4) div 5")
    b = b.withColumn(
        "split",
        F.when(F.col("_rn") <= F.col("_n") - n_test, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )
    # in-split position derived arithmetically from the whole-series row
    # number (train is the contiguous head, test the contiguous tail), so
    # no second window pass/sort is needed — one shuffle for the series
    # window, one for the batch groupBy
    pos = F.when(
        F.col("split") == "train", F.col("_rn") - 1
    ).otherwise(F.col("_rn") - 1 - (F.col("_n") - n_test))
    b = (
        b.withColumn("_pos", pos)
        .withColumn("batch_id", F.expr(f"_pos div {batch_size}"))
        .withColumn("_pib", F.col("_pos") % batch_size)
    )
    row_toks = F.array(*[F.col(f"_tl{k}") for k in range(p, 0, -1)], F.col("_tok"))
    row_x = F.array(*[F.col(f"_xl{k}").cast("double") for k in range(p, 0, -1)])
    return (
        b.withColumn("_toks", row_toks)
        .withColumn("_xrow", row_x)
        .groupBy(partition, "split", "batch_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_pib"),
                        F.col("_toks"),
                        F.col("_xrow"),
                        F.col(value).cast("double").alias("_y"),
                    )
                )
            ).alias("_rows"),
        )
    )


def data_loader_manifest(
    df: DataFrame,
    value: str = "y",
    p: int = 3,
    batch_size: int = 64,
    partition: str = "source",
    order: tuple[str, ...] = ("ts", "event_id"),
    quantum: int = 1000,
) -> DataFrame:
    """Batch manifest: (source, split, batch_id, n_rows, xy_checksum).

    ``xy_checksum`` folds the flattened (lag_p..lag_1, y) milli-quantized
    tokens of the batch in row order through the reference polynomial
    (``token_checksum_fast``) — the driver-gate face of the loader, mirrored
    exactly by :func:`forecaster_spark.functions.xhash_sql.data_loader_sql`.
    """
    g = _batched(df, value, p, batch_size, partition, order, quantum)
    flat = F.flatten(F.col("_rows._toks"))
    return g.select(
        F.col(partition).alias("source"),
        "split",
        "batch_id",
        "n_rows",
        token_checksum_fast(flat).alias("xy_checksum"),
    ).orderBy("source", "split", "batch_id")


def training_batches(
    df: DataFrame,
    value: str = "y",
    p: int = 3,
    batch_size: int = 64,
    partition: str = "source",
    order: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Materialized batches — the tensor step, torch-free: one row per
    (source, split, batch_id) with ``x`` as a row-major list of float64 lag
    vectors (shape n_rows × p) and ``y`` the float64 labels, both in time
    order. A torch consumer maps each row to
    ``torch.tensor(x), torch.tensor(y)`` 1:1; shapes/content are pinned
    against a NumPy replay of the reference split in pytest."""
    g = _batched(df, value, p, batch_size, partition, order, quantum=1000)
    return g.select(
        F.col(partition).alias("source"),
        "split",
        "batch_id",
        "n_rows",
        F.col("_rows._xrow").alias("x"),
        F.col("_rows._y").alias("y"),
    )
