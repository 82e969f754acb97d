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
from pyspark.sql import DataFrame, Window
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


def temperature_mixture(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Temperature-weighted source mixing (the pretraining corpus-mixing
    primitive): resample so group g's effective share is ∝ n_g^alpha,
    flattening head sources toward uniform. The keep rate per group is
    r_g = (n_min / n_g)^(1-alpha), so the smallest group keeps everything
    and a group 4× larger keeps sqrt(1/4) = 50% at alpha = 0.5.

    Engine-added operator (the reference models one series at a time —
    forecaster.py:33-34 — and has no corpus-sampling machinery).

    Cross-engine exactness: alpha is fixed at 0.5 so the rate is a single
    correctly-rounded sqrt of a correctly-rounded double division — both
    IEEE-754-identical in Spark and DuckDB — scaled to integer ppm with
    one multiply + floor (never ``pow``, never ``round``; CLAUDE.md).
    The keep decision is the shared splitmix64 ppm bucket of the row id
    (order/partitioning-invariant, replayed bit-for-bit by the oracle).

    Scale shape: one corpus scan computes the per-group counts (map-side
    partials, group cardinality ~ #sources), the tiny rate table is
    broadcast back, and the keep test is row-local — no corpus shuffle.

    Output: input columns + ``n_docs`` (group size), ``rate_ppm``
    (0..1e6), ``bucket`` (0..999999), ``kept`` (boolean).
    """
    if alpha != 0.5:
        raise ValueError("only alpha=0.5 (sqrt temperature) is certified")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        group_col,
        "n_docs",
        F.floor(
            F.lit(1_000_000.0)
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double"))
        ).alias("rate_ppm"),
    )
    mult = np.uint64(2 * seed + 1)

    @F.pandas_udf(T.LongType())
    def bucket_of(ids: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        b = xhash.splitmix64(u * mult) % np.uint64(BUCKETS)
        return pd.Series(b.view(np.int64))

    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("bucket", bucket_of(F.col(id_col)))
        .withColumn("kept", F.col("bucket") < F.col("rate_ppm"))
    )


def temperature_mixture_sql(
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
    source_sql: str = "SELECT doc_id, lang FROM documents",
) -> str:
    """DuckDB oracle replaying :func:`temperature_mixture` and aggregating
    to the per-group mixing report → (group, n_docs, rate_ppm, n_kept)."""
    mult = (2 * seed + 1) % W
    return f"""
WITH src AS MATERIALIZED ({source_sql}),
cnt AS (SELECT {group_col}, count(*) AS n_docs FROM src GROUP BY {group_col}),
mn AS (SELECT min(n_docs) AS n_min FROM cnt),
rates AS (SELECT {group_col}, n_docs,
                 CAST(floor(1000000 * sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS BIGINT) AS rate_ppm
          FROM cnt, mn),
hx AS (SELECT {id_col}, {group_col},
              {umul_c(f"(CAST({id_col} AS HUGEINT) % {W} + {W}) % {W}", mult)} AS x0
       FROM src),
hs AS (SELECT {id_col}, {group_col}, {splitmix_cols("x0", "h")} FROM hx),
bk AS (SELECT {id_col}, {group_col}, CAST(h % {BUCKETS} AS BIGINT) AS bucket FROM hs),
kept AS (SELECT b.{group_col}, count(*) AS n_kept
         FROM bk b JOIN rates r USING ({group_col})
         WHERE b.bucket < r.rate_ppm GROUP BY b.{group_col})
SELECT r.{group_col}, r.n_docs, r.rate_ppm, COALESCE(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k USING ({group_col})
ORDER BY r.{group_col}"""


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


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    frac_num: int = 1,
    frac_den: int = 5,
    seed: int = 11,
) -> DataFrame:
    """EXACT per-stratum quota sampling: keep precisely
    ``floor(n_g * frac_num / frac_den)`` rows of every group g — the
    smallest ``splitmix64`` buckets win, ties broken by id. The rate-based
    samplers above (:func:`hash_split`, :func:`temperature_mixture`) are
    row-local but binomially noisy per stratum; evaluation and calibration
    sets need the quota to be exact, which costs a rank.

    Cross-engine exactness: the bucket is the shared splitmix64 ppm hash
    (pure function of the id — replayed bit-for-bit by the oracle) and the
    quota is BIGINT ``(n * num) div den``; everything else is comparisons.

    Scale shape: one shuffle on the group key for the rank window plus a
    broadcast of the |groups|-row quota table. A single giant stratum
    serializes into one sort task — at 10^12-doc scale switch such strata
    to the rate-based sampler (documented trade: exact quota <-> one sort
    per stratum); typical strata (sources/languages) are fine.

    Output: (id, group, bucket, rk, quota, kept)."""
    mult = np.uint64(2 * seed + 1)

    @F.pandas_udf(T.LongType())
    def bucket_of(ids: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        b = xhash.splitmix64(u * mult) % np.uint64(BUCKETS)
        return pd.Series(b.view(np.int64))

    quota_tbl = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("quota", F.expr(f"(_n * {int(frac_num)}) div {int(frac_den)}"))
        .select(group_col, "quota")
    )
    w = Window.partitionBy(group_col).orderBy("bucket", id_col)
    return (
        df.withColumn("bucket", bucket_of(F.col(id_col)))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .join(F.broadcast(quota_tbl), group_col)
        .withColumn("kept", F.col("rk") <= F.col("quota"))
    )


def stratified_sample_sql(
    group_col: str = "source",
    id_col: str = "doc_id",
    frac_num: int = 1,
    frac_den: int = 5,
    seed: int = 11,
    source_sql: str = "SELECT doc_id, source FROM documents",
) -> str:
    """DuckDB oracle replaying :func:`stratified_sample` bit-for-bit →
    (id, group, bucket, rk, quota, kept)."""
    mult = (2 * seed + 1) % W
    return f"""
WITH src AS ({source_sql}),
hx AS (SELECT {id_col}, {group_col},
              {umul_c(f"(CAST({id_col} AS HUGEINT) % {W} + {W}) % {W}", mult)} AS x0
       FROM src),
hs AS (SELECT {id_col}, {group_col}, {splitmix_cols("x0", "h")} FROM hx),
bk AS (SELECT {id_col}, {group_col}, CAST(h % {BUCKETS} AS BIGINT) AS bucket FROM hs),
rk AS (SELECT {id_col}, {group_col}, bucket,
              CAST(row_number() OVER (PARTITION BY {group_col}
                                      ORDER BY bucket, {id_col}) AS BIGINT) AS rk
       FROM bk),
q AS (SELECT {group_col},
             CAST((count(*) * {int(frac_num)}) // {int(frac_den)} AS BIGINT) AS quota
      FROM src GROUP BY {group_col})
SELECT r.{id_col}, r.{group_col}, r.bucket, r.rk, q.quota, r.rk <= q.quota AS kept
FROM rk r JOIN q USING ({group_col})"""


def source_token_budget(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 11,
    n_shards: int = 32,
) -> DataFrame:
    """Per-source TOKEN-budget cap — the curation stage that bounds every
    source's contribution to a training mix by token mass, not row count:
    documents are taken in deterministic splitmix64-hash order (a uniform
    subsample) until each source's running whitespace-token sum exceeds
    ``budget``; the doc that crosses the line is the last one kept.

    Scale shape — the giant-stratum sort the quota sampler documents as
    its trade is AVOIDED here: the running sum is computed by hash-RANGE
    sharding (the kruskal two-pass ranking recipe): shard = the hash's
    top bits (shards are contiguous unsigned-hash ranges, so shard order
    ≡ hash order), per-(source, shard) partial sums roll up into a
    |sources|·n_shards-row offset table (broadcast), and each shard's
    interior running sum is a window over ~1/n_shards of the stratum.
    Bit-identical to the single-window form — the DuckDB oracle computes
    it THAT way, so the sharding itself is cross-checked.

    Output: (id, group, n_tok, run_tok, kept) — run_tok is the inclusive
    running sum in hash order; kept = run_tok − n_tok < budget (every
    source keeps at least its first document)."""
    from forecaster_spark.operators.textops import WS_SPLIT

    mult = np.uint64(2 * seed + 1)
    if n_shards < 1 or n_shards & (n_shards - 1) != 0:
        raise ValueError("n_shards must be a power of two >= 1")
    # top log2(n_shards) bits; n_shards=1 needs a literal 0 — Java masks
    # shift amounts mod 64, so shiftrightunsigned(h, 64) would be h itself
    shift = 64 - int(n_shards).bit_length() + 1

    @F.pandas_udf(T.LongType())
    def hash_of(ids: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(xhash.splitmix64(u * mult).view(np.int64))

    n_tok = F.size(F.split(F.trim(F.col(text_col)), WS_SPLIT)).cast("long")
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.col(group_col), n_tok.alias("n_tok"),
            hash_of(F.col(id_col)).alias("_h"),
        )
        .withColumn(
            "_shard",
            F.lit(0).cast("long")
            if n_shards == 1
            else F.expr(f"shiftrightunsigned(_h, {shift})"),
        )
    )
    shard_sums = base.groupBy(group_col, "_shard").agg(F.sum("n_tok").alias("_ss"))
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_sums.withColumn(
        "_off", F.coalesce(F.sum("_ss").over(woff), F.lit(0))
    ).select(group_col, "_shard", "_off")
    uns = F.col("_h").bitwiseXOR(F.lit(-(1 << 63)))  # unsigned order
    wrun = (
        Window.partitionBy(group_col, "_shard")
        .orderBy(uns.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # eqNullSafe on the group key (the r4 retraction-join rule): a NULL
    # source is a legal bucket — plain `=` would silently drop its docs
    # while the oracle's PARTITION BY keeps them
    withrun = base.withColumn("_run_local", F.sum("n_tok").over(wrun))
    off2 = offsets.withColumnRenamed(group_col, "_g2").withColumnRenamed(
        "_shard", "_s2"
    )
    return (
        withrun.join(
            F.broadcast(off2),
            withrun[group_col].eqNullSafe(F.col("_g2"))
            & (withrun["_shard"] == F.col("_s2")),
        )
        .select(
            id_col,
            group_col,
            "n_tok",
            (F.col("_off") + F.col("_run_local")).alias("run_tok"),
            ((F.col("_off") + F.col("_run_local") - F.col("n_tok")) < budget).alias(
                "kept"
            ),
        )
    )


def source_token_budget_sql(
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 11,
    source_sql: str = "SELECT doc_id, source, text FROM documents",
) -> str:
    """DuckDB oracle for :func:`source_token_budget` — deliberately the
    UNSHARDED single-window form (running sum over the full per-source
    hash order), so the engine's range-sharded two-phase decomposition is
    cross-checked against the direct algorithm."""
    mult = (2 * seed + 1) % W
    return f"""
WITH src AS (SELECT {id_col}, {group_col},
                    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tok
             FROM ({source_sql}) WHERE text IS NOT NULL),
hx AS (SELECT *, {umul_c(f"(CAST({id_col} AS HUGEINT) % {W} + {W}) % {W}", mult)} AS x0 FROM src),
hs AS (SELECT {id_col}, {group_col}, n_tok, {splitmix_cols("x0", "h")} FROM hx),
run AS (SELECT {id_col}, {group_col}, n_tok,
               sum(n_tok) OVER (PARTITION BY {group_col} ORDER BY h, {id_col}) AS run_tok
        FROM hs)
SELECT {id_col}, {group_col}, n_tok, CAST(run_tok AS BIGINT) AS run_tok,
       run_tok - n_tok < {budget} AS kept
FROM run"""


def mixture_allocation(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_tok",
    budget: int = 10_000,
) -> DataFrame:
    """Training-mixture budget apportionment by largest remainder (Hare
    quota — the house-seat algorithm): split an integer sample budget
    across domains proportionally to their integer token mass, with the
    rounding residue going to the largest fractional remainders. This is
    the exact-integer core of "sample each domain proportionally to its
    weight" (the DoReMi / Pile mixture-weights step): Σ alloc = budget
    EXACTLY, every alloc within 1 of its real quota, no float weights
    anywhere.

    Exactness: quota_s = budget·w_s / W_total is carried as the integer
    pair (base = num div W_total, rem = num mod W_total) — remainders
    share a denominator, so ranking rem ranks the fractional parts;
    budget·w must stay under 2^63 (budget 10^4 × 10^14 tokens fits — at
    larger corpora scale the budget or pre-divide weights).

    Plan shape: one partial-aggregated groupBy to |domains| rows, then
    unpartitioned window functions over that driver-scale table (domain
    counts are tens-to-thousands; the single-partition window is on the
    TINY side, never the corpus). Ties in rem break by group asc —
    deterministic cross-engine.

    Output: (group_col, w_sum, base_alloc, rem_num, extra, alloc).
    """
    per = df.groupBy(group_col).agg(F.sum(weight_col).cast("long").alias("w_sum"))
    wall = Window.partitionBy()
    wrank = Window.partitionBy().orderBy(F.col("rem_num").desc(), F.col(group_col).asc())
    b = F.lit(int(budget))
    per = (
        per.withColumn("_tot", F.sum("w_sum").over(wall))
        .withColumn("base_alloc", F.expr(f"(CAST({int(budget)} AS BIGINT) * w_sum) div _tot"))
        .withColumn("rem_num", F.expr(f"(CAST({int(budget)} AS BIGINT) * w_sum) % _tot"))
        .withColumn("_left", b - F.sum("base_alloc").over(wall))
        .withColumn("_rk", F.row_number().over(wrank))
        .withColumn("extra", (F.col("_rk") <= F.col("_left")).cast("long"))
    )
    return per.select(
        group_col,
        "w_sum",
        "base_alloc",
        "rem_num",
        "extra",
        (F.col("base_alloc") + F.col("extra")).alias("alloc"),
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epochs: int = 3,
    shards: int = 64,
    seed: int = 5,
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle — the data-ordering
    step of a pretraining loader done the distributed way: each epoch
    assigns every document a fresh splitmix64 draw
    ``h = splitmix64(id·2654435761 + (epoch+1)·(2·seed+1))``, documents
    land in shard ``h mod shards`` and are ordered WITHIN their shard by
    the unsigned draw (ties by id). Shard-then-shuffle-within-shard is
    the practical pattern at corpus scale: a global total order needs a
    single-partition sort, per-(epoch, shard) windows parallelize by
    ``epochs·shards``; epochs are independent permutations, every
    assignment order/partitioning-invariant and engine-replayable.

    ``shards`` must be a power of two: the shard id is the draw's low
    bits (``h & (shards−1)``), identical under signed int64 and the
    oracle's unsigned HUGEINT; the within-shard unsigned order is the
    CLAUDE.md sign-bit-flip recipe (Spark sorts ``h XOR 2^63``, DuckDB
    sorts the HUGEINT directly).

    Output: (epoch, shard, id_col, h, pos) — ``pos`` is the 1-based
    position within (epoch, shard).
    """
    assert shards & (shards - 1) == 0, "shards must be a power of two"
    mult = np.uint64(2 * seed + 1)

    @F.pandas_udf(T.LongType())
    def draw_of(ids: pd.Series, eps: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        e = eps.to_numpy(dtype=np.int64).view(np.uint64)
        h = xhash.splitmix64(u * np.uint64(2654435761) + (e + np.uint64(1)) * mult)
        return pd.Series(h.view(np.int64))

    b = (
        df.select(F.col(id_col))
        .withColumn("epoch", F.explode(F.expr(f"sequence(0L, {epochs - 1}L)")))
        .withColumn("h", draw_of(id_col, "epoch"))
        .withColumn("shard", F.col("h").bitwiseAND(F.lit(shards - 1)).cast("long"))
    )
    flip = F.col("h").bitwiseXOR(F.lit(-(1 << 63)))
    w = Window.partitionBy("epoch", "shard").orderBy(flip.asc(), F.col(id_col).asc())
    return b.select(
        "epoch", "shard", id_col, "h", F.row_number().over(w).cast("long").alias("pos")
    )


def epoch_shuffle_sql(
    id_col: str = "doc_id",
    epochs: int = 3,
    shards: int = 64,
    seed: int = 5,
    source_sql: str = "SELECT doc_id FROM documents",
) -> str:
    """DuckDB oracle for :func:`epoch_shuffle`: the HUGEINT splitmix chain
    per (id, epoch), shard = low bits, within-shard rank by the unsigned
    draw (the sign-flip recipe's mirror side sorts the HUGEINT itself)."""
    mult = (2 * seed + 1) % W
    return f"""
WITH ep AS (
  SELECT {id_col}, unnest(range({epochs})) AS epoch FROM ({source_sql})
), hx AS (
  SELECT {id_col}, epoch,
         CAST((CAST({id_col} AS HUGEINT) * 2654435761 + (epoch + 1) * {mult}) % {W} AS HUGEINT) AS x0
  FROM ep
), hs AS (
  SELECT {id_col}, epoch, {splitmix_cols("x0", "h")} FROM hx
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(h % {shards} AS BIGINT) AS shard,
       {id_col}, {{TO_INT64}} AS h,
       CAST(row_number() OVER (PARTITION BY epoch, h % {shards} ORDER BY h, {id_col}) AS BIGINT) AS pos
FROM hs""".replace("{TO_INT64}", _to_int64_h())


def _to_int64_h() -> str:
    from forecaster_spark.functions.xhash_sql import to_int64

    return to_int64("h")
