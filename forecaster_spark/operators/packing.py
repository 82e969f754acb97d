"""Sequence packing for pretraining pipelines: group documents into
token-budget bins (the standard "pack short sequences into fixed-length
training examples" step) with deterministic greedy-sequential semantics.

Within each partition key, documents are visited in a fixed order and fill
the current bin until adding the next document would exceed ``budget``
tokens — then a fresh bin starts (an oversized single document gets a bin
of its own). The assignment is a pure function of (order, n_tok, budget),
so a row-stepping recursive-CTE oracle replays it exactly.

Scale notes: the greedy scan is inherently sequential per partition key —
the same shape as LOCF/EWMA. Feed it bounded groups (per-source shards,
date buckets) rather than one giant key; the loop itself is a plain Python
float-free integer walk (~10M docs/s), so the per-task bound is the group
ROW COUNT held in one Arrow batch, not CPU. A two-phase blocked variant
(pack blocks independently, then merge boundary bins) trades exactness of
the greedy boundary for unbounded keys; the exact-replay contract pins the
sequential semantics, so the blocked variant is deliberately out of scope
here.

The reference has no packing (engine-added operator, SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forecaster_spark.functions import xhash
from forecaster_spark.operators.textops import BPE_ISH, WS_SPLIT


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_tok: str = "n_tok",
    partition: str = "source",
    order: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Assign each row a ``bin_id`` (0-based per partition key) and
    ``bin_fill`` (tokens in the bin AFTER placing the row) by the greedy
    sequential rule above. Output: input columns + bin_id + bin_fill."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("bin_id", T.LongType()), T.StructField("bin_fill", T.LongType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        bins, fills = [], []
        b, fill = 0, 0
        for n in pdf[n_tok].tolist():
            # null n_tok (e.g. token count of a null text) packs as 0 tokens
            # — the doc joins the current bin without consuming budget; the
            # SQL oracle coalesces identically (a bare NULL would NaN-crash
            # the int conversion here and NULL-cascade the oracle's walk)
            n = 0 if pd.isna(n) else int(n)
            if fill > 0 and fill + n > budget:
                b += 1
                fill = 0
            fill += n
            bins.append(b)
            fills.append(fill)
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf

    return df.groupBy(partition).applyInPandas(kernel, schema=out_schema)


def pack_sequences_sql(
    budget: int,
    doc_source_sql: str = (
        "SELECT doc_id, lang, len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_tok "
        "FROM documents"
    ),
    partition: str = "lang",
    order: str = "doc_id",
) -> str:
    """DuckDB oracle: recursive CTE walking each partition's rows in order,
    carrying (bin, fill) through the greedy rule — the same row-stepping
    pattern as the EWMA/backcast oracles."""
    return f"""
WITH RECURSIVE src AS ({doc_source_sql}),
o AS (
  SELECT *, row_number() OVER (PARTITION BY {partition} ORDER BY {order}) - 1 AS idx
  FROM src
),
walk(part, idx, doc_id, n_tok, bin, fill) AS (
  SELECT {partition}, idx, doc_id, n_tok, CAST(0 AS BIGINT),
         CAST(coalesce(n_tok, 0) AS BIGINT)
  FROM o WHERE idx = 0
  UNION ALL
  SELECT p.{partition}, p.idx, p.doc_id, p.n_tok,
         CASE WHEN w.fill > 0 AND w.fill + coalesce(p.n_tok, 0) > {budget}
              THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill > 0 AND w.fill + coalesce(p.n_tok, 0) > {budget}
              THEN CAST(coalesce(p.n_tok, 0) AS BIGINT)
              ELSE w.fill + coalesce(p.n_tok, 0) END
  FROM walk w JOIN o p ON p.{partition} = w.part AND p.idx = w.idx + 1
)
SELECT part AS {partition}, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       bin AS bin_id, fill AS bin_fill
FROM walk"""


def chunk_tokens(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking with overlap — the other half of the
    pretraining data layout beside :func:`pack_sequences`: split each
    document's token array into fixed-``size`` windows starting every
    ``stride`` tokens (``stride < size`` ⇒ ``size - stride`` tokens of
    overlap, the standard LM chunking scheme).  Chunk starts are
    ``0, stride, 2·stride, …  < n_tok``, so every token lands in at least
    one chunk and the last chunk may be short.

    Each chunk carries the reference polynomial checksum
    (:func:`~forecaster_spark.operators.seriesify.token_checksum_fast`,
    Σ tok_i·31^(len−1−i) mod 2^64) so the CONTENT of every chunk — not
    just its shape — sits in the driver's hard gate: the DuckDB oracle
    re-derives the tokens symbol-for-symbol and folds the same polynomial
    in HUGEINT per chunk.

    Plan: narrow map (tokenize kernel) → explode over the per-doc chunk
    count → ``slice`` + one Arrow checksum kernel. No shuffle; output rows
    ≈ input tokens / stride, each bounded by ``size`` — exactly the shape
    a downstream packer or trainer wants at 100 TB.

    Output: (doc_id, n_tok, chunk_idx, chunk_start, chunk_len,
    chunk_checksum).
    """
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    from pyspark.sql import functions as F

    from forecaster_spark.operators.seriesify import token_checksum_fast
    from forecaster_spark.operators.textops import text_tokens

    t = text_tokens(docs, text_col=text_col, id_col=id_col)
    c = (
        t.where(F.col("n_tok") > 0)
        .select(
            F.col(id_col),
            F.col("n_tok").cast("long").alias("n_tok"),
            "tokens",
            F.explode(F.expr(f"sequence(0, (n_tok - 1) div {stride})")).alias("_ci"),
        )
        .select(
            id_col,
            "n_tok",
            F.col("_ci").cast("long").alias("chunk_idx"),
            (F.col("_ci") * stride).cast("long").alias("chunk_start"),
            F.slice(F.col("tokens"), F.col("_ci") * stride + 1, size).alias("_chunk"),
        )
    )
    return c.select(
        id_col,
        "n_tok",
        "chunk_idx",
        "chunk_start",
        F.size("_chunk").cast("long").alias("chunk_len"),
        token_checksum_fast(F.col("_chunk")).alias("chunk_checksum"),
    )


def packing_waste(df: DataFrame, seq_len: int = 512, text_col: str = "text") -> DataFrame:
    """Padding-vs-truncation waste report at a fixed context length — the
    budget sheet a pretraining run reads before choosing doc-per-example
    packing: per source, how many length-``seq_len`` sequences the corpus
    needs if every document is split-and-padded (``ceil(n/L)`` sequences,
    ``ceil(n/L)*L - n`` pad tokens) vs how many tokens truncate-to-one-
    sequence would discard (``max(n - L, 0)``).  The greedy bin packer
    (:func:`pack_sequences`) is the cure; this measures the disease.

    Exactness: token counts are the BPE-ish regex proxy (certified by the
    token_counts contract query); ceil-division is ``(n + L - 1) div L``
    on BIGINTs — empty documents contribute zero sequences on both
    engines; ``pad_rate = pad_tokens / (n_seqs*L)`` is the single
    division.

    Plan shape: row-local codegen arithmetic + one hash aggregate with
    map-side partials on the source key.  Corpus-linear, one tiny shuffle.

    Output: (source, n_docs, sum_tok, n_seqs, pad_tokens, trunc_tokens,
    pad_rate).
    """
    ntok = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)).cast("long")
    d = df.select(
        "source",
        ntok.alias("_n"),
    ).select(
        "source",
        "_n",
        F.expr(f"(_n + {seq_len - 1}) div {seq_len}").alias("_ns"),
        F.greatest(F.col("_n") - F.lit(seq_len), F.lit(0)).cast("long").alias("_tr"),
    )
    ag = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").cast("long").alias("sum_tok"),
        F.sum("_ns").cast("long").alias("n_seqs"),
        F.sum(F.col("_ns") * F.lit(seq_len) - F.col("_n")).cast("long").alias("pad_tokens"),
        F.sum("_tr").cast("long").alias("trunc_tokens"),
    )
    return ag.select(
        "source",
        "n_docs",
        "sum_tok",
        "n_seqs",
        "pad_tokens",
        "trunc_tokens",
        F.when(
            F.col("n_seqs") > 0,
            F.col("pad_tokens").cast("double") / (F.col("n_seqs") * F.lit(seq_len)).cast("double"),
        ).alias("pad_rate"),
    )


def span_corruption_layout(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 3,
    rate_pct: int = 15,
    seed: int = 9,
) -> DataFrame:
    """T5-style span-corruption MASK LAYOUT (Raffel et al. 2020 §3.1.4:
    corrupt ~15% of tokens as mean-length-3 spans replaced by sentinels):
    decide WHICH token positions each document masks — deterministically,
    so the layout is reproducible across runs/engines and the denoising
    targets can be re-derived from (doc_id, span table) alone, no RNG
    state to ship.

    Placement: ``k = max(1, n·rate div (100·L))`` spans; the doc is cut
    into k equal strata ``[i·n div k, (i+1)·n div k)`` and span i starts
    at ``stratum_start + splitmix64(doc_id·1000003 + i·(2·seed+1)) mod
    (L_i − L + 1)`` — non-overlapping BY CONSTRUCTION (one span per
    stratum; stratum length ≥ 20 ≥ L at the default rate), uniform within
    the stratum, and a pure integer function of (doc_id, i) the SQL
    mirror replays through the HUGEINT splitmix chain. Jackknife-stratum
    placement instead of T5's sequential RNG draw: the sequential draw
    needs order-dependent rejection (not relational); the stratified form
    keeps the same corruption budget and span shape.

    Plan: token count + span count are row-local codegen; one explode to
    (doc, span_i) rows; ONE Arrow kernel vectorizes the splitmix over the
    exploded stream. No shuffle at all — the layout is embarrassingly
    row-parallel at any corpus size. Docs with n < span_len emit no rows.

    Output: (id_col, n_tok, n_spans, span_i, start, length) — token
    positions are 0-based whitespace-token indices.
    """
    mult = np.uint64(2 * seed + 1)
    n_tok = F.size(F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT))
    b = (
        df.select(F.col(id_col), n_tok.cast("long").alias("n_tok"))
        .where(F.col("n_tok") >= span_len)
        .withColumn(
            "n_spans",
            F.greatest(
                F.lit(1), F.expr(f"(n_tok * {rate_pct}) div {100 * span_len}")
            ).cast("long"),
        )
        .withColumn("span_i", F.explode(F.expr("sequence(0, n_spans - 1)")))
    )

    @F.pandas_udf(T.LongType())
    def offset_of(ids: pd.Series, span_is: pd.Series, widths: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        i = span_is.to_numpy(dtype=np.int64).view(np.uint64)
        h = xhash.splitmix64(u * np.uint64(1000003) + i * mult)
        w = widths.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series((h % w).view(np.int64))

    s_lo = F.expr("(span_i * n_tok) div n_spans")
    s_hi = F.expr("((span_i + 1) * n_tok) div n_spans")
    b = (
        b.withColumn("_lo", s_lo.cast("long"))
        .withColumn("_w", (s_hi - s_lo - F.lit(span_len - 1)).cast("long"))
        .withColumn("start", F.col("_lo") + offset_of(id_col, "span_i", "_w"))
    )
    return b.select(
        id_col,
        "n_tok",
        "n_spans",
        F.col("span_i").cast("long").alias("span_i"),
        "start",
        F.lit(span_len).cast("long").alias("length"),
    )


def ul2_denoiser_layout(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """UL2 mixture-of-denoisers mask layout (Tay et al. 2022): each
    document is deterministically assigned one of three denoising
    objectives by ``splitmix64(doc_id·2654435761 + 101) mod 3`` and gets
    the matching span layout —

    - **R** (regular): the T5 recipe — length-3 spans, ~15% corruption
      (k = max(1, n·15 div 300) stratified spans; needs n ≥ 3);
    - **X** (extreme): length-12 spans, ~30% corruption
      (k = max(1, n·30 div 1200) = max(1, n div 40); the stratum width is
      then ≥ 12 by construction for every eligible n ≥ 12);
    - **S** (sequential / prefix-LM): ONE span covering the final quarter,
      start = n − n div 4, length = n div 4 (needs n ≥ 4).

    Placement within R/X strata is the :func:`span_corruption_layout`
    rule — ``lo_i + splitmix64(doc_id·1000003 + i·(2·seed+1)) mod
    (width_i − L + 1)`` — with its own seed so the two layouts are
    independent draws. The S branch rides the same kernel with width 1
    (offset ≡ 0). Docs ineligible for their assigned denoiser emit no
    rows. Everything is row-local codegen plus two Arrow splitmix
    kernels; zero shuffles at any corpus size.

    Output: (id_col, denoiser 'R'|'X'|'S', n_tok, n_spans, span_i,
    start, length).
    """
    mult = np.uint64(2 * seed + 1)

    @F.pandas_udf(T.LongType())
    def denoiser_of(ids: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        h = xhash.splitmix64(u * np.uint64(2654435761) + np.uint64(101))
        return pd.Series((h % np.uint64(3)).view(np.int64))

    @F.pandas_udf(T.LongType())
    def offset_of(ids: pd.Series, span_is: pd.Series, widths: pd.Series) -> pd.Series:
        u = ids.to_numpy(dtype=np.int64).view(np.uint64)
        i = span_is.to_numpy(dtype=np.int64).view(np.uint64)
        h = xhash.splitmix64(u * np.uint64(1000003) + i * mult)
        w = widths.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series((h % w).view(np.int64))

    n_tok = F.size(F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT))
    d = F.col("_d")
    b = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), n_tok.cast("long").alias("n_tok"))
        .withColumn("_d", denoiser_of(id_col))
        .where(
            ((d == 0) & (F.col("n_tok") >= 3))
            | ((d == 1) & (F.col("n_tok") >= 12))
            | ((d == 2) & (F.col("n_tok") >= 4))
        )
        .withColumn(
            "n_spans",
            F.when(d == 0, F.greatest(F.lit(1), F.expr("(n_tok * 15) div 300")))
            .when(d == 1, F.greatest(F.lit(1), F.expr("n_tok div 40")))
            .otherwise(F.lit(1))
            .cast("long"),
        )
        .withColumn(
            "_L",
            F.when(d == 0, F.lit(3))
            .when(d == 1, F.lit(12))
            .otherwise(F.expr("n_tok div 4"))
            .cast("long"),
        )
        .withColumn("span_i", F.explode(F.expr("sequence(0, n_spans - 1)")))
    )
    s_lo = F.expr("(span_i * n_tok) div n_spans")
    s_hi = F.expr("((span_i + 1) * n_tok) div n_spans")
    b = (
        b.withColumn("_lo", F.when(d == 2, F.col("n_tok") - F.col("_L")).otherwise(s_lo).cast("long"))
        .withColumn(
            "_w",
            F.when(d == 2, F.lit(1)).otherwise(s_hi - s_lo - (F.col("_L") - 1)).cast("long"),
        )
        .withColumn("start", F.col("_lo") + offset_of(id_col, "span_i", "_w"))
    )
    return b.select(
        id_col,
        F.when(d == 0, "R").when(d == 1, "X").otherwise("S").alias("denoiser"),
        "n_tok",
        "n_spans",
        F.col("span_i").cast("long").alias("span_i"),
        "start",
        F.col("_L").alias("length"),
    )
