"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; each ``queries()[name]`` runs at
sf=0.01 and is compared against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash). Every operator from
SURVEY.md §2 claimed as done has an entry here, and every entry has a value
oracle — the sequential/recursive kernels (forecast solvers, EWMA/Holt/
Croston chains, backcast, LTTB, connected components) via generated
HUGEINT-determinant or recursive-CTE SQL; all green under the driver's
ANSI session and at sf0.1 as well (tools/check_entry.py mirrors the gate).

Float determinism: contract queries use the rollup operators' ``exact`` mode
(integer micro-unit sums) so Spark and DuckDB produce bit-identical doubles —
plain double sums are add-order-dependent at the ulp level across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window

from pyspark.sql import functions as F

from forecaster_spark.functions import xhash_sql
from forecaster_spark.models import exact_sql
from forecaster_spark.functions.gorilla import pack_rollup_gorilla
from forecaster_spark.models.kernels import forecast_long, qof_table
from forecaster_spark.models.metrics import qof_native
from forecaster_spark.operators import features as FT
from forecaster_spark.operators.dedup import dedup_exact, minhash_lsh_pairs, simhash
from forecaster_spark.operators.downsample import lttb_sql
from forecaster_spark.operators.gapfill import backcast_fill, linear_interp, locf
from forecaster_spark.operators.rollup import rollup_cascade, rollup_raw, rollup_tiers
from forecaster_spark.operators.seriesify import events_as_series
from forecaster_spark.operators.packing import pack_sequences_sql
from forecaster_spark.operators.sampling import epoch_shuffle_sql, hash_split_sql, temperature_mixture_sql
from forecaster_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_ivf_sql,
    cosine_topk_lsh,
    cosine_topk_lsh_sql,
    cosine_topk_sq8,
    cosine_topk_sq8_sql,
    embedding_neardup_pairs_sql,
    semantic_contamination_sql,
    semantic_dedup_sql,
)
from forecaster_spark.operators.textops import (
    BPE_ISH,
    STOPWORDS,
    WS_SPLIT,
    DEMO_MERGES as _DEMO_MERGES,
    bpe_merge_round_sql,
    quality_classifier_sql,
    quality_funnel_sql,
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_counts,
)
from forecaster_spark.sources import read_table

ROLLUP_ORDER = ["source", "bucket_start", "cnt", "sum_y", "min_y", "max_y", "mean_y", "first_y", "last_y"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiered continuous aggregate (1m→1h cascade) over the events
    table treated as per-event_type series."""
    events = read_table(spark, "/root/testdata/sf0.001", "events")
    tiers = rollup_tiers(events_as_series(events))
    return tiers["1h"].select(*ROLLUP_ORDER)


def _events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_series(read_table(spark, sf_dir, "events"))


def q_rollup_1m(spark, sf_dir):
    return rollup_raw(_events_series(spark, sf_dir), "1m", exact=True).select(*ROLLUP_ORDER)


def q_retract_rebuild(spark, sf_dir):
    """Retraction-driven incremental tier rebuild (plans/retract.py): a
    deterministic retraction batch (event_id % 97 == 0 — GDPR-delete /
    late-correction shaped) is applied to the 1m tier by re-aggregating
    ONLY the affected buckets (broadcast bucket semi-join into the raw
    scan; untouched tier rows pass through an anti-join, never rereading
    raw data). The oracle is the FULL recompute over surviving rows, so
    OK-exact certifies incremental ≡ full — including min/max/first/last,
    which are not arithmetically subtractable, and buckets that vanish
    entirely."""
    from forecaster_spark.plans.retract import retract_rebuild_tier

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        "ts",
        F.col("value").alias("y"),
        "event_id",
    )
    retr_ids = ev.where(F.col("event_id") % 97 == 0).select("event_id")
    return retract_rebuild_tier(ev, retr_ids, tier="1m", exact=True).select(*ROLLUP_ORDER)


def q_rollup_1h_cascade(spark, sf_dir):
    t1m = rollup_raw(_events_series(spark, sf_dir), "1m", exact=True)
    return rollup_cascade(t1m, "1h", exact=True).select(*ROLLUP_ORDER)


def q_rollup_1d_cascade(spark, sf_dir):
    t = rollup_tiers(_events_series(spark, sf_dir), exact=True)
    return t["1d"].select(*ROLLUP_ORDER)


_ROLLUP_SQL = """
WITH series AS (
  SELECT event_type AS source, ts, value AS y FROM events
), t1m AS (
  SELECT source, date_trunc('minute', ts) AS bucket_start,
         count(y) AS cnt,
         sum(CAST(round(y * 1000000) AS BIGINT)) / 1000000.0 AS sum_y,
         min(y) AS min_y, max(y) AS max_y,
         sum(CAST(round(y * 1000000) AS BIGINT)) / 1000000.0 / count(y) AS mean_y,
         (min(struct_pack(t := ts, v := y))).v AS first_y,
         (max(struct_pack(t := ts, v := y))).v AS last_y,
         sum(CAST(round(y * 1000000) AS BIGINT)) AS sum_micro
  FROM series GROUP BY 1, 2
)
"""

_CASCADE_1H = """
, t1h AS (
  -- DuckDB sum(BIGINT) returns HUGEINT (→ float64 in pandas); CAST back to
  -- BIGINT so the driver's value-hash sees the same int64 dtype as Spark
  SELECT source, date_trunc('hour', bucket_start) AS bucket_start,
         CAST(sum(cnt) AS BIGINT) AS cnt, sum(sum_micro) / 1000000.0 AS sum_y,
         min(min_y) AS min_y, max(max_y) AS max_y,
         sum(sum_micro) / 1000000.0 / sum(cnt) AS mean_y,
         min_by(first_y, bucket_start) AS first_y,
         max_by(last_y, bucket_start) AS last_y,
         sum(sum_micro) AS sum_micro
  FROM t1m GROUP BY 1, 2
)
"""

_SEL = "SELECT source, bucket_start, cnt, sum_y, min_y, max_y, mean_y, first_y, last_y FROM "

_SERIES_SQL = "WITH series AS (SELECT event_type AS source, ts, value AS y, event_id FROM events)\n"


# -- W1/W3/P1/P8: window feature operators ----------------------------------

_ORD = ["ts", "event_id"]  # deterministic series order under ts ties


def _ev(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return ev.select(F.col("event_type").alias("source"), "ts", F.col("value").alias("y"), "event_id")


def q_lag_features(spark, sf_dir):
    """Reference lag semantics W1: out-of-range lags ← series' first value."""
    out = FT.with_lags(_ev(spark, sf_dir), "y", 3, order=_ORD)
    return out.select("source", "event_id", "y", "y_lag3", "y_lag2", "y_lag1")


def q_lead_targets(spark, sf_dir):
    """W3: lead targets, zero-padded tail."""
    out = FT.with_leads(_ev(spark, sf_dir), "y", 4, order=_ORD)
    return out.select("source", "event_id", "y", "y_lead1", "y_lead2", "y_lead3")


def q_trend_time_index(spark, sf_dir):
    """P1 (spec=3: linear + quadratic — exact arithmetic only) + P8 time index."""
    out = FT.with_trend(FT.with_time_index(_ev(spark, sf_dir), order=_ORD), spec=3)
    return out.select(
        "source", "event_id", F.col("t").cast("long").alias("t"), "trend1", "trend2"
    )


def q_minmax_scale(spark, sf_dir):
    """P6: reference MinMax (0,4) scaling per source."""
    s = _ev(spark, sf_dir).drop("ts")
    out = FT.transform_minmax(s, FT.fit_minmax(s, ["y"]), ["y"])
    return out.select("source", "event_id", "y", "y_mm")


def q_robust_scale(spark, sf_dir):
    """Robust scaler (sklearn RobustScaler semantics): center by the
    per-source median, scale by the IQR — completes the scaler family
    (P6 MinMax, P7 Standard). Quarter-quanta integer quantiles make the
    params and the scaled output bit-exact vs quantile_cont SQL."""
    s = _ev(spark, sf_dir).drop("ts")
    out = FT.transform_robust(s, FT.fit_robust(s, ["y"]), ["y"])
    return out.select("source", "event_id", "y", F.col("y_rs"))


def q_drift_chi2(spark, sf_dir):
    """Distribution-drift monitor: per-source two-sample histogram split
    at the global time-span midpoint, per-bin chi-square dispersion term
    (count-based, so exact — PSI's log-ratio is not bit-reproducible)."""
    from forecaster_spark.operators.timeweight import histogram_drift

    return histogram_drift(_ev(spark, sf_dir))


def _ev_nulled(spark, sf_dir):
    return _ev(spark, sf_dir).withColumn(
        "y", F.when(F.col("event_id") % 7 == 3, F.lit(None)).otherwise(F.col("y"))
    )


def q_locf(spark, sf_dir):
    """Gap-fill locf over a deterministically nulled-out signal."""
    return locf(_ev_nulled(spark, sf_dir), "y", order=_ORD).select("source", "event_id", "y")


def q_linear_interp(spark, sf_dir):
    """Gap-fill time-weighted linear interpolation (nulled-out signal)."""
    return linear_interp(_ev_nulled(spark, sf_dir), "y", order=_ORD).select("source", "event_id", "y")


def q_qof_persistence(spark, sf_dir):
    """A6-A11 QoF metrics of a lag-h persistence baseline per (source, h)."""
    s = FT.with_lags(_ev(spark, sf_dir), "y", 3, order=_ORD, pad_first=False)
    pairs = None
    for h in (1, 2, 3):
        p = s.select(
            "source", F.lit(h).alias("h"), F.col("y").alias("y_true"), F.col(f"y_lag{h}").alias("y_hat")
        ).where(F.col(f"y_lag{h}").isNotNull())
        pairs = p if pairs is None else pairs.unionAll(p)
    return qof_native(pairs, ["source", "h"], exact=True).select(
        "source", "h", "mse", "mae", "r2", "r2bar", "smape", "m"
    )


# window clauses shared by the oracle SQL
_W = "PARTITION BY source ORDER BY ts, event_id"


# -- training-data pipeline operators over documents/embeddings --------------

def q_dedup_exact(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return dedup_exact(docs, ["text"]).select("doc_id").orderBy("doc_id")


def q_token_counts(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return with_token_counts(docs).select(
        "doc_id",
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
    )


def q_lang_id(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return with_lang_id(docs).select("doc_id", "lang", "lang_pred")


def q_quality(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return with_quality(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "punct_ratio",
        "stopword_ratio",
        "mean_word_len",
        "quality",
    )


def q_jaccard_consecutive(spark, sf_dir):
    """Word-set Jaccard between consecutive doc_ids (hash-free so the oracle
    can reproduce it; the k-shingle variants are pytest-covered)."""
    docs = read_table(spark, sf_dir, "documents")
    wset = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), WS_SPLIT)).alias("ws")
    )
    a = wset.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("wa"))
    b = wset.select((F.col("doc_id") - 1).alias("id_a"), F.col("ws").alias("wb"))
    j = F.size(F.array_intersect("wa", "wb")) / F.size(F.array_union("wa", "wb"))
    return a.join(b, "id_a").select(F.col("id_a").alias("doc_id"), j.alias("jaccard"))


def q_minhash_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    return minhash_lsh_pairs(docs, num_perm=32, bands=8, verify_jaccard=0.4)


def q_simhash(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return simhash(docs).select("doc_id", "simhash")


def q_contamination(spark, sf_dir):
    """Benchmark decontamination (GPT-3-style n-gram overlap): flag corpus
    docs sharing any word 3-shingle with the benchmark subset (doc_id <
    20). Bench shingles broadcast; corpus shingled once, probed with a
    left-semi join — corpus-linear, no text shuffle."""
    from forecaster_spark.operators.dedup import contamination_flags

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < 20)
    return contamination_flags(docs, bench, k=3)


def q_split_leakage(spark, sf_dir):
    """Train/test leakage audit: per TRAIN doc, distinct word 3-shingles
    shared with ANY test-split doc (the 98/1/1 hash split's own holdout) —
    contamination_flags' sibling where the benchmark is the pipeline's own
    eval split; catches near-duplicates straddling the split before
    training. Holdout shingles distinct+broadcast, train side probed with
    a semi-join — corpus-linear. leaked fires at >= 3 shared shingles
    (single shared 3-shingles are common phrases, not leakage)."""
    from forecaster_spark.operators.dedup import split_leakage

    docs = read_table(spark, sf_dir, "documents")
    return split_leakage(docs, k=3, min_shared=3)


def q_hash_split(spark, sf_dir):
    """Deterministic hash-based train/val/test split (98/1/1): bucket =
    splitmix64(id·(2·seed+1)) mod 1e6 — stable under any row order,
    partitioning, or cluster size (the reference's positional 80/20 split
    is not), and replayed bucket-for-bucket by the DuckDB splitmix
    pipeline."""
    from forecaster_spark.operators.sampling import hash_split

    docs = read_table(spark, sf_dir, "documents")
    return hash_split(docs.select("doc_id")).select("doc_id", "bucket", "split")


def q_temperature_mixture(spark, sf_dir):
    """Temperature-weighted corpus mixing report (alpha=0.5): per-language
    keep rate (n_min/n_lang)^0.5 in exact ppm, keep decision = splitmix64
    ppm bucket of doc_id. One scan + broadcast rate table; the per-group
    report (n_docs, rate_ppm, n_kept) is bit-exact vs the DuckDB replay."""
    from forecaster_spark.operators.sampling import temperature_mixture

    docs = read_table(spark, sf_dir, "documents")
    mixed = temperature_mixture(docs.select("doc_id", "lang"))
    return (
        mixed.groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("rate_ppm").alias("rate_ppm"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("lang")
    )


def q_quality_funnel(spark, sf_dir):
    """C4/Gopher-style staged quality-filter funnel: cumulative survivor
    counts through min-words → mean-word-length → max-word-length →
    digit-ratio filters. All flags row-local integer tests in codegen;
    one map-side-combinable aggregate; 5-row report."""
    from forecaster_spark.operators.textops import quality_funnel

    docs = read_table(spark, sf_dir, "documents")
    return quality_funnel(docs).orderBy("stage_idx")


def _pii_seeded_docs(spark, sf_dir):
    """documents with deterministic synthetic PII spans appended (the
    corpus itself is PII-free word soup): doc_id%3==1 gets an e-mail + an
    IPv4, doc_id%3==2 a phone + a second e-mail shape, doc_id%3==0 stays
    clean (zero-count rows exercised). Mirrored verbatim by
    :func:`_pii_seed_sql`."""
    d = F.col("doc_id")
    sid = d.cast("string")
    seeded_1 = F.concat(
        F.col("text"),
        F.lit(" reach user"), sid, F.lit("@mail.example.com at 10."),
        (d % 256).cast("string"), F.lit("."), (d % 97).cast("string"), F.lit(".7"),
    )
    seeded_2 = F.concat(
        F.col("text"),
        F.lit(" call +1-555-"), F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" or a.b-c_d"), sid, F.lit("@sub.example.org"),
    )
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(d % 3 == 1, seeded_1)
        .when(d % 3 == 2, seeded_2)
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _pii_redact_oracle():
    from forecaster_spark.operators.textops import pii_redact_sql

    return pii_redact_sql(source_sql=_pii_seed_sql())


def _pii_seed_sql():
    return """SELECT doc_id,
       CASE WHEN doc_id % 3 = 1 THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                 || '@mail.example.com at 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(doc_id % 97 AS VARCHAR) || '.7'
            WHEN doc_id % 3 = 2 THEN text || ' call +1-555-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' or a.b-c_d' || CAST(doc_id AS VARCHAR) || '@sub.example.org'
            ELSE text END AS text
FROM documents"""


def q_pii_redact(spark, sf_dir):
    """PII scrub (C4/RefinedWeb/Dolma-style): redact e-mail / IPv4 / phone
    spans to typed placeholders and report per-doc match counts. The corpus
    is PII-free, so the query seeds deterministic spans from doc_id
    identically on both engines, then certifies the full redacted string.
    Row-local JVM regex in codegen — one scan, no shuffle at any scale."""
    from forecaster_spark.operators.textops import pii_redact

    docs = _pii_seeded_docs(spark, sf_dir)
    return pii_redact(docs).select(
        "doc_id", "n_email", "n_ip", "n_phone", "redacted"
    )


def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (pretraining example packing): greedy
    sequential fill of 512-token bins per language, document order fixed by
    doc_id, n_tok = the certified whitespace token count. The recursive-CTE
    oracle replays the walk row-by-row — bin boundaries, overflow-starts-new
    -bin, and oversized-doc-own-bin are all value-checked."""
    from forecaster_spark.operators.packing import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), WS_SPLIT))
    src = docs.select("doc_id", "lang", ws.cast("long").alias("n_tok"))
    return pack_sequences(src, budget=512, n_tok="n_tok", partition="lang").select(
        "lang", "doc_id", "n_tok", "bin_id", "bin_fill"
    )


def q_simhash_neardup(spark, sf_dir):
    """Near-miss SimHash pairs (hamming ≤ 3) via pigeonhole chunk blocking
    (Manku et al. WWW'07 multi-index): equi-join on 16-bit signature chunks,
    exact native bit_count(xor) verify — no all-pairs anywhere. The oracle
    deliberately uses the OPPOSITE algorithm (brute all-pairs hamming over
    the recomputed signatures), so blocking losslessness itself is what the
    driver certifies."""
    from forecaster_spark.operators.dedup import simhash_neardup_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = simhash_neardup_pairs(simhash(docs), max_hamming=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_fingerprint(spark, sf_dir):
    """Bottom-k k-gram sketch, exploded to (doc_id, pos, fp) rows — scalar
    columns so the driver's canonical sort can order them (an array<long>
    cell is unhashable in the harness's lexsort)."""
    docs = read_table(spark, sf_dir, "documents")
    return with_fingerprint(docs).select(
        "doc_id", F.posexplode("fingerprint").alias("pos", "fp")
    )


def q_cosine_topk_brute(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8)
    return cosine_topk_brute(emb, queries_df, k=10).select(
        "query_id", "neighbor_id", "rank"
    )


def q_cosine_topk_lsh(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries_df = emb.where(F.col("vec_id") < 8)
    return cosine_topk_lsh(emb, queries_df, dim=dim, k=10, n_planes=8).select(
        "query_id", "neighbor_id", "rank"
    )


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the last LLM-data operator
    without a driver certificate): hyperplane-LSH bucket equality → exact
    cosine ≥ threshold, cosine emitted micro-unit floor-quantized (the two
    engines' fold orders differ at ~1e-15 while the verified threshold /
    boundary margins are ≥ 3e-3 / ≥ 1e-8)."""
    from forecaster_spark.operators.similarity import embedding_neardup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    pairs = embedding_neardup_pairs(emb, dim=dim, threshold=0.2, n_planes=10)
    return pairs.select(
        "id_a", "id_b", F.floor(F.col("cosine") * 1_000_000).cast("long").alias("cos_u6")
    )


def q_cosine_topk_ivf(spark, sf_dir):
    """IVF ANN (coarse k-means cells + multi-probe), exact-trained: integer
    cell sums + sequential-fold norms make the Lloyd iterations SQL-
    reproducible, so the full train→assign→probe→rerank pipeline is
    certified by a generated DuckDB oracle (2 unrolled iterations)."""
    from forecaster_spark.operators.similarity import cosine_topk_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries_df = emb.where(F.col("vec_id") < 8)
    return cosine_topk_ivf(
        emb, queries_df, dim=dim, k=10, n_centroids=16, n_probe=4, exact=True
    ).select("query_id", "neighbor_id", "rank")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (r5, VERDICT #3): spherical-k-means
    cells (the certified exact-Lloyd quantizer) → within-cell exact-cosine
    pairs ≥ 0.2 → connected-components keep list. Output is all
    integer/boolean (cell id, component label, keep verdict) — the float
    math only makes decisions, whose cross-engine margins are pinned in
    tests/test_dataops.py::test_semantic_dedup_margins."""
    from forecaster_spark.operators.similarity import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return semantic_dedup(emb, dim=dim, threshold=0.2, n_centroids=16).select(
        "vec_id", "cell", "dup_cluster", "keep"
    )


def q_semantic_contamination(spark, sf_dir):
    """SEMANTIC decontamination (r5): flag training docs whose embedding
    is within cosine 0.35 of ANY eval-bench vector — the embedding
    analog of the n-gram/Bloom contamination guards (near-paraphrases of
    eval items slip past verbatim shingles). Bench set closed over
    (eval-suite-sized), corpus scanned ONCE, zero shuffles/joins; max
    cosine micro-quantized with margins pinned in pytest (bench members
    excluded from the corpus side — their exact 1.0 self-cosine sits on
    a quantization boundary, and decontamination drops eval rows from
    train anyway)."""
    from forecaster_spark.operators.similarity import semantic_contamination

    emb = read_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return semantic_contamination(
        emb.where(F.col("vec_id") >= 8), emb.where(F.col("vec_id") < 8),
        dim=dim, threshold=0.35,
    ).select("vec_id", "max_cos_u6", "contaminated")


def q_cosine_topk_sq8(spark, sf_dir):
    """Int8 scalar-quantized ANN (the memory-compression path: 4× smaller
    corpus, integer GEMM scoring). Quantization is floor/clamp on a
    power-of-two scale and scoring is an integer dot — both replay exactly
    in SQL, so the driver certifies the dot VALUES, not just ranks."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8)
    return cosine_topk_sq8(emb, queries_df, k=10)


# -- model kernels / codec (non-SQL-expressible → rows-only checks) ----------

def _hourly_int_series(spark, sf_dir):
    """Hourly exact-sum rollup, floor-quantized to an integer-valued signal:
    the cross-engine-deterministic input the exact forecast solver needs
    (richer configs — p=4, trend, scalers — stay pinned by the 9-config
    NumPy-oracle pytest matrix; these contract queries trade them for a
    value-level DuckDB certificate of the full forecast pipeline)."""
    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    return t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor("mean_y").cast("double").alias("y"),
    )


def q_arx_forecast(spark, sf_dir):
    """ARX(p=2) in-sample recursive forecast with forge + rectify (C1/W7/P5),
    exact solver: integer-Cramer OLS + fixed-order predict, certified
    bit-for-bit by the generated SQL oracle (models/exact_sql.py)."""
    return forecast_long(_hourly_int_series(spark, sf_dir), hh=4, p=2, spec=1, skip=2, solver="exact")


def q_arx_ridge_forecast(spark, sf_dir):
    """Ridge-ARX(p=2) in-sample recursive forecast: the exact-Cramer OLS
    path with an L2 penalty λ=10000 (quantized-y² units) on the
    non-intercept normal-equation diagonal — the regularization a
    collinear-lag design needs at training-pipeline scale, still certified
    bit-for-bit by the generated HUGEINT SQL oracle (exact_sql.arx_ridge_sql)."""
    return forecast_long(
        _hourly_int_series(spark, sf_dir),
        hh=4, p=2, spec=1, skip=2, solver="exact_ridge", ridge_lam=10000,
    )


def q_arma_hr_forecast(spark, sf_dir):
    """ARMA(1,1) in-sample recursive forecast by Hannan–Rissanen two-stage
    exact-Cramer OLS — the engine's first moving-average-family model (the
    reference's AR/ARX stack, arx.py/ar_yw.py, fits pure lag designs with no
    MA term; HR reaches one through OLS only, so it composes with the
    integer-Cramer + fixed-order-predict machinery). Innovations are fed
    back fixed-point (eq = floor(e·8), exact on both engines); certified
    bit-for-bit by the generated HUGEINT SQL oracle (exact_sql.arma_hr_sql)."""
    from forecaster_spark.models.kernels import arma_hr_forecast

    return arma_hr_forecast(_hourly_int_series(spark, sf_dir), hh=4, skip=2, q_scale=8)


def q_arx_direct_forecast(spark, sf_dir):
    """ARX_D direct multi-horizon (one regression per horizon — C2/A3),
    exact solver against the zero-tail lead targets (W3)."""
    return forecast_long(
        _hourly_int_series(spark, sf_dir), hh=4, p=2, spec=1, skip=2, mode="direct", solver="exact"
    )


def q_ar_smols_forecast(spark, sf_dir):
    """AR via conditional OLS (A5, statsmodels AutoReg equivalent —
    yw_method='sm_ols'): the previously pytest-only fit path, exact
    integer-Cramer on the REAL-lag conditional design (rows t ≥ p, no z[0]
    padding, most-recent lag first) + the shared dynamic forecast."""
    return forecast_long(
        _hourly_int_series(spark, sf_dir),
        hh=4, p=2, skip=2, mode="ar_yw", yw_method="sm_ols", solver="exact",
    )


def q_arx_std_scaler_forecast(spark, sf_dir):
    """Standard-scaler + pinv forecast lifecycle (A1/A12/W8 scaled path —
    the two previously pytest-only reference semantics), driver-certified
    via affine equivariance: the standard y-scaler drops rectify
    (arx.py:136), making the chain pure-linear, so scaled-fit → forecast →
    inverse-transform is MATHEMATICALLY identical to the unrectified
    exact-Cramer forecast the oracle computes on raw values. Centi-unit
    floor quantization absorbs the solver ulp drift (measured ≤ 1.5e-14
    against a ≥ 2.6e-5 boundary margin; pytest pins the margin)."""
    out = forecast_long(
        _hourly_int_series(spark, sf_dir), hh=4, p=2, spec=1, skip=2, scaler="standard"
    )
    return out.select(
        "source", "t", "h", F.floor(F.col("y_hat") * 100).cast("long").alias("y_hat_c")
    )


def q_ar_yw_forecast(spark, sf_dir):
    """AR via Yule-Walker autocovariance fit (A4), dynamic recursion (C1) —
    exact integer Toeplitz solve on the centered series."""
    return forecast_long(
        _hourly_int_series(spark, sf_dir), hh=4, p=2, skip=2, mode="ar_yw", solver="exact"
    )


def q_arx_symb_forecast(spark, sf_dir):
    """ARX_Symb with an integer-preserving transform (square, written as
    x·x): symbolic design + the scale-corrected forge (P2/W7/W8 — each
    horizon re-applies the transform to its own clipped forecasts), exact
    solver so the whole symbolic recursion is SQL-certified. The scaled
    (MinMax x^1.5/sqrt/log1p) variant stays pinned by the pytest config
    matrix (cfg1/6/7)."""
    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    s = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor(F.col("mean_y") / 4.0).cast("double").alias("y"),
    )
    return forecast_long(
        s, hh=3, p=1, spec=1, skip=2, design="symb", symb_funcs=["square"], solver="exact"
    )


def q_arx_symb_direct_forecast(spark, sf_dir):
    """ARX_Symb_D (arx_symb_d.py:26-192): the symbolic design of
    q_arx_symb_forecast ([1, l1, lag(y²)] — square written as x·x) feeding
    ONE exact OLS per horizon against the zero-tail lead targets, batched
    rectified predict — the symbolic×direct model-family combination, the
    last reference model class to get its own DuckDB certificate (the
    parity pytest test_models.py:35 pins the kernel; this certifies the
    distributed pipeline value-for-value)."""
    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    s = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor(F.col("mean_y") / 4.0).cast("double").alias("y"),
    )
    return forecast_long(
        s, hh=3, p=1, spec=1, skip=2, design="symb", symb_funcs=["square"],
        mode="direct", solver="exact",
    )


def q_arx_exo_forecast(spark, sf_dir):
    """ARX with an exogenous regressor (W2 exo lagging + W6 hide path, which
    repeats the last observable exo lag for h > q): per-source hourly mean
    forecast with the hourly event count as exo input — exact solver, so the
    whole pipeline incl. exo backfill/lag/hide is SQL-certified."""
    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    s = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor("mean_y").cast("double").alias("y"),
        F.col("cnt").cast("double").alias("x_cnt"),
    )
    return forecast_long(s, exo_cols=["x_cnt"], hh=3, p=2, q=1, spec=1, skip=2, solver="exact")


def q_arx_cross_forecast(spark, sf_dir):
    """ARX_Symb CROSS terms (P4, the last fit-path capability without a
    driver certificate): endo×exo product features (y·x computed from
    actuals, lagged, hidden as-of at h ≥ 2 — reference cross semantics,
    arx_symb.py cross=True) with empty transform lists so the design is
    the 4×4-Cramer-expressible [1, l1(y), l1(x), l1(y·x)]. Exo x = 1 +
    t mod 7 (weekday-style, SF-invariant magnitudes, nonzero so backfill
    is a no-op)."""
    from pyspark.sql import Window

    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    w = Window.partitionBy("source").orderBy("bucket_start")
    s = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor("mean_y").cast("double").alias("y"),
        ((F.row_number().over(w) - 1) % 7 + 1).cast("double").alias("x_wd"),
    )
    return forecast_long(
        s, exo_cols=["x_wd"], hh=3, p=1, q=1, spec=1, skip=2,
        design="symb", symb_funcs=[], exo_symb_funcs=[], cross=True, solver="exact",
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal binary columns: deterministic synthetic assets (real BMP/
    WAV/AVI payloads) → Arrow feature-extraction kernel in ``auto`` mode —
    all three formats are REALLY decoded (pure-numpy codecs; the r4 video
    stub is gone: uncompressed RIFF-AVI encode/decode landed in r5).

    The contract exposes the SQL-checkable subset: every value here is a
    *parsed-from-payload* fact (byte counts, BMP/AVI dimensions + frame
    counts, WAV sample rate/frame count, decode flags) that the oracle
    recomputes from the generator's closed-form size arithmetic over
    ``range(400)`` — so the driver certifies the decode path end-to-end, not
    just row counts. RNG-dependent signal features (mean_luma, rms, block
    vectors) stay pytest-certified against codec round-trip fixtures, and
    the decoded video PIXELS are certified by video_frame_luma_synth."""
    from forecaster_spark.operators.multimodal import extract_features, synth_assets

    assets = synth_assets(spark, 400)
    return extract_features(assets, decode="auto", dim=8).select(
        "asset_id", "mime", "n_bytes", "width", "height", "n_frames",
        "sample_rate", "decoded",
    )


def q_video_frame_luma(spark, sf_dir):
    """Video frame decode certified on PIXEL CONTENT: synthetic AVI assets
    carry formula pixels (pixel[f,y,x,c] = (13i+41f+5y+3x+17c) mod 256, see
    multimodal._video_pixels), decode_frames really demuxes + decodes each
    RIFF '00db' frame and emits per-frame integer luma sums
    Σ(299R + 587G + 114B) — pure int64, so the DuckDB oracle recomputes the
    decoded bytes' luma from the closed form. A wrong pixel anywhere in the
    container walk (row padding, bottom-up order, BGR swap, chunk offsets)
    breaks the hash. every_n=2 also certifies the sampling stride."""
    from forecaster_spark.operators.multimodal import decode_frames, synth_assets

    assets = synth_assets(spark, 300)
    return decode_frames(assets, every_n=2).select(
        "asset_id", "frame_idx", "width", "height", "luma_milli"
    )


def q_arx_qof_roll(spark, sf_dir):
    """Rolling-validation QoF (C4/C6 + A6-A11): every rc=2 test steps the
    exact OLS refits on the fixed window ending at the origin, forecasts
    forge-recursively, and the per-horizon TnT metrics accumulate with the
    sequential fold the SQL oracle replays — the full trainNtest_Test
    lifecycle is driver-certified value-for-value."""
    return qof_table(
        _hourly_int_series(spark, sf_dir),
        hh=4, p=2, spec=1, skip=2, validation="roll", solver="exact",
    )


def q_gorilla_pack(spark, sf_dir):
    """Pack the 1m tier into Gorilla blocks; the contract exposes the block
    STATS (count/span per (source, block)) which a SQL oracle can recompute
    — the blob payload itself is certified losslessly by the separate
    gorilla_roundtrip query (decode ≡ plain rollup SQL)."""
    tier = rollup_raw(_events_series(spark, sf_dir), "1m", tie_break=True)
    return pack_rollup_gorilla(tier, "mean_y").select(
        "source", "block_id", "n_points", "ts_min", "ts_max"
    )


def q_retention_1m(spark, sf_dir):
    """Retention window on the 1m tier: keep the newest 600 minute-buckets
    relative to the tier's global max bucket (TimescaleDB retention-policy
    analogue; with date-partitioned tiers this prunes whole partitions)."""
    from forecaster_spark.operators.asof import apply_retention

    t1m = rollup_raw(_events_series(spark, sf_dir), "1m", exact=True)
    return apply_retention(t1m, keep_buckets=600, step_seconds=60).select(*ROLLUP_ORDER)


def q_gorilla_roundtrip(spark, sf_dir):
    """Gorilla codec certified end-to-end by the SQL oracle: the 1m tier is
    packed (delta-of-delta ts + XOR doubles) and decoded again; the decoded
    values must be BIT-identical to the plain rollup SQL — i.e. the codec is
    lossless under the DuckDB comparison, not just row-count-stable."""
    from forecaster_spark.functions.gorilla import unpack_rollup_gorilla

    tier = rollup_raw(_events_series(spark, sf_dir), "1m", exact=True)
    packed = pack_rollup_gorilla(tier, "mean_y")
    return unpack_rollup_gorilla(packed, "mean_y").select(
        "source", F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"), "mean_y"
    )


def q_asof_join(spark, sf_dir):
    """As-of join: each event enriched with the most recent 1m-rollup mean
    (bucket_start ≤ event ts) of its source — using the skew-bounded blocked
    path (block_s), so the scale variant is what the DuckDB native ASOF JOIN
    oracle certifies."""
    from forecaster_spark.operators.asof import asof_join

    left = _ev(spark, sf_dir)
    t1m = rollup_raw(left, "1m", exact=True).select(
        "source", F.col("bucket_start").alias("ts"), F.col("mean_y").alias("m1")
    )
    out = asof_join(left.drop("y"), t1m, block_s=3600)
    return out.select("source", "event_id", "m1_r", F.col("ts_r").cast("timestamp_ntz").alias("ts_r"))


def q_gapfill_grid(spark, sf_dir):
    """Blocked two-phase LOCF gap-fill of the 1m tier onto its dense bucket
    grid (the TimescaleDB time_bucket_gapfill analogue) — the skew-bounded
    pipeline path, certified against a DuckDB generate_series + window
    oracle."""
    from forecaster_spark.operators.gapfill import fill_bucket_gaps_blocked

    t1m = rollup_raw(_events_series(spark, sf_dir), "1m", exact=True)
    out = fill_bucket_gaps_blocked(t1m, 60, ["mean_y"], block_buckets=512)
    return out.select(
        "source",
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "mean_y",
        "is_gap",
    )


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary (engine breadth: classic OLAP agg via
    built-ins; micro-exact sums for cross-engine determinism)."""
    li = read_table(spark, sf_dir, "lineitem")
    m = 1_000_000

    def s(expr):
        return F.sum(F.round(expr * m).cast("long"))

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (s(F.col("l_quantity")) / m).alias("sum_qty"),
            (s(F.col("l_extendedprice")) / m).alias("sum_base_price"),
            (s(disc_price) / m).alias("sum_disc_price"),
            (s(charge) / m).alias("sum_charge"),
            (s(F.col("l_quantity")) / m / F.count(F.lit(1))).alias("avg_qty"),
            (s(F.col("l_discount")) / m / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    """Top-3 events per source by value (deterministic tie-break by id)."""
    from pyspark.sql import Window

    s = _ev(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("y"), F.asc("event_id"))
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("source", "event_id", "y", "rnk")
    )


def q_sessionize(spark, sf_dir):
    """Sessionization: per-user session ids via cumsum of gap>30min flags."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn(
            "session_id",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("user_id", "event_id", "session_id")
    )


def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel view → click → purchase per user: each step counts
    users whose FIRST qualifying event strictly follows their previous
    step's timestamp (classic product-analytics funnel; min-ts chaining).
    All counts exact; the rate is one correctly-rounded division. Plan:
    three user-keyed hash aggs + co-partitioned joins on user_id."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    u2 = (
        ev.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    steps = (
        u1.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit(1).alias("step"), F.lit("view").alias("name"), "n_users")
        .unionAll(u2.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit(2).alias("step"), F.lit("click").alias("name"), "n_users"))
        .unionAll(u3.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit(3).alias("step"), F.lit("purchase").alias("name"), "n_users"))
    )
    base = u1.agg(F.count(F.lit(1)).alias("n_base"))
    return steps.crossJoin(F.broadcast(base)).select(
        "step",
        "name",
        "n_users",
        (F.col("n_users").cast("double") / F.col("n_base")).alias("conversion"),
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier volume: the six-way join flagship — three
    broadcast dims (supplier/nation/region after the region filter) over
    the orders⋈lineitem⋈customer fact chain, revenue as exact micro-unit
    longs. Filters push to the scans; AQE picks the join order."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    m = 1_000_000
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        li.join(o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        (F.sum(F.round(rev * m).cast("long")) / m).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast-revenue: selective filter → single global agg.
    The filters push down to the parquet scan (PushedFilters in explain)."""
    li = read_table(spark, sf_dir, "lineitem")
    m = 1_000_000
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(F.round(rev * m).cast("long")) / m).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q3_CUT = "1998-06-01"


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority (adapted to the testdata star schema):
    broadcast the filtered customer dim into orders, shuffle-join lineitem,
    top-10 orders by micro-exact revenue (tie-break by orderkey)."""
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(_Q3_CUT))
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(_Q3_CUT))
    m = 1_000_000
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(F.round(rev * m).cast("long")) / m).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"), "revenue")
    )


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 order-priority checking (adapted: 'late' = any lineitem
    shipped >60 days after the order date, since the testdata has no
    commit/receipt dates): EXISTS semi-join shape — the lineitem side is
    aggregated to nothing, it only gates orders. Spark left_semi with a
    non-equi residual keeps the hashed equi-key plan (one shuffle on
    orderkey; the orders side is the small filtered one)."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_customers_without_orders(spark, sf_dir):
    """TPC-H Q22-like negative join: DORMANT customers — no orders since
    2001 — counted per market segment with their exact centi-unit
    account balance sum. left_anti on custkey against the date-filtered
    orders (filter pushed into the probe scan) — the complement shape of
    Q4's semi-join; the anti side stays shuffle-hashed on the key."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    no_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0
        ).alias("sum_acctbal"),
    )


def q_nation_revenue(spark, sf_dir):
    """TPC-H Q5-like: revenue per nation for ASIA-region customers, 1996-97.
    nation/region are broadcast dims; the fact-side join order lets Catalyst
    keep one shuffle (orders⋈lineitem on orderkey)."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    m = 1_000_000
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dim = cust.join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(F.round(rev * m).cast("long")) / m).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14-like: revenue share of 'PROMO%' parts per month of 1997.
    part is a broadcast dim; the conditional aggregate stays in one pass."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    m = 1_000_000
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            (F.sum(F.round(promo * m).cast("long")) / m).alias("promo_revenue"),
            (F.sum(F.round(rev * m).cast("long")) / m).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_supplier_volume(spark, sf_dir):
    """Top-10 suppliers by shipped quantity (broadcast supplier dim,
    deterministic tie-break by suppkey)."""
    sup = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    m = 1_000_000
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            (F.sum(F.round(F.col("l_quantity") * m).cast("long")) / m).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("total_qty"), F.asc("s_suppkey"))
        .limit(10)
    )


def q_rollup_cube(spark, sf_dir):
    """Grouping-sets breadth: GROUP BY ROLLUP(event_type, day) — per-type
    daily, per-type total, and grand total in one pass (partial aggregation
    applies per grouping set; no raw rescan per level)."""
    ev = read_table(spark, sf_dir, "events")
    m = 1_000_000
    return (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .rollup(F.col("event_type").alias("source"), F.col("day"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.round(F.col("value") * m).cast("long")) / m).alias("sum_v"),
        )
    )


def q_distinct_users(spark, sf_dir):
    """Distinct aggregation: exact user cardinality per event_type (Spark
    expands distinct into a two-phase partial agg — still one raw scan)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("source")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_tfidf_topk(spark, sf_dir):
    """Per-doc top-3 keywords by log-free TF-IDF (tf·N/df, exact-integer
    division; term-asc tie-break makes ranks engine-independent)."""
    from forecaster_spark.operators.textops import tfidf_topk

    return tfidf_topk(read_table(spark, sf_dir, "documents"), k=3)


def q_token_histogram(spark, sf_dir):
    """Token histogram: explode BPE-ish segments → top-50 by count (the
    vocabulary-stats primitive for training-data pipelines)."""
    from forecaster_spark.operators.textops import BPE_ISH

    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.regexp_extract_all("text", F.lit(BPE_ISH), 0)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(50)
    )


def q_backcast_fill(spark, sf_dir):
    """Reference-exact weighted backcast (W4/W5): zero out each series'
    first 6 rows (a leading-zero prefix the backcast must fill right-to-left
    as repeated (1/3)·next) plus scattered mid-series zeros (which must stay
    zero — only LEADING zeros are missing-value sentinels)."""
    from pyspark.sql import Window

    s = _ev(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("ts", "event_id")
    s = s.withColumn(
        "y",
        F.when(
            (F.row_number().over(w) <= 6) | (F.col("event_id") % 97 == 5), F.lit(0.0)
        ).otherwise(F.col("y")),
    )
    return backcast_fill(s, ["y"], order=["ts", "event_id"]).select("source", "event_id", "y")


def q_rollup_1m_salted(spark, sf_dir):
    """Salted two-phase rollup (hot-source skew machinery): phase-1 partials
    per (source, bucket, salt) merged in phase 2 — must equal the plain
    rollup SQL bit-for-bit, so the skew path is driver-certified, not just
    pytest-proven identical."""
    from forecaster_spark.plans.skew import salted_rollup_raw

    return salted_rollup_raw(
        _events_series(spark, sf_dir), "1m", n_salt=8, exact=True
    ).select(*ROLLUP_ORDER)


def q_rollup_merge_increment(spark, sf_dir):
    """Incremental continuous-aggregate refresh (TimescaleDB-style): the
    series splits at its midpoint into history + new batch, each rolled with
    carried first/last observation timestamps; buckets straddling the cut
    merge with the full algebra. merged ≡ one-shot rollup SQL — the raw
    history is never rescanned."""
    from forecaster_spark.operators.rollup import merge_rollup_increment

    s = _events_series(spark, sf_dir)
    b = s.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    cut = b["lo"] + (b["hi"] - b["lo"]) / 2
    hist = rollup_raw(s.where(F.col("ts") < F.lit(cut)), "1m", exact=True, keep_ts=True)
    delta = rollup_raw(s.where(F.col("ts") >= F.lit(cut)), "1m", exact=True, keep_ts=True)
    return merge_rollup_increment(hist, delta, exact=True).select(*ROLLUP_ORDER)


def q_checkpoint_resume(spark, sf_dir):
    """Checkpoint/resume: the 1m tier is committed once under a StageRunner
    root; a second runner resumes with a build_fn that would FAIL if invoked
    — the resumed read-back (no recompute) must equal the rollup SQL, and
    the metrics table must record the stage as skipped-committed."""
    import tempfile

    from forecaster_spark.plans.checkpoint import StageRunner

    root = tempfile.mkdtemp(prefix="contract_ckpt_")
    s = _events_series(spark, sf_dir)
    StageRunner(spark, root).stage(
        "t1m", lambda: rollup_raw(s, "1m", exact=True).select(*ROLLUP_ORDER)
    )

    def must_not_rebuild():
        raise AssertionError("resume must read the committed stage, not rebuild")

    r2 = StageRunner(spark, root, verify_on_resume=True)
    out = r2.stage("t1m", must_not_rebuild)
    assert r2.metrics().where("skipped = true").count() >= 1, "resume not recorded"
    return out.select(*ROLLUP_ORDER)


def q_stream_rollup_1m(spark, sf_dir):
    """Structured Streaming 1m rollup ≡ batch oracle: the events series is
    streamed file-by-file (2 micro-batches — the minimum that still proves
    cross-micro-batch accumulation; more batches only multiply state-store
    overhead, watermarked event-time windows, complete mode) through the
    same exact-sum aggregate algebra as the batch tier; the final streamed
    state must equal the batch rollup SQL bit-for-bit."""
    import tempfile

    from forecaster_spark.streaming.rollup_stream import SERIES_SCHEMA, stream_rollup_1m

    d = tempfile.mkdtemp(prefix="contract_stream_")
    s = _events_series(spark, sf_dir)
    # two time-half files via filters (repartitionByRange would add a range-
    # sampling job + a shuffle just to split the input for the stream)
    b = s.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = b["lo"] + (b["hi"] - b["lo"]) / 2
    s.where(F.col("ts") < F.lit(mid)).coalesce(1).write.mode("append").parquet(d)
    s.where(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(SERIES_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    rolled = stream_rollup_1m(stream, watermark="10 minutes", tie_break=True, exact=True)
    qname = "contract_stream_rollup_1m"
    # state-store count = shuffle partitions; 32 stores × 4 micro-batches is
    # pure overhead at contract scale — correctness (exact sums, complete
    # mode) is partition-count-invariant, so run the stream on 8
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = rolled.writeStream.outputMode("complete").format("memory").queryName(qname).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(qname).select(*ROLLUP_ORDER)


def q_stream_tier_upsert(spark, sf_dir):
    """foreachBatch keyed-upsert streaming sink ≡ batch rollup: the events
    series streams file-by-file (2 micro-batches) through the watermarked
    1m aggregate in UPDATE mode, and every emitted window is keyed-upserted
    into an on-disk parquet tier (drop matching (source, bucket_start)
    keys, union, atomic rewrite — the local-FS stand-in for an
    Iceberg/Delta row-level MERGE). The final tier read back from disk must
    equal the batch rollup SQL bit-for-bit, certifying the sink's
    idempotent-upsert convergence, not just the in-memory stream state."""
    import tempfile

    from forecaster_spark.streaming.rollup_stream import stream_rollup_to_tier

    d = tempfile.mkdtemp(prefix="contract_upsert_in_")
    tier_dir = tempfile.mkdtemp(prefix="contract_upsert_out_") + "/t1m"
    s = _events_series(spark, sf_dir).persist()
    b = s.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = b["lo"] + (b["hi"] - b["lo"]) / 2
    s.where(F.col("ts") < F.lit(mid)).coalesce(1).write.mode("append").parquet(d)
    s.where(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode("append").parquet(d)
    s.unpersist()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream_rollup_to_tier(spark, d, tier_dir, tie_break=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.read.parquet(tier_dir).select(*ROLLUP_ORDER)


def q_stream_sessionize(spark, sf_dir):
    """Second custom stateful streaming operator (applyInPandasWithState):
    gap-based sessionization with the session counter + last event second
    in keyed state. The events stream arrives in 2 time-half micro-batches
    (minimum that proves state crosses a batch boundary); the streamed
    session ids must equal the batch sessionize SQL bit-for-bit."""
    import tempfile

    from forecaster_spark.streaming.stateful import stream_sessionize

    d = tempfile.mkdtemp(prefix="contract_streamsess_")
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = b["lo"] + (b["hi"] - b["lo"]) / 2
    ev.where(F.col("ts") < F.lit(mid)).coalesce(1).write.mode("append").parquet(d)
    ev.where(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    qname = "contract_stream_sessionize"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_sessionize(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(qname).select("user_id", "event_id", "session_id")


def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): the events
    stream arrives in 2 micro-batches split by event_id parity, with
    every 10th even event RE-DELIVERED in the second batch (an
    at-least-once source crossing the batch boundary). The streamed
    output must be each event exactly once ≡ the plain events SQL. The
    30-day dedup horizon exceeds the table's time span, so no state is
    evicted mid-proof; production sizes it to the redelivery window."""
    import tempfile

    from forecaster_spark.streaming.stateful import stream_dedup

    d = tempfile.mkdtemp(prefix="contract_streamdedup_")
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    even = ev.where(F.col("event_id") % 2 == 0)
    odd = ev.where(F.col("event_id") % 2 == 1)
    dups = even.where(F.col("event_id") % 10 == 0)
    even.coalesce(1).write.mode("append").parquet(d)
    odd.unionAll(dups).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    qname = "contract_stream_dedup"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_dedup(stream, ["event_id"])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(qname).select("event_id", "ts", "value")


def q_time_weighted_avg(spark, sf_dir):
    """TimescaleDB time_weight analogue: trapezoidal time-weighted hourly
    mean over the irregular event series (micro-exact pair sums, ms-integer
    time), vs the plain mean which over-counts burst periods."""
    from forecaster_spark.operators.timeweight import time_weighted_avg

    return time_weighted_avg(_ev(spark, sf_dir), value="y", bucket_unit="hour").select(
        "source", "bucket_start", "twa", "n_points", "span_ms"
    )


def q_linear_deriv(spark, sf_dir):
    """PromQL deriv + predict_linear analogue: per-(source, hour)
    least-squares slope of value over in-bucket seconds, plus the linear
    extrapolation 1800 s past the bucket start — exact integer moments
    (milli-unit values, relative-second times) with fixed-order division
    chains the oracle replays bit-for-bit."""
    from forecaster_spark.operators.timeweight import linear_deriv

    return linear_deriv(_ev(spark, sf_dir), value="y", bucket_unit="hour")


def q_counter_delta(spark, sf_dir):
    """PromQL increase / TimescaleDB counter_agg analogue: a synthetic
    per-source monotonic counter (running micro-sum mod 1e10 — i.e. with
    rollover resets) whose reset-corrected total rise the operator must
    recover exactly."""
    from pyspark.sql import Window

    from forecaster_spark.operators.timeweight import counter_delta

    s = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    vq = F.round(F.col("y") * 1_000_000).cast("long")
    s = s.withColumn("y", (F.sum(vq).over(w) % F.lit(10_000_000_000)) / 1_000_000.0)
    return counter_delta(s, value="y").select("source", "increase", "n_resets", "n_points")


def q_session_stats(spark, sf_dir):
    """Session-level analytics on top of sessionization: per (user, session)
    duration (integer seconds) and event count, aggregated to per-user
    session stats — the funnel/engagement primitive."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        (
            F.unix_timestamp(F.max("ts").cast("timestamp"))
            - F.unix_timestamp(F.min("ts").cast("timestamp"))
        ).alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_s").alias("total_dur_s"),
        F.max("n_events").alias("max_session_events"),
    )


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted by
    distinct active users per day offset — the classic training-data /
    product analytics breadth query, all exact integer aggregation."""
    ev = read_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    j = ev.join(F.broadcast(first_day), "user_id")
    return (
        j.groupBy(
            F.col("cohort_day").cast("timestamp_ntz").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events"))
    )


def q_quantiles(spark, sf_dir):
    """Exact interpolated quantiles per source: Spark's sort-based
    ``percentile`` and DuckDB's ``quantile_cont`` share the (n−1)·p linear
    interpolation, verified bit-equal — the per-source latency-percentile
    primitive (p50/p75/p90/p99) with a value-level oracle."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("source")).agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def q_ewma(spark, sf_dir):
    """EWMA (α=0.25) over the hourly integer signal — the sequential
    smoothing chain replayed bit-for-bit by a row-stepping recursive-CTE
    oracle."""
    from forecaster_spark.operators.timeweight import ewma

    return ewma(_hourly_int_series(spark, sf_dir), alpha=0.25).select(
        "source", F.col("ts").cast("timestamp_ntz").alias("ts"), "y", "ewma"
    )


def q_rolling_zscore(spark, sf_dir):
    """Rolling z-score anomaly detection (trailing 50 events, |z| > 3):
    exact milli-unit window sums make every score bit-reproducible in SQL
    window frames — pure Catalyst expressions, no Python."""
    from forecaster_spark.operators.timeweight import rolling_zscore

    return rolling_zscore(_ev(spark, sf_dir), window_n=50).select(
        "source", "event_id", "z", "is_anomaly"
    )


def q_holt_linear(spark, sf_dir):
    """Holt double exponential smoothing (level + trend, α=0.25 β=0.5) over
    the hourly integer signal — the trend-aware sibling of EWMA, replayed
    bit-for-bit by a row-stepping recursive-CTE oracle carrying (level,
    trend) state with IEEE-identical expression shapes."""
    from forecaster_spark.operators.timeweight import holt_linear

    return holt_linear(_hourly_int_series(spark, sf_dir), alpha=0.25, beta=0.5).select(
        "source",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "y",
        "level",
        "trend",
        "fc1",
    )


def q_holt_winters(spark, sf_dir):
    """Holt-Winters additive triple smoothing (level + trend + 24-hour
    seasonal, α=0.25 β=0.5 γ=0.125) over the hourly integer signal —
    completes the classical family (EWMA → Holt → HW). The recursive-CTE
    oracle carries a LENGTH-24 list of trailing seasonals in its state and
    replays every fixed-order float chain bit-for-bit."""
    from forecaster_spark.operators.timeweight import holt_winters

    return holt_winters(
        _hourly_int_series(spark, sf_dir), alpha=0.25, beta=0.5, gamma=0.125, period=24
    ).select(
        "source",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "y",
        "level",
        "trend",
        "seasonal",
        "fc1",
    )


def q_sax_symbols(spark, sf_dir):
    """SAX symbolic discretization (PAA width-8 segments over the hourly
    integer signal, empirical-quartile alphabet 'abcd') — exact-integer
    variant; quartiles on quadrupled segment sums."""
    from forecaster_spark.operators.downsample import sax_symbols

    return sax_symbols(_hourly_int_series(spark, sf_dir), width=8)


def q_kalman_level(spark, sf_dir):
    """Kalman local-level filter (q=0.25, r=4.0) over the hourly integer
    signal — optimal-gain smoothing with a (x, P) recursive-CTE oracle:
    every step is singly-rounded adds/multiplies and ONE division, so the
    full-precision walk replays bit-for-bit with no quantization."""
    from forecaster_spark.operators.timeweight import kalman_level

    return kalman_level(_hourly_int_series(spark, sf_dir), q=0.25, r=4.0).select(
        "source",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "y",
        "x",
        "gain",
        "p_var",
    )


def q_time_in_state(spark, sf_dir):
    """TimescaleDB state_agg analogue: per-(source, state) held duration /
    entry count over a 3-way value banding of the event stream — exact
    integer-millisecond window+agg, one shuffle."""
    from forecaster_spark.operators.timeweight import time_in_state

    s = _ev(spark, sf_dir).withColumn(
        "state",
        F.when(F.col("y") < 25, "low").when(F.col("y") < 75, "mid").otherwise("high"),
    )
    return time_in_state(s).select("source", "state", "dur_ms", "n_entries", "n_points")


def q_heartbeat_agg(spark, sf_dir):
    """TimescaleDB heartbeat_agg analogue: liveness accounting (30-min
    heartbeat validity) per source — live/dead ms partition the observed
    span exactly; integer-ms arithmetic end to end."""
    from forecaster_spark.operators.timeweight import heartbeat_agg

    return heartbeat_agg(_ev(spark, sf_dir), threshold_ms=1_800_000).select(
        "source", "n_heartbeats", "live_ms", "dead_ms", "max_gap_ms", "n_dead_gaps"
    )


def q_ohlc(spark, sf_dir):
    """OHLC candlestick tier (TimescaleDB candlestick_agg analogue):
    first/last/min/max per (source, hour) — pure selections, engine-exact;
    the min_by/max_by HashAggregate fast path (ts unique per source in this
    corpus; tie_break=True struct path covered by pytest)."""
    from forecaster_spark.operators.timeweight import ohlc

    return ohlc(_ev(spark, sf_dir), tie_break=False).select(
        "source", "bucket_start", "open", "high", "low", "close", "n"
    )


def q_cusum(spark, sf_dir):
    """Two-sided CUSUM change detection — exact integer milli-unit
    arithmetic; the max(0,·) reset recurrence rewritten as cumsum minus
    running-min (pure Catalyst windows, no Python), replayed by the same
    two-window SQL."""
    from forecaster_spark.operators.timeweight import cusum

    return cusum(_ev(spark, sf_dir), slack_milli=5_000, threshold_milli=500_000).select(
        "source", "event_id", "s_pos", "s_neg", "is_change"
    )


def q_seasonal_profile(spark, sf_dir):
    """Seasonal (hour-of-day) profile per source — the seasonal-naive
    baseline fold: exact micro-unit sums + truncating integer means over
    24·|sources| cells, map-side combinable."""
    from forecaster_spark.operators.timeweight import seasonal_profile

    return seasonal_profile(_ev(spark, sf_dir)).select(
        "source", "hod", "n", "sum_micro", "mean_micro"
    )


def q_bigram_collocations(spark, sf_dir):
    """Top-50 adjacent word-pair collocations with PMI ingredients (pair +
    unigram counts) — all-integer counts, lexicographic tie-break, Spark
    split/array_remove ≡ DuckDB string_split_regex/list_filter."""
    from forecaster_spark.operators.textops import bigram_collocations

    return bigram_collocations(read_table(spark, sf_dir, "documents"), topk=50)


def q_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION (r5): encode the corpus with the frozen
    10-merge demo tokenizer (learned from this corpus by bpe_learn,
    inlined as identical literals in both engines) — GPT-2-style
    min-rank merge loop per word, memoized over the vocabulary. The
    certified columns include the reference polynomial checksum over the
    flattened subword token stream, so the oracle (a recursive-CTE state
    machine replaying the merge loop) certifies the exact token SEQUENCE
    per document. Completes induction → application → packing."""
    from forecaster_spark.operators.textops import bpe_encode

    return bpe_encode(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "n_subwords", "bpe_checksum"
    )


def q_quality_classifier(spark, sf_dir):
    """Linear quality-classifier scoring (r5, VERDICT #8): exact integer
    features, binary-exact weights, power-of-two length cap, fixed
    left-assoc score chain — the DOUBLE score and the keep verdict are
    bit-identical cross-engine (no margin analysis needed)."""
    from forecaster_spark.operators.textops import quality_classifier

    return quality_classifier(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "sw_hits", "n_punct", "n_digits", "score", "keep"
    )


def q_bpe_merge_round(spark, sf_dir):
    """Distributed tokenizer induction, one exact BPE merge-count round
    (r5, VERDICT #4 — Sennrich et al. 2016): corpus collapses to the
    (word, freq) vocabulary once, adjacent character-pair counts explode
    off the DISTINCT words weighted by freq, top-20 merge candidates with
    the deterministic (count desc, pair asc) order. Iterated learning
    (bpe_learn) is pytest-certified against a pure-Python Sennrich
    reference; this single-round ledger is the SQL-checkable surface."""
    from forecaster_spark.operators.textops import bpe_merge_round

    return bpe_merge_round(read_table(spark, sf_dir, "documents"), topk=20).select(
        "rnk", "left_s", "right_s", "pair_n"
    )


def q_dedup_keep_list(spark, sf_dir):
    """Pairs → clusters → keep/drop verdicts: SimHash near-dup pairs feed
    distributed min-label propagation (connected components), the minimum
    id is each cluster's canonical doc, and every corpus document gets a
    (cluster_id, keep) row. The oracle clusters the brute-force pair set
    with a recursive-CTE transitive closure — a different pair algorithm
    AND a different fixpoint, both certified at once."""
    from forecaster_spark.operators.dedup import dedup_keep_list, simhash, simhash_neardup_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = simhash_neardup_pairs(simhash(docs), max_hamming=3)
    return dedup_keep_list(docs, pairs).select("doc_id", "cluster_id", "keep")


def q_mad_anomaly(spark, sf_dir):
    """Robust median/MAD anomaly flags per source — the 50%-breakdown-point
    outlier filter (a rolling z-score's mean/std get dragged by the very
    burst it should flag). Medians in doubled/quadrupled micro-units keep
    the even-count interpolation integer-valued, so Spark ``percentile`` ≡
    DuckDB ``quantile_cont`` bit-equal and the ``1000·dev > k·MAD`` verdict
    is an exact integer comparison on both engines."""
    from forecaster_spark.operators.timeweight import mad_anomaly

    return mad_anomaly(_ev(spark, sf_dir), k_milli=3000).select(
        "source", "event_id", "y", "med", "mad", "is_anomaly"
    )


def q_rolling_median(spark, sf_dir):
    """Trailing 7-row rolling median per source — the local robust
    smoother. Doubled micro-units keep the even-frame interpolation
    integer-valued (head frames vary in parity), so Spark ``percentile``
    over the rows frame ≡ DuckDB windowed ``quantile_cont`` bit-equal."""
    from forecaster_spark.operators.timeweight import rolling_median

    return rolling_median(_ev(spark, sf_dir), window=7).select(
        "source", "event_id", "y", "med_roll"
    )


def q_acf(spark, sf_dir):
    """Integer-centered ACF lags 1..5 per source (reference ar_yw.py:88-94
    builds exactly these autocovariances for the Yule-Walker solve).
    gamma_k are exact BIGINT sums of centi-unit deviation products; rho is
    a single IEEE division of two < 2^53 integers — engine-exact."""
    from forecaster_spark.operators.timeweight import acf

    return acf(_ev(spark, sf_dir), max_lag=5)


def q_pacf(spark, sf_dir):
    """Yule-Walker PACF lags 1..3 per source (statsmodels pacf_yw
    semantics; the order-selection companion of q_acf — reference
    ar_yw.py solves these Toeplitz systems). Deci-unit exact-integer
    autocovariances, Cramer determinant ratios computed as exact Python
    ints in an Arrow kernel and divided once through the DuckDB
    HUGEINT->DOUBLE cast mimic — bit-identical to the HUGEINT SQL."""
    from forecaster_spark.operators.timeweight import pacf

    return pacf(_ev(spark, sf_dir))


def q_ccf(spark, sf_dir):
    """Cross-correlation click-vs-view at lags -3..3 over the shared
    1-minute grid (the ARX exo-selection primitive: which exo lag drives
    the endo). gxy are exact BIGINT sums of centi-unit deviation
    products; r = gxy / sqrt(double(gx0)*double(gy0)) is three
    correctly-rounded IEEE ops in fixed order — engine-exact."""
    from forecaster_spark.operators.timeweight import ccf

    return ccf(_ev(spark, sf_dir), "click", "view", max_lag=3)


def q_hdr_quantiles(spark, sf_dir):
    """Percentiles from a mergeable HDR log-bucket histogram: 1m counter
    partials sum-merged per source (the tier cascade read path), then
    p50/p90/p99 = smallest bin lower bound reaching ceil(q*n/100).
    The oracle computes the SAME sketch direct from raw — a match
    certifies the merge, exactly like the HLL query. All-integer until
    one /100.0 per output; bit lengths via binary-string length on both
    engines (no float log2 tie-break risk)."""
    from forecaster_spark.operators.sketches import hdr_histogram_partials, hdr_quantiles

    parts = hdr_histogram_partials(_ev(spark, sf_dir))
    return hdr_quantiles(parts)


def q_seasonal_decompose(spark, sf_dir):
    """Classical decomposition y = trend + seasonal + resid per source
    (statsmodels seasonal_decompose analogue, robust median trend):
    49-point trailing median trend in doubled micro-units, hour-of-day
    floor-division seasonal means of the detrended series, exact
    remainder. Reconstruction is bit-exact by construction."""
    from forecaster_spark.operators.timeweight import seasonal_decompose

    return seasonal_decompose(_ev(spark, sf_dir)).select(
        "source", "ts", "event_id", "y", "trend", "seasonal", "resid"
    )


def q_croston(spark, sf_dir):
    """Croston intermittent-demand forecast over a genuinely sparse
    series (per-minute purchase demand with value > 100 — 2.6% of grid
    minutes at sf0.01), 4 user-bucket series. The compressed nonzero-
    demand rows carry exact centi-unit sizes and integer minute indexes;
    the coupled size/interval smoothers (alpha=0.25, exact 1-alpha) are
    replayed bit-for-bit by a row-stepping recursive-CTE oracle."""
    from forecaster_spark.operators.timeweight import croston

    ev = read_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    )
    b = ev.groupBy(
        F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string")).alias("source"),
        F.expr("unix_micros(date_trunc('minute', ts)) div 60000000").alias("m"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("d"))
    return croston(b)


def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust slope per (source, hour): median of pairwise
    floor-divided integer slopes (1e-5 units/sec quanta), median in
    doubled quanta, one final /2e5 — engine-exact; the robust
    counterpart of linear_deriv's least-squares slope."""
    from forecaster_spark.operators.timeweight import theil_sen

    return theil_sen(_ev(spark, sf_dir))


def q_burstiness(spark, sf_dir):
    """Index of dispersion of per-minute event counts per source over the
    spanned grid (zero minutes in closed form, never materialized):
    (N*sum(c^2) - S^2) / (N*S) — one IEEE division of exact integers."""
    from forecaster_spark.operators.timeweight import burstiness

    return burstiness(_ev(spark, sf_dir))


def q_tokens_checksum(spark, sf_dir):
    """The north-rule per-row token-array invariant IN THE HARD GATE:
    deterministic tokens (cross-engine word hash mod 2^31 per split
    position) + the reference polynomial checksum sum(tok_i * 31^(n-1-i))
    mod 2^64 computed by the PIPELINE's own token_checksum_fast kernel —
    the oracle re-derives the tokens and folds the same polynomial in
    HUGEINT, so a checksum match certifies token-array equality per doc."""
    from forecaster_spark.operators.seriesify import token_checksum_fast
    from forecaster_spark.operators.textops import text_tokens

    t = text_tokens(read_table(spark, sf_dir, "documents"))
    return t.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        token_checksum_fast(F.col("tokens")).alias("tok_checksum"),
    )


def q_simpson_diversity(spark, sf_dir):
    """Inverse-Simpson lexical diversity per document (log-free Rényi-2
    'effective vocabulary size' n²/Σc² — exact integer ingredients, one
    IEEE division; the whole-distribution complement of the Gopher modal
    fractions)."""
    from forecaster_spark.operators.textops import simpson_diversity

    return simpson_diversity(read_table(spark, sf_dir, "documents"))


def q_trimmed_mean(spark, sf_dir):
    """Rank-based 5% trimmed mean per source (robust location estimate;
    exact micro-unit sum over the rank-retained rows, truncating integer
    mean, one final /1e6 — engine-exact, deterministic under ties via
    the (value, event_id) rank order)."""
    from forecaster_spark.operators.timeweight import trimmed_mean

    return trimmed_mean(_ev(spark, sf_dir))


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition/boilerplate signals per document
    (dup-word / modal-word / dup-bigram / rep-2-gram fractions), all from
    exact integer count ingredients; fractions are single divisions of
    exact small integers so the doubles match bit-for-bit."""
    from forecaster_spark.operators.textops import repetition_signals

    return repetition_signals(read_table(spark, sf_dir, "documents"))


def q_interval_join(spark, sf_dir):
    """Range (interval) join via time-grid equi-join — NOT a
    BroadcastNestedLoopJoin: per-source top-3 busiest hours become 60-min
    windows shifted +10 min (straddling two grid cells each), every event
    lands in its cell, and the join runs on (source, cell) + exact range
    filter. Exact micro sums per interval certify the match set."""
    from pyspark.sql import Window

    from forecaster_spark.operators.asof import interval_join

    ev = _ev(spark, sf_dir)
    busy = ev.groupBy("source", F.date_trunc("hour", "ts").alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("b"))
    iv = (
        busy.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "source",
            (F.col("b") + F.expr("interval 10 minutes")).alias("ivl_start"),
            (F.col("b") + F.expr("interval 70 minutes")).alias("ivl_end"),
        )
    )
    return (
        interval_join(ev, iv)
        .groupBy("source", "ivl_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("y") * 1_000_000).cast("long")).alias("sum_micro"),
        )
    )


def q_lttb_downsample(spark, sf_dir):
    """LTTB downsampling (TimescaleDB lttb hyperfunction analogue): each
    source's series reduced to 20 visually-representative points via exact
    integer triangle areas — the sequential bucket walk is certified by a
    recursive-CTE DuckDB oracle."""
    from forecaster_spark.operators.downsample import lttb

    return lttb(_ev(spark, sf_dir), k=20)


def q_csv_source_rollup(spark, sf_dir):
    """S1 CSV source in the driver gate: the events series round-trips
    through a CSV sink + ``read_csv_series`` (header scan, schema inference,
    column projection — the reference's only input path,
    Example_Covid19.py:122-126), then aggregates with exact sums; the result
    must equal SQL over the original parquet — i.e. the CSV write/read is
    value-lossless (Spark emits shortest-round-trip doubles)."""
    import tempfile

    from forecaster_spark.sources.readers import read_csv_series

    d = tempfile.mkdtemp(prefix="contract_csv_")
    _ev(spark, sf_dir).select("source", "event_id", "y").write.mode("overwrite").option(
        "header", True
    ).csv(d)
    back = read_csv_series(spark, d, ["source", "event_id", "y"])
    m = 1_000_000
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("y") * m).cast("long")) / m).alias("sum_y"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.sum("event_id").alias("sum_id"),
    )


def q_jsonl_source_rollup(spark, sf_dir):
    """S1 JSONL source in the driver gate: the events series round-trips
    through a JSON-lines sink + ``read_jsonl_series`` (DECLARED schema —
    no inference pass), then aggregates with exact sums; equality with SQL
    over the original parquet proves the JSON write/read is value-lossless
    (Spark emits shortest-round-trip doubles)."""
    import tempfile

    from pyspark.sql import types as T

    from forecaster_spark.sources.readers import read_jsonl_series

    d = tempfile.mkdtemp(prefix="contract_jsonl_")
    _ev(spark, sf_dir).select("source", "event_id", "y").write.mode("overwrite").json(d)
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("y", T.DoubleType()),
        ]
    )
    back = read_jsonl_series(spark, d, schema)
    m = 1_000_000
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("y") * m).cast("long")) / m).alias("sum_y"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.sum("event_id").alias("sum_id"),
    )


def q_feature_topk(spark, sf_dir):
    """Top-k feature selection per source (squared-correlation relevance
    over [y lags 1..4, hourly count, time index]) — the torch-free analogue
    of the reference's attention-heat-map top-k feature selection
    (Example_Covid19.py:103-118), exact integer sums so every score is
    SQL-certified."""
    from forecaster_spark.models.kernels import feature_topk

    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    s = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor("mean_y").cast("double").alias("y"),
        F.col("cnt").cast("double").alias("x_cnt"),
    )
    s = FT.with_time_index(FT.with_lags(s, "y", 4, order="ts"), order="ts")
    return feature_topk(
        s, ["y_lag1", "y_lag2", "y_lag3", "y_lag4", "x_cnt", "t"], k=3
    )


def q_stream_locf(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): the
    nulled series streams in 2 time-half micro-batches (written
    sequentially so file mtimes fix the trigger order — 2 is the minimum
    that still proves state carries ACROSS batches; more batches only
    multiply trigger overhead); LOCF state carries the last observation
    across the batch boundary, and the result must equal the batch LOCF
    SQL bit-for-bit."""
    import tempfile

    from forecaster_spark.streaming.stateful import stream_locf

    d = tempfile.mkdtemp(prefix="contract_statestream_")
    nulled = _ev_nulled(spark, sf_dir).select("source", "ts", "event_id", "y")
    b = nulled.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    n_batches = 2
    step = (b["hi"] - b["lo"]) / n_batches
    for i in range(n_batches):
        lo = b["lo"] + step * i
        cond = (F.col("ts") >= F.lit(lo)) if i else F.lit(True)
        if i < n_batches - 1:
            cond = cond & (F.col("ts") < F.lit(b["lo"] + step * (i + 1)))
        nulled.where(cond).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("source string, ts timestamp, event_id long, y double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    qname = "contract_stream_locf"
    # state-store count = shuffle partitions; 8 is plenty for 5 sources
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_locf(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(qname).select("source", "event_id", "y")


# -- mergeable sketches (engine additions; SURVEY §2.4 notes the reference
# -- has no approx sketches) -------------------------------------------------


def q_hll_distinct_users(spark, sf_dir):
    """Mergeable HLL-style distinct-user registers per (source, 1h bucket):
    Spark builds 1m register partials and CASCADES them to 1h (register-wise
    max — the same partial-merge shape as the rollup tier cascade), while
    the oracle recomputes registers directly from raw rows, so a value match
    certifies BOTH the cross-engine splitmix64 register pipeline AND merge
    associativity. The integer registers are the contract artifact; the
    float cardinality estimate they imply is pinned in pytest
    (tests/test_sketches.py) against exact distinct counts."""
    from forecaster_spark.operators import sketches

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"), "ts", "user_id"
    )
    p1m = sketches.hll_partials(ev, key="user_id", bucket_unit="minute")
    return sketches.hll_merge(p1m, to_unit="hour").select(
        "source", "bucket_start", "reg", "rho"
    )


def q_cm_sketch(spark, sf_dir):
    """Count-min sketch counters over document words (heavy-hitter token
    counting without a per-token shuffle): the kernel folds each Arrow batch
    into a local depth×width counter array and ships only sketch cells —
    ≤ depth·width rows per batch — which then SUM-merge, the count-min's
    defining mergeability. Every cell is replayed by the DuckDB oracle via
    the shared word-hash CTEs; point-estimate guarantees (est ≥ true,
    est ≤ true + ε·N) are pinned in pytest."""
    from forecaster_spark.operators import sketches

    return sketches.cm_sketch(read_table(spark, sf_dir, "documents")).select(
        "depth", "col", "cnt"
    )


def _hourly_micro_buckets(spark, sf_dir):
    """Hourly exact rollup exposing the floor-quantized BIGINT micro-mean
    (``sum_micro div cnt``) — the engine-exact integer signal the
    profile/indicator operators consume (both engines floor-divide)."""
    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    return t.select(
        "source", "bucket_start", F.expr("sum_micro div cnt").alias("v_micro")
    )


def q_matrix_profile(spark, sf_dir):
    """Squared-distance matrix profile (Yeh et al. ICDM'16) per source over
    the hourly tier, m=4: for every subsequence, the exact BIGINT squared
    distance to its nearest non-trivial neighbor (|i-j| >= m) and that
    neighbor's position (smallest on ties). Motif minima / discord maxima —
    the non-linear companion of q_acf's order diagnostics. Arrow numpy
    kernel per series ≡ DuckDB O(n²) self-join replay, bit-exact."""
    from forecaster_spark.operators.motifs import matrix_profile

    return matrix_profile(_hourly_micro_buckets(spark, sf_dir), m=4).select(
        "source", "pos", "mp_sq", "nn_pos"
    )


def q_bollinger(spark, sf_dir):
    """Bollinger band breakouts over the trailing 24 raw events per source:
    the mean ± 2σ test cross-multiplied to pure BIGINT form
    ((n·v−S)² > k²·(n·Q−S²), centi-units) so no sqrt/division precedes a
    boolean; `mean` is a single IEEE division of exact integers."""
    from forecaster_spark.operators.technicals import bollinger

    return bollinger(_ev(spark, sf_dir), window=24, k=2).select(
        "source", "event_id", "y", "mean", "above", "below", "n_in_frame"
    )


def q_rsi(spark, sf_dir):
    """Cutler's RSI (SMA relative-strength index, window 14) on the hourly
    micro-mean tier: gain/loss sums of BIGINT deltas, rsi_ppm = floor
    (10^6·G/(G+L)) — exact integer on both engines; NULL until a full
    window or on flat frames."""
    from forecaster_spark.operators.technicals import rsi_cutler

    return rsi_cutler(_hourly_micro_buckets(spark, sf_dir), window=14).select(
        "source", "bucket_start", "rsi_ppm", "rsi"
    )


def q_longest_run(spark, sf_dir):
    """Longest strictly-increasing run per source (gaps-and-islands over
    micro-unit values in (ts, event_id) order): the nonparametric
    trend/randomness diagnostic. Window + two hash aggregates, one
    shuffle."""
    from forecaster_spark.operators.technicals import longest_runs

    return longest_runs(_ev(spark, sf_dir)).select(
        "source", "max_run", "n_runs", "n_rows"
    )


def q_series_dist_pairs(spark, sf_dir):
    """Series-similarity join: exact squared Euclidean distance between
    every source pair on the shared hourly grid (centi-unit BIGINT sums —
    which series co-move). Self-equi-join on the bucket + one hash
    aggregate on the pair."""
    from forecaster_spark.operators.technicals import series_distance_pairs

    b = _hourly_micro_buckets(spark, sf_dir).select(
        "source", "bucket_start", F.expr("v_micro div 10000").alias("v_centi")
    )
    return series_distance_pairs(b).select(
        "source_a", "source_b", "sq_dist", "n_shared"
    )


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone-trend test per source over the hourly tier:
    exact-integer S statistic + tie-corrected 18·Var(S); tau is the one
    division. Collect-per-series + double pair explode (one shuffle,
    bounded series — the Theil-Sen plan)."""
    from forecaster_spark.operators.stats_tests import mann_kendall

    return mann_kendall(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n", "s_stat", "var18", "tau"
    )


def q_ks_two_sample(spark, sf_dir):
    """Two-sample KS drift per source: first-half vs second-half ECDF sup
    as the exact integer max|n2·cum1 − n1·cum2| over grouped values —
    the distribution-level drift check beside chi-square's binned one."""
    from forecaster_spark.operators.stats_tests import ks_two_sample

    return ks_two_sample(_ev(spark, sf_dir)).select(
        "source", "n1", "n2", "d_num", "ks_stat"
    )


def q_permutation_patterns(spark, sf_dir):
    """Bandt-Pompe ordinal pattern distribution (m=3, tie classes kept)
    per source over the hourly tier: exact pattern counts + floor-ppm
    shares; the permutation-entropy sufficient statistics."""
    from forecaster_spark.operators.stats_tests import permutation_patterns

    return permutation_patterns(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "pattern_id", "cnt", "n_windows", "share_ppm"
    )


def q_seasonal_naive_qof(spark, sf_dir):
    """Seasonal-naive (lag-24) baseline QoF per source on the hourly tier:
    exact centi-unit SSE/SAE, mse/mae as fixed left-assoc division
    chains. The seasonal analogue of qof_persistence."""
    from forecaster_spark.operators.stats_tests import seasonal_naive_qof

    return seasonal_naive_qof(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "m", "sse_centi2", "sae_centi", "mse", "mae"
    )


def q_freshness_report(spark, sf_dir):
    """Per-source freshness/staleness monitor: last observation, lag
    behind the corpus frontier (window max over the tiny source table, no
    second scan), trailing-24-bucket coverage and missing-hour count —
    exact integer seconds."""
    from forecaster_spark.operators.timeweight import freshness_report

    return freshness_report(_ev(spark, sf_dir)).select(
        "source", "n_events", "last_s", "frontier_s", "staleness_s",
        "buckets_24h", "missing_24h", "stale"
    )


def q_interarrival_stats(spark, sf_dir):
    """Per-source inter-arrival gap distribution in exact integer seconds:
    mean (one division), median/p95 (the certified percentile ==
    quantile_cont equivalence), max gap — arrival-process diagnostics
    beside burstiness/heartbeat."""
    from forecaster_spark.operators.timeweight import interarrival_stats

    return interarrival_stats(_ev(spark, sf_dir)).select(
        "source", "n_gaps", "sum_gap_s", "mean_gap_s",
        "median_gap_s", "p95_gap_s", "max_gap_s"
    )


def q_ensemble_qof(spark, sf_dir):
    """Equal-weight forecast combination (Bates-Granger): mean of
    persistence / MA(3) / seasonal-naive one-step baselines scored vs
    each component on the identical conditional sample — 9-scaled centi
    errors keep everything exact BIGINT; regret9 <= 0 marks series where
    combining beat the best single model."""
    from forecaster_spark.operators.timeweight import ensemble_qof

    return ensemble_qof(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "m", "sae9_ens", "sae9_persist", "sae9_ma3",
        "sae9_snaive", "regret9", "mae_ens", "mae_best_single"
    )


def q_max_drawdown(spark, sf_dir):
    """Maximum drawdown per source over raw events: exact micro-unit
    running-peak-minus-value max (path-dependent worst decline)."""
    from forecaster_spark.operators.technicals import max_drawdown

    return max_drawdown(_ev(spark, sf_dir)).select(
        "source", "n_rows", "max_dd_micro", "max_dd"
    )


def q_vocab_stats(spark, sf_dir):
    """Corpus vocabulary profile per language shard: vocab size, token
    total, hapax/dis legomena counts and floor-ppm hapax share — the
    Zipf-tail corpus-quality diagnostics."""
    from forecaster_spark.operators.textops import vocab_stats

    return vocab_stats(read_table(spark, sf_dir, "documents")).select(
        "lang", "vocab", "total_tokens", "n_hapax", "n_dis", "hapax_ppm"
    )


def q_chunk_tokens(spark, sf_dir):
    """Context-window chunking with overlap (size 64, stride 48): every
    chunk's CONTENT certified via the reference polynomial checksum the
    oracle refolds in HUGEINT — the LM training-data layout step beside
    pack_sequences. Narrow map + explode, no shuffle."""
    from forecaster_spark.operators.packing import chunk_tokens

    return chunk_tokens(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tok", "chunk_idx", "chunk_start", "chunk_len", "chunk_checksum"
    )


def q_ngram_novelty(spark, sf_dir):
    """Per-doc 3-gram novelty: fraction of a doc's distinct shingles whose
    first corpus occurrence (min doc_id) is this doc — the crawl-saturation
    / curation signal on the MinHash shingle hashes. Two hash-keyed
    shuffles, skew-free by construction."""
    from forecaster_spark.operators.dedup import ngram_novelty

    return ngram_novelty(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_shingles", "n_novel", "novelty_ppm"
    )


def q_spearman_pairs(spark, sf_dir):
    """Spearman rank correlation between every source pair on the shared
    hourly grid: doubled-quanta tie-safe average ranks, exact BIGINT
    Pearson-of-ranks pieces, rho via the correctly-rounded
    (num/sqrt(d1))/sqrt(d2) chain (IEEE sqrt/div — bit-identical
    cross-engine). Monotone-invariant companion of series_dist_pairs."""
    from forecaster_spark.operators.stats_tests import spearman_pairs

    return spearman_pairs(_hourly_micro_buckets(spark, sf_dir)).select(
        "source_a", "source_b", "n_shared", "num", "d1", "d2", "rho"
    )


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz median-crossing runs test per source on the hourly
    tier: exact above/below counts and run count, expected runs as one
    fixed-form division — the randomness check beside longest_run."""
    from forecaster_spark.operators.stats_tests import runs_test

    return runs_test(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n_pos", "n_neg", "n_runs", "expected_runs"
    )


def q_pearson_pairs(spark, sf_dir):
    """Pearson correlation between every source pair on the shared hourly
    grid (centi quanta keep all products < 2^53): the level-sensitive
    complement of spearman_pairs; r via the proven correctly-rounded
    sqrt/div chain."""
    from forecaster_spark.operators.stats_tests import pearson_pairs

    return pearson_pairs(_hourly_micro_buckets(spark, sf_dir)).select(
        "source_a", "source_b", "n_shared", "num", "d1", "d2", "r"
    )


def q_winsorized_mean(spark, sf_dir):
    """Rank-based winsorized mean per source over raw events: clamp at the
    k-th/(n-k+1)-th order statistics (exact integers regardless of tie
    order), exact clamped sum, fixed-chain mean. Completes the robust
    family beside trimmed_mean."""
    from forecaster_spark.operators.stats_tests import winsorized_mean

    return winsorized_mean(_ev(spark, sf_dir)).select(
        "source", "n", "lo_micro", "hi_micro", "win_sum_micro", "win_mean"
    )




def q_moments(spark, sf_dir):
    """Higher-moment shape profile (skew/kurtosis) per source: exact
    unit-integer central-moment sums around the floored mean; g1/g2 are
    fixed-shape chains of correctly-rounded sqrt/div on exact-int doubles,
    floor-quantized to ppm — bit-identical in SQL."""
    from forecaster_spark.operators.stats_tests import moments

    return moments(_ev(spark, sf_dir)).select(
        "source", "n", "mu_unit", "m2", "m3", "m4", "skew_q6", "kurt_q6"
    )


def q_rescaled_range(spark, sf_dir):
    """Rescaled-range (R/S, the Hurst ingredient) per source: n-scaled
    cumulative deviations keep every intermediate an exact BIGINT; the
    statistic is one division of a correctly-rounded sqrt, ppm-floored."""
    from forecaster_spark.operators.stats_tests import rescaled_range

    return rescaled_range(_ev(spark, sf_dir)).select(
        "source", "n", "r_scaled", "s2_scaled", "rs_q6"
    )


def q_peak_detect(spark, sf_dir):
    """Windowed peak detection with a prominence floor (find_peaks core):
    three bounded rolling min/max frames over one shuffle, exact milli
    integers, plateau-first tie-break."""
    from forecaster_spark.operators.technicals import peak_detect

    return peak_detect(_ev(spark, sf_dir), window_n=12, prominence_milli=20_000).select(
        "source", "event_id", "prominence_milli_out", "is_peak"
    )


def q_theta_forecast(spark, sf_dir):
    """Theta-method forecast (SES level + half the exact-Cramer OLS trend
    slope, Hyndman & Billah form) over the hourly integer signal — the M3
    baseline between EWMA and Holt; level replayed by the recursive-CTE
    walk, slope by integer normal equations."""
    from forecaster_spark.operators.timeweight import theta_forecast

    return theta_forecast(_hourly_int_series(spark, sf_dir), alpha=0.25, hh=3).select(
        "source", "h", "level", "fc"
    )


def q_stratified_sample(spark, sf_dir):
    """EXACT per-stratum quota sampling (floor(n_g/5) docs per source, the
    smallest splitmix64 buckets win): rank window + broadcast quota table;
    the binomial noise of rate-based splits is gone by construction."""
    from forecaster_spark.operators.sampling import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    return stratified_sample(docs, frac_num=1, frac_den=5, seed=11).select(
        "doc_id", "source", "bucket", "rk", "quota", "kept"
    )


def q_source_token_budget(spark, sf_dir):
    """Per-source TOKEN-budget cap (r5): uniform hash-order subsample per
    source until 800 whitespace tokens — the curation stage bounding each
    source's contribution by token MASS, not row count. The engine runs
    the giant-stratum-safe hash-RANGE-sharded two-phase running sum (the
    kruskal recipe); the oracle computes the direct single-window form,
    so the sharded decomposition itself is cross-checked bit-for-bit."""
    from forecaster_spark.operators.sampling import source_token_budget

    docs = read_table(spark, sf_dir, "documents")
    return source_token_budget(docs, budget=800, seed=11).select(
        "doc_id", "source", "n_tok", "run_tok", "kept"
    )


def q_gini_doclen(spark, sf_dir):
    """Gini concentration of document lengths per source (Lorenz rank
    form) — all-BIGINT numerator/denominator, ppm by integer division."""
    from forecaster_spark.operators.textops import gini_concentration

    docs = read_table(spark, sf_dir, "documents")
    return gini_concentration(docs).select("source", "n", "sum_x", "gini_ppm")


def q_zorder_zonemap(spark, sf_dir):
    """Z-order (Morton) clustering key over (minute-index, user bucket) +
    the per-block zone-map stats an Iceberg manifest would carry: each
    4096-key block is an axis-aligned rectangle in (time, user) space, so
    min/max prune BOTH dimensions — the 2-D file-skipping layout a
    lexicographic sort cannot give. Pure integer bit arithmetic."""
    from forecaster_spark.operators.layout import zonemap_blocks, zorder_key

    ev = read_table(spark, sf_dir, "events")
    d = ev.select(
        F.expr("(unix_micros(cast(ts as timestamp)) div 60000000) % 4096").alias("am"),
        (F.col("user_id") % 4096).cast("long").alias("bu"),
    )
    z = zorder_key(d, "am", "bu", bits=12)
    return zonemap_blocks(z, ["am", "bu"], block=4096).select(
        "zblock", "n", "min_am", "max_am", "min_bu", "max_bu"
    )


def q_compaction_plan(spark, sf_dir):
    """Deterministic small-file compaction planning: per-source day batches
    roll into ~500-row output bins by running-total division — the planner
    touches only the partition-stats table (metadata-scale work for a
    10^12-row compaction), exact BIGINT end to end."""
    from forecaster_spark.operators.layout import compaction_plan

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return compaction_plan(daily, target_rows=500).select(
        "source", "day", "n_rows", "file_bin"
    )




def q_haar_multires(spark, sf_dir):
    """Unnormalized Haar multi-resolution transform (3 levels) over the
    hourly integer signal: smooth coefficients are the rollup tier sums,
    details are exactly what each tier discards — computed as a rollup-
    style pairwise cascade (data shrinks 2x per level, no input re-scan),
    all-BIGINT."""
    from forecaster_spark.operators.downsample import haar_multires

    return haar_multires(_hourly_int_series(spark, sf_dir), levels=3).select(
        "source", "level", "k", "n", "s_sum", "d_diff"
    )




def q_binseg_changepoint(spark, sf_dir):
    """Offline single-changepoint by binary segmentation: floor-quantized
    SSE costs from exact milli prefix sums, argmin tie-broken to the
    smallest index — the offline complement of the online CUSUM query."""
    from forecaster_spark.operators.stats_tests import binseg_changepoint

    return binseg_changepoint(_ev(spark, sf_dir)).select(
        "source", "n", "split_i", "min_cost_q"
    )


def q_stl_strength(spark, sf_dir):
    """Trend/seasonal strength indices (Wang-Smith-Hyndman) over the
    bit-certified seasonal decomposition: unit-floored components, n-scaled
    integer variances, ppm-floored ratios clamped at 0."""
    from forecaster_spark.operators.timeweight import seasonal_decompose, stl_strength

    return stl_strength(seasonal_decompose(_ev(spark, sf_dir))).select(
        "source", "n", "ft_q6", "fs_q6"
    )




def q_cross_rank(spark, sf_dir):
    """Cross-sectional rank/percentile of each source vs the others at every
    hourly bucket — the across-series feature axis (relative momentum); the
    one operator that shuffles on TIME instead of source."""
    from forecaster_spark.operators.features import cross_rank

    return cross_rank(_hourly_int_series(spark, sf_dir)).select(
        "source", F.col("ts").cast("timestamp_ntz").alias("ts"), "yq", "rk", "n_src", "pct_ppm"
    )


def q_conformal_interval(spark, sf_dir):
    """Split-conformal persistence intervals (Papadopoulos/Vovk) on the
    hourly integer tier: the conformal radius is an exact-integer order
    statistic of calibration residuals (rank ceil((n+1)·7/8)), so the
    whole band — lo/hi/covered for the last 6 points per series — is
    bit-exact cross-engine. The coverage guarantee the reference's QoF
    point metrics (reference qof.py) don't provide."""
    from forecaster_spark.operators.conformal import conformal_interval

    return conformal_interval(
        _hourly_int_series(spark, sf_dir), hh=6, alpha_num=1, alpha_den=8
    ).select(
        "source",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "y",
        "fc",
        "q",
        "lo",
        "hi",
        "covered",
    )


def q_dominant_period(spark, sf_dir):
    """ACF-argmax seasonality detection over lags 2..48 of the hourly
    tier (the period the reference's seasonal configs hard-code, found
    automatically): exact BIGINT autocovariances in one per-series Arrow
    kernel, smallest-lag tie-break, rho as a single IEEE division."""
    from forecaster_spark.operators.timeweight import dominant_period

    return dominant_period(_hourly_int_series(spark, sf_dir), min_lag=2, max_lag=48).select(
        "source", "period", "gamma", "rho", "g0", "n"
    )


def q_benford_digits(spark, sf_dir):
    """Benford first-significant-digit screen per source over raw event
    values: leading digit of the micro-unit BIGINT's decimal string,
    shares in ppm by integer floor division, deviations vs the published
    integer Benford table, TVD over the full 9-digit spine — ingest-time
    forensic data quality, pure codegen aggregate."""
    from forecaster_spark.operators.stats_tests import benford_digits

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"), "value"
    )
    return benford_digits(ev, value="value").select(
        "source", "digit", "cnt", "n", "obs_ppm", "exp_ppm", "dev_ppm", "tvd_ppm"
    )


def q_pinball_qof(spark, sf_dir):
    """Pinball (quantile) loss of the persistence forecast at tau =
    1/4, 1/2, 3/4 per source on the hourly tier — the M5-Uncertainty
    scoring rule as exact integer arithmetic (den*L = greatest(num*e,
    (num-den)*e)); one hash aggregate with map-side partials."""
    from forecaster_spark.models.metrics import pinball_qof

    w = Window.partitionBy("source").orderBy("ts")
    s = (
        _hourly_int_series(spark, sf_dir)
        .withColumn("f", F.lag("y").over(w))
        .filter(F.col("f").isNotNull())
    )
    return pinball_qof(s, ["source"], y_true="y", y_hat="f").select(
        "source", "tau_num", "tau_den", "n", "den_loss_sum", "mean_milli"
    )


def q_duplicated_spans(spark, sf_dir):
    """Top-20 most-duplicated word-3-gram spans across the corpus (Lee
    et al. 2021 exact-substring dedup, span-level ledger): one shuffle on
    the splitmix64 span hash, TakeOrderedAndProject top-N, deterministic
    (n_docs desc, span_hash asc) total order."""
    from forecaster_spark.operators.dedup import duplicated_spans

    docs = read_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, top_n=20).select(
        "rnk", "span_hash", "n_docs", "first_doc", "last_doc"
    )


_BOILER = (
    "all rights reserved this material is provided without warranty of any "
    "kind reproduction or distribution without prior written consent is prohibited"
)


def q_duplicated_spans_k16(spark, sf_dir):
    """LONG-SPAN exact-substring dedup (r5): Lee et al. 2021 run their
    suffix-array pass at ~50-token windows, not 3-grams — this certifies
    the span-length-parameterized ledger at k=16. Boilerplate is planted
    deterministically (a fixed 21-word license preamble prepended to every
    doc_id % 5 == 0 document, mirrored verbatim in the oracle's
    doc_source_sql), so the ledger's top spans are the 6 fully-in-preamble
    16-gram windows shared by all planted docs, plus whatever
    preamble→body windows collide on equal body prefixes — all replayed
    value-for-value by the generalized O(N·k) relational shingle mirror."""
    from forecaster_spark.operators.dedup import duplicated_spans

    docs = read_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.lit(_BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return duplicated_spans(planted, k=16, top_n=20).select(
        "rnk", "span_hash", "n_docs", "first_doc", "last_doc"
    )


def q_span_removal(spark, sf_dir):
    """Exact-substring dedup APPLIED (Lee et al. 2021 second half): every
    word position covered by any occurrence of a top-20 duplicated span is
    removed; surviving text certified by value via the reference polynomial
    token checksum per doc. Ledger bounded (top-N) and shipped in the
    kernel closure — one corpus-linear Arrow map, zero extra shuffles."""
    from forecaster_spark.operators.dedup import remove_duplicated_spans

    docs = read_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, top_n=20).select(
        "doc_id", "n_words", "n_removed", "clean_checksum"
    )


def q_span_removal_k16(spark, sf_dir):
    """Long-span exact-substring dedup APPLIED (r5 — the removal half of
    the k=16 story): the same planted 21-word license preamble as
    duplicated_spans_k16, removed. The certified output proves the
    ledger→coverage→removal chain at the Lee-et-al span scale: planted
    docs lose exactly their preamble-covered positions (plus any
    colliding preamble→body windows), survivors' text is certified by
    value via the reference polynomial token checksum."""
    from forecaster_spark.operators.dedup import remove_duplicated_spans

    docs = read_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.lit(_BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return remove_duplicated_spans(planted, k=16, top_n=20).select(
        "doc_id", "n_words", "n_removed", "clean_checksum"
    )


def q_cdc_chunk_ledger(spark, sf_dir):
    """Content-defined chunking duplicate ledger (r5): gear/Rabin-style
    word-granularity CDC — cut after every word whose trailing-4-word
    rolling hash has its low 3 bits zero, hash each chunk, top-20 chunks
    shared by ≥ 2 docs. Shift-RESISTANT sub-document dedup: the planted
    license preamble (same _BOILER as the k16 span queries) chunks
    identically wherever it lands, unlike fixed k-gram windows. One
    Arrow scan + one hash shuffle + TakeOrderedAndProject."""
    from forecaster_spark.operators.dedup import cdc_chunk_ledger

    docs = read_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.lit(_BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return cdc_chunk_ledger(planted, g=4, mask_bits=3, top_n=20).select(
        "rnk", "chunk_hash", "n_docs", "n_occ", "first_doc", "last_doc"
    )


def q_granger_pairs(spark, sf_dir):
    """Lag-1 Granger-causality screen over all ordered source pairs of
    the hourly tier: restricted-vs-full exact-Cramer OLS (2x2/3x3 integer
    determinants through the HUGEINT->DOUBLE mimic), micro-quantized RSS
    sums, one-division F-ratio — which exo series deserves an ARX slot."""
    from forecaster_spark.operators.stats_tests import granger_pairs

    return granger_pairs(_hourly_int_series(spark, sf_dir)).select(
        "y_source", "x_source", "n", "rss_r_q", "rss_f_q", "b_cross", "f_ratio"
    )


def q_dickey_fuller(spark, sf_dir):
    """Dickey-Fuller unit-root screen per source on the hourly tier:
    dy ~ [1, y_{t-1}] by exact 2x2 Cramer, micro-quantized RSS, then a
    fixed chain of correctly-rounded IEEE ops (two divisions, one sqrt)
    for the tau_mu t-ratio vs the -2.86 5% critical value — the
    stationarity gate in front of the AR/ARX fits."""
    from forecaster_spark.operators.stats_tests import dickey_fuller

    return dickey_fuller(_hourly_int_series(spark, sf_dir)).select(
        "source", "n", "b_hat", "rss_q", "t_stat", "stationary_5pct"
    )


def q_kpss_level(spark, sf_dir):
    """KPSS level-stationarity statistic per source (lag-0 variant) on
    the hourly tier: with the short-run variance the statistic is a ratio
    of exact BIGINTs — sum(S_t^2)/(n*sum(dev^2)) — one IEEE division, no
    sqrt; compared against the published 0.463 5% critical value. The
    complement of the Dickey-Fuller screen (opposite null)."""
    from forecaster_spark.operators.stats_tests import kpss_level

    return kpss_level(_hourly_int_series(spark, sf_dir)).select(
        "source", "n", "s2_sum_d", "dev2_sum", "eta", "level_stationary_5pct"
    )


def q_ar_order_select(spark, sf_dir):
    """Sequential partial-F AR order selection (p in 1..3) per source on
    the hourly tier — nested exact-Cramer fits on one conditional sample
    (2x2/3x3/4x4 Python-int determinants through the HUGEINT mimic),
    micro-quantized RSS, forward F-tests vs 3.84. Closes the Box-Jenkins
    identification loop the reference leaves to the analyst."""
    from forecaster_spark.operators.timeweight import ar_order_select

    return ar_order_select(_hourly_int_series(spark, sf_dir)).select(
        "source", "n", "rss1_q", "rss2_q", "rss3_q", "f21", "f32", "selected_p"
    )


def q_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau white-noise test per source (h=5, raw
    events like q_acf): exact integer gammas, one division per rho, Q as
    a pinned left-assoc IEEE chain vs chi2_0.95(5)=11.07 — the diagnose
    stage of the Box-Jenkins loop."""
    from forecaster_spark.operators.timeweight import ljung_box

    return ljung_box(_ev(spark, sf_dir)).select(
        "source", "n", "q_stat", "white_noise_5pct"
    )


def q_auto_seasonal_qof(spark, sf_dir):
    """Zero-config seasonal baseline: dominant_period detects each
    source's period (exact ACF argmax), seasonal-naive forecasts AT that
    per-series period via a computed-key self-join (variable-offset LAG
    isn't portable), and exact integer error sums score it on a shared
    t>=48 window — the engine's detect->forecast->score composition."""
    from forecaster_spark.operators.timeweight import auto_seasonal_qof

    return auto_seasonal_qof(_hourly_int_series(spark, sf_dir)).select(
        "source", "period", "n", "sae", "sse", "mae_milli"
    )


def q_prewhitened_ccf(spark, sf_dir):
    """Prewhitened click-vs-view cross-correlation (Box-Jenkins exo
    identification): AR(2) fitted to the input series by driver-side exact
    Cramer (coefficients = single divisions through the HUGEINT→DOUBLE
    mimic), both series filtered with the identical affine operator,
    residuals floor-quantized ×256, signed-safe floor-of-division
    centering, integer CCF over the total lag spine — every step a
    certified recipe, composed."""
    from forecaster_spark.operators.timeweight import prewhitened_ccf

    return prewhitened_ccf(_ev(spark, sf_dir), "click", "view", max_lag=3)


def q_mbb_mean_ci(spark, sf_dir):
    """Moving-block-bootstrap 95% CI for the per-source hourly mean
    (Künsch 1989) — dependence-aware uncertainty for tier statistics,
    with DETERMINISTIC splitmix resampling (block starts =
    splitmix64((2·seed+1)·(r·2^20+j)) mod (n−w+1)) so the SQL oracle
    replays every one of the B=200 replicates bit-for-bit: integer
    prefix-sum block totals, order-statistic bounds at the
    (B+1)-convention ranks, one exactly-representable division per
    emitted mean."""
    from forecaster_spark.operators.stats_tests import mbb_mean_ci

    return mbb_mean_ci(_hourly_micro_buckets(spark, sf_dir), w=24, B=200, seed=11)


def q_arch1_vol(spark, sf_dir):
    """ARCH(1) conditional-variance forecast per source on the hourly tier
    (the volatility MODEL beside q_arch_lm's TEST — nothing else emits a
    variance band that widens after a shock): squared persistence
    residuals regressed on their lag by exact 2×2 Cramer, σ²_{T+1}
    folded into ONE division (num0 + u_T·num1)/det. Signal floor(mean/8)
    keeps every normal-equation product ≥45× inside int64 (ANSI-safe)."""
    from forecaster_spark.operators.stats_tests import arch1_vol_forecast

    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    s = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.floor(F.col("mean_y") / 8.0).cast("long").alias("v"),
    )
    return arch1_vol_forecast(s).select(
        "source", "n", "u_last", "a0", "a1", "sigma2_next"
    )


def q_arch_lm(spark, sf_dir):
    """Engle ARCH-LM volatility-clustering test per source on the hourly
    tier (u=dy^2 on its lag by exact 2x2 Cramer; milli-quantized RSS/TSS
    — degree-4 terms overflow the micro quantum; LM = n*(1-rss/tss) vs
    chi2(1)=3.84). Honesty check for OLS/conformal interval widths."""
    from forecaster_spark.operators.stats_tests import arch_lm

    return arch_lm(_hourly_int_series(spark, sf_dir)).select(
        "source", "n", "rss_q", "tss_q", "lm_stat", "arch_5pct"
    )


def q_demand_class(spark, sf_dir):
    """Syntetos-Boylan smooth/intermittent/erratic/lumpy classification
    of the sparse purchase-demand series (same compressed input as
    q_croston): integer ADI vs 1320 milli, CV^2 as one division of
    exact BIGINTs, one codegen hash aggregate — the router between the
    smooth models and Croston."""
    from forecaster_spark.operators.timeweight import demand_class

    ev = read_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    )
    b = ev.groupBy(
        F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string")).alias("source"),
        F.expr("unix_micros(date_trunc('minute', ts)) div 60000000").alias("m"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("d"))
    return demand_class(b).select(
        "source", "n_nz", "span", "adi_milli", "cv2", "demand_class"
    )


def q_turning_points(spark, sf_dir):
    """Turning-point randomness test per source on the hourly tier: exact
    count of strict interior extrema plus the iid-null moments (2(n−2)/3,
    90·Var = 16n−29) as integers; tp_rate is the one division. Two lag/lead
    windows + hash agg, codegen end to end."""
    from forecaster_spark.operators.stats_tests import turning_points

    return turning_points(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n", "tp_count", "exp3", "var90", "tp_rate"
    )


def q_cox_stuart(spark, sf_dir):
    """Cox-Stuart sign trend test per source on the hourly tier: pair point
    i with point i+ceil(n/2), count pairwise difference signs (ties held
    out) — the O(n) distribution-free trend screen beside Mann-Kendall's
    O(n²) one. Row-number window + self-equi-join on (source, position)."""
    from forecaster_spark.operators.stats_tests import cox_stuart

    return cox_stuart(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n", "n_pairs", "pos", "neg", "n_ties", "pos_share"
    )


def q_bartels_rank(spark, sf_dir):
    """Bartels rank von-Neumann randomness ratio per source on the hourly
    tier: doubled tie-averaged ranks keep numerator and denominator exact
    BIGINTs (the 4s cancel); RVN = nm/den is the one division (iid ≈ 2,
    trend ≪ 2, alternation ≫ 2)."""
    from forecaster_spark.operators.stats_tests import bartels_rank

    return bartels_rank(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n", "nm_num", "d_den", "rvn"
    )


def q_von_neumann(spark, sf_dir):
    """Von Neumann mean-squared-successive-difference ratio per source on
    the whole-unit hourly signal: VN = n²·Σd² / ((n−1)·ΣD²) with exactly
    zero-mean scaled deviations D = n·v−Σv — all-BIGINT numerator and
    denominator, one division. The value-domain twin of bartels_rank."""
    from forecaster_spark.operators.stats_tests import von_neumann_ratio

    return von_neumann_ratio(_hourly_int_series(spark, sf_dir)).select(
        "source", "n", "sum_d2", "dev2_sum", "vn_ratio"
    )


def q_grubbs(spark, sf_dir):
    """Grubbs max-studentized-deviation outlier statistic per source on the
    whole-unit hourly signal: G = maxD/sqrt(ΣD²/(n−1)) on exact scaled
    deviations — division→sqrt→division, each correctly rounded (the
    dickey_fuller chain), no other float steps."""
    from forecaster_spark.operators.stats_tests import grubbs_stat

    return grubbs_stat(_hourly_int_series(spark, sf_dir)).select(
        "source", "n", "max_dev_scaled", "dev2_sum", "grubbs_g"
    )


def q_gesd_outliers(spark, sf_dir):
    """Generalized ESD multi-outlier screen (Rosner): three rounds of the
    Grubbs statistic, each removing the most-deviant point first — the
    masking-proof extension of q_grubbs (a second spike hides behind the
    first's inflated s). Exact scaled-deviation integers per round; the
    removal tie-break (|dd| DESC, v DESC, t) is replayed by the oracle's
    unrolled three-stage anti-join chain."""
    from forecaster_spark.operators.stats_tests import gesd_outliers

    return gesd_outliers(_hourly_int_series(spark, sf_dir), rounds=3)


def q_friedman(spark, sf_dir):
    """Friedman blocked-rank test across sources on the complete hourly
    buckets: doubled within-block ranks, per-source exact rank sums, and
    the global chi² as ONE division plus one exact-integer subtraction —
    the k-sample ANOVA companion of the pairwise Spearman join."""
    from forecaster_spark.operators.stats_tests import friedman_blocks

    return friedman_blocks(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n_blocks", "k", "rank2_sum", "chi2"
    )


def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis sufficient statistics across sources on raw events:
    global tie-averaged ranks WITHOUT a global sort or single-partition
    window (two-pass range-sharded ranking: equi-depth shard boundaries →
    per-shard running offsets in parallel → broadcast shard base offsets;
    ranks are exact integers so sharding changes the plan, never values),
    per-source exact rank sums, global tie-cube term; mean_rank2 is the
    one division. H assembles driver-side from the exact pieces."""
    from forecaster_spark.operators.stats_tests import kruskal_wallis_stats

    return kruskal_wallis_stats(_ev(spark, sf_dir), value="y").select(
        "source", "n_g", "rank2_sum", "n_total", "tie_cubes", "mean_rank2"
    )


def q_snaive_mase(spark, sf_dir):
    """Seasonal-naive (m=24) MASE and Trigg tracking signal per source on
    the hourly tier — the scale-free M-competition QoF pair beside
    mse/mae/smape/pinball: both are single divisions of exact BIGINT
    micro-unit error sums (products ≤ 2^52, also double-exact)."""
    from forecaster_spark.operators.stats_tests import snaive_mase

    return snaive_mase(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n", "sum_e", "sae", "sad", "mase", "tracking_signal"
    )


def q_holt_damped(spark, sf_dir):
    """Damped-trend Holt (α=0.25, β=0.5, φ=0.875 — all binary-exact, as is
    φ(1−β)=0.4375) over the hourly integer signal: the M-competition
    damping fix for Holt's over-extrapolation, replayed bit-for-bit by a
    recursive-CTE oracle with IEEE-identical expression shapes."""
    from forecaster_spark.operators.timeweight import holt_damped

    return holt_damped(
        _hourly_int_series(spark, sf_dir), alpha=0.25, beta=0.5, phi=0.875
    ).select(
        "source",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "y",
        "level",
        "trend",
        "fc1",
    )


def q_dm_test(spark, sf_dir):
    """Diebold-Mariano equal-accuracy test (h=1, |e| loss) between the
    persistence and seasonal-naive(24) baselines on the whole-unit hourly
    signal: DM = S·sqrt(n(n−1))/sqrt(ΣD²) with exactly zero-mean scaled
    deviations D = n·d−S — one integer product under each sqrt, fixed
    order, bit-exact (the von_neumann/grubbs chain)."""
    from forecaster_spark.operators.stats_tests import dm_test

    return dm_test(_hourly_int_series(spark, sf_dir), season=24).select(
        "source", "n", "sum_d", "dd2_sum", "dm_stat"
    )


def q_wilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank test on the same persistence-vs-seasonal loss
    differentials — the nonparametric DM companion: doubled tie-averaged
    ranks keep 2·W+ exact, the tie cube term folds into the row aggregate
    (Σ_rows(c²−1) = Σ_groups(c³−c)), z = num4·sqrt(3)/sqrt(var48)."""
    from forecaster_spark.operators.stats_tests import wilcoxon_signed_rank

    return wilcoxon_signed_rank(_hourly_int_series(spark, sf_dir), season=24).select(
        "source", "n_nz", "w2_plus", "num4", "var48", "z_stat"
    )


def q_pettitt(spark, sf_dir):
    """Pettitt rank-CUSUM single changepoint per source on the hourly
    micro tier: doubled ranks make U_t = 2·Σrbar − t(n+1) an exact BIGINT
    running sum; K and the earliest-argmax change bucket are pure integer
    picks — the distribution-free complement of binseg_changepoint."""
    from forecaster_spark.operators.stats_tests import pettitt_changepoint

    return pettitt_changepoint(_hourly_micro_buckets(spark, sf_dir)).select(
        "source",
        "n",
        "t_star",
        F.col("change_bucket").cast("timestamp_ntz").alias("change_bucket"),
        "k2_stat",
    )


def q_winkler_score(spark, sf_dir):
    """Winkler interval score over the split-conformal persistence band
    (alpha=1/8 → breach penalty 16): per-point scores are exact BIGINTs
    on the integer tier, one hash aggregate; prices the width the
    conformal guarantee paid — the M4/M5 interval metric."""
    from forecaster_spark.operators.conformal import conformal_interval, winkler_score

    band = conformal_interval(
        _hourly_int_series(spark, sf_dir), hh=6, alpha_num=1, alpha_den=8
    )
    return winkler_score(band, alpha_num=1, alpha_den=8).select(
        "source", "n", "cov_cnt", "sum_winkler", "mean_winkler", "coverage"
    )


def q_mann_whitney(spark, sf_dir):
    """Mann-Whitney rank-sum first-half-vs-second-half drift test with
    Cliff's delta effect size: doubled tie-averaged ranks over the combined
    sample keep 2·U1 exact; z = num·sqrt(3n(n−1))/sqrt(n1n2)/sqrt(f2) is a
    fixed factored chain keeping every integer ≤ n³ — the location-shift
    member of the KS / Pettitt / Mann-Whitney drift triad."""
    from forecaster_spark.operators.stats_tests import mann_whitney_drift

    return mann_whitney_drift(_hourly_micro_buckets(spark, sf_dir)).select(
        "source", "n1", "n2", "u2", "num_z", "f2", "z_stat", "cliffs_delta"
    )


def q_crps_ensemble(spark, sf_dir):
    """CRPS of the three-member lag ensemble (naive/naive-2/seasonal-naive)
    on the integer hourly signal: 18·CRPS per point is an exact BIGINT
    (6Σ|xi−y| − 2Σ|xi−xj|), one division for the mean — the full-
    distribution scoring rule beside Winkler (interval) and pinball
    (quantile)."""
    from forecaster_spark.operators.conformal import crps_ensemble

    return crps_ensemble(_hourly_int_series(spark, sf_dir), lags=(1, 2, 24)).select(
        "source", "n", "sum_crps18", "mean_crps"
    )


def q_hier_reconcile(spark, sf_dir):
    """Hierarchical coherence over the tier cascade: direct daily
    persistence vs bottom-up (sum of hourly persistence forecasts), scored
    by exact micro-unit SAE plus the coherence gap reconciliation removes —
    division-free BIGINT arithmetic end-to-end on one series-key shuffle."""
    from forecaster_spark.operators.hierarchy import bottom_up_daily

    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    hourly = t.select("source", "bucket_start", "sum_micro")
    return bottom_up_daily(hourly).select(
        "source", "n_days", "sae_direct", "sae_bottom_up", "coherence_gap"
    )


def q_sample_entropy(spark, sf_dir):
    """Sample-entropy match counts (m=2, r=IQR/2) per source on the hourly
    micro tier: quadrupled-integer quartiles set the tolerance, every
    template-pair count is exact (8·|diff| ≤ r4), ratio = A/B is the one
    division — the amplitude-aware complexity screen beside the ordinal
    patterns and the matrix profile; Arrow O(n²) kernel ≡ DuckDB self-join."""
    from forecaster_spark.operators.motifs import sample_entropy

    return sample_entropy(_hourly_micro_buckets(spark, sf_dir), m=2).select(
        "source", "n", "r4", "b_cnt", "a_cnt", "ratio"
    )


def q_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer fertility (chars/token, subword tokens/word)
    from exact BIGINT codepoint/word/segment sums — the compression-quality
    numbers that skew mixture weights at pretraining scale; row-local
    counting + one tiny hash aggregate."""
    from forecaster_spark.operators.textops import tokenizer_fertility

    docs = read_table(spark, sf_dir, "documents")
    return tokenizer_fertility(docs).select(
        "lang", "n_docs", "sum_chars", "sum_ws", "sum_bpe", "chars_per_tok", "toks_per_word"
    )


def q_packing_waste(spark, sf_dir):
    """Padding-vs-truncation budget report at context length 512: exact
    ceil-division sequence counts, pad and truncation token totals per
    source — the waste the greedy packer removes; one corpus-linear scan +
    one hash aggregate."""
    from forecaster_spark.operators.packing import packing_waste

    docs = read_table(spark, sf_dir, "documents")
    return packing_waste(docs, seq_len=512).select(
        "source", "n_docs", "sum_tok", "n_seqs", "pad_tokens", "trunc_tokens", "pad_rate"
    )


def q_bigram_fluency(spark, sf_dir):
    """Per-document fluency under the corpus's own MLE bigram LM (mean
    conditional bigram probability, ppm-floored — the log-free,
    cross-engine-exact stand-in for the KenLM perplexity filter): the
    model-based quality signal next to the heuristic ones; counts are two
    hash aggregates + two shuffle joins, everything corpus-linear."""
    from forecaster_spark.operators.textops import bigram_fluency

    return bigram_fluency(read_table(spark, sf_dir, "documents"))


def q_data_loader(spark, sf_dir):
    """Reference C10 ``Data_Loader`` (Util/data_loader.py:5-19) as a
    distributed batch manifest: W1 lagged matrix over the whole series,
    sklearn chronological 80/20 split (test = ceil(n/5) tail rows),
    contiguous batch_size-64 batches per split, and a per-batch polynomial
    checksum over the flattened milli-quantized (lag3, lag2, lag1, y) rows
    — the reference token-invariant fold, so a checksum match certifies
    bit-exact batch content AND order (the tensor step itself is
    ``loader.training_batches``, numpy-parity-pinned in pytest)."""
    from forecaster_spark.operators.loader import data_loader_manifest

    return data_loader_manifest(_ev(spark, sf_dir), value="y", p=3, batch_size=64, order=_ORD)


def _sixhour_int_series(spark, sf_dir):
    """6-hour floor-quantized integer tier: the DTW contract feed — the
    n_a·n_b DP (and its recursive-CTE mirror) runs at 120 points/series
    instead of 720, keeping the oracle's per-iteration join small; the
    operator itself takes any tier."""
    ev = _events_series(spark, sf_dir)
    return (
        ev.groupBy(
            "source", F.expr("unix_micros(cast(ts as timestamp)) div 21600000000").alias("b6")
        )
        .agg(
            F.floor(
                F.sum(F.round(F.col("y") * 1_000_000).cast("long"))
                / F.lit(1_000_000.0)
                / F.count("y")
            ).cast("double").alias("y")
        )
        .select("source", F.col("b6").alias("ts"), "y")
    )


def q_dtw_pairs(spark, sf_dir):
    """DTW distance between every source pair on the 6-hour integer tier
    (full-window DP, |.| cost): the elastic complement of the lock-step
    Euclidean series distance. All-integer row DP via the prefix-scan
    form; the oracle replays the identical row walk as a recursive CTE
    whose step is one window chain over a pre-materialized relational
    cost matrix."""
    from forecaster_spark.operators.technicals import dtw_distance_pairs

    return dtw_distance_pairs(
        _sixhour_int_series(spark, sf_dir), value="y", partition="source", order="ts"
    ).select("source_a", "source_b", "n_a", "n_b", "dtw", "dtw_norm")


def q_isotonic_fit(spark, sf_dir):
    """Isotonic regression per source on the hourly tier (PAVA, sklearn
    IsotonicRegression semantics): the unique least-squares nondecreasing
    fit as exact integer blocks — merge decisions by cross-multiplied
    BIGINTs, fit = one IEEE division per block. Oracle = a recursive-CTE
    state machine replaying the push/merge stack walk."""
    from forecaster_spark.operators.timeweight import isotonic_fit

    return isotonic_fit(_hourly_int_series(spark, sf_dir)).select(
        "source", "block_i", "start_t", "m", "sum_v", "fit"
    )


def q_segmented_trend(spark, sf_dir):
    """Piecewise-linear trend with one BinSeg knot (Prophet-style
    segmented trend): split at the exact floored-SSE-cost argmin, then an
    exact-Cramer OLS line per side (HUGEINT normal equations, one
    cast-mimic division per coefficient) — level+slope before/after the
    break on the hourly tier."""
    from forecaster_spark.operators.stats_tests import segmented_trend

    return segmented_trend(_hourly_int_series(spark, sf_dir))


def q_shesd_outliers(spark, sf_dir):
    """Seasonal-Hybrid ESD (Twitter AnomalyDetection): generalized ESD
    iterated on floor(resid) of the robust seasonal decomposition of the
    hourly tier — seasonality/trend removed before the outlier search, so
    the daily cycle can neither mask nor fake anomalies. Composition of
    two certified pieces; the oracle replays decompose + 3 unrolled GESD
    rounds."""
    from forecaster_spark.operators.stats_tests import shesd_outliers

    return shesd_outliers(_hourly_int_series(spark, sf_dir), rounds=3)


def q_span_corruption(spark, sf_dir):
    """T5 span-corruption mask layout (Raffel et al. 2020): deterministic
    stratified placement of length-3 denoising spans covering ~15% of
    each doc's tokens — k strata, span i at lo_i + splitmix(doc_id, i)
    mod headroom; row-local codegen + one Arrow splitmix kernel, zero
    shuffles; replayed exactly by the HUGEINT splitmix chain."""
    from forecaster_spark.operators.packing import span_corruption_layout

    return span_corruption_layout(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tok", "n_spans", "span_i", "start", "length"
    )


def q_sparse_cosine_pairs(spark, sf_dir):
    """Lexical TF-cosine similarity pairs through an inverted index with
    corpus-relative df-pruning (df <= 90% of N drops stop-tokens AND caps
    the postings self-join fanout; integer cross-multiplied against a
    broadcast 1-row count): exact integer dot/norms, membership decided
    by the cross-multiplied predicate 64*dot^2 >= 49*n2_a*n2_b
    (cos >= 7/8), cos emitted as the correctly-rounded dot/sqrt/sqrt
    chain."""
    from forecaster_spark.operators.dedup import sparse_cosine_pairs

    return sparse_cosine_pairs(
        read_table(spark, sf_dir, "documents"),
        df_cap_ppm=900_000,
        min_shared=2,
        # pinned: the oracle has no top-k trim, so the query must not
        # inherit a future doc_top_k default change (today's 256 is a no-op
        # on the <=31-distinct-word synthetic docs, but pin it anyway)
        doc_top_k=None,
    )


def q_bloom_contamination(spark, sf_dir):
    """Benchmark decontamination through a 4096-bit bloom filter (two
    bit-mask probes per splitmix64 word-3-shingle hash; the bit array is
    a constant inlined into a row-local probe — ZERO joins, O(512 bytes)
    per executor where contamination_flags broadcasts the shingle set).
    Flags replay exactly cross-engine, INCLUDING false positives (the
    filter is sized small so some exist; the pytest pins one)."""
    from forecaster_spark.operators.dedup import bloom_contamination

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < 20)
    return bloom_contamination(docs, bench, k=3, m_bits=4096)


def q_trending_tokens(spark, sf_dir):
    """Trending tokens across deterministic crawl snapshots (d = doc_id %
    8): words ranked by the EXACT OLS slope numerator of their
    count-vs-snapshot series (missing snapshots are implicit zeros, the
    grid never materializes) — top-15 rising + top-15 falling, word-asc
    tie-break; slope = one IEEE division of exact BIGINTs."""
    from forecaster_spark.operators.textops import trending_tokens

    return trending_tokens(
        read_table(spark, sf_dir, "documents"), snapshots=8, min_total=5, k=15
    ).select("direction", "w", "n_total", "slope_num", "slope")


def q_winnowing_fingerprint(spark, sf_dir):
    """Positional winnowing fingerprint (Schleimer/Wilkerson/Aiken 2003,
    MOSS): per-window minimum of word-3-shingle hashes, window 4, with the
    (hash, position)-lexicographic tie rule — any shared ≥6-word run
    between docs shares a fingerprint entry. One Arrow kernel over the
    flat shingle stream, sentinel-padded batch-wide argmin; the oracle
    replays it as min(sh·2^32 + wpos) window frames over the HUGEINT
    splitmix shingle chain."""
    from forecaster_spark.operators.textops import winnowing_fingerprint

    return winnowing_fingerprint(read_table(spark, sf_dir, "documents"))


def q_readability(spark, sf_dir):
    """Flesch-Kincaid grade + reading ease per document (Kincaid 1975) —
    the classic corpus-quality band filter. Word/sentence/vowel-group
    counts are native regexp codegen; both decimal formulas reduce to ONE
    IEEE division of exact BIGINT polynomials in (W, S, Y), so the doubles
    match DuckDB bit-for-bit (single-division rule)."""
    from forecaster_spark.operators.textops import readability

    return readability(read_table(spark, sf_dir, "documents"))


def q_ul2_denoiser_mix(spark, sf_dir):
    """UL2 mixture-of-denoisers mask layout (Tay et al. 2022): each doc
    hash-assigned R (T5 15%/len-3), X (extreme 30%/len-12) or S
    (prefix-LM final quarter); stratified splitmix span placement per
    branch, zero shuffles. The oracle replays denoiser choice AND
    placement through two HUGEINT splitmix chains."""
    from forecaster_spark.operators.packing import ul2_denoiser_layout

    return ul2_denoiser_layout(read_table(spark, sf_dir, "documents"))


def q_var1_pairs(spark, sf_dir):
    """Pairwise VAR(1) joint forecast (Sims 1980) on the hourly tier:
    per unordered series pair, TWO exact-Cramer OLS equations over one
    shared lag design, then the coupled 3-step recursion from the last
    jointly-observed point — the multivariate generalization of the ARX
    exo machinery. Mirrored by generated HUGEINT SQL with per-step
    lateral aliases."""
    from forecaster_spark.operators.stats_tests import var1_pairs

    return var1_pairs(_hourly_int_series(spark, sf_dir))


def q_pooled_ar_forecast(spark, sf_dir):
    """GLOBAL pooled AR(2): one exact-Cramer model fit across ALL
    sources' lag rows (the cross-learning / global-model regime), then
    per-source recursive forecasts from each series' last two points with
    the shared coefficients as literal columns. Normal equations are one
    partial-aggregated 9-sum row (parameter-server collect); determinant
    in Python ints (HUGEINT scale)."""
    from forecaster_spark.models.kernels import pooled_ar_forecast

    return pooled_ar_forecast(_hourly_int_series(spark, sf_dir))


def q_pooled_ar_fe_forecast(spark, sf_dir):
    """Per-source FIXED-EFFECTS pooled AR(2) (r5, VERDICT #8): shared
    slopes from the within/FE panel estimator, per-source intercepts —
    the cross-learning regime between the global pooled model and the
    per-series fits. Balance enforced on the common bucket spine so the
    scaled-deviation cross-products make the slope Cramer exact integers
    (1/n cancels); α_s and the recursion are fixed left-assoc chains."""
    from forecaster_spark.models.kernels import pooled_ar_fe_forecast

    return pooled_ar_fe_forecast(_hourly_int_series(spark, sf_dir)).select(
        "source", "n_obs", "h", "y_hat"
    )


def q_mixture_allocation(spark, sf_dir):
    """Training-mixture budget apportionment by largest remainder (Hare
    quota): split a 10k sample budget across sources ∝ character mass,
    exactly — Σ alloc = budget, every alloc within 1 of its real quota,
    all-integer arithmetic (the DoReMi/Pile mixture-weights step without
    float weights)."""
    from forecaster_spark.operators.sampling import mixture_allocation

    return mixture_allocation(
        read_table(spark, sf_dir, "documents"), weight_col="n_chars"
    )


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training-order shuffle: fresh splitmix64
    draw per (doc, epoch), shard = low bits, rank within (epoch, shard)
    by the unsigned draw — the shard-then-shuffle loader pattern that
    parallelizes by epochs x shards instead of a global sort; every
    position replayable by the HUGEINT chain."""
    from forecaster_spark.operators.sampling import epoch_shuffle

    return epoch_shuffle(read_table(spark, sf_dir, "documents"))


def q_rake_keywords(spark, sf_dir):
    """RAKE corpus keywords (Rose et al. 2010): stopword-delimited
    candidate phrases, word score = deg/freq (phrase-length degree over
    occurrence count), top-30 — exact BIGINT counts, one IEEE division,
    word-asc tie-break; all native codegen + one TakeOrderedAndProject."""
    from forecaster_spark.operators.textops import rake_keywords

    return rake_keywords(read_table(spark, sf_dir, "documents"))


def q_holt_winters_mul(spark, sf_dir):
    """Holt-Winters MULTIPLICATIVE triple smoothing (Winters' ratio
    seasonal, α=0.25 β=0.5 γ=0.125, 24-hour period) over the hourly
    event-COUNT series (positive by construction — the classical domain
    of the multiplicative form). Two single IEEE divisions per step;
    the recursive-CTE oracle replays the ratio chains bit-for-bit."""
    from forecaster_spark.operators.timeweight import holt_winters

    t = rollup_raw(_events_series(spark, sf_dir), "1h", exact=True)
    ser = t.select(
        "source",
        F.col("bucket_start").alias("ts"),
        F.col("cnt").cast("double").alias("y"),
    )
    return holt_winters(
        ser, alpha=0.25, beta=0.5, gamma=0.125, period=24, multiplicative=True
    ).select(
        "source",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "y",
        "level",
        "trend",
        "seasonal",
        "fc1",
    )


def q_siegel_slopes(spark, sf_dir):
    """Siegel repeated-median regression per source (Biometrika 1982):
    median-of-per-point-medians of pairwise slopes — 50% breakdown vs
    Theil-Sen's 29%; two levels of the exact floor-div quantized median
    recipe, intercept from the fixed residual chain."""
    from forecaster_spark.operators.timeweight import siegel_slopes

    return siegel_slopes(_hourly_int_series(spark, sf_dir))


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix per source over value
    terciles: exact transition counts off one lag window with the
    (ts, event_id) tie discipline, row-conditional p = one division."""
    from forecaster_spark.operators.stats_tests import markov_transitions

    return markov_transitions(read_table(spark, sf_dir, "events"))


def q_arima210_forecast(spark, sf_dir):
    """ARIMA(2,1,0) per source (Box-Jenkins integrated AR): exact-Cramer
    AR(2)+drift on first diffs, recursive diff forecast + integration
    ladder from the last level — the stochastic-trend member the
    stationary ARX family lacks. Generated HUGEINT SQL mirror with
    per-step lateral aliases."""
    from forecaster_spark.models.kernels import arima210_forecast

    return arima210_forecast(_hourly_int_series(spark, sf_dir))


def q_winnowing_neardup_pairs(spark, sf_dir):
    """MOSS pairing on the winnowing fingerprints: docs sharing ≥ 3
    selected hashes, scored by fingerprint Jaccard AND both asymmetric
    containment ratios (catches A-inside-B). Hot buckets (> 64 docs)
    dropped before the collect_list-per-bucket pairing — one shuffle,
    fanout bounded at C(64,2) per hash."""
    from forecaster_spark.operators.textops import winnowing_neardup_pairs

    return winnowing_neardup_pairs(
        read_table(spark, sf_dir, "documents"), min_shared=3
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m_events": q_rollup_1m,
        "retract_rebuild_1m_events": q_retract_rebuild,
        "rollup_1h_cascade_events": q_rollup_1h_cascade,
        "rollup_1d_cascade_events": q_rollup_1d_cascade,
        "lag_features_events": q_lag_features,
        "lead_targets_events": q_lead_targets,
        "trend_time_index_events": q_trend_time_index,
        "minmax_scale_events": q_minmax_scale,
        "robust_scale_events": q_robust_scale,
        "drift_chi2_events": q_drift_chi2,
        "locf_events": q_locf,
        "linear_interp_events": q_linear_interp,
        "qof_persistence_events": q_qof_persistence,
        "dedup_exact_documents": q_dedup_exact,
        "token_counts_documents": q_token_counts,
        "lang_id_documents": q_lang_id,
        "quality_documents": q_quality,
        "jaccard_consecutive_documents": q_jaccard_consecutive,
        "minhash_lsh_pairs_documents": q_minhash_pairs,
        "simhash_documents": q_simhash,
        "simhash_neardup_pairs_documents": q_simhash_neardup,
        "pack_sequences_documents": q_pack_sequences,
        "hash_split_documents": q_hash_split,
        "split_leakage_documents": q_split_leakage,
        "temperature_mixture_documents": q_temperature_mixture,
        "quality_funnel_documents": q_quality_funnel,
        "pii_redact_documents": q_pii_redact,
        "conformal_interval_events_1h": q_conformal_interval,
        "dominant_period_events_1h": q_dominant_period,
        "benford_digits_events": q_benford_digits,
        "pinball_qof_events_1h": q_pinball_qof,
        "duplicated_spans_documents": q_duplicated_spans,
        "duplicated_spans_k16_documents": q_duplicated_spans_k16,
        "span_removal_k16_documents": q_span_removal_k16,
        "cdc_chunk_ledger_documents": q_cdc_chunk_ledger,
        "span_removal_documents": q_span_removal,
        "granger_pairs_events_1h": q_granger_pairs,
        "dickey_fuller_events_1h": q_dickey_fuller,
        "kpss_level_events_1h": q_kpss_level,
        "ar_order_select_events_1h": q_ar_order_select,
        "ljung_box_events": q_ljung_box,
        "auto_seasonal_qof_events_1h": q_auto_seasonal_qof,
        "arch_lm_events_1h": q_arch_lm,
        "arch1_vol_forecast_events_1h": q_arch1_vol,
        "mbb_mean_ci_events_1h": q_mbb_mean_ci,
        "demand_class_events": q_demand_class,
        "contamination_flags_documents": q_contamination,
        "bloom_contamination_documents": q_bloom_contamination,
        "sparse_cosine_pairs_documents": q_sparse_cosine_pairs,
        "span_corruption_documents": q_span_corruption,
        "fingerprint_documents": q_fingerprint,
        "cosine_topk_brute_embeddings": q_cosine_topk_brute,
        "cosine_topk_lsh_embeddings": q_cosine_topk_lsh,
        "cosine_topk_ivf_embeddings": q_cosine_topk_ivf,
        "semantic_dedup_embeddings": q_semantic_dedup,
        "semantic_contamination_embeddings": q_semantic_contamination,
        "cosine_topk_sq8_embeddings": q_cosine_topk_sq8,
        "embedding_neardup_pairs_embeddings": q_embedding_neardup,
        "arx_forecast_events_1h": q_arx_forecast,
        "arx_ridge_forecast_events_1h": q_arx_ridge_forecast,
        "arma_hr_forecast_events_1h": q_arma_hr_forecast,
        "arx_direct_forecast_events_1h": q_arx_direct_forecast,
        "ar_yw_forecast_events_1h": q_ar_yw_forecast,
        "arx_std_scaler_forecast_events_1h": q_arx_std_scaler_forecast,
        "ar_smols_forecast_events_1h": q_ar_smols_forecast,
        "arx_cross_forecast_events_1h": q_arx_cross_forecast,
        "arx_symb_forecast_events_1h": q_arx_symb_forecast,
        "arx_symb_direct_forecast_events_1h": q_arx_symb_direct_forecast,
        "arx_exo_forecast_events_1h": q_arx_exo_forecast,
        "arx_qof_rollvalidate_events_1h": q_arx_qof_roll,
        "multimodal_features_synth": q_multimodal_features,
        "video_frame_luma_synth": q_video_frame_luma,
        "gorilla_pack_events_1m": q_gorilla_pack,
        "gorilla_roundtrip_events_1m": q_gorilla_roundtrip,
        "retention_1m_events": q_retention_1m,
        "backcast_fill_events": q_backcast_fill,
        "asof_join_events_1m": q_asof_join,
        "gapfill_grid_events_1m": q_gapfill_grid,
        "tpch_q1_lineitem": q_tpch_q1,
        "tpch_q6_lineitem": q_tpch_q6,
        "tpch_q3_top_orders": q_tpch_q3,
        "tpch_q4_order_priority": q_tpch_q4,
        "tpch_q5_local_supplier": q_tpch_q5,
        "funnel_conversion_events": q_funnel_conversion,
        "customers_without_orders": q_customers_without_orders,
        "nation_revenue_join": q_nation_revenue,
        "promo_revenue_part_join": q_promo_revenue,
        "supplier_volume_topk": q_supplier_volume,
        "rollup_cube_events": q_rollup_cube,
        "distinct_users_events": q_distinct_users,
        "token_histogram_documents": q_token_histogram,
        "tfidf_topk_documents": q_tfidf_topk,
        "topk_per_group_events": q_topk_per_group,
        "sessionize_events": q_sessionize,
        "stream_rollup_1m_events": q_stream_rollup_1m,
        "rollup_1m_salted_events": q_rollup_1m_salted,
        "rollup_merge_increment_events": q_rollup_merge_increment,
        "checkpoint_resume_rollup_events": q_checkpoint_resume,
        "stream_locf_events": q_stream_locf,
        "stream_sessionize_events": q_stream_sessionize,
        "stream_dedup_events": q_stream_dedup,
        "feature_topk_events_1h": q_feature_topk,
        "csv_source_rollup_events": q_csv_source_rollup,
        "jsonl_source_rollup_events": q_jsonl_source_rollup,
        "time_weighted_avg_events_1h": q_time_weighted_avg,
        "counter_delta_events": q_counter_delta,
        "linear_deriv_events_1h": q_linear_deriv,
        "lttb_downsample_events": q_lttb_downsample,
        "ewma_events_1h": q_ewma,
        "holt_linear_events_1h": q_holt_linear,
        "holt_winters_events_1h": q_holt_winters,
        "kalman_level_events_1h": q_kalman_level,
        "sax_symbols_events_1h": q_sax_symbols,
        "time_in_state_events": q_time_in_state,
        "heartbeat_agg_events": q_heartbeat_agg,
        "ohlc_events_1h": q_ohlc,
        "cusum_events": q_cusum,
        "seasonal_profile_events": q_seasonal_profile,
        "bigram_collocations_documents": q_bigram_collocations,
        "bpe_merge_round_documents": q_bpe_merge_round,
        "bpe_encode_documents": q_bpe_encode,
        "quality_classifier_documents": q_quality_classifier,
        "interval_join_events_1h": q_interval_join,
        "dedup_keep_list_documents": q_dedup_keep_list,
        "mad_anomaly_events": q_mad_anomaly,
        "rolling_median_events": q_rolling_median,
        "acf_events": q_acf,
        "pacf_events": q_pacf,
        "ccf_events": q_ccf,
        "prewhitened_ccf_events": q_prewhitened_ccf,
        "hdr_quantiles_events": q_hdr_quantiles,
        "trimmed_mean_events": q_trimmed_mean,
        "seasonal_decompose_events": q_seasonal_decompose,
        "simpson_diversity_documents": q_simpson_diversity,
        "croston_purchase_events": q_croston,
        "tokens_checksum_documents": q_tokens_checksum,
        "data_loader_batches_events": q_data_loader,
        "bigram_fluency_documents": q_bigram_fluency,
        "burstiness_events": q_burstiness,
        "theil_sen_events_1h": q_theil_sen,
        "repetition_signals_documents": q_repetition_signals,
        "rolling_zscore_events": q_rolling_zscore,
        "quantiles_events": q_quantiles,
        "session_stats_events": q_session_stats,
        "cohort_retention_events": q_cohort_retention,
        "hll_distinct_users_events_1h": q_hll_distinct_users,
        "cmsketch_words_documents": q_cm_sketch,
        "stream_tier_upsert_events_1m": q_stream_tier_upsert,
        "matrix_profile_events_1h": q_matrix_profile,
        "bollinger_breakout_events": q_bollinger,
        "rsi_events_1h": q_rsi,
        "longest_run_events": q_longest_run,
        "series_dist_pairs_events_1h": q_series_dist_pairs,
        "mann_kendall_events_1h": q_mann_kendall,
        "ks_two_sample_events": q_ks_two_sample,
        "permutation_patterns_events_1h": q_permutation_patterns,
        "seasonal_naive_qof_events_1h": q_seasonal_naive_qof,
        "max_drawdown_events": q_max_drawdown,
        "vocab_stats_documents": q_vocab_stats,
        "trending_tokens_documents": q_trending_tokens,
        "chunk_tokens_documents": q_chunk_tokens,
        "ngram_novelty_documents": q_ngram_novelty,
        "spearman_pairs_events_1h": q_spearman_pairs,
        "runs_test_events_1h": q_runs_test,
        "pearson_pairs_events_1h": q_pearson_pairs,
        "winsorized_mean_events": q_winsorized_mean,
        "moments_events": q_moments,
        "rescaled_range_events": q_rescaled_range,
        "peak_detect_events": q_peak_detect,
        "theta_forecast_events_1h": q_theta_forecast,
        "stratified_sample_documents": q_stratified_sample,
        "source_token_budget_documents": q_source_token_budget,
        "gini_doclen_documents": q_gini_doclen,
        "zorder_zonemap_events": q_zorder_zonemap,
        "compaction_plan_events": q_compaction_plan,
        "haar_multires_events_1h": q_haar_multires,
        "binseg_changepoint_events": q_binseg_changepoint,
        "stl_strength_events": q_stl_strength,
        "cross_rank_events_1h": q_cross_rank,
        "turning_points_events_1h": q_turning_points,
        "cox_stuart_events_1h": q_cox_stuart,
        "bartels_rank_events_1h": q_bartels_rank,
        "von_neumann_events_1h": q_von_neumann,
        "grubbs_events_1h": q_grubbs,
        "gesd_outliers_events_1h": q_gesd_outliers,
        "shesd_outliers_events_1h": q_shesd_outliers,
        "segmented_trend_events_1h": q_segmented_trend,
        "ensemble_qof_events_1h": q_ensemble_qof,
        "freshness_report_events": q_freshness_report,
        "interarrival_stats_events": q_interarrival_stats,
        "isotonic_fit_events_1h": q_isotonic_fit,
        "dtw_pairs_events_1h": q_dtw_pairs,
        "friedman_events_1h": q_friedman,
        "kruskal_wallis_events": q_kruskal_wallis,
        "snaive_mase_events_1h": q_snaive_mase,
        "holt_damped_events_1h": q_holt_damped,
        "dm_test_events_1h": q_dm_test,
        "wilcoxon_signed_rank_events_1h": q_wilcoxon,
        "pettitt_events_1h": q_pettitt,
        "winkler_score_events_1h": q_winkler_score,
        "mann_whitney_events_1h": q_mann_whitney,
        "crps_ensemble_events_1h": q_crps_ensemble,
        "hier_reconcile_events": q_hier_reconcile,
        "sample_entropy_events_1h": q_sample_entropy,
        "tokenizer_fertility_documents": q_tokenizer_fertility,
        "packing_waste_documents": q_packing_waste,
        "winnowing_fingerprint_documents": q_winnowing_fingerprint,
        "readability_documents": q_readability,
        "ul2_denoiser_mix_documents": q_ul2_denoiser_mix,
        "var1_pairs_events_1h": q_var1_pairs,
        "pooled_ar_forecast_events_1h": q_pooled_ar_forecast,
        "pooled_ar_fe_forecast_events_1h": q_pooled_ar_fe_forecast,
        "mixture_allocation_documents": q_mixture_allocation,
        "winnowing_neardup_pairs_documents": q_winnowing_neardup_pairs,
        "arima210_forecast_events_1h": q_arima210_forecast,
        "holt_winters_mul_events_1h": q_holt_winters_mul,
        "rake_keywords_documents": q_rake_keywords,
        "epoch_shuffle_documents": q_epoch_shuffle,
        "siegel_slopes_events_1h": q_siegel_slopes,
        "markov_transitions_events": q_markov_transitions,
    }


def _sw_list(lang):
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _pw_cramer() -> str:
    """Cramer SELECT items for the prewhitening AR(2)+intercept fit in the
    [1, l1, l2] layout (most-recent lag first — matching the driver-side
    exact fit in operators/timeweight.prewhitened_ccf): aliases dd, d0-d2
    and the b0/f1/f2 coefficient divisions through the HUGEINT→DOUBLE
    cast, with the dd=0 intercept-only fallback."""
    from forecaster_spark.models.exact_sql import _det3

    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    c = ["sy", "sy1", "sy2"]
    items = [f"{_det3(A)} AS dd"]
    for k in range(3):
        Ak = [[c[i] if jj == k else A[i][jj] for jj in range(3)] for i in range(3)]
        items.append(f"{_det3(Ak)} AS d{k}")
    items.append(
        "CASE WHEN dd = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) "
        "ELSE CAST(d0 AS DOUBLE) / CAST(dd AS DOUBLE) END AS b0"
    )
    items.append("CASE WHEN dd = 0 THEN 0.0 ELSE CAST(d1 AS DOUBLE) / CAST(dd AS DOUBLE) END AS f1")
    items.append("CASE WHEN dd = 0 THEN 0.0 ELSE CAST(d2 AS DOUBLE) / CAST(dd AS DOUBLE) END AS f2")
    return ", ".join(items)


_ALL_SW = "[" + ", ".join(f"'{w}'" for w in sorted({w for sws in STOPWORDS.values() for w in sws})) + "]"

_BPE_SQL = BPE_ISH  # identical explicit-class value on both engines


def _cm_sketch_oracle() -> str:
    from forecaster_spark.operators import sketches

    return xhash_sql.cm_sketch_sql([int(s) for s in sketches.cm_salts()])


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_entries()
    # streamed stateful LOCF must equal the batch LOCF SQL exactly
    d["stream_locf_events"] = d["locf_events"]
    # the JSONL round-trip must equal the same parquet aggregate as the CSV one
    d["jsonl_source_rollup_events"] = d["csv_source_rollup_events"]
    # streamed stateful sessionization must equal the batch sessionize SQL
    d["stream_sessionize_events"] = d["sessionize_events"]
    # streamed dedup of the duplicate-injected stream must recover the
    # original table: each event exactly once
    d["stream_dedup_events"] = "SELECT event_id, ts, value FROM events"
    return d




def _gesd_oracle(rounds: int = 3, head: str | None = None) -> str:
    """Unrolled GESD rounds: each round recomputes the exact scaled
    deviations over the survivors, emits the Grubbs statistic, and
    anti-joins out the (ad DESC, v DESC, t) argmax before the next.
    ``head`` overrides the feeder CTE chain; it must end with a CTE
    ``o1(source, v, t)`` (v BIGINT, t the 0-based series position)."""
    if head is None:
        head = """th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o1 AS (
  SELECT source, CAST(yd AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
)"""
    ctes = [head]
    outs = []
    for r in range(1, rounds + 1):
        ctes.append(f"""a{r} AS (
  SELECT source, count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM o{r} GROUP BY 1
), d{r} AS (
  SELECT o.source, o.t, o.v, a.n,
         abs(a.n*o.v - a.s) AS ad, (a.n*o.v - a.s)*(a.n*o.v - a.s) AS sq
  FROM o{r} o JOIN a{r} a USING (source)
), g{r} AS (
  SELECT source, max(n) AS n, CAST(max(ad) AS BIGINT) AS maxdev,
         CAST(sum(sq) AS BIGINT) AS dev2
  FROM d{r} GROUP BY 1
), p{r} AS (
  SELECT source, t, v FROM (
    SELECT source, t, v,
           row_number() OVER (PARTITION BY source ORDER BY ad DESC, v DESC, t) AS rn
    FROM d{r}
  ) q WHERE rn = 1
)""")
        if r < rounds:
            ctes.append(f"""o{r + 1} AS (
  SELECT o.source, o.t, o.v
  FROM o{r} o LEFT JOIN p{r} p ON p.source = o.source AND p.t = o.t
  WHERE p.t IS NULL
)""")
        outs.append(f"""SELECT g.source, {r} AS round, CAST(g.n AS BIGINT) AS n,
       p.t AS removed_t, p.v AS removed_v,
       g.maxdev AS max_dev_scaled, g.dev2 AS dev2_sum,
       CASE WHEN g.dev2 > 0 THEN
         CAST(g.maxdev AS DOUBLE) / sqrt(CAST(g.dev2 AS DOUBLE) / CAST(g.n - 1 AS DOUBLE))
       END AS r_stat
FROM g{r} g JOIN p{r} p USING (source) WHERE g.n >= 2""")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(outs)


# S-H-ESD feeder for _gesd_oracle: hourly tier -> robust decompose (the
# _DECOMP_ORACLE chain on the hourly grid, ts-only ordering) -> o1 carries
# floor(resid) as the GESD input. MATERIALIZED: the unrolled rounds
# reference o1 repeatedly; inlining would re-run the median window per round.
_SHESD_HEAD = """th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, b AS ts, CAST(yd AS BIGINT) * 2000000 AS y2 FROM th
), t AS (
  SELECT source, ts, y2,
         CAST(quantile_cont(y2, 0.5) OVER (
           PARTITION BY source ORDER BY ts
           ROWS BETWEEN 48 PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS t2
  FROM s
), d AS (
  SELECT source, ts, y2 - t2 AS d2, CAST(hour(ts) AS BIGINT) AS hod FROM t
), se AS (
  SELECT source, hod, CAST(sum(d2) AS BIGINT) AS sd, count(*) AS n
  FROM d GROUP BY 1, 2
), sm AS (
  SELECT source, hod, CAST((sd - ((sd % n + n) % n)) // n AS BIGINT) AS s2
  FROM se
), base AS MATERIALIZED (
  SELECT d.source, d.ts, d.d2 - sm.s2 AS r2
  FROM d JOIN sm ON d.source = sm.source AND d.hod = sm.hod
), o1 AS (
  SELECT source, CAST(floor(r2 / 2000000.0) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY ts) - 1 AS t
  FROM base
)"""


def _stratified_sample_oracle() -> str:
    from forecaster_spark.operators.sampling import stratified_sample_sql

    return stratified_sample_sql(frac_num=1, frac_den=5, seed=11)


def _source_token_budget_oracle() -> str:
    from forecaster_spark.operators.sampling import source_token_budget_sql

    return source_token_budget_sql(budget=800, seed=11)


def _zorder_zonemap_oracle() -> str:
    from forecaster_spark.operators.layout import zorder_sql_expr

    zk = zorder_sql_expr("am", "bu", bits=12)
    return f"""
WITH d AS (
  SELECT (epoch_us(ts) // 60000000) % 4096 AS am,
         CAST(user_id % 4096 AS BIGINT) AS bu
  FROM events
), z AS (
  SELECT am, bu, {zk} AS zkey FROM d
)
SELECT zkey // 4096 AS zblock, count(*) AS n,
       min(am) AS min_am, max(am) AS max_am,
       min(bu) AS min_bu, max(bu) AS max_bu
FROM z GROUP BY 1"""




_DECOMP_ORACLE = """
WITH s AS (
  SELECT event_type AS source, ts, event_id, value AS y,
         CAST(round(value * 1000000) AS BIGINT) * 2 AS y2
  FROM events
), t AS (
  SELECT source, ts, event_id, y, y2,
         CAST(quantile_cont(y2, 0.5) OVER (
           PARTITION BY source ORDER BY ts, event_id
           ROWS BETWEEN 48 PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS t2
  FROM s
), d AS (
  SELECT source, ts, event_id, y, y2, t2, y2 - t2 AS d2,
         CAST(hour(ts) AS BIGINT) AS hod
  FROM t
), se AS (
  SELECT source, hod,
         CAST(sum(d2) AS BIGINT) AS sd, count(*) AS n
  FROM d GROUP BY 1, 2
), sm AS (
  SELECT source, hod,
         CAST((sd - ((sd % n + n) % n)) // n AS BIGINT) AS s2
  FROM se
)
SELECT d.source, d.ts, d.event_id, d.y,
       t2 / 2000000.0 AS trend,
       s2 / 2000000.0 AS seasonal,
       (d2 - s2) / 2000000.0 AS resid
FROM d JOIN sm ON d.source = sm.source AND d.hod = sm.hod"""


def _stl_strength_oracle() -> str:
    decomp = _DECOMP_ORACLE
    return f"""
WITH base AS MATERIALIZED ({decomp}),
q AS (
  SELECT source,
         CAST(floor(resid) AS BIGINT) AS r,
         CAST(floor(y - seasonal) AS BIGINT) AS a,
         CAST(floor(y - trend) AS BIGINT) AS b
  FROM base
), ag AS (
  SELECT source, count(*) AS n,
         CAST(sum(r) AS BIGINT) AS sr, CAST(sum(r * r) AS BIGINT) AS qr,
         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(a * a) AS BIGINT) AS qa,
         CAST(sum(b) AS BIGINT) AS sb, CAST(sum(b * b) AS BIGINT) AS qb
  FROM q GROUP BY source
), v AS (
  SELECT source, n,
         n * qr - sr * sr AS vr,
         n * qa - sa * sa AS va,
         n * qb - sb * sb AS vb
  FROM ag
)
SELECT source, n,
       CASE WHEN va > 0 THEN greatest(CAST(0 AS BIGINT), CAST(floor(
         (1.0 - (CAST(vr AS DOUBLE) / CAST(va AS DOUBLE))) * 1000000.0
       ) AS BIGINT)) END AS ft_q6,
       CASE WHEN vb > 0 THEN greatest(CAST(0 AS BIGINT), CAST(floor(
         (1.0 - (CAST(vr AS DOUBLE) / CAST(vb AS DOUBLE))) * 1000000.0
       ) AS BIGINT)) END AS fs_q6
FROM v"""


# Shared CTE block: hourly integer tier -> exact-integer ACF argmax over
# lags 2..48 (dominant period per source); `pick` has rk=1 as the winner.
_DP_CTES = """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, CAST(yd AS BIGINT) AS yv,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), ag AS (
  SELECT source, CAST(sum(yv) AS BIGINT) AS s, count(*) AS n FROM o GROUP BY 1
), c AS (
  SELECT o.source, o.idx,
         o.yv - (CASE WHEN s >= 0 THEN abs(s) // n ELSE -(abs(s) // n) END) AS dev,
         ag.n
  FROM o JOIN ag ON ag.source = o.source
), gz AS (
  SELECT source, CAST(sum(dev * dev) AS BIGINT) AS g0, max(n) AS n FROM c GROUP BY 1
), ks AS (SELECT unnest(generate_series(2, 48)) AS kk
), gk AS (
  SELECT a.source, CAST(ks.kk AS BIGINT) AS period,
         CAST(sum(a.dev * b.dev) AS BIGINT) AS gamma
  FROM ks CROSS JOIN c a JOIN c b
    ON b.source = a.source AND b.idx = a.idx - ks.kk
  GROUP BY 1, 2
), pick AS (
  SELECT gk.source, gk.period, gk.gamma, gz.g0, gz.n,
         row_number() OVER (PARTITION BY gk.source
                            ORDER BY gk.gamma DESC, gk.period ASC) AS rk
  FROM gk JOIN gz ON gz.source = gk.source
)"""


def _oracle_sql_entries() -> dict[str, str]:
    return {
        "rollup_1m_events": _ROLLUP_SQL + _SEL + "t1m",
        # full recompute over surviving rows — matching the incremental
        # Spark plan certifies incremental ≡ full (see q_retract_rebuild)
        "retract_rebuild_1m_events": _ROLLUP_SQL.replace(
            "SELECT event_type AS source, ts, value AS y FROM events",
            "SELECT event_type AS source, ts, value AS y FROM events"
            " WHERE event_id % 97 <> 0",
        )
        + _SEL
        + "t1m",
        "rollup_1h_cascade_events": _ROLLUP_SQL + _CASCADE_1H + _SEL + "t1h",
        "rollup_1d_cascade_events": _ROLLUP_SQL + _CASCADE_1H + """
, t1d AS (
  SELECT source, date_trunc('day', bucket_start) AS bucket_start,
         CAST(sum(cnt) AS BIGINT) AS cnt, sum(sum_micro) / 1000000.0 AS sum_y,
         min(min_y) AS min_y, max(max_y) AS max_y,
         sum(sum_micro) / 1000000.0 / sum(cnt) AS mean_y,
         min_by(first_y, bucket_start) AS first_y,
         max_by(last_y, bucket_start) AS last_y
  FROM t1h GROUP BY 1, 2
)
""" + _SEL + "t1d",
        "lag_features_events": _SERIES_SQL + f"""
SELECT source, event_id, y,
       coalesce(lag(y, 3) OVER w, first_value(y) OVER w) AS y_lag3,
       coalesce(lag(y, 2) OVER w, first_value(y) OVER w) AS y_lag2,
       coalesce(lag(y, 1) OVER w, first_value(y) OVER w) AS y_lag1
FROM series WINDOW w AS ({_W})""",
        "lead_targets_events": _SERIES_SQL + f"""
SELECT source, event_id, y,
       coalesce(lead(y, 1) OVER w, 0.0) AS y_lead1,
       coalesce(lead(y, 2) OVER w, 0.0) AS y_lead2,
       coalesce(lead(y, 3) OVER w, 0.0) AS y_lead3
FROM series WINDOW w AS ({_W})""",
        "trend_time_index_events": _SERIES_SQL + f"""
SELECT source, event_id, t,
       td / m AS trend1,
       (td - m/2.0) * (td - m/2.0) / ((m/2.0) * (m/2.0)) AS trend2
FROM (
  SELECT source, event_id,
         row_number() OVER ({_W}) - 1 AS t,
         CAST(row_number() OVER ({_W}) - 1 AS DOUBLE) AS td,
         count(*) OVER (PARTITION BY source) AS m
  FROM series
)""",
        "minmax_scale_events": _SERIES_SQL + """
SELECT source, event_id, y,
       (y - mn) / (CASE WHEN mx - mn = 0.0 THEN 1.0 ELSE mx - mn END) * 4.0 + 0.0 AS y_mm
FROM (
  SELECT source, event_id, y,
         min(y) OVER (PARTITION BY source) AS mn,
         max(y) OVER (PARTITION BY source) AS mx
  FROM series
)""",
        "robust_scale_events": """
WITH q AS (
  SELECT event_type AS source,
         quantile_cont(CAST(round(value * 100) AS BIGINT) * 4, 0.5) AS med4,
         quantile_cont(CAST(round(value * 100) AS BIGINT) * 4, 0.75)
           - quantile_cont(CAST(round(value * 100) AS BIGINT) * 4, 0.25) AS iqr4
  FROM events GROUP BY 1
)
SELECT e.event_type AS source, e.event_id, e.value AS y,
       (CAST(round(e.value * 100) AS BIGINT) * 4 - q.med4)
         / (CASE WHEN q.iqr4 = 0.0 THEN 4.0 ELSE q.iqr4 END) AS y_rs
FROM events e JOIN q ON e.event_type = q.source""",
        "drift_chi2_events": """
WITH b AS (
  SELECT event_type AS source, epoch_us(ts) AS tm,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), m AS (SELECT (min(tm) + max(tm)) // 2 AS mid FROM b),
h AS (
  SELECT source, v // 2500 AS bin,
         sum(CASE WHEN tm <= mid THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN tm > mid THEN 1 ELSE 0 END) AS c2
  FROM b, m GROUP BY 1, 2
)
SELECT source, bin, bin * 2500 AS bin_lo,
       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
       CAST((c1 - c2) * (c1 - c2) AS DOUBLE) / CAST(c1 + c2 AS DOUBLE) AS chi2_term
FROM h""",
        "locf_events": f"""
WITH nulled AS (
  SELECT event_type AS source, ts, event_id,
         CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS y
  FROM events
)
SELECT source, event_id,
       last_value(y IGNORE NULLS) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
FROM nulled""",
        "linear_interp_events": f"""
WITH nulled AS (
  SELECT event_type AS source, ts, event_id, epoch_us(ts) AS tus,
         CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS y
  FROM events
), ctx AS (
  SELECT source, event_id, y, tus,
         last_value(y IGNORE NULLS) OVER wb AS prev_v,
         last_value(CASE WHEN y IS NOT NULL THEN tus END IGNORE NULLS) OVER wb AS prev_t,
         first_value(y IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN y IS NOT NULL THEN tus END IGNORE NULLS) OVER wf AS next_t
  FROM nulled
  WINDOW wb AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS ({_W} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT source, event_id,
       CASE WHEN y IS NOT NULL THEN y
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            ELSE prev_v + (next_v - prev_v) *
                 (CAST(tus - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
       END AS y
FROM ctx""",
        "qof_persistence_events": _SERIES_SQL + f"""
, lagged AS (
  SELECT source, y,
         lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2, lag(y, 3) OVER w AS l3
  FROM series WINDOW w AS ({_W})
), pairs AS (
  SELECT source, 1 AS h, y AS y_true, l1 AS y_hat FROM lagged WHERE l1 IS NOT NULL
  UNION ALL
  SELECT source, 2, y, l2 FROM lagged WHERE l2 IS NOT NULL
  UNION ALL
  SELECT source, 3, y, l3 FROM lagged WHERE l3 IS NOT NULL
), sums AS (
  SELECT source, h, count(*) AS m,
         CAST(sum(CAST(floor(y_true * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_y,
         CAST(sum(CAST(floor(y_true * y_true * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_y2,
         CAST(sum(CAST(floor((y_true - y_hat) * (y_true - y_hat) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS ss_res,
         CAST(sum(CAST(floor(abs(y_true - y_hat) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_abs,
         CAST(sum(CAST(floor(2.0 * abs(y_true - y_hat) / (abs(y_true) + abs(y_hat) + 1e-10) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_sm
  FROM pairs GROUP BY source, h
)
SELECT source, h,
       ss_res / m AS mse,
       sum_abs / m AS mae,
       CASE WHEN abs(sum_y2 - sum_y * sum_y / m) < 1e-300 THEN 0.0
            ELSE 1.0 - ss_res / (sum_y2 - sum_y * sum_y / m) END AS r2,
       CASE WHEN m <= 2 THEN CAST('nan' AS DOUBLE)
            ELSE 1.0 - (1.0 - (CASE WHEN abs(sum_y2 - sum_y * sum_y / m) < 1e-300 THEN 0.0
                                    ELSE 1.0 - ss_res / (sum_y2 - sum_y * sum_y / m) END))
                       * (m - 1) / (m - 1 - 1) END AS r2bar,
       100.0 * sum_sm / m AS smape,
       m
FROM sums""",
        "dedup_exact_documents": """
SELECT doc_id FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
ORDER BY doc_id""",
        "token_counts_documents": f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_tokens_ws,
       len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_tokens_bpe
FROM documents""",
        "lang_id_documents": f"""
WITH ws AS (
  SELECT doc_id, lang, list_distinct(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w
  FROM documents
), hits AS (
  SELECT doc_id, lang,
         len(list_intersect(w, {_sw_list('en')})) AS n_en,
         len(list_intersect(w, {_sw_list('de')})) AS n_de,
         len(list_intersect(w, {_sw_list('fr')})) AS n_fr,
         len(list_intersect(w, {_sw_list('es')})) AS n_es
  FROM ws
), fold AS (
  -- mirrors the engine's fold order: en seed, then de/fr/es each replacing
  -- only on strictly greater hit count
  SELECT doc_id, lang, n_en, n_de, n_fr, n_es,
         CASE WHEN n_de > n_en THEN n_de ELSE n_en END AS b2,
         CASE WHEN n_de > n_en THEN 'de' ELSE 'en' END AS l2
  FROM hits
), fold2 AS (
  SELECT *, CASE WHEN n_fr > b2 THEN n_fr ELSE b2 END AS b3,
            CASE WHEN n_fr > b2 THEN 'fr' ELSE l2 END AS l3
  FROM fold
), fold3 AS (
  SELECT *, CASE WHEN n_es > b3 THEN n_es ELSE b3 END AS b4,
            CASE WHEN n_es > b3 THEN 'es' ELSE l3 END AS l4
  FROM fold2
)
SELECT doc_id, lang, CASE WHEN b4 > 0 THEN l4 ELSE 'und' END AS lang_pred FROM fold3""",
        "quality_documents": f"""
WITH feats AS (
  SELECT doc_id,
         len(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_words,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS n_punct,
         len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                         w -> list_contains({_ALL_SW}, w))) AS sw_hits
  FROM documents
), ratios AS (
  SELECT doc_id, n_words,
         n_punct / greatest(n_chars, 1) AS punct_ratio,
         sw_hits / greatest(n_words, 1) AS stopword_ratio,
         (n_chars - (n_words - 1)) / greatest(n_words, 1) AS mean_word_len
  FROM feats
)
SELECT doc_id, n_words, punct_ratio, stopword_ratio, mean_word_len,
       (least(n_words / 20.0, 1.0) * 0.3
        + (CASE WHEN punct_ratio <= 0.2 THEN 1.0
                ELSE greatest(0.0, 1.0 - (punct_ratio - 0.2) * 5.0) END) * 0.2
        + least(stopword_ratio * 5.0, 1.0) * 0.3
        + (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
       ) AS quality
FROM ratios""",
        "jaccard_consecutive_documents": """
WITH wset AS (
  SELECT doc_id, list_distinct(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS ws
  FROM documents
)
SELECT a.doc_id AS doc_id,
       len(list_intersect(a.ws, b.ws)) / len(list_distinct(list_concat(a.ws, b.ws))) AS jaccard
FROM wset a JOIN wset b ON b.doc_id = a.doc_id + 1""",
        # exact-solver forecast pipelines (models/exact_sql.py mirrors)
        "arx_forecast_events_1h": exact_sql.arx_recursive_sql(),
        "arx_ridge_forecast_events_1h": exact_sql.arx_ridge_sql(10000),
        "arma_hr_forecast_events_1h": exact_sql.arma_hr_sql(8),
        "arx_direct_forecast_events_1h": exact_sql.arx_direct_sql(),
        "ar_yw_forecast_events_1h": exact_sql.ar_yw_sql(),
        "arx_std_scaler_forecast_events_1h": exact_sql.arx_std_scaler_quantized_sql(),
        "ar_smols_forecast_events_1h": exact_sql.ar_sm_ols_sql(),
        "arx_cross_forecast_events_1h": exact_sql.arx_cross_sql(),
        "arx_exo_forecast_events_1h": exact_sql.arx_exo_sql(),
        "arx_symb_forecast_events_1h": exact_sql.arx_symb_sql(),
        "arx_symb_direct_forecast_events_1h": exact_sql.arx_symb_direct_sql(),
        "arx_qof_rollvalidate_events_1h": exact_sql.arx_qof_roll_sql(rc=2),
        "feature_topk_events_1h": exact_sql.feature_topk_sql(k=3),
        "lttb_downsample_events": lttb_sql(k=20),
        "session_stats_events": """
WITH g AS (
  -- floor(epoch) mirrors Spark's second-truncating unix_timestamp so the
  -- 1800 s boundary classifies identically under sub-second event times
  SELECT user_id, event_id, ts,
         floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS gap
  FROM events
), s AS (
  SELECT user_id, event_id, ts,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
), per_sess AS (
  SELECT user_id, session_id,
         CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS dur_s,
         count(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(dur_s) AS BIGINT) AS total_dur_s,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_sess GROUP BY user_id""",
        "cohort_retention_events": """
WITH fd AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
)
SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
       CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
       count(DISTINCT e.user_id) AS n_users, count(*) AS n_events
FROM events e JOIN fd f USING (user_id)
GROUP BY 1, 2""",
        "quantiles_events": """
SELECT event_type AS source,
       quantile_cont(value, 0.25) AS p25, quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.75) AS p75, quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       count(*) AS n
FROM events GROUP BY 1""",
        "mad_anomaly_events": """
WITH s AS (
  SELECT event_type AS source, event_id, value AS y,
         CAST(round(value * 1000000) AS BIGINT) * 2 AS v2
  FROM events
), m AS (
  SELECT source, quantile_cont(v2, 0.5) AS m2 FROM s GROUP BY 1
), d AS (
  SELECT s.source, s.event_id, s.y, m.m2,
         CAST(abs(CAST(s.v2 AS DOUBLE) - m.m2) AS BIGINT) AS dev2
  FROM s JOIN m USING (source)
), md AS (
  SELECT source, quantile_cont(dev2 * 2, 0.5) AS mad4 FROM d GROUP BY 1
)
SELECT d.source, d.event_id, d.y,
       d.m2 / 2000000.0 AS med, md.mad4 / 4000000.0 AS mad,
       CAST(d.dev2 * 2000 AS DOUBLE) > 3000.0 * md.mad4 AS is_anomaly
FROM d JOIN md USING (source)""",
        "rolling_median_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id, value AS y,
         CAST(round(value * 1000000) AS BIGINT) * 2 AS v2
  FROM events
)
SELECT source, event_id, y,
       quantile_cont(v2, 0.5) OVER (
         PARTITION BY source ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) / 2000000.0 AS med_roll
FROM s""",
        "acf_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), c AS (
  SELECT source, ts, event_id, vc,
         vc - CAST(sum(vc) OVER (PARTITION BY source)
                   // count(*) OVER (PARTITION BY source) AS BIGINT) AS dev
  FROM s
), l AS (
  SELECT source, dev,
         lag(dev, 1) OVER w AS d1, lag(dev, 2) OVER w AS d2,
         lag(dev, 3) OVER w AS d3, lag(dev, 4) OVER w AS d4,
         lag(dev, 5) OVER w AS d5
  FROM c WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)
), g AS (
  SELECT source,
         CAST(sum(dev * dev) AS BIGINT) AS g0,
         CAST(sum(dev * d1) AS BIGINT) AS g1, count(d1) AS n1,
         CAST(sum(dev * d2) AS BIGINT) AS g2, count(d2) AS n2,
         CAST(sum(dev * d3) AS BIGINT) AS g3, count(d3) AS n3,
         CAST(sum(dev * d4) AS BIGINT) AS g4, count(d4) AS n4,
         CAST(sum(dev * d5) AS BIGINT) AS g5, count(d5) AS n5
  FROM l GROUP BY 1
)
SELECT source, CAST(1 AS BIGINT) AS lag, g1 AS gamma,
       CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE) AS rho, n1 AS n_used FROM g
UNION ALL SELECT source, 2, g2, CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE), n2 FROM g
UNION ALL SELECT source, 3, g3, CAST(g3 AS DOUBLE) / CAST(g0 AS DOUBLE), n3 FROM g
UNION ALL SELECT source, 4, g4, CAST(g4 AS DOUBLE) / CAST(g0 AS DOUBLE), n4 FROM g
UNION ALL SELECT source, 5, g5, CAST(g5 AS DOUBLE) / CAST(g0 AS DOUBLE), n5 FROM g""",
        "pacf_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 10) AS BIGINT) AS vc
  FROM events
), c AS (
  SELECT source, ts, event_id, vc,
         vc - CAST(sum(vc) OVER (PARTITION BY source)
                   // count(*) OVER (PARTITION BY source) AS BIGINT) AS dev
  FROM s
), l AS (
  SELECT source, dev,
         lag(dev, 1) OVER w AS d1, lag(dev, 2) OVER w AS d2,
         lag(dev, 3) OVER w AS d3
  FROM c WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)
), g AS (
  SELECT source,
         CAST(sum(dev * dev) AS HUGEINT) AS g0,
         CAST(sum(dev * d1) AS HUGEINT) AS g1, count(d1) AS n1,
         CAST(sum(dev * d2) AS HUGEINT) AS g2, count(d2) AS n2,
         CAST(sum(dev * d3) AS HUGEINT) AS g3, count(d3) AS n3
  FROM l GROUP BY 1
), d AS (
  SELECT source, g0, g1, g2, g3, n1, n2, n3,
         g0 * g2 - g1 * g1 AS num2,
         g0 * g0 - g1 * g1 AS den2,
         g0 * (g0 * g3 - g2 * g1) - g1 * (g1 * g3 - g2 * g2)
           + g1 * (g1 * g1 - g0 * g2) AS num3,
         g0 * (g0 * g0 - g1 * g1) - g1 * (g1 * g0 - g1 * g2)
           + g2 * (g1 * g1 - g0 * g2) AS den3
  FROM g
)
SELECT source, CAST(1 AS BIGINT) AS lag, CAST(g1 AS BIGINT) AS gamma,
       CASE WHEN g0 = 0 THEN NULL
            ELSE CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE) END AS pacf,
       n1 AS n_used FROM d
UNION ALL SELECT source, 2, CAST(g2 AS BIGINT),
       CASE WHEN den2 = 0 THEN NULL
            ELSE CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE) END, n2 FROM d
UNION ALL SELECT source, 3, CAST(g3 AS BIGINT),
       CASE WHEN den3 = 0 THEN NULL
            ELSE CAST(num3 AS DOUBLE) / CAST(den3 AS DOUBLE) END, n3 FROM d""",
        # prewhitened CCF: AR(2) Cramer in the [1, l1, l2] layout (most-
        # recent lag first, matching the driver-side fit), residual chain
        # and centering parenthesized identically to the Spark leg
        "prewhitened_ccf_events": f"""
WITH b AS (
  SELECT event_type AS s, date_trunc('minute', ts) AS bk,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), gx AS (
  SELECT bk, CAST(CAST(CAST(sum(vc) AS BIGINT) // count(*) AS BIGINT) // 100 AS BIGINT) AS xv
  FROM b WHERE s = 'click' GROUP BY 1
), gy AS (
  SELECT bk, CAST(CAST(CAST(sum(vc) AS BIGINT) // count(*) AS BIGINT) // 100 AS BIGINT) AS yv
  FROM b WHERE s = 'view' GROUP BY 1
), j AS (
  SELECT gx.bk, xv, yv FROM gx JOIN gy USING (bk)
), lg AS (
  SELECT bk, xv, yv,
         lag(xv, 1) OVER w AS l1x, lag(xv, 2) OVER w AS l2x,
         lag(yv, 1) OVER w AS l1y, lag(yv, 2) OVER w AS l2y
  FROM j WINDOW w AS (ORDER BY bk)
), cond AS (
  SELECT * FROM lg WHERE l2x IS NOT NULL AND l2y IS NOT NULL
), sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1x) AS HUGEINT) AS s1, CAST(sum(l2x) AS HUGEINT) AS s2,
         CAST(sum(l1x*l1x) AS HUGEINT) AS s11, CAST(sum(l1x*l2x) AS HUGEINT) AS s12,
         CAST(sum(l2x*l2x) AS HUGEINT) AS s22,
         CAST(sum(xv) AS HUGEINT) AS sy, CAST(sum(xv*l1x) AS HUGEINT) AS sy1,
         CAST(sum(xv*l2x) AS HUGEINT) AS sy2
  FROM cond
), params AS (
  SELECT {_pw_cramer()} FROM sums
), eqt AS (
  SELECT c.bk,
         CAST(floor((c.xv - ((p.b0 + c.l1x*p.f1) + c.l2x*p.f2)) * 256.0) AS BIGINT) AS ex,
         CAST(floor((c.yv - ((p.b0 + c.l1y*p.f1) + c.l2y*p.f2)) * 256.0) AS BIGINT) AS ey
  FROM cond c, params p
), ctr AS (
  SELECT CAST(sum(ex) AS BIGINT) AS sx, CAST(sum(ey) AS BIGINT) AS sq,
         count(*) AS cnt
  FROM eqt
), d AS (
  SELECT bk,
         ex - CAST(floor(CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT) AS dx,
         ey - CAST(floor(CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT) AS dy
  FROM eqt, ctr
), l AS (
  SELECT dx, dy,
         lead(dy, 3) OVER w AS dm3, lead(dy, 2) OVER w AS dm2,
         lead(dy, 1) OVER w AS dm1,
         lag(dy, 1) OVER w AS dp1, lag(dy, 2) OVER w AS dp2,
         lag(dy, 3) OVER w AS dp3
  FROM d WINDOW w AS (ORDER BY bk)
), t AS (
  SELECT CAST(sum(dx * dx) AS BIGINT) AS gx0,
         CAST(sum(dy * dy) AS BIGINT) AS gy0,
         CAST(sum(dx * dm3) AS BIGINT) AS gm3, count(dm3) AS nm3,
         CAST(sum(dx * dm2) AS BIGINT) AS gm2, count(dm2) AS nm2,
         CAST(sum(dx * dm1) AS BIGINT) AS gm1, count(dm1) AS nm1,
         CAST(sum(dx * dy) AS BIGINT) AS g00, count(dy) AS n00,
         CAST(sum(dx * dp1) AS BIGINT) AS gp1, count(dp1) AS np1,
         CAST(sum(dx * dp2) AS BIGINT) AS gp2, count(dp2) AS np2,
         CAST(sum(dx * dp3) AS BIGINT) AS gp3, count(dp3) AS np3
  FROM l
)
SELECT CAST(-3 AS BIGINT) AS lag, gm3 AS gxy,
       CAST(gm3 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)) AS r,
       nm3 AS n_used FROM t
UNION ALL SELECT -2, gm2, CAST(gm2 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), nm2 FROM t
UNION ALL SELECT -1, gm1, CAST(gm1 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), nm1 FROM t
UNION ALL SELECT 0, g00, CAST(g00 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), n00 FROM t
UNION ALL SELECT 1, gp1, CAST(gp1 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), np1 FROM t
UNION ALL SELECT 2, gp2, CAST(gp2 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), np2 FROM t
UNION ALL SELECT 3, gp3, CAST(gp3 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), np3 FROM t""",
        "ccf_events": """
WITH b AS (
  SELECT event_type AS s, date_trunc('minute', ts) AS bk,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), gx AS (
  SELECT bk, CAST(CAST(sum(vc) AS BIGINT) // count(*) AS BIGINT) AS xm
  FROM b WHERE s = 'click' GROUP BY 1
), gy AS (
  SELECT bk, CAST(CAST(sum(vc) AS BIGINT) // count(*) AS BIGINT) AS ym
  FROM b WHERE s = 'view' GROUP BY 1
), j AS (
  SELECT gx.bk, xm, ym FROM gx JOIN gy USING (bk)
), c AS (
  SELECT bk,
         xm - CAST(sum(xm) OVER () // count(*) OVER () AS BIGINT) AS dx,
         ym - CAST(sum(ym) OVER () // count(*) OVER () AS BIGINT) AS dy
  FROM j
), l AS (
  SELECT dx, dy,
         lead(dy, 3) OVER w AS dm3, lead(dy, 2) OVER w AS dm2,
         lead(dy, 1) OVER w AS dm1,
         lag(dy, 1) OVER w AS dp1, lag(dy, 2) OVER w AS dp2,
         lag(dy, 3) OVER w AS dp3
  FROM c WINDOW w AS (ORDER BY bk)
), t AS (
  SELECT CAST(sum(dx * dx) AS BIGINT) AS gx0,
         CAST(sum(dy * dy) AS BIGINT) AS gy0,
         CAST(sum(dx * dm3) AS BIGINT) AS gm3, count(dm3) AS nm3,
         CAST(sum(dx * dm2) AS BIGINT) AS gm2, count(dm2) AS nm2,
         CAST(sum(dx * dm1) AS BIGINT) AS gm1, count(dm1) AS nm1,
         CAST(sum(dx * dy) AS BIGINT) AS g00, count(dy) AS n00,
         CAST(sum(dx * dp1) AS BIGINT) AS gp1, count(dp1) AS np1,
         CAST(sum(dx * dp2) AS BIGINT) AS gp2, count(dp2) AS np2,
         CAST(sum(dx * dp3) AS BIGINT) AS gp3, count(dp3) AS np3
  FROM l
)
SELECT CAST(-3 AS BIGINT) AS lag, gm3 AS gxy,
       CAST(gm3 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)) AS r,
       nm3 AS n_used FROM t
UNION ALL SELECT -2, gm2, CAST(gm2 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), nm2 FROM t
UNION ALL SELECT -1, gm1, CAST(gm1 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), nm1 FROM t
UNION ALL SELECT 0, g00, CAST(g00 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), n00 FROM t
UNION ALL SELECT 1, gp1, CAST(gp1 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), np1 FROM t
UNION ALL SELECT 2, gp2, CAST(gp2 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), np2 FROM t
UNION ALL SELECT 3, gp3, CAST(gp3 AS DOUBLE) / sqrt(CAST(gx0 AS DOUBLE) * CAST(gy0 AS DOUBLE)), np3 FROM t""",
        "hdr_quantiles_events": """
WITH s AS (
  SELECT event_type AS source,
         greatest(CAST(round(value * 100) AS BIGINT), 0) AS vc
  FROM events
), l AS (
  SELECT source, vc,
         greatest(length(bin(vc)) - 4, 0) AS sh
  FROM s
), h AS (
  SELECT source, (vc >> sh) << sh AS bin_lb, count(*) AS cnt
  FROM l GROUP BY 1, 2
), c AS (
  SELECT source, bin_lb, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY bin_lb) AS cum,
         sum(cnt) OVER (PARTITION BY source) AS n
  FROM h
)
SELECT source, CAST(max(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN bin_lb END) AS DOUBLE) / 100.0 AS p50,
       CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN bin_lb END) AS DOUBLE) / 100.0 AS p90,
       CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin_lb END) AS DOUBLE) / 100.0 AS p99
FROM c GROUP BY 1""",
        "theil_sen_events_1h": """
WITH p AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         epoch_us(ts) // 1000000 AS t,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), pr AS (
  SELECT a.source, a.bucket_start,
         ((b.v - a.v) * 1000
            - ((((b.v - a.v) * 1000) % (b.t - a.t) + (b.t - a.t)) % (b.t - a.t))
         ) // (b.t - a.t) * 2 AS s2
  FROM p a JOIN p b
    ON a.source = b.source AND a.bucket_start = b.bucket_start AND a.t < b.t
), np_ AS (
  SELECT source, bucket_start, count(*) AS n_points FROM p GROUP BY 1, 2
)
SELECT pr.source, pr.bucket_start, n.n_points, count(*) AS n_pairs,
       quantile_cont(s2, 0.5) / 200000.0 AS slope
FROM pr JOIN np_ n ON pr.source = n.source AND pr.bucket_start = n.bucket_start
GROUP BY pr.source, pr.bucket_start, n.n_points""",
        "burstiness_events": """
WITH pm AS (
  SELECT event_type AS source,
         epoch_us(date_trunc('minute', ts)) // 60000000 AS m,
         count(*) AS c
  FROM events GROUP BY 1, 2
), g AS (
  SELECT source,
         CAST(max(m) - min(m) + 1 AS BIGINT) AS n_minutes_spanned,
         count(*) AS n_minutes_active,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS c2
  FROM pm GROUP BY 1
)
SELECT source, n_minutes_spanned, n_minutes_active, n_events,
       CAST(n_minutes_spanned * c2 - n_events * n_events AS DOUBLE)
         / CAST(n_minutes_spanned * n_events AS DOUBLE) AS dispersion
FROM g""",
        "croston_purchase_events": """
WITH RECURSIVE s AS (
  SELECT concat('u', CAST(user_id % 4 AS VARCHAR)) AS source,
         epoch_us(date_trunc('minute', ts)) // 60000000 AS m,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS d
  FROM events
  WHERE event_type = 'purchase' AND value > 100
  GROUP BY 1, 2
), o AS (
  SELECT source, m, CAST(d AS DOUBLE) AS d,
         CAST(m - lag(m) OVER (PARTITION BY source ORDER BY m) AS DOUBLE) AS i,
         row_number() OVER (PARTITION BY source ORDER BY m) - 1 AS idx
  FROM s
), walk(source, idx, z, q) AS (
  SELECT source, idx, d, CAST(1 AS DOUBLE) FROM o WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.d * 0.25 + w.z * 0.75, p.i * 0.25 + w.q * 0.75
  FROM walk w JOIN o p ON p.source = w.source AND p.idx = w.idx + 1
), fin AS (
  SELECT source, max(idx) AS mi FROM o GROUP BY 1
)
SELECT w.source, CAST(f.mi + 1 AS BIGINT) AS n_demands, w.z, w.q,
       w.z / w.q / 100.0 AS rate
FROM walk w JOIN fin f ON w.source = f.source AND w.idx = f.mi""",
        "simpson_diversity_documents": """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS ws
  FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS n
  FROM (SELECT doc_id, unnest(ws) AS w FROM w) GROUP BY 1, 2
), st AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words,
         CAST(sum(n * n) AS BIGINT) AS collision_mass
  FROM wc GROUP BY 1
)
SELECT d.doc_id,
       coalesce(n_words, 0) AS n_words,
       coalesce(n_distinct_words, 0) AS n_distinct_words,
       coalesce(collision_mass, 0) AS collision_mass,
       CAST(n_words * n_words AS DOUBLE) / CAST(collision_mass AS DOUBLE) AS inv_simpson
FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""",
        "seasonal_decompose_events": _DECOMP_ORACLE,
        "trimmed_mean_events": """
WITH s AS (
  SELECT event_type AS source, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
), r AS (
  SELECT source, vm,
         row_number() OVER (PARTITION BY source ORDER BY vm, event_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM s
)
SELECT source, CAST(max(n) AS BIGINT) AS n,
       count(*) AS n_kept,
       CAST(CAST(sum(vm) AS BIGINT) // count(*) AS BIGINT) / 1000000.0 AS trimmed_mean
FROM r
WHERE rk > (5 * n + 99) // 100 AND rk <= n - (5 * n + 99) // 100
GROUP BY 1""",
        "repetition_signals_documents": """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS ws
  FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS n
  FROM (SELECT doc_id, unnest(ws) AS w FROM w) GROUP BY 1, 2
), wstat AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words, max(n) AS top_word_n
  FROM wc GROUP BY 1
), pc AS (
  SELECT doc_id, w1, w2, count(*) AS n
  FROM (
    SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
    FROM (SELECT doc_id, ws,
                 unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
          FROM w)
  ) GROUP BY 1, 2, 3
), pstat AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
         count(*) AS n_distinct_bigrams, max(n) AS top_bigram_n
  FROM pc GROUP BY 1
)
SELECT d.doc_id,
       coalesce(n_words, 0) AS n_words,
       coalesce(n_distinct_words, 0) AS n_distinct_words,
       coalesce(top_word_n, 0) AS top_word_n,
       coalesce(n_bigrams, 0) AS n_bigrams,
       coalesce(n_distinct_bigrams, 0) AS n_distinct_bigrams,
       coalesce(top_bigram_n, 0) AS top_bigram_n,
       CASE WHEN coalesce(n_words, 0) > 0 THEN
         CAST(n_words - n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE)
       END AS dup_word_frac,
       CASE WHEN coalesce(n_words, 0) > 0 THEN
         CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE)
       END AS top_word_frac,
       CASE WHEN coalesce(n_bigrams, 0) > 0 THEN
         CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       END AS dup_bigram_frac,
       CASE WHEN coalesce(n_bigrams, 0) > 0 THEN
         CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       END AS top_bigram_frac
FROM documents d
LEFT JOIN wstat USING (doc_id) LEFT JOIN pstat USING (doc_id)""",
        "ewma_events_1h": """
WITH RECURSIVE th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), walk(source, idx, ts, y, e) AS (
  SELECT source, idx, ts, y, y FROM o WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.ts, p.y, p.y * 0.25 + w.e * 0.75
  FROM walk w JOIN o p ON p.source = w.source AND p.idx = w.idx + 1
)
SELECT source, ts, y, e AS ewma FROM walk""",
        "holt_linear_events_1h": """
WITH RECURSIVE th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), walk(source, idx, ts, y, level, trend) AS (
  SELECT source, idx, ts, y, y, CAST(0 AS DOUBLE) FROM o WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.ts, p.y,
         p.y * 0.25 + (w.level + w.trend) * 0.75,
         ((p.y * 0.25 + (w.level + w.trend) * 0.75) - w.level) * 0.5 + w.trend * 0.5
  FROM walk w JOIN o p ON p.source = w.source AND p.idx = w.idx + 1
)
SELECT source, ts, y, level, trend, level + trend AS fc1 FROM walk""",
        "holt_winters_events_1h": """
WITH RECURSIVE th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), walk(source, idx, ts, y, level, trend, seasonal, slist) AS (
  SELECT source, idx, ts, y, y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
         list_transform(range(24), x -> CAST(0 AS DOUBLE))
  FROM o WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.ts, p.y,
         (p.y - w.slist[1]) * 0.25 + (w.level + w.trend) * 0.75,
         (((p.y - w.slist[1]) * 0.25 + (w.level + w.trend) * 0.75) - w.level) * 0.5
           + w.trend * 0.5,
         (p.y - (w.level + w.trend)) * 0.125 + w.slist[1] * 0.875,
         list_append(w.slist[2:],
                     (p.y - (w.level + w.trend)) * 0.125 + w.slist[1] * 0.875)
  FROM walk w JOIN o p ON p.source = w.source AND p.idx = w.idx + 1
)
SELECT source, ts, y, level, trend, seasonal,
       level + trend + slist[1] AS fc1
FROM walk""",
        "sax_symbols_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, CAST(yd AS BIGINT) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), segs AS (
  SELECT source, idx // 8 AS seg, count(*) AS n_points,
         CAST(sum(y) AS BIGINT) AS seg_sum
  FROM o GROUP BY 1, 2 HAVING count(*) = 8
), q AS (
  SELECT source, quantile_cont(seg_sum * 4, 0.25) AS q1,
         quantile_cont(seg_sum * 4, 0.5) AS q2,
         quantile_cont(seg_sum * 4, 0.75) AS q3
  FROM segs GROUP BY 1
)
SELECT s.source, s.seg, s.n_points, s.seg_sum,
       CASE WHEN s.seg_sum * 4 < q.q1 THEN 'a'
            WHEN s.seg_sum * 4 < q.q2 THEN 'b'
            WHEN s.seg_sum * 4 < q.q3 THEN 'c'
            ELSE 'd' END AS symbol
FROM segs s JOIN q ON s.source = q.source""",
        "kalman_level_events_1h": """
WITH RECURSIVE th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), walk(source, idx, ts, y, x, gain, p) AS (
  SELECT source, idx, ts, y, y, CAST(0 AS DOUBLE), CAST(4.0 AS DOUBLE)
  FROM o WHERE idx = 0
  UNION ALL
  SELECT p2.source, p2.idx, p2.ts, p2.y,
         w.x + ((w.p + 0.25) / ((w.p + 0.25) + 4.0)) * (p2.y - w.x),
         (w.p + 0.25) / ((w.p + 0.25) + 4.0),
         (1.0 - (w.p + 0.25) / ((w.p + 0.25) + 4.0)) * (w.p + 0.25)
  FROM walk w JOIN o p2 ON p2.source = w.source AND p2.idx = w.idx + 1
)
SELECT source, ts, y, x, gain, p AS p_var FROM walk""",
        "time_in_state_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CASE WHEN value < 25 THEN 'low' WHEN value < 75 THEN 'mid'
              ELSE 'high' END AS state,
         epoch_us(ts) // 1000 AS t
  FROM events
), l AS (
  SELECT source, state, t,
         lead(t) OVER w AS nt, lag(state) OVER w AS ps
  FROM s WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)
)
SELECT source, state,
       CAST(sum(COALESCE(nt - t, 0)) AS BIGINT) AS dur_ms,
       CAST(sum(CASE WHEN ps IS NULL OR ps <> state THEN 1 ELSE 0 END) AS BIGINT)
         AS n_entries,
       count(*) AS n_points
FROM l GROUP BY 1, 2""",
        "heartbeat_agg_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id, epoch_us(ts) // 1000 AS t
  FROM events
), l AS (
  SELECT source, t,
         lead(t) OVER (PARTITION BY source ORDER BY ts, event_id) AS nt
  FROM s
)
SELECT source, count(*) AS n_heartbeats,
       CAST(sum(CASE WHEN nt IS NULL THEN 0
                     ELSE least(nt - t, 1800000) END) AS BIGINT) AS live_ms,
       CAST(sum(CASE WHEN nt IS NULL THEN 0
                     ELSE greatest(nt - t - 1800000, 0) END) AS BIGINT) AS dead_ms,
       COALESCE(max(nt - t), 0) AS max_gap_ms,
       CAST(sum(CASE WHEN nt - t > 1800000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dead_gaps
FROM l GROUP BY 1""",
        "ohlc_events_1h": """
SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
       first(value ORDER BY ts) AS open, max(value) AS high,
       min(value) AS low, last(value ORDER BY ts) AS close,
       count(*) AS n
FROM events GROUP BY 1, 2""",
        "cusum_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000) AS BIGINT) AS vq
  FROM events
), m AS (
  SELECT source, CAST(sum(vq) // count(*) AS BIGINT) AS mu FROM s GROUP BY 1
), d AS (
  SELECT s.source, s.ts, s.event_id,
         vq - mu - 5000 AS dp, mu - vq - 5000 AS dn
  FROM s JOIN m ON m.source = s.source
), c AS (
  SELECT source, ts, event_id,
         CAST(sum(dp) OVER w AS BIGINT) AS cp,
         CAST(sum(dn) OVER w AS BIGINT) AS cn
  FROM d WINDOW w AS (PARTITION BY source ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), r AS (
  SELECT source, event_id,
         cp - least(CAST(0 AS BIGINT), min(cp) OVER w) AS s_pos,
         cn - least(CAST(0 AS BIGINT), min(cn) OVER w) AS s_neg
  FROM c WINDOW w AS (PARTITION BY source ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT source, event_id, s_pos, s_neg,
       (s_pos > 500000 OR s_neg > 500000) AS is_change
FROM r""",
        "seasonal_profile_events": """
SELECT event_type AS source, CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT)
         AS mean_micro
FROM events GROUP BY 1, 2""",
        "bigram_collocations_documents": """
WITH w AS (
  SELECT list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS ws
  FROM documents
), p AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM (SELECT ws, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i FROM w)
), pc AS (
  SELECT w1, w2, count(*) AS pair_n FROM p GROUP BY 1, 2
  ORDER BY pair_n DESC, w1 ASC, w2 ASC LIMIT 50
), u AS (
  SELECT uw AS w, count(*) AS n
  FROM (SELECT unnest(ws) AS uw FROM w) GROUP BY 1
)
SELECT pc.w1, pc.w2, pc.pair_n, a.n AS w1_n, b.n AS w2_n
FROM pc JOIN u a ON a.w = pc.w1 JOIN u b ON b.w = pc.w2""",
        "bpe_merge_round_documents": bpe_merge_round_sql(topk=20),
        "bpe_encode_documents": xhash_sql.bpe_encode_sql(_DEMO_MERGES),
        "quality_classifier_documents": quality_classifier_sql(),
        "interval_join_events_1h": """
WITH hb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b, count(*) AS c
  FROM events GROUP BY 1, 2
), iv AS (
  SELECT source, b + INTERVAL 10 MINUTE AS ivl_start,
         b + INTERVAL 70 MINUTE AS ivl_end
  FROM (SELECT source, b,
               row_number() OVER (PARTITION BY source ORDER BY c DESC, b ASC) AS rk
        FROM hb)
  WHERE rk <= 3
)
SELECT i.source, i.ivl_start, count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro
FROM iv i JOIN events e
  ON e.event_type = i.source AND e.ts >= i.ivl_start AND e.ts < i.ivl_end
GROUP BY 1, 2""",
        "rolling_zscore_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000) AS BIGINT) AS vq
  FROM events
), fr AS (
  SELECT source, event_id, vq,
         count(*) OVER w AS n, sum(vq) OVER w AS s1, sum(vq*vq) OVER w AS s2
  FROM s WINDOW w AS (PARTITION BY source ORDER BY ts, event_id
                      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
)
SELECT source, event_id,
       CASE WHEN (n*s2 - s1*s1) > 0
            THEN CAST(vq*n - s1 AS DOUBLE) / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE))
            ELSE 0.0 END AS z,
       abs(CASE WHEN (n*s2 - s1*s1) > 0
                THEN CAST(vq*n - s1 AS DOUBLE) / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE))
                ELSE 0.0 END) > 3.0 AS is_anomaly
FROM fr""",
        "time_weighted_avg_events_1h": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vq,
         epoch_us(ts) // 1000 AS t,
         date_trunc('hour', ts) AS bucket_start
  FROM events
), l AS (
  SELECT source, bucket_start, vq, t,
         lag(vq) OVER w AS pv, lag(t) OVER w AS pt
  FROM s WINDOW w AS (PARTITION BY source, bucket_start ORDER BY ts, event_id)
), g AS (
  SELECT source, bucket_start,
         sum(CASE WHEN pv IS NOT NULL THEN (pv + vq) * (t - pt) ELSE 0 END) AS num,
         CAST(max(t) - min(t) AS BIGINT) AS span_ms,
         sum(vq) AS sv, count(*) AS n_points
  FROM l GROUP BY 1, 2
)
SELECT source, bucket_start,
       CASE WHEN span_ms > 0 THEN num / 1000000.0 / 2.0 / span_ms
            ELSE sv / 1000000.0 / n_points END AS twa,
       n_points, span_ms
FROM g""",
        "linear_deriv_events_1h": """
WITH s AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(value * 1000) AS BIGINT) AS vq,
         epoch_us(ts) // 1000000 - epoch_us(date_trunc('hour', ts)) // 1000000 AS t
  FROM events
), g AS (
  SELECT source, bucket_start, count(*) AS n, sum(t) AS st, sum(vq) AS sv,
         sum(t*t) AS stt, sum(t*vq) AS stv
  FROM s GROUP BY 1, 2
), e AS (
  SELECT source, bucket_start, n, st, sv,
         CASE WHEN (n*stt - st*st) != 0
              THEN CAST(n*stv - st*sv AS DOUBLE) / CAST(n*stt - st*st AS DOUBLE)
              ELSE 0.0 END AS slope
  FROM g
)
SELECT source, bucket_start, CAST(n AS BIGINT) AS n_points,
       slope / 1000 AS deriv,
       ((CAST(sv AS DOUBLE) + slope * CAST(n*1800 - st AS DOUBLE)) / CAST(n AS DOUBLE)) / 1000 AS predicted
FROM e""",
        "counter_delta_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vq
  FROM events
), c AS (
  SELECT source, ts, event_id,
         sum(vq) OVER (PARTITION BY source ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) % 10000000000 AS cq
  FROM s
), l AS (
  SELECT source, cq, lag(cq) OVER (PARTITION BY source ORDER BY ts, event_id) AS pv
  FROM c
)
SELECT source,
       sum(CASE WHEN pv IS NULL THEN 0
                WHEN cq >= pv THEN cq - pv ELSE cq END) / 1000000.0 AS increase,
       CAST(sum(CASE WHEN pv IS NOT NULL AND cq < pv THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       count(*) AS n_points
FROM l GROUP BY source""",
        "csv_source_rollup_events": """
SELECT event_type AS source, count(*) AS n,
       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_y,
       min(value) AS min_y, max(value) AS max_y,
       CAST(sum(event_id) AS BIGINT) AS sum_id
FROM events GROUP BY 1""",
        # hyperplane-LSH ANN: planes are a seeded deterministic matrix →
        # inlined as literals; testdata embeddings are dim=64 at every SF
        "cosine_topk_lsh_embeddings": cosine_topk_lsh_sql(dim=64, k=10, n_planes=8, seed=42),
        "cosine_topk_ivf_embeddings": cosine_topk_ivf_sql(dim=64, k=10, n_centroids=16, n_probe=4),
        "semantic_dedup_embeddings": semantic_dedup_sql(
            dim=64, threshold=0.2, n_centroids=16
        ),
        "semantic_contamination_embeddings": semantic_contamination_sql(
            threshold=0.35
        ),
        "cosine_topk_sq8_embeddings": cosine_topk_sq8_sql(k=10, n_queries=8),
        "embedding_neardup_pairs_embeddings": embedding_neardup_pairs_sql(
            dim=64, threshold=0.2, n_planes=10, seed=42
        ),
        # -- cross-engine hash pipelines (xhash/xhash_sql mirror pair) ------
        "minhash_lsh_pairs_documents": xhash_sql.minhash_lsh_pairs_sql(
            num_perm=32, bands=8, verify_jaccard=0.4
        ),
        "simhash_documents": xhash_sql.simhash_sql(),
        "simhash_neardup_pairs_documents": xhash_sql.simhash_neardup_sql(max_hamming=3),
        "dedup_keep_list_documents": xhash_sql.dedup_keep_list_sql(max_hamming=3),
        "pack_sequences_documents": pack_sequences_sql(budget=512),
        "hash_split_documents": hash_split_sql(),
        "temperature_mixture_documents": temperature_mixture_sql(),
        "quality_funnel_documents": quality_funnel_sql(),
        "pii_redact_documents": _pii_redact_oracle(),
        "conformal_interval_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS BIGINT) AS yv,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx,
         count(*) OVER (PARTITION BY source) AS n,
         CAST(lag(yd, 1) OVER (PARTITION BY source ORDER BY b) AS BIGINT) AS fc
  FROM th
), cal AS (
  SELECT source, idx, abs(yv - fc) AS r, n - 6 - 1 AS ncal
  FROM o WHERE idx >= 1 AND idx <= n - 6 - 1
), rad AS (
  SELECT source, r AS q
  FROM (SELECT source, r, ncal,
               row_number() OVER (PARTITION BY source ORDER BY r, idx) AS rk
        FROM cal) rr
  WHERE rk = least(((ncal + 1) * 7 + 7) // 8, ncal)
)
SELECT o.source, o.ts, o.yv AS y, o.fc, rad.q,
       o.fc - rad.q AS lo, o.fc + rad.q AS hi,
       (o.yv >= o.fc - rad.q AND o.yv <= o.fc + rad.q) AS covered
FROM o JOIN rad ON rad.source = o.source
WHERE o.idx >= o.n - 6""",
        "dominant_period_events_1h": _DP_CTES + """
SELECT source, period, gamma,
       CAST(gamma AS DOUBLE) / CAST(g0 AS DOUBLE) AS rho, g0, n
FROM pick WHERE rk = 1""",
        "auto_seasonal_qof_events_1h": _DP_CTES + """
, dp AS (SELECT source, period FROM pick WHERE rk = 1
), a AS (
  SELECT o.source, o.idx, o.yv, dp.period
  FROM o JOIN dp ON dp.source = o.source WHERE o.idx >= 48
), j AS (
  SELECT a.source, a.period, a.yv AS v, b.yv AS f
  FROM a JOIN o b ON b.source = a.source AND b.idx = a.idx - a.period
)
SELECT source, period, count(*) AS n,
       CAST(sum(abs(v - f)) AS BIGINT) AS sae,
       CAST(sum((v - f) * (v - f)) AS BIGINT) AS sse,
       (1000 * CAST(sum(abs(v - f)) AS BIGINT)) // count(*) AS mae_milli
FROM j GROUP BY 1, 2""",
        "pinball_qof_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, CAST(yd AS BIGINT) AS y,
         CAST(lag(yd, 1) OVER (PARTITION BY source ORDER BY b) AS BIGINT) AS f
  FROM th
), e AS (SELECT source, y, f FROM o WHERE f IS NOT NULL
), t AS (SELECT CAST(tau_num AS BIGINT) AS tau_num, CAST(tau_den AS BIGINT) AS tau_den
         FROM (VALUES (1, 4), (2, 4), (3, 4)) v(tau_num, tau_den)
), l AS (
  SELECT source, tau_num, tau_den,
         greatest(tau_num * (y - f), (tau_num - tau_den) * (y - f)) AS dl
  FROM e CROSS JOIN t
)
SELECT source, tau_num, tau_den, count(*) AS n,
       CAST(sum(dl) AS BIGINT) AS den_loss_sum,
       (1000 * CAST(sum(dl) AS BIGINT)) // (count(*) * tau_den) AS mean_milli
FROM l GROUP BY 1, 2, 3""",
        "duplicated_spans_documents": xhash_sql.duplicated_spans_sql(top_n=20),
        "duplicated_spans_k16_documents": xhash_sql.duplicated_spans_sql(
            top_n=20,
            k=16,
            doc_source_sql=(
                "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN '"
                + _BOILER
                + " ' || text ELSE text END AS text FROM documents"
            ),
        ),
        "span_removal_documents": xhash_sql.span_removal_sql(top_n=20),
        "cdc_chunk_ledger_documents": xhash_sql.cdc_chunk_ledger_sql(
            g=4,
            mask_bits=3,
            top_n=20,
            doc_source_sql=(
                "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN '"
                + _BOILER
                + " ' || text ELSE text END AS text FROM documents"
            ),
        ),
        "span_removal_k16_documents": xhash_sql.span_removal_sql(
            top_n=20,
            k=16,
            doc_source_sql=(
                "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN '"
                + _BOILER
                + " ' || text ELSE text END AS text FROM documents"
            ),
        ),
        "granger_pairs_events_1h": exact_sql.granger_sql(),
        "ar_order_select_events_1h": exact_sql.ar_order_select_sql(),
        "ljung_box_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), ag0 AS (
  SELECT source, CAST(sum(vc) AS BIGINT) AS sv, count(*) AS n FROM s GROUP BY 1
), c AS (
  SELECT s.source, s.ts, s.event_id,
         s.vc - (CASE WHEN sv >= 0 THEN abs(sv) // n ELSE -(abs(sv) // n) END) AS dev,
         ag0.n
  FROM s JOIN ag0 ON ag0.source = s.source
), l AS (
  SELECT source, n, dev,
         lag(dev, 1) OVER w AS d1, lag(dev, 2) OVER w AS d2,
         lag(dev, 3) OVER w AS d3, lag(dev, 4) OVER w AS d4,
         lag(dev, 5) OVER w AS d5
  FROM c WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)
), g AS (
  SELECT source, max(n) AS n,
         CAST(sum(dev * dev) AS BIGINT) AS g0,
         CAST(sum(dev * d1) AS BIGINT) AS g1, CAST(sum(dev * d2) AS BIGINT) AS g2,
         CAST(sum(dev * d3) AS BIGINT) AS g3, CAST(sum(dev * d4) AS BIGINT) AS g4,
         CAST(sum(dev * d5) AS BIGINT) AS g5
  FROM l GROUP BY 1
), sel AS (
  SELECT source, n,
         CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r1,
         CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r2,
         CAST(g3 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r3,
         CAST(g4 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r4,
         CAST(g5 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r5
  FROM g WHERE g0 <> 0
), q AS (
  SELECT source,
         CAST(n * (n + 2) AS DOUBLE)
           * ((((((r1*r1)/(n-1) + (r2*r2)/(n-2))) + (r3*r3)/(n-3))
               + (r4*r4)/(n-4)) + (r5*r5)/(n-5)) AS qs
  FROM sel
)
SELECT g.source, CAST(g.n AS BIGINT) AS n, q.qs AS q_stat,
       CASE WHEN q.qs IS NOT NULL THEN q.qs < 11.07 END AS white_noise_5pct
FROM g LEFT JOIN q ON q.source = g.source
WHERE g.n > 6""",
        "dickey_fuller_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), lg AS (
  SELECT source, v - lag(v, 1) OVER w AS dy, lag(v, 1) OVER w AS z
  FROM o WINDOW w AS (PARTITION BY source ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE z IS NOT NULL
), sums AS (
  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(z) AS HUGEINT) AS sz, CAST(sum(dy) AS HUGEINT) AS sd,
         CAST(sum(z*z) AS HUGEINT) AS szz, CAST(sum(dy*z) AS HUGEINT) AS sdz
  FROM e GROUP BY 1
), par AS (
  SELECT source, n, (n*szz - sz*sz) AS d2,
         (n*sdz - sz*sd) AS bn, (sd*szz - sz*sdz) AS an
  FROM sums
), cf AS (
  SELECT source, n, d2,
         CASE WHEN d2 = 0 THEN 0.0 ELSE CAST(bn AS DOUBLE) / CAST(d2 AS DOUBLE) END AS bh,
         CASE WHEN d2 = 0 THEN 0.0 ELSE CAST(an AS DOUBLE) / CAST(d2 AS DOUBLE) END AS ah
  FROM par
), res AS (
  SELECT e.source, (CAST(dy AS DOUBLE) - (ah + z * bh)) AS er
  FROM e JOIN cf ON cf.source = e.source
), ag AS (
  SELECT source,
         CAST(sum(CAST(floor(er * er * 1000000.0) AS BIGINT)) AS BIGINT) AS rss_q
  FROM res GROUP BY 1
)
SELECT cf.source, CAST(cf.n AS BIGINT) AS n, cf.bh AS b_hat, ag.rss_q,
       CASE WHEN ag.rss_q > 0 AND cf.n > 2 AND cf.d2 <> 0 THEN
         cf.bh / sqrt(CAST(ag.rss_q AS DOUBLE) / 1000000.0
                      / (CAST(cf.n AS BIGINT) - 2)
                      * CAST(cf.n AS DOUBLE) / CAST(cf.d2 AS DOUBLE))
       END AS t_stat,
       CASE WHEN ag.rss_q > 0 AND cf.n > 2 AND cf.d2 <> 0 THEN
         (cf.bh / sqrt(CAST(ag.rss_q AS DOUBLE) / 1000000.0
                       / (CAST(cf.n AS BIGINT) - 2)
                       * CAST(cf.n AS DOUBLE) / CAST(cf.d2 AS DOUBLE))) < -2.86
       END AS stationary_5pct
FROM cf JOIN ag ON ag.source = cf.source
WHERE cf.n >= 3""",
        "demand_class_events": """
WITH s AS (
  SELECT concat('u', CAST(user_id % 4 AS VARCHAR)) AS source,
         epoch_us(date_trunc('minute', ts)) // 60000000 AS m,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS d
  FROM events
  WHERE event_type = 'purchase' AND value > 100
  GROUP BY 1, 2
), a AS (
  SELECT source, count(*) AS n_nz,
         CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d*d) AS BIGINT) AS sd2,
         CAST(max(m) - min(m) + 1 AS BIGINT) AS span
  FROM s GROUP BY 1
), b AS (
  SELECT source, n_nz, span,
         (1000 * span) // n_nz AS adi_milli,
         CASE WHEN sd <> 0 THEN
           CAST(n_nz * sd2 - sd * sd AS DOUBLE) / CAST(sd * sd AS DOUBLE)
         END AS cv2
  FROM a
)
SELECT source, n_nz, span, adi_milli, cv2,
       CASE WHEN cv2 IS NULL THEN NULL
            WHEN adi_milli < 1320 AND cv2 < 0.49 THEN 'smooth'
            WHEN adi_milli < 1320 THEN 'erratic'
            WHEN cv2 < 0.49 THEN 'intermittent'
            ELSE 'lumpy' END AS demand_class
FROM b""",
        "mbb_mean_ci_events_1h": f"""
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
),
meta AS (
  SELECT source, count(*) AS n, CAST(sum(v_micro) AS BIGINT) AS tot
  FROM mb GROUP BY source HAVING count(*) > 24
),
pre AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY bucket_start) - 1 AS t,
         CAST(sum(v_micro) OVER (PARTITION BY source ORDER BY bucket_start) AS BIGINT) AS p
  FROM mb
),
spine AS (
  SELECT source, n, k, r, unnest(range(k)) AS j
  FROM (SELECT source, n, (n + 23) // 24 AS k, unnest(range(200)) AS r FROM meta)
),
sx AS (
  SELECT source, n, k, r, j,
         CAST((r * 1048576 + j) * 23 AS HUGEINT) % {xhash_sql.W} AS x0
  FROM spine
),
sh AS (SELECT source, n, k, r, j, {xhash_sql.splitmix_cols("x0", "h")} FROM sx),
st AS (
  SELECT source, r,
         CAST(h % (n - 23) AS BIGINT) AS s,
         CASE WHEN j = k - 1 THEN n - (k - 1) * 24 ELSE 24 END AS L
  FROM sh
),
c AS (
  SELECT st.source, st.r, hi.p - COALESCE(lo.p, 0) AS contrib
  FROM st
  JOIN pre hi ON hi.source = st.source AND hi.t = st.s + st.L - 1
  LEFT JOIN pre lo ON lo.source = st.source AND lo.t = st.s - 1
),
tr AS (SELECT source, r, CAST(sum(contrib) AS BIGINT) AS tt FROM c GROUP BY 1, 2),
rk AS (
  SELECT source, tt,
         row_number() OVER (PARTITION BY source ORDER BY tt, r) AS rnk
  FROM tr
),
bounds AS (
  SELECT source,
         max(CASE WHEN rnk = 5 THEN tt END) AS lo_total,
         max(CASE WHEN rnk = 196 THEN tt END) AS hi_total
  FROM rk GROUP BY source
)
SELECT m.source, CAST(m.n AS BIGINT) AS n, CAST(200 AS BIGINT) AS n_boot,
       m.tot AS total, CAST(m.tot AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean,
       b.lo_total, b.hi_total,
       CAST(b.lo_total AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean_lo,
       CAST(b.hi_total AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean_hi
FROM meta m JOIN bounds b USING (source)""",
        "arch1_vol_forecast_events_1h": """
WITH series AS (SELECT event_type AS source, ts, value FROM events),
th AS (
  SELECT source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*) / 8.0) AS yd
  FROM series GROUP BY 1, 2
),
d AS (
  SELECT source, b,
         v - lag(v) OVER (PARTITION BY source ORDER BY b) AS dy
  FROM (SELECT source, b, CAST(yd AS BIGINT) AS v FROM th)
),
u AS (SELECT source, b, dy * dy AS u FROM d WHERE dy IS NOT NULL),
uz AS (
  SELECT source, b, u,
         lag(u) OVER (PARTITION BY source ORDER BY b) AS z
  FROM u
),
ag AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS BIGINT) AS sz, CAST(sum(u) AS BIGINT) AS sy,
         CAST(sum(z * z) AS BIGINT) AS szz, CAST(sum(u * z) AS BIGINT) AS syz,
         arg_max(u, b) AS u_last
  FROM uz WHERE z IS NOT NULL GROUP BY source
)
SELECT source, n, u_last,
       CASE WHEN n*szz - sz*sz = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
            ELSE CAST(sy*szz - sz*syz AS DOUBLE) / CAST(n*szz - sz*sz AS DOUBLE)
       END AS a0,
       CASE WHEN n*szz - sz*sz = 0 THEN 0.0
            ELSE CAST(n*syz - sz*sy AS DOUBLE) / CAST(n*szz - sz*sz AS DOUBLE)
       END AS a1,
       CASE WHEN n*szz - sz*sz = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
            ELSE CAST((sy*szz - sz*syz) + u_last * (n*syz - sz*sy) AS DOUBLE)
                 / CAST(n*szz - sz*sz AS DOUBLE)
       END AS sigma2_next
FROM ag""",
        "arch_lm_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), du AS (
  SELECT source, b,
         (v - lag(v, 1) OVER w) * (v - lag(v, 1) OVER w) AS u
  FROM o WINDOW w AS (PARTITION BY source ORDER BY b)
), lg AS (
  SELECT source, b, u AS y, lag(u, 1) OVER w AS z
  FROM du WHERE u IS NOT NULL WINDOW w AS (PARTITION BY source ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE z IS NOT NULL
), sums AS (
  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(z) AS HUGEINT) AS sz, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(z*z) AS HUGEINT) AS szz, CAST(sum(y*z) AS HUGEINT) AS syz
  FROM e GROUP BY 1
), par AS (
  SELECT source, n, sy, (n*szz - sz*sz) AS d2,
         (n*syz - sz*sy) AS bn, (sy*szz - sz*syz) AS an
  FROM sums
), cf AS (
  SELECT source, n, d2, sy,
         CASE WHEN d2 = 0 THEN 0.0 ELSE CAST(bn AS DOUBLE) / CAST(d2 AS DOUBLE) END AS bh,
         CASE WHEN d2 = 0 THEN 0.0 ELSE CAST(an AS DOUBLE) / CAST(d2 AS DOUBLE) END AS ah,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ubar
  FROM par
), res AS (
  SELECT e.source,
         (CAST(y AS DOUBLE) - (ah + z * bh)) AS er,
         (CAST(y AS DOUBLE) - ubar) AS dr
  FROM e JOIN cf ON cf.source = e.source
), ag AS (
  SELECT source,
         CAST(sum(CAST(floor(er * er * 1000.0) AS BIGINT)) AS BIGINT) AS rss_q,
         CAST(sum(CAST(floor(dr * dr * 1000.0) AS BIGINT)) AS BIGINT) AS tss_q
  FROM res GROUP BY 1
)
SELECT cf.source, CAST(cf.n AS BIGINT) AS n, ag.rss_q, ag.tss_q,
       CASE WHEN ag.tss_q > 0 AND cf.d2 <> 0 THEN
         CAST(cf.n AS DOUBLE) * (1.0 - CAST(ag.rss_q AS DOUBLE) / CAST(ag.tss_q AS DOUBLE))
       END AS lm_stat,
       CASE WHEN ag.tss_q > 0 AND cf.d2 <> 0 THEN
         (CAST(cf.n AS DOUBLE) * (1.0 - CAST(ag.rss_q AS DOUBLE) / CAST(ag.tss_q AS DOUBLE))) > 3.84
       END AS arch_5pct
FROM cf JOIN ag ON ag.source = cf.source
WHERE cf.n >= 3""",
        "kpss_level_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), ag AS (
  SELECT source, CAST(sum(v) AS BIGINT) AS s, count(*) AS n FROM o GROUP BY 1
), c AS (
  SELECT o.source, o.b, (ag.n * o.v - ag.s) AS dd, ag.n
  FROM o JOIN ag ON ag.source = o.source
), w AS (
  SELECT source, n, dd,
         CAST(sum(dd) OVER (PARTITION BY source ORDER BY b) AS BIGINT) AS st
  FROM c
), g AS (
  SELECT source, max(n) AS n,
         CAST(sum(CAST(st AS HUGEINT) * st) AS HUGEINT) AS s2_sum,
         CAST(sum(dd*dd) AS BIGINT) AS dev2_sum
  FROM w GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST(s2_sum AS DOUBLE) AS s2_sum_d, dev2_sum,
       CASE WHEN dev2_sum <> 0 THEN
         CAST(s2_sum AS DOUBLE) / CAST(CAST(n AS HUGEINT) * dev2_sum AS DOUBLE)
       END AS eta,
       CASE WHEN dev2_sum <> 0 THEN
         (CAST(s2_sum AS DOUBLE) / CAST(CAST(n AS HUGEINT) * dev2_sum AS DOUBLE)) < 0.463
       END AS level_stationary_5pct
FROM g WHERE n >= 2""",
        "benford_digits_events": """
WITH m AS (
  SELECT event_type AS source,
         abs(CAST(round(value * 1000000) AS BIGINT)) AS am
  FROM events
), mp AS (SELECT source, am FROM m WHERE am > 0
), d AS (
  SELECT source, CAST(substr(CAST(am AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM mp
), counts AS (SELECT source, digit, count(*) AS cnt FROM d GROUP BY 1, 2
), sp AS (
  SELECT s.source, CAST(dg.digit AS BIGINT) AS digit, CAST(dg.exp_ppm AS BIGINT) AS exp_ppm
  FROM (SELECT DISTINCT source FROM d) s
  CROSS JOIN (VALUES (1, 301029), (2, 176091), (3, 124938), (4, 96910),
                     (5, 79181), (6, 66946), (7, 57991), (8, 51152),
                     (9, 45757)) AS dg(digit, exp_ppm)
), f AS (
  SELECT sp.source, sp.digit, coalesce(counts.cnt, 0) AS cnt, sp.exp_ppm
  FROM sp LEFT JOIN counts ON counts.source = sp.source AND counts.digit = sp.digit
), g AS (
  SELECT source, digit, cnt,
         CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n, exp_ppm
  FROM f
), h AS (
  SELECT source, digit, cnt, n, (cnt * 1000000) // n AS obs_ppm, exp_ppm FROM g
)
SELECT source, digit, cnt, n, obs_ppm, exp_ppm, obs_ppm - exp_ppm AS dev_ppm,
       CAST(sum(abs(obs_ppm - exp_ppm)) OVER (PARTITION BY source) AS BIGINT) AS tvd_ppm
FROM h""",
        "contamination_flags_documents": xhash_sql.contamination_sql(),
        "bloom_contamination_documents": xhash_sql.bloom_contamination_sql(),
        "span_corruption_documents": xhash_sql.span_corruption_sql(),
        "sparse_cosine_pairs_documents": """
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
  FROM documents
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
), dfr AS (
  SELECT w, count(*) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT count(*) AS nd FROM documents
), post AS (
  SELECT tf.doc_id, tf.w, tf.tf
  FROM tf JOIN dfr USING (w), nd
  WHERE dfr.df * 1000000 <= nd.nd * 900000
), nrm AS (
  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM post GROUP BY 1
), pr AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM post a JOIN post b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
), j AS (
  SELECT pr.id_a, pr.id_b, pr.n_shared, pr.dot,
         na.n2 AS n2_a, nb.n2 AS n2_b
  FROM pr JOIN nrm na ON na.doc_id = pr.id_a
          JOIN nrm nb ON nb.doc_id = pr.id_b
)
SELECT id_a, id_b, n_shared, dot, n2_a, n2_b,
       CAST(dot AS DOUBLE) / sqrt(CAST(n2_a AS DOUBLE)) / sqrt(CAST(n2_b AS DOUBLE)) AS cos
FROM j WHERE 64 * dot * dot >= 49 * n2_a * n2_b""",
        "split_leakage_documents": xhash_sql.split_leakage_sql(min_shared=3),
        "fingerprint_documents": xhash_sql.fingerprint_sql(),
        # multimodal: the synthetic generator's payload sizes are closed-form
        # arithmetic in the asset index, so every parsed-from-payload fact
        # (BMP header math incl. 4-byte row padding, RIFF/WAV 44-byte header
        # + PCM16 data, RIFF-AVI container math: 232-byte fixed headers +
        # n_frames*(8-byte chunk hdr + padded DIB + 16-byte idx1 entry)) is
        # recomputable in SQL — a real value check on the decode path; only
        # RNG-dependent signal stats (luma/rms) are excluded (pytest codec
        # fixtures cover those; video PIXELS: video_frame_luma_synth)
        "multimodal_features_synth": """
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(400))
SELECT
  'asset-' || lpad(CAST(i AS VARCHAR), 8, '0') AS asset_id,
  CASE i % 3 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav' ELSE 'video/avi' END AS mime,
  CAST(CASE i % 3
    WHEN 0 THEN 54 + ((3 * (8 + i % 24) + 3) // 4 * 4) * (8 + (i * 7) % 24)
    WHEN 1 THEN 44 + 2 * (256 + i % 256)
    ELSE 232 + (1 + i % 6) * (24 + ((3 * (4 + i % 9) + 3) // 4 * 4) * (4 + (i * 5) % 9))
    END AS BIGINT) AS n_bytes,
  CAST(CASE i % 3 WHEN 0 THEN 8 + i % 24 WHEN 2 THEN 4 + i % 9 END AS INTEGER) AS width,
  CAST(CASE i % 3 WHEN 0 THEN 8 + (i * 7) % 24 WHEN 2 THEN 4 + (i * 5) % 9 END AS INTEGER) AS height,
  CAST(CASE i % 3 WHEN 0 THEN 1 WHEN 1 THEN 256 + i % 256 ELSE 1 + i % 6 END AS INTEGER) AS n_frames,
  CAST(CASE WHEN i % 3 = 1 THEN CASE WHEN i % 2 = 0 THEN 8000 ELSE 16000 END END AS INTEGER) AS sample_rate,
  TRUE AS decoded
FROM ids""",
        # video decode certified on PIXELS: the oracle regenerates every
        # kept frame's integer luma sum from the generator's pixel formula
        "video_frame_luma_synth": """
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(300) WHERE range % 3 = 2),
dims AS (SELECT i, 1 + i % 6 AS nf, 4 + i % 9 AS w, 4 + (i*5) % 9 AS h FROM ids),
fr AS (SELECT i, nf, w, h, CAST(f.range AS BIGINT) AS f FROM dims, range(6) f
       WHERE f.range < nf AND f.range % 2 = 0),
px AS (SELECT i, f, w, h, CAST(y.range AS BIGINT) AS y, CAST(x.range AS BIGINT) AS x
       FROM fr, range(12) y, range(12) x WHERE y.range < h AND x.range < w)
SELECT 'asset-' || lpad(CAST(i AS VARCHAR), 8, '0') AS asset_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(sum(299*((i*13 + f*41 + y*5 + x*3) % 256)
              + 587*((i*13 + f*41 + y*5 + x*3 + 17) % 256)
              + 114*((i*13 + f*41 + y*5 + x*3 + 34) % 256)) AS BIGINT) AS luma_milli
FROM px GROUP BY i, f, w, h""",
        "cosine_topk_brute_embeddings": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS cos
  FROM c, q WHERE neighbor_id != query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 10""",
        "gorilla_roundtrip_events_1m": _ROLLUP_SQL + "SELECT source, bucket_start, mean_y FROM t1m",
        "stream_rollup_1m_events": _ROLLUP_SQL + _SEL + "t1m",
        "stream_tier_upsert_events_1m": _ROLLUP_SQL + _SEL + "t1m",
        "rollup_1m_salted_events": _ROLLUP_SQL + _SEL + "t1m",
        "rollup_merge_increment_events": _ROLLUP_SQL + _SEL + "t1m",
        "checkpoint_resume_rollup_events": _ROLLUP_SQL + _SEL + "t1m",
        "gorilla_pack_events_1m": """
WITH series AS (
  SELECT event_type AS source, ts FROM events
), t1m AS (
  SELECT source, date_trunc('minute', ts) AS bucket_start FROM series GROUP BY 1, 2
)
SELECT source,
       CAST(floor(epoch(bucket_start) / 491520.0) AS BIGINT) AS block_id,
       count(*) AS n_points,
       CAST(min(epoch(bucket_start)) AS BIGINT) AS ts_min,
       CAST(max(epoch(bucket_start)) AS BIGINT) AS ts_max
FROM t1m GROUP BY 1, 2""",
        "backcast_fill_events": """
WITH RECURSIVE nulled AS (
  SELECT event_type AS source, ts, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
), zeroed AS (
  SELECT source, event_id, rn,
         CASE WHEN rn <= 6 OR event_id % 97 = 5 THEN 0.0 ELSE value END AS y
  FROM nulled
), firstnz AS (
  SELECT source, min(rn) AS j0 FROM zeroed WHERE y <> 0.0 GROUP BY source
), fill(source, rn, val) AS (
  -- right-to-left weighted backcast over the leading-zero prefix: each fill
  -- is w0*next + w1*current with current = 0.0, i.e. exactly (1/3)*next per
  -- step (w = [1,2]/3 on the reversed slice; Util/build_matrix.py:22-65)
  SELECT z.source, z.rn, z.y
  FROM zeroed z JOIN firstnz f ON z.source = f.source AND z.rn = f.j0
  UNION ALL
  SELECT source, rn - 1, (1.0/3.0) * val FROM fill WHERE rn > 1
)
SELECT z.source, z.event_id, coalesce(CASE WHEN z.rn < f2.j0 THEN fl.val END, z.y) AS y
FROM zeroed z
LEFT JOIN firstnz f2 ON z.source = f2.source
LEFT JOIN fill fl ON fl.source = z.source AND fl.rn = z.rn""",
        "retention_1m_events": _ROLLUP_SQL + """
SELECT source, bucket_start, cnt, sum_y, min_y, max_y, mean_y, first_y, last_y
FROM t1m
WHERE bucket_start > (SELECT max(bucket_start) FROM t1m) - INTERVAL 36000 SECONDS""",
        "asof_join_events_1m": _ROLLUP_SQL + """
SELECT e.source, e.event_id, t.mean_y AS m1_r, t.bucket_start AS ts_r
FROM (SELECT event_type AS source, ts, event_id FROM events) e
ASOF LEFT JOIN t1m t ON e.source = t.source AND e.ts >= t.bucket_start""",
        "gapfill_grid_events_1m": _ROLLUP_SQL + """
, bounds AS (
  SELECT source, min(bucket_start) AS lo, max(bucket_start) AS hi FROM t1m GROUP BY 1
), grid AS (
  SELECT source, unnest(generate_series(lo, hi, INTERVAL 60 SECONDS)) AS bucket_start
  FROM bounds
), j AS (
  SELECT g.source, g.bucket_start, t.mean_y, t.cnt IS NULL AS is_gap
  FROM grid g LEFT JOIN t1m t USING (source, bucket_start)
)
SELECT source, bucket_start,
       last_value(mean_y IGNORE NULLS) OVER (
         PARTITION BY source ORDER BY bucket_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean_y,
       is_gap
FROM j""",
        "tpch_q1_lineitem": """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 1000000) AS BIGINT)) / 1000000.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) / 1000000.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) / 1000000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0 AS sum_charge,
       sum(CAST(round(l_quantity * 1000000) AS BIGINT)) / 1000000.0 / count(*) AS avg_qty,
       sum(CAST(round(l_discount * 1000000) AS BIGINT)) / 1000000.0 / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
        "tpch_q5_local_supplier": """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
GROUP BY n_name""",
        "funnel_conversion_events": """
WITH u1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), u2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
), u3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
), steps AS (
  SELECT 1 AS step, 'view' AS name, count(*) AS n_users FROM u1
  UNION ALL
  SELECT 2, 'click', count(*) FROM u2
  UNION ALL
  SELECT 3, 'purchase', count(*) FROM u3
)
SELECT step, name, n_users,
       CAST(n_users AS DOUBLE) / (SELECT count(*) FROM u1) AS conversion
FROM steps""",
        "tpch_q6_lineitem": """
SELECT sum(CAST(round(l_extendedprice * l_discount * 1000000) AS BIGINT)) / 1000000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
        "tpch_q3_top_orders": f"""
SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) / 1000000.0 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{_Q3_CUT}' AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10""",
        "tpch_q4_order_priority": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",
        "customers_without_orders": """
SELECT c_mktsegment, count(*) AS n_customers,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS sum_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_mktsegment""",
        "nation_revenue_join": """
SELECT n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) / 1000000.0 AS revenue,
       count(*) AS n_items
FROM customer, orders, lineitem, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name""",
        "promo_revenue_part_join": """
SELECT date_trunc('month', l_shipdate) AS month,
       sum(CAST(round(CASE WHEN p_type LIKE 'PROMO%'
                           THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END * 1000000) AS BIGINT)) / 1000000.0 AS promo_revenue,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) / 1000000.0 AS total_revenue,
       count(*) AS n_items
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1""",
        "supplier_volume_topk": """
SELECT s_suppkey, s_name,
       sum(CAST(round(l_quantity * 1000000) AS BIGINT)) / 1000000.0 AS total_qty,
       count(*) AS n_items
FROM lineitem, supplier
WHERE l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY total_qty DESC, s_suppkey ASC
LIMIT 10""",
        "rollup_cube_events": """
SELECT event_type AS source, date_trunc('day', ts) AS day,
       count(*) AS cnt,
       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_v
FROM events
GROUP BY ROLLUP(event_type, date_trunc('day', ts))""",
        "distinct_users_events": """
SELECT event_type AS source, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1""",
        "tfidf_topk_documents": """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS _n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf * n._n AS DOUBLE) / dfreq.df AS score
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score,
       CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rnk
      FROM s)
WHERE rnk <= 3""",
        "token_histogram_documents": f"""
SELECT tok, count(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(text, '{_BPE_SQL}')) AS tok FROM documents)
GROUP BY tok
ORDER BY cnt DESC, tok ASC
LIMIT 50""",
        "topk_per_group_events": """
SELECT source, event_id, y, rnk FROM (
  SELECT event_type AS source, event_id, value AS y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS INTEGER) AS rnk
  FROM events
) WHERE rnk <= 3""",
        "sessionize_events": """
SELECT user_id, event_id,
       CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
)""",
        # mergeable sketches: oracle computes direct-from-raw, engine cascades
        # partials — a value match certifies merge associativity too
        "hll_distinct_users_events_1h": xhash_sql.hll_registers_sql(),
        "cmsketch_words_documents": _cm_sketch_oracle(),
        "tokens_checksum_documents": xhash_sql.tokens_checksum_sql(),
        "data_loader_batches_events": xhash_sql.data_loader_sql(),
        "bigram_fluency_documents": xhash_sql.bigram_fluency_sql(),
        "chunk_tokens_documents": xhash_sql.chunk_tokens_sql(),
        "ngram_novelty_documents": xhash_sql.ngram_novelty_sql(),
        "matrix_profile_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, v,
         row_number() OVER (PARTITION BY source ORDER BY bucket_start) - 1 AS pos
  FROM mb
), lagm AS (
  SELECT source, pos, v AS d0,
         lead(v, 1) OVER w AS d1, lead(v, 2) OVER w AS d2, lead(v, 3) OVER w AS d3
  FROM o WINDOW w AS (PARTITION BY source ORDER BY pos)
), subs AS (
  SELECT * FROM lagm WHERE d3 IS NOT NULL
), dists AS (
  SELECT a.source, a.pos AS i, b.pos AS j,
         (a.d0 - b.d0) * (a.d0 - b.d0) + (a.d1 - b.d1) * (a.d1 - b.d1)
       + (a.d2 - b.d2) * (a.d2 - b.d2) + (a.d3 - b.d3) * (a.d3 - b.d3) AS dist
  FROM subs a JOIN subs b
    ON a.source = b.source AND abs(a.pos - b.pos) >= 4
), best AS (
  SELECT source, i, dist, j,
         row_number() OVER (PARTITION BY source, i ORDER BY dist, j) AS rn
  FROM dists
)
SELECT s.source, CAST(s.pos AS BIGINT) AS pos,
       CAST(coalesce(m.dist, -1) AS BIGINT) AS mp_sq,
       CAST(coalesce(m.j, -1) AS BIGINT) AS nn_pos
FROM subs s LEFT JOIN best m
  ON m.source = s.source AND m.i = s.pos AND m.rn = 1""",
        "bollinger_breakout_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id, value AS y,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), w AS (
  SELECT source, ts, event_id, y, vc,
         CAST(sum(vc) OVER fr AS BIGINT) AS s24,
         CAST(sum(vc * vc) OVER fr AS BIGINT) AS q24,
         count(*) OVER fr AS n24
  FROM s
  WINDOW fr AS (PARTITION BY source ORDER BY ts, event_id
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT source, event_id, y,
       s24 / (n24 * 100.0) AS mean,
       (n24 * vc - s24) > 0
         AND (n24 * vc - s24) * (n24 * vc - s24) > 4 * (n24 * q24 - s24 * s24) AS above,
       (n24 * vc - s24) < 0
         AND (n24 * vc - s24) * (n24 * vc - s24) > 4 * (n24 * q24 - s24 * s24) AS below,
       CAST(n24 AS BIGINT) AS n_in_frame
FROM w""",
        "rsi_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), d AS (
  SELECT source, bucket_start,
         v_micro - lag(v_micro, 1) OVER (PARTITION BY source ORDER BY bucket_start) AS dd
  FROM mb
), w AS (
  SELECT source, bucket_start,
         CAST(sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) OVER fr AS BIGINT) AS gsum,
         CAST(sum(CASE WHEN dd < 0 THEN -dd ELSE 0 END) OVER fr AS BIGINT) AS lsum,
         count(dd) OVER fr AS nd
  FROM d
  WINDOW fr AS (PARTITION BY source ORDER BY bucket_start
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT source, bucket_start,
       CASE WHEN nd = 14 AND gsum + lsum > 0
            THEN CAST((1000000 * gsum) // (gsum + lsum) AS BIGINT) END AS rsi_ppm,
       CASE WHEN nd = 14 AND gsum + lsum > 0
            THEN CAST((1000000 * gsum) // (gsum + lsum) AS BIGINT) / 10000.0 END AS rsi
FROM w""",
        "longest_run_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
), b AS (
  SELECT source, ts, event_id,
         CASE WHEN lag(vm, 1) OVER w IS NULL OR vm <= lag(vm, 1) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM s WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)
), r AS (
  SELECT source,
         sum(brk) OVER (PARTITION BY source ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM b
), runs AS (
  SELECT source, run_id, count(*) AS run_len FROM r GROUP BY 1, 2
)
SELECT source, CAST(max(run_len) AS BIGINT) AS max_run,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS n_rows
FROM runs GROUP BY source""",
        "series_dist_pairs_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), cb AS (
  SELECT source, bucket_start, v_micro // 10000 AS v_centi FROM mb
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum((a.v_centi - b.v_centi) * (a.v_centi - b.v_centi)) AS BIGINT) AS sq_dist,
       CAST(count(*) AS BIGINT) AS n_shared
FROM cb a JOIN cb b
  ON a.bucket_start = b.bucket_start AND a.source < b.source
GROUP BY 1, 2""",
        "mann_kendall_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.source,
         CAST(sum(CASE WHEN b.v_micro > a.v_micro THEN 1
                       WHEN b.v_micro < a.v_micro THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM mb a JOIN mb b ON a.source = b.source AND b.bucket_start > a.bucket_start
  GROUP BY a.source
), nn AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM mb GROUP BY 1
), ties AS (
  SELECT source, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT source, v_micro, count(*) AS t FROM mb GROUP BY 1, 2)
  GROUP BY source
)
SELECT s.source, nn.n, s.s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS BIGINT) AS var18,
       CAST(2 * s.s_stat AS DOUBLE) / CAST(nn.n * (nn.n - 1) AS DOUBLE) AS tau
FROM s JOIN nn USING (source) JOIN ties USING (source)""",
        "ks_two_sample_events": """
WITH s AS (
  SELECT event_type AS source, CAST(round(value * 1000000) AS BIGINT) AS vm,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), h AS (
  SELECT source, vm, n // 2 AS n1, n - n // 2 AS n2,
         CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS half
  FROM s
), pv AS (
  SELECT source, n1, n2, vm,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS c2
  FROM h GROUP BY 1, 2, 3, 4
), cum AS (
  SELECT source, n1, n2,
         n2 * sum(c1) OVER w - n1 * sum(c2) OVER w AS d
  FROM pv WINDOW w AS (PARTITION BY source ORDER BY vm
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), agg AS (
  SELECT source, n1, n2, CAST(max(abs(d)) AS BIGINT) AS d_num
  FROM cum GROUP BY 1, 2, 3
)
SELECT source, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, d_num,
       CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks_stat
FROM agg""",
        "permutation_patterns_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), l AS (
  SELECT source, v_micro AS v0,
         lead(v_micro, 1) OVER w AS v1,
         lead(v_micro, 2) OVER w AS v2
  FROM mb WINDOW w AS (PARTITION BY source ORDER BY bucket_start)
), p AS (
  SELECT source,
         9 * (CASE WHEN v1 > v0 THEN 2 WHEN v1 < v0 THEN 0 ELSE 1 END)
       + 3 * (CASE WHEN v2 > v1 THEN 2 WHEN v2 < v1 THEN 0 ELSE 1 END)
       +     (CASE WHEN v2 > v0 THEN 2 WHEN v2 < v0 THEN 0 ELSE 1 END) AS pattern_id
  FROM l WHERE v2 IS NOT NULL
), c AS (
  SELECT source, pattern_id, count(*) AS cnt FROM p GROUP BY 1, 2
)
SELECT source, CAST(pattern_id AS BIGINT) AS pattern_id, CAST(cnt AS BIGINT) AS cnt,
       CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_windows,
       CAST((1000000 * cnt) // (sum(cnt) OVER (PARTITION BY source)) AS BIGINT) AS share_ppm
FROM c""",
        "freshness_report_events": """
WITH tier AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS b,
         count(*) AS n,
         CAST(max(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS last_in_b
  FROM events GROUP BY 1, 2
), ps AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_events,
         max(last_in_b) AS last_s, max(b) AS last_b
  FROM tier GROUP BY 1
), g AS (
  SELECT *, max(last_s) OVER () AS frontier_s, max(last_b) OVER () AS front_b
  FROM ps
), cov AS (
  SELECT t.source, count(*) AS buckets_24h
  FROM tier t JOIN g ON g.source = t.source
  WHERE t.b > g.front_b - 24 AND t.b <= g.front_b
  GROUP BY 1
)
SELECT g.source, g.n_events, g.last_s, g.frontier_s,
       CAST(g.frontier_s - g.last_s AS BIGINT) AS staleness_s,
       CAST(coalesce(c.buckets_24h, 0) AS BIGINT) AS buckets_24h,
       CAST(24 - coalesce(c.buckets_24h, 0) AS BIGINT) AS missing_24h,
       (g.frontier_s - g.last_s) > 3600 AS stale
FROM g LEFT JOIN cov c USING (source)""",
        "interarrival_stats_events": """
WITH e AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS prev
  FROM events
), gp AS (
  SELECT source, s - prev AS gap FROM e WHERE prev IS NOT NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap_s,
       CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_gap_s,
       quantile_cont(gap, 0.5) AS median_gap_s,
       quantile_cont(gap, 0.95) AS p95_gap_s,
       CAST(max(gap) AS BIGINT) AS max_gap_s
FROM gp GROUP BY source""",
        "ensemble_qof_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), cb AS (
  SELECT source, bucket_start, v_micro // 10000 AS vc FROM mb
), l AS (
  SELECT source, vc AS y,
         lag(vc, 1) OVER w AS l1, lag(vc, 2) OVER w AS l2,
         lag(vc, 3) OVER w AS l3, lag(vc, 24) OVER w AS ls
  FROM cb WINDOW w AS (PARTITION BY source ORDER BY bucket_start)
), e AS (
  SELECT source,
         9 * y - (4 * l1 + l2 + l3 + 3 * ls) AS e_ens,
         9 * (y - l1) AS e_p,
         9 * y - 3 * (l1 + l2 + l3) AS e_m,
         9 * (y - ls) AS e_s
  FROM l WHERE l1 IS NOT NULL AND l2 IS NOT NULL AND l3 IS NOT NULL AND ls IS NOT NULL
), a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(abs(e_ens)) AS BIGINT) AS sae9_ens,
         CAST(sum(abs(e_p)) AS BIGINT) AS sae9_persist,
         CAST(sum(abs(e_m)) AS BIGINT) AS sae9_ma3,
         CAST(sum(abs(e_s)) AS BIGINT) AS sae9_snaive
  FROM e GROUP BY source
)
SELECT source, m, sae9_ens, sae9_persist, sae9_ma3, sae9_snaive,
       CAST(sae9_ens - least(sae9_persist, sae9_ma3, sae9_snaive) AS BIGINT) AS regret9,
       CAST(sae9_ens AS DOUBLE) / CAST(m AS DOUBLE) / 9.0 / 100.0 AS mae_ens,
       CAST(least(sae9_persist, sae9_ma3, sae9_snaive) AS DOUBLE)
         / CAST(m AS DOUBLE) / 9.0 / 100.0 AS mae_best_single
FROM a""",
        "seasonal_naive_qof_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), cb AS (
  SELECT source, bucket_start, v_micro // 10000 AS vc FROM mb
), l AS (
  SELECT source, vc,
         lag(vc, 24) OVER (PARTITION BY source ORDER BY bucket_start) AS hat
  FROM cb
), e AS (
  SELECT source, vc - hat AS err FROM l WHERE hat IS NOT NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS m,
       CAST(sum(err * err) AS BIGINT) AS sse_centi2,
       CAST(sum(abs(err)) AS BIGINT) AS sae_centi,
       (CAST(sum(err * err) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 10000.0 AS mse,
       (CAST(sum(abs(err)) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 100.0 AS mae
FROM e GROUP BY source""",
        "max_drawdown_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
), p AS (
  SELECT source,
         max(vm) OVER (PARTITION BY source ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - vm AS dd
  FROM s
)
SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(dd) AS BIGINT) AS max_dd_micro,
       CAST(max(dd) AS DOUBLE) / 1000000.0 AS max_dd
FROM p GROUP BY source""",
        "trending_tokens_documents": """
WITH w AS (
  SELECT doc_id % 8 AS d,
         unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
  FROM documents
), ps AS (
  SELECT w, d, count(*) AS c FROM w GROUP BY 1, 2
), pw AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS n_total,
         CAST(8 * sum(d * c) - 28 * sum(c) AS BIGINT) AS slope_num
  FROM ps GROUP BY w
  HAVING sum(c) >= 5
), r AS (
  SELECT 'rising' AS direction, w, n_total, slope_num
  FROM pw ORDER BY slope_num DESC, w ASC LIMIT 15
), f AS (
  SELECT 'falling' AS direction, w, n_total, slope_num
  FROM pw ORDER BY slope_num ASC, w ASC LIMIT 15
), u AS (
  SELECT * FROM r UNION ALL SELECT * FROM f
)
SELECT direction, w, n_total, slope_num,
       CAST(slope_num AS DOUBLE) / 336.0 AS slope
FROM u""",
        "vocab_stats_documents": """
WITH w AS (
  SELECT lang, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
  FROM documents
), f AS (
  SELECT lang, w, count(*) AS f FROM w GROUP BY 1, 2
), g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(f) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
  FROM f GROUP BY lang
)
SELECT lang, vocab, total_tokens, n_hapax, n_dis,
       CAST((1000000 * n_hapax) // vocab AS BIGINT) AS hapax_ppm
FROM g""",
        "spearman_pairs_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), j AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.v_micro AS va, b.v_micro AS vb
  FROM mb a JOIN mb b
    ON a.bucket_start = b.bucket_start AND a.source < b.source
), rk AS (
  SELECT source_a, source_b,
         2 * rank() OVER (PARTITION BY source_a, source_b ORDER BY va)
           + count(*) OVER (PARTITION BY source_a, source_b, va) - 1 AS rx,
         2 * rank() OVER (PARTITION BY source_a, source_b ORDER BY vb)
           + count(*) OVER (PARTITION BY source_a, source_b, vb) - 1 AS ry
  FROM j
), agg AS (
  SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx, CAST(sum(ry * ry) AS BIGINT) AS syy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy
  FROM rk GROUP BY 1, 2
), pieces AS (
  SELECT source_a, source_b, n_shared,
         CAST(n_shared * sxy - sx * sy AS BIGINT) AS num,
         CAST(n_shared * sxx - sx * sx AS BIGINT) AS d1,
         CAST(n_shared * syy - sy * sy AS BIGINT) AS d2
  FROM agg
)
SELECT source_a, source_b, n_shared, num, d1, d2,
       CASE WHEN d1 > 0 AND d2 > 0
            THEN (CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE)))
                 / sqrt(CAST(d2 AS DOUBLE)) END AS rho
FROM pieces""",
        "runs_test_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, bucket_start, v_micro * 2 AS v2 FROM mb
), m AS (
  SELECT source, quantile_cont(v2, 0.5) AS m2 FROM s GROUP BY 1
), g AS (
  SELECT s.source, s.bucket_start,
         CASE WHEN CAST(s.v2 AS DOUBLE) > m.m2 THEN 1
              WHEN CAST(s.v2 AS DOUBLE) < m.m2 THEN -1 ELSE 0 END AS sgn
  FROM s JOIN m USING (source)
), f AS (
  SELECT * FROM g WHERE sgn != 0
), b AS (
  SELECT source, sgn,
         CASE WHEN lag(sgn) OVER w IS NULL OR sgn != lag(sgn) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM f WINDOW w AS (PARTITION BY source ORDER BY bucket_start)
), agg AS (
  SELECT source,
         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(sum(brk) AS BIGINT) AS n_runs
  FROM b GROUP BY source
)
SELECT source, n_pos, n_neg, n_runs,
       1.0 + CAST(2 * n_pos * n_neg AS DOUBLE) / CAST(n_pos + n_neg AS DOUBLE)
         AS expected_runs
FROM agg""",
        "pearson_pairs_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), cb AS (
  SELECT source, bucket_start, v_micro // 10000 AS vc FROM mb
), j AS (
  SELECT a.source AS source_a, b.source AS source_b, a.vc AS va, b.vc AS vb
  FROM cb a JOIN cb b
    ON a.bucket_start = b.bucket_start AND a.source < b.source
), agg AS (
  SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(va) AS BIGINT) AS sx, CAST(sum(vb) AS BIGINT) AS sy,
         CAST(sum(va * va) AS BIGINT) AS sxx, CAST(sum(vb * vb) AS BIGINT) AS syy,
         CAST(sum(va * vb) AS BIGINT) AS sxy
  FROM j GROUP BY 1, 2
), pieces AS (
  SELECT source_a, source_b, n_shared,
         CAST(n_shared * sxy - sx * sy AS BIGINT) AS num,
         CAST(n_shared * sxx - sx * sx AS BIGINT) AS d1,
         CAST(n_shared * syy - sy * sy AS BIGINT) AS d2
  FROM agg
)
SELECT source_a, source_b, n_shared, num, d1, d2,
       CASE WHEN d1 > 0 AND d2 > 0
            THEN (CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE)))
                 / sqrt(CAST(d2 AS DOUBLE)) END AS r
FROM pieces""",
        "winsorized_mean_events": """
WITH s AS (
  SELECT event_type AS source, CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
), r AS (
  SELECT source, vm,
         row_number() OVER (PARTITION BY source ORDER BY vm) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM s
), k AS (
  SELECT *, (10 * n) // 100 + 1 AS kk FROM r
), bnd AS (
  SELECT source,
         min(CASE WHEN rn = kk THEN vm END) AS lo,
         min(CASE WHEN rn = n - kk + 1 THEN vm END) AS hi
  FROM k GROUP BY source
), c AS (
  SELECT s.source, b.lo, b.hi, greatest(b.lo, least(b.hi, s.vm)) AS cv
  FROM s JOIN bnd b USING (source)
)
SELECT source, CAST(count(*) AS BIGINT) AS n,
       CAST(min(lo) AS BIGINT) AS lo_micro,
       CAST(min(hi) AS BIGINT) AS hi_micro,
       CAST(sum(cv) AS BIGINT) AS win_sum_micro,
       (CAST(sum(cv) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1000000.0 AS win_mean
FROM c GROUP BY source""",
        "moments_events": """
WITH s AS (
  SELECT event_type AS source, CAST(round(value) AS BIGINT) AS vq FROM events
), m AS (
  SELECT source, CAST(sum(vq) // count(*) AS BIGINT) AS mu_unit FROM s GROUP BY 1
), z AS (
  SELECT s.source, m.mu_unit, s.vq - m.mu_unit AS z FROM s JOIN m USING (source)
), a AS (
  SELECT source, mu_unit, count(*) AS n,
         CAST(sum(z*z) AS BIGINT) AS m2,
         CAST(sum(z*z*z) AS BIGINT) AS m3,
         CAST(sum(z*z*z*z) AS BIGINT) AS m4
  FROM z GROUP BY 1, 2
), q AS (
  SELECT *, sqrt(CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE)) AS sd FROM a
)
SELECT source, n, mu_unit, m2, m3, m4,
       CASE WHEN m2 > 0 THEN CAST(floor(
         ((CAST(m3 AS DOUBLE) / CAST(n AS DOUBLE)) / ((sd * sd) * sd)) * 1000000.0
       ) AS BIGINT) END AS skew_q6,
       CASE WHEN m2 > 0 THEN CAST(floor(
         ((CAST(n AS DOUBLE) * CAST(m4 AS DOUBLE))
          / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))) * 1000000.0
       ) AS BIGINT) END AS kurt_q6
FROM q""",
        "rescaled_range_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id, CAST(round(value) AS BIGINT) AS vq
  FROM events
), t AS (
  SELECT source, CAST(sum(vq) AS BIGINT) AS tot, count(*) AS n FROM s GROUP BY 1
), c AS (
  SELECT source, vq,
         CAST(sum(vq) OVER w AS BIGINT) AS cum,
         CAST(row_number() OVER w2 AS BIGINT) AS i
  FROM s
  WINDOW w AS (PARTITION BY source ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY source ORDER BY ts, event_id)
), d AS (
  SELECT c.source, t.n, t.tot, c.vq * c.vq AS v2,
         t.n * c.cum - c.i * t.tot AS dev
  FROM c JOIN t USING (source)
), a AS (
  SELECT source, max(n) AS n,
         CAST(max(dev) - min(dev) AS BIGINT) AS r_scaled,
         CAST(max(n) * CAST(sum(v2) AS BIGINT) - max(tot) * max(tot) AS BIGINT)
           AS s2_scaled
  FROM d GROUP BY source
)
SELECT source, n, r_scaled, s2_scaled,
       CASE WHEN s2_scaled > 0 THEN CAST(floor(
         (CAST(r_scaled AS DOUBLE) / sqrt(CAST(s2_scaled AS DOUBLE))) * 1000000.0
       ) AS BIGINT) END AS rs_q6
FROM a""",
        "peak_detect_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000) AS BIGINT) AS vq
  FROM events
), w AS (
  SELECT source, event_id, vq,
         coalesce(max(vq) OVER wl, {NEG}) AS lmax,
         coalesce(max(vq) OVER wr, {NEG}) AS rmax,
         coalesce(min(vq) OVER wl, vq) AS lmin,
         coalesce(min(vq) OVER wr, vq) AS rmin
  FROM s
  WINDOW wl AS (PARTITION BY source ORDER BY ts, event_id
                ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING),
         wr AS (PARTITION BY source ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND 12 FOLLOWING)
)
SELECT source, event_id,
       vq - least(lmin, rmin) AS prominence_milli_out,
       (vq > lmax AND vq >= rmax AND vq - least(lmin, rmin) >= 20000) AS is_peak
FROM w""".replace("{NEG}", str(-(1 << 62))),
        "theta_forecast_events_1h": """
WITH RECURSIVE th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), walk(source, idx, ts, y, e) AS (
  SELECT source, idx, ts, y, y FROM o WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.ts, p.y, p.y * 0.25 + w.e * 0.75
  FROM walk w JOIN o p ON p.source = w.source AND p.idx = w.idx + 1
), lvl AS (
  SELECT source, max_by(e, idx) AS level FROM walk GROUP BY source
), ag AS (
  SELECT source, count(*) AS n,
         CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(idx) AS BIGINT) AS st,
         CAST(sum(idx * idx) AS BIGINT) AS st2,
         CAST(sum(idx * CAST(y AS BIGINT)) AS BIGINT) AS sty
  FROM o GROUP BY source
), sl AS (
  SELECT source, n * sty - st * sy AS bn, n * st2 - st * st AS bd FROM ag
)
SELECT l.source, CAST(hh.h AS BIGINT) AS h, l.level,
       CASE WHEN s.bd <> 0 THEN
         l.level + (CAST(hh.h AS DOUBLE)
                    * (CAST(s.bn AS DOUBLE) / CAST(s.bd AS DOUBLE))) * 0.5
       END AS fc
FROM lvl l JOIN sl s USING (source),
     (SELECT unnest(generate_series(1, 3)) AS h) hh""",
        "stratified_sample_documents": _stratified_sample_oracle(),
        "source_token_budget_documents": _source_token_budget_oracle(),
        "gini_doclen_documents": """
WITH r AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
              AS BIGINT) AS i
  FROM documents
), a AS (
  SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sum_x,
         CAST(sum(i * x) AS BIGINT) AS six
  FROM r GROUP BY 1
)
SELECT source, n, sum_x,
       ((2 * six - (n + 1) * sum_x) * 1000000) // (n * sum_x) AS gini_ppm
FROM a""",
        "zorder_zonemap_events": _zorder_zonemap_oracle(),
        "compaction_plan_events": """
WITH d AS (
  SELECT event_type AS source, date_trunc('day', ts) AS day,
         count(*) AS n_rows
  FROM events GROUP BY 1, 2
), c AS (
  SELECT source, day, n_rows,
         coalesce(CAST(sum(n_rows) OVER (
           PARTITION BY source ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS before
  FROM d
)
SELECT source, day, n_rows, before // 500 AS file_bin FROM c""",
        "haar_multires_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, CAST(yd AS BIGINT) AS yq,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), c1 AS (
  SELECT source, idx // 2 AS k, count(*) AS n,
         CAST(sum(yq) AS BIGINT) AS s_sum,
         CAST(sum(yq * (CASE WHEN idx % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT)
           AS d_diff
  FROM o GROUP BY 1, 2
), c2 AS (
  SELECT source, k // 2 AS kk, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s_sum) AS BIGINT) AS s_sum,
         CAST(sum(s_sum * (CASE WHEN k % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT)
           AS d_diff
  FROM c1 GROUP BY 1, 2
), c3 AS (
  SELECT source, kk // 2 AS kkk, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s_sum) AS BIGINT) AS s_sum,
         CAST(sum(s_sum * (CASE WHEN kk % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT)
           AS d_diff
  FROM c2 GROUP BY 1, 2
)
SELECT source, CAST(1 AS BIGINT) AS level, k, n, s_sum, d_diff FROM c1 WHERE n = 2
UNION ALL
SELECT source, CAST(2 AS BIGINT), kk, n, s_sum, d_diff FROM c2 WHERE n = 4
UNION ALL
SELECT source, CAST(3 AS BIGINT), kkk, n, s_sum, d_diff FROM c3 WHERE n = 8""",
        "binseg_changepoint_events": """
WITH s AS (
  SELECT event_type AS source, ts, event_id,
         CAST(round(value * 1000) AS BIGINT) AS vq
  FROM events
), c AS (
  SELECT source,
         CAST(row_number() OVER w2 AS BIGINT) AS i,
         CAST(sum(vq) OVER w AS BIGINT) AS bi,
         CAST(sum(vq * vq) OVER w AS BIGINT) AS ai,
         CAST(count(*) OVER wp AS BIGINT) AS n,
         CAST(sum(vq) OVER wp AS BIGINT) AS bn,
         CAST(sum(vq * vq) OVER wp AS BIGINT) AS an
  FROM s
  WINDOW w AS (PARTITION BY source ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY source ORDER BY ts, event_id),
         wp AS (PARTITION BY source)
), k AS (
  SELECT source, i, n,
         CAST(floor(
           (CAST(ai AS DOUBLE)
            - (CAST(bi AS DOUBLE) * CAST(bi AS DOUBLE)) / CAST(i AS DOUBLE))
           + (CAST(an - ai AS DOUBLE)
              - (CAST(bn - bi AS DOUBLE) * CAST(bn - bi AS DOUBLE))
                / CAST(n - i AS DOUBLE))
         ) AS BIGINT) AS cost_q
  FROM c WHERE i < n
), m AS (
  SELECT source, i, n, cost_q,
         min(cost_q) OVER (PARTITION BY source) AS wmin
  FROM k
)
SELECT source, max(n) AS n, CAST(min(i) AS BIGINT) AS split_i,
       min(wmin) AS min_cost_q
FROM m WHERE cost_q = wmin GROUP BY source""",
        "stl_strength_events": _stl_strength_oracle(),
        "cross_rank_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS BIGINT) AS yq FROM th
), r AS (
  SELECT source, ts, yq,
         CAST(row_number() OVER (PARTITION BY ts ORDER BY yq, source) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY ts) AS BIGINT) AS n_src
  FROM o
)
SELECT source, ts, yq, rk, n_src,
       ((rk - 1) * 1000000) // greatest(n_src - 1, 1) AS pct_ppm
FROM r""",
        "turning_points_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), l AS (
  SELECT source, v_micro AS v,
         lag(v_micro) OVER (PARTITION BY source ORDER BY bucket_start) AS p,
         lead(v_micro) OVER (PARTITION BY source ORDER BY bucket_start) AS x
  FROM mb
), g AS (
  SELECT source, count(*) AS n,
         sum(CASE WHEN p IS NOT NULL AND x IS NOT NULL
                   AND ((p < v AND v > x) OR (p > v AND v < x))
                  THEN 1 ELSE 0 END) AS tp
  FROM l GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp_count,
       CAST(2 * (n - 2) AS BIGINT) AS exp3,
       CAST(16 * n - 29 AS BIGINT) AS var90,
       CAST(tp AS DOUBLE) / CAST(n - 2 AS DOUBLE) AS tp_rate
FROM g WHERE n >= 3""",
        "cox_stuart_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, v_micro AS v,
         row_number() OVER (PARTITION BY source ORDER BY bucket_start) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM mb
), j AS (
  SELECT a.source, a.n, a.v AS va, b.v AS vb
  FROM s a JOIN s b ON b.source = a.source AND b.rn = a.rn + (a.n - a.n // 2)
  WHERE a.rn <= a.n // 2
), g AS (
  SELECT source, n, count(*) AS n_pairs,
         sum(CASE WHEN vb > va THEN 1 ELSE 0 END) AS pos,
         sum(CASE WHEN vb < va THEN 1 ELSE 0 END) AS neg,
         sum(CASE WHEN vb = va THEN 1 ELSE 0 END) AS n_ties
  FROM j GROUP BY 1, 2
)
SELECT source, CAST(n AS BIGINT) AS n, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
       CAST(n_ties AS BIGINT) AS n_ties,
       CASE WHEN pos + neg > 0 THEN
         CAST(pos AS DOUBLE) / CAST(pos + neg AS DOUBLE)
       END AS pos_share
FROM g""",
        "bartels_rank_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), r AS (
  SELECT source, bucket_start,
         CAST(2 * rank() OVER (PARTITION BY source ORDER BY v_micro)
              + count(*) OVER (PARTITION BY source, v_micro) - 1 AS BIGINT) AS r2,
         count(*) OVER (PARTITION BY source) AS n
  FROM mb
), l AS (
  SELECT source, n, r2,
         lead(r2) OVER (PARTITION BY source ORDER BY bucket_start) AS r2n
  FROM r
), g AS (
  SELECT source, max(n) AS n,
         sum(CASE WHEN r2n IS NOT NULL THEN (r2n - r2) * (r2n - r2) ELSE 0 END) AS nm,
         sum((r2 - (n + 1)) * (r2 - (n + 1))) AS den
  FROM l GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n, CAST(nm AS BIGINT) AS nm_num,
       CAST(den AS BIGINT) AS d_den,
       CASE WHEN den > 0 THEN CAST(nm AS DOUBLE) / CAST(den AS DOUBLE) END AS rvn
FROM g""",
        "von_neumann_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), lagd AS (
  SELECT source, v, lag(v) OVER (PARTITION BY source ORDER BY b) AS pv FROM o
), d AS (
  SELECT source, CAST(sum((v - pv) * (v - pv)) AS BIGINT) AS sum_d2
  FROM lagd WHERE pv IS NOT NULL GROUP BY 1
), ag AS (
  SELECT source, count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM o GROUP BY 1
), dev AS (
  SELECT o.source, ag.n,
         CAST(sum((ag.n * o.v - ag.s) * (ag.n * o.v - ag.s)) AS BIGINT) AS dev2_sum
  FROM o JOIN ag ON ag.source = o.source GROUP BY 1, 2
)
SELECT dev.source, CAST(dev.n AS BIGINT) AS n, d.sum_d2, dev.dev2_sum,
       CASE WHEN dev.dev2_sum > 0 THEN
         CAST(dev.n * dev.n * d.sum_d2 AS DOUBLE)
         / CAST((dev.n - 1) * dev.dev2_sum AS DOUBLE)
       END AS vn_ratio
FROM dev JOIN d ON d.source = dev.source
WHERE dev.n >= 2""",
        "gesd_outliers_events_1h": _gesd_oracle(3),
        "shesd_outliers_events_1h": _gesd_oracle(3, head=_SHESD_HEAD),
        "dtw_pairs_events_1h": """
WITH RECURSIVE th AS MATERIALIZED (
  SELECT event_type AS source, epoch_us(ts) // 21600000000 AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS MATERIALIZED (
  SELECT source, CAST(yd AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
), sv AS MATERIALIZED (
  SELECT source, list(v ORDER BY t) AS vs, CAST(count(*) AS BIGINT) AS n
  FROM o GROUP BY 1
), pr AS MATERIALIZED (
  SELECT a.source AS sa, b.source AS sb, a.vs AS va, b.vs AS vb,
         a.n AS na, b.n AS nb
  FROM sv a JOIN sv b ON a.source < b.source
), cm AS MATERIALIZED (
  -- the full cost matrix + per-row cumsums, computed ONCE outside the
  -- recursion and RELATIONALLY (a per-pair index cross join on o — no
  -- list is ever expanded per grid cell: unnesting va/vb per row copies
  -- O(n³) elements, measured in the minutes; and list extraction inside
  -- a window aggregate re-ran per recursion iteration before that)
  SELECT oa.source AS sa, ob.source AS sb, oa.t AS i, ob.t + 1 AS j,
         abs(oa.v - ob.v) AS c,
         CAST(sum(abs(oa.v - ob.v))
              OVER (PARTITION BY oa.source, ob.source, oa.t ORDER BY ob.t)
           AS BIGINT) AS s
  FROM o oa JOIN o ob ON oa.source < ob.source
), walk AS (
  -- dp row 0 is the cumsum row itself
  SELECT sa, sb, 0 AS i, list(s ORDER BY j) AS prev
  FROM cm WHERE i = 0 GROUP BY sa, sb
  UNION ALL
  -- one step = one dp row via the prefix-scan form:
  -- new[j] = S_j + runmin_j( least(prev[j], prev[j-1]) - (S_j - c_j) )
  SELECT sa, sb, i, list(newv ORDER BY j) AS newr FROM (
    SELECT sa, sb, i, j,
           s + min(val) OVER (PARTITION BY sa, sb ORDER BY j) AS newv
    FROM (
      SELECT m.sa, m.sb, m.i, m.j, m.s,
             least(w.prev[m.j], coalesce(w.prev[m.j - 1], CAST(1 AS BIGINT) << 60))
               - (m.s - m.c) AS val
      FROM walk w
      JOIN cm m ON m.sa = w.sa AND m.sb = w.sb AND m.i = w.i + 1
    ) c2
  ) c3 GROUP BY sa, sb, i
), fin AS (
  SELECT sa, sb, prev FROM (
    SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY i DESC) AS rn
    FROM walk
  ) q WHERE rn = 1
)
SELECT p.sa AS source_a, p.sb AS source_b, p.na AS n_a, p.nb AS n_b,
       CAST(f.prev[CAST(p.nb AS INT)] AS BIGINT) AS dtw,
       CAST(f.prev[CAST(p.nb AS INT)] AS DOUBLE) / CAST(p.na + p.nb AS DOUBLE) AS dtw_norm
FROM pr p JOIN fin f ON f.sa = p.sa AND f.sb = p.sb""",
        "isotonic_fit_events_1h": """
WITH RECURSIVE th AS MATERIALIZED (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS MATERIALIZED (
  SELECT source, CAST(yd AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
), ag AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM o GROUP BY 1
), walk AS (
  -- state machine: one recursion step = ONE stack action (merge top two
  -- blocks on strict mean violation, else push the next point)
  SELECT o.source, 1 AS step, CAST(1 AS BIGINT) AS i,
         [o.v] AS sums, [CAST(1 AS BIGINT)] AS cnts, ag.n
  FROM o JOIN ag USING (source) WHERE o.t = 0
  UNION ALL
  SELECT source, step + 1,
         CASE WHEN viol THEN i ELSE i + 1 END AS i,
         CASE WHEN viol THEN list_append(sums[:k-2], sums[k-1] + sums[k])
              ELSE list_append(sums, nv) END AS sums,
         CASE WHEN viol THEN list_append(cnts[:k-2], cnts[k-1] + cnts[k])
              ELSE list_append(cnts, CAST(1 AS BIGINT)) END AS cnts,
         n
  FROM (
    SELECT w.source, w.step, w.i, w.sums, w.cnts, w.n,
           len(w.sums) AS k, o2.v AS nv,
           (len(w.sums) >= 2 AND
            w.sums[len(w.sums)-1] * w.cnts[len(w.sums)]
              > w.sums[len(w.sums)] * w.cnts[len(w.sums)-1]) AS viol
    FROM walk w LEFT JOIN o o2 ON o2.source = w.source AND o2.t = w.i
  ) s
  WHERE viol OR i < n
), fin AS (
  SELECT source, sums, cnts FROM (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY step DESC) AS rn
    FROM walk
  ) q WHERE rn = 1
), blk AS (
  SELECT source, unnest(range(len(sums))) AS bz, sums, cnts FROM fin
), b2 AS (
  SELECT source, CAST(bz + 1 AS BIGINT) AS block_i,
         sums[bz+1] AS sum_v, cnts[bz+1] AS m
  FROM blk
)
SELECT source, block_i,
       CAST(sum(m) OVER (PARTITION BY source ORDER BY block_i) - m AS BIGINT) AS start_t,
       CAST(m AS BIGINT) AS m, CAST(sum_v AS BIGINT) AS sum_v,
       CAST(sum_v AS DOUBLE) / CAST(m AS DOUBLE) AS fit
FROM b2""",
        "segmented_trend_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, CAST(yd AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
), pre AS (
  SELECT source, t, v,
         CAST(sum(v) OVER w AS BIGINT) AS bi,
         CAST(sum(v * v) OVER w AS BIGINT) AS ai,
         CAST(sum(v) OVER ws AS BIGINT) AS bn,
         CAST(sum(v * v) OVER ws AS BIGINT) AS an,
         CAST(count(*) OVER ws AS BIGINT) AS n
  FROM o
  WINDOW w AS (PARTITION BY source ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY source)
), cost AS (
  SELECT source, t + 1 AS i, n,
         CAST(floor(
           (CAST(ai AS DOUBLE) - CAST(bi AS DOUBLE) * CAST(bi AS DOUBLE) / CAST(t + 1 AS DOUBLE))
           + (CAST(an - ai AS DOUBLE)
              - CAST(bn - bi AS DOUBLE) * CAST(bn - bi AS DOUBLE) / CAST(n - t - 1 AS DOUBLE))
         ) AS BIGINT) AS cq
  FROM pre WHERE t + 1 < n
), sp AS (
  SELECT source, min(i) AS split_i, max(n) AS n FROM (
    SELECT source, i, n, cq, min(cq) OVER (PARTITION BY source) AS mn FROM cost
  ) q WHERE cq = mn GROUP BY source
), seg AS (
  SELECT o.source, sp.n, sp.split_i,
         CASE WHEN o.t < sp.split_i THEN 'left' ELSE 'right' END AS seg,
         CASE WHEN o.t < sp.split_i THEN o.t ELSE o.t - sp.split_i END AS x,
         o.v
  FROM o JOIN sp USING (source)
), s2 AS (
  SELECT source, n, split_i, seg,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(v) AS HUGEINT) AS sy,
         CAST(sum(x * v) AS HUGEINT) AS sxy
  FROM seg GROUP BY 1, 2, 3, 4
)
SELECT source, n, split_i, seg, m,
       CASE WHEN m * sxx - sx * sx > 0 THEN
         CAST(m * sxy - sx * sy AS DOUBLE) / CAST(m * sxx - sx * sx AS DOUBLE)
       END AS slope,
       CASE WHEN m * sxx - sx * sx > 0 THEN
         CAST(sxx * sy - sx * sxy AS DOUBLE) / CAST(m * sxx - sx * sx AS DOUBLE)
       END AS intercept
FROM s2 WHERE n >= 2""",
        "grubbs_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, CAST(yd AS BIGINT) AS v FROM th
), ag AS (
  SELECT source, count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM o GROUP BY 1
), g AS (
  SELECT o.source, ag.n,
         CAST(max(abs(ag.n * o.v - ag.s)) AS BIGINT) AS max_dev_scaled,
         CAST(sum((ag.n * o.v - ag.s) * (ag.n * o.v - ag.s)) AS BIGINT) AS dev2_sum
  FROM o JOIN ag ON ag.source = o.source GROUP BY 1, 2
)
SELECT source, CAST(n AS BIGINT) AS n, max_dev_scaled, dev2_sum,
       CASE WHEN dev2_sum > 0 THEN
         CAST(max_dev_scaled AS DOUBLE)
         / sqrt(CAST(dev2_sum AS DOUBLE) / CAST(n - 1 AS DOUBLE))
       END AS grubbs_g
FROM g WHERE n >= 2""",
        "friedman_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), kk AS (
  SELECT count(DISTINCT source) AS k FROM mb
), c AS (
  SELECT mb.source, mb.bucket_start, mb.v_micro, kk.k,
         count(*) OVER (PARTITION BY mb.bucket_start) AS bc
  FROM mb, kk
), r AS (
  SELECT source, k,
         CAST(2 * rank() OVER (PARTITION BY bucket_start ORDER BY v_micro)
              + count(*) OVER (PARTITION BY bucket_start, v_micro) - 1 AS BIGINT) AS r2
  FROM c WHERE bc = k
), p AS (
  SELECT source, k, count(*) AS n_blocks, CAST(sum(r2) AS BIGINT) AS rank2_sum
  FROM r GROUP BY 1, 2
), t AS (
  SELECT CAST(sum(rank2_sum * rank2_sum) AS BIGINT) AS tot FROM p
)
SELECT p.source, CAST(p.n_blocks AS BIGINT) AS n_blocks, CAST(p.k AS BIGINT) AS k,
       p.rank2_sum,
       CASE WHEN p.n_blocks > 0 THEN
         CAST(3 * t.tot AS DOUBLE)
         / CAST(p.n_blocks * p.k * (p.k + 1) AS DOUBLE)
         - CAST(3 * p.n_blocks * (p.k + 1) AS DOUBLE)
       END AS chi2
FROM p, t""",
        "kruskal_wallis_events": """
WITH s AS (
  SELECT event_type AS source, CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
), pv AS (
  SELECT source, vm, count(*) AS c_sv FROM s GROUP BY 1, 2
), tv AS (
  SELECT vm, CAST(sum(c_sv) AS BIGINT) AS c_v FROM pv GROUP BY 1
), tv2 AS (
  SELECT vm, c_v,
         CAST(2 * COALESCE(sum(c_v) OVER (ORDER BY vm
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c_v + 1 AS BIGINT) AS r2
  FROM tv
), per AS (
  SELECT source, CAST(sum(c_sv) AS BIGINT) AS n_g,
         CAST(sum(c_sv * r2) AS BIGINT) AS rank2_sum
  FROM pv JOIN tv2 USING (vm) GROUP BY 1
), g AS (
  SELECT CAST(sum(c_v) AS BIGINT) AS n_total,
         CAST(sum(c_v * c_v * c_v - c_v) AS BIGINT) AS tie_cubes
  FROM tv
)
SELECT source, n_g, rank2_sum, n_total, tie_cubes,
       CAST(rank2_sum AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_rank2
FROM per, g""",
        "snaive_mase_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), l AS (
  SELECT source,
         v_micro - lag(v_micro, 24) OVER (PARTITION BY source ORDER BY bucket_start) AS e,
         v_micro - lag(v_micro, 1) OVER (PARTITION BY source ORDER BY bucket_start) AS d
  FROM mb
), g AS (
  SELECT source, count(*) AS n, CAST(sum(e) AS BIGINT) AS sum_e,
         CAST(sum(abs(e)) AS BIGINT) AS sae, CAST(sum(abs(d)) AS BIGINT) AS sad
  FROM l GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n, sum_e, sae, sad,
       CASE WHEN sad > 0 THEN
         CAST(sae * (n - 1) AS DOUBLE) / CAST(sad * (n - 24) AS DOUBLE)
       END AS mase,
       CASE WHEN sae > 0 THEN
         CAST(sum_e * (n - 24) AS DOUBLE) / CAST(sae AS DOUBLE)
       END AS tracking_signal
FROM g WHERE n > 24""",
        "holt_damped_events_1h": """
WITH RECURSIVE th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM th
), walk(source, idx, ts, y, level, trend) AS (
  SELECT source, idx, ts, y, y, CAST(0 AS DOUBLE) FROM o WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.ts, p.y,
         p.y * 0.25 + (w.level + w.trend * 0.875) * 0.75,
         ((p.y * 0.25 + (w.level + w.trend * 0.875) * 0.75) - w.level) * 0.5
           + w.trend * 0.4375
  FROM walk w JOIN o p ON p.source = w.source AND p.idx = w.idx + 1
)
SELECT source, ts, y, level, trend, level + trend * 0.875 AS fc1 FROM walk""",
        "dm_test_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), l AS (
  SELECT source,
         abs(v - lag(v, 1) OVER (PARTITION BY source ORDER BY b))
         - abs(v - lag(v, 24) OVER (PARTITION BY source ORDER BY b)) AS d
  FROM o
), ag AS (
  SELECT source, count(*) AS n, CAST(sum(d) AS BIGINT) AS sum_d,
         CAST(sum(d * d) AS BIGINT) AS q
  FROM l WHERE d IS NOT NULL GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n, sum_d,
       CAST(n * n * q - n * sum_d * sum_d AS BIGINT) AS dd2_sum,
       CASE WHEN n * n * q - n * sum_d * sum_d > 0 THEN
         CAST(sum_d AS DOUBLE) * sqrt(CAST(n * (n - 1) AS DOUBLE))
         / sqrt(CAST(n * n * q - n * sum_d * sum_d AS DOUBLE))
       END AS dm_stat
FROM ag WHERE n >= 2""",
        "wilcoxon_signed_rank_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), l AS (
  SELECT source,
         abs(v - lag(v, 1) OVER (PARTITION BY source ORDER BY b))
         - abs(v - lag(v, 24) OVER (PARTITION BY source ORDER BY b)) AS d
  FROM o
), dd AS (
  SELECT source, d FROM l WHERE d IS NOT NULL AND d <> 0
), r AS (
  SELECT source, d,
         CAST(2 * rank() OVER (PARTITION BY source ORDER BY abs(d))
              + count(*) OVER (PARTITION BY source, abs(d)) - 1 AS BIGINT) AS r2,
         CAST(count(*) OVER (PARTITION BY source, abs(d)) AS BIGINT) AS c
  FROM dd
), ag AS (
  SELECT source, count(*) AS n_nz,
         CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_plus,
         CAST(sum(c * c - 1) AS BIGINT) AS tc
  FROM r GROUP BY 1
)
SELECT source, CAST(n_nz AS BIGINT) AS n_nz, w2_plus,
       CAST(2 * w2_plus - n_nz * (n_nz + 1) AS BIGINT) AS num4,
       CAST(2 * n_nz * (n_nz + 1) * (2 * n_nz + 1) - tc AS BIGINT) AS var48,
       CASE WHEN 2 * n_nz * (n_nz + 1) * (2 * n_nz + 1) - tc > 0 THEN
         CAST(2 * w2_plus - n_nz * (n_nz + 1) AS DOUBLE) * sqrt(CAST(3 AS DOUBLE))
         / sqrt(CAST(2 * n_nz * (n_nz + 1) * (2 * n_nz + 1) - tc AS DOUBLE))
       END AS z_stat
FROM ag WHERE n_nz >= 2""",
        "pettitt_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
), r AS (
  SELECT source, bucket_start,
         CAST(2 * rank() OVER (PARTITION BY source ORDER BY v_micro)
              + count(*) OVER (PARTITION BY source, v_micro) - 1 AS BIGINT) AS r2,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM mb
), u AS (
  SELECT source, bucket_start, n,
         CAST(row_number() OVER (PARTITION BY source ORDER BY bucket_start) AS BIGINT) AS t,
         CAST(sum(r2) OVER (PARTITION BY source ORDER BY bucket_start
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rr2
  FROM r
), uu AS (
  SELECT source, bucket_start, n, t, rr2 - t * (n + 1) AS u2
  FROM u WHERE t < n AND n >= 2
), pick AS (
  SELECT source, n, t, bucket_start, abs(u2) AS k2,
         row_number() OVER (PARTITION BY source ORDER BY abs(u2) DESC, bucket_start ASC) AS pk
  FROM uu
)
SELECT source, n, t AS t_star, bucket_start AS change_bucket,
       CAST(k2 AS BIGINT) AS k2_stat
FROM pick WHERE pk = 1""",
        "winkler_score_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b AS ts, CAST(yd AS BIGINT) AS yv,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx,
         count(*) OVER (PARTITION BY source) AS n,
         CAST(lag(yd, 1) OVER (PARTITION BY source ORDER BY b) AS BIGINT) AS fc
  FROM th
), cal AS (
  SELECT source, idx, abs(yv - fc) AS r, n - 6 - 1 AS ncal
  FROM o WHERE idx >= 1 AND idx <= n - 6 - 1
), rad AS (
  SELECT source, r AS q
  FROM (SELECT source, r, ncal,
               row_number() OVER (PARTITION BY source ORDER BY r, idx) AS rk
        FROM cal) rr
  WHERE rk = least(((ncal + 1) * 7 + 7) // 8, ncal)
), band AS (
  SELECT o.source, o.yv AS y, o.fc - rad.q AS lo, o.fc + rad.q AS hi,
         (o.yv >= o.fc - rad.q AND o.yv <= o.fc + rad.q) AS covered
  FROM o JOIN rad ON rad.source = o.source
  WHERE o.idx >= o.n - 6
), ag AS (
  SELECT source, count(*) AS n,
         CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS cov_cnt,
         CAST(sum((hi - lo) + 16 * greatest(lo - y, 0)
                  + 16 * greatest(y - hi, 0)) AS BIGINT) AS sum_winkler
  FROM band GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n, cov_cnt, sum_winkler,
       CAST(sum_winkler AS DOUBLE) / CAST(n AS DOUBLE) AS mean_winkler,
       CAST(cov_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS coverage
FROM ag""",
        "mann_whitney_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), r AS (
  SELECT source,
         (row_number() OVER (PARTITION BY source ORDER BY bucket_start)
          <= count(*) OVER (PARTITION BY source) // 2) AS g1,
         CAST(2 * rank() OVER (PARTITION BY source ORDER BY v)
              + count(*) OVER (PARTITION BY source, v) - 1 AS BIGINT) AS r2,
         CAST(count(*) OVER (PARTITION BY source, v) AS BIGINT) AS c
  FROM mb
), ag AS (
  SELECT source,
         CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN g1 THEN r2 ELSE 0 END) AS BIGINT) AS rs2,
         CAST(sum(c * c - 1) AS BIGINT) AS tc
  FROM r GROUP BY 1
), st AS (
  SELECT source, n1, n2,
         CAST(rs2 - n1 * (n1 + 1) AS BIGINT) AS u2,
         CAST(rs2 - n1 * (n1 + 1) - n1 * n2 AS BIGINT) AS num_z,
         CAST(n1 * n2 AS BIGINT) AS f1,
         CAST((n1 + n2 + 1) * (n1 + n2) * (n1 + n2 - 1) - tc AS BIGINT) AS f2,
         CAST(n1 + n2 AS BIGINT) AS n
  FROM ag WHERE n1 >= 1 AND n2 >= 1
)
SELECT source, n1, n2, u2, num_z, f2,
       CASE WHEN f2 > 0 THEN
         CAST(num_z AS DOUBLE) * sqrt(CAST(3 * n * (n - 1) AS DOUBLE))
         / sqrt(CAST(f1 AS DOUBLE)) / sqrt(CAST(f2 AS DOUBLE))
       END AS z_stat,
       CAST(num_z AS DOUBLE) / CAST(f1 AS DOUBLE) AS cliffs_delta
FROM st""",
        "crps_ensemble_events_1h": """
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS y,
         lag(CAST(yd AS BIGINT), 1) OVER (PARTITION BY source ORDER BY b) AS m1,
         lag(CAST(yd AS BIGINT), 2) OVER (PARTITION BY source ORDER BY b) AS m2,
         lag(CAST(yd AS BIGINT), 24) OVER (PARTITION BY source ORDER BY b) AS m3
  FROM th
), p AS (
  SELECT source,
         6 * (abs(m1 - y) + abs(m2 - y) + abs(m3 - y))
         - 2 * (abs(m1 - m2) + abs(m1 - m3) + abs(m2 - m3)) AS c18
  FROM o WHERE m1 IS NOT NULL AND m2 IS NOT NULL AND m3 IS NOT NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c18) AS BIGINT) AS sum_crps18,
       CAST(CAST(sum(c18) AS BIGINT) AS DOUBLE)
       / CAST(18 * count(*) AS DOUBLE) AS mean_crps
FROM p GROUP BY 1""",
        "hier_reconcile_events": """
WITH h0 AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS hb,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), hf AS (
  SELECT source, hb, s, lag(s, 1) OVER (PARTITION BY source ORDER BY hb) AS f
  FROM h0
), d AS (
  SELECT source, date_trunc('day', hb) AS dday,
         CAST(sum(s) AS BIGINT) AS actual, CAST(sum(f) AS BIGINT) AS bu,
         count(*) AS cnt, count(f) AS cntf
  FROM hf GROUP BY 1, 2
), dd AS (
  SELECT source, actual, bu, cnt, cntf,
         lag(actual, 1) OVER (PARTITION BY source ORDER BY dday) AS direct
  FROM d
)
SELECT source, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(actual - direct)) AS BIGINT) AS sae_direct,
       CAST(sum(abs(actual - bu)) AS BIGINT) AS sae_bottom_up,
       CAST(sum(abs(direct - bu)) AS BIGINT) AS coherence_gap
FROM dd WHERE direct IS NOT NULL AND cntf = cnt GROUP BY 1""",
        "sample_entropy_events_1h": """
WITH mb AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, v,
         row_number() OVER (PARTITION BY source ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM mb
), q AS (
  SELECT source, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(CASE
               WHEN rk = (3 * (n - 1)) // 4 + 1 THEN v * (4 - (3 * (n - 1)) % 4)
               WHEN rk = (3 * (n - 1)) // 4 + 2 THEN v * ((3 * (n - 1)) % 4)
               ELSE 0 END)
            - sum(CASE
               WHEN rk = (n - 1) // 4 + 1 THEN v * (4 - (n - 1) % 4)
               WHEN rk = (n - 1) // 4 + 2 THEN v * ((n - 1) % 4)
               ELSE 0 END) AS BIGINT) AS r4
  FROM s WHERE n >= 2 GROUP BY source
), p AS (
  SELECT source, row_number() OVER (PARTITION BY source ORDER BY bucket_start) AS t, v
  FROM mb
), e AS (
  SELECT source, t, v,
         lead(v, 1) OVER (PARTITION BY source ORDER BY t) AS v1,
         lead(v, 2) OVER (PARTITION BY source ORDER BY t) AS v2
  FROM p
), pr AS (
  SELECT a.source AS source,
         CAST(count(*) FILTER (WHERE 8 * abs(a.v - b.v) <= q.r4
                               AND 8 * abs(a.v1 - b.v1) <= q.r4) AS BIGINT) AS b_cnt,
         CAST(count(*) FILTER (WHERE 8 * abs(a.v - b.v) <= q.r4
                               AND 8 * abs(a.v1 - b.v1) <= q.r4
                               AND 8 * abs(a.v2 - b.v2) <= q.r4) AS BIGINT) AS a_cnt
  FROM e a JOIN e b ON a.source = b.source AND a.t < b.t
  JOIN q ON q.source = a.source
  WHERE a.v2 IS NOT NULL AND b.v2 IS NOT NULL
  GROUP BY 1
)
SELECT q.source AS source, q.n AS n, q.r4 AS r4,
       COALESCE(pr.b_cnt, 0) AS b_cnt, COALESCE(pr.a_cnt, 0) AS a_cnt,
       CASE WHEN COALESCE(pr.b_cnt, 0) > 0 THEN
         CAST(pr.a_cnt AS DOUBLE) / CAST(pr.b_cnt AS DOUBLE)
       END AS ratio
FROM q LEFT JOIN pr ON pr.source = q.source""",
        "tokenizer_fertility_documents": f"""
WITH c AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS nc,
         CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS nw,
         CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS nb
  FROM documents
), ag AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(nc) AS BIGINT) AS sum_chars,
         CAST(sum(nw) AS BIGINT) AS sum_ws,
         CAST(sum(nb) AS BIGINT) AS sum_bpe
  FROM c GROUP BY 1
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, sum_chars, sum_ws, sum_bpe,
       CASE WHEN sum_bpe > 0 THEN CAST(sum_chars AS DOUBLE) / CAST(sum_bpe AS DOUBLE)
       END AS chars_per_tok,
       CASE WHEN sum_ws > 0 THEN CAST(sum_bpe AS DOUBLE) / CAST(sum_ws AS DOUBLE)
       END AS toks_per_word
FROM ag""",
        "packing_waste_documents": f"""
WITH c AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n
  FROM documents
), d AS (
  SELECT source, n,
         (n + 511) // 512 AS ns,
         greatest(n - 512, 0) AS tr
  FROM c
), ag AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n) AS BIGINT) AS sum_tok,
         CAST(sum(ns) AS BIGINT) AS n_seqs,
         CAST(sum(ns * 512 - n) AS BIGINT) AS pad_tokens,
         CAST(sum(tr) AS BIGINT) AS trunc_tokens
  FROM d GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, sum_tok, n_seqs, pad_tokens,
       trunc_tokens,
       CASE WHEN n_seqs > 0 THEN
         CAST(pad_tokens AS DOUBLE) / CAST(n_seqs * 512 AS DOUBLE)
       END AS pad_rate
FROM ag""",
        "winnowing_fingerprint_documents": xhash_sql.winnowing_sql(),
        "winnowing_neardup_pairs_documents": xhash_sql.winnowing_pairs_sql(min_shared=3),
        "ul2_denoiser_mix_documents": xhash_sql.ul2_denoiser_sql(),
        "var1_pairs_events_1h": exact_sql.var1_pairs_sql(),
        "pooled_ar_forecast_events_1h": exact_sql.pooled_ar_sql(),
        "pooled_ar_fe_forecast_events_1h": exact_sql.pooled_ar_fe_sql(),
        "arima210_forecast_events_1h": exact_sql.arima210_sql(),
        "epoch_shuffle_documents": epoch_shuffle_sql(),
        "siegel_slopes_events_1h": "\nWITH th AS (\n  SELECT event_type AS source, date_trunc('hour', ts) AS b,\n         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd\n  FROM events GROUP BY 1, 2\n), o AS (\n  SELECT source, CAST(yd AS BIGINT) AS v,\n         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS i\n  FROM th\n), pr AS (\n  SELECT a.source, a.i AS ia, b2.i AS ib,\n         ((b2.v - a.v) * 1000\n            - ((((b2.v - a.v) * 1000) % (b2.i - a.i) + (b2.i - a.i)) % (b2.i - a.i))\n         ) // (b2.i - a.i) * 2 AS s2\n  FROM o a JOIN o b2 ON a.source = b2.source AND a.i < b2.i\n), ep AS (\n  SELECT source, ia AS i, s2 FROM pr\n  UNION ALL\n  SELECT source, ib AS i, s2 FROM pr\n), rmed AS (\n  SELECT source, i, s2,\n         row_number() OVER (PARTITION BY source, i ORDER BY s2) AS rn,\n         count(*) OVER (PARTITION BY source, i) AS cnt\n  FROM ep\n), medi AS (\n  SELECT source, i, avg(s2) AS medq FROM rmed\n  WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1 GROUP BY 1, 2\n), l2 AS (\n  SELECT source, medq,\n         row_number() OVER (PARTITION BY source ORDER BY medq) AS rn,\n         count(*) OVER (PARTITION BY source) AS cnt\n  FROM medi\n), sl AS (\n  SELECT source, avg(medq) / 2000.0 AS slope FROM l2\n  WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1 GROUP BY 1\n), res AS (\n  SELECT o.source, CAST(o.v AS DOUBLE) - sl.slope * o.i AS r\n  FROM o JOIN sl ON sl.source = o.source\n), rr AS (\n  SELECT source, r,\n         row_number() OVER (PARTITION BY source ORDER BY r) AS rn,\n         count(*) OVER (PARTITION BY source) AS cnt\n  FROM res\n), ic AS (\n  SELECT source, avg(r) AS intercept FROM rr\n  WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1 GROUP BY 1\n), np_ AS (\n  SELECT source, CAST(count(*) AS BIGINT) AS n_points FROM o GROUP BY 1\n)\nSELECT np_.source, np_.n_points, sl.slope, ic.intercept\nFROM np_ JOIN sl ON sl.source = np_.source JOIN ic ON ic.source = np_.source",
        "markov_transitions_events": "\nWITH s AS (\n  SELECT event_type AS source, ts, event_id,\n         CASE WHEN value < 25 THEN 'low' WHEN value < 75 THEN 'mid'\n              ELSE 'high' END AS state\n  FROM events\n), l AS (\n  SELECT source, state AS to_state,\n         lag(state) OVER (PARTITION BY source ORDER BY ts, event_id) AS from_state\n  FROM s\n), ag AS (\n  SELECT source, from_state, to_state, CAST(count(*) AS BIGINT) AS n\n  FROM l WHERE from_state IS NOT NULL GROUP BY 1, 2, 3\n)\nSELECT source, from_state, to_state, n,\n       CAST(sum(n) OVER (PARTITION BY source, from_state) AS BIGINT) AS n_from,\n       CAST(n AS DOUBLE)\n         / CAST(sum(n) OVER (PARTITION BY source, from_state) AS DOUBLE) AS p\nFROM ag",
        # stopword list generated from the SAME union the Spark side uses
        # (_ALL_SW <- textops.STOPWORDS) so an edit to STOPWORDS can never
        # silently desync the two legs
        "rake_keywords_documents": f"\nWITH dw AS (\n  SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ws\n  FROM documents WHERE text IS NOT NULL\n), wr0 AS (\n  SELECT doc_id, unnest(range(len(ws))) AS wpos, ws FROM dw\n), wr AS (\n  SELECT doc_id, wpos, ws[wpos+1] AS w FROM wr0\n), wn AS (\n  SELECT doc_id, wpos, w,\n         CASE WHEN list_contains({_ALL_SW}, w) THEN 1 ELSE 0 END AS stp\n  FROM wr WHERE w <> ''\n), rn AS (\n  SELECT doc_id, wpos, w, stp,\n         sum(stp) OVER (PARTITION BY doc_id ORDER BY wpos\n           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run\n  FROM wn\n), nr AS (\n  SELECT doc_id, run, w FROM rn WHERE stp = 0\n), ph AS (\n  SELECT doc_id, run, CAST(count(*) AS BIGINT) AS plen FROM nr GROUP BY 1, 2\n), sc AS (\n  SELECT nr.w, CAST(count(*) AS BIGINT) AS freq, CAST(sum(ph.plen) AS BIGINT) AS deg\n  FROM nr JOIN ph ON ph.doc_id = nr.doc_id AND ph.run = nr.run\n  GROUP BY nr.w\n)\nSELECT w, freq, deg, CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS score\nFROM sc ORDER BY score DESC, w ASC LIMIT 30",
        "holt_winters_mul_events_1h": """
WITH RECURSIVE oc AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), o2 AS (
  SELECT source, b AS ts, y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS idx
  FROM oc
), walk(source, idx, ts, y, level, trend, seasonal, slist) AS (
  SELECT source, idx, ts, y, y, CAST(0 AS DOUBLE), CAST(1 AS DOUBLE),
         list_transform(range(24), x -> CAST(1 AS DOUBLE))
  FROM o2 WHERE idx = 0
  UNION ALL
  SELECT p.source, p.idx, p.ts, p.y,
         (p.y / w.slist[1]) * 0.25 + (w.level + w.trend) * 0.75,
         (((p.y / w.slist[1]) * 0.25 + (w.level + w.trend) * 0.75) - w.level) * 0.5
           + w.trend * 0.5,
         (p.y / (w.level + w.trend)) * 0.125 + w.slist[1] * 0.875,
         list_append(w.slist[2:],
                     (p.y / (w.level + w.trend)) * 0.125 + w.slist[1] * 0.875)
  FROM walk w JOIN o2 p ON p.source = w.source AND p.idx = w.idx + 1
)
SELECT source, ts, y, level, trend, seasonal,
       (level + trend) * slist[1] AS fc1
FROM walk""",
        "readability_documents": """
WITH b AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_words,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sents,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_words, n_sents, n_syll,
       39*n_words*n_words + 1180*n_syll*n_sents - 1559*n_sents*n_words AS fk_num,
       100*n_sents*n_words AS fk_den,
       CAST(39*n_words*n_words + 1180*n_syll*n_sents - 1559*n_sents*n_words AS DOUBLE)
         / CAST(100*n_sents*n_words AS DOUBLE) AS fk_grade,
       206835*n_sents*n_words - 1015*n_words*n_words - 84600*n_syll*n_sents AS re_num,
       1000*n_sents*n_words AS re_den,
       CAST(206835*n_sents*n_words - 1015*n_words*n_words - 84600*n_syll*n_sents AS DOUBLE)
         / CAST(1000*n_sents*n_words AS DOUBLE) AS reading_ease
FROM b""",
        "mixture_allocation_documents": """
WITH per AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS w_sum FROM documents GROUP BY source
), t AS (
  SELECT *, CAST(sum(w_sum) OVER () AS BIGINT) AS tot FROM per
), q AS (
  SELECT source, w_sum,
         (10000 * w_sum) // tot AS base_alloc,
         (10000 * w_sum) % tot AS rem_num
  FROM t
), l AS (
  SELECT *, CAST(10000 - sum(base_alloc) OVER () AS BIGINT) AS leftover,
         row_number() OVER (ORDER BY rem_num DESC, source ASC) AS rk
  FROM q
)
SELECT source, w_sum, base_alloc, rem_num,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
FROM l""",
    }
