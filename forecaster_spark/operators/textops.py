"""Text analysis operators for training-data pipelines — all native
expressions (regex/array functions in codegen, no Python in the row path).

- language ID      : stopword-hit-ratio heuristic over a small per-language
                     lexicon (broadcast as literal arrays).
- quality scoring  : length / punctuation-ratio / stopword-ratio /
                     mean-word-length features + a composite score.
- token counting   : whitespace tokens + a BPE-ish regex segmentation count.
- fingerprinting   : bottom-k sketch of character k-gram rolling hashes
                     (winnowing-style content fingerprint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: THE engine-wide tokenizer whitespace class — the explicit spelling of
#: Java's ``\s`` ([ \t\n\x0B\f\r]), which RE2/DuckDB's ``\s`` does NOT match
#: (no U+000B). Every Spark-side split imports this; the DuckDB oracle SQL
#: strings carry the identical literal, enforced by
#: tests/test_contract_oracles.py::test_whitespace_class_consistency.
WS_CHARS = r" \t\n\x0B\f\r"
WS_SPLIT = rf"[{WS_CHARS}]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "des", "une", "dans"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "un", "por"],
}

BPE_ISH = rf"[A-Za-z]+|[0-9]|[^A-Za-z0-9{WS_CHARS}]"


def _words(text_col: str):
    return F.split(F.lower(F.col(text_col)), WS_SPLIT)


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Predict the language with the highest stopword hit-count; ties break
    by the fixed language order; 'und' (undetermined) when nothing hits."""
    words = _words(text_col)
    hits = {
        lang: F.size(F.array_intersect(F.array_distinct(words), F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    best = None
    for lang, h in hits.items():
        pair = F.struct(h.alias("n"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(h > best.getField("n"), pair).otherwise(best)
    return df.withColumn(
        out, F.when(best.getField("n") > 0, best.getField("lang")).otherwise(F.lit("und"))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + composite score in [0,1]: favors texts with a sane
    length, some stopwords, moderate punctuation, word lengths near prose."""
    t = F.col(text_col)
    words = _words(text_col)
    n_chars = F.length(t)
    n_words = F.size(words)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, rf"[^\w{WS_CHARS}]", ""))
    all_sw = sorted({w for sws in STOPWORDS.values() for w in sws})
    sw_hits = F.size(F.filter(words, lambda w: w.isin(*all_sw)))
    mean_wlen = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    sw_ratio = sw_hits / F.greatest(n_words, F.lit(1))
    len_score = F.least(n_words / F.lit(20.0), F.lit(1.0))
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (punct_ratio - 0.2) * 5.0))
    sw_score = F.least(sw_ratio * 5.0, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", sw_ratio)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn(
            "quality",
            (len_score * 0.3 + punct_score * 0.2 + sw_score * 0.3 + wlen_score * 0.2),
        )
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex segment count (letters runs,
    single digits, single punctuation — a proxy for subword token cost)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), WS_SPLIT))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0))
    return df.withColumn("n_tokens_ws", ws).withColumn("n_tokens_bpe", bpe)


def quality_funnel(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    max_mean_wlen: int = 8,
    max_word_len: int = 30,
    max_digit_pct: int = 20,
) -> DataFrame:
    """Staged quality-filter retention report (the C4/Gopher-style cleaning
    funnel): apply the filters cumulatively and report how many documents
    survive each stage — the number a curation run publishes next to every
    corpus release. Stages: word count ≥ ``min_words``; mean word length
    ≤ ``max_mean_wlen`` (as the integer test wchars ≤ max·wc — no float
    ratio); no token longer than ``max_word_len`` non-space chars; digit
    share ≤ ``max_digit_pct``% (100·ndig ≤ pct·wchars).

    Engine-added operator (the reference has no text machinery; its only
    cleaning is numeric backfill — Util/build_matrix.py:20-65).

    Scale shape: one scan, every flag row-local in codegen, one map-side-
    combinable global aggregate, 5-row output (stack of one agg row).
    All counts are exact integers — the DuckDB oracle matches bit-for-bit.

    Output: (stage_idx, stage, n_pass), cumulative.
    """
    # explicit whitespace class, NOT \s: Java's \s includes vertical tab
    # (U+000B), RE2's does not — \s-split counts diverge between the engines
    # on texts containing \x0B (found by the adversarial-text fuzz test).
    ws = WS_SPLIT
    t = F.trim(F.col(text_col))
    wc = F.size(F.split(t, ws))
    wchars = F.length(F.regexp_replace(t, ws, ""))
    ndig = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    c1 = wc >= min_words
    c2 = wchars <= max_mean_wlen * wc
    c3 = ~F.col(text_col).rlike(rf"[^{WS_CHARS}]{{%d}}" % (max_word_len + 1))
    c4 = 100 * ndig <= max_digit_pct * wchars

    def n(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    agg = df.agg(
        F.count(F.lit(1)).alias("n0"),
        n(c1).alias("n1"),
        n(c1 & c2).alias("n2"),
        n(c1 & c2 & c3).alias("n3"),
        n(c1 & c2 & c3 & c4).alias("n4"),
    )
    names = ["input", "min_words", "mean_word_len", "max_word_len", "digit_ratio"]
    stack = ", ".join(
        f"CAST({i} AS BIGINT), '{nm}', CAST(n{i} AS BIGINT)" for i, nm in enumerate(names)
    )
    return agg.selectExpr(f"stack(5, {stack}) AS (stage_idx, stage, n_pass)")


def quality_funnel_sql(
    min_words: int = 30,
    max_mean_wlen: int = 8,
    max_word_len: int = 30,
    max_digit_pct: int = 20,
    source_sql: str = "SELECT text FROM documents",
) -> str:
    """DuckDB oracle for :func:`quality_funnel`. Whitespace uses the
    explicit class ``[ \\t\\n\\x0B\\f\\r]`` on BOTH engines (Java ``\\s``
    includes U+000B, RE2 ``\\s`` does not); ``\\S``/``[0-9]`` agree."""
    return f"""
WITH src AS ({source_sql}),
f AS (SELECT len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS wc,
             length(regexp_replace(trim(text), '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS wchars,
             length(trim(text))
               - length(regexp_replace(trim(text), '[0-9]', '', 'g')) AS ndig,
             NOT regexp_matches(text, '[^ \\t\\n\\x0B\\f\\r]{{{max_word_len + 1}}}') AS ok_wlen
      FROM src),
c AS (SELECT wc >= {min_words} AS c1,
             wchars <= {max_mean_wlen} * wc AS c2,
             ok_wlen AS c3,
             100 * ndig <= {max_digit_pct} * wchars AS c4
      FROM f),
a AS (SELECT count(*) AS n0,
             CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN c1 AND c2 AND c3 AND c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM c)
SELECT stage_idx, stage, n_pass FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, 'input' AS stage, n0 AS n_pass FROM a
  UNION ALL SELECT 1, 'min_words', n1 FROM a
  UNION ALL SELECT 2, 'mean_word_len', n2 FROM a
  UNION ALL SELECT 3, 'max_word_len', n3 FROM a
  UNION ALL SELECT 4, 'digit_ratio', n4 FROM a)
ORDER BY stage_idx"""


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 8, keep: int = 4, out: str = "fingerprint"
) -> DataFrame:
    """Bottom-``keep`` sketch of character k-gram rolling hashes:
    near-identical texts share most sketch elements (winnowing-style
    fingerprint usable as a blocking/join key via explode).

    Runs as one Arrow kernel — splitmix64 of a polynomial rolling hash over
    the Unicode codepoints (UTF-32 decode, vectorized with numpy), bottom-k
    via partition. Codepoint arithmetic (not UTF-8 bytes) so DuckDB can
    recompute the sketch value-for-value (``xhash_sql.fingerprint_sql`` —
    the driver's oracle certifies this end-to-end). NULL text → NULL.
    (The expression form — transform(sequence) + substr + hash per gram —
    is interpreted, not codegen'd, and was ~5× slower.)"""
    from forecaster_spark.functions import xhash

    powers = xhash.pow_table(k)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sketch(texts: pd.Series) -> pd.Series:
        out_rows = np.empty(len(texts), dtype=object)
        for i, s in enumerate(texts):
            if s is None:
                out_rows[i] = None
                continue
            cps = xhash.codepoints(s.lower())
            n = len(cps)
            if n < k:
                g = np.array([cps.sum(dtype=np.uint64)], dtype=np.uint64)
            else:
                # g[i] = Σ_j cp[i+j]·C^(k-1-j), built by k strided adds
                g = np.zeros(n - k + 1, dtype=np.uint64)
                for j in range(k):
                    g += cps[j : n - k + 1 + j] * powers[k - 1 - j]
            g = xhash.splitmix64(g)
            u = np.unique(g)
            out_rows[i] = np.sort(u)[: min(keep, len(u))].view(np.int64)
        return pd.Series(out_rows)

    return df.withColumn(out, sketch(F.col(text_col)))


def bigram_collocations(df: DataFrame, text_col: str = "text", topk: int = 50) -> DataFrame:
    """Top-k adjacent word-pair collocations with the PMI ingredients
    (pair count + both unigram counts) — the collocation-extraction
    primitive for training-data vocab/phrase mining.

    Whitespace-lowercase tokens (Spark ``split`` ≡ DuckDB
    ``string_split_regex``; empties removed on BOTH engines via
    ``array_remove`` ≡ ``list_filter``), pairs via native ``slice`` +
    ``arrays_zip`` (no interpreted lambdas), all-integer counts so the
    result is engine-exact. The top-k pair table (tiny) joins the
    vocabulary-sized unigram table with the small side broadcast; the
    unigram aggregate itself is a map-side-combinable hash agg — linear
    corpus work, no all-pairs anywhere.

    Output: (w1, w2, pair_n, w1_n, w2_n), ties broken lexicographically."""
    ws = F.array_remove(F.split(F.lower(F.col(text_col)), WS_SPLIT), "")
    d = df.select(ws.alias("ws"))
    pairs = d.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, greatest(size(ws) - 1, 0))").alias("w1"),
                F.expr("slice(ws, 2, greatest(size(ws) - 1, 0))").alias("w2"),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    top_pairs = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .orderBy(F.desc("pair_n"), F.asc("w1"), F.asc("w2"))
        .limit(topk)
    )
    uni = d.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        F.broadcast(top_pairs)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("n", "w1_n"), "w1")
        .join(
            uni.withColumnRenamed("w", "w2").withColumnRenamed("n", "w2_n"), "w2"
        )
        .select("w1", "w2", "pair_n", "w1_n", "w2_n")
    )


def _adjacent_pairs(arr_col: str):
    """Explodable struct column ``p(l, r)`` of adjacent element pairs of an
    array column — the one BPE pair-semantics definition shared by the
    contract-surface count round and the iterated learner (a future change
    — e.g. Sennrich's ``</w>`` end-of-word marker — edits exactly one
    place)."""
    return F.explode(
        F.arrays_zip(
            F.expr(f"slice({arr_col}, 1, greatest(size({arr_col}) - 1, 0))").alias("l"),
            F.expr(f"slice({arr_col}, 2, greatest(size({arr_col}) - 1, 0))").alias("r"),
        )
    ).alias("p")


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w_len: float = 0.25,
    w_sw: float = 0.5,
    w_punct: float = -0.5,
    w_dig: float = -0.25,
    len_cap: int = 64,
    threshold: float = 0.25,
) -> DataFrame:
    """Linear quality-classifier scoring stage (r5, VERDICT #8): the
    fastText-style keep/toss scorer a curation pipeline runs after the
    hard funnel filters — a weighted combination of the corpus quality
    signals, producing a per-document score and verdict.

    Exactness discipline: every feature is an exact integer (word count,
    non-ws chars, stopword hits, punct chars via the EXPLICIT non-alnum
    class — never ``\\w``/``\\s``, the r4 divergence family; digit
    chars), every ratio is ONE IEEE division of exact small integers,
    ``len_cap`` is a power of two (exact division), all weights and the
    threshold are binary-exact literals (the ewma lesson), and the score
    is a fixed left-assoc chain — so the DOUBLE score itself is
    bit-identical cross-engine and the keep decision needs no margin
    analysis at all (unlike the cosine-threshold operators).

    Scale: one scan, all row-local codegen expressions except the
    stopword membership filter (interpreted array lambda over a ~40-word
    list — bounded per row), zero shuffles, zero joins.

    Output: (id_col, n_words, sw_hits, n_punct, n_digits, score, keep).
    """
    t = F.trim(F.col(text_col))
    words = F.array_remove(F.split(F.lower(t), WS_SPLIT), "")
    all_sw = sorted({w for sws in STOPWORDS.values() for w in sws})
    wc = F.size(words)
    nchars = F.length(t)
    npunct = nchars - F.length(F.regexp_replace(t, rf"[^A-Za-z0-9{WS_CHARS}]", ""))
    ndig = nchars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    sw_hits = F.size(F.filter(words, lambda w: w.isin(*all_sw)))
    len_r = F.least(wc, F.lit(len_cap)).cast("double") / F.lit(float(len_cap))
    sw_r = sw_hits.cast("double") / F.greatest(wc, F.lit(1)).cast("double")
    p_r = npunct.cast("double") / F.greatest(nchars, F.lit(1)).cast("double")
    d_r = ndig.cast("double") / F.greatest(nchars, F.lit(1)).cast("double")
    score = (
        (F.lit(w_len) * len_r + F.lit(w_sw) * sw_r) + F.lit(w_punct) * p_r
    ) + F.lit(w_dig) * d_r
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            id_col,
            wc.cast("long").alias("n_words"),
            sw_hits.cast("long").alias("sw_hits"),
            npunct.cast("long").alias("n_punct"),
            ndig.cast("long").alias("n_digits"),
            score.alias("score"),
            (score >= F.lit(threshold)).alias("keep"),
        )
    )


def quality_classifier_sql(
    w_len: float = 0.25,
    w_sw: float = 0.5,
    w_punct: float = -0.5,
    w_dig: float = -0.25,
    len_cap: int = 64,
    threshold: float = 0.25,
    source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB oracle for :func:`quality_classifier` — the identical
    integer features, division order, and left-assoc score chain, so the
    double score matches bit-for-bit."""
    from forecaster_spark.operators.textops import STOPWORDS as _SW

    all_sw = sorted({w for sws in _SW.values() for w in sws})
    sw_list = ", ".join(f"'{w}'" for w in all_sw)
    return f"""
WITH src AS (SELECT doc_id, trim(text) AS t
             FROM ({source_sql}) WHERE text IS NOT NULL),
f AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(t), '[{WS_CHARS}]+'), x -> x != '')) AS wc,
         length(t) AS nchars,
         length(t) - length(regexp_replace(t, '[^A-Za-z0-9{WS_CHARS}]', '', 'g')) AS npunct,
         length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS ndig,
         len(list_filter(list_filter(string_split_regex(lower(t), '[{WS_CHARS}]+'), x -> x != ''),
             x -> list_contains([{sw_list}], x))) AS swh
  FROM src
),
s AS (
  SELECT doc_id, wc, swh, npunct, ndig,
         (({w_len!r} * (CAST(least(wc, {len_cap}) AS DOUBLE) / {float(len_cap)!r})
           + {w_sw!r} * (CAST(swh AS DOUBLE) / CAST(greatest(wc, 1) AS DOUBLE)))
          + {w_punct!r} * (CAST(npunct AS DOUBLE) / CAST(greatest(nchars, 1) AS DOUBLE)))
         + {w_dig!r} * (CAST(ndig AS DOUBLE) / CAST(greatest(nchars, 1) AS DOUBLE)) AS score
  FROM f
)
SELECT doc_id, CAST(wc AS BIGINT) AS n_words, CAST(swh AS BIGINT) AS sw_hits,
       CAST(npunct AS BIGINT) AS n_punct, CAST(ndig AS BIGINT) AS n_digits,
       score, score >= {threshold!r} AS keep
FROM s"""


def bpe_merge_round(df: DataFrame, text_col: str = "text", topk: int = 20) -> DataFrame:
    """ONE exact BPE merge-count round over the corpus (Sennrich et al.
    2016, "Neural Machine Translation of Rare Words with Subword Units"):
    the adjacent-symbol pair counts that pick a byte-pair-encoding merge,
    starting from character symbols — the missing tokenizer-INDUCTION
    stage of the loader→tokenizer→pack chain (text_tokens consumes a
    vocabulary; this learns one).

    The classic scale trick IS the plan: the corpus collapses to the
    (word, freq) vocabulary first (one linear scan + hash agg — BPE rounds
    never touch the corpus again), pairs explode off the DISTINCT words
    weighted by freq (overlapping occurrences count, exactly Sennrich's
    get_stats), and the count agg is map-side combinable on a tiny
    (symbol, symbol) key space. All-integer counts, deterministic
    (pair_n desc, left asc, right asc) total order → engine-exact top-k.

    Output: (rnk, left_s, right_s, pair_n); rnk=1 is the round's merge."""
    from pyspark.sql import Window

    vf = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(F.array_remove(_words(text_col), "")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        vf.select("freq", F.split(F.col("w"), "").alias("cs"))
        .select("freq", _adjacent_pairs("cs"))
        .select(F.col("p.l").alias("left_s"), F.col("p.r").alias("right_s"), "freq")
    )
    agg = pairs.groupBy("left_s", "right_s").agg(F.sum("freq").alias("pair_n"))
    ordr = [F.desc("pair_n"), F.asc("left_s"), F.asc("right_s")]
    top = agg.orderBy(*ordr).limit(topk)  # TakeOrderedAndProject
    w = Window.orderBy(*ordr)
    out = top.select(F.row_number().over(w).alias("rnk"), "*")
    return out.select("rnk", "left_s", "right_s", "pair_n")


def bpe_merge_round_sql(
    topk: int = 20, doc_source_sql: str = "SELECT text FROM documents"
) -> str:
    """DuckDB oracle for :func:`bpe_merge_round`: same vocabulary collapse,
    per-position substr pairs off the distinct words, integer-weighted
    counts, identical total order."""
    return f"""
WITH w0 AS (SELECT list_filter(string_split_regex(lower(text), '[{WS_CHARS}]+'), x -> x != '') AS ws
            FROM ({doc_source_sql}) WHERE text IS NOT NULL),
wx AS (SELECT unnest(ws) AS w FROM w0),
vf AS (SELECT w, count(*) AS freq FROM wx GROUP BY w),
pr0 AS (SELECT w, freq, unnest(range(length(w) - 1)) AS i FROM vf),
pr AS (SELECT substr(w, CAST(i AS INT) + 1, 1) AS left_s,
              substr(w, CAST(i AS INT) + 2, 1) AS right_s, freq
       FROM pr0),
agg AS (SELECT left_s, right_s, CAST(sum(freq) AS BIGINT) AS pair_n FROM pr GROUP BY 1, 2),
top AS (SELECT * FROM agg ORDER BY pair_n DESC, left_s ASC, right_s ASC LIMIT {topk})
SELECT CAST(row_number() OVER (ORDER BY pair_n DESC, left_s ASC, right_s ASC) AS BIGINT) AS rnk,
       left_s, right_s, pair_n
FROM top"""


def bpe_learn(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Iterated BPE merge learning (pytest-certified vs the pure-Python
    Sennrich reference; the single-round ledger is the contract surface).

    Distributed shape per round: pair counts aggregate over the DISTRIBUTED
    (symbols, freq) vocab table (map-side combine), only the winning merge
    row is collected (1 row/round); the merge applies vocab-side in an
    Arrow kernel (left-to-right non-overlapping, Sennrich's merge order).
    ``localCheckpoint`` truncates the per-round plan — the iterative-Spark
    lineage trap. Corpus is touched exactly once."""
    vocab = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(F.array_remove(_words(text_col), "")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split(F.col("w"), "").alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select("freq", _adjacent_pairs("syms")).select(
            "p.l", "p.r", "freq"
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((left, right, n))

        def apply_merge(batches, _l=left, _r=right):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    s, res, i = list(syms), [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == _l and s[i + 1] == _r:
                            res.append(_l + _r)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"syms": out, "freq": pdf["freq"]})

        vocab = vocab.mapInPandas(
            apply_merge, schema="syms array<string>, freq long"
        ).localCheckpoint(eager=True)
    return merges


#: the r5 demo tokenizer: 10 merges learned from the sf0.01 corpus with
#: bpe_learn (count-desc/pair-asc tie-break) — frozen as literals so the
#: encode operator and its SQL mirror apply the IDENTICAL merge table
DEMO_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
]


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a learned BPE merge table — the encode half of tokenizer
    induction (GPT-2-style: per word, repeatedly merge the present pair
    with the LOWEST merge rank, all occurrences left-to-right
    non-overlapping, until no listed pair remains). Completes the
    induction (bpe_merge_round/bpe_learn) → application → packing chain.

    Certified output per doc: subword count + the reference polynomial
    checksum ``Σ tok_i·31^(n−1−i) mod 2^64`` over the flattened subword
    token stream (tok = splitmix64 word-hash of the subword string mod
    2^31 — the same token derivation the north-rule corpus invariant
    uses), so the oracle certifies the exact token SEQUENCE, not just
    counts.

    Scale shape: one Arrow scan; encoding is memoized per DISTINCT word
    within each batch (the classic BPE-encode cache — corpus token cost
    collapses to vocabulary cost), checksum folded in wrap-native uint64
    numpy. No shuffle at all."""
    if merges is None:
        merges = DEMO_MERGES
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}

    out_t = T.StructType(
        [
            T.StructField("n_words", T.LongType()),
            T.StructField("n_subwords", T.LongType()),
            T.StructField("bpe_checksum", T.LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def enc(words_s: pd.Series) -> pd.DataFrame:
        from forecaster_spark.functions import xhash

        memo: dict[str, list[str]] = {}

        def encode(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w)
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                l, rr = merges[best]
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                        res.append(l + rr)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            memo[w] = syms
            return syms

        rows = words_s.to_numpy()
        n = len(rows)
        seqs: list[list[str]] = []
        n_words = np.zeros(n, np.int64)
        isnull = np.zeros(n, bool)
        for i, ws in enumerate(rows):
            if ws is None:
                isnull[i] = True
                seqs.append([])
            else:
                n_words[i] = len(ws)
                flat: list[str] = []
                for w in ws:
                    flat.extend(encode(w))
                seqs.append(flat)
        lens = np.fromiter((len(s) for s in seqs), np.int64, count=n)
        all_syms: list[str] = [s for seq in seqs for s in seq]
        toks = xhash.word_hash_flat(all_syms) & np.uint64((1 << 31) - 1)
        ends = np.cumsum(lens)
        starts = ends - lens
        max_n = int(lens.max()) if n else 1
        pow31 = np.array(
            [pow(31, j, 1 << 64) for j in range(max(max_n, 1))], dtype=np.uint64
        )
        rank_in_doc = np.arange(len(toks), dtype=np.int64) - np.repeat(starts, lens)
        expo = np.repeat(lens, lens) - 1 - rank_in_doc
        term = toks * pow31[expo] if len(toks) else np.empty(0, np.uint64)
        csum = np.concatenate(([np.uint64(0)], np.cumsum(term, dtype=np.uint64)))
        sums = (csum[ends] - csum[starts]).astype(np.uint64).view(np.int64)
        out = pd.DataFrame(
            {"n_words": n_words, "n_subwords": lens, "bpe_checksum": sums}
        )
        for c in out.columns:
            out[c] = out[c].astype(object)
            out.loc[isnull, c] = None
        return out

    res = df.withColumn("_enc", enc(_words(text_col)))
    return (
        res.where(F.col(text_col).isNotNull())
        .select(
            id_col,
            F.col("_enc.n_words").alias("n_words"),
            F.col("_enc.n_subwords").alias("n_subwords"),
            F.col("_enc.bpe_checksum").alias("bpe_checksum"),
        )
    )


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document — the
    boilerplate/degenerate-text filter stage of a training-data pipeline
    (Rae et al. 2021 §A1.1 use duplicate-n-gram fractions to drop
    auto-generated and template pages; word/bigram variants here since the
    synthetic corpus is single-line).

    Signals (all exact-integer ingredients; the fractions are single IEEE
    divisions of exact small integers, bit-identical cross-engine):
      - ``n_words`` / ``n_distinct_words`` / ``dup_word_frac``
        = (n_words - n_distinct) / n_words
      - ``top_word_n`` / ``top_word_frac`` — mass of the modal word
      - ``n_bigrams`` / ``n_distinct_bigrams`` / ``dup_bigram_frac``
      - ``top_bigram_n`` / ``top_bigram_frac`` — mass of the modal
        adjacent pair (the rep-2-gram signal)
    Tokens: lowercase whitespace split with empties removed (the
    certified cross-engine tokenization, cf. bigram_collocations).
    Documents with zero words keep a row (zero counts, null fractions);
    single-word docs have null bigram fractions.

    Plan shape: two explode→hash-agg chains (word level, pair level),
    each map-side combinable with (id, token) keys — corpus-linear, no
    all-pairs, no Python; the two per-doc stat tables join back on the
    id (same-key shuffles, AQE-coalesced).

    Output: one row per input document."""
    ws = F.array_remove(F.split(F.lower(F.col(text_col)), WS_SPLIT), "")
    d = df.select(id_col, ws.alias("ws"))
    word_stats = (
        d.select(id_col, F.explode("ws").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.max("n").alias("top_word_n"),
        )
    )
    pair_stats = (
        d.select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, greatest(size(ws) - 1, 0))").alias("w1"),
                    F.expr("slice(ws, 2, greatest(size(ws) - 1, 0))").alias("w2"),
                )
            ).alias("p"),
        )
        .groupBy(id_col, "p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            F.max("n").alias("top_bigram_n"),
        )
    )
    z = F.lit(0).cast("long")
    frac = lambda num, den: F.when(den > 0, num.cast("double") / den.cast("double"))
    out = (
        df.select(id_col)
        .join(word_stats, id_col, "left")
        .join(pair_stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", z).alias("n_words"),
            F.coalesce("n_distinct_words", z).alias("n_distinct_words"),
            F.coalesce("top_word_n", z).alias("top_word_n"),
            F.coalesce("n_bigrams", z).alias("n_bigrams"),
            F.coalesce("n_distinct_bigrams", z).alias("n_distinct_bigrams"),
            F.coalesce("top_bigram_n", z).alias("top_bigram_n"),
        )
    )
    nw, nb = F.col("n_words"), F.col("n_bigrams")
    return (
        out.withColumn("dup_word_frac", frac(nw - F.col("n_distinct_words"), nw))
        .withColumn("top_word_frac", frac(F.col("top_word_n"), nw))
        .withColumn("dup_bigram_frac", frac(nb - F.col("n_distinct_bigrams"), nb))
        .withColumn("top_bigram_frac", frac(F.col("top_bigram_n"), nb))
    )


def simpson_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverse-Simpson lexical diversity per document — the log-free
    entropy analogue (Rényi-2 / "effective vocabulary size"): with word
    counts c_i and n = Σc_i, collision mass = Σc_i² and inv_simpson =
    n²/Σc_i² ∈ [1, n_distinct]. A diversity filter complementing the
    Gopher repetition fractions: those flag the MODAL word/bigram, this
    scores the whole distribution — and unlike Shannon entropy it needs
    NO logarithm, so every ingredient is an exact integer and the final
    score is one IEEE division of exact ints (cross-engine ``ln`` is not
    correctly-rounded-guaranteed; n ≤ 2^26 keeps n² < 2^53).

    Tokens: lowercase whitespace split with empties removed (the
    certified cross-engine tokenization). Empty documents keep a row with
    null diversity.

    Plan shape: one explode→hash-agg chain, map-side combinable on
    (id, word) — corpus-linear. Output: (doc_id, n_words,
    n_distinct_words, collision_mass, inv_simpson)."""
    ws = F.array_remove(F.split(F.lower(F.col(text_col)), WS_SPLIT), "")
    stats = (
        df.select(id_col, F.explode(ws).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum(F.col("n") * F.col("n")).alias("collision_mass"),
        )
    )
    out = df.select(id_col).join(stats, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_distinct_words", F.lit(0)).alias("n_distinct_words"),
        F.coalesce("collision_mass", F.lit(0)).alias("collision_mass"),
        (
            (F.col("n_words") * F.col("n_words")).cast("double")
            / F.col("collision_mass").cast("double")
        ).alias("inv_simpson"),
    )


def text_tokens(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic tokenizer producing the north-rule corpus shape
    ``(doc_id, tokens array<int32>, n_tok)`` from raw text: token_i =
    word_hash(word_i) mod 2^31 over the whitespace split (empties
    included — Spark ``split`` ≡ DuckDB ``string_split_regex``), using the
    cross-engine splitmix64 word hashes, so the DuckDB oracle re-derives
    the SAME token arrays symbol-for-symbol. Combined with the reference
    polynomial checksum (:func:`~forecaster_spark.operators.seriesify.token_checksum_fast`)
    this puts the input_hint's per-row token-array-equality invariant in
    the driver's hard gate, not just pytest.

    Plan: narrow map, one Arrow kernel per batch (flat-vectorized word
    hashing, no per-word Python), no shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    from forecaster_spark.functions import xhash

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _tokens(words: pd.Series) -> pd.Series:
        import numpy as np

        arrs = words.to_numpy()
        n = len(arrs)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(a) for a in arrs), np.int64, count=n)
        flat = [w for a in arrs for w in a]
        hs = xhash.word_hash_flat(flat)
        toks = (hs % np.uint64(1 << 31)).astype(np.int32)
        ends = np.cumsum(lens)
        starts = ends - lens
        return pd.Series(
            [toks[s:e] for s, e in zip(starts, ends)], dtype=object
        )

    w = F.split(F.lower(F.col(text_col)), WS_SPLIT)
    out = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), _tokens(w).alias("tokens")
    )
    return out.withColumn("n_tok", F.size("tokens"))


def tfidf_topk(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Per-document top-k keywords by TF-IDF — the classic keyword-extraction
    primitive of a training-data pipeline (reference has no text layer; this
    extends the engine's corpus-stats family).

    The score is the LOG-FREE form ``tf · N / df`` (rank-equivalent to
    ``tf · log(N/df)`` per document when df varies — and ``ln`` is not
    bit-reproducible cross-engine, while this is ONE correctly-rounded
    division of exact integers). Ties (same score within a doc) break on
    the term string ascending, so ranks are engine-independent.

    Tokens: lowercase whitespace split with empties removed (the proven
    Spark ``split``/``array_remove`` ≡ DuckDB ``string_split_regex``/
    ``list_filter`` alignment). Plan: explode → (doc, term) count (one
    shuffle), document frequency over the tf table (second shuffle, partial
    aggs), corpus size as a 1-row broadcast, top-k via a doc-partitioned
    window. No driver-side collection; every stage is hash-aggregate +
    shuffle-join shaped at 100 TB.

    Output: (doc_id, term, tf, df, score, rnk ≤ k)."""
    from pyspark.sql import Window

    ws = F.array_remove(F.split(F.lower(F.col(text_col)), WS_SPLIT), "")
    tok = docs.select("doc_id", F.explode(ws).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    s = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", (F.col("tf") * F.col("_n")).cast("double") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def vocab_stats(df: DataFrame, text_col: str = "text", group_col: str = "lang") -> DataFrame:
    """Corpus vocabulary profile per group: vocabulary size, total tokens,
    hapax legomena (words seen exactly once) and dis legomena (exactly
    twice) counts — the standard corpus-quality / Zipf-tail diagnostics a
    training-data pipeline tracks per source or language shard (a corpus
    whose hapax share collapses is template/boilerplate-heavy; one whose
    hapax share explodes is OCR noise).

    Tokenization matches the engine-wide whitespace convention
    (``split(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')`` ≡ DuckDB
    ``string_split_regex`` — both keep a single empty token for empty
    text, counted identically on both engines).  ``hapax_ppm`` is the
    exact floor ``(1_000_000*n_hapax) div vocab``.

    Plan: explode → two hash aggregates (word freq, then freq profile),
    each with map-side partials.  The word-keyed shuffle is the classic
    heavy-hitter skew point at 100 TB — stopword keys dominate; AQE skew
    split handles the agg because partial aggregation already collapses
    per-mapper duplicates (no all-rows-of-one-word-on-one-task stage
    exists in a two-phase hash agg).

    Output: (group, vocab, total_tokens, n_hapax, n_dis, hapax_ppm).
    """
    words = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT)).alias("w"),
    )
    freq = words.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("f"))
    return freq.groupBy("grp").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("f").alias("total_tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).alias("n_dis"),
    ).select(
        F.col("grp").alias(group_col),
        "vocab",
        "total_tokens",
        "n_hapax",
        "n_dis",
        F.expr("(1000000 * n_hapax) div vocab").alias("hapax_ppm"),
    )


def gini_concentration(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gini coefficient of a nonnegative integer size column per group —
    the corpus-concentration diagnostic (is one source's token budget
    dominated by a few huge documents?) that decides between doc-level and
    chunk-level sampling in a training-data pipeline. Standard rank form
    (Lorenz-curve): G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x)), x
    ascending. The sum is invariant to order WITHIN tied values, so any
    deterministic tie-break yields the same integers.

    All-BIGINT numerator/denominator; the reported coefficient is ppm-
    quantized by integer division (exact, never floats). Bound:
    n^2*max(x)*1e6 < 2^63 → n <= ~40M docs/group at x <= 5e3; beyond that,
    compute on a stratified sample. One rank window + one agg on the same
    shuffle. Output: (group, n, sum_x, gini_ppm)."""
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.withColumn("_i", F.row_number().over(w).cast("long")).withColumn(
        "_x", F.col(value_col).cast("long")
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sum_x"),
        F.sum(F.col("_i") * F.col("_x")).alias("_six"),
    )
    return agg.select(
        group_col,
        "n",
        "sum_x",
        F.expr("((2 * _six - (n + 1) * sum_x) * 1000000) div (n * sum_x)").alias(
            "gini_ppm"
        ),
    )


# --- PII detection / redaction ------------------------------------------

# Explicit character classes only — these parse and match identically under
# Java regex (Spark) and RE2 (DuckDB); no \d / \s / \b shorthands, whose
# definitions diverge between the engines (see quality_funnel's \s note).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_IPV4 = r"[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PII_PHONE = r"[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction (the scrubbing stage every training-data
    pipeline runs before tokenization): replace e-mail addresses, IPv4
    addresses and phone numbers with typed placeholder tokens and report
    per-document match counts.

    Engine-added operator (the reference has no text machinery). Public
    precedent: C4/RefinedWeb/Dolma-style PII scrubbers (regex classes for
    email/IP/phone → placeholder tokens).

    Order matters and is part of the contract: e-mails first (their
    domains contain dots and digits an IP/phone pattern could clip),
    then IPv4, then phone. The same order is baked into
    :func:`pii_redact_sql`.

    Scale shape: purely row-local JVM regex in whole-stage codegen — no
    shuffle, no UDF; a 100-TB scrub is exactly one scan + one write, and
    filters/projections around it still push down to the parquet scan.

    Output: input columns + (n_email, n_ip, n_phone, redacted).
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return (
        df.withColumn("n_email", F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).cast("long"))
        .withColumn("n_ip", F.size(F.regexp_extract_all(F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), F.lit(PII_IPV4), F.lit(0))).cast("long"))
        .withColumn("n_phone", F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).cast("long"))
        .withColumn("redacted", red)
    )


def pii_redact_sql(source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB oracle for :func:`pii_redact` — same patterns, same
    replacement order; ``'g'`` flags mirror Spark's global-by-default
    ``regexp_replace``. IP counting runs on the email-redacted text on both
    engines so an address embedded in an e-mail domain is never
    double-counted."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
    ipv4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
    phone = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    return f"""
WITH src AS ({source_sql}),
e AS (SELECT *, regexp_replace(text, '{email}', '<EMAIL>', 'g') AS no_email FROM src)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(no_email, '{ipv4}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phone,
       regexp_replace(regexp_replace(no_email, '{ipv4}', '<IP>', 'g'),
                      '{phone}', '<PHONE>', 'g') AS redacted
FROM e"""


def tokenizer_fertility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language tokenizer fertility profile — the compression-quality
    numbers every tokenizer report publishes (chars per token and subword
    tokens per word, cf. the SentencePiece / multilingual-fertility
    literature): languages a tokenizer segments poorly cost more sequence
    budget per character, which directly skews mixture weights at
    pretraining scale.

    Uses the engine's two token counters (whitespace words + the BPE-ish
    regex proxy): per language, exact BIGINT sums of codepoints, words and
    subword segments; ``chars_per_tok = sum_chars / sum_bpe`` and
    ``toks_per_word = sum_bpe / sum_ws`` are the only divisions (each a
    single correctly-rounded IEEE op, cross-engine bit-exact).

    Plan shape: row-local codegen counting (no explode — the regex counts
    come from ``regexp_extract_all`` sizes), one hash aggregate with
    map-side partials on the tiny language key.  Corpus-linear, zero
    shuffle beyond the final 10-ish-row aggregate.

    Output: (lang, n_docs, sum_chars, sum_ws, sum_bpe, chars_per_tok,
    toks_per_word).
    """
    c = with_token_counts(df, text_col)
    ag = c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(F.col(text_col)).cast("long")).cast("long").alias("sum_chars"),
        F.sum(F.col("n_tokens_ws").cast("long")).cast("long").alias("sum_ws"),
        F.sum(F.col("n_tokens_bpe").cast("long")).cast("long").alias("sum_bpe"),
    )
    return ag.select(
        "lang",
        "n_docs",
        "sum_chars",
        "sum_ws",
        "sum_bpe",
        F.when(
            F.col("sum_bpe") > 0, F.col("sum_chars").cast("double") / F.col("sum_bpe").cast("double")
        ).alias("chars_per_tok"),
        F.when(
            F.col("sum_ws") > 0, F.col("sum_bpe").cast("double") / F.col("sum_ws").cast("double")
        ).alias("toks_per_word"),
    )


def bigram_fluency(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document fluency under the corpus's own MLE bigram language
    model: mean over the document's bigrams of P(b|a) = c(a,b) / c(a,·) —
    the model-based complement of the heuristic quality signals
    (boilerplate scores high: its bigrams are corpus-frequent; garbled
    text scores near zero). The classic KenLM-perplexity filter uses mean
    LOG-prob; ``log`` is not bit-reproducible cross-engine, so the engine
    scores mean probability in ppm — rank-usable the same way and exact.

    Exactness: each conditional probability is ONE correctly-rounded
    division of exact integer counts, floored at ppm
    (``floor((1e6·c_ab)/c_a)``, exact while c(a,b) < 2^53/10^6 ≈ 9·10^9 —
    beyond that, sample the LM counts); per-doc terms are then exact
    integers summed order-free (no float-order hazard), and the mean is a
    single IEEE division. Tokens are the north-rule deterministic word
    hashes (:func:`text_tokens`), so the DuckDB oracle re-derives the
    identical bigram keys.

    Plan shape: bigrams come from ``arrays_zip`` of two narrow array
    slices (no per-doc window, no shuffle), deduped per (doc, bigram) with
    a multiplicity BEFORE the count joins; corpus bigram/prefix counts are
    two hash aggregates; the two count joins are shuffle hash joins on the
    bigram/prefix keys (hot prefixes skew → AQE skew-join splits them).
    Everything is linear in corpus size; no driver-side state.

    Output: (doc_id, n_bigrams, flu_sum_ppm, fluency_ppm)."""
    t = text_tokens(df, text_col, id_col).where(F.col("n_tok") >= 2)
    b = (
        t.withColumn("_pre", F.expr("slice(tokens, 1, n_tok - 1)"))
        .withColumn("_suc", F.expr("slice(tokens, 2, n_tok - 1)"))
        .select(id_col, F.explode(F.arrays_zip("_pre", "_suc")).alias("bg"))
        .select(
            id_col,
            (
                F.col("bg._pre").cast("long") * F.lit(1 << 31).cast("long")
                + F.col("bg._suc").cast("long")
            ).alias("key"),
        )
    )
    db = b.groupBy(id_col, "key").agg(F.count(F.lit(1)).alias("m"))
    cab = b.groupBy("key").agg(F.count(F.lit(1)).alias("cab"))
    ca = (
        b.withColumn("a", F.expr(f"key div {1 << 31}"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    term = (
        db.withColumn("a", F.expr(f"key div {1 << 31}"))
        .join(cab, "key")
        .join(ca, "a")
        .withColumn(
            "t",
            F.floor(
                (F.lit(1000000.0) * F.col("cab").cast("double"))
                / F.col("ca").cast("double")
            ),
        )
    )
    out = term.groupBy(id_col).agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("t")).cast("long").alias("flu_sum_ppm"),
    )
    return out.withColumn(
        "fluency_ppm",
        F.col("flu_sum_ppm").cast("double") / F.col("n_bigrams").cast("double"),
    )


def trending_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    snapshots: int = 8,
    min_total: int = 5,
    k: int = 15,
) -> DataFrame:
    """Trending tokens across crawl snapshots: assign each document to a
    deterministic snapshot ``d = doc_id % snapshots`` (the arithmetic
    stand-in for a crawl date — order/cluster-size invariant), count each
    word per snapshot, and rank words by the EXACT OLS slope of their
    count-vs-snapshot series — the crawl-drift monitor a training-data
    pipeline runs between dumps (a token whose frequency ramps across
    snapshots is an emerging topic / template; one that collapses is a
    de-listed boilerplate source).

    Exact integer core: over the fixed grid d = 0..D-1 with missing
    snapshots contributing c_d = 0, the slope numerator
    ``num = D*sum(d*c_d) - (sum d)*(sum c_d)`` needs only the OBSERVED
    (word, snapshot) rows — zero days add zero to both sums, so the
    D-complete grid never materializes (the Croston trick on the token
    axis). The denominator ``den = D*sum(d^2) - (sum d)^2`` is a positive
    constant, so ranking by ``num`` IS ranking by slope; the reported
    ``slope`` is the single IEEE division num/den of exact BIGINTs
    (cross-engine bit-exact). Bound: num <= D^2 * total_count < 2^53 for
    any real corpus shard at D = 8.

    Plan shape (100-TB lens): explode -> two-phase hash aggregate on
    (word, snapshot) with map-side partials (stopword heavy hitters
    collapse per-mapper, the vocab_stats argument) -> per-word hash
    aggregate -> min_total filter -> two TakeOrderedAndProject top-k
    limits (rising: num DESC, falling: num ASC; word-asc tie-break) --
    no window over the full vocabulary, no join.

    Output: (direction, w, n_total, slope_num, slope) -- k rows each for
    'rising' and 'falling'.
    """
    D = int(snapshots)
    sum_d = D * (D - 1) // 2
    sum_d2 = (D - 1) * D * (2 * D - 1) // 6
    den = D * sum_d2 - sum_d * sum_d
    words = df.select(
        (F.col(id_col) % D).cast("long").alias("d"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT)).alias("w"),
    )
    per_snap = words.groupBy("w", "d").agg(F.count(F.lit(1)).alias("c"))
    per_word = (
        per_snap.groupBy("w")
        .agg(
            F.sum("c").cast("long").alias("n_total"),
            F.sum(F.col("d") * F.col("c")).cast("long").alias("dc"),
        )
        .where(F.col("n_total") >= min_total)
        .select(
            "w",
            "n_total",
            (F.lit(D) * F.col("dc") - F.lit(sum_d) * F.col("n_total"))
            .cast("long")
            .alias("slope_num"),
        )
    )
    rising = (
        per_word.orderBy(F.col("slope_num").desc(), F.col("w").asc())
        .limit(k)
        .select(F.lit("rising").alias("direction"), "w", "n_total", "slope_num")
    )
    falling = (
        per_word.orderBy(F.col("slope_num").asc(), F.col("w").asc())
        .limit(k)
        .select(F.lit("falling").alias("direction"), "w", "n_total", "slope_num")
    )
    return rising.unionAll(falling).withColumn(
        "slope", F.col("slope_num").cast("double") / F.lit(float(den))
    )


def readability(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Flesch-Kincaid grade + Flesch reading-ease per document (Kincaid et
    al. 1975), the classic readability filters in web-corpus curation
    (e.g. C4/Gopher-style quality gates keep a grade band).

    Counting conventions, chosen to be cross-engine exact:
    words      = whitespace tokens of trim(text) (split keep-empty
                 semantics; all-whitespace text counts 1);
    sentences  = max(1, number of ``[.!?]+`` runs);
    syllables  = number of ``[aeiouy]+`` runs in lower(text) — the vowel-
                 group heuristic applied to the whole text (word
                 boundaries break runs anyway; vowel-less tokens
                 contribute 0, no per-word max(1,·) guard).

    Exactness: the published formulas are decimal-coefficient rational
    functions of (W, S, Y); both metrics reduce to ONE IEEE division of
    exact BIGINTs —
      grade·100·S·W = 39·W² + 1180·Y·S − 1559·S·W
      ease·1000·S·W = 206835·S·W − 1015·W² − 84600·Y·S
    so `fk_grade = fk_num/fk_den` is correctly rounded on both engines
    (single-division rule, CLAUDE.md); numerators stay ≪ 2^53 for any
    real document. All counting is native regexp codegen — no Python, no
    shuffle, embarrassingly row-parallel at corpus scale.

    Output: (id_col, n_words, n_sents, n_syll, fk_num, fk_den, fk_grade,
    re_num, re_den, reading_ease).
    """
    t = F.col(text_col)
    W_ = F.size(F.split(F.trim(t), WS_SPLIT)).cast("long")
    S_ = F.greatest(F.lit(1), F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0))).cast("long")
    Y_ = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), 0)).cast("long")
    b = (
        df.where(t.isNotNull())
        .select(F.col(id_col), W_.alias("n_words"), S_.alias("n_sents"), Y_.alias("n_syll"))
    )
    w, s, y = F.col("n_words"), F.col("n_sents"), F.col("n_syll")
    fk_num = F.lit(39) * w * w + F.lit(1180) * y * s - F.lit(1559) * s * w
    fk_den = F.lit(100) * s * w
    re_num = F.lit(206835) * s * w - F.lit(1015) * w * w - F.lit(84600) * y * s
    re_den = F.lit(1000) * s * w
    return b.select(
        id_col,
        "n_words",
        "n_sents",
        "n_syll",
        fk_num.alias("fk_num"),
        fk_den.alias("fk_den"),
        (fk_num.cast("double") / fk_den.cast("double")).alias("fk_grade"),
        re_num.alias("re_num"),
        re_den.alias("re_den"),
        (re_num.cast("double") / re_den.cast("double")).alias("reading_ease"),
    )


def winnowing_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Positional winnowing fingerprint (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): slide a window of ``w`` consecutive
    word-``k``-shingle hashes per document and record the minimum of each
    window; the distinct selected (position, hash) pairs are the
    fingerprint. Guarantee: any shared run of ≥ w+k−1 words between two
    documents shares at least one fingerprint entry — the local-maximality
    property that bottom-k sketches (:func:`with_fingerprint`) lack.

    Tie rule (cross-engine determinism): each window selects the
    lexicographically minimal (hash, position) pair — the SQL mirror takes
    ``min(sh·2^32 + wpos)`` over the window frame, the kernel's
    ``np.argmin`` first-occurrence over uint64 is the same choice. Docs
    with < k words emit no rows (winnowing needs ≥ 1 shingle; the
    short-doc combine path belongs to set sketches, not positional ones).

    Plan shape: split native, then ONE Arrow kernel per batch over the
    flat shingle-hash stream (same construction as ``word_shingles``),
    sliding-window argmin vectorized batch-wide by padding row boundaries
    with 2^64−1 sentinels (a sentinel never beats a real value — argmin's
    first-occurrence rule breaks the all-ties case toward the real
    element). Zero shuffles; row-parallel at any corpus size.

    Output: (id_col, pos, h) — pos is the selected shingle's word-start
    index, h the selected shingle hash as int64.
    """
    from forecaster_spark.functions import xhash

    powers = xhash.pow_table(k)
    pad = w - 1
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("pos", T.LongType()),
            T.StructField("h", T.LongType()),
        ]
    )

    def gen(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids_all = pdf["_id"].to_numpy()
            rows = pdf["_ws"].to_numpy()
            nz = [i for i, ws in enumerate(rows) if ws is not None and len(ws) >= k]
            if not nz:
                yield pd.DataFrame({"doc_id": [], "pos": [], "h": []}).astype(np.int64)
                continue
            ids = ids_all[nz].astype(np.int64)
            lens = np.fromiter((len(rows[i]) for i in nz), np.int64, count=len(nz))
            flat_words: list[str] = []
            for i in nz:
                flat_words.extend(rows[i])
            flat = xhash.word_hash_flat(flat_words)
            # rolling k-gram combine over the flat word-hash stream
            g = np.zeros(len(flat) - (k - 1), dtype=np.uint64)
            for j in range(k):
                g += flat[j : len(flat) - (k - 1) + j] * powers[j]
            g = xhash.splitmix64(g)
            ends = np.cumsum(lens)
            starts = ends - lens
            row_of = np.repeat(np.arange(len(nz), dtype=np.int64), lens)[: len(g)]
            off = np.arange(len(g), dtype=np.int64) - starts[row_of]
            valid = off <= (lens[row_of] - k)
            rowv, gv, offv = row_of[valid], g[valid], off[valid]
            mg = lens - (k - 1)  # shingles per kept row (all ≥ 1)
            # sentinel-padded flat stream: row i owns [pstart[i], pstart[i]+mg[i])
            pstart = np.concatenate(([0], np.cumsum(mg + pad)))[:-1]
            padded = np.full(int((mg + pad).sum()), np.uint64(0xFFFFFFFFFFFFFFFF))
            padded[pstart[rowv] + offv] = gv
            windows = sliding_window_view(padded, w)
            n_starts = np.where(mg >= w, mg - w + 1, 1)
            rep = np.repeat(np.arange(len(nz), dtype=np.int64), n_starts)
            local = np.arange(len(rep), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(n_starts)))[:-1], n_starts
            )
            gstart = pstart[rep] + local
            am = np.argmin(windows[gstart], axis=1)
            sel = gstart + am
            hv = padded[sel]
            posv = sel - pstart[rep]
            # distinct (row, pos) — identical pos implies identical hash
            order = np.lexsort((posv, rep))
            rep, posv, hv = rep[order], posv[order], hv[order]
            keep = np.ones(len(rep), bool)
            keep[1:] = (rep[1:] != rep[:-1]) | (posv[1:] != posv[:-1])
            yield pd.DataFrame(
                {
                    "doc_id": ids[rep[keep]],
                    "pos": posv[keep],
                    "h": hv[keep].view(np.int64),
                }
            )

    src = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("_id"),
        F.split(F.lower(F.col(text_col)), WS_SPLIT).alias("_ws"),
    )
    return src.mapInPandas(gen, out_schema)


def winnowing_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near-duplicate pairs from shared winnowing fingerprints — the MOSS
    pairing step on top of :func:`winnowing_fingerprint`: documents
    sharing ≥ ``min_shared`` selected fingerprint hashes are candidate
    plagiarism/boilerplate pairs, scored by fingerprint-set Jaccard and
    the two asymmetric CONTAINMENT ratios (ns/|fp_a|, ns/|fp_b| — the
    signal that catches "A is a chunk of B", which symmetric Jaccard
    dilutes). Winnowing's guarantee makes this positional: any shared
    run of ≥ w+k−1 words forces a shared hash.

    Scale shape: distinct (doc, hash) entries shuffle ONCE onto the hash;
    buckets larger than ``bucket_cap`` docs (hot boilerplate) are DROPPED
    before pairing — the stop-shingle cut that bounds within-bucket
    fanout at C(cap, 2); pair generation is collect_list-per-bucket +
    within-bucket explode (one shuffle, no self-join re-execution —
    CLAUDE.md's measured pattern). The pair-expansion lambda is
    interpreted, not codegen, but runs on ≤``bucket_cap`` arrays.
    Fingerprint-set sizes count ALL entries including dropped buckets
    (the standard estimate under hot-bucket pruning; mirrored by the
    oracle).

    Output: (id_a, id_b, n_shared, fp_a, fp_b, jac, cont_a, cont_b) —
    jac/cont are single divisions of exact BIGINTs.
    """
    fp = winnowing_fingerprint(df, text_col, id_col, k, w).select("doc_id", "h").distinct()
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    buckets = fp.groupBy("h").agg(F.collect_list("doc_id").alias("ids")).where(
        (F.size("ids") >= 2) & (F.size("ids") <= bucket_cap)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(ids)-2), i -> "
                "transform(sequence(i+1, size(ids)-1), j -> "
                "struct(least(ids[i], ids[j]) AS ia, greatest(ids[i], ids[j]) AS ib))))"
            )
        ).alias("p")
    ).select("p.ia", "p.ib")
    ag = (
        pairs.groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("ia"), F.col("c").alias("fp_a"))
    sb = sizes.select(F.col("doc_id").alias("ib"), F.col("c").alias("fp_b"))
    ns = F.col("n_shared").cast("double")
    return (
        ag.join(sa, "ia")
        .join(sb, "ib")
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            "n_shared",
            "fp_a",
            "fp_b",
            (ns / (F.col("fp_a") + F.col("fp_b") - F.col("n_shared")).cast("double")).alias("jac"),
            (ns / F.col("fp_a").cast("double")).alias("cont_a"),
            (ns / F.col("fp_b").cast("double")).alias("cont_b"),
        )
    )


def rake_keywords(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 30) -> DataFrame:
    """RAKE corpus keywords (Rose et al. 2010, Rapid Automatic Keyword
    Extraction — word-level scores): candidate phrases are maximal runs
    of non-stopword tokens (the engine's multilingual stopword lexicon
    delimits runs); each word scores ``deg/freq`` where ``freq`` counts
    its occurrences in candidate phrases and ``deg`` sums the lengths of
    the phrases containing it — long-phrase membership boosts a word, the
    RAKE degree heuristic. Top-``k`` by (score desc, word asc).

    Simplification vs classic RAKE (documented, determinism-first):
    punctuation is stripped by the token split rather than acting as a
    phrase boundary, so runs break at stopwords only. Exactness: freq/deg
    are exact BIGINTs, score is ONE IEEE division, the ordering compares
    identical doubles on both engines.

    Plan: one posexplode, a per-doc running-sum window (partitioned by
    doc — row-local scale), one (doc, run) phrase-length agg joined back
    on its own grouping keys (exchange-reused), one word agg, one top-k
    TakeOrderedAndProject. No Python anywhere.

    Output: (w, freq, deg, score).
    """
    sw = sorted({w for sws in STOPWORDS.values() for w in sws})
    t = F.col(text_col)
    words = (
        df.where(t.isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.lower(t), r"[^a-z0-9]+")).alias("pos", "w"),
        )
        .where(F.col("w") != "")
    )
    wn = words.withColumn("stp", F.col("w").isin(sw).cast("int"))
    win = Window.partitionBy("_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    runs = wn.withColumn("run", F.sum("stp").over(win)).where(F.col("stp") == 0)
    ph = runs.groupBy("_id", "run").agg(F.count(F.lit(1)).cast("long").alias("plen"))
    scored = (
        runs.join(ph, ["_id", "run"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn("score", F.col("deg").cast("double") / F.col("freq").cast("double"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("w").asc()).limit(k).select(
        "w", "freq", "deg", "score"
    )
