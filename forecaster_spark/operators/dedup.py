"""Deduplication operators for large-scale training-data pipelines.

All hot paths are native Catalyst expressions (JVM-side, codegen) or
Arrow-vectorized numpy kernels; no per-row Python anywhere.

- exact dedup          : content-hash groupBy — one shuffle on the hash.
- MinHash + LSH        : shingle → K minhash perms → B bands → bucket
                         self-join → candidate pairs (optionally verified by
                         exact shingle Jaccard). The band bucket join is an
                         equi-join on (band_id, band_hash): broadcast-free,
                         AQE-skew-splittable, no O(n²) anywhere.
- SimHash              : 64-bit near-dup signature; hamming-ball candidate
                         pairing by exact signature or by rotated prefix
                         blocks.
- n-gram Jaccard       : exact similarity for candidate verification
                         (array_intersect/array_union — native).

Hashing uses the cross-engine primitives in
:mod:`forecaster_spark.functions.xhash` (splitmix64 over codepoint
polynomials) so every pipeline here is value-reproducible in DuckDB SQL
(``xhash_sql``) — the driver's oracle certifies minhash/simhash end-to-end
instead of a rows-only check.

At 10^12 docs the only state that grows is the band table (K/B rows per
doc), which shuffles on uniformly-distributed hashes — the design scales by
bucket count, never by pairwise comparisons across the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forecaster_spark.functions import xhash
from forecaster_spark.operators.textops import WS_SPLIT
from forecaster_spark.functions.xhash import splitmix64 as _splitmix


def with_content_hash(df: DataFrame, cols: list[str], out: str = "content_hash") -> DataFrame:
    return df.withColumn(out, F.xxhash64(*[F.col(c) for c in cols]))


def dedup_exact(df: DataFrame, cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct content: hash groupBy +
    semi-join back. Two shuffles, both on the 64-bit hash — no skew beyond
    true duplicate mass."""
    h = with_content_hash(df, cols)
    keep = h.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return h.join(keep, ["content_hash", id_col], "left_semi").drop("content_hash")


def _lower_words(text_col: str):
    return F.split(F.lower(F.col(text_col)), WS_SPLIT)


def word_shingles(df: DataFrame, text_col: str = "text", k: int = 3, out: str = "shingles") -> DataFrame:
    """Distinct hashed word k-shingles as array<long>.

    Words split natively (codegen); word hashing + the k-gram rolling
    combination + dedup run vectorized in ONE Arrow kernel over the batch's
    flat word stream (``xhash.word_hash_flat``: one UTF-32 decode + segmented
    power-weighted sums). A pure-expression version — transform(sequence) →
    slice → concat_ws → hash per shingle — never enters WholeStageCodegen:
    higher-order lambdas are interpreted per element, measured ~5 s for 5k
    docs vs <1 s here. NULL text propagates as NULL (no kernel crash)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def grams(words_s: pd.Series) -> pd.Series:
        rows = words_s.to_numpy()
        n = len(rows)
        out_rows = np.empty(n, dtype=object)
        if n == 0:
            return pd.Series(out_rows)
        flat_words: list[str] = []
        lens = np.zeros(n, np.int64)
        for i, ws in enumerate(rows):
            if ws is not None:
                flat_words.extend(ws)
                lens[i] = len(ws)
        flat = xhash.word_hash_flat(flat_words)
        powers = xhash.pow_table(k)  # wraparound-safe C^j (scalar mult warns)
        # rolling combine over the flat stream: g[p] = splitmix(Σ_j h[p+j]·C^j);
        # positions whose window crosses a row boundary are masked out below
        g = np.zeros(max(len(flat) - (k - 1), 0), dtype=np.uint64)
        for j in range(k):
            g += flat[j : len(flat) - (k - 1) + j] * powers[j]
        g = _splitmix(g)
        ends = np.cumsum(lens)
        starts = ends - lens
        # one batch-wide (row, value) sort replaces the per-row np.unique
        # loop: valid window starts keep their row id, a lexsort groups each
        # row's shingles in ascending order, and a diff mask dedupes —
        # per-row work is then just slicing the sorted stream
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)[: len(g)]
        off = np.arange(len(g), dtype=np.int64) - starts[row_of]
        valid = off <= (lens[row_of] - k)
        rowv, gv = row_of[valid], g[valid]
        # short docs (0 < m < k): one shingle over all their words, appended
        # to the same (row, value) stream before the sort
        short = np.flatnonzero((lens > 0) & (lens < k))
        if len(short):
            pos = np.arange(len(flat), dtype=np.int64) - starts[np.repeat(np.arange(n, dtype=np.int64), lens)]
            contrib = flat * powers[np.minimum(pos, k - 1)]
            csum = np.concatenate(([np.uint64(0)], np.cumsum(contrib, dtype=np.uint64)))
            acc = (csum[ends[short]] - csum[starts[short]]).astype(np.uint64)
            rowv = np.concatenate([rowv, short])
            gv = np.concatenate([gv, _splitmix(acc)])
        order = np.lexsort((gv, rowv))
        rowv, gv = rowv[order], gv[order]
        keep = np.ones(len(gv), bool)
        keep[1:] = (rowv[1:] != rowv[:-1]) | (gv[1:] != gv[:-1])
        rowv, gv = rowv[keep], gv[keep]
        gi = gv.view(np.int64)
        bounds = np.searchsorted(rowv, np.arange(n + 1))
        empty = np.zeros(1, dtype=np.int64)  # m==0 docs hash to [0]
        for i in range(n):
            if rows[i] is None:
                out_rows[i] = None
            else:
                lo, hi = bounds[i], bounds[i + 1]
                out_rows[i] = gi[lo:hi] if hi > lo else empty
        return pd.Series(out_rows)

    return df.withColumn(out, grams(_lower_words(text_col)))


def minhash_signature(
    df: DataFrame, shingle_col: str = "shingles", num_perm: int = 64, out: str = "minhash", seed: int = 42
) -> DataFrame:
    """K minhash values per doc: perm j = min over shingles of the universal
    hash ``splitmix(x ^ salt_j)``. One Arrow kernel, vectorized as an
    (n_shingles × num_perm) outer min per row — the per-perm
    transform+array_min expression chain is interpreted (no codegen) and was
    ~8× slower."""
    salts = xhash.minhash_salts(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(sh: pd.Series) -> pd.Series:
        rows = sh.to_numpy()
        n = len(rows)
        out_rows = np.empty(n, dtype=object)
        # flat-stream batch: one (Σ shingles × num_perm) splitmix matrix +
        # per-row minimum.reduceat replaces the per-row outer products
        # (~20 µs of numpy dispatch per row dominated small docs); chunked
        # so the matrix stays ≤ ~64 MB
        lens = np.fromiter(
            (len(a) if a is not None else 0 for a in rows), np.int64, count=n
        )
        nz = np.flatnonzero(lens > 0)
        if len(nz):
            flat = np.concatenate([np.asarray(rows[i], dtype=np.int64) for i in nz]).view(np.uint64)
            ends = np.cumsum(lens[nz])
            starts = ends - lens[nz]
            chunk = max(1, (1 << 23) // max(num_perm, 1))
            lo = 0
            while lo < len(nz):
                hi = lo + 1
                while hi < len(nz) and ends[hi - 1] - starts[lo] < chunk:
                    hi += 1
                seg = flat[starts[lo] : ends[hi - 1]]
                vals = _splitmix(seg[:, None] ^ salts[None, :])
                mins = np.minimum.reduceat(vals, starts[lo:hi] - starts[lo], axis=0)
                for j, i in enumerate(nz[lo:hi]):
                    out_rows[i] = mins[j].view(np.int64)
                lo = hi
        zero = np.zeros(num_perm, dtype=np.int64)
        for i in range(n):
            if rows[i] is not None and lens[i] == 0:
                out_rows[i] = zero
        return pd.Series(out_rows)

    return df.withColumn(out, sig(F.col(shingle_col)))


def lsh_bands(
    df: DataFrame, id_col: str = "doc_id", sig_col: str = "minhash", bands: int = 8
) -> DataFrame:
    """Split the signature into B bands → (id, band_id, band_hash) rows.
    Band hashes fold each band's values through splitmix64 in one batched
    numpy pass (``xhash.fold_bands``) — the previous slice+concat_ws+hash
    expression chain was interpreted per element."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_hashes(sig: pd.Series) -> pd.Series:
        rows = sig.to_numpy()
        out = np.empty(len(rows), dtype=object)
        ok = [i for i, a in enumerate(rows) if a is not None]
        if ok:
            m = np.stack([np.asarray(rows[i], dtype=np.int64) for i in ok]).view(np.uint64)
            acc = xhash.fold_bands(m, bands).view(np.int64)
            for j, i in enumerate(ok):
                out[i] = acc[j]
        return pd.Series(out)

    bh = df.select(id_col, band_hashes(F.col(sig_col)).alias("_bh"))
    return bh.select(id_col, F.posexplode("_bh").alias("band_id", "band_hash"))


def minhash_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Fused words → (id, band_id, band_hash) table: bit-identical to
    ``lsh_bands(minhash_signature(word_shingles(df)))`` but in ONE Arrow
    kernel per batch instead of three. The composed chain ships the shingle
    array (Σ shingles longs) and the signature array out of and back into
    Arrow between kernels — at sf0.1 that transfer plus the extra UDF
    evaluations was ~60% of the chain's wall. Fusing also drops the
    per-batch shingle dedup lexsort entirely: min over duplicates is the
    min, so banding never needed distinct shingles (verification, which
    does, still calls :func:`word_shingles`)."""
    salts = xhash.minhash_salts(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_arr(words_s: pd.Series) -> pd.Series:
        rows = words_s.to_numpy()
        n = len(rows)
        out_rows = np.empty(n, dtype=object)
        if n == 0:
            return pd.Series(out_rows)
        flat_words: list[str] = []
        lens = np.zeros(n, np.int64)
        nonnull = np.zeros(n, bool)
        for i, ws in enumerate(rows):
            if ws is not None:
                flat_words.extend(ws)
                lens[i] = len(ws)
                nonnull[i] = True
        if not nonnull.any():
            return pd.Series(out_rows)
        # --- shingle-hash stream: same construction as word_shingles ---
        flat = xhash.word_hash_flat(flat_words)
        powers = xhash.pow_table(k)
        g = np.zeros(max(len(flat) - (k - 1), 0), dtype=np.uint64)
        for j in range(k):
            g += flat[j : len(flat) - (k - 1) + j] * powers[j]
        g = _splitmix(g)
        ends = np.cumsum(lens)
        starts = ends - lens
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)[: len(g)]
        off = np.arange(len(g), dtype=np.int64) - starts[row_of]
        valid = off <= (lens[row_of] - k)
        rowv, gv = row_of[valid], g[valid]
        short = np.flatnonzero((lens > 0) & (lens < k))
        if len(short):
            pos = np.arange(len(flat), dtype=np.int64) - starts[np.repeat(np.arange(n, dtype=np.int64), lens)]
            contrib = flat * powers[np.minimum(pos, k - 1)]
            csum = np.concatenate(([np.uint64(0)], np.cumsum(contrib, dtype=np.uint64)))
            acc = (csum[ends[short]] - csum[starts[short]]).astype(np.uint64)
            rowv = np.concatenate([rowv, short])
            gv = np.concatenate([gv, _splitmix(acc)])
        zero_rows = np.flatnonzero(nonnull & (lens == 0))  # m==0 → shingle 0
        if len(zero_rows):
            rowv = np.concatenate([rowv, zero_rows])
            gv = np.concatenate([gv, np.zeros(len(zero_rows), np.uint64)])
        order = np.argsort(rowv, kind="stable")
        rowv, gv = rowv[order], gv[order]
        # --- per-row signature mins, chunked like minhash_signature ---
        uniq_rows, grp_starts = np.unique(rowv, return_index=True)
        grp_ends = np.concatenate([grp_starts[1:], [len(rowv)]])
        sig = np.empty((len(uniq_rows), num_perm), np.uint64)
        chunk = max(1, (1 << 23) // max(num_perm, 1))
        lo = 0
        while lo < len(uniq_rows):
            hi = lo + 1
            while hi < len(uniq_rows) and grp_ends[hi - 1] - grp_starts[lo] < chunk:
                hi += 1
            seg = gv[grp_starts[lo] : grp_ends[hi - 1]]
            vals = _splitmix(seg[:, None] ^ salts[None, :])
            sig[lo:hi] = np.minimum.reduceat(vals, grp_starts[lo:hi] - grp_starts[lo], axis=0)
            lo = hi
        bh = xhash.fold_bands(sig, bands).view(np.int64)
        for j, i in enumerate(uniq_rows):
            out_rows[i] = bh[j]
        return pd.Series(out_rows)

    bt = df.select(id_col, band_arr(_lower_words(text_col)).alias("_bh"))
    return bt.select(id_col, F.posexplode("_bh").alias("band_id", "band_hash"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 8,
    verify_jaccard: float | None = None,
    bucket_block: int = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via MinHash LSH; when
    ``verify_jaccard`` is set, candidates are re-checked with exact shingle
    Jaccard and filtered."""
    bandt = minhash_band_table(df, text_col, id_col, k=k, num_perm=num_perm, bands=bands)
    # bucket-grouped pair generation instead of a band-table self-join: ONE
    # shuffle on (band_id, band_hash) and ONE evaluation of the fused band
    # kernel (a self-join re-executes the whole upstream for each side —
    # measured ~2× the kernel cost). Bucket sizes are bounded by the LSH
    # property on deduped text, so the within-bucket explosion equals the
    # join's candidate count — but a web crawl routinely carries m-member
    # EXACT-duplicate clusters whose C(m,2) pair stream would otherwise
    # serialize in the one task holding the bucket row. Hot-bucket control:
    # split each bucket into ``bucket_block``-width chunks, enumerate the
    # ~nb²/2 (chunk_i, chunk_j) block pairs as individual bounded rows
    # (≤ 2·bucket_block ids each), round-robin repartition to spread the
    # quadratic explosion across the cluster, THEN explode pairs. Normal
    # buckets (m ≤ bucket_block) degenerate to nb=1 — one block-pair row,
    # same pairs. No candidates are dropped; output volume is inherently
    # C(m,2), so truly giant clusters should be collapsed by exact dedup
    # upstream (standard practice) — this cap bounds task memory and
    # serialization, not output semantics.
    cap = int(bucket_block)
    if cap < 1:
        # a non-positive cap would reach SQL as `div 0`, which under the
        # engine's non-ANSI sessions yields NULL -> sequence(NULL) -> zero
        # chunk rows: every candidate pair silently dropped. Fail loudly.
        raise ValueError("bucket_block must be >= 1")
    buckets = (
        bandt.groupBy("band_id", "band_hash")
        .agg(F.collect_list(id_col).alias("_ids"))
        .where(F.size("_ids") > 1)
    )
    chunked = buckets.select(
        F.expr(
            f"transform(sequence(0, (size(_ids) + {cap} - 1) div {cap} - 1),"
            f" i -> slice(_ids, i * {cap} + 1, {cap}))"
        ).alias("_chunks")
    )
    blk_i = chunked.select(
        F.posexplode("_chunks").alias("_i", "_ca"), "_chunks"
    )
    blk_pairs = blk_i.select(
        "_ca",
        # j = i (self block) first, then every later block — each unordered
        # cross-block pair lands in exactly one (i, j) row
        F.posexplode(
            F.concat(
                F.array("_ca"),
                F.expr("slice(_chunks, _i + 2, greatest(size(_chunks) - _i - 1, 0))"),
            )
        ).alias("_dj", "_cb"),
    ).repartition(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")))
    pairs = (
        blk_pairs.select(F.explode("_ca").alias("id_a"), "_cb")
        .select("id_a", F.explode("_cb").alias("id_b"))
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    if verify_jaccard is not None:
        # the verify path consumes `pairs` twice (candidate ids + the final
        # broadcast join); each consumer would re-run the band kernel +
        # bucket shuffle. The pair table is tiny by LSH construction, so an
        # eager localCheckpoint pins it after ONE evaluation — measured A/B
        # at sf0.1: 4.14 s (re-execute) vs 3.13 s (checkpoint) warm, 9.4 vs
        # 4.5 s cold. (An earlier structure measured the opposite; the
        # conclusion flipped once verification stopped re-shingling the full
        # corpus, leaving chain re-execution as the dominant term.)
        pairs = pairs.localCheckpoint(eager=True)
        # candidate pairs are tiny by LSH construction — shingle ONLY the
        # candidate docs (broadcast semi-join into the corpus), then
        # broadcast-join the pair table; the full corpus is never
        # re-shingled for verification and shingle arrays never shuffle
        cand_ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionAll(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        cand_docs = df.join(F.broadcast(cand_ids), id_col, "left_semi")
        sh_c = word_shingles(cand_docs, text_col, k).select(id_col, "shingles")
        sh_a = sh_c.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
        sh_b = sh_c.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        pairs = (
            sh_b.join(F.broadcast(sh_a.join(F.broadcast(pairs), "id_a")), "id_b")
            .withColumn("jaccard", inter / union)
            .where(F.col("jaccard") >= verify_jaccard)
            .select("id_a", "id_b", "jaccard")
        )
    return pairs


def contamination_flags(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ANY word
    k-shingle with the benchmark set (the GPT-3-style n-gram overlap
    check). Benchmark shingles are distinct-ed and BROADCAST (eval sets are
    small by construction); the corpus side shingles once and probes with a
    left-semi join — corpus-linear work, no shuffle of corpus text.
    Output: (id_col, contaminated boolean)."""
    sh_c = word_shingles(corpus, text_col, k).select(
        id_col, F.explode("shingles").alias("sh")
    )
    sh_b = (
        word_shingles(bench, text_col, k)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    hits = sh_c.join(F.broadcast(sh_b), "sh", "left_semi").select(id_col).distinct()
    return (
        corpus.select(id_col)
        .join(hits.withColumn("_hit", F.lit(True)), id_col, "left")
        .select(id_col, F.coalesce("_hit", F.lit(False)).alias("contaminated"))
    )


def split_leakage(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    splits: list[tuple[str, float]] | None = None,
    seed: int = 42,
    holdout: str = "test",
    broadcast_holdout: bool = True,
    min_shared: int = 1,
) -> DataFrame:
    """Train/test leakage audit: for every TRAIN document, count the word
    k-shingles it shares with ANY held-out-split document — the sibling of
    :func:`contamination_flags` where the "benchmark" is the pipeline's own
    eval split. Near-duplicates straddling a random split silently leak
    eval content into training; this measures it BEFORE training, per doc.

    Dataflow: one :func:`hash_split` labeling (row-local splitmix bucket),
    one shingling pass over the corpus, holdout shingles distinct-ed and
    (by default) broadcast, train side probed with a left-semi join +
    count — corpus-linear, no text shuffle. ``broadcast_holdout=False``
    switches the probe to a shuffle semi-join for deployments where the
    holdout rate × corpus size outgrows the broadcast threshold (the
    holdout is rate-bounded at 1% by the default split spec, but 1% of
    100 TB is not broadcastable).

    Output: (id_col, n_shingles, n_shared, leaked) for train docs —
    n_shared counts the doc's distinct shingles seen anywhere in the
    holdout (shingle arrays are already per-doc distinct); ``leaked`` fires
    at ``n_shared >= min_shared`` (raise it for small k, where single
    shared shingles are common phrases, not leakage)."""
    from forecaster_spark.operators.sampling import hash_split

    labeled = hash_split(
        corpus.select(id_col, text_col), id_col=id_col, splits=splits, seed=seed
    )
    sh = word_shingles(labeled, text_col, k).select(
        id_col, "split", F.explode("shingles").alias("sh")
    )
    hold = (
        sh.where(F.col("split") == holdout)
        .select("sh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_holdout:
        hold = F.broadcast(hold)
    # one aggregation pass: left-join the hit flag, count total + hits
    # together (a semi-join + separate totals agg would re-evaluate the
    # shingle kernel over the train side a second time)
    train = sh.where(F.col("split") == "train")
    return (
        train.join(hold, "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_shared"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_shared",
            (F.col("n_shared") >= F.lit(int(min_shared))).alias("leaked"),
        )
    )


def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Exact word-k-gram Jaccard for given (id_a, id_b) pairs."""
    sh = word_shingles(df, text_col, k).select(id_col, "shingles")
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    )


_BIT_WEIGHTS = np.uint64(1) << np.arange(64, dtype=np.uint64)


@F.pandas_udf(T.LongType())
def _simhash_from_words(words_s: pd.Series) -> pd.Series:
    """64-bit SimHash from per-word hashes: for each bit, +1 if set else −1,
    summed over words; sign of the sum gives the signature bit. Fully
    vectorized over the batch's flat word stream (bit matrix + segmented
    reduceat), chunked to bound peak memory; NULL/empty → 0."""
    rows = words_s.to_numpy()
    n = len(rows)
    out = np.zeros(n, dtype=np.int64)
    flat_words: list[str] = []
    lens = np.zeros(n, np.int64)
    for i, ws in enumerate(rows):
        if ws is not None:
            flat_words.extend(ws)
            lens[i] = len(ws)
    if not flat_words:
        return pd.Series(out)
    wh = xhash.word_hash_flat(flat_words)
    ends = np.cumsum(lens)
    starts = ends - lens
    nz = np.flatnonzero(lens > 0)
    # chunk over rows so the (words × 64) bit matrix stays ≤ ~32 MB
    chunk_words = 1 << 18
    lo = 0
    while lo < len(nz):
        hi = lo + 1
        while hi < len(nz) and ends[nz[hi - 1]] - starts[nz[lo]] < chunk_words:
            hi += 1
        rsel = nz[lo:hi]
        seg = wh[starts[rsel[0]] : ends[rsel[-1]]]
        # unpackbits on the raw little-endian bytes IS the (words × 64) bit
        # matrix — measured ~80× faster than the 64-shift broadcast it
        # replaces; reduceat accumulates straight into int64 (dtype arg), so
        # arbitrarily wide documents can never overflow the bit tallies
        # (r2 bug: the old int16 matrix wrapped past 32767 words/doc)
        bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        counts = np.add.reduceat(
            bits, (starts[rsel] - starts[rsel[0]]).astype(np.int64), axis=0, dtype=np.int64
        )
        counts = counts * 2 - lens[rsel][:, None]
        sigs = ((counts > 0).astype(np.uint64) * _BIT_WEIGHTS[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[rsel] = sigs.view(np.int64)
        lo = hi
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """SimHash signature over cross-engine word hashes (splitmix64 codepoint
    polynomials — DuckDB-reproducible, see ``xhash_sql.simhash_sql``)."""
    return df.withColumn(out, _simhash_from_words(_lower_words(text_col)))


def simhash_dup_pairs(df: DataFrame, id_col: str = "doc_id", sim_col: str = "simhash") -> DataFrame:
    """Exact-signature SimHash duplicate pairs (hamming distance 0) — a
    groupBy on the signature; for distance ≤ d see
    :func:`simhash_neardup_pairs`."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(sim_col))
    b = df.select(F.col(id_col).alias("id_b"), F.col(sim_col))
    return a.join(b, [sim_col]).where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    strategy: str = "group",
) -> DataFrame:
    """Near-miss SimHash pairs (hamming distance ≤ ``max_hamming``) by
    pigeonhole chunk blocking: the 64-bit signature splits into
    ``max_hamming + 1`` chunks — two signatures within distance d must agree
    EXACTLY on at least one chunk — so candidates come from equi-joins on
    (chunk_id, chunk_value) and the exact hamming check is one native
    ``bit_count(xor)``. One shuffle on the chunk key, candidate count
    bounded by per-chunk collision rates (uniform for hash-like bits), no
    all-pairs anywhere — the standard multi-index scheme from the Google
    near-dup paper (Manku et al., WWW'07), fully codegen, no Python.

    Output: (id_a, id_b, hamming), distinct.

    ``strategy="group"`` (default) pairs bucket-grouped: collect per
    (chunk_id, chunk_val), explode within the bucket — ONE shuffle and ONE
    evaluation of the signature chain instead of two of each (a self-join
    cannot reuse the exchange; the two sides' aliases differ; measured
    2.7× faster at contract scale). Its caveat: a bucket's members
    materialize as ONE array row, so the per-task memory bound is the
    largest duplicate cluster — fine after exact dedup (the usual pipeline
    order), pathological on a corpus with a 10^5+-member identical-
    signature mass. ``strategy="join"`` streams the same pairs through a
    plain equi-self-join with no per-row materialization (both sides
    re-execute upstream) — use it when cluster sizes are unknown. Both
    return identical results (tested)."""
    if strategy not in ("group", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sig = F.col(sim_col)
    chunks = df.select(
        F.col(id_col).alias("_id"),
        sig.alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        # unsigned chunk extract; the last chunk takes the
                        # remaining high bits (64 % n_chunks extras)
                        F.shiftrightunsigned(sig, c * width)
                        .bitwiseAND(F.lit(-1 if c == n_chunks - 1 else (1 << width) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("_id", "_sig", "ck.chunk_id", "ck.chunk_val")
    if strategy == "join":
        a = chunks.select(
            F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "chunk_id", "chunk_val"
        )
        bb = chunks.select(
            F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "chunk_id", "chunk_val"
        )
        ham_j = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        return (
            a.join(bb, ["chunk_id", "chunk_val"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham_j.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct()
        )
    buckets = (
        chunks.groupBy("chunk_id", "chunk_val")
        .agg(F.collect_list(F.struct("_id", "_sig")).alias("_es"))
        .where(F.size("_es") > 1)
    )
    pairs = (
        buckets.select(F.explode("_es").alias("a"), "_es")
        .select("a", F.explode("_es").alias("b"))
        .where(F.col("a._id") < F.col("b._id"))
    )
    ham = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        pairs.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _local_uf_kernel(it):
    """Per-partition vectorized union-find over an edge batch stream:
    all edges of the partition are concatenated, endpoints factorized via
    sorted ``np.unique`` (so min INDEX ≡ min id — deterministic canonical
    labels), then edge-relax (``np.minimum.at``) alternates with pointer
    jumping (``lbl = lbl[lbl]``) to a fixpoint. Each outer pass strictly
    decreases Σlbl until every edge is label-consistent, so it terminates;
    work is O((E+V)·log diameter) numpy ops, no Python per-edge loop.
    Emits (node, lbl) for every endpoint seen in this partition."""
    import numpy as np
    import pandas as pd

    us, vs = [], []
    for pdf in it:
        us.append(pdf["u"].to_numpy())
        vs.append(pdf["v"].to_numpy())
    if not us:
        return
    u = np.concatenate(us)
    v = np.concatenate(vs)
    if len(u) == 0:
        return
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    lbl = np.arange(len(nodes))
    while True:
        m = np.minimum(lbl[ui], lbl[vi])
        np.minimum.at(lbl, ui, m)
        np.minimum.at(lbl, vi, m)
        while True:
            nl = lbl[lbl]
            if np.array_equal(nl, lbl):
                break
            lbl = nl
        if (lbl[ui] == lbl[vi]).all():
            break
    yield pd.DataFrame({"node": nodes, "lbl": nodes[lbl]})


def connected_components(pairs: DataFrame, max_rounds: int = 12) -> DataFrame:
    """Connected components over a near-duplicate pair table
    ``(id_a, id_b)`` → ``(doc_id, cluster_id)`` with ``cluster_id`` = the
    minimum doc id reachable in the component (deterministic canonical
    label). The missing last stage of the dedup pipeline: LSH emits PAIRS,
    but keep/drop decisions need CLUSTERS.

    Two-phase contraction (the production CC shape, cf. Kiveris et al.
    "Connected Components in MapReduce and Beyond", SOCC'14 local-
    aggregation variant) instead of per-edge min-label diffusion: each
    round runs an Arrow-vectorized union-find INSIDE every edge partition
    (:func:`_local_uf_kernel` — no shuffle, no Python per-edge loop),
    min-merges the per-partition labels per node, composes them into the
    running node→label map, and contracts every edge to its two component
    representatives. The contracted edge set shrinks geometrically (each
    partition's subgraph collapses to a star), so rounds ≈ log_P(n)
    rather than the graph diameter — min-label diffusion needed 12 rounds
    on the sf0.1 simhash pair graph (diameter-bound chains), this needs 1.

    Lineage discipline: per-round outputs are ``localCheckpoint``-ed
    (eager) — materialize AND truncate the plan. ``persist`` alone is the
    iterative-Spark trap: the plan tree still doubles per round and the
    driver dies rendering plan strings long before executors hurt. On a
    real cluster swap in reliable ``checkpoint()`` for executor-loss
    safety; ``max_rounds`` bounds adversarial partition layouts."""
    u, v = F.col("id_a"), F.col("id_b")
    edges = (
        pairs.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    id_type = pairs.schema["id_a"].dataType.simpleString()
    overall = (
        edges.select(F.col("u").alias("id"))
        .unionAll(edges.select(F.col("v").alias("id")))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        if edges.count() == 0:
            break
        local = edges.mapInPandas(
            _local_uf_kernel, schema=f"node {id_type}, lbl {id_type}"
        )
        lmap = (
            local.groupBy("node")
            .agg(F.min("lbl").alias("_nl"))
            .localCheckpoint(eager=True)
        )
        overall = (
            overall.join(
                lmap.withColumnRenamed("node", "_n"),
                overall["lbl"] == F.col("_n"),
                "left",
            )
            .select("id", F.coalesce(F.col("_nl"), F.col("lbl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        ru = lmap.select(F.col("node").alias("u"), F.col("_nl").alias("_lu"))
        rv = lmap.select(F.col("node").alias("v"), F.col("_nl").alias("_lv"))
        edges = (
            edges.join(ru, "u")
            .join(rv, "v")
            .where(F.col("_lu") != F.col("_lv"))
            .select(
                F.least("_lu", "_lv").alias("u"),
                F.greatest("_lu", "_lv").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    return overall.select(F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def dedup_keep_list(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep/drop verdict per document from a near-dup pair table: cluster
    via :func:`connected_components`, keep the canonical (minimum-id)
    member of each cluster, drop the rest; documents in no pair keep
    themselves. Output: (id_col, cluster_id, keep boolean) — one row per
    input document. The cluster table is duplicate-bounded (≤ docs in
    pairs); the join is left to AQE, which broadcasts it when small but
    degrades gracefully on duplicate-heavy corpora where it isn't."""
    cc = connected_components(pairs)
    return (
        df.select(id_col)
        .join(cc.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            (
                F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col))
            ).alias("keep"),
        )
    )


def ngram_novelty(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    word k-shingles whose FIRST corpus occurrence (min doc_id) is this
    document — the dedup-adjacent curation signal (low novelty ⇒ the doc
    is retelling earlier corpus content; the aggregate novelty-vs-doc_id
    curve is the classic crawl-saturation diagnostic).

    Shingles are the same splitmix64 word-k-gram hashes the MinHash/
    contamination paths use (one Arrow kernel, short-doc and empty-doc
    paths included), so the DuckDB oracle replays them symbol-for-symbol;
    counts are exact integers and ``novelty_ppm`` is the floor
    ``(1_000_000·n_novel) div n_shingles``.

    Plan: explode distinct shingles → ONE shuffle on the shingle hash,
    where an unordered whole-group window attaches min(doc_id) per shingle
    in a single pass → per-doc hash agg.  The earlier groupBy +
    shuffle-join-back formulation re-executed the shingle Arrow kernel on
    both sides of the join (the self-join chain-re-execution trap,
    CLAUDE.md) — measured 1.9x slower at sf0.1 (1.67 s vs 0.88 s warm,
    identical results).  Both shuffle keys are the 64-bit hash — uniform
    by construction, skew-free at 10^12 docs.

    Output: (doc_id, n_shingles, n_novel, novelty_ppm).
    """
    from pyspark.sql import Window

    sh = word_shingles(docs, text_col=text_col, k=k).select(
        "doc_id", F.explode("shingles").alias("_sh")
    )
    return (
        sh.withColumn("_first", F.min("doc_id").over(Window.partitionBy("_sh")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("(1000000 * n_novel) div n_shingles").alias("novelty_ppm"),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    top_n: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide inventory of the most-duplicated word k-gram spans —
    the span-level view of exact-substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": their
    suffix-array pass finds verbatim spans repeated across documents;
    over a columnar corpus the hashed k-gram window table IS that signal,
    and the top of it is the boilerplate/license/template content a
    curation pass strips first).  Complements :func:`ngram_novelty`
    (per-DOC score) with the per-SPAN ledger: which spans, how many
    documents, where first/last seen.

    Span identity is the same splitmix64 word-k-gram hash the MinHash /
    contamination / novelty paths use (distinct per document, so n_docs
    is "documents containing the span"), and the DuckDB oracle replays it
    symbol-for-symbol; counts are exact integers and the ranking
    (n_docs desc, UNSIGNED hash asc — sign-bit flip on the signed long,
    matching the mirror's HUGEINT order) is a total order, so the top-N
    cut is deterministic cross-engine.

    Plan shape (100-TB lens): explode shingles → ONE shuffle on the
    64-bit span hash (uniform, skew-free) with map-side partial
    aggregates, filter to n_docs >= 2, then a global top-N — Spark plans
    ``orderBy().limit(n)`` as TakeOrderedAndProject (per-partition heaps,
    no global sort), and the final row_number window runs on top_n rows.

    Output: (rnk, span_hash, n_docs, first_doc, last_doc).
    """
    from pyspark.sql import Window

    sh = word_shingles(docs, text_col=text_col, k=k).select(
        id_col, F.explode("shingles").alias("span_hash")
    )
    agg = (
        sh.groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),  # (doc, span) is distinct upstream
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    uns = F.col("span_hash").bitwiseXOR(F.lit(-(1 << 63)))  # unsigned order
    top = agg.orderBy(F.col("n_docs").desc(), uns.asc()).limit(top_n)
    w = Window.orderBy(F.col("n_docs").desc(), uns.asc())
    return top.select(F.row_number().over(w).alias("rnk"), "*")


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    top_n: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY the duplicated-span ledger — the second half of Lee et al.
    2021 exact-substring dedup (their pass REMOVES the repeated spans from
    the training text; :func:`duplicated_spans` only inventories them).
    Every word position covered by any occurrence of a flagged k-gram span
    (all occurrences, not just the ledger's distinct-per-doc view) is
    dropped; the surviving words are certified by value via the reference
    polynomial token checksum ``Σ tok_i·31^(m'−1−i) mod 2^64`` over the
    kept words in order (tok = word hash mod 2^31 — the same token
    derivation the north-rule corpus invariant uses).

    Plan shape (100-TB lens): the ledger is the deterministic top-``top_n``
    boilerplate table — bounded by construction, collected once (top_n
    rows) and shipped inside the kernel closure; the removal itself is then
    ONE corpus-linear Arrow map over the documents with ZERO extra shuffles
    (no join-back of flag lists).  Coverage marking, membership test and
    the checksum fold are all flat-stream numpy (diff-array interval
    union + cumsum; no per-row Python).

    Output: (doc_id, n_words, n_removed, clean_checksum) — n_removed = 0
    and checksum over all words for untouched docs; checksum 0 when every
    word is removed.  NULL text propagates NULLs.
    """
    ledger = duplicated_spans(docs, text_col=text_col, k=k, top_n=top_n, id_col=id_col)
    flagged = np.array(
        [r.span_hash for r in ledger.select("span_hash").collect()], dtype=np.int64
    ).view(np.uint64)

    out_t = T.StructType(
        [
            T.StructField("n_words", T.LongType()),
            T.StructField("n_removed", T.LongType()),
            T.StructField("clean_checksum", T.LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def scrub(words_s: pd.Series) -> pd.DataFrame:
        rows = words_s.to_numpy()
        n = len(rows)
        n_words = np.zeros(n, np.int64)
        n_removed = np.zeros(n, np.int64)
        checks = np.zeros(n, np.int64)
        isnull = np.zeros(n, bool)
        flat_words: list[str] = []
        lens = np.zeros(n, np.int64)
        for i, ws in enumerate(rows):
            if ws is None:
                isnull[i] = True
            else:
                flat_words.extend(ws)
                lens[i] = len(ws)
        flat = xhash.word_hash_flat(flat_words)
        ends = np.cumsum(lens)
        starts = ends - lens
        nf = len(flat)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        # full k-windows over the flat stream (same rolling combine as
        # word_shingles, WITHOUT the distinct — removal must cover every
        # occurrence), then short-doc (0 < m < k) whole-doc shingles
        powers = xhash.pow_table(k)
        g = np.zeros(max(nf - (k - 1), 0), dtype=np.uint64)
        for j in range(k):
            g += flat[j : nf - (k - 1) + j] * powers[j]
        g = _splitmix(g)
        off = np.arange(len(g), dtype=np.int64) - starts[row_of[: len(g)]]
        valid = off <= (lens[row_of[: len(g)]] - k)
        # interval-union coverage via a diff array over flat positions
        cov = np.zeros(nf + 1, np.int64)
        hit_starts = np.flatnonzero(valid & np.isin(g, flagged))
        np.add.at(cov, hit_starts, 1)
        np.add.at(cov, hit_starts + k, -1)
        short = np.flatnonzero((lens > 0) & (lens < k))
        if len(short):
            pos = np.arange(nf, dtype=np.int64) - starts[row_of]
            contrib = flat * powers[np.minimum(pos, k - 1)]
            csum0 = np.concatenate(([np.uint64(0)], np.cumsum(contrib, dtype=np.uint64)))
            acc = _splitmix((csum0[ends[short]] - csum0[starts[short]]).astype(np.uint64))
            shit = short[np.isin(acc, flagged)]
            np.add.at(cov, starts[shit], 1)
            np.add.at(cov, ends[shit], -1)
        covered = np.cumsum(cov[:-1]) > 0
        kept = ~covered
        # reference polynomial checksum over the kept words, per row:
        # exponent of the i-th kept word (0-based within its row) is
        # (kept_in_row − 1 − i); uint64 cumsum diffs wrap mod 2^64 exactly
        kept_idx = np.flatnonzero(kept)
        krow = row_of[kept_idx]
        kcnt = np.bincount(krow, minlength=n).astype(np.int64)
        kstart = np.concatenate(([0], np.cumsum(kcnt)))
        rank = np.arange(len(kept_idx), dtype=np.int64) - kstart[krow]
        expo = kcnt[krow] - 1 - rank
        max_e = int(expo.max()) + 1 if len(expo) else 1
        pow31 = np.array([pow(31, j, 1 << 64) for j in range(max_e)], dtype=np.uint64)
        toks = flat[kept_idx] & np.uint64((1 << 31) - 1)
        term = toks * pow31[expo]
        csum = np.concatenate(([np.uint64(0)], np.cumsum(term, dtype=np.uint64)))
        sums = (csum[kstart[1:]] - csum[kstart[:-1]]).astype(np.uint64)
        n_words = lens
        n_removed = lens - kcnt
        checks = sums.view(np.int64)
        out = pd.DataFrame(
            {"n_words": n_words, "n_removed": n_removed, "clean_checksum": checks}
        )
        for c in out.columns:
            out[c] = out[c].astype(object)
            out.loc[isnull, c] = None
        return out

    res = docs.withColumn("_scrub", scrub(_lower_words(text_col)))
    return res.select(
        id_col,
        F.col("_scrub.n_words").alias("n_words"),
        F.col("_scrub.n_removed").alias("n_removed"),
        F.col("_scrub.clean_checksum").alias("clean_checksum"),
    )


def cdc_chunk_ledger(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    g: int = 4,
    mask_bits: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Content-defined chunking (CDC) duplicate ledger — the
    SHIFT-RESISTANT sub-document dedup primitive (the gear/Rabin-chunking
    idea of LBFS/restic/casync applied at word granularity): cut each
    document AFTER every word whose trailing ``g``-word rolling hash has
    its low ``mask_bits`` bits zero (expected chunk ≈ 2^mask_bits words),
    hash each chunk, and report the top-N chunks shared by ≥ 2 documents.

    Why CDC beside the k-gram span ledger: fixed k-gram windows change
    identity when ONE word shifts position; CDC boundaries depend only on
    local content, so a paragraph reused at a different offset still
    yields the same chunks — the dedup signal survives insertion drift
    (boilerplate injected mid-page, shifted quotations).

    Exactness: word hashes, the rolling window hash, the boundary
    predicate (``splitmix64(win) mod 2^mask_bits == 0``), and the
    chunk polynomial ``splitmix64(Σ h_p·C^(p−start))`` are pure integer
    arithmetic replayed symbol-for-symbol by the DuckDB mirror
    (:func:`xhash_sql.cdc_chunk_ledger_sql`).

    Scale shape: one Arrow kernel scan (flat-stream numpy: rolling
    window sums, cut flags, reduceat chunk sums — no per-row Python),
    ONE shuffle on the 64-bit chunk hash with map-side partials, then a
    deterministic top-N (n_docs desc, n_occ desc, unsigned hash asc) via
    TakeOrderedAndProject.

    Output: (rnk, chunk_hash, n_docs, n_occ, first_doc, last_doc)."""
    mask = (1 << mask_bits) - 1

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def chunks(words_s: pd.Series) -> pd.Series:
        rows = words_s.to_numpy()
        n = len(rows)
        out_rows = np.empty(n, dtype=object)
        if n == 0:
            return pd.Series(out_rows)
        flat_words: list[str] = []
        lens = np.zeros(n, np.int64)
        for i, ws in enumerate(rows):
            if ws is not None:
                flat_words.extend(ws)
                lens[i] = len(ws)
        flat = xhash.word_hash_flat(flat_words)
        nf = len(flat)
        ends = np.cumsum(lens)
        starts = ends - lens
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        powers = xhash.pow_table(max(g, int(lens.max()) if n else 1) or 1)
        # rolling g-window hash keyed by window START (the shingle combine);
        # guard nf < g: the slice end nf-(g-1)+j would go NEGATIVE and wrap
        # into a non-empty slice against the empty gw (review-caught crash
        # for g >= 5 on a short batch)
        n_win = nf - (g - 1)
        if n_win > 0:
            gw = np.zeros(n_win, dtype=np.uint64)
            for j in range(g):
                gw += flat[j : n_win + j] * powers[j]
            gw = _splitmix(gw)
        else:
            gw = np.empty(0, dtype=np.uint64)
        # cut AFTER flat position e = s + g - 1 for in-doc windows whose
        # hash has the low mask_bits zero
        cut_after = np.zeros(nf, dtype=bool)
        if len(gw):
            s_idx = np.arange(len(gw), dtype=np.int64)
            valid = (s_idx - starts[row_of[s_idx]]) <= (lens[row_of[s_idx]] - g)
            hit = valid & ((gw & np.uint64(mask)) == 0)
            cut_after[s_idx[hit] + (g - 1)] = True
        # chunk starts: doc starts + positions right after a cut (an OR —
        # a doc-start position stays a start regardless of cut flags)
        startflag = np.zeros(nf, dtype=bool)
        if nf > 1:
            startflag[1:] = cut_after[:-1]
        startflag[starts[lens > 0]] = True
        cstart_idx = np.flatnonzero(startflag)
        pos = np.arange(nf, dtype=np.int64)
        last_start = np.maximum.accumulate(np.where(startflag, pos, -1))
        off = pos - last_start
        contrib = flat * powers[off]
        sums = (
            np.add.reduceat(contrib, cstart_idx) if len(cstart_idx) else
            np.empty(0, np.uint64)
        )
        ch = _splitmix(sums.astype(np.uint64)).view(np.int64)
        crow = row_of[cstart_idx]
        bounds = np.searchsorted(crow, np.arange(n + 1))
        for i in range(n):
            out_rows[i] = None if rows[i] is None else ch[bounds[i] : bounds[i + 1]]
        return pd.Series(out_rows)

    ch = docs.select(id_col, F.explode(chunks(_lower_words(text_col))).alias("chunk_hash"))
    per = ch.groupBy(id_col, "chunk_hash").agg(F.count(F.lit(1)).alias("occ"))
    agg = (
        per.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occ"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    uns = F.col("chunk_hash").bitwiseXOR(F.lit(-(1 << 63)))
    ordr = [F.col("n_docs").desc(), F.col("n_occ").desc(), uns.asc()]
    top = agg.orderBy(*ordr).limit(top_n)
    w = Window.orderBy(*ordr)
    return top.select(F.row_number().over(w).alias("rnk"), "*")


def bloom_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """Benchmark decontamination through a BLOOM FILTER instead of the
    broadcast shingle set (:func:`contamination_flags`): the bench side is
    folded into an ``m_bits``-bit array (two probes per shingle — the low
    12 bits and bits 32..43 of the already-uniform splitmix64 shingle
    hash), and the corpus side tests membership against the CONSTANT bit
    array — O(m_bits) bytes per executor regardless of eval-set size,
    where the semi-join variant broadcasts every distinct bench shingle.
    At 100 TB the eval suite is still small, but a PRIVATE holdout of a
    few GB of shingles stops being broadcastable; the bloom keeps the
    probe row-local at a false-positive cost of
    ``(1 - e^(-2n/m))^2`` (~2% at n=500 shingles, m=4096 — sized so the
    pytest pins a real FP example; production uses m >> n).

    Determinism: the bit array is a pure function of the bench shingle
    SET (bit_or is order/partition invariant), probes are bit-mask
    arithmetic on the signed long hash (low bits of the two's-complement
    pattern == low bits of the uint64 the SQL mirror computes), so flags
    replay exactly cross-engine — including false positives.

    Plan shape: bench shingled once -> two tiny aggregates (<= 64 rows)
    collected driver-side (the sketch IS driver-state, parameter-server
    style like the IVF centroids) -> inlined as a literal array into a
    row-local corpus probe: one shingling pass, one hash aggregate per
    doc, ZERO joins.

    Output: (id_col, n_shingles, n_hits, flagged).
    """
    assert m_bits % 64 == 0
    n_words = m_bits // 64
    p_mask = m_bits - 1
    p1_sql = f"(sh & {p_mask})"
    p2_sql = f"(shiftrightunsigned(sh, 32) & {p_mask})"

    bsh = word_shingles(bench, text_col, k).select(F.explode("shingles").alias("sh"))
    pos = bsh.select(F.expr(p1_sql).alias("p")).unionAll(
        bsh.select(F.expr(p2_sql).alias("p"))
    )
    word_rows = (
        pos.select(
            F.expr("shiftright(p, 6)").alias("wi"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))").alias("bit"),
        )
        .groupBy("wi")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in word_rows:
        words[int(r["wi"])] = int(r["word"])
    arr_sql = "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in words) + ")"

    def bit_set_sql(ps: str) -> str:
        return (
            f"((shiftrightunsigned(element_at({arr_sql},"
            f" CAST(shiftright({ps}, 6) AS INT) + 1),"
            f" CAST(({ps}) & 63 AS INT)) & 1) = 1)"
        )

    csh = word_shingles(corpus, text_col, k).select(
        id_col, F.explode("shingles").alias("sh")
    )
    probed = csh.select(
        id_col,
        F.expr(
            f"CAST({bit_set_sql(p1_sql)} AND {bit_set_sql(p2_sql)} AS INT)"
        ).alias("hit"),
    )
    agg = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("hit").cast("long").alias("n_hits"),
    )
    return (
        corpus.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("flagged"),
        )
    )


def sparse_cosine_pairs(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap_ppm: int = 50_000,
    min_shared: int = 2,
    cos_num: int = 7,
    cos_den: int = 8,
    dense_vocab_max: int = 4096,
    dense_block: int = 1024,
    doc_top_k: int | None = 256,
) -> DataFrame:
    """Lexical (bag-of-words TF) cosine similarity pairs through an
    INVERTED INDEX — the sparse-vector complement of the MinHash/SimHash
    near-dup detectors: exact cosine on term-frequency vectors, not a
    sketch. Deliberately log-free (no idf — engines' ``log`` is banned by
    the exactness discipline); rare-term emphasis comes from DF-PRUNING:
    words appearing in more than ``df_cap_ppm``-millionths of the corpus
    are dropped from every vector BEFORE pairing (the cap is
    corpus-RELATIVE — ``df·10⁶ ≤ N·ppm`` as an integer cross-multiplied
    predicate joined against a broadcast one-row count, so the same query
    is meaningful at every SF) — the standard stop-token cut that also
    caps the postings self-join fanout per word, the
    difference between a shuffle and a meltdown at 10^12 docs (a stopword
    posting list would otherwise pair every document with every other).

    The default ``df_cap_ppm=50_000`` (5% of docs) actually BINDS on real
    Zipfian text: it drops the whole high-df head whose posting lists
    dominate the Σ_w C(df_w, 2) join fanout (a 90% cap would prune almost
    nothing — only true boilerplate). On top of it, ``doc_top_k`` keeps
    only each document's top-k surviving terms by (tf desc, word asc) —
    the standard truncated-TF vector — bounding every doc's posting
    contribution; cosine (dot AND norms) is computed on the trimmed
    vectors identically in both legs. Synthetic/test corpora with tiny
    vocabularies can restore the permissive behavior explicitly
    (``df_cap_ppm=900_000`` as the contract query does; every doc there
    has ≤ 31 distinct words so ``doc_top_k`` is a no-op).

    .. note:: **Behavior change in r4** — the defaults moved from
       ``df_cap_ppm=900_000`` / no truncation to ``50_000`` /
       ``doc_top_k=256``: default-calling code now computes cosines on
       DF-pruned, top-k-truncated vectors and may emit a different pair
       set than r3. Pass ``df_cap_ppm=900_000, doc_top_k=None`` to
       reproduce the old semantics exactly.

    Exactness: tf are integer counts; ``dot = Σ tf_a·tf_b`` and the
    norms ``n2 = Σ tf²`` are BIGINTs; the similarity THRESHOLD is the
    cross-multiplied integer predicate ``den²·dot² ≥ num²·n2_a·n2_b``
    (cos ≥ num/den, dot ≥ 0) — no float ever decides membership — and the
    emitted ``cos`` is the fixed chain dot/sqrt(n2_a)/sqrt(n2_b) of
    correctly-rounded IEEE ops (the spearman recipe). Bound: dot² ≤
    n2_a·n2_b (Cauchy-Schwarz), n2 ≤ len·max_tf² — far inside BIGINT.

    Plan — HYBRID on the pruned vocabulary size (the output is identical
    either way; the oracle doesn't care which path ran):

    - **large vocab** (> ``dense_vocab_max``, the Zipfian-text regime
      where df-pruning binds): explode → (doc, word) tf hash-agg → df
      hash-agg, then the postings SELF-JOIN on word with doc_a < doc_b →
      one (pair) hash-agg; norms ride the postings table. Join fanout is
      Σ_w C(df_w, 2) over the df-capped, top-k-trimmed postings — the 5%
      cap removes the head that dominates that sum on Zipfian text (the
      pytest pins the reduction on a synthetic Zipf corpus).
    - **small vocab** (≤ ``dense_vocab_max``): the inverted index
      DEGENERATES — with few distinct surviving terms every posting list
      is a large fraction of the corpus and Σ C(df,2) is Θ(n²) ROWS
      through a shuffle (measured 116 s at sf0.1 on the 31-word test
      corpus). Docs are then short dense integer vectors, so the right
      plan is blocked ALL-PAIRS GEMM: docs → dense tf vectors (one
      shuffle), blocks of ``dense_block`` docs, one Arrow task per block
      pair doing integer ``L @ Rᵀ`` for dot/shared-count — the Θ(n²)
      work stays as in-kernel multiply-adds (thousands per row-pair)
      instead of shuffled rows, and block-pair count scales the
      parallelism. Same integer predicate, same float chain.

    Output: (id_a, id_b, n_shared, dot, n2_a, n2_b, cos).
    """
    words = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT)).alias("w"),
    )
    tf = words.groupBy("_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ndocs = corpus.agg(F.count(F.lit(1)).alias("nd"))
    kept = (
        dfreq.crossJoin(F.broadcast(ndocs))
        .where(F.col("df") * 1_000_000 <= F.col("nd") * df_cap_ppm)
        .select("w")
    )
    def _trim(p: DataFrame) -> DataFrame:
        # truncated-TF vectors: each doc keeps its top-k surviving terms
        # by (tf desc, word asc) — deterministic tie-break, one window on
        # the doc key (per-doc cardinality bounded by the doc's distinct
        # words, never corpus-global)
        if not doc_top_k:
            return p
        wk = Window.partitionBy("_id").orderBy(F.col("tf").desc(), F.col("w").asc())
        return (
            p.withColumn("_rk", F.row_number().over(wk))
            .where(F.col("_rk") <= int(doc_top_k))
            .drop("_rk")
        )

    if dense_vocab_max:
        probe = kept.limit(dense_vocab_max + 1).collect()
        if len(probe) <= dense_vocab_max:
            vocab = sorted(r.w for r in probe)
            spark = corpus.sparkSession
            if not vocab:
                return spark.createDataFrame(
                    [],
                    "id_a long, id_b long, n_shared long, dot long, "
                    "n2_a long, n2_b long, cos double",
                )
            postings_d = _trim(tf.where(F.col("w").isin(vocab)))
            nd_val = int(corpus.count())
            return _dense_cosine_pairs(
                spark, postings_d, vocab, nd_val, min_shared, cos_num, cos_den, dense_block
            )
    postings = _trim(tf.join(kept, "w"))
    norms = postings.groupBy("_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2")
    )
    a = postings.select(F.col("w"), F.col("_id").alias("id_a"), F.col("tf").alias("tfa"))
    b = postings.select(F.col("w").alias("wb"), F.col("_id").alias("id_b"), F.col("tf").alias("tfb"))
    pairs = (
        a.join(b, (F.col("w") == F.col("wb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(F.col("tfa") * F.col("tfb")).cast("long").alias("dot"),
        )
        .where(F.col("n_shared") >= min_shared)
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("n2").alias("n2_b"))
    out = pairs.join(na, "id_a").join(nb, "id_b")
    keep = (
        F.lit(cos_den * cos_den) * F.col("dot") * F.col("dot")
        >= F.lit(cos_num * cos_num) * F.col("n2_a") * F.col("n2_b")
    )
    return out.where(keep).select(
        "id_a",
        "id_b",
        "n_shared",
        "dot",
        "n2_a",
        "n2_b",
        (
            F.col("dot").cast("double")
            / F.sqrt(F.col("n2_a").cast("double"))
            / F.sqrt(F.col("n2_b").cast("double"))
        ).alias("cos"),
    )


def _dense_cosine_pairs(
    spark,
    postings: DataFrame,
    vocab: list[str],
    ndocs: int,
    min_shared: int,
    cos_num: int,
    cos_den: int,
    dense_block: int,
) -> DataFrame:
    """Small-vocab all-pairs cosine as blocked integer GEMM (the dense leg
    of :func:`sparse_cosine_pairs`): per-doc (word, tf) lists grouped once,
    docs assigned to ``doc_id mod nb`` blocks, one Arrow task per block
    pair (ba ≤ bb) computing ``dot = L @ Rᵀ`` and the shared-term count as
    a 0/1 GEMM — exact int64 throughout, the cosine double emitted as the
    same dot/sqrt(n2_a)/sqrt(n2_b) chain (divisions ordered by id_a/id_b
    AFTER pair orientation, so the value is bit-identical to the
    inverted-index leg and the SQL oracle). Diagonal tasks keep id_a <
    id_b; off-diagonal tasks orient each pair by id. Each doc ships to
    2·nb−1 tasks — the Θ(n²) candidate work stays as multiply-adds inside
    kernels, never as shuffled rows."""
    widx = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    nb = max(1, -(-int(ndocs) // dense_block))
    dv = (
        postings.groupBy("_id")
        .agg(F.collect_list(F.struct("w", "tf")).alias("wt"))
        # pmod: negative doc_ids must land in [0, nb) or they would match
        # no (ba, bb) row and silently vanish from every block pair
        .withColumn("bid", F.pmod(F.col("_id"), F.lit(nb)).cast("int"))
    )
    bp = spark.createDataFrame(
        [(i, j) for i in range(nb) for j in range(i, nb)], "ba int, bb int"
    )
    left = dv.join(F.broadcast(bp), F.col("bid") == F.col("ba")).select(
        "ba", "bb", F.lit(0).alias("side"), "_id", "wt"
    )
    right = dv.join(
        F.broadcast(bp), (F.col("bid") == F.col("bb")) & (F.col("ba") != F.col("bb"))
    ).select("ba", "bb", F.lit(1).alias("side"), "_id", "wt")
    out_schema = (
        "id_a long, id_b long, n_shared long, dot long, n2_a long, n2_b long, cos double"
    )
    cols = ["id_a", "id_b", "n_shared", "dot", "n2_a", "n2_b", "cos"]
    c2, t2 = cos_den * cos_den, cos_num * cos_num

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ba, bb = int(key[0]), int(key[1])

        def densify(sub: pd.DataFrame):
            ids = sub["_id"].to_numpy(dtype=np.int64)
            M = np.zeros((len(ids), V), dtype=np.int64)
            for r, lst in enumerate(sub["wt"].to_numpy()):
                for item in lst:
                    M[r, widx[item["w"]]] = item["tf"]
            return ids, M

        lf = pdf[pdf["side"] == 0]
        idl, Ml = densify(lf)
        if ba == bb:
            idr, Mr = idl, Ml
        else:
            idr, Mr = densify(pdf[pdf["side"] == 1])
        if len(idl) == 0 or len(idr) == 0:
            return pd.DataFrame(columns=cols)
        dot = Ml @ Mr.T
        shared = (Ml > 0).astype(np.int64) @ (Mr > 0).astype(np.int64).T
        n2l = (Ml * Ml).sum(axis=1)
        n2r = (Mr * Mr).sum(axis=1)
        cand = shared >= min_shared
        if ba == bb:
            cand &= idl[:, None] < idr[None, :]
        ii, jj = np.nonzero(cand)
        if len(ii) == 0:
            return pd.DataFrame(columns=cols)
        d, sh = dot[ii, jj], shared[ii, jj]
        a_id, b_id = idl[ii], idr[jj]
        n2a, n2b = n2l[ii], n2r[jj]
        swap = a_id > b_id
        a_id, b_id = np.where(swap, b_id, a_id), np.where(swap, a_id, b_id)
        n2a, n2b = np.where(swap, n2b, n2a), np.where(swap, n2a, n2b)
        # int64 predicate wraps silently once c2·d² or t2·n2a·n2b nears
        # 2^63 (d² ≤ n2a·n2b by Cauchy-Schwarz, so bounding the norm side
        # bounds both); fall back to exact Python ints on the candidate
        # subset — the inverted-index leg under ANSI errors loudly here,
        # the two legs must not silently disagree at extreme tf scales
        n2m = int(max(n2a.max(initial=0), n2b.max(initial=0)))
        if max(c2, t2) * n2m * n2m < 2**63:
            keep = c2 * d * d >= t2 * n2a * n2b
        else:
            keep = np.fromiter(
                (
                    c2 * int(x) * int(x) >= t2 * int(p) * int(q)
                    for x, p, q in zip(d, n2a, n2b)
                ),
                dtype=bool,
                count=len(d),
            )
        if not keep.any():
            return pd.DataFrame(columns=cols)
        d, sh = d[keep], sh[keep]
        a_id, b_id, n2a, n2b = a_id[keep], b_id[keep], n2a[keep], n2b[keep]
        cos = d.astype(np.float64) / np.sqrt(n2a.astype(np.float64)) / np.sqrt(
            n2b.astype(np.float64)
        )
        return pd.DataFrame(
            {
                "id_a": a_id,
                "id_b": b_id,
                "n_shared": sh,
                "dot": d,
                "n2_a": n2a,
                "n2_b": n2b,
                "cos": cos,
            }
        )

    return left.unionAll(right).groupBy("ba", "bb").applyInPandas(kernel, out_schema)
