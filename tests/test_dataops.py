"""Training-data pipeline operators: dedup (exact/MinHash-LSH/SimHash/
Jaccard), text analysis, similarity search, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from forecaster_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash,
    simhash_dup_pairs,
    word_shingles,
)
from forecaster_spark.operators.multimodal import extract_features, frame_sample, synth_assets
from forecaster_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_lsh,
    embedding_neardup_pairs,
)
from forecaster_spark.operators.textops import (
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        ("d00", "the quick brown fox jumps over the lazy dog and runs to the hills"),
        ("d01", "the quick brown fox jumps over the lazy dog and runs to the hills"),  # exact dup
        ("d02", "the quick brown fox jumps over the lazy dog and walks to the hills"),  # near dup
        ("d03", "der schnelle braune fuchs springt über den faulen hund und läuft"),
        ("d04", "le renard brun rapide saute par dessus le chien paresseux dans les bois"),
        ("d05", "el zorro marron salta sobre el perro perezoso y corre por la colina"),
        ("d06", "completely different content about spark aggregation pipelines at scale"),
        ("d07", "!!!! ???? .... ,,,, ;;;; @@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"),
    ]
    return spark.createDataFrame(pd.DataFrame(base, columns=["doc_id", "text"]))


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs, ["text"]).toPandas()
    assert len(out) == 7  # d01 removed
    assert "d00" in set(out.doc_id) and "d01" not in set(out.doc_id)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_lsh_pairs(docs, num_perm=32, bands=8, verify_jaccard=0.5).toPandas()
    got = {tuple(sorted(p)) for p in zip(pairs.id_a, pairs.id_b)}
    assert ("d00", "d01") in got  # exact dup certainly caught
    assert ("d00", "d02") in got or ("d01", "d02") in got  # near dup
    assert all("d06" not in p and "d07" not in p for p in got)
    assert (pairs.jaccard >= 0.5).all()


def test_fused_band_table_matches_composed_chain(spark, docs):
    """minhash_band_table is the fused fast path for the shingle→signature→
    bands chain; it must be bit-identical to the composition, including the
    NULL / empty / shorter-than-k edge docs."""
    from forecaster_spark.operators.dedup import (
        lsh_bands,
        minhash_band_table,
        minhash_signature,
        word_shingles,
    )

    edge = spark.createDataFrame(
        pd.DataFrame(
            [
                ("e00", None),  # NULL text → no band rows
                ("e01", ""),  # zero words after split
                ("e02", "one"),  # m < k: one whole-doc shingle
                ("e03", "two words"),  # m < k
                ("e04", "exactly three words"),  # m == k
                ("e05", "  leading and trailing  spaces  here  "),
            ],
            columns=["doc_id", "text"],
        )
    )
    import random

    rng = random.Random(20260818)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCXYZ0123456789"
        "äöüßéèñçабвгдеёж中文字符émoji✓✗€$%&@#.,;:!?()[]-_/"
    )
    seps = [" ", "  ", "\t", "\n", " \t ", "\x0b"]  # incl. the Java-\s VT edge

    def rand_word():
        # word lengths cross the MAX_WORD_CP=256 truncation boundary
        n = rng.choice([1, 2, 3, 5, 8, 20, 120, 255, 256, 300])
        return "".join(rng.choice(alphabet) for _ in range(n))

    def rand_doc(i):
        m = rng.choice([0, 1, 2, 3, 4, 10, 40])
        words = [rand_word() for _ in range(m)]
        if m > 4 and rng.random() < 0.5:  # duplicate-heavy docs
            words = words[:3] * (m // 3 + 1)
        return (f"r{i:03d}", rng.choice(seps).join(words))

    fuzz = spark.createDataFrame(
        pd.DataFrame([rand_doc(i) for i in range(200)], columns=["doc_id", "text"])
    )
    for frame in (docs, edge, fuzz):
        for num_perm, bands in ((32, 8), (16, 4)):
            fused = minhash_band_table(frame, num_perm=num_perm, bands=bands).toPandas()
            composed = lsh_bands(
                minhash_signature(word_shingles(frame), num_perm=num_perm),
                bands=bands,
            ).toPandas()
            key = ["doc_id", "band_id"]
            a = fused.sort_values(key).reset_index(drop=True)
            b = composed.sort_values(key).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": ["d00"], "id_b": ["d01"]}))
    out = ngram_jaccard(docs, pairs).toPandas()
    assert out.jaccard.iloc[0] == 1.0


def test_simhash_duplicates_and_stability(spark, docs):
    sh = simhash(docs).toPandas().set_index("doc_id")["simhash"]
    assert sh["d00"] == sh["d01"]
    # near-dup signatures are close in hamming distance
    ham = bin(np.uint64(sh["d00"]) ^ np.uint64(sh["d02"])).count("1")
    assert ham <= 12
    ham_far = bin(np.uint64(sh["d00"]) ^ np.uint64(sh["d06"])).count("1")
    assert ham_far > ham
    dups = simhash_dup_pairs(simhash(docs)).toPandas()
    assert {("d00", "d01")} == set(zip(dups.id_a, dups.id_b))


def test_simhash_neardup_blocking_is_lossless(spark):
    """Pigeonhole chunk blocking must find EXACTLY the pairs brute-force
    all-pairs hamming finds (d bit flips leave >= 1 of d+1 chunks intact)."""
    from itertools import combinations

    from forecaster_spark.operators.dedup import simhash_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.integers(0, 2**63, 12, dtype=np.int64)
    sigs = list(base)
    for i in range(8):  # planted near-misses: flip 1..4 bits of some base sig
        s = int(base[i % len(base)])
        for b in rng.choice(64, 1 + i % 4, replace=False):
            s ^= 1 << int(b)
        sigs.append(np.int64(np.uint64(s % 2**64) - (1 << 64) if s >= 2**63 else s))
    pdf = pd.DataFrame({"doc_id": [f"d{i:02d}" for i in range(len(sigs))],
                        "simhash": np.array(sigs, dtype=np.int64)})
    sdf = spark.createDataFrame(pdf)
    got = simhash_neardup_pairs(sdf, max_hamming=3).toPandas()
    got_join = simhash_neardup_pairs(sdf, max_hamming=3, strategy="join").toPandas()
    assert (
        sorted(map(tuple, got_join[["id_a", "id_b", "hamming"]].to_numpy().tolist()))
        == sorted(map(tuple, got[["id_a", "id_b", "hamming"]].to_numpy().tolist()))
    )
    want = {
        (f"d{i:02d}", f"d{j:02d}"): bin(int(np.uint64(sigs[i]) ^ np.uint64(sigs[j]))).count("1")
        for i, j in combinations(range(len(sigs)), 2)
        if bin(int(np.uint64(sigs[i]) ^ np.uint64(sigs[j]))).count("1") <= 3
    }
    got_d = {(r.id_a, r.id_b): r.hamming for r in got.itertuples()}
    assert got_d == want


def test_simhash_wide_document_no_overflow():
    """A document with >32767 words must not overflow the per-bit tallies
    (r2 bug: reduceat kept int16). Equal word multiplicities give the same
    sign pattern, so the 42k-word doc must hash identically to its 3-word
    vocabulary."""
    from forecaster_spark.operators.dedup import _simhash_from_words

    raw = _simhash_from_words.func
    big = raw(pd.Series([["alpha", "beta", "gamma"] * 14000]))[0]
    small = raw(pd.Series([["alpha", "beta", "gamma"]]))[0]
    assert big == small


def test_lang_id(spark, docs):
    out = with_lang_id(docs).toPandas().set_index("doc_id")["lang_pred"]
    assert out["d00"] == "en"
    assert out["d03"] == "de"
    assert out["d04"] == "fr"
    assert out["d05"] == "es"
    assert out["d07"] == "und"


def test_quality_and_tokens(spark, docs):
    out = with_token_counts(with_quality(docs)).toPandas().set_index("doc_id")
    assert out.loc["d00", "quality"] > out.loc["d07", "quality"]
    assert out.loc["d00", "n_tokens_ws"] == 14
    assert out.loc["d07", "punct_ratio"] > 0.5
    # BPE-ish count ≥ whitespace count for normal prose
    assert out.loc["d00", "n_tokens_bpe"] >= out.loc["d00", "n_tokens_ws"]


def test_fingerprint_blocking(spark, docs):
    out = with_fingerprint(docs).toPandas().set_index("doc_id")["fingerprint"]
    assert list(out["d00"]) == list(out["d01"])
    shared = len(set(out["d00"]) & set(out["d02"]))
    assert shared >= 2  # near-dups share most sketch elements
    assert len(set(out["d00"]) & set(out["d06"])) <= 1


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-dup of 0
    pdf = pd.DataFrame({"vec_id": np.arange(40), "embedding": list(base)})
    return spark.createDataFrame(pdf)


def test_cosine_topk_brute(spark, emb):
    q = emb.where(F.col("vec_id") < 3)
    out = cosine_topk_brute(emb, q, k=5).toPandas()
    assert set(out.query_id) == {0, 1, 2}
    assert (out.groupby("query_id").size() == 5).all()
    top0 = out[(out.query_id == 0) & (out["rank"] == 1)].iloc[0]
    assert top0.neighbor_id == 1 and top0.cosine > 0.99
    # matches a numpy oracle
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    cos = M @ M[0] / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[0]))
    cos[0] = -np.inf
    want = set(np.argsort(-cos)[:5])
    got = set(out[out.query_id == 0].neighbor_id)
    assert got == want


def test_cosine_topk_lsh_recall(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    brute = cosine_topk_brute(emb, q, k=3).toPandas()
    ann = cosine_topk_lsh(emb, q, dim=16, k=3, n_planes=4).toPandas()
    # rank-1 neighbor recall (tiny corpus, 4 planes → 16 buckets)
    b1 = brute[brute["rank"] == 1].set_index("query_id").neighbor_id
    a1 = ann[ann["rank"] == 1].set_index("query_id").neighbor_id
    hits = sum(a1.get(qid, -1) == b1[qid] for qid in b1.index)
    assert hits >= 2
    assert (ann.cosine <= 1.0 + 1e-9).all()


def test_cosine_topk_ivf_recall(spark, emb):
    from forecaster_spark.operators.similarity import cosine_topk_ivf

    q = emb.where(F.col("vec_id") < 5)
    brute = cosine_topk_brute(emb, q, k=3).toPandas()
    ann = cosine_topk_ivf(emb, q, dim=16, k=3, n_centroids=4, n_probe=2).toPandas()
    # with 4 cells and 2 probes, half the corpus is scanned → rank-1 recall
    # should be high on 40 vectors
    b1 = brute[brute["rank"] == 1].set_index("query_id").neighbor_id
    a1 = ann[ann["rank"] == 1].set_index("query_id").neighbor_id
    hits = sum(a1.get(qid, -1) == b1[qid] for qid in b1.index)
    assert hits >= 3
    assert (ann.groupby("query_id").size() <= 3).all()
    # determinism: identical output on a second run (no RNG anywhere)
    ann2 = cosine_topk_ivf(emb, q, dim=16, k=3, n_centroids=4, n_probe=2).toPandas()
    pd.testing.assert_frame_equal(
        ann.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ann2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_cosine_topk_sq8(spark, emb):
    from forecaster_spark.operators.similarity import cosine_topk_sq8, sq8_quantize_np

    q = emb.where(F.col("vec_id") < 5)
    out = cosine_topk_sq8(emb, q, k=3, scale_bits=7).toPandas()
    assert (out.groupby("query_id").size() == 3).all()
    # exact numpy oracle on the integer dots (quantization + integer GEMM
    # are both deterministic — values must match bit-for-bit)
    pdf = emb.toPandas().sort_values("vec_id")
    C = sq8_quantize_np(np.stack(pdf.embedding.to_numpy()), 7)
    D = C @ C[:5].T
    for r in out.itertuples():
        assert r.dot_q == D[int(r.neighbor_id), int(r.query_id)]
    # quantization noise is bounded → rank-1 recall vs the exact float
    # baseline stays high on a 40-vector corpus
    brute = cosine_topk_brute(emb, q, k=3).toPandas()
    b1 = brute[brute["rank"] == 1].set_index("query_id").neighbor_id
    a1 = out[out["rank"] == 1].set_index("query_id").neighbor_id
    hits = sum(a1.get(qid, -1) == b1[qid] for qid in b1.index)
    assert hits >= 3
    # codes are clamped to the int8 range
    assert np.abs(C).max() <= 128


def test_embedding_neardup(spark, emb):
    out = embedding_neardup_pairs(emb, dim=16, threshold=0.95, n_planes=4).toPandas()
    assert (0, 1) in set(zip(out.id_a, out.id_b))


def test_bpe_learn_matches_sennrich_reference(spark):
    """Iterated BPE merge learning ≡ the classic single-machine Sennrich
    algorithm (counts off the word-frequency vocab, overlapping pair
    stats, left-to-right non-overlapping merge application, count-desc /
    pair-asc tie-break) — merge-for-merge, count-for-count."""
    from collections import Counter

    from forecaster_spark.operators.textops import bpe_learn, bpe_merge_round

    texts = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest new new news",
        "lowly lowly holo holo holo wide wide wider",
        None,
    ]

    def ref_bpe(texts, n):
        vocab = Counter()
        for t in texts:
            if t is None:
                continue
            for w in t.lower().split():
                vocab[tuple(w)] += 1
        merges = []
        for _ in range(n):
            stats = Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += f
            if not stats:
                break
            (l, r), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            merges.append((l, r, cnt))
            nv = Counter()
            for syms, f in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                nv[tuple(res)] += f
            vocab = nv
        return merges

    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    expected = ref_bpe(texts, 8)
    assert len(expected) == 8  # corpus rich enough for all rounds
    got = bpe_learn(df, n_merges=8)
    assert got == expected
    # and the contract-surface single round picks the same first merge
    first = bpe_merge_round(df, topk=1).collect()[0]
    assert (first["left_s"], first["right_s"], first["pair_n"]) == expected[0]


def test_r5_edge_guards(spark):
    """Review-pass fixes stay fixed: (a) NULL-source docs survive the
    budget join (eqNullSafe); (b) CDC with g>=5 on a tiny corpus doesn't
    crash on the wrapped slice; (c) zero-norm embeddings get NULL max /
    false contaminated instead of NaN; (d) the testdata's worst-case
    subword count sits far under bpe_encode_sql's 8192 power bound;
    (e) n_shards=1 budget (the Java shift-mask edge) matches sharded."""
    import duckdb as _duck

    from forecaster_spark.operators.dedup import cdc_chunk_ledger
    from forecaster_spark.operators.sampling import (
        source_token_budget,
        source_token_budget_sql,
    )
    from forecaster_spark.operators.similarity import semantic_contamination

    # (a) + (e)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["a", None, "a", None],
            "text": ["w1 w2 w3", "x1 x2", "y1", "z1 z2 z3 z4"],
        }
    )
    df = spark.createDataFrame(pdf)
    got = source_token_budget(df, budget=4).toPandas()
    assert len(got) == 4  # NULL-source rows kept
    con = _duck.connect()
    con.register("documents", pdf)
    oracle = con.execute(source_token_budget_sql(budget=4)).df()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = oracle.sort_values("doc_id").reset_index(drop=True).astype(a.dtypes.to_dict())
    assert a.equals(b)
    g1 = source_token_budget(df, budget=4, n_shards=1).toPandas()
    assert a.equals(g1.sort_values("doc_id").reset_index(drop=True))

    # (b)
    tiny = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "c d e f g h c d e f g h"]})
    )
    out = cdc_chunk_ledger(tiny, g=6, mask_bits=1, top_n=10).toPandas()
    assert len(out) >= 0  # no crash; dup spans within doc 1 may surface

    # (c)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [10, 11],
                "embedding": [[0.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]],
            }
        ),
        schema="vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1], "embedding": [[1.0, 1.0, 0.0, 0.0], [0.0] * 4]}),
        schema="vec_id long, embedding array<float>",
    )
    sc = semantic_contamination(emb, bench, dim=4, threshold=0.5).toPandas().set_index("vec_id")
    assert pd.isna(sc.loc[10, "max_cos_u6"]) and not sc.loc[10, "contaminated"]
    assert sc.loc[11, "contaminated"]  # cos vs [1,1,0,0] = 0.707
    with pytest.raises(Exception, match="dim|empty"):
        semantic_contamination(emb, bench, dim=8).toPandas()

    # (d) worst-case subword count across all SFs << 8192
    mx = con.execute(
        "SELECT max(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g'))) "
        "FROM read_parquet('/root/testdata/sf0.1/documents.parquet')"
    ).fetchone()[0]
    assert mx < 2048, mx


def test_source_token_budget_semantics(spark):
    """Budget-cap semantics: within each source's hash order the doc that
    CROSSES the budget is the last kept and everything after is dropped;
    a single giant source (the skew case the sharded form exists for)
    agrees with a direct python replay."""
    from forecaster_spark.functions import xhash
    from forecaster_spark.operators.sampling import source_token_budget

    rng = np.random.default_rng(9)
    rows = [
        (i, "giant", " ".join("w" * 1 for _ in range(int(rng.integers(1, 30)))))
        for i in range(400)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    got = source_token_budget(df, budget=500, seed=11).toPandas()
    # python replay: sort by (splitmix(id*23), id), running sum
    mult = np.uint64(23)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    h = xhash.splitmix64(ids.view(np.uint64) * mult)
    ntok = np.array([len(r[2].split()) for r in rows])
    order = np.lexsort((ids, h))
    run = np.cumsum(ntok[order])
    kept_ids = set(ids[order][np.flatnonzero(run - ntok[order] < 500)])
    assert set(got[got.kept].doc_id) == kept_ids
    # boundary: last kept crosses the line, first dropped starts past it
    kept_sorted = got[got.kept].sort_values("run_tok")
    assert kept_sorted.run_tok.iloc[-1] >= 500
    assert (got[~got.kept].run_tok - got[~got.kept].n_tok >= 500).all()


def test_bpe_encode_matches_reference_encoder(spark):
    """bpe_encode ≡ the classic GPT-2-style reference encoder (min-rank
    merge loop, left-to-right non-overlap) on an edge corpus — counts AND
    the exact subword sequences (via per-doc token checksums recomputed
    from the reference's symbol stream)."""
    from forecaster_spark.functions import xhash
    from forecaster_spark.operators.textops import DEMO_MERGES, bpe_encode

    ranks = {p: i for i, p in enumerate(DEMO_MERGES)}

    def ref_encode(w):
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            l, rr = DEMO_MERGES[best]
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    res.append(l + rr)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    texts = [
        (0, "lower slower stow stern merger partner"),
        (1, "  spaced   out  "),
        (2, "ststst atatat inin a"),
        (3, "über naïve ROW lower"),
    ]
    df = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    got = bpe_encode(df).toPandas().set_index("doc_id")
    for doc_id, text in texts:
        words = text.lower().split(" ")  # keep empties, like WS_SPLIT on ' '
        flat = [s for w in words for s in ref_encode(w)]
        toks = (xhash.word_hash_flat(flat) & np.uint64((1 << 31) - 1)) if flat else []
        n = len(flat)
        cs = 0
        for i, t in enumerate(toks):
            cs = (cs + int(t) * pow(31, n - 1 - i, 1 << 64)) % (1 << 64)
        cs = cs - (1 << 64) if cs >= 1 << 63 else cs
        assert got.loc[doc_id, "n_subwords"] == n, doc_id
        assert got.loc[doc_id, "bpe_checksum"] == cs, doc_id
    # sanity: the learned merges actually compress (subwords < chars)
    chars = sum(len(w) for _d, t in texts for w in t.split())
    assert got["n_subwords"].sum() < chars


def test_semantic_dedup_planted_recall(spark):
    """SemDeDup composition on a planted near-dup set: 3 groups of vectors
    within cosine ≥ 0.999 of each other plus isolated noise vectors. Every
    planted group must collapse to ONE kept canonical member, isolated
    vectors all keep, and the verdicts must equal brute-force all-pairs
    connected components (recall 1.0 — planted dups co-cluster by
    construction, the SemDeDup within-cell assumption)."""
    from forecaster_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(17)
    dim, rows = 16, []
    for g in range(3):  # groups of 4 near-identical vectors
        base = rng.standard_normal(dim)
        for j in range(4):
            v = base + rng.standard_normal(dim) * 1e-3
            rows.append((g * 100 + j, (v / np.linalg.norm(v)).astype(np.float32)))
    for i in range(20):  # isolated noise
        v = rng.standard_normal(dim)
        rows.append((1000 + i, (v / np.linalg.norm(v)).astype(np.float32)))
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [list(map(float, r[1])) for r in rows]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    out = (
        semantic_dedup(df, dim=dim, threshold=0.95, n_centroids=4)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert len(out) == 32
    for g in range(3):
        ids = [g * 100 + j for j in range(4)]
        assert (out.loc[ids, "dup_cluster"] == g * 100).all()
        assert out.loc[ids, "keep"].tolist() == [True, False, False, False]
    iso = out.loc[[1000 + i for i in range(20)]]
    assert iso.keep.all() and (iso.dup_cluster == iso.index).all()
    # brute-force cross-check: all-pairs cosine >= threshold -> union-find
    M = np.stack([np.array(r[1], dtype=np.float64) for r in rows])
    ids = np.array([r[0] for r in rows])
    cos = M @ M.T
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if cos[a, b] >= 0.95:
                ra, rb = find(int(ids[a])), find(int(ids[b]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    brute = {int(i): find(int(i)) for i in ids}
    assert {i: int(c) for i, c in out.dup_cluster.items()} == brute


def test_semantic_dedup_margins(spark):
    """Pin the decision margins that make semantic_dedup_embeddings'
    integer contract drift-free on the driver data: (a) the winning
    centroid's dot lead over the runner-up, (b) the distance of every
    within-cell candidate cosine from the 0.2 threshold. Cross-engine
    float drift is ~1e-12; both margins must sit orders of magnitude
    above it."""
    from forecaster_spark.operators.similarity import ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    C = ivf_centroids(emb, dim=64, n_centroids=16, n_iter=2, exact=True)
    pdf = emb.select("vec_id", "embedding").toPandas()
    M = np.stack(pdf.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    dots = Mn @ np.asarray(C).T
    srt = np.sort(dots, axis=1)
    assign_gap = float((srt[:, -1] - srt[:, -2]).min())
    assert assign_gap > 1e-6, assign_gap
    cells = np.argmax(dots, axis=1)
    norm = np.linalg.norm(M, axis=1)
    thr_margin = np.inf
    for c in np.unique(cells):
        idx = np.flatnonzero(cells == c)
        sub = M[idx] @ M[idx].T / np.outer(norm[idx], norm[idx])
        iu = np.triu_indices(len(idx), 1)
        if len(iu[0]):
            thr_margin = min(thr_margin, float(np.abs(sub[iu] - 0.2).min()))
    assert thr_margin > 1e-6, thr_margin  # measured ~1.9e-5 at sf0.01


def test_semantic_contamination_planted_and_margins(spark):
    """Planted contamination: a near-copy of a bench vector flags, an
    orthogonal vector doesn't, and an exact copy (cos 1.0) is why bench
    members are excluded corpus-side. Margins on the contract data:
    threshold distance and micro-unit floor-boundary distance both sit
    orders of magnitude above the ~1e-15 cross-engine drift."""
    import pandas as _pd

    from forecaster_spark.operators.similarity import semantic_contamination

    rng = np.random.default_rng(31)
    b = rng.standard_normal(16)
    near = b + rng.standard_normal(16) * 1e-2  # cos ~0.9999
    orth = np.zeros(16)
    orth[int(np.argmin(np.abs(b)))] = 1.0  # roughly orthogonal
    df = spark.createDataFrame(
        _pd.DataFrame(
            {
                "vec_id": [100, 101],
                "embedding": [list(map(float, near)), list(map(float, orth))],
            }
        ),
        schema="vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        _pd.DataFrame({"vec_id": [0], "embedding": [list(map(float, b))]}),
        schema="vec_id long, embedding array<float>",
    )
    out = (
        semantic_contamination(df, bench, dim=16, threshold=0.9)
        .toPandas()
        .set_index("vec_id")
    )
    assert bool(out.loc[100, "contaminated"]) and not bool(out.loc[101, "contaminated"])

    # contract-data margins (sf0.01, the driver gate's scale)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").toPandas()
    M = np.stack(emb.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    ids = emb.vec_id.to_numpy()
    B, C = M[ids < 8], M[ids >= 8]
    cos = (C @ B.T) / (
        np.linalg.norm(C, axis=1)[:, None] * np.linalg.norm(B, axis=1)[None, :]
    )
    mc = cos.max(axis=1)
    assert np.abs(mc - 0.35).min() > 1e-6  # measured ~1.8e-3
    fb = np.abs(mc * 1e6 - np.round(mc * 1e6))
    assert fb.min() > 1e-5  # measured ~3.5e-4


def test_multimodal_plumbing(spark):
    assets = synth_assets(spark, 60)
    pdf = assets.toPandas()
    assert len(pdf) == 60 and set(pdf.mime) == {"image/bmp", "audio/wav", "video/avi"}
    feats = extract_features(assets, decode="fake", dim=8).toPandas()
    assert len(feats) == 60
    assert feats.feature.map(len).eq(8).all()
    assert (feats.n_bytes > 0).all()
    # determinism: same asset → same fake feature
    f2 = extract_features(assets, decode="fake", dim=8).toPandas()
    a = feats.sort_values("asset_id").feature.map(tuple).tolist()
    b = f2.sort_values("asset_id").feature.map(tuple).tolist()
    assert a == b
    # strict mode now decodes ALL three formats for real (r5: AVI landed);
    # a compressed container still surfaces the honest pyav seam
    strict = extract_features(assets, decode="strict", dim=8).toPandas()
    assert strict.decoded.all()
    mp4 = spark.createDataFrame(
        [("v-0", "video/mp4", bytearray(b"\0\0\0\x18ftypmp42"), {})],
        schema="asset_id string, mime string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="media decode"):
        extract_features(mp4, decode="strict").collect()
    fs = frame_sample(assets, every_n=4).toPandas()
    assert len(fs) > 0
    assert (fs.frame_idx % 4 == 0).all()


def test_multimodal_real_decode(spark):
    """BMP/WAV codecs round-trip bit-exactly, and the strict kernel computes
    the true parsed dimensions / luma / sample-rate / RMS for hand-built
    fixture payloads."""
    import pandas as _pd

    from forecaster_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
        wav_decode,
        wav_encode,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # odd width → row pad
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)
    samples = rng.integers(-30000, 30000, 777).astype(np.int16)
    s2, sr = wav_decode(wav_encode(samples, 16000))
    assert sr == 16000 and np.array_equal(s2, samples)

    flat = np.full((4, 4, 3), 100, dtype=np.uint8)  # luma exactly 100
    const_wav = np.full(64, 1000, dtype=np.int16)  # RMS exactly 1000
    assets = spark.createDataFrame(
        _pd.DataFrame(
            {
                "asset_id": ["img-0", "wav-0"],
                "mime": ["image/bmp", "audio/wav"],
                "payload": [bmp_encode(flat), wav_encode(const_wav, 8000)],
                "meta": [{}, {}],
            }
        ),
        schema="asset_id string, mime string, payload binary, meta map<string,string>",
    )
    out = extract_features(assets, decode="strict", dim=4).toPandas().set_index("asset_id")
    assert out.loc["img-0", "width"] == 4 and out.loc["img-0", "height"] == 4
    assert out.loc["img-0", "mean_luma"] == pytest.approx(100.0)
    assert out.loc["wav-0", "sample_rate"] == 8000
    assert out.loc["wav-0", "rms"] == pytest.approx(1000.0)
    assert out.loc["wav-0", "n_frames"] == 64
    assert list(out.loc["wav-0", "feature"]) == [1000.0] * 4


def test_video_codec_roundtrip(spark):
    """AVI encode/decode round-trips bit-exactly (incl. odd widths → row
    padding), strict extract computes true dims/frame count/mean luma, and
    decode_frames' integer luma matches a direct numpy recompute."""
    import pandas as _pd

    from forecaster_spark.operators.multimodal import (
        _video_pixels,
        avi_decode,
        avi_encode,
        decode_frames,
        extract_features,
        frame_sample,
        synth_assets,
    )

    rng = np.random.default_rng(11)
    for shape in [(1, 4, 4), (5, 7, 9), (6, 12, 5)]:  # odd widths pad rows
        fr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out, fps = avi_decode(avi_encode(fr, fps=12))
        assert fps == 12 and np.array_equal(out, fr), shape

    flat = np.full((4, 4, 4, 3), 100, dtype=np.uint8)  # luma exactly 100
    assets = spark.createDataFrame(
        _pd.DataFrame(
            {
                "asset_id": ["vid-0"],
                "mime": ["video/avi"],
                "payload": [avi_encode(flat)],
                "meta": [{"frames": "4"}],
            }
        ),
        schema="asset_id string, mime string, payload binary, meta map<string,string>",
    )
    out = extract_features(assets, decode="strict", dim=4).toPandas().iloc[0]
    assert (out.width, out.height, out.n_frames) == (4, 4, 4)
    assert out.mean_luma == pytest.approx(100.0)
    assert list(out.feature) == [100.0] * 4

    # decode_frames ≡ numpy truth on the synthetic corpus, incl. stride
    synth = synth_assets(spark, 45)
    got = (
        decode_frames(synth, every_n=2)
        .toPandas()
        .sort_values(["asset_id", "frame_idx"])
        .reset_index(drop=True)
    )
    truth = []
    for i in range(45):
        if i % 3 != 2:
            continue
        fr = _video_pixels(i)
        px = fr.astype(np.int64)
        milli = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]).sum(axis=(1, 2))
        for f in range(0, fr.shape[0], 2):
            truth.append((f"asset-{i:08d}", f, fr.shape[2], fr.shape[1], int(milli[f])))
    assert list(map(tuple, got.itertuples(index=False))) == sorted(truth)
    # metadata-plan frame_sample agrees with the real-decode path on counts
    fs = frame_sample(synth, every_n=2).toPandas()
    assert len(fs) == len(got)


def test_multimodal_corrupt_payload_auto_fallback(spark):
    """auto mode must survive corrupt/truncated payloads (one bad asset
    cannot abort a 10^12-row job): decoded=False + deterministic fake
    features; strict surfaces the error. Also: real-world AVI layouts —
    an audio strl BEFORE the video one, and top-down (negative-height)
    DIB frames — decode correctly."""
    import pandas as _pd

    from forecaster_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
        extract_features,
    )

    good = np.full((2, 4, 4, 3), 7, dtype=np.uint8)
    blob = avi_encode(good)
    corrupt = blob[:60]  # truncated mid-header
    assets = spark.createDataFrame(
        _pd.DataFrame(
            {
                "asset_id": ["ok", "bad-avi", "bad-bmp"],
                "mime": ["video/avi", "video/avi", "image/bmp"],
                "payload": [blob, corrupt, b"BMnot-a-real-bmp"],
                "meta": [{}, {}, {}],
            }
        ),
        schema="asset_id string, mime string, payload binary, meta map<string,string>",
    )
    out = extract_features(assets, decode="auto", dim=4).toPandas().set_index("asset_id")
    assert out.loc["ok", "decoded"] and out.loc["ok", "n_frames"] == 2
    assert not out.loc["bad-avi", "decoded"] and len(out.loc["bad-avi", "feature"]) == 4
    assert not out.loc["bad-bmp", "decoded"]
    # decode_frames: same posture — skip drops the corrupt asset, fail raises
    from forecaster_spark.operators.multimodal import decode_frames

    vids = assets.where(F.col("mime") == "video/avi")
    fr_ok = decode_frames(vids, on_error="skip").toPandas()
    assert set(fr_ok.asset_id) == {"ok"} and len(fr_ok) == 2
    with pytest.raises(Exception, match="AVI|payload|buffer|unpack"):
        decode_frames(vids, on_error="fail").collect()
    with pytest.raises(Exception, match="AVI|BMP|payload|truncat|buffer"):
        extract_features(
            assets.where(F.col("asset_id") == "bad-avi"), decode="strict"
        ).collect()

    # audio strl first: strf must bind to the vids strh, not the first one
    fr = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    vid = avi_encode(fr)
    import struct as _st

    audio_strh = _st.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"auds", b"\0\0\0\0", 0, 0, 0, 0, 1, 8000, 0, 100, 2, 0, 0, 0, 0, 0, 0,
    )
    audio_strf = _st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    audio_strl = (
        b"LIST"
        + _st.pack("<I", 4 + 8 + len(audio_strh) + 8 + len(audio_strf))
        + b"strl"
        + b"strh" + _st.pack("<I", len(audio_strh)) + audio_strh
        + b"strf" + _st.pack("<I", len(audio_strf)) + audio_strf
    )
    # splice the audio strl INSIDE hdrl before the video strl: hdrl starts
    # at 12, its payload at 24 ('hdrl' fourcc at 20, avih chunk 24..88)
    hdrl_size = _st.unpack_from("<I", vid, 16)[0]
    patched = (
        vid[:16]
        + _st.pack("<I", hdrl_size + len(audio_strl))
        + vid[20:88]
        + audio_strl
        + vid[88:]
    )
    patched = patched[:4] + _st.pack("<I", len(patched) - 8) + patched[8:]
    out2, _fps = avi_decode(patched)
    assert np.array_equal(out2, fr)

    # top-down DIB: flip biHeight's sign and rewrite stored rows to display
    # order — decode must NOT flip them again
    td = bytearray(avi_encode(good))
    sig = _st.pack("<IiiHH", 40, 4, 4, 1, 24)  # strf BITMAPINFOHEADER w=4,h=4
    p = bytes(td).find(sig)
    assert p > 0
    _st.pack_into("<Iii", td, p, 40, 4, -4)
    # stored frame bytes: bottom-up BGR; for top-down they must be display
    # order — rewrite each 00db chunk with unflipped rows
    q = 0
    b = bytes(td)
    row_size = 4 * 3  # w=4 → 12, already 4-aligned
    while True:
        q = b.find(b"00db", q)
        if q < 0 or q + 8 + row_size * 4 > len(b):
            break
        frame_at = q + 8
        stored = np.frombuffer(b[frame_at : frame_at + row_size * 4], np.uint8)
        td[frame_at : frame_at + row_size * 4] = stored.reshape(4, row_size)[::-1].tobytes()
        q = frame_at
    out3, _ = avi_decode(bytes(td))
    assert np.array_equal(out3, good)


def test_pack_sequences_greedy_semantics(spark):
    """Greedy token-budget packing: exact fit stays in-bin, overflow starts
    a new bin, an oversized doc gets its own bin, order is deterministic."""
    from forecaster_spark.operators.packing import pack_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(7)],
            "source": "s",
            "n_tok": [300, 212, 100, 900, 10, 502, 512],
        }
    )
    out = (
        pack_sequences(spark.createDataFrame(pdf), budget=512, partition="source")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # d0(300)+d1(212)=512 exact fit -> bin0; d2(100) -> bin1; d3(900)
    # oversized -> bin2 alone; d4(10) -> bin3 (d3 overflowed its bin);
    # d5(502) joins d4 (10+502=512) -> bin3; d6(512) -> bin4
    assert out.bin_id.tolist() == [0, 0, 1, 2, 3, 3, 4]
    assert out.bin_fill.tolist() == [300, 512, 100, 900, 10, 512, 512]


def test_hash_split_deterministic_and_proportional(spark):
    """Hash splits are order/partitioning-invariant pure functions of the
    id (incl. negative ids: two's-complement uint64 view matches the
    oracle's mod-2^64 mapping), and hit the requested proportions."""
    from forecaster_spark.functions import xhash
    from forecaster_spark.operators.sampling import BUCKETS, hash_split

    ids = list(range(20000)) + [-1, -2, -(2**62)]
    pdf = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64)})
    out = hash_split(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    # kernel == pure-numpy definition
    u = np.array(ids, dtype=np.int64).view(np.uint64)
    want = (xhash.splitmix64(u * np.uint64(2 * 42 + 1)) % np.uint64(BUCKETS)).view(np.int64)
    assert np.array_equal(out.loc[ids, "bucket"].to_numpy(), want)
    # shuffled input -> identical assignment
    out2 = hash_split(spark.createDataFrame(pdf.sample(frac=1.0, random_state=7))).toPandas()
    assert out2.set_index("doc_id").loc[ids, "bucket"].equals(out.loc[ids, "bucket"])
    frac = (out["split"] == "train").mean()
    assert 0.975 < frac < 0.985
    assert set(out["split"].unique()) == {"train", "val", "test"}


def test_contamination_flags(spark, docs):
    """Docs sharing any word 3-shingle with the bench set flag true; the
    bench docs themselves flag true; disjoint docs flag false."""
    from forecaster_spark.operators.dedup import contamination_flags

    bench = docs.where(F.col("doc_id") == "d00")
    out = (
        contamination_flags(docs, bench)
        .toPandas()
        .set_index("doc_id")["contaminated"]
    )
    assert out["d00"] and out["d01"]  # exact dup shares everything
    assert out["d02"]  # near dup shares most shingles
    assert not out["d06"] and not out["d03"]  # disjoint content clean


def test_pack_sequences_null_n_tok(spark):
    """Null n_tok packs as 0 tokens (docs with null text join the current
    bin without consuming budget) — kernel and semantics must not crash or
    cascade."""
    from forecaster_spark.operators.packing import pack_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "source": "s",
            "n_tok": pd.array([300, None, 300, 100], dtype="Int64"),
        }
    )
    out = (
        pack_sequences(spark.createDataFrame(pdf), budget=512, partition="source")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # a(300) bin0; b(null→0) bin0 fill stays 300; c(300) overflows → bin1;
    # d(100) joins bin1
    assert out.bin_id.tolist() == [0, 0, 1, 1]
    assert out.bin_fill.tolist() == [300, 300, 300, 400]


def test_bigram_collocations(spark):
    """Adjacent-pair counts with unigram PMI ingredients; empties removed
    before pairing so runs of whitespace don't break adjacency."""
    import pandas as pd

    from forecaster_spark.operators.textops import bigram_collocations

    pdf = pd.DataFrame({"text": [" The cat  sat on the cat ", "the cat", "x", ""]})
    out = (
        bigram_collocations(spark.createDataFrame(pdf), topk=10)
        .toPandas()
        .set_index(["w1", "w2"])
        .sort_index()
    )
    assert out.loc[("the", "cat")].tolist() == [3, 3, 3]
    assert out.loc[("cat", "sat")].tolist() == [1, 3, 1]
    assert out.loc[("on", "the")].tolist() == [1, 1, 3]
    assert len(out) == 4  # no pair from 'x' or ''


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation: a 5-node chain (diameter stresses the loop),
    a 2-node island, and a self-contained triangle all resolve to their
    minimum member; convergence must happen before max_iters."""
    import pandas as pd

    from forecaster_spark.operators.dedup import connected_components

    pairs = pd.DataFrame(
        [  # chain a-b-c-d-e (worst case for label propagation)
            ("b", "a"), ("b", "c"), ("c", "d"), ("d", "e"),
            # island
            ("y", "z"),
            # triangle with redundant edges
            ("p", "q"), ("q", "r"), ("r", "p"),
        ],
        columns=["id_a", "id_b"],
    )
    cc = (
        connected_components(spark.createDataFrame(pairs))
        .toPandas()
        .set_index("doc_id")["cluster_id"]
    )
    assert cc[["a", "b", "c", "d", "e"]].tolist() == ["a"] * 5
    assert cc[["y", "z"]].tolist() == ["y", "y"]
    assert cc[["p", "q", "r"]].tolist() == ["p"] * 3
    assert len(cc) == 10


def test_dedup_keep_list_verdicts(spark):
    """Every corpus doc gets exactly one row; cluster minima keep, other
    members drop, and docs absent from the pair table keep themselves."""
    import pandas as pd

    from forecaster_spark.operators.dedup import dedup_keep_list

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b", "c", "m", "n", "solo"]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame([("b", "a"), ("b", "c"), ("n", "m")], columns=["id_a", "id_b"])
    )
    out = dedup_keep_list(docs, pairs).toPandas().set_index("doc_id")
    assert len(out) == 6
    assert out.loc["a", "keep"] and not out.loc["b", "keep"] and not out.loc["c", "keep"]
    assert out.loc["m", "keep"] and not out.loc["n", "keep"]
    assert out.loc["solo", "keep"] and out.loc["solo", "cluster_id"] == "solo"
    assert set(out.cluster_id) == {"a", "m", "solo"}


def test_repetition_signals_handcrafted(spark):
    """Known counts incl. empty and single-word docs: integer ingredients
    and exact-fraction columns, null fractions where denominators are 0."""
    import math

    from forecaster_spark.operators.textops import repetition_signals

    docs = spark.createDataFrame(
        [
            ("d1", "the cat the cat sat"),   # 5 words, 3 distinct, top=2; 4 bigrams, 3 distinct, top 'the cat'=2
            ("d2", "solo"),                   # 1 word; 0 bigrams
            ("d3", "  "),                     # 0 words
            ("d4", "a a a a"),               # degenerate: all same
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}
    d1 = got["d1"]
    assert (d1["n_words"], d1["n_distinct_words"], d1["top_word_n"]) == (5, 3, 2)
    assert (d1["n_bigrams"], d1["n_distinct_bigrams"], d1["top_bigram_n"]) == (4, 3, 2)
    assert d1["dup_word_frac"] == 2.0 / 5.0 and d1["top_bigram_frac"] == 0.5
    d2 = got["d2"]
    assert d2["n_words"] == 1 and d2["n_bigrams"] == 0
    assert d2["dup_word_frac"] == 0.0 and d2["dup_bigram_frac"] is None
    d3 = got["d3"]
    assert d3["n_words"] == 0 and d3["dup_word_frac"] is None
    d4 = got["d4"]
    assert d4["dup_word_frac"] == 0.75 and d4["top_word_frac"] == 1.0
    assert d4["dup_bigram_frac"] == 2.0 / 3.0 and d4["top_bigram_frac"] == 1.0


def test_simpson_diversity_handcrafted(spark):
    """Handcrafted docs: uniform words give inv_simpson = n_distinct, a
    fully repeated doc gives 1.0, empty text keeps a row with zero counts
    and null diversity; the integer ingredients match exact counts."""
    import pandas as pd

    from forecaster_spark.operators.textops import simpson_diversity

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "a b c d",          # uniform: inv_simpson = 4
                    "x x x x x",        # degenerate: inv_simpson = 1
                    "a a b",            # 9 / (4+1) = 1.8
                    "   ",              # empty after split
                ],
            }
        )
    )
    got = simpson_diversity(docs).toPandas().set_index("doc_id").sort_index()
    assert got.loc[1, "inv_simpson"] == 4.0
    assert got.loc[2, "inv_simpson"] == 1.0
    assert got.loc[3, "inv_simpson"] == 9.0 / 5.0
    assert got.loc[3, "collision_mass"] == 5
    assert got.loc[4, "n_words"] == 0
    assert pd.isna(got.loc[4, "inv_simpson"])


def test_text_tokens_roundtrip_and_checksum(spark):
    """text_tokens derives the same token array a direct Python replay
    does (split-with-empties, word hash mod 2^31), n_tok equals the split
    length, the polynomial checksum equals a big-int Java-long fold over
    those tokens, and the corpus stays far inside the oracle's 31-power
    table bound (max_tok=1024)."""
    import re

    import duckdb
    import numpy as np
    import pandas as pd

    from forecaster_spark.functions import xhash
    from forecaster_spark.operators.seriesify import token_checksum_fast
    from forecaster_spark.operators.textops import text_tokens
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "Hello  world",          # double space -> empty word
                    " leading and trailing ",  # boundary empties
                    "one",
                ],
            }
        )
    )
    got = (
        text_tokens(docs)
        .withColumn("chk", token_checksum_fast(F.col("tokens")))
        .toPandas()
        .set_index("doc_id")
    )
    for doc_id, text in ((1, "Hello  world"), (2, " leading and trailing "), (3, "one")):
        words = re.split(r"\s+", text.lower())
        toks = (xhash.word_hash_flat(words) % np.uint64(1 << 31)).astype(np.int64)
        row = got.loc[doc_id]
        assert row["n_tok"] == len(words)
        assert list(row["tokens"]) == list(toks)
        acc = 0
        for t in toks:
            acc = (acc * 31 + int(t)) % (1 << 64)
        if acc >= 1 << 63:
            acc -= 1 << 64
        assert row["chk"] == acc
    mx = duckdb.sql(
        "select max(len(string_split_regex(lower(text), '\\s+') )) "
        "from '/root/testdata/sf0.1/documents.parquet'"
    ).fetchone()[0]
    assert mx < 1024  # the oracle's pow-31 list bound


def test_temperature_mixture_rates_and_determinism(spark):
    """alpha=0.5 keep rates are the closed-form ppm sqrt ratios, the
    smallest group keeps everything, and the keep decision is a pure
    function of doc_id (order-invariant, matches the numpy splitmix)."""
    from forecaster_spark.functions import xhash
    from forecaster_spark.operators.sampling import BUCKETS, temperature_mixture

    sizes = {"a": 4, "b": 16, "c": 64}
    rows, i = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang"])
    out = temperature_mixture(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    rates = out.groupby("lang")["rate_ppm"].first().to_dict()
    assert rates == {"a": 1_000_000, "b": 500_000, "c": 250_000}
    u = pdf["doc_id"].to_numpy(np.int64).view(np.uint64)
    bucket = (xhash.splitmix64(u * np.uint64(2 * 7 + 1)) % np.uint64(BUCKETS)).view(np.int64)
    want_kept = bucket < pdf["lang"].map(rates).to_numpy()
    assert np.array_equal(out.loc[pdf.doc_id, "kept"].to_numpy(), want_kept)
    assert out[out.lang == "a"]["kept"].all()  # smallest group: rate 1e6
    out2 = (
        temperature_mixture(spark.createDataFrame(pdf.sample(frac=1.0, random_state=3)))
        .toPandas()
        .set_index("doc_id")
    )
    assert out2.loc[pdf.doc_id, "kept"].equals(out.loc[pdf.doc_id, "kept"])


def test_quality_funnel_stage_counts(spark):
    """Each stage knocks out exactly the doc crafted to fail it, counts are
    cumulative, and the DuckDB oracle reproduces them bit-for-bit."""
    from forecaster_spark.operators.textops import quality_funnel, quality_funnel_sql

    texts = [
        "word " * 35,                                    # passes everything
        "short text only ten words here not nearly enough stop",  # fails min_words
        ("longerword " * 40),                            # mean word len 10 > 8
        ("word " * 34) + "x" * 40,                       # one 40-char token
        "12345 " * 35,                                   # all-digit words
    ]
    pdf = pd.DataFrame({"text": texts})
    out = quality_funnel(spark.createDataFrame(pdf)).toPandas().sort_values("stage_idx")
    assert out.n_pass.tolist() == [5, 4, 3, 2, 1]
    assert out.stage.tolist() == [
        "input", "min_words", "mean_word_len", "max_word_len", "digit_ratio",
    ]
    import duckdb

    duckdb.register("tdocs_funnel", pdf)
    want = duckdb.sql(
        quality_funnel_sql(source_sql="SELECT text FROM tdocs_funnel")
    ).fetchall()
    assert [r[2] for r in want] == out.n_pass.tolist()


def test_quality_funnel_cross_engine_adversarial_text(spark):
    """Spark and DuckDB funnel counts agree on adversarial text: unicode
    words, tabs/newlines/vertical tabs (Java and RE2 \\s must be the same
    set), long digit runs, 31-char tokens at the boundary, empty and
    whitespace-only strings."""
    import random

    import duckdb

    rng = random.Random(12345)
    pool = ["word", "héllo", "münchen", "日本語テキスト", "1234567890", "x" * 30,
            "y" * 31, "z" * 40, "a1b2c3", "...", "!!!", ""]
    seps = [" ", "\t", "\n", "\x0b", "\f", "\r", "  ", " \t "]
    texts = ["", " ", "\t\n", "\x0b\x0b"]
    for _ in range(60):
        n = rng.randint(1, 60)
        texts.append(
            "".join(rng.choice(pool) + rng.choice(seps) for _ in range(n)).strip()
        )
    pdf = pd.DataFrame({"text": texts})
    from forecaster_spark.operators.textops import quality_funnel, quality_funnel_sql

    got = (
        quality_funnel(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("stage_idx")
        .n_pass.tolist()
    )
    duckdb.register("tdocs_adv", pdf)
    want = [
        r[2]
        for r in duckdb.sql(
            quality_funnel_sql(source_sql="SELECT text FROM tdocs_adv")
        ).fetchall()
    ]
    assert got == want


def test_pii_redact_counts_and_order(spark):
    from forecaster_spark.operators.textops import pii_redact

    rows = [
        # plain text, nothing to scrub
        (0, "no pii here at all"),
        # one of each kind
        (1, "mail a.b-c_d1@sub.example.org ip 10.1.2.3 tel +1-555-0042 end"),
        # e-mail whose domain looks dotted-numeric-ish: e-mail wins (redacted
        # first), so the IP counter must NOT see its domain
        (2, "x9@h4.v2.example.com and a real 192.168.0.1"),
        # two e-mails, adjacent punctuation kept intact
        (3, "(a@b.co, c.d@e-f.org)"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}

    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (0, 0, 0)
    assert got[0]["redacted"] == "no pii here at all"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[1]["redacted"] == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert (got[2]["n_email"], got[2]["n_ip"]) == (1, 1)
    assert got[2]["redacted"] == "<EMAIL> and a real <IP>"
    assert got[3]["n_email"] == 2
    assert got[3]["redacted"] == "(<EMAIL>, <EMAIL>)"


def test_pii_redact_matches_duckdb_oracle_on_adversarial_text(spark):
    """Cross-engine fuzz of the Java-regex vs RE2 seam on punctuation-dense
    strings (the class of input where greedy-backtrack vs automaton
    semantics could in principle diverge)."""
    import duckdb

    from forecaster_spark.operators.textops import pii_redact, pii_redact_sql

    rng = np.random.default_rng(7)
    alphabet = list("abZ09._%+-@ ()[]:;,/\\<>\t\n") + ["@example.com", "10.0.0.", "+1-555-1234", "a@b.cc"]
    rows = [
        (i, "".join(rng.choice(alphabet, size=rng.integers(0, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = (
        pii_redact(df)
        .select("doc_id", "n_email", "n_ip", "n_phone", "redacted")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pii_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(pii_redact_sql(source_sql="SELECT doc_id, text FROM pii_in"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_trending_tokens_planted_trend(spark):
    """A token whose per-snapshot count ramps linearly must top the rising
    list with the exact polyfit slope; a collapsing token must top the
    falling list; a flat token must sit at slope 0."""
    import numpy as np

    from forecaster_spark.operators.textops import trending_tokens

    rows = []
    doc_id = 0
    # 8 snapshots d = doc_id % 8; place counts by constructing docs per d
    for d in range(8):
        # 'up' appears 2*d times, 'down' 14-2*d times, 'flat' 3 times
        text = " ".join(["up"] * (2 * d) + ["down"] * (14 - 2 * d) + ["flat"] * 3)
        # one doc per snapshot with doc_id ≡ d (mod 8)
        rows.append((d, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = trending_tokens(df, snapshots=8, min_total=5, k=3).toPandas()
    rising = out[out.direction == "rising"].reset_index(drop=True)
    falling = out[out.direction == "falling"].reset_index(drop=True)
    assert rising.w.iloc[0] == "up" and falling.w.iloc[0] == "down"
    # exact slope vs numpy polyfit on the planted series
    d = np.arange(8)
    for w, series in (("up", 2 * d), ("down", 14 - 2 * d), ("flat", np.full(8, 3))):
        want = np.polyfit(d, series, 1)[0]
        got = out[out.w == w].slope.iloc[0]
        assert abs(got - want) < 1e-12, (w, got, want)
    flat = out[out.w == "flat"]
    assert (flat.slope_num == 0).all()
    # implicit-zero handling: a token present only in snapshot 7
    df2 = spark.createDataFrame(
        [(7, "spike " * 6)], "doc_id long, text string"
    )
    out2 = trending_tokens(df2, snapshots=8, min_total=5, k=2).toPandas()
    spike = out2[(out2.w == "spike") & (out2.direction == "rising")]
    # counts: c_7 = 6, others 0 -> num = 8*42 - 28*6 = 168, slope = 0.5
    assert spike.slope_num.iloc[0] == 168 and spike.slope.iloc[0] == 0.5


def test_bloom_contamination_superset_and_false_positive(spark):
    """The bloom flag set must be a SUPERSET of the exact semi-join flags
    (no false negatives — every bench shingle lights its own bits), and at
    the deliberately small m=4096 on the sf0.01 corpus some uncontaminated
    doc must false-positive (the FP the oracle replays bit-for-bit)."""
    from pyspark.sql import functions as F

    from forecaster_spark.operators.dedup import (
        bloom_contamination,
        contamination_flags,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = docs.where(F.col("doc_id") < 20)
    exact = {
        r.doc_id
        for r in contamination_flags(docs, bench, k=3).where("contaminated").collect()
    }
    bloom = bloom_contamination(docs, bench, k=3, m_bits=4096)
    flagged = {r.doc_id for r in bloom.where("flagged").collect()}
    assert exact <= flagged, exact - flagged  # zero false negatives
    fps = flagged - exact
    assert fps, "expected at least one false positive at m=4096"
    # per-doc hit counts are bounded by shingle counts
    bad = bloom.where("n_hits > n_shingles").count()
    assert bad == 0
    # a huge filter approaches the exact answer (FP rate ~ (n/m)^2 -> 0)
    wide = bloom_contamination(docs, bench, k=3, m_bits=1 << 17)
    flagged_w = {r.doc_id for r in wide.where("flagged").collect()}
    assert exact <= flagged_w and len(flagged_w - exact) < len(fps)


def test_sparse_cosine_pairs_handcrafted(spark):
    """Handcrafted corpus: 'the' appears in every doc (pruned by the
    explicit 90% relative cap — tiny corpora need the permissive cap, the
    5% default is for real Zipfian text), remaining TF vectors have known
    exact cosines; the 7/8 integer threshold keeps only the
    near-identical pair."""
    import math

    from forecaster_spark.operators.dedup import sparse_cosine_pairs

    docs = [
        (1, "the alpha alpha beta"),        # vec {alpha:2, beta:1}
        (2, "the alpha alpha beta beta"),   # vec {alpha:2, beta:2}
        (3, "the alpha gamma"),             # vec {alpha:1, gamma:1}
        (4, "the delta delta delta"),       # vec {delta:3} — shares nothing
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"])
        : r
        for r in sparse_cosine_pairs(df, df_cap_ppm=900_000).collect()
    }
    # cos(1,2) = (4+2)/sqrt(5)/sqrt(8) = 0.9486 >= 7/8 — kept
    r = out[(1, 2)]
    assert (r["n_shared"], r["dot"], r["n2_a"], r["n2_b"]) == (2, 6, 5, 8)
    assert r["cos"] == 6.0 / math.sqrt(5.0) / math.sqrt(8.0)
    # cos(1,3) = 2/sqrt(5)/sqrt(2) = 0.63 < 7/8 and n_shared=1 — dropped
    assert (1, 3) not in out and (2, 3) not in out
    assert all(4 not in k for k in out)
    # 'the' (df=4 of 4 docs > 90%) must not contribute: without pruning
    # cos(1,4) would be nonzero via 'the'
    assert len(out) == 1


def test_span_corruption_layout_invariants(spark):
    """Layout invariants on the sf0.01 corpus: spans sit inside their
    strata and the doc, never overlap, hit the 15%/3 budget, and the
    placement is a pure function of doc_id (rerun identical). A 3-token
    doc gets exactly one full-width span."""
    from forecaster_spark.operators.packing import span_corruption_layout

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = span_corruption_layout(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc, "no spans laid out"
    for did, spans in by_doc.items():
        spans = sorted(spans, key=lambda r: r["span_i"])
        n, k = spans[0]["n_tok"], spans[0]["n_spans"]
        assert len(spans) == k == max(1, n * 15 // 300)
        prev_end = -1
        for r in spans:
            i = r["span_i"]
            lo, hi = i * n // k, (i + 1) * n // k
            assert lo <= r["start"] and r["start"] + r["length"] <= hi <= n
            assert r["start"] > prev_end  # non-overlapping, ordered
            prev_end = r["start"] + r["length"] - 1
    # determinism: a second run yields the identical layout
    again = span_corruption_layout(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # minimal doc
    tiny = spark.createDataFrame([(77, "a b c")], "doc_id long, text string")
    t = span_corruption_layout(tiny).collect()
    assert len(t) == 1 and t[0]["start"] == 0 and t[0]["length"] == 3


def test_minhash_hot_bucket_blocked(spark):
    """A duplicate cluster wider than bucket_block goes through the
    sub-blocked pair path (nb=3 chunks, 6 block-pair rows) and still emits
    exactly C(m,2) pairs — no drops, no dupes, no order misses."""
    n = 150
    pdf = pd.DataFrame(
        {
            "doc_id": [f"c{i:05d}" for i in range(n)] + ["x1", "x2"],
            "text": ["spark rolls tokens into tiered aggregates"] * n
            + ["one unrelated document here", "another entirely different text"],
        }
    )
    pairs = minhash_lsh_pairs(
        spark.createDataFrame(pdf), num_perm=8, bands=1, bucket_block=64
    ).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    want = {
        (f"c{i:05d}", f"c{j:05d}") for i in range(n) for j in range(i + 1, n)
    }
    assert got == want


def test_minhash_hot_bucket_10k_cluster_completes(spark):
    """The verdict scenario: a 10^4-member exact-duplicate cluster (routine
    on web crawls). The blocked path spreads the C(m,2) ≈ 5·10^7 pair
    stream across ~12k bounded block-pair tasks instead of serializing it
    in the one task holding the bucket row. Costs ~25 s of suite time —
    kept at 10^4 deliberately: the r3 verdict's done-criterion for the
    hot-bucket fix names a 10^4-member cluster explicitly."""
    n = 10_000
    pdf = pd.DataFrame(
        {
            "doc_id": [f"h{i:06d}" for i in range(n)],
            "text": ["identical crawl boilerplate page body text"] * n,
        }
    )
    cnt = minhash_lsh_pairs(
        spark.createDataFrame(pdf), num_perm=8, bands=1, bucket_block=64
    ).count()
    assert cnt == n * (n - 1) // 2


def test_sparse_cosine_zipf_df_cap_binds(spark):
    """On a synthetic Zipf corpus (large vocab, heavy head) the 5% default
    df cap must actually bind: the postings self-join fanout Σ_w C(df_w,2)
    over kept words collapses versus the uncapped sum, and a planted
    rare-word near-duplicate pair still comes through the inverted-index
    leg (vocab > dense_vocab_max)."""
    from forecaster_spark.operators.dedup import sparse_cosine_pairs

    rng = np.random.default_rng(7)
    n_docs, doc_len = 1200, 60
    ranks = np.minimum(rng.zipf(1.3, size=(n_docs, doc_len)), 25_000)
    texts = [" ".join(f"w{r}" for r in row) for row in ranks]
    # planted near-dup: two docs of the same 40 rare (df=2) words
    rare = " ".join(f"rare{i}" for i in range(40))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs + 2, dtype=np.int64),
            "text": texts + [rare, rare],
        }
    )
    df = spark.createDataFrame(pdf)

    # fanout ledger straight from the df table (same tokenization)
    from forecaster_spark.operators.textops import WS_SPLIT

    words = df.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), WS_SPLIT)).alias("w")
    )
    dfreq = (
        words.groupBy("doc_id", "w").count().groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .toPandas()
    )
    n = n_docs + 2
    fan_all = int((dfreq["df"] * (dfreq["df"] - 1) // 2).sum())
    kept = dfreq[dfreq["df"] * 1_000_000 <= n * 50_000]
    fan_kept = int((kept["df"] * (kept["df"] - 1) // 2).sum())
    assert len(dfreq) > 4096  # inverted-index leg regime
    assert fan_kept < 0.02 * fan_all  # the cap binds — head removed

    out = sparse_cosine_pairs(df).toPandas()
    planted = out[(out.id_a == n_docs) & (out.id_b == n_docs + 1)]
    import math

    assert len(planted) == 1
    assert planted.iloc[0]["cos"] == 40.0 / math.sqrt(40.0) / math.sqrt(40.0)
    assert planted.iloc[0]["n_shared"] == 40


def test_minhash_blocked_path_equals_unblocked_fuzz(spark):
    """Property: the sub-blocked pair generator is pair-set-identical to
    the single-chunk path (bucket_block larger than any bucket) on random
    duplicate-heavy corpora — blocking changes the plan, never the answer."""
    import random

    rng = random.Random(20260821)
    vocab = [f"tok{i}" for i in range(12)]
    docs = []
    for i in range(120):
        if i % 3 == 0 and i:  # duplicate clusters of varying width
            docs.append((f"f{i:03d}", docs[rng.randrange(len(docs))][1]))
        else:
            docs.append(
                (f"f{i:03d}", " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
            )
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    blocked = minhash_lsh_pairs(df, num_perm=16, bands=4, bucket_block=3).toPandas()
    plain = minhash_lsh_pairs(df, num_perm=16, bands=4, bucket_block=1 << 30).toPandas()
    sb = set(zip(blocked.id_a, blocked.id_b))
    sp = set(zip(plain.id_a, plain.id_b))
    assert sb == sp and len(sb) > 0
