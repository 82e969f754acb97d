"""In-repo guard for the cross-engine oracle mirrors (exact_sql / xhash_sql
/ similarity SQL): a representative contract subset runs on SYNTHETIC tables
with edge cases the driver's clean testdata never hits — empty/1-word/
multi-space/unicode documents, a constant-value source (zero-variance
guards) — and every Spark result must match its DuckDB oracle bit-for-bit.

This keeps the cross-engine certificates regression-tested inside pytest,
independent of the driver's gate."""

import numpy as np
import pandas as pd
import pytest

duckdb = pytest.importorskip("duckdb")

QUERIES = [
    "arx_forecast_events_1h",
    "arx_std_scaler_forecast_events_1h",
    "ar_yw_forecast_events_1h",
    "ar_smols_forecast_events_1h",
    "arx_direct_forecast_events_1h",
    "arx_exo_forecast_events_1h",
    "arx_cross_forecast_events_1h",
    "arx_symb_forecast_events_1h",
    "arx_qof_rollvalidate_events_1h",
    "feature_topk_events_1h",
    "minhash_lsh_pairs_documents",
    "simhash_documents",
    "simhash_neardup_pairs_documents",
    "pack_sequences_documents",
    "contamination_flags_documents",
    "fingerprint_documents",
    "backcast_fill_events",
    "cosine_topk_lsh_embeddings",
    "cosine_topk_ivf_embeddings",
    "mann_kendall_events_1h",
    "ks_two_sample_events",
    "permutation_patterns_events_1h",
    "seasonal_naive_qof_events_1h",
    "max_drawdown_events",
    "vocab_stats_documents",
    "chunk_tokens_documents",
    "ngram_novelty_documents",
    "spearman_pairs_events_1h",
    "runs_test_events_1h",
    "pearson_pairs_events_1h",
    "winsorized_mean_events",
    "sparse_cosine_pairs_documents",
    "winnowing_fingerprint_documents",
    "winnowing_neardup_pairs_documents",
    "readability_documents",
    "ul2_denoiser_mix_documents",
    "var1_pairs_events_1h",
    "pooled_ar_forecast_events_1h",
    "mixture_allocation_documents",
    "arima210_forecast_events_1h",
    "holt_winters_mul_events_1h",
    "rake_keywords_documents",
    "epoch_shuffle_documents",
    "siegel_slopes_events_1h",
    "markov_transitions_events",
    # r5 additions
    "pooled_ar_fe_forecast_events_1h",
    "semantic_dedup_embeddings",
    "bpe_merge_round_documents",
    "duplicated_spans_k16_documents",
    "quality_classifier_documents",
    "semantic_contamination_embeddings",
    "span_removal_k16_documents",
    "cdc_chunk_ledger_documents",
    "bpe_encode_documents",
    "source_token_budget_documents",
]


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle_synth")
    rng = np.random.default_rng(99)

    # events: 3 sources over ~6 days of hours; one source CONSTANT (zero
    # variance → r2/feature-score/backcast guards), duplicate timestamps
    rows = []
    eid = 0
    base = pd.Timestamp("2030-01-01")
    for src, scale in (("alpha", 200.0), ("beta", 50.0), ("flat", 0.0)):
        for k in range(3000):
            ts = base + pd.Timedelta(seconds=int(rng.integers(0, 6 * 86400)))
            v = 100.0 if scale == 0.0 else float(np.round(rng.uniform(1, scale), 2))
            rows.append((src, ts, v, eid, int(rng.integers(0, 7))))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_type", "ts", "value", "event_id", "user_id"])
    # microsecond timestamps: Spark cannot read pandas' default TIMESTAMP(NANOS)
    ev.to_parquet(f"{root}/events.parquet", coerce_timestamps="us")

    words = "the quick brown fox spark rollup tier gap fill fuzzy über naïve".split()
    texts = [" ".join(rng.choice(words, rng.integers(3, 30))) for _ in range(80)]
    texts += ["", "one", "  spaced   out  ", "über über über naïve", texts[0], texts[0] + " tail"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts, "lang": "en"})
    docs["source"] = ["s%d" % (i % 4) for i in range(len(texts))]
    docs["n_chars"] = [len(t) for t in texts]
    docs.to_parquet(f"{root}/documents.parquet")

    emb = rng.standard_normal((60, 64)).astype(np.float32)
    emb[1] = emb[0] + 0.01 * rng.standard_normal(64).astype(np.float32)
    pd.DataFrame({"vec_id": range(60), "embedding": list(emb)}).to_parquet(
        f"{root}/embeddings.parquet"
    )
    return str(root)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_bit_exact_on_synth(spark, synth_dir, name):
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{synth_dir}/{t}.parquet')"
        )
    got = _normalize(entry.queries()[name](spark, synth_dir).toPandas())
    want = _normalize(con.execute(entry.oracle_sql()[name]).df())
    assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            a = a.astype(float)
            b = np.asarray(b, dtype=float)
            both_nan = np.isnan(a) & np.isnan(b)
            assert ((a == b) | both_nan).all(), f"col {c} not bit-exact"
        else:
            assert (pd.Series(a).fillna("~N") == pd.Series(b).fillna("~N")).all(), c


def test_contract_surface_hygiene():
    """Every contract query has a DuckDB oracle — zero rows-only checks
    (the multimodal query's SQL-expressible subset got its own oracle in
    r3); every oracle key maps to a real query. A new rows-only query must
    be added here deliberately."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    assert set(qs) - set(oracles) == set()
    assert callable(entry.entry)


def test_scaler_quantization_margin(spark):
    """The standard-scaler contract query is certified through centi-unit
    floor quantization of two mathematically-equal-but-float-different
    paths (scaled pinv vs raw exact-Cramer, both unrectified). Pin the
    safety factor: solver drift must stay orders of magnitude below the
    distance to the nearest floor boundary, so the quantized values can
    never disagree."""
    import __spark_entry__ as entry
    from forecaster_spark.models import exact_sql
    from forecaster_spark.models.kernels import forecast_long
    from forecaster_spark.sources import TESTDATA_TABLES

    sf = "/root/testdata/sf0.01"
    scaled = forecast_long(
        entry._hourly_int_series(spark, sf), hh=4, p=2, spec=1, skip=2, scaler="standard"
    ).toPandas()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = con.execute(exact_sql.arx_recursive_sql(rectify=False)).df()
    key = ["source", "t", "h"]
    a = scaled.sort_values(key).reset_index(drop=True)
    b = oracle.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    drift = np.abs(a["y_hat"].to_numpy() - b["y_hat"].to_numpy()).max()
    f = a["y_hat"].to_numpy() * 100
    margin = np.minimum(f - np.floor(f), np.ceil(f) - f).min()
    assert drift < 1e-10, f"solver drift {drift:.3e} too large for quantized certify"
    assert margin > 1e-6, f"floor boundary margin {margin:.3e} too small"
    assert np.array_equal(np.floor(f), np.floor(b["y_hat"].to_numpy() * 100))


def test_sparse_cosine_dense_and_inverted_paths_agree(spark, synth_dir):
    """The blocked-GEMM dense leg and the inverted-index leg of
    sparse_cosine_pairs are the same function — force each (vocab cap 0
    disables the dense probe) and compare bit-for-bit."""
    from forecaster_spark.operators.dedup import sparse_cosine_pairs
    from forecaster_spark.sources import read_table

    docs = read_table(spark, synth_dir, "documents")
    dense = _normalize(
        sparse_cosine_pairs(docs, df_cap_ppm=900_000, min_shared=2).toPandas()
    )
    inverted = _normalize(
        sparse_cosine_pairs(
            docs, df_cap_ppm=900_000, min_shared=2, dense_vocab_max=0
        ).toPandas()
    )
    assert len(dense) == len(inverted) and len(dense) > 0
    for c in dense.columns:
        a, b = dense[c].to_numpy(), inverted[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            assert (a == b).all(), c
        else:
            assert (pd.Series(a) == pd.Series(b)).all(), c


def test_whitespace_class_consistency():
    """Every tokenizer whitespace class in the repo — the Spark-side
    WS_SPLIT/WS_CHARS constants and every DuckDB-oracle SQL literal — must
    be the one canonical spelling [ \\t\\n\\x0B\\f\\r] (Java's \\s; RE2's
    \\s lacks U+000B). A drifted or typo'd copy silently desyncs a Spark
    leg from its oracle on vertical-tab text. Also bans the divergent
    shorthands outright: no split on bare \\s+, and no \\s or \\S inside any
    regex-class literal (their Java/RE2 semantics differ on U+000B — the
    BPE_ISH/[^\\w\\s]/\\S{{n}} bug class found in the r4 review). Files are
    discovered by globbing the repo, not a hardcoded list."""
    import pathlib
    import re

    from forecaster_spark.operators.textops import WS_CHARS, WS_SPLIT

    assert WS_CHARS == r" \t\n\x0B\f\r"
    assert WS_SPLIT == r"[ \t\n\x0B\f\r]+"
    repo = pathlib.Path(__file__).resolve().parents[1]
    files = [repo / "__spark_entry__.py", repo / "bench.py"]
    for sub in ("forecaster_spark", "jobs", "tools"):
        files += sorted((repo / sub).rglob("*.py"))
    canon_sql = r"[ \\t\\n\\x0B\\f\\r]"  # the class as escaped source literal
    canon_raw = r"[ \t\n\x0B\f\r]"
    approx = re.compile(r"\[[^\]]*x0B[^\]]*\]")  # any ws-class-looking literal
    for f in files:
        src = f.read_text()
        for m in approx.finditer(src):
            lit = m.group(0)
            assert lit in (canon_sql, canon_raw) or lit.startswith("[^"), (f.name, lit)
            if lit.startswith("[^"):
                # negated classes must end with the same canonical tail
                assert lit.endswith(canon_sql[1:]) or lit.endswith(canon_raw[1:]), (
                    f.name,
                    lit,
                )
        # no split/string_split_regex on bare \s+ anywhere
        assert not re.search(r"""split[^\n]{0,80}['"]\\+s\+['"]""", src), f.name
        # no \s or \S inside character classes in any string literal
        # (two-backslash source form = the form that reaches a regex engine)
        assert not re.search(r"\[[^\]\n]*\\+[sS][^\]\n]*\]", src), f.name


def test_vertical_tab_text_cross_engine(spark, tmp_path):
    """Adversarial \\x0B corpus through the BPE/punct/long-token regex
    paths: with the explicit character classes (Java \\s ≠ RE2 \\s on
    U+000B, and their complements \\S also differ) the Spark legs and the
    DuckDB oracles must agree on vertical-tab text — the r4 review found
    BPE_ISH/[^\\w\\s]/\\S{n} still carried the divergent shorthands."""
    import __spark_entry__ as entry

    texts = [
        "plain words only here",
        "tab\x0Bseparated\x0Btokens and more text",
        "punct!,;\x0B:? mixed with\x0Bvt",
        ("x" * 20 + "\x0B" + "y" * 20) + " short tail words",  # \x0B splits a 41-run
        "digits 1 2 3\x0B4 5 and words to pad the doc length",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["vt"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    qs, osql = entry.queries(), entry.oracle_sql()
    for name in (
        "token_counts_documents",
        "quality_documents",
        "quality_funnel_documents",
        "token_histogram_documents",
    ):
        got = _normalize(qs[name](spark, d).toPandas())
        want = _normalize(con.execute(osql[name]).df())
        assert len(got) == len(want), name
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if np.issubdtype(a.dtype, np.floating):
                assert (a == np.asarray(b, dtype=float)).all(), (name, c)
            else:
                assert (pd.Series(a).fillna("~N") == pd.Series(b).fillna("~N")).all(), (
                    name,
                    c,
                )
