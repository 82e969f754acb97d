"""Input-partitioning invariance: every query's OUTPUT must be a pure
function of the table CONTENTS, never of file count / file order / row
order — the property that makes the exact-integer discipline trustworthy
on a real cluster, where input splits, task scheduling, and shuffle
ordering differ from the single-file local layout the driver gate reads.

The fixture rewrites the sf0.001 tables round-robin into 7 parquet parts
(different file count, file order, AND row order within files), then a
representative query per operator class runs against both layouts and the
normalized outputs must match bit-for-bit. Classes covered: exact-sum
rollup/cascade, per-row window features, Arrow forecast kernels
(recursive + symbolic-direct), pair generation (minhash blocked path,
winnowing, span ledger), iterative connected components, splitmix
sampling/packing/shuffling, sharded global ranks, sketches (HLL),
robust regression, ANN (IVF), TPC-H agg, and the batch loader manifest."""

import numpy as np
import pandas as pd
import pytest

SUBSET = [
    "rollup_1m_events",
    "rollup_1h_cascade_events",
    "lag_features_events",
    "minhash_lsh_pairs_documents",
    "sparse_cosine_pairs_documents",
    "kruskal_wallis_events",
    "hash_split_documents",
    "epoch_shuffle_documents",
    "arx_forecast_events_1h",
    "arx_symb_direct_forecast_events_1h",
    "dedup_exact_documents",
    "dedup_keep_list_documents",
    "winnowing_neardup_pairs_documents",
    "pack_sequences_documents",
    "temperature_mixture_documents",
    "hll_distinct_users_events_1h",
    "theil_sen_events_1h",
    "duplicated_spans_documents",
    "stratified_sample_documents",
    "cosine_topk_ivf_embeddings",
    "tpch_q1_lineitem",
    "data_loader_batches_events",
    "retract_rebuild_1m_events",
    "arch1_vol_forecast_events_1h",
    # r5 kernels: batch-local memoization (bpe), flat-stream reduceat
    # (cdc), sharded running sums (budget), within-cluster pairing
    # (semantic dedup), closure broadcast scan (contamination), trailing-m
    # panel (FE pooled AR) — all must be pure functions of table contents
    "bpe_encode_documents",
    "cdc_chunk_ledger_documents",
    "source_token_budget_documents",
    "semantic_dedup_embeddings",
    "semantic_contamination_embeddings",
    "pooled_ar_fe_forecast_events_1h",
    "duplicated_spans_k16_documents",
    "video_frame_luma_synth",
]

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def reparted_dir(spark, tmp_path_factory):
    import os

    dst = str(tmp_path_factory.mktemp("sf0001_r7"))
    for t in TABLES:
        p = f"{SRC}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).repartition(7).write.mode("overwrite").parquet(
                f"{dst}/{t}.parquet"
            )
    return dst


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_invariant_under_input_repartitioning(spark, reparted_dir, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    a = _norm(q(spark, SRC).toPandas())
    b = _norm(q(spark, reparted_dir).toPandas())
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype == object:
            assert (a[c].fillna("~N") == b[c].fillna("~N")).all(), f"{name}.{c}"
        else:
            assert np.array_equal(av, bv, equal_nan=a[c].dtype.kind == "f"), (
                f"{name}.{c} differs across input layouts"
            )
