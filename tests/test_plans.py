"""Physical-plan audits (SURVEY.md §4): these encode the scale properties
the operators rely on — column pruning reaching the parquet scan, filter
pushdown, hash (not sort) aggregation with map-side partials, broadcast for
small sides — so a regression that silently degrades the plan fails CI."""

import pytest
from pyspark.sql import functions as F

from forecaster_spark.operators import features as FT
from forecaster_spark.operators.rollup import rollup_raw, rollup_tiers
from forecaster_spark.operators.seriesify import events_as_series


def plan(df, mode="formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(qe, mode)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_rollup_scan_prunes_columns(events):
    p = plan(rollup_raw(events_as_series(events), "1m", tie_break=False))
    scan = p[p.index("Scan parquet"):]
    read_schema = [l for l in scan.splitlines() if "ReadSchema" in l][0]
    assert "ts" in read_schema and "event_type" in read_schema and "value" in read_schema
    assert "props" not in read_schema and "user_id" not in read_schema


def test_rollup_fast_path_hash_aggregates(events):
    t = rollup_tiers(events_as_series(events), tie_break=False)
    p = plan(t["1d"], mode="simple")  # simple prints the plan once
    assert "SortAggregate" not in p
    assert p.count("HashAggregate") >= 6  # partial+final per tier
    # exactly 3 shuffles: raw→1m, 1m→1h, 1h→1d
    assert p.count("Exchange") == 3


def test_rollup_tie_break_uses_sort_aggregate_knowingly(events):
    p = plan(rollup_raw(events_as_series(events), "1m", tie_break=True))
    assert "SortAggregate" in p  # documented cost of deterministic ties


def test_filter_pushdown_reaches_scan(events):
    df = events.where(F.col("event_type") == "click").select("event_id")
    p = plan(df)
    assert "PushedFilters" in p and "event_type" in p[p.index("PushedFilters"):]


def test_window_features_single_shuffle(events):
    s = events_as_series(events)
    out = FT.with_leads(FT.with_lags(s, "y", 4), "y", 3)
    p = plan(out, mode="simple")
    # all lags+leads share one window partitioning → exactly one Exchange
    assert p.count("Exchange") == 1
    assert p.count("Window") >= 1


def test_minmax_params_broadcast(events):
    s = events_as_series(events)
    out = FT.transform_minmax(s, FT.fit_minmax(s, ["y"]), ["y"])
    assert "BroadcastHashJoin" in plan(out)


def test_tpch_q1_pushdown(spark):
    import __spark_entry__ as em

    p = plan(em.q_tpch_q1(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in p
    tail = p[p.index("PushedFilters"):]
    assert "l_shipdate" in tail.splitlines()[0]
    assert "HashAggregate" in p


def test_tpch_q6_filters_pushed(spark):
    import __spark_entry__ as em

    p = plan(em.q_tpch_q6(spark, "/root/testdata/sf0.001"))
    tail = p[p.index("PushedFilters"):].splitlines()[0]
    # every predicate reaches the parquet scan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in tail


def test_join_queries_broadcast_dims(spark):
    """Q3/Q5-like/Q14-like: dimension sides broadcast (no shuffle of the
    fact table for the dim joins); at most one fact-fact shuffle join."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    for q, n_bcast_min in ((em.q_tpch_q3, 2), (em.q_nation_revenue, 3), (em.q_promo_revenue, 1)):
        p = plan(q(spark, sf), mode="simple")
        assert p.count("BroadcastHashJoin") >= n_bcast_min, q.__name__
    # Q5-like keeps exactly one shuffle join: orders⋈lineitem on orderkey
    p5 = plan(em.q_nation_revenue(spark, sf), mode="simple")
    assert p5.count("SortMergeJoin") + p5.count("ShuffledHashJoin") <= 1


def test_rollup_cube_single_scan(spark):
    """GROUP BY ROLLUP computes all grouping sets off one scan (Expand),
    not one scan per level."""
    import __spark_entry__ as em

    p = plan(em.q_rollup_cube(spark, "/root/testdata/sf0.001"), mode="simple")
    assert p.count("Scan parquet") == 1
    assert "Expand" in p


def test_bnlj_structural_whitelist(spark):
    """r5: the plan-audit BNLJ exemption is structural, not name-keyed —
    a scalar (1-row global aggregate) broadcast passes, while a degraded
    plan broadcasting a multi-row table trips the check automatically."""
    from forecaster_spark.plans.audit import bnlj_all_scalar, bnlj_report

    big = spark.range(100).withColumnRenamed("id", "x")
    scalar = spark.range(50).agg(F.max("id").alias("mx"))
    good = big.join(F.broadcast(scalar), big.x >= F.col("mx") - 10)
    rep = bnlj_report(good)
    assert rep and all(ok for _s, ok in rep)
    assert bnlj_all_scalar(good)

    # the degraded shape: same join, but the broadcast side is a TABLE
    table = spark.range(20).withColumnRenamed("id", "y")
    bad = big.join(F.broadcast(table), big.x >= F.col("y") + 5)
    rep_bad = bnlj_report(bad)
    assert rep_bad and not any(ok for _s, ok in rep_bad)
    assert not bnlj_all_scalar(bad)
    # subtler degradation: the broadcast subtree CONTAINS a 1-row global
    # aggregate but its root is a corpus-growing join — must still trip
    sneaky = big.join(
        F.broadcast(table.join(scalar, F.col("y") <= F.col("mx"))),
        big.x >= F.col("y") + 5,
    )
    assert not bnlj_all_scalar(sneaky)
    # no-BNLJ-found is NOT vacuously fine (the caller only asks after the
    # explain string showed one — unreachable means unverified)
    assert not bnlj_all_scalar(big.join(table, big.x == F.col("y")))


def test_heatmap_bmp_sink(spark, tmp_path):
    """S4 image-sink analogue: a QoF table renders to a decodable BMP with
    deterministic layout; min/max cells map to blue/red."""
    import numpy as np
    import pandas as pd

    from forecaster_spark.operators.multimodal import bmp_decode
    from forecaster_spark.sources.viz import heatmap_bmp, write_heatmap_bmp

    img = bmp_decode(heatmap_bmp(np.array([[0.0, 1.0], [0.5, np.nan]]), cell=4))
    assert img.shape == (8, 8, 3)
    assert tuple(img[0, 0]) == (0, 0, 255)      # min → blue
    assert tuple(img[0, 4]) == (255, 0, 0)      # max → red
    assert tuple(img[4, 4]) == (0, 0, 0)        # NaN → black

    qof = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["a", "a", "b", "b"],
                "h": [1, 2, 1, 2],
                "smape": [10.0, 40.0, 20.0, 30.0],
            }
        )
    )
    path = str(tmp_path / "qof.bmp")
    shape = write_heatmap_bmp(qof, path, cell=6)
    assert shape == (2, 2)
    out = bmp_decode(open(path, "rb").read())
    assert out.shape == (12, 12, 3)
    assert tuple(out[0, 0]) == (0, 0, 255)  # (a, h=1) is the min → blue
    assert tuple(out[0, 6]) == (255, 0, 0)  # (a, h=2) is the max → red


def test_new_ops_plan_audit(spark):
    """Plan hygiene for the round-2 operators: the cohort dim join
    broadcasts (no shuffle of the fact side on user_id), the rolling
    z-score is ONE window pass (single sort, no extra exchanges beyond the
    source shuffle), and the quantiles query is a single sort-based
    aggregate over one exchange."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    p = plan(entry.queries()["cohort_retention_events"](spark, sf))
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p

    import re

    def nodes(p, name):
        # formatted plans list each node twice (tree + detail) — count the
        # numbered detail entries
        return len(re.findall(rf"\(\d+\) {name}\b", p))

    p = plan(entry.queries()["rolling_zscore_events"](spark, sf))
    assert nodes(p, "Window") == 1
    assert nodes(p, "Exchange") <= 1  # the one shuffle on source

    p = plan(entry.queries()["quantiles_events"](spark, sf))
    assert nodes(p, "Exchange") <= 1  # partial agg then one exchange


def test_r3_ops_plan_audit(spark):
    """Plan hygiene for the round-3 operators: simhash near-miss pairing is
    ONE shuffle (the bucket groupBy — no self-join double exchange) with the
    hamming verify in native expressions (no Python row path past the
    signature kernel); the embedding near-dup join likewise buckets on the
    LSH signature with a single aggregate-side exchange."""
    import re

    import __spark_entry__ as entry

    def nodes(p, name):
        return len(re.findall(rf"\(\d+\) {name}\b", p))

    sf = "/root/testdata/sf0.001"
    p = plan(entry.queries()["simhash_neardup_pairs_documents"](spark, sf))
    # exchanges: bucket groupBy + the final distinct — no third from a
    # self-join re-shuffle
    assert nodes(p, "Exchange") <= 2, p[:2000]
    assert "bit_count" in p
    assert nodes(p, "ArrowEvalPython") <= 1  # one signature kernel pass

    p = plan(entry.queries()["arx_std_scaler_forecast_events_1h"](spark, sf))
    # forecast kernel: one FlatMapGroupsInPandas over one source shuffle
    assert nodes(p, "FlatMapGroupsInPandas") == 1


def test_linear_deriv_plan_hash_agg(spark):
    """Decimal(38,0) moment sums must keep map-side partial HashAggregate
    (decimal aggregation buffers can silently fall back to SortAggregate /
    ObjectHashAggregate in some shapes) and exactly one exchange."""
    import re

    import __spark_entry__ as entry

    def nodes(p, name):
        return len(re.findall(rf"\(\d+\) {name}\b", p))

    p = plan(entry.queries()["linear_deriv_events_1h"](spark, "/root/testdata/sf0.001"))
    assert nodes(p, "HashAggregate") == 2  # partial + final
    assert nodes(p, "SortAggregate") == 0
    assert nodes(p, "Exchange") == 1
