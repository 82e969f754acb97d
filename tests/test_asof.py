"""As-of join vs pandas merge_asof; retention windows."""

import numpy as np
import pandas as pd

from forecaster_spark.operators.asof import apply_retention, asof_join
from forecaster_spark.operators.rollup import rollup_raw
from tests.conftest import mk_series_pdf


def _sides(seed=3):
    rng = np.random.default_rng(seed)
    frames_l, frames_r = [], []
    for s in ("a", "b"):
        lts = pd.Timestamp("2025-01-01") + pd.to_timedelta(np.sort(rng.choice(5000, 300, replace=False)), unit="s")
        rts = pd.Timestamp("2025-01-01") + pd.to_timedelta(np.sort(rng.choice(5000, 120, replace=False)), unit="s")
        frames_l.append(pd.DataFrame({"source": s, "ts": lts, "y": rng.normal(size=len(lts))}))
        frames_r.append(pd.DataFrame({"source": s, "ts": rts, "price": rng.normal(size=len(rts))}))
    return pd.concat(frames_l, ignore_index=True), pd.concat(frames_r, ignore_index=True)


def test_asof_join_matches_pandas(spark):
    lpdf, rpdf = _sides()
    got = (
        asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf))
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lpdf.sort_values("ts"),
            rpdf.sort_values("ts").rename(columns={"price": "price_r", "ts": "ts_r"}),
            left_on="ts",
            right_on="ts_r",
            by="source",
            direction="backward",
        )
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["price_r"], want["price_r"], equal_nan=True)
    assert (got["ts_r"].fillna(pd.Timestamp(0)) == want["ts_r"].fillna(pd.Timestamp(0))).all()


def test_asof_join_tolerance(spark):
    lpdf, rpdf = _sides()
    got = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), tolerance_s=30
    ).toPandas()
    want = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts").rename(columns={"price": "price_r"}),
        on="ts",
        by="source",
        direction="backward",
        tolerance=pd.Timedelta(seconds=30),
    )
    got = got.sort_values(["source", "ts"]).reset_index(drop=True)
    want = want.sort_values(["source", "ts"]).reset_index(drop=True)
    assert np.allclose(got["price_r"], want["price_r"], equal_nan=True)


def test_retention(spark):
    pdf = mk_series_pdf(n=3000, n_sources=2)
    tier = rollup_raw(spark.createDataFrame(pdf), "1m")
    kept = apply_retention(tier, keep_buckets=3, step_seconds=60).toPandas()
    full = tier.toPandas()
    mx = full["bucket_start"].max()
    want = full[full["bucket_start"] > mx - pd.Timedelta(seconds=180)]
    assert len(kept) == len(want)
    assert kept["bucket_start"].min() > mx - pd.Timedelta(seconds=181)


def test_asof_join_blocked_equals_plain(spark):
    """Skew-bounded as-of (block_s) ≡ per-source-window as-of, with blocks
    small enough that many left rows depend on cross-block carry, and with
    tolerance interacting with the carry."""
    lpdf, rpdf = _sides(seed=11)
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    for kwargs in ({}, {"tolerance_s": 45}):
        plain = (
            asof_join(l, r, **kwargs)
            .toPandas()
            .sort_values(["source", "ts"])
            .reset_index(drop=True)
        )
        for block_s in (97, 1200):
            blocked = (
                asof_join(l, r, block_s=block_s, **kwargs)
                .toPandas()
                .sort_values(["source", "ts"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(blocked[plain.columns], plain, check_dtype=False)


def test_asof_join_blocked_null_right_values(spark):
    """Right-side value columns containing NULLs: the blocked carry must take
    the last NON-NULL value per column (last(ignorenulls) semantics), not the
    value at the block's latest right row."""
    lpdf, rpdf = _sides(seed=7)
    # null out a deterministic ~third of right values, including block tails
    rpdf = rpdf.copy()
    rpdf.loc[rpdf.index % 3 == 0, "price"] = np.nan
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    plain = (
        asof_join(l, r)
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    for block_s in (97, 1200):
        blocked = (
            asof_join(l, r, block_s=block_s)
            .toPandas()
            .sort_values(["source", "ts"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(blocked[plain.columns], plain, check_dtype=False)


def test_interval_join_grid_equijoin(spark):
    """Half-open [start, end) semantics, key equality, empty-interval drop;
    the 3-min event grid makes expected match counts exact."""
    import pandas as pd

    from forecaster_spark.operators.asof import interval_join

    ev = pd.DataFrame(
        {
            "source": "a",
            "ts": pd.date_range("2030-01-01 00:00", periods=200, freq="3min"),
            "y": range(200),
        }
    )
    iv = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            "ivl_start": pd.to_datetime(
                ["2030-01-01 00:10", "2030-01-01 02:30", "2030-01-01 00:00"]
            ),
            "ivl_end": pd.to_datetime(
                ["2030-01-01 01:10", "2030-01-01 02:30", "2030-01-01 09:00"]
            ),
            "ivl_id": [1, 2, 3],
        }
    )
    out = (
        interval_join(spark.createDataFrame(ev), spark.createDataFrame(iv))
        .groupBy("ivl_id")
        .count()
        .toPandas()
        .set_index("ivl_id")
    )
    # ivl 1: events 00:12..01:09 -> 20; ivl 2 empty (end<=start, dropped);
    # ivl 3 other source -> no rows
    assert out["count"].to_dict() == {1: 20}
    rows = interval_join(spark.createDataFrame(ev), spark.createDataFrame(iv))
    ts_vals = [r["ts"] for r in rows.collect()]
    assert min(ts_vals) == pd.Timestamp("2030-01-01 00:12")
    assert max(ts_vals) == pd.Timestamp("2030-01-01 01:09")  # 01:10 excluded
