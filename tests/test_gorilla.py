"""Gorilla codec: bit-exact round-trip (SURVEY.md §5 item 3) incl. property
test, plus the Spark pack/unpack kernels."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from forecaster_spark.functions.gorilla import (
    gorilla_decode,
    gorilla_encode,
    pack_rollup_gorilla,
    unpack_rollup_gorilla,
)
from forecaster_spark.operators.rollup import rollup_raw
from tests.conftest import mk_series_pdf


def roundtrip(ts, vals):
    blob = gorilla_encode(np.asarray(ts, np.int64), np.asarray(vals, float))
    ts2, v2 = gorilla_decode(blob)
    assert np.array_equal(ts2, np.asarray(ts, np.int64))
    assert np.array_equal(v2.view(np.uint64), np.asarray(vals, float).view(np.uint64))
    return blob


def test_paper_style_series():
    ts = 1600000000 + np.arange(1000) * 60  # regular cadence → dod=0 after first
    vals = np.round(np.sin(np.arange(1000) / 25) * 100, 2) + 500
    blob = roundtrip(ts, vals)
    # regular timestamps compress to ~1 bit/point after the first two
    assert len(blob) < 1000 * 10

def test_edge_cases():
    roundtrip([], [])
    roundtrip([5], [1.5])
    roundtrip([5, 6], [1.5, 1.5])           # zero xor
    roundtrip([0, 10**15, 2 * 10**15], [0.0, -0.0, np.inf])  # huge deltas, sign bit
    roundtrip([0, 1, 3, 6, 10], [np.nan, 1.0, np.nan, 2.0, 3.0])  # NaN bits preserved
    # irregular, negative dods
    ts = np.cumsum([0, 60, 60, 7, 3600, 1, 86400, 60, 60])
    roundtrip(ts, np.arange(9, dtype=float) * 1.1)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=60),
    st.data(),
)
def test_roundtrip_property(deltas, data):
    ts = np.cumsum(np.asarray(deltas, np.int64)) + 1_500_000_000
    vals = np.asarray(
        data.draw(
            st.lists(
                st.floats(allow_nan=False, allow_infinity=True, width=64),
                min_size=len(ts),
                max_size=len(ts),
            )
        )
    )
    roundtrip(ts, vals)


def test_spark_pack_unpack_roundtrip(spark):
    pdf = mk_series_pdf(n=1200, n_sources=3)
    tier = rollup_raw(spark.createDataFrame(pdf), "1m")
    packed = pack_rollup_gorilla(tier, "mean_y")
    ppdf = packed.toPandas()
    assert set(ppdf.columns) == {"source", "block_id", "n_points", "ts_min", "ts_max", "blob"}
    orig = tier.select("source", "bucket_start", "mean_y").toPandas()
    got = unpack_rollup_gorilla(packed, "mean_y").toPandas()
    key = ["source", "bucket_start"]
    orig = orig.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)
    assert len(got) == len(orig)
    assert (got["source"] == orig["source"]).all()
    assert (pd.to_datetime(got["bucket_start"]) == pd.to_datetime(orig["bucket_start"])).all()
    assert np.array_equal(got["mean_y"].to_numpy(), orig["mean_y"].to_numpy())
    # compression: blob bytes < raw 16 B/point
    assert ppdf["blob"].map(len).sum() < 16 * ppdf["n_points"].sum()
