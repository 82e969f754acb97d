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
    # int64-extreme deltas (|delta| > 2^63): the raw-dod token and the
    # decoder's mod-2^64 cumsum chain must still reconstruct exactly
    roundtrip(
        np.array([-(2**62), 2**62, -(2**61), 2**62 + 5], dtype=np.int64),
        np.array([1.5, -3.25, 7.0, 7.0]),
    )


@settings(max_examples=500, deadline=None)
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


def test_vectorized_encoder_matches_scalar_golden():
    """The vectorized scatter-packing encoder must be byte-identical to the
    token-by-token _BitWriter reference across regular, irregular, and
    pathological (sign flips, repeats, huge dods) inputs."""
    import numpy as np

    from forecaster_spark.functions.gorilla import (
        gorilla_decode,
        gorilla_encode,
        gorilla_encode_scalar,
    )

    rng = np.random.default_rng(17)
    cases = []
    ts = np.cumsum(rng.integers(55, 65, 5000)).astype(np.int64)
    cases.append((ts, np.round(rng.normal(100, 5, 5000), 3)))
    ts2 = np.cumsum(rng.integers(1, 1 << 40, 300)).astype(np.int64)  # raw-64 dods
    cases.append((ts2, rng.normal(size=300) * rng.choice([-1e300, 1e-300, 1.0], 300)))
    cases.append((np.arange(400, dtype=np.int64) * 60, np.repeat(rng.normal(size=8), 50)))
    cases.append((np.array([5], dtype=np.int64), np.array([1.5])))
    cases.append((np.array([], dtype=np.int64), np.array([])))
    # XOR patterns near all-ones: float64(x) for x within ~2^11 of 2^64
    # rounds UP to 2^64, so the float-log2 lead count must clamp (the r2
    # silent-corruption bug: lead=-1 → garbage header token OR-bleeding
    # into neighbors). Pairs whose bit patterns are complements / near-
    # complements drive the XOR into [2^64-2^12, 2^64).
    cases.append(
        (
            np.array([0, 60], dtype=np.int64),
            np.array([2.2250739e-308, -1.7976931e308]),  # minimized r2 repro
        )
    )
    top = np.uint64(0xFFFFFFFFFFFFFFFF)
    for off in [0, 1, 2, 1023, 1024, 2047, 2048, 4095]:
        u = np.array([0, top - np.uint64(off)], dtype=np.uint64)
        cases.append((np.array([0, 60], dtype=np.int64), u.view(np.float64)))
    base = rng.integers(0, 1 << 63, 64, dtype=np.uint64)
    pair = base ^ (top - rng.integers(0, 4096, 64).astype(np.uint64))
    inter = np.empty(128, dtype=np.uint64)
    inter[0::2], inter[1::2] = base, pair
    cases.append((np.arange(128, dtype=np.int64) * 60, inter.view(np.float64)))
    for ts_c, vals_c in cases:
        fast = gorilla_encode(ts_c, vals_c)
        gold = gorilla_encode_scalar(ts_c, vals_c)
        assert fast == gold, f"byte mismatch at n={len(ts_c)}"
        dts, dvals = gorilla_decode(fast)
        assert np.array_equal(dts, ts_c)
        assert np.array_equal(dvals.view(np.uint64), np.asarray(vals_c, float).view(np.uint64))
