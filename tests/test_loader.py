"""Data_Loader analogue (reference Util/data_loader.py:5-19, SURVEY §2 C10):
`training_batches` must reproduce, per series, a NumPy replay of

    X = lagged matrix over the WHOLE series (W1 first-value pad, farthest
        lag first), Y = y
    train = first n - ceil(n/5) rows, test = last ceil(n/5) rows
        (sklearn train_test_split(test_size=0.2, shuffle=False))
    contiguous batches of `batch_size` in time order
        (torch DataLoader(shuffle=False))

and `data_loader_manifest`'s checksum must equal the polynomial fold of the
same flattened quantized content (the oracle-side contract is separately
hash-certified by the driver gate / tools/check_entry.py)."""

import math

import numpy as np
import pandas as pd

from forecaster_spark.operators.loader import data_loader_manifest, training_batches
from tests.conftest import mk_series_pdf

P = 3
BS = 16  # small batch size so the fixture exercises multi-batch splits


def _replay(pdf: pd.DataFrame):
    """Reference-semantics NumPy replay for ONE series (time-ordered)."""
    y = pdf["y"].to_numpy()
    n = len(y)
    X = np.empty((n, P))
    for i, k in enumerate(range(P, 0, -1)):  # farthest-first column order
        col = np.concatenate([np.full(min(k, n), y[0]), y[:-k]]) if k < n else np.full(n, y[0])
        X[:, i] = col[:n]
    n_test = math.ceil(n / 5)
    splits = {"train": (X[: n - n_test], y[: n - n_test]), "test": (X[n - n_test :], y[n - n_test :])}
    out = {}
    for split, (Xs, ys) in splits.items():
        for b in range(0, (len(ys) + BS - 1) // BS if len(ys) else 0):
            out[(split, b)] = (Xs[b * BS : (b + 1) * BS], ys[b * BS : (b + 1) * BS])
    return out


def test_training_batches_match_numpy_replay(spark):
    pdf = mk_series_pdf(n=100, n_sources=3).reset_index(drop=True)
    pdf["event_id"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    got = training_batches(df, value="y", p=P, batch_size=BS).toPandas()
    for src, g in pdf.groupby("source"):
        exp = _replay(g.sort_values(["ts", "event_id"]))
        rows = got[got["source"] == src]
        assert {(r.split, r.batch_id) for r in rows.itertuples()} == set(exp)
        for r in rows.itertuples():
            Xe, ye = exp[(r.split, r.batch_id)]
            Xg = np.array([list(v) for v in r.x], dtype=np.float64)
            yg = np.asarray(r.y, dtype=np.float64)
            assert r.n_rows == len(ye) and Xg.shape == Xe.shape
            np.testing.assert_array_equal(Xg, Xe)  # bit-exact: no arithmetic
            np.testing.assert_array_equal(yg, ye)


def test_split_sizes_follow_sklearn_ceil_rule(spark):
    # n=417, 400, 434 per mk_series_pdf → n_test = ceil(n/5)
    pdf = mk_series_pdf(n=400, n_sources=3).reset_index(drop=True)
    pdf["event_id"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    got = (
        training_batches(df, value="y", p=P, batch_size=BS)
        .groupBy("source", "split")
        .sum("n_rows")
        .toPandas()
        .set_index(["source", "split"])["sum(n_rows)"]
    )
    for src, g in pdf.groupby("source"):
        n = len(g)
        n_test = math.ceil(n / 5)
        assert got[(src, "test")] == n_test
        assert got[(src, "train")] == n - n_test


def test_manifest_checksum_matches_local_fold(spark):
    """The manifest checksum equals a pure-python uint64 fold of the same
    flattened quantized batch content (independent of the numpy kernel)."""
    pdf = mk_series_pdf(n=60, n_sources=2).reset_index(drop=True)
    pdf["event_id"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    man = data_loader_manifest(df, value="y", p=P, batch_size=BS).toPandas()
    M31, W = 1 << 31, 1 << 64

    def tokify(v):
        return ((int(math.floor(v * 1000)) % M31) + M31) % M31

    for src, g in pdf.groupby("source"):
        exp = _replay(g.sort_values(["ts", "event_id"]))
        for r in man[man["source"] == src].itertuples():
            Xe, ye = exp[(r.split, r.batch_id)]
            acc = 0
            for xr, yv in zip(Xe, ye):
                for v in list(xr) + [yv]:
                    acc = (acc * 31 + tokify(v)) % W
            signed = acc - W if acc >= 1 << 63 else acc
            assert r.xy_checksum == signed, (src, r.split, r.batch_id)
