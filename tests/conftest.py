import numpy as np
import pandas as pd
import pytest

from forecaster_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("forecaster_spark_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def assert_df_equal(actual_pdf: pd.DataFrame, expected_pdf: pd.DataFrame, sort_cols=None, **kwargs):
    """Order-insensitive DataFrame comparison helper."""
    if sort_cols is None:
        sort_cols = list(expected_pdf.columns)
    a = actual_pdf.sort_values(sort_cols).reset_index(drop=True)[list(expected_pdf.columns)]
    e = expected_pdf.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, **kwargs)


def mk_series_pdf(n=400, n_sources=3, seed=7, cadence_s=7, with_gaps=False):
    """Small long-format multi-series fixture (FIXTURES.md F3)."""
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_sources):
        m = n + s * 17
        t0 = pd.Timestamp("2025-01-01")
        y = np.abs(rng.normal(50, 10, m)).cumsum() / 7
        ts = t0 + pd.to_timedelta(np.arange(m) * cadence_s, unit="s")
        pdf = pd.DataFrame({"source": f"s{s}", "ts": ts, "y": y})
        if with_gaps:
            drop = rng.choice(m, size=m // 10, replace=False)
            pdf = pdf.drop(index=drop)
        rows.append(pdf)
    return pd.concat(rows, ignore_index=True)
