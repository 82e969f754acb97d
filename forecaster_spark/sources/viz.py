"""Image sink: heat-map rendering of small result tables as uncompressed
BMP — the reference's matplotlib attention-heat-map sink (S4,
mhattn_regressor.py:88-94: ``plt.imshow(heatMap)`` of per-feature attention
scores) re-expressed without any plotting dependency (none ships in this
container) on top of the engine's own pure-numpy BMP codec.

Only ever applied to driver-sized tables (QoF metrics, feature scores —
a few dozen cells); the distributed plan ends before the sink.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from forecaster_spark.operators.multimodal import bmp_encode


def heatmap_bmp(matrix: np.ndarray, cell: int = 12) -> bytes:
    """2-D matrix → blue(min)→red(max) heat-map BMP bytes, each value an
    upscaled ``cell``×``cell`` block. NaNs render black."""
    m = np.asarray(matrix, dtype=float)
    finite = np.isfinite(m)
    lo = m[finite].min() if finite.any() else 0.0
    hi = m[finite].max() if finite.any() else 1.0
    rng = hi - lo
    norm = (np.where(finite, m, lo) - lo) / (rng if rng else 1.0)
    r = np.round(255 * norm)
    b = np.round(255 * (1.0 - norm))
    g = np.round(64 * (1.0 - np.abs(norm - 0.5) * 2.0))
    img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    img[~finite] = 0
    img = np.repeat(np.repeat(img, cell, axis=0), cell, axis=1)
    return bmp_encode(img)


def write_heatmap_bmp(
    df: DataFrame,
    path: str,
    row: str = "source",
    col: str = "h",
    value: str = "smape",
    cell: int = 12,
) -> tuple[int, int]:
    """Pivot a small (row × col → value) table — e.g. a per-horizon QoF
    table or feature-score table — into a heat-map BMP at ``path``.
    Returns the pivoted (n_rows, n_cols). Rows/cols sort ascending, so the
    image layout is deterministic."""
    pdf = (
        df.select(row, col, value)
        .toPandas()
        .pivot(index=row, columns=col, values=value)
        .sort_index(axis=0)
        .sort_index(axis=1)
    )
    with open(path, "wb") as f:
        f.write(heatmap_bmp(pdf.to_numpy(), cell))
    return pdf.shape
