"""DuckDB SQL mirrors of the exact-solver forecast kernels (solver="exact"
in :mod:`forecaster_spark.models.kernels` → :mod:`oracle.ref` exact fits).

Why these exist: pinv/lstsq coefficients depend on BLAS internals no SQL
engine reproduces, so forecast queries could only get rows-only driver
checks. The exact solver fits by integer Cramer (HUGEINT determinants here,
Python bigints in the kernel — exact integers agree regardless of
algorithm) and predicts with fixed left-to-right accumulation, which SQL's
left-associative expressions replay bit-for-bit. The generated oracles
certify the full distributed forecast pipeline: hourly exact-sum rollup →
floor-quantized signal → lag features (z[0] padding) → OLS / Yule-Walker /
direct fits → multi-horizon recursion with forge + rectify.

All generators are unrolled for p=2, hh=4 (the contract configs);
reference semantics: arx.py:229-324 (recursive+forge), arx_d.py:216-253
(direct), ar_yw.py:88-131 (Yule-Walker + dynamic forecast).
"""

from __future__ import annotations

P = 2
HH = 4
SKIP = 2

#: hourly exact-sum rollup of the events table, floor-quantized to an
#: integer signal, with reference lag features (out-of-range → z[0])
_SERIES = """
series AS (SELECT event_type AS source, ts, value FROM events),
th AS (
  SELECT source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM series GROUP BY 1, 2
),
ord_s AS (
  SELECT source, CAST(yd AS BIGINT) AS y,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
),
lagged AS (
  SELECT source, t, y,
         coalesce(lag(y, 1) OVER w, first_value(y) OVER w) AS l1,
         coalesce(lag(y, 2) OVER w, first_value(y) OVER w) AS l2
  FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)
)
"""

def _out(hh: int) -> str:
    """Long-format (source, t, h, y_hat) emission from the final fc{hh} CTE."""
    unions = "\n  UNION ALL ".join(
        f"SELECT source, t, {h} AS h, f{h} AS y_hat FROM fc{hh}" for h in range(1, hh + 1)
    )
    return f"""
SELECT source, CAST(t AS BIGINT) AS t, CAST(h AS INT) AS h, y_hat FROM (
  {unions}
)"""


_OUT = _out(HH)


def _det3(m: list[list[str]]) -> str:
    (a, b, c), (d, e, f), (g, h, i) = m
    return (
        f"(({a})*(({e})*({i}) - ({f})*({h}))"
        f" - ({b})*(({d})*({i}) - ({f})*({g}))"
        f" + ({c})*(({d})*({h}) - ({e})*({g})))"
    )


def _det4(m: list[list[str]]) -> str:
    """4×4 determinant by first-row cofactor expansion over :func:`_det3`
    (exact integers — any expansion order yields the same value)."""
    terms = []
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        terms.append(f"{'+' if j % 2 == 0 else '-'} ({m[0][j]})*{_det3(minor)}")
    return "(0 " + " ".join(terms) + ")"


def _cramer3(c: list[str], suffix: str = "") -> str:
    """SELECT items solving A·b = c for A = X1ᵀX1 with X1 = [1, l2, l1]
    (sums columns n, s2, s1, s22, s21, s11 in scope) — aliases
    b0/b1/b2{suffix} with b1 multiplying l2 and b2 multiplying l1, mirroring
    the reference's farthest-lag-first column order."""
    A = [["n", "s2", "s1"], ["s2", "s22", "s21"], ["s1", "s21", "s11"]]
    items = [f"{_det3(A)} AS dd{suffix}"]
    for j in range(3):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
        items.append(f"{_det3(Aj)} AS d{j}{suffix}")
    for j in range(3):
        items.append(f"CAST(d{j}{suffix} AS DOUBLE) / CAST(dd{suffix} AS DOUBLE) AS b{j}{suffix}")
    return ", ".join(items)


_NORMAL_SUMS = """
  CAST(count(*) AS HUGEINT) AS n,
  CAST(sum(l2) AS HUGEINT) AS s2, CAST(sum(l1) AS HUGEINT) AS s1,
  CAST(sum(l2*l2) AS HUGEINT) AS s22, CAST(sum(l2*l1) AS HUGEINT) AS s21,
  CAST(sum(l1*l1) AS HUGEINT) AS s11"""


def arx_recursive_sql() -> str:
    """ARX(p=2, spec=1) in-sample recursive forecast with forge + rectify:
    h=1 from [l2, l1]; h=2 from [l1, f1]; h=3 from [f1, f2]; h=4 from
    [f2, f3] (arx.py:293-324 column splice at p=2)."""
    return f"""
WITH {_SERIES},
sums AS (
  SELECT source,{_NORMAL_SUMS},
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(y*l2) AS HUGEINT) AS sy2, CAST(sum(y*l1) AS HUGEINT) AS sy1
  FROM lagged GROUP BY source
),
params AS (SELECT source, {_cramer3(["sy", "sy2", "sy1"])} FROM sums),
fc1 AS (
  SELECT g.source, g.t, g.l1, g.l2, p.b0, p.b1, p.b2,
         greatest(p.b0 + g.l2*p.b1 + g.l1*p.b2, 0.0) AS f1
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, greatest(b0 + l1*b1 + f1*b2, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0 + f1*b1 + f2*b2, 0.0) AS f3 FROM fc2),
fc4 AS (SELECT *, greatest(b0 + f2*b1 + f3*b2, 0.0) AS f4 FROM fc3)
{_OUT}"""


def arx_direct_sql() -> str:
    """ARX_D(p=2, spec=1): one exact OLS per horizon against the zero-tail
    lead targets (Util/build_matrix.py:163-186), single batched predict per
    horizon with rectify (arx_d.py:216-253)."""
    lead_cols = ", ".join(
        f"coalesce(lead(y, {h - 1}) OVER w, 0) AS yh{h}" for h in range(1, HH + 1)
    )
    ysums = ", ".join(
        f"CAST(sum(yh{h}) AS HUGEINT) AS sy_{h}, "
        f"CAST(sum(yh{h}*l2) AS HUGEINT) AS sy2_{h}, "
        f"CAST(sum(yh{h}*l1) AS HUGEINT) AS sy1_{h}"
        for h in range(1, HH + 1)
    )
    cramers = ", ".join(
        _cramer3([f"sy_{h}", f"sy2_{h}", f"sy1_{h}"], suffix=f"_{h}") for h in range(1, HH + 1)
    )
    preds = ", ".join(
        f"greatest(p.b0_{h} + g.l2*p.b1_{h} + g.l1*p.b2_{h}, 0.0) AS f{h}"
        for h in range(1, HH + 1)
    )
    return f"""
WITH {_SERIES},
led AS (
  SELECT source, t, y, l1, l2, {lead_cols}
  FROM lagged WINDOW w AS (PARTITION BY source ORDER BY t)
),
sums AS (SELECT source,{_NORMAL_SUMS}, {ysums} FROM led GROUP BY source),
params AS (SELECT source, {cramers} FROM sums),
fc4 AS (
  SELECT g.source, g.t, {preds}
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
)
{_OUT}"""


def _cramer4(c: list[str], suffix: str = "") -> str:
    """SELECT items solving the 4-var normal equations for X1 = [1, l2, l1,
    x1] (sums n, s2, s1, sx, s22, s21, s2x, s11, s1x, sxx in scope)."""
    A = [
        ["n", "s2", "s1", "sx"],
        ["s2", "s22", "s21", "s2x"],
        ["s1", "s21", "s11", "s1x"],
        ["sx", "s2x", "s1x", "sxx"],
    ]
    items = [f"{_det4(A)} AS dd{suffix}"]
    for j in range(4):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(4)] for i in range(4)]
        items.append(f"{_det4(Aj)} AS d{j}{suffix}")
    for j in range(4):
        items.append(f"CAST(d{j}{suffix} AS DOUBLE) / CAST(dd{suffix} AS DOUBLE) AS b{j}{suffix}")
    return ", ".join(items)


def arx_exo_sql() -> str:
    """ARX(p=2, q=1, spec=1) with the hourly event count as exogenous input:
    in-sample recursive forecast, hh=3. Exercises exo lagging (W2 — z[0]
    padding; the backcast backfill is an exercised no-op since cnt ≥ 1) and
    the hide path (W6 — h > q repeats the last observable exo lag). Feature
    layout per reference column order: [y lags | exo lags] → X1 =
    [1, l2, l1, x1]; h=2 forges [l1, f1, x1], h=3 [f1, f2, x1]."""
    return f"""
WITH series AS (SELECT event_type AS source, ts, value FROM events),
th AS (
  SELECT source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd,
         count(*) AS x
  FROM series GROUP BY 1, 2
),
ord_s AS (
  SELECT source, CAST(yd AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
),
lagged AS (
  SELECT source, t, y,
         coalesce(lag(y, 1) OVER w, first_value(y) OVER w) AS l1,
         coalesce(lag(y, 2) OVER w, first_value(y) OVER w) AS l2,
         coalesce(lag(x, 1) OVER w, first_value(x) OVER w) AS x1
  FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)
),
sums AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l2) AS HUGEINT) AS s2, CAST(sum(l1) AS HUGEINT) AS s1,
         CAST(sum(x1) AS HUGEINT) AS sx,
         CAST(sum(l2*l2) AS HUGEINT) AS s22, CAST(sum(l2*l1) AS HUGEINT) AS s21,
         CAST(sum(l2*x1) AS HUGEINT) AS s2x,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*x1) AS HUGEINT) AS s1x,
         CAST(sum(x1*x1) AS HUGEINT) AS sxx,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(y*l2) AS HUGEINT) AS sy2,
         CAST(sum(y*l1) AS HUGEINT) AS sy1, CAST(sum(y*x1) AS HUGEINT) AS syx
  FROM lagged GROUP BY source
),
params AS (SELECT source, {_cramer4(["sy", "sy2", "sy1", "syx"])} FROM sums),
fc1 AS (
  SELECT g.source, g.t, g.l1, g.x1, p.b0, p.b1, p.b2, p.b3,
         greatest(p.b0 + g.l2*p.b1 + g.l1*p.b2 + g.x1*p.b3, 0.0) AS f1
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, greatest(b0 + l1*b1 + f1*b2 + x1*b3, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0 + f1*b1 + f2*b2 + x1*b3, 0.0) AS f3 FROM fc2)
{_out(3)}"""


def ar_yw_sql() -> str:
    """AR(2) Yule-Walker (mle) + dynamic multi-horizon forecast, exact form:
    centered integers z_t = n·y_t − Σy make the n³-scaled Toeplitz system
    integer ([[Z0,Z1],[Z1,Z0]]·φ = [Z1,Z2]); intercept = mean·(1−(φ1+φ2));
    origins use actual lags, later horizons their own forecasts, no clip
    (ar_yw.py:96-131)."""
    return f"""
WITH {_SERIES},
ysums AS (SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
          FROM ord_s GROUP BY source),
zt AS (SELECT o.source, o.t, o.y, (o.y * u.n - u.sy) AS z, u.n, u.sy
       FROM ord_s o JOIN ysums u USING (source)),
zl AS (SELECT source, t, z, lead(z, 1) OVER w AS z1, lead(z, 2) OVER w AS z2, n, sy
       FROM zt WINDOW w AS (PARTITION BY source ORDER BY t)),
zsums AS (
  SELECT source, max(n) AS n, max(sy) AS sy,
         CAST(sum(z*z) AS HUGEINT) AS z0s,
         CAST(sum(CASE WHEN z1 IS NOT NULL THEN z*z1 END) AS HUGEINT) AS z1s,
         CAST(sum(CASE WHEN z2 IS NOT NULL THEN z*z2 END) AS HUGEINT) AS z2s
  FROM zl GROUP BY source
),
params AS (
  SELECT source,
         (z0s*z0s - z1s*z1s) AS dd,
         (z1s*z0s - z1s*z2s) AS d1,
         (z0s*z2s - z1s*z1s) AS d2,
         CAST(d1 AS DOUBLE) / CAST(dd AS DOUBLE) AS phi1,
         CAST(d2 AS DOUBLE) / CAST(dd AS DOUBLE) AS phi2,
         CAST(sy AS DOUBLE) / n AS mean_y,
         mean_y * (1.0 - (phi1 + phi2)) AS c
  FROM zsums
),
yl AS (SELECT source, t, lag(y, 1) OVER w AS yl1, lag(y, 2) OVER w AS yl2
       FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)),
fc1 AS (
  SELECT g.source, g.t, g.yl1, p.phi1, p.phi2, p.c,
         p.c + p.phi1*g.yl1 + p.phi2*g.yl2 AS f1
  FROM yl g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, c + phi1*f1 + phi2*yl1 AS f2 FROM fc1),
fc3 AS (SELECT *, c + phi1*f2 + phi2*f1 AS f3 FROM fc2),
fc4 AS (SELECT *, c + phi1*f3 + phi2*f2 AS f4 FROM fc3)
{_OUT}"""
