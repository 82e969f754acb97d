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


def _cramer3(c: list[str], suffix: str = "", lam: int = 0) -> str:
    """SELECT items solving A·b = c for A = X1ᵀX1 with X1 = [1, l2, l1]
    (sums columns n, s2, s1, s22, s21, s11 in scope) — aliases
    b0/b1/b2{suffix} with b1 multiplying l2 and b2 multiplying l1, mirroring
    the reference's farthest-lag-first column order. ``lam`` > 0 adds the
    ridge penalty to the non-intercept diagonal (ref.ridge_fit_exact)."""
    s22 = f"(s22 + {int(lam)})" if lam else "s22"
    s11 = f"(s11 + {int(lam)})" if lam else "s11"
    A = [["n", "s2", "s1"], ["s2", s22, "s21"], ["s1", "s21", s11]]
    items = [f"{_det3(A)} AS dd{suffix}"]
    for j in range(3):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
        items.append(f"{_det3(Aj)} AS d{j}{suffix}")
    items += _coef_items(c[0], 3, suffix)
    return ", ".join(items)


def _coef_items(c0: str, k: int, suffix: str) -> list[str]:
    """Coefficient items with the singular-design fallback: dd = 0 →
    intercept-only solution [c0/n, 0, …] (mirrors ref.ols_fit_exact's
    degenerate branch — pinv's minimum-norm solution is not SQL-expressible,
    a zero-variance/constant series must still get deterministic params)."""
    out = [
        f"CASE WHEN dd{suffix} = 0 THEN CAST({c0} AS DOUBLE) / CAST(n AS DOUBLE) "
        f"ELSE CAST(d0{suffix} AS DOUBLE) / CAST(dd{suffix} AS DOUBLE) END AS b0{suffix}"
    ]
    for j in range(1, k):
        out.append(
            f"CASE WHEN dd{suffix} = 0 THEN 0.0 "
            f"ELSE CAST(d{j}{suffix} AS DOUBLE) / CAST(dd{suffix} AS DOUBLE) END AS b{j}{suffix}"
        )
    return out


_NORMAL_SUMS = """
  CAST(count(*) AS HUGEINT) AS n,
  CAST(sum(l2) AS HUGEINT) AS s2, CAST(sum(l1) AS HUGEINT) AS s1,
  CAST(sum(l2*l2) AS HUGEINT) AS s22, CAST(sum(l2*l1) AS HUGEINT) AS s21,
  CAST(sum(l1*l1) AS HUGEINT) AS s11"""


def arx_ridge_sql(lam: int) -> str:
    """Ridge-ARX(p=2, spec=1) in-sample recursive forecast: identical
    dataflow to :func:`arx_recursive_sql` with the L2 penalty ``lam`` on the
    non-intercept normal-equation diagonal (``ref.ridge_fit_exact`` —
    intercept unpenalized). Determinant magnitude: λ only adds to already
    positive diagonal entries, so the ``n·Σy²``-scale HUGEINT bounds of the
    OLS path carry over unchanged."""
    return f"""
WITH {_SERIES},
sums AS (
  SELECT source,{_NORMAL_SUMS},
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(y*l2) AS HUGEINT) AS sy2, CAST(sum(y*l1) AS HUGEINT) AS sy1
  FROM lagged GROUP BY source
),
params AS (SELECT source, {_cramer3(["sy", "sy2", "sy1"], lam=lam)} FROM sums),
fc1 AS (
  SELECT g.source, g.t, g.l1, g.l2, p.b0, p.b1, p.b2,
         greatest(p.b0 + g.l2*p.b1 + g.l1*p.b2, 0.0) AS f1
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, greatest(b0 + l1*b1 + f1*b2, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0 + f1*b1 + f2*b2, 0.0) AS f3 FROM fc2),
fc4 AS (SELECT *, greatest(b0 + f2*b1 + f3*b2, 0.0) AS f4 FROM fc3)
{_OUT}"""


def arma_hr_sql(q_scale: int = 8) -> str:
    """ARMA(1,1) in-sample recursive forecast by Hannan–Rissanen two-stage
    exact-Cramer OLS (ref.arma11_hr_forecast): stage-1 long-AR(2) on the
    z[0]-padded lags (reusing the ARX normal-equation sums), residuals by
    the fixed left-assoc chain, innovations quantized eq = floor(e·q_scale)
    with q_scale a power of two (exact multiply + exact floor on both
    engines), stage-2 OLS of y on [y lag-1, eq lag-1], h ≥ 2 forges the y
    lag and drops the MA term (future innovations are zero — the zero term
    is omitted on BOTH engines rather than multiplied, avoiding ±0.0
    hazards). HUGEINT bounds: eq ≤ q_scale·|e| stays y-scale for q_scale=8,
    so the 3×3 determinants keep the n·Σy²-cubed envelope of the OLS path."""
    s2_sums = """
  CAST(count(*) AS HUGEINT) AS n,
  CAST(sum(l1) AS HUGEINT) AS s2, CAST(sum(m1) AS HUGEINT) AS s1,
  CAST(sum(l1*l1) AS HUGEINT) AS s22, CAST(sum(l1*m1) AS HUGEINT) AS s21,
  CAST(sum(m1*m1) AS HUGEINT) AS s11,
  CAST(sum(y) AS HUGEINT) AS sy,
  CAST(sum(y*l1) AS HUGEINT) AS syl, CAST(sum(y*m1) AS HUGEINT) AS sym"""
    return f"""
WITH {_SERIES},
s1sums AS (
  SELECT source,{_NORMAL_SUMS},
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(y*l2) AS HUGEINT) AS sy2, CAST(sum(y*l1) AS HUGEINT) AS sy1
  FROM lagged GROUP BY source
),
pa AS (SELECT source, {_cramer3(["sy", "sy2", "sy1"], suffix="a")} FROM s1sums),
res AS (
  SELECT g.source, g.t, g.y, g.l1,
         CAST(floor((CAST(g.y AS DOUBLE)
                     - ((p.b0a + g.l2*p.b1a) + g.l1*p.b2a)) * {float(q_scale)})
              AS BIGINT) AS eq
  FROM lagged g JOIN pa p USING (source)
),
r2 AS (
  -- _cramer3 slot naming: the "2" slot carries the y lag, the "1" slot the
  -- quantized-innovation lag, so b1b lands on l1 and b2b on m1
  SELECT source, t, y, l1,
         coalesce(lag(eq, 1) OVER w, first_value(eq) OVER w) AS m1
  FROM res WINDOW w AS (PARTITION BY source ORDER BY t)
),
s2sums AS (SELECT source,{s2_sums} FROM r2 GROUP BY source),
pb AS (SELECT source, {_cramer3(["sy", "syl", "sym"], suffix="b")} FROM s2sums),
fc1 AS (
  SELECT g.source, g.t, p.b0b, p.b1b,
         greatest((p.b0b + g.l1*p.b1b) + g.m1*p.b2b, 0.0) AS f1
  FROM r2 g JOIN pb p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, greatest(b0b + f1*b1b, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0b + f2*b1b, 0.0) AS f3 FROM fc2),
fc4 AS (SELECT *, greatest(b0b + f3*b1b, 0.0) AS f4 FROM fc3)
{_OUT}"""


def arx_recursive_sql(rectify: bool = True) -> str:
    """ARX(p=2, spec=1) in-sample recursive forecast with forge:
    h=1 from [l2, l1]; h=2 from [l1, f1]; h=3 from [f1, f2]; h=4 from
    [f2, f3] (arx.py:293-324 column splice at p=2). ``rectify=False`` drops
    the non-negativity clamp — the pure-linear chain a standard-scaler
    config is affine-equivalent to (arx.py:136 disables nneg under the
    standard y-scaler)."""

    def pred(expr: str) -> str:
        return f"greatest({expr}, 0.0)" if rectify else f"({expr})"

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
         {pred("p.b0 + g.l2*p.b1 + g.l1*p.b2")} AS f1
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, {pred("b0 + l1*b1 + f1*b2")} AS f2 FROM fc1),
fc3 AS (SELECT *, {pred("b0 + f1*b1 + f2*b2")} AS f3 FROM fc2),
fc4 AS (SELECT *, {pred("b0 + f2*b1 + f3*b2")} AS f4 FROM fc3)
{_OUT}"""


def arx_std_scaler_quantized_sql(per_unit: int = 100) -> str:
    """Oracle for the standard-scaler + pinv forecast config: the scaler is
    affine and the standard-scaled chain drops rectify, so the scaled
    pinv-fit recursive forecast is MATHEMATICALLY identical to the
    unrectified exact-Cramer forecast on the raw series (OLS with intercept
    is affine-equivariant; the forge feeds back forecasts consistently in
    either space). Numerically the two differ only by solver ulp drift —
    measured ≤ 1.5e-14 at both contract SFs against a ≥ 2.6e-5 distance to
    the nearest centi-unit floor boundary (safety factor ~10^9), so both
    engines land on identical quantized values."""
    inner = arx_recursive_sql(rectify=False)
    # multiply (exact dyadic-free single IEEE op, same in both engines) —
    # never divide by the quantum (1/0.01 is not exactly representable)
    return f"""
SELECT source, t, h, CAST(floor(y_hat * {per_unit}) AS BIGINT) AS y_hat_c
FROM ({inner})"""


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
    items += _coef_items(c[0], 4, suffix)
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


def arx_cross_sql() -> str:
    """ARX_Symb cross terms (P4 — arx_symb.py:162-225 cross=True) with
    empty endo/exo transform lists: design [1, l1(y), l1(x), l1(y·x)] for
    p=q=1, exo x = 1 + t mod 7 (weekday-style index; nonzero so the
    backcast backfill is an exercised no-op). Cross features are y·x
    computed from actuals then LAGGED — at h ≥ 2 they are hidden as-of
    like any exo block (never recomputed from forecasts), which is exactly
    the reference's cross semantics this oracle certifies. Exact 4×4
    Cramer with slot bindings [1, l1, x1, c1]; magnitudes are SF-invariant
    (x is t-derived, not count-derived) and stay far inside HUGEINT."""
    return f"""
WITH series AS (SELECT event_type AS source, ts, value FROM events),
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
ex AS (SELECT source, t, y, 1 + t % 7 AS x FROM ord_s),
lagged AS (
  SELECT source, t, y,
         coalesce(lag(y, 1) OVER w, first_value(y) OVER w) AS l1,
         coalesce(lag(x, 1) OVER w, first_value(x) OVER w) AS x1,
         coalesce(lag(y*x, 1) OVER w, first_value(y*x) OVER w) AS c1
  FROM ex WINDOW w AS (PARTITION BY source ORDER BY t)
),
sums AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1) AS HUGEINT) AS s2, CAST(sum(x1) AS HUGEINT) AS s1,
         CAST(sum(c1) AS HUGEINT) AS sx,
         CAST(sum(l1*l1) AS HUGEINT) AS s22, CAST(sum(l1*x1) AS HUGEINT) AS s21,
         CAST(sum(l1*c1) AS HUGEINT) AS s2x,
         CAST(sum(x1*x1) AS HUGEINT) AS s11, CAST(sum(x1*c1) AS HUGEINT) AS s1x,
         CAST(sum(c1*c1) AS HUGEINT) AS sxx,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(y*l1) AS HUGEINT) AS syl,
         CAST(sum(y*x1) AS HUGEINT) AS syx, CAST(sum(y*c1) AS HUGEINT) AS syc
  FROM lagged GROUP BY source
),
params AS (SELECT source, {_cramer4(["sy", "syl", "syx", "syc"])} FROM sums),
fc1 AS (
  SELECT g.source, g.t, g.x1, g.c1, p.b0, p.b1, p.b2, p.b3,
         greatest(p.b0 + g.l1*p.b1 + g.x1*p.b2 + g.c1*p.b3, 0.0) AS f1
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, greatest(b0 + f1*b1 + x1*b2 + c1*b3, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0 + f2*b1 + x1*b2 + c1*b3, 0.0) AS f3 FROM fc2)
{_out(3)}"""


def arx_symb_sql() -> str:
    """ARX_Symb(p=1, spec=1, f_endo=[square]) in-sample recursive forecast,
    hh=3: design [1, l1, lag(y²)], forge with symbolic scale-correction —
    later horizons re-apply the transform to their own (clipped) forecasts,
    so h=2 features are [f1, f1·f1], h=3 [f2, f2·f2]
    (arx_symb.py:228-295; square written as multiplication — pow differs
    across engines at ulp level). Signal = floor(mean_y/4) so the quartic
    normal-equation sums stay inside HUGEINT determinants."""
    return f"""
WITH series AS (SELECT event_type AS source, ts, value FROM events),
th AS (
  SELECT source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*) / 4.0) AS yd
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
         coalesce(lag(y*y, 1) OVER w, first_value(y*y) OVER w) AS ls
  FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)
),
sums AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1) AS HUGEINT) AS s1, CAST(sum(ls) AS HUGEINT) AS ss,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*ls) AS HUGEINT) AS s1s,
         CAST(sum(ls*ls) AS HUGEINT) AS sss,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(y*l1) AS HUGEINT) AS sy1,
         CAST(sum(y*ls) AS HUGEINT) AS sys
  FROM lagged GROUP BY source
),
params AS (SELECT source, {_cramer3_symb()} FROM sums),
fc1 AS (
  SELECT g.source, g.t, p.b0, p.b1, p.b2,
         greatest(p.b0 + g.l1*p.b1 + g.ls*p.b2, 0.0) AS f1
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, greatest(b0 + f1*b1 + (f1*f1)*b2, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0 + f2*b1 + (f2*f2)*b2, 0.0) AS f3 FROM fc2)
{_out(3)}"""


def _cramer3_symb(suffix: str = "", c: list[str] | None = None) -> str:
    """Cramer items for X1 = [1, l1, ls] (sums n, s1, ss, s11, s1s, sss);
    ``c`` overrides the target-sum column names (direct mode fits one
    regression per horizon against per-horizon lead sums)."""
    A = [["n", "s1", "ss"], ["s1", "s11", "s1s"], ["ss", "s1s", "sss"]]
    c = c or ["sy", "sy1", "sys"]
    items = [f"{_det3(A)} AS dd{suffix}"]
    for j in range(3):
        Aj = [[c[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
        items.append(f"{_det3(Aj)} AS d{j}{suffix}")
    items += _coef_items(c[0], 3, suffix)
    return ", ".join(items)


def arx_symb_direct_sql() -> str:
    """ARX_Symb_D(p=1, spec=1, f_endo=[square]) direct multi-horizon, hh=3:
    the symbolic design [1, l1, lag(y²)] of :func:`arx_symb_sql` feeding
    one exact OLS per horizon against the zero-tail lead targets, then a
    single batched rectified predict per horizon — no forge/scale-correction
    (direct mode predicts every horizon from actual lagged features).
    Reference: arx_symb_d.py:26-192 (symbolic design + per-horizon fits,
    lead matrix Util/build_matrix.py:163-186, predict arx_d.py:216-253).
    Same /4 signal quantization as the recursive symb query so the quartic
    normal-equation sums stay inside HUGEINT determinants."""
    hh = 3
    lead_cols = ", ".join(
        f"coalesce(lead(y, {h - 1}) OVER w, 0) AS yh{h}" for h in range(1, hh + 1)
    )
    ysums = ", ".join(
        f"CAST(sum(yh{h}) AS HUGEINT) AS sy_{h}, "
        f"CAST(sum(yh{h}*l1) AS HUGEINT) AS sy1_{h}, "
        f"CAST(sum(yh{h}*ls) AS HUGEINT) AS sys_{h}"
        for h in range(1, hh + 1)
    )
    cramers = ", ".join(
        _cramer3_symb(suffix=f"_{h}", c=[f"sy_{h}", f"sy1_{h}", f"sys_{h}"])
        for h in range(1, hh + 1)
    )
    preds = ", ".join(
        f"greatest(p.b0_{h} + g.l1*p.b1_{h} + g.ls*p.b2_{h}, 0.0) AS f{h}"
        for h in range(1, hh + 1)
    )
    return f"""
WITH series AS (SELECT event_type AS source, ts, value FROM events),
th AS (
  SELECT source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*) / 4.0) AS yd
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
         coalesce(lag(y*y, 1) OVER w, first_value(y*y) OVER w) AS ls
  FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)
),
led AS (
  SELECT source, t, y, l1, ls, {lead_cols}
  FROM lagged WINDOW w AS (PARTITION BY source ORDER BY t)
),
sums AS (
  SELECT source,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1) AS HUGEINT) AS s1, CAST(sum(ls) AS HUGEINT) AS ss,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*ls) AS HUGEINT) AS s1s,
         CAST(sum(ls*ls) AS HUGEINT) AS sss,
         {ysums}
  FROM led GROUP BY source
),
params AS (SELECT source, {cramers} FROM sums),
fc{hh} AS (
  SELECT g.source, g.t, {preds}
  FROM lagged g JOIN params p USING (source) WHERE g.t >= {SKIP}
)
{_out(hh)}"""


def arx_qof_roll_sql(rc: int = 2) -> str:
    """Rolling-validation QoF (trainNtest — forecaster.py:388-419,446-466):
    every ``rc`` test steps, refit the exact OLS on the fixed tr_size-row
    window ending at the origin (window sums = differences of integer
    cumulative sums — order-free because exact), forecast the next rc rows
    with forge, then per-horizon TnT metrics with SEQUENTIAL left-fold
    accumulation (list_reduce over t-ordered lists, mirroring the kernel's
    diagnose_exact)."""
    return f"""
WITH {_SERIES},
meta AS (
  SELECT source, count(*) AS n, CAST(trunc(0.8 * count(*)) AS BIGINT) AS trs
  FROM ord_s GROUP BY source
),
cum AS (
  SELECT source, t, y, l1, l2,
         count(*) OVER wc AS cn,
         sum(l2) OVER wc AS c2, sum(l1) OVER wc AS c1,
         sum(l2*l2) OVER wc AS c22, sum(l2*l1) OVER wc AS c21, sum(l1*l1) OVER wc AS c11,
         sum(y) OVER wc AS cy, sum(y*l2) OVER wc AS cy2, sum(y*l1) OVER wc AS cy1
  FROM lagged
  WINDOW wc AS (PARTITION BY source ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
origins AS (
  SELECT m.source, m.n, m.trs, unnest(range(0, m.n - m.trs, {rc})) AS i FROM meta m
),
osum AS (
  -- fixed-window [i, trs+i) sums via cumulative differences (exact ints)
  SELECT o.source, o.i,
         CAST(hi.cn - coalesce(lo.cn, 0) AS HUGEINT) AS n,
         CAST(hi.c2 - coalesce(lo.c2, 0) AS HUGEINT) AS s2,
         CAST(hi.c1 - coalesce(lo.c1, 0) AS HUGEINT) AS s1,
         CAST(hi.c22 - coalesce(lo.c22, 0) AS HUGEINT) AS s22,
         CAST(hi.c21 - coalesce(lo.c21, 0) AS HUGEINT) AS s21,
         CAST(hi.c11 - coalesce(lo.c11, 0) AS HUGEINT) AS s11,
         CAST(hi.cy - coalesce(lo.cy, 0) AS HUGEINT) AS sy,
         CAST(hi.cy2 - coalesce(lo.cy2, 0) AS HUGEINT) AS sy2,
         CAST(hi.cy1 - coalesce(lo.cy1, 0) AS HUGEINT) AS sy1
  FROM origins o
  JOIN cum hi ON hi.source = o.source AND hi.t = o.trs + o.i - 1
  LEFT JOIN cum lo ON lo.source = o.source AND lo.t = o.i - 1
),
oparams AS (SELECT source, i, {_cramer3(["sy", "sy2", "sy1"])} FROM osum),
tmap AS (
  -- test row → its refit origin: chunks of rc, last chunk extends to n
  SELECT l.source, l.t, l.l1, l.l2, m.trs, m.n,
         least(((l.t - m.trs) // {rc}) * {rc}, ((m.n - m.trs - 1) // {rc}) * {rc}) AS i
  FROM lagged l JOIN meta m USING (source) WHERE l.t >= m.trs
),
fc1 AS (
  SELECT g.source, g.t, g.trs, g.n, g.l1, p.b0, p.b1, p.b2,
         greatest(p.b0 + g.l2*p.b1 + g.l1*p.b2, 0.0) AS f1
  FROM tmap g JOIN oparams p ON p.source = g.source AND p.i = g.i
),
fc2 AS (SELECT *, greatest(b0 + l1*b1 + f1*b2, 0.0) AS f2 FROM fc1),
fc3 AS (SELECT *, greatest(b0 + f1*b1 + f2*b2, 0.0) AS f3 FROM fc2),
fc4 AS (SELECT *, greatest(b0 + f2*b1 + f3*b2, 0.0) AS f4 FROM fc3),
pairs AS (
  -- TnT truncation: forecast ROW t targets y_t at horizon 1 (X row t holds
  -- lags through t−1), so horizon h pairs f_h(t) with y[t+h−1]
  -- (forecaster.py:355-384 slice alignment)
  SELECT f.source, hx.h, f.t, CAST(tr.y AS BIGINT) AS yt,
         CASE hx.h WHEN 1 THEN f.f1 WHEN 2 THEN f.f2 WHEN 3 THEN f.f3 ELSE f.f4 END AS yp
  FROM fc4 f
  CROSS JOIN (VALUES (1), (2), (3), (4)) hx(h)
  JOIN ord_s tr ON tr.source = f.source AND tr.t = f.t + hx.h - 1
),
mets AS (
  SELECT source, h, count(*) AS m,
         list_reduce(list((yt - yp)*(yt - yp) ORDER BY t), (a, b) -> a + b) AS sse,
         list_reduce(list(abs(yt - yp) ORDER BY t), (a, b) -> a + b) AS sae,
         list_reduce(list((2.0*abs(yt - yp)) / ((abs(yt) + abs(yp)) + 1e-10) ORDER BY t),
                     (a, b) -> a + b) AS ssm,
         CAST(sum(yt) AS DOUBLE) / count(*) AS mean_y
  FROM pairs GROUP BY source, h
),
tot AS (
  SELECT p.source, p.h,
         list_reduce(list((p.yt - m.mean_y)*(p.yt - m.mean_y) ORDER BY p.t),
                     (a, b) -> a + b) AS sst
  FROM pairs p JOIN mets m USING (source, h) GROUP BY p.source, p.h
)
SELECT m.source, CAST(m.h AS INT) AS h,
       m.sse / m.m AS mse,
       m.sae / m.m AS mae,
       CASE WHEN t.sst = 0.0 THEN 0.0 ELSE 1.0 - m.sse / t.sst END AS r2,
       CASE WHEN m.m <= 2 THEN CAST('nan' AS DOUBLE)
            ELSE 1.0 - (1.0 - (CASE WHEN t.sst = 0.0 THEN 0.0 ELSE 1.0 - m.sse / t.sst END))
                       * (m.m - 1) / (m.m - 2) END AS r2bar,
       100.0 * (m.ssm / m.m) AS smape,
       m.m AS m
FROM mets m JOIN tot t USING (source, h)"""


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
         CASE WHEN dd = 0 THEN 0.0 ELSE CAST(d1 AS DOUBLE) / CAST(dd AS DOUBLE) END AS phi1,
         CASE WHEN dd = 0 THEN 0.0 ELSE CAST(d2 AS DOUBLE) / CAST(dd AS DOUBLE) END AS phi2,
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


def ar_sm_ols_sql() -> str:
    """AR(2) by conditional OLS (statsmodels ``AutoReg(y, lags=p).fit()``
    equivalent — yw_method='sm_ols', ar_yw.py:88-90) + the same dynamic
    multi-horizon forecast as :func:`ar_yw_sql`. Design rows t ≥ p with
    REAL lags (no z[0] padding — the conditional likelihood drops the first
    p rows), most-recent-lag-first columns; exact integer Cramer via the
    shared 3×3 machinery with the column slots bound to [1, l1, l2]."""
    return f"""
WITH {_SERIES},
yl AS (SELECT source, t, y, lag(y, 1) OVER w AS yl1, lag(y, 2) OVER w AS yl2
       FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)),
sums AS (
  SELECT source,
    CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(yl1) AS HUGEINT) AS s2, CAST(sum(yl2) AS HUGEINT) AS s1,
    CAST(sum(yl1*yl1) AS HUGEINT) AS s22, CAST(sum(yl1*yl2) AS HUGEINT) AS s21,
    CAST(sum(yl2*yl2) AS HUGEINT) AS s11,
    CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(y*yl1) AS HUGEINT) AS sy1, CAST(sum(y*yl2) AS HUGEINT) AS sy2
  FROM yl WHERE t >= {P} GROUP BY source
),
params AS (SELECT source, {_cramer3(["sy", "sy1", "sy2"])} FROM sums),
fc1 AS (
  SELECT g.source, g.t, g.yl1, p.b0 AS c, p.b1 AS phi1, p.b2 AS phi2,
         p.b0 + g.yl1*p.b1 + g.yl2*p.b2 AS f1
  FROM yl g JOIN params p USING (source) WHERE g.t >= {SKIP}
),
fc2 AS (SELECT *, c + f1*phi1 + yl1*phi2 AS f2 FROM fc1),
fc3 AS (SELECT *, c + f2*phi1 + f1*phi2 AS f3 FROM fc2),
fc4 AS (SELECT *, c + f3*phi1 + f2*phi2 AS f4 FROM fc3)
{_OUT}"""


def feature_topk_sql(k: int = 3) -> str:
    """Oracle for the top-k feature-selection query: squared Pearson
    correlation per feature from exact integer sums, one HUGEINT->DOUBLE
    rounding per ratio, ranked (score DESC, feature-list position ASC) —
    mirroring the reference's stable top-k sort of attention scores
    (Example_Covid19.py:113-116). Features: y lags 1..4 (z[0] padding),
    hourly event count, time index."""
    feats = [
        ("y_lag1", "l1"), ("y_lag2", "l2"), ("y_lag3", "l3"), ("y_lag4", "l4"),
        ("x_cnt", "x"), ("t", "t"),
    ]
    sum_items = ", ".join(
        f"CAST(sum({c}) AS HUGEINT) AS sx_{c}, CAST(sum({c}*{c}) AS HUGEINT) AS sxx_{c}, "
        f"CAST(sum(y*{c}) AS HUGEINT) AS sxy_{c}"
        for _, c in feats
    )
    score_items = ", ".join(
        f"(n*sxy_{c} - sx_{c}*sy) AS num_{c}, "
        f"((n*sxx_{c} - sx_{c}*sx_{c}) * deny) AS den_{c}, "
        f"CASE WHEN den_{c} = 0 THEN 0.0 "
        f"ELSE CAST(num_{c}*num_{c} AS DOUBLE) / CAST(den_{c} AS DOUBLE) END AS score_{c}"
        for _, c in feats
    )
    unpivot = "\n  UNION ALL ".join(
        f"SELECT source, '{name}' AS feature, score_{c} AS score, {i} AS fidx FROM scored"
        for i, (name, c) in enumerate(feats)
    )
    return f"""
WITH series AS (SELECT event_type AS source, ts, value FROM events),
th AS (
  SELECT source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd,
         count(*) AS cnt
  FROM series GROUP BY 1, 2
),
ord_s AS (
  SELECT source, CAST(yd AS BIGINT) AS y, CAST(cnt AS BIGINT) AS x,
         row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS t
  FROM th
),
lagged AS (
  SELECT source, y, x, t,
         coalesce(lag(y, 1) OVER w, first_value(y) OVER w) AS l1,
         coalesce(lag(y, 2) OVER w, first_value(y) OVER w) AS l2,
         coalesce(lag(y, 3) OVER w, first_value(y) OVER w) AS l3,
         coalesce(lag(y, 4) OVER w, first_value(y) OVER w) AS l4
  FROM ord_s WINDOW w AS (PARTITION BY source ORDER BY t)
),
sums AS (
  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(y*y) AS HUGEINT) AS syy,
         {sum_items}
  FROM lagged GROUP BY source
),
scored AS (SELECT source, (n*syy - sy*sy) AS deny, {score_items} FROM sums),
longf AS (
  {unpivot}
)
SELECT source, feature, score,
       CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, fidx ASC) AS INTEGER) AS rank
FROM longf
QUALIFY rank <= {k}"""


def granger_sql() -> str:
    """Oracle for ``stats_tests.granger_pairs``: hourly integer tier,
    ordered series pairs joined on the bucket, exact HUGEINT normal
    equations, 2x2 / 3x3 Cramer (same singular intercept-only fallback as
    :func:`_coef_items`), fixed left-assoc residual chains, micro-unit
    floor-quantized RSS sums, one BIGINT F-ratio division.  The kernel
    divides determinants through the HUGEINT->DOUBLE cast mimic so the
    coefficient doubles match this SQL bit-for-bit (the pacf recipe)."""
    A = [["n", "sl", "sx"], ["sl", "sll", "slx"], ["sx", "slx", "sxx"]]
    cv = ["sy", "syl", "syx"]
    dets = [f"{_det3(A)} AS d3"]
    for j in range(3):
        Aj = [[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
        dets.append(f"{_det3(Aj)} AS nf{j}")
    det_items = ", ".join(dets)
    return f"""
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), pr AS (
  SELECT a.source AS ys, c.source AS xs, a.b AS b, a.v AS y, c.v AS x
  FROM o a JOIN o c ON c.b = a.b AND c.source <> a.source
), lg AS (
  SELECT ys, xs, b, y,
         lag(y, 1) OVER w AS l1y, lag(x, 1) OVER w AS l1x
  FROM pr WINDOW w AS (PARTITION BY ys, xs ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE l1y IS NOT NULL AND l1x IS NOT NULL
), sums AS (
  SELECT ys, xs, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1y) AS HUGEINT) AS sl, CAST(sum(l1x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(l1y*l1y) AS HUGEINT) AS sll, CAST(sum(l1y*l1x) AS HUGEINT) AS slx,
         CAST(sum(l1x*l1x) AS HUGEINT) AS sxx,
         CAST(sum(y*l1y) AS HUGEINT) AS syl, CAST(sum(y*l1x) AS HUGEINT) AS syx
  FROM e GROUP BY 1, 2
), par AS (
  SELECT ys, xs, n, sy,
         (n*sll - sl*sl) AS d2,
         (sy*sll - sl*syl) AS n0r, (n*syl - sl*sy) AS n1r,
         {det_items}
  FROM sums
), cf AS (
  SELECT ys, xs, n,
         CASE WHEN d2 = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              ELSE CAST(n0r AS DOUBLE) / CAST(d2 AS DOUBLE) END AS b0r,
         CASE WHEN d2 = 0 THEN 0.0
              ELSE CAST(n1r AS DOUBLE) / CAST(d2 AS DOUBLE) END AS b1r,
         CASE WHEN d3 = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              ELSE CAST(nf0 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b0f,
         CASE WHEN d3 = 0 THEN 0.0
              ELSE CAST(nf1 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b1f,
         CASE WHEN d3 = 0 THEN 0.0
              ELSE CAST(nf2 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b2f
  FROM par
), res AS (
  SELECT e.ys, e.xs,
         (CAST(y AS DOUBLE) - (b0r + l1y * b1r)) AS er,
         (CAST(y AS DOUBLE) - (b0f + l1y * b1f + l1x * b2f)) AS ef
  FROM e JOIN cf ON cf.ys = e.ys AND cf.xs = e.xs
), ag AS (
  SELECT ys, xs,
         CAST(sum(CAST(floor(er * er * 1000000.0) AS BIGINT)) AS BIGINT) AS rss_r_q,
         CAST(sum(CAST(floor(ef * ef * 1000000.0) AS BIGINT)) AS BIGINT) AS rss_f_q
  FROM res GROUP BY 1, 2
)
SELECT cf.ys AS y_source, cf.xs AS x_source, CAST(cf.n AS BIGINT) AS n,
       ag.rss_r_q, ag.rss_f_q, cf.b2f AS b_cross,
       CASE WHEN ag.rss_f_q > 0 AND cf.n > 3 THEN
         CAST((ag.rss_r_q - ag.rss_f_q) * (CAST(cf.n AS BIGINT) - 3) AS DOUBLE)
           / CAST(ag.rss_f_q AS DOUBLE)
       END AS f_ratio
FROM cf JOIN ag ON ag.ys = cf.ys AND ag.xs = cf.xs
WHERE cf.n >= 4"""


def ar_order_select_sql(f_crit: str = "3.84") -> str:
    """Oracle for ``timeweight.ar_order_select``: shared conditional
    sample (lag-3 rows), HUGEINT normal equations, 2x2/3x3/4x4 Cramer
    with the intercept-only singular fallback, fixed-chain residuals,
    micro-quantized RSS, sequential partial-F selection."""
    A3 = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    c3 = ["sy", "sy1", "sy2"]
    A4 = [
        ["n", "s1", "s2", "s3"],
        ["s1", "s11", "s12", "s13"],
        ["s2", "s12", "s22", "s23"],
        ["s3", "s13", "s23", "s33"],
    ]
    c4 = ["sy", "sy1", "sy2", "sy3"]
    it3 = [f"{_det3(A3)} AS dd3"]
    for j in range(3):
        Aj = [[c3[i] if jj == j else A3[i][jj] for jj in range(3)] for i in range(3)]
        it3.append(f"{_det3(Aj)} AS d3_{j}")
    it4 = [f"{_det4(A4)} AS dd4"]
    for j in range(4):
        Aj = [[c4[i] if jj == j else A4[i][jj] for jj in range(4)] for i in range(4)]
        it4.append(f"{_det4(Aj)} AS d4_{j}")
    det_items = ", ".join(it3 + it4)

    def cf(dd, dnum, first):
        if first:
            return (
                f"CASE WHEN {dd} = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) "
                f"ELSE CAST({dnum} AS DOUBLE) / CAST({dd} AS DOUBLE) END"
            )
        return f"CASE WHEN {dd} = 0 THEN 0.0 ELSE CAST({dnum} AS DOUBLE) / CAST({dd} AS DOUBLE) END"

    return f"""
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), lg AS (
  SELECT source, b, v AS y,
         lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2, lag(v, 3) OVER w AS l3
  FROM o WINDOW w AS (PARTITION BY source ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE l3 IS NOT NULL
), sums AS (
  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(l1) AS HUGEINT) AS s1, CAST(sum(l2) AS HUGEINT) AS s2,
         CAST(sum(l3) AS HUGEINT) AS s3,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*l2) AS HUGEINT) AS s12,
         CAST(sum(l1*l3) AS HUGEINT) AS s13,
         CAST(sum(l2*l2) AS HUGEINT) AS s22, CAST(sum(l2*l3) AS HUGEINT) AS s23,
         CAST(sum(l3*l3) AS HUGEINT) AS s33,
         CAST(sum(y*l1) AS HUGEINT) AS sy1, CAST(sum(y*l2) AS HUGEINT) AS sy2,
         CAST(sum(y*l3) AS HUGEINT) AS sy3
  FROM e GROUP BY 1
), par AS (
  SELECT source, n, sy,
         (n*s11 - s1*s1) AS dd2, (sy*s11 - s1*sy1) AS d2_0, (n*sy1 - s1*sy) AS d2_1,
         {det_items}
  FROM sums
), co AS (
  SELECT source, n,
         {cf("dd2", "d2_0", True)} AS b0a, {cf("dd2", "d2_1", False)} AS b1a,
         {cf("dd3", "d3_0", True)} AS b0b, {cf("dd3", "d3_1", False)} AS b1b,
         {cf("dd3", "d3_2", False)} AS b2b,
         {cf("dd4", "d4_0", True)} AS b0c, {cf("dd4", "d4_1", False)} AS b1c,
         {cf("dd4", "d4_2", False)} AS b2c, {cf("dd4", "d4_3", False)} AS b3c
  FROM par
), res AS (
  SELECT e.source,
         (CAST(y AS DOUBLE) - (b0a + l1 * b1a)) AS e1,
         (CAST(y AS DOUBLE) - (b0b + l1 * b1b + l2 * b2b)) AS e2,
         (CAST(y AS DOUBLE) - (b0c + l1 * b1c + l2 * b2c + l3 * b3c)) AS e3
  FROM e JOIN co ON co.source = e.source
), ag AS (
  SELECT source,
         CAST(sum(CAST(floor(e1 * e1 * 1000000.0) AS BIGINT)) AS BIGINT) AS rss1_q,
         CAST(sum(CAST(floor(e2 * e2 * 1000000.0) AS BIGINT)) AS BIGINT) AS rss2_q,
         CAST(sum(CAST(floor(e3 * e3 * 1000000.0) AS BIGINT)) AS BIGINT) AS rss3_q
  FROM res GROUP BY 1
), fs AS (
  SELECT co.source, CAST(co.n AS BIGINT) AS n, ag.rss1_q, ag.rss2_q, ag.rss3_q,
         CASE WHEN ag.rss2_q > 0 AND co.n > 3 THEN
           CAST((ag.rss1_q - ag.rss2_q) * (CAST(co.n AS BIGINT) - 3) AS DOUBLE)
             / CAST(ag.rss2_q AS DOUBLE) END AS f21,
         CASE WHEN ag.rss3_q > 0 AND co.n > 4 THEN
           CAST((ag.rss2_q - ag.rss3_q) * (CAST(co.n AS BIGINT) - 4) AS DOUBLE)
             / CAST(ag.rss3_q AS DOUBLE) END AS f32
  FROM co JOIN ag ON ag.source = co.source
  WHERE co.n >= 5
)
SELECT source, n, rss1_q, rss2_q, rss3_q, f21, f32,
       CASE WHEN f21 IS NULL THEN NULL
            WHEN f21 <= {f_crit} THEN 1
            WHEN f32 IS NULL THEN NULL
            WHEN f32 > {f_crit} THEN 3 ELSE 2 END AS selected_p
FROM fs"""


def var1_pairs_sql(hh: int = 3) -> str:
    """Oracle for ``stats_tests.var1_pairs``: hourly integer tier,
    unordered pair join on the bucket, one set of HUGEINT normal-equation
    sums feeding TWO 3×3 Cramer solves (shared design matrix), the same
    singular intercept-only fallback, then the coupled ``hh``-step
    recursion as fixed left-assoc double chains from the last
    jointly-observed point — each forecast step one pair of lateral
    aliases so both equations read the PREVIOUS step's values."""
    A = [["n", "sa1", "sb1"], ["sa1", "saa", "sab"], ["sb1", "sab", "sbb"]]
    items = [f"{_det3(A)} AS d3"]
    for tag, cv in (("a", ["sya", "tya_a", "tya_b"]), ("b", ["syb", "tyb_a", "tyb_b"])):
        for j in range(3):
            Aj = [[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
            items.append(f"{_det3(Aj)} AS n{tag}{j}")
    det_items = ", ".join(items)
    rec_ctes = []
    prev_x, prev_y = "la", "lb"
    for h in range(1, hh + 1):
        src = "cf0" if h == 1 else f"r{h-1}"
        rec_ctes.append(
            f"r{h} AS (SELECT *, (ca0 + {prev_x} * ca1) + {prev_y} * ca2 AS xh{h},"
            f" (cb0 + {prev_x} * cb1) + {prev_y} * cb2 AS yh{h} FROM {src})"
        )
        prev_x, prev_y = f"xh{h}", f"yh{h}"
    rec_sql = ", ".join(rec_ctes)
    case_x = " ".join(f"WHEN {h} THEN xh{h}" for h in range(1, hh + 1))
    case_y = " ".join(f"WHEN {h} THEN yh{h}" for h in range(1, hh + 1))
    return f"""
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), pr AS (
  SELECT a.source AS sa, c.source AS sb, a.b AS b, a.v AS va, c.v AS vb
  FROM o a JOIN o c ON c.b = a.b AND a.source < c.source
), lg AS (
  SELECT sa, sb, b, va, vb,
         lag(va, 1) OVER w AS la1, lag(vb, 1) OVER w AS lb1
  FROM pr WINDOW w AS (PARTITION BY sa, sb ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE la1 IS NOT NULL AND lb1 IS NOT NULL
), sums AS (
  SELECT sa, sb, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(la1) AS HUGEINT) AS sa1, CAST(sum(lb1) AS HUGEINT) AS sb1,
         CAST(sum(la1*la1) AS HUGEINT) AS saa, CAST(sum(la1*lb1) AS HUGEINT) AS sab,
         CAST(sum(lb1*lb1) AS HUGEINT) AS sbb,
         CAST(sum(va) AS HUGEINT) AS sya,
         CAST(sum(va*la1) AS HUGEINT) AS tya_a, CAST(sum(va*lb1) AS HUGEINT) AS tya_b,
         CAST(sum(vb) AS HUGEINT) AS syb,
         CAST(sum(vb*la1) AS HUGEINT) AS tyb_a, CAST(sum(vb*lb1) AS HUGEINT) AS tyb_b
  FROM e GROUP BY 1, 2
), par AS (
  SELECT sa, sb, n, sya, syb, {det_items} FROM sums
), lastb AS (
  SELECT sa, sb, max(b) AS mb FROM pr GROUP BY 1, 2
), lv AS (
  SELECT pr.sa, pr.sb, CAST(pr.va AS DOUBLE) AS la, CAST(pr.vb AS DOUBLE) AS lb
  FROM pr JOIN lastb ON lastb.sa = pr.sa AND lastb.sb = pr.sb AND pr.b = lastb.mb
), cf AS (
  SELECT sa, sb, n,
         CASE WHEN d3 = 0 THEN CAST(sya AS DOUBLE) / CAST(n AS DOUBLE)
              ELSE CAST(na0 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS ca0,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(na1 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS ca1,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(na2 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS ca2,
         CASE WHEN d3 = 0 THEN CAST(syb AS DOUBLE) / CAST(n AS DOUBLE)
              ELSE CAST(nb0 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS cb0,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(nb1 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS cb1,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(nb2 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS cb2
  FROM par WHERE n >= 4
), cf0 AS (
  SELECT cf.*, lv.la, lv.lb FROM cf JOIN lv ON lv.sa = cf.sa AND lv.sb = cf.sb
), {rec_sql}, hs AS (SELECT unnest(range(1, {hh + 1})) AS h)
SELECT r.sa, r.sb, CAST(r.n AS BIGINT) AS n, CAST(hs.h AS BIGINT) AS h,
       CASE hs.h {case_x} END AS a_hat,
       CASE hs.h {case_y} END AS b_hat
FROM r{hh} r CROSS JOIN hs"""


def pooled_ar_sql(hh: int = 4) -> str:
    """Oracle for ``kernels.pooled_ar_forecast``: the hourly integer tier,
    per-source lag-2 rows pooled into ONE HUGEINT normal-equation system
    (no GROUP BY — the pooled sums), a single 3×3 Cramer solve with the
    intercept-only singular fallback, then the per-source recursive
    forecast from each series' last two points as fixed left-assoc double
    chains (cf0 is one row, cross-joined to every source's last pair)."""
    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    cv = ["sy", "sy1", "sy2"]
    items = [f"{_det3(A)} AS d3"]
    for j in range(3):
        Aj = [[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
        items.append(f"{_det3(Aj)} AS nf{j}")
    det_items = ", ".join(items)
    rec, px, p2 = [], "y1", "y2"
    for h in range(1, hh + 1):
        src = "j0" if h == 1 else f"r{h-1}"
        rec.append(f"r{h} AS (SELECT *, (b0 + {px} * b1) + {p2} * b2 AS xh{h} FROM {src})")
        p2, px = px, f"xh{h}"
    rec_sql = ", ".join(rec)
    case_x = " ".join(f"WHEN {h} THEN xh{h}" for h in range(1, hh + 1))
    return f"""
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), lg AS (
  SELECT source, v, lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2
  FROM o WINDOW w AS (PARTITION BY source ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE l2 IS NOT NULL
), sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1) AS HUGEINT) AS s1, CAST(sum(l2) AS HUGEINT) AS s2,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*l2) AS HUGEINT) AS s12,
         CAST(sum(l2*l2) AS HUGEINT) AS s22,
         CAST(sum(v) AS HUGEINT) AS sy,
         CAST(sum(v*l1) AS HUGEINT) AS sy1, CAST(sum(v*l2) AS HUGEINT) AS sy2
  FROM e
), par AS (
  SELECT n, sy, {det_items} FROM sums
), cf AS (
  SELECT n,
         CASE WHEN d3 = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              ELSE CAST(nf0 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b0,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(nf1 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b1,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(nf2 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b2
  FROM par
), rn AS (
  SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY b DESC) AS r FROM o
), lastv AS (
  SELECT source,
         CAST(max(CASE WHEN r = 1 THEN v END) AS DOUBLE) AS y1,
         CAST(max(CASE WHEN r = 2 THEN v END) AS DOUBLE) AS y2,
         count(*) AS c
  FROM rn WHERE r <= 2 GROUP BY source HAVING count(*) = 2
), j0 AS (
  SELECT lastv.source, lastv.y1, lastv.y2, cf.n, cf.b0, cf.b1, cf.b2
  FROM lastv CROSS JOIN cf
), {rec_sql}, hs AS (SELECT unnest(range(1, {hh + 1})) AS h)
SELECT r.source, CAST(r.n AS BIGINT) AS n_pool, CAST(hs.h AS BIGINT) AS h,
       CASE hs.h {case_x} END AS y_hat
FROM r{hh} r CROSS JOIN hs"""


def pooled_ar_fe_sql(hh: int = 4) -> str:
    """Oracle for ``kernels.pooled_ar_fe_forecast``: restrict each source
    to its trailing m buckets (m = global min per-source count — equal
    COUNTS are all within-demeaning needs, and unlike a bucket-set
    intersection this never empties the panel), build the per-source
    HUGEINT scaled-deviation cross-products ``T_ab,s = n·Σab − Σa·Σb``,
    sum them, solve the 2×2 within-slope Cramer (1/n factors cancel on a
    balanced panel), per-source intercepts as the same fixed left-assoc
    chain the kernel writes, then the recursive forecast from each
    source's last two kept values."""
    rec, px, p2 = [], "y1", "y2"
    for h in range(1, hh + 1):
        src = "j0" if h == 1 else f"r{h-1}"
        rec.append(f"r{h} AS (SELECT *, (a + {px} * b1) + {p2} * b2 AS xh{h} FROM {src})")
        p2, px = px, f"xh{h}"
    rec_sql = ", ".join(rec)
    case_x = " ".join(f"WHEN {h} THEN xh{h}" for h in range(1, hh + 1))
    return f"""
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), mm AS (
  SELECT min(c) AS m FROM (SELECT count(*) AS c FROM o GROUP BY source)
), rs AS (
  SELECT source, b, v FROM (
    SELECT o.*, row_number() OVER (PARTITION BY source ORDER BY b DESC) AS rd
    FROM o)
  WHERE rd <= (SELECT m FROM mm)
), lg AS (
  SELECT source, v, lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2
  FROM rs WINDOW w AS (PARTITION BY source ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE l2 IS NOT NULL
), per AS (
  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1) AS HUGEINT) AS s1, CAST(sum(l2) AS HUGEINT) AS s2,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*l2) AS HUGEINT) AS s12,
         CAST(sum(l2*l2) AS HUGEINT) AS s22,
         CAST(sum(v) AS HUGEINT) AS sy,
         CAST(sum(v*l1) AS HUGEINT) AS sy1, CAST(sum(v*l2) AS HUGEINT) AS sy2
  FROM e GROUP BY source
), tt AS (
  SELECT source, n, s1, s2, sy,
         n*s11 - s1*s1 AS t11, n*s12 - s1*s2 AS t12, n*s22 - s2*s2 AS t22,
         n*sy1 - s1*sy AS t1y, n*sy2 - s2*sy AS t2y
  FROM per
), tot AS (
  SELECT sum(t11) AS w11, sum(t12) AS w12, sum(t22) AS w22,
         sum(t1y) AS w1y, sum(t2y) AS w2y
  FROM tt
), cf AS (
  SELECT CASE WHEN den = 0 THEN 0.0
              ELSE CAST(w1y*w22 - w2y*w12 AS DOUBLE) / CAST(den AS DOUBLE) END AS b1,
         CASE WHEN den = 0 THEN 0.0
              ELSE CAST(w11*w2y - w12*w1y AS DOUBLE) / CAST(den AS DOUBLE) END AS b2
  FROM (SELECT *, w11*w22 - w12*w12 AS den FROM tot)
), al AS (
  SELECT t.source, t.n,
         ((CAST(t.sy AS DOUBLE) - CAST(t.s1 AS DOUBLE) * cf.b1)
            - CAST(t.s2 AS DOUBLE) * cf.b2) / CAST(t.n AS DOUBLE) AS a,
         cf.b1, cf.b2
  FROM tt t CROSS JOIN cf
), rn AS (
  SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY b DESC) AS r FROM rs
), lastv AS (
  SELECT source,
         CAST(max(CASE WHEN r = 1 THEN v END) AS DOUBLE) AS y1,
         CAST(max(CASE WHEN r = 2 THEN v END) AS DOUBLE) AS y2,
         count(*) AS c
  FROM rn WHERE r <= 2 GROUP BY source HAVING count(*) = 2
), j0 AS (
  SELECT lastv.source, lastv.y1, lastv.y2, al.n, al.a, al.b1, al.b2
  FROM lastv JOIN al USING (source)
), {rec_sql}, hs AS (SELECT unnest(range(1, {hh + 1})) AS h)
SELECT r.source, CAST(r.n AS BIGINT) AS n_obs, CAST(hs.h AS BIGINT) AS h,
       CASE hs.h {case_x} END AS y_hat
FROM r{hh} r CROSS JOIN hs"""


def arima210_sql(hh: int = 4) -> str:
    """Oracle for ``kernels.arima210_forecast``: per-source first diffs of
    the hourly integer tier, HUGEINT normal equations on the diff lags,
    3×3 Cramer per source with the intercept-only singular fallback, the
    diff recursion as per-step lateral aliases and the integration ladder
    ``yh_h = yh_{h-1} + dh_h`` from the last level — all fixed left-assoc
    double chains matching the kernel bit-for-bit."""
    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    cv = ["sy", "sy1", "sy2"]
    items = [f"{_det3(A)} AS d3"]
    for j in range(3):
        Aj = [[cv[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]
        items.append(f"{_det3(Aj)} AS nf{j}")
    det_items = ", ".join(items)
    rec = []
    px, p2, py = "d1v", "d2v", "ylast"
    for h in range(1, hh + 1):
        src = "j0" if h == 1 else f"r{h-1}"
        rec.append(
            f"r{h} AS (SELECT *, (b0 + {px} * b1) + {p2} * b2 AS dh{h},"
            f" {py} + ((b0 + {px} * b1) + {p2} * b2) AS yh{h} FROM {src})"
        )
        p2, px, py = px, f"dh{h}", f"yh{h}"
    rec_sql = ", ".join(rec)
    case_d = " ".join(f"WHEN {h} THEN dh{h}" for h in range(1, hh + 1))
    case_y = " ".join(f"WHEN {h} THEN yh{h}" for h in range(1, hh + 1))
    return f"""
WITH th AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         floor(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / count(*)) AS yd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT source, b, CAST(yd AS BIGINT) AS v FROM th
), dfo AS (
  SELECT source, b, v, v - lag(v, 1) OVER w AS d
  FROM o WINDOW w AS (PARTITION BY source ORDER BY b)
), dr AS (
  SELECT source, b, d FROM dfo WHERE d IS NOT NULL
), lg AS (
  SELECT source, b, d, lag(d, 1) OVER w AS l1, lag(d, 2) OVER w AS l2
  FROM dr WINDOW w AS (PARTITION BY source ORDER BY b)
), e AS (
  SELECT * FROM lg WHERE l2 IS NOT NULL
), sums AS (
  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(l1) AS HUGEINT) AS s1, CAST(sum(l2) AS HUGEINT) AS s2,
         CAST(sum(d) AS HUGEINT) AS sy,
         CAST(sum(l1*l1) AS HUGEINT) AS s11, CAST(sum(l1*l2) AS HUGEINT) AS s12,
         CAST(sum(l2*l2) AS HUGEINT) AS s22,
         CAST(sum(d*l1) AS HUGEINT) AS sy1, CAST(sum(d*l2) AS HUGEINT) AS sy2
  FROM e GROUP BY 1
), par AS (
  SELECT source, n, sy, {det_items} FROM sums WHERE n >= 4
), cf AS (
  SELECT source, n,
         CASE WHEN d3 = 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              ELSE CAST(nf0 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b0,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(nf1 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b1,
         CASE WHEN d3 = 0 THEN 0.0 ELSE CAST(nf2 AS DOUBLE) / CAST(d3 AS DOUBLE) END AS b2
  FROM par
), rnlev AS (
  SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY b DESC) AS r FROM o
), lev AS (
  SELECT source, CAST(max(CASE WHEN r = 1 THEN v END) AS DOUBLE) AS ylast
  FROM rnlev WHERE r = 1 GROUP BY source
), rnd AS (
  SELECT source, d, row_number() OVER (PARTITION BY source ORDER BY b DESC) AS r FROM dr
), lastd AS (
  SELECT source,
         CAST(max(CASE WHEN r = 1 THEN d END) AS DOUBLE) AS d1v,
         CAST(max(CASE WHEN r = 2 THEN d END) AS DOUBLE) AS d2v
  FROM rnd WHERE r <= 2 GROUP BY source HAVING count(*) = 2
), j0 AS (
  SELECT cf.source, cf.n, cf.b0, cf.b1, cf.b2, lev.ylast, lastd.d1v, lastd.d2v
  FROM cf JOIN lev ON lev.source = cf.source
  JOIN lastd ON lastd.source = cf.source
), {rec_sql}, hs AS (SELECT unnest(range(1, {hh + 1})) AS h)
SELECT r.source, CAST(r.n AS BIGINT) AS n, CAST(hs.h AS BIGINT) AS h,
       CASE hs.h {case_d} END AS d_hat,
       CASE hs.h {case_y} END AS y_hat
FROM r{hh} r CROSS JOIN hs"""
