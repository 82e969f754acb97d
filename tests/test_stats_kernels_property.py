"""Property tests for the pure (Spark-free) stats kernels added in round 3:
the union-find connected-components kernel, the PACF Cramer kernel, and the
HDR histogram bin-key algebra. These fuzz the EXACTNESS claims directly at
the kernel level — no Spark session per example, so Hypothesis can afford
hundreds of cases."""

from fractions import Fraction

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from forecaster_spark.operators.dedup import _local_uf_kernel
from forecaster_spark.operators.timeweight import _pacf_kernel


def _ref_components(edges):
    """Reference union-find (plain Python, path-halving) → min-id labels."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    )
)
def test_local_uf_kernel_matches_reference_union_find(edges):
    """The vectorized per-partition union-find emits exactly the min-id
    component label for every endpoint, on arbitrary multigraphs with
    self-loops and duplicates."""
    pdf = pd.DataFrame({"u": [e[0] for e in edges], "v": [e[1] for e in edges]})
    out = pd.concat(list(_local_uf_kernel(iter([pdf]))), ignore_index=True)
    got = dict(zip(out["node"].tolist(), out["lbl"].tolist()))
    want = _ref_components(edges)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-(10**5), 10**5), min_size=4, max_size=4).filter(
        lambda g: g[0] > 0
    )
)
def test_pacf_kernel_equals_fraction_cramer(g):
    """The kernel's HUGEINT-mimic double for PACF(k) equals the exact
    rational determinant ratio rounded through the same cast mimic, for
    arbitrary (even invalid-as-covariance) integer gamma vectors — i.e.
    the integer determinant algebra itself is exact."""
    from forecaster_spark.oracle.ref import hugeint_to_double as h2d

    g0, g1, g2, g3 = g
    pdf = pd.DataFrame(
        [{"source": "s", "g0": g0, "g1": g1, "g2": g2, "g3": g3,
          "n1": 1, "n2": 1, "n3": 1}]
    )
    out = pd.concat(list(_pacf_kernel(iter([pdf]))), ignore_index=True)
    out = out.set_index("lag")

    def want(k):
        R = [[Fraction(g[abs(i - j)]) for j in range(k)] for i in range(k)]
        Rn = [row[:-1] + [Fraction(g[i + 1])] for i, row in enumerate(R)]

        def det(m):
            if len(m) == 1:
                return m[0][0]
            return sum(
                (-1) ** j * m[0][j] * det([r[:j] + r[j + 1 :] for r in m[1:]])
                for j in range(len(m))
            )

        dn, dd = det(Rn), det(R)
        if dd == 0:
            return None
        assert abs(dn.denominator) == 1 and abs(dd.denominator) == 1
        return h2d(int(dn)) / h2d(int(dd))

    for k in (1, 2, 3):
        w = want(k)
        have = out.loc[k, "pacf"]
        if w is None:
            assert pd.isna(have)
        else:
            assert have == w


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 2**40), st.integers(0, 2**40), st.integers(0, 6))
def test_hdr_bin_key_monotone_and_self_describing(a, b, m):
    """The HDR bin key lb = (v >> sh) << sh with sh = max(bitlen(v)-1-m, 0)
    is (a) monotone in v, (b) self-describing — recomputing sh from lb's
    own bit length reproduces the same quantization — and (c) within
    relative width 2^-m of v."""

    def lb(v):
        sh = max(v.bit_length() - 1 - m, 0)
        return (v >> sh) << sh

    la_, lb_ = lb(a), lb(b)
    if a <= b:
        assert la_ <= lb_
    for v, l in ((a, la_), (b, lb_)):
        sh = max(l.bit_length() - 1 - m, 0)
        assert (l >> sh) << sh == l
        assert l <= v
        if v:
            assert v - l < max(l >> m, 1) * 2  # within one sub-bin step
