"""Property fuzz for the pairwise distance kernel (clustering._sqdist_matrix)
— the r15 BLAS float64 fast path switches on ``dim·(qmax+cmax)² < 2^53``,
and both paths must return the SAME exact integers as arbitrary-precision
Python arithmetic across the switch boundary.  Spark-free (pure numpy),
so hypothesis can afford many examples."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from hyperdx_spark.pipeline.clustering import _dist_params, _sqdist_matrix


def _python_ints(q, c):
    return [
        [sum((int(a) - int(b)) ** 2 for a, b in zip(row, cen)) for cen in c]
        for row in q
    ]


# magnitudes straddling BOTH boundaries: the float-path switch at
# (qmax+cmax) ~ sqrt(2^53/dim) (~3.9e7 at dim 6) AND the int64 overflow
# guard at sqrt((2^63-1)/dim) (~1.24e9 at dim 6) — hypothesis draws
# examples on every side, so the float path, the int64 path, AND the
# must-raise guard branch all execute (r15 review: the previous ±1.2e8
# range could never reach the guard)
component = st.integers(min_value=-2_000_000_000, max_value=2_000_000_000)


@settings(max_examples=200, deadline=None)
@given(
    dim=st.integers(min_value=1, max_value=6),
    n=st.integers(min_value=1, max_value=5),
    m=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_sqdist_matches_arbitrary_precision(dim, n, m, data):
    rows = data.draw(
        st.lists(
            st.lists(component, min_size=dim, max_size=dim),
            min_size=n, max_size=n,
        )
    )
    cents = data.draw(
        st.lists(
            st.lists(component, min_size=dim, max_size=dim),
            min_size=m, max_size=m,
        )
    )
    q = np.asarray(rows, dtype=np.int64)
    c = np.asarray(cents, dtype=np.int64)
    cmax, _, limit, _ = _dist_params(c)
    qmax = int(np.abs(q).max())
    if qmax + cmax > limit:
        # over the int64 contract: the guard must raise, never wrap
        try:
            _sqdist_matrix(q, c, cmax, limit)
        except ValueError:
            return
        raise AssertionError("overflow guard did not raise")
    got = _sqdist_matrix(q, c, cmax, limit).tolist()
    assert got == _python_ints(q, c)


@settings(max_examples=50, deadline=None)
@given(
    dim=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_float_path_bound_is_honored(dim, data):
    """Components drawn strictly under the float-path bound: the fast
    path is guaranteed active, and its results must equal
    arbitrary-precision Python integers (the cross-path agreement at the
    boundary itself is covered by the straddling strategy above)."""
    bound = math.isqrt(2**53 // dim)
    comp = st.integers(min_value=-(bound // 2 - 1), max_value=bound // 2 - 1)
    q = np.asarray(
        data.draw(st.lists(st.lists(comp, min_size=dim, max_size=dim),
                           min_size=2, max_size=3)),
        dtype=np.int64,
    )
    c = np.asarray(
        data.draw(st.lists(st.lists(comp, min_size=dim, max_size=dim),
                           min_size=2, max_size=2)),
        dtype=np.int64,
    )
    cmax, _, limit, _ = _dist_params(c)
    qmax = int(np.abs(q).max())
    assert dim * (qmax + cmax) ** 2 < 2**53  # float path active
    got = _sqdist_matrix(q, c, cmax, limit).tolist()
    assert got == _python_ints(q, c)
