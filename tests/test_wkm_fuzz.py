"""Property fuzz for the k-means‖ driver recluster
(clustering._weighted_kmeans_driver) against a pure big-int Python replay —
the one r15 stage that was verified only by its own composition tests
(r15 verdict #2).  The replay recomputes weighted farthest-first seeding,
the IEEE-double selection scores, Lloyd argmin assignment, and the exact
integer weighted mean entirely in arbitrary-precision Python ints (floats
only where the engine itself is float: the w·d² seeding score), so any
divergence — int64 wrap in Σw, a float fast-path inexactness, a tie
broken differently — fails the property.  Spark-free (driver-side
function), so hypothesis can afford many examples.

Covers the verdict's requested edge set: ties (tiny component range),
zero weights, duplicate candidates (fewer-than-k-distinct must raise in
BOTH), and weights large enough that w·v and Σw exceed int64."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hyperdx_spark.pipeline.clustering import _weighted_kmeans_driver


def _sq(a, b):
    return sum((int(x) - int(y)) ** 2 for x, y in zip(a, b))


def _replay(cand, w, k, iterations=30):
    """Pure-Python big-int replay of _weighted_kmeans_driver.

    Matches the engine operation for operation: np.argmax ties resolve to
    the LOWEST index; the seeding score is the IEEE float64 product
    float(w)·float(d) (Python float IS binary64, and int→float conversion
    is round-to-nearest in both engines); distances and the weighted mean
    ``(2·Σw·v + Σw) // (2·Σw)`` are exact unbounded integers."""
    m = len(cand)
    if m < k:
        raise ValueError("fewer candidates than k")
    dim = len(cand[0])
    start = max(range(m), key=lambda i: (int(w[i]), -i))
    centers = [start]
    d = [_sq(c, cand[start]) for c in cand]
    for _ in range(k - 1):
        score = [float(int(w[i])) * float(d[i]) for i in range(m)]
        nxt = max(range(m), key=lambda i: (score[i], -i))
        if score[nxt] == 0.0:
            nxt = max(range(m), key=lambda i: (d[i], -i))
            if d[nxt] == 0:
                raise ValueError("fewer than k distinct candidates")
        centers.append(nxt)
        dn = [_sq(cand[i], cand[nxt]) for i in range(m)]
        d = [min(d[i], dn[i]) for i in range(m)]
    cent = [list(cand[i]) for i in centers]
    for _ in range(iterations):
        assign = []
        for c in cand:
            best, bd = 0, _sq(c, cent[0])
            for ci in range(1, k):
                dd = _sq(c, cent[ci])
                if dd < bd:
                    best, bd = ci, dd
            assign.append(best)
        nxt_cent = [list(c) for c in cent]
        for ci in range(k):
            idx = [i for i in range(m) if assign[i] == ci]
            wt = sum(int(w[i]) for i in idx)
            if wt == 0:
                continue
            s_vec = [
                sum(int(w[i]) * int(cand[i][dd]) for i in idx)
                for dd in range(dim)
            ]
            nxt_cent[ci] = [(2 * s + wt) // (2 * wt) for s in s_vec]
        if nxt_cent == cent:
            break
        cent = nxt_cent
    return cent


# components: a tiny band (forces ties + duplicate candidates) mixed with
# magnitudes near the dim≤4 int64 distance guard (2·|x| must stay under
# limit = isqrt((2^63-1)/dim) ≈ 1.5e9 at dim 4 → |x| ≤ ~7.5e8), which also
# straddles the 2^53 float fast-path boundary inside _sqdist_matrix
component = st.one_of(
    st.integers(min_value=-3, max_value=3),
    st.integers(min_value=-700_000_000, max_value=700_000_000),
)

# weights: zero/tiny (tie + empty-cluster paths) mixed with near-int64
# magnitudes so w·v and Σw overflow int64 unless handled in object/python
# ints (the r16 Σw fix)
weight = st.one_of(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=10**17, max_value=4 * 10**18),
)


@settings(max_examples=150, deadline=None)
@given(
    dim=st.integers(min_value=1, max_value=4),
    k=st.integers(min_value=1, max_value=4),
    extra=st.integers(min_value=0, max_value=5),
    iterations=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
def test_wkm_matches_bigint_replay(dim, k, extra, iterations, data):
    m = k + extra
    cand = data.draw(
        st.lists(
            st.lists(component, min_size=dim, max_size=dim),
            min_size=m, max_size=m,
        )
    )
    w = data.draw(st.lists(weight, min_size=m, max_size=m))
    c_np = np.asarray(cand, dtype=np.int64)
    w_np = np.asarray(w, dtype=np.int64)
    try:
        want = _replay(cand, w, k, iterations=iterations)
    except ValueError:
        # fewer than k distinct candidates — the engine must raise too,
        # never return a degenerate centroid set
        with pytest.raises(ValueError):
            _weighted_kmeans_driver(c_np, w_np, k, iterations=iterations)
        return
    got = _weighted_kmeans_driver(c_np, w_np, k, iterations=iterations)
    assert got == want


def test_wkm_fewer_candidates_than_k_raises():
    cand = np.asarray([[1, 2], [3, 4]], dtype=np.int64)
    w = np.asarray([1, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="candidates"):
        _weighted_kmeans_driver(cand, w, 3)


def test_wkm_sum_of_weights_exceeds_int64():
    # three co-clustered candidates whose Σw = 3·4e18 ≈ 1.2e19 > 2^63:
    # an int64 Σw would wrap negative and corrupt the mean divisor
    cand = np.asarray([[0], [6], [12], [10**9]], dtype=np.int64)
    w = np.asarray([4 * 10**18, 4 * 10**18, 4 * 10**18, 1], dtype=np.int64)
    got = _weighted_kmeans_driver(cand, w, 2, iterations=5)
    assert got == _replay(cand.tolist(), w.tolist(), 2, iterations=5)
