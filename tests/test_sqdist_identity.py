"""_sqdist_matrix must be bit-identical to the broadcast form it replaced.

The Lloyd quantizers (kmeans_centroids, pq_train) feed argmin decisions
and, transitively, every IVF/PQ query result; the cache-blocked rewrite is
only legal because both forms reduce the same addends over a contiguous
last axis of the same length (numpy's pairwise-summation tree is a pure
function of that shape).  This pins the equality across both branches of
the size heuristic and across the real quantizer shapes.
"""

import numpy as np

from geocube_spark.operators.similarity import _lloyd, _sqdist_matrix


def _broadcast_d2(mat, centroids):
    return ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)


def _mat(n, d, seed=7):
    rng = np.random.RandomState(seed)
    # mantissa-rich values: equality would survive rounding-friendly inputs
    # trivially, so use ones whose squares/sums exercise the low bits
    return (rng.standard_normal((n, d)) * np.pi).astype(np.float64)


def test_sqdist_bit_identical_both_branches():
    for n, k, d in [
        (2000, 16, 64),   # coarse quantizer: loop branch (n*k*d = 2M)
        (2000, 64, 2),    # PQ subspace: broadcast branch (256K)
        (500, 8, 64),     # small corpus: broadcast branch
        (2000, 128, 8),   # sq/ivf stress shape: loop branch
        (3, 5, 1),        # degenerate dims
    ]:
        mat = _mat(n, d)
        cents = mat[np.random.RandomState(1).choice(n, size=min(k, n), replace=False)]
        a = _broadcast_d2(mat, cents)
        b = _sqdist_matrix(mat, cents)
        assert a.dtype == b.dtype == np.float64
        assert np.array_equal(a, b), (n, k, d)


def test_lloyd_unchanged_by_rewrite():
    # full Lloyd runs: centroids must match a reference implementation
    # using the broadcast d2, bit for bit, for loop-branch shapes
    def lloyd_ref(mat, k, iterations, seed):
        rng = np.random.RandomState(seed)
        cents = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
        for _ in range(iterations):
            assign = _broadcast_d2(mat, cents).argmin(axis=1)
            for c in range(len(cents)):
                members = mat[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        return cents

    mat = _mat(2000, 64, seed=3)
    got = _lloyd(mat.copy(), 16, 10, 42)
    want = lloyd_ref(mat.copy(), 16, 10, 42)
    assert np.array_equal(got, want)
