"""C++ native eval kernels vs scipy / numpy references."""
import numpy as np
import pytest

from parq_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native library unavailable (no toolchain)")
    return l


def test_lap_matches_scipy(lib, rng):
    from scipy.optimize import linear_sum_assignment
    for nr, nc in [(5, 8), (10, 10), (100, 256), (1, 3)]:
        cost = rng.rand(nr, nc)
        assign = native.lap_solve(cost)
        r, c = linear_sum_assignment(cost)
        assert len(set(assign.tolist())) == nr
        np.testing.assert_allclose(cost[np.arange(nr), assign].sum(),
                                   cost[r, c].sum(), rtol=1e-9)


def test_iou3d_matches_python(lib, rng):
    from parq_tpu.evals.iou3d import iou3d, to_odam
    from tests.test_evals import box_corners

    for _ in range(30):
        c1 = to_odam(box_corners(rng.randn(3) * 0.3, rng.rand(3) + 0.5,
                                 rng.uniform(-np.pi, np.pi)))
        c2 = to_odam(box_corners(rng.randn(3) * 0.3, rng.rand(3) + 0.5,
                                 rng.uniform(-np.pi, np.pi)))
        got = native.iou3d_pair(c1, c2)
        expect = iou3d(c1, c2)[0]
        np.testing.assert_allclose(got, expect, atol=1e-9)


def test_iou3d_matrix(lib, rng):
    from parq_tpu.evals.iou3d import iou3d, to_odam
    from tests.test_evals import box_corners

    a = np.stack([to_odam(box_corners(rng.randn(3) * 0.5, rng.rand(3) + 0.5))
                  for _ in range(4)])
    b = np.stack([to_odam(box_corners(rng.randn(3) * 0.5, rng.rand(3) + 0.5))
                  for _ in range(3)])
    M = native.iou3d_matrix(a, b)
    for i in range(4):
        for j in range(3):
            np.testing.assert_allclose(M[i, j], iou3d(a[i], b[j])[0],
                                       atol=1e-9)


def test_nms3d_matches_numpy(lib, rng):
    from parq_tpu.evals.nms import _greedy
    n = 30
    rows = np.zeros((n, 8))
    lo = rng.randn(n, 3)
    rows[:, 0:3] = lo
    rows[:, 3:6] = lo + rng.rand(n, 3) + 0.2
    rows[:, 6] = rng.rand(n)
    rows[:, 7] = rng.randint(0, 4, n)
    for same_class in (False, True):
        got = native.nms3d(rows, 0.25, same_class)
        expect = np.zeros(n, bool)
        expect[_greedy(rows, 0.25, same_class)] = True
        np.testing.assert_array_equal(got, expect)
