"""Native C++ geometry extension vs the NumPy reference implementations."""

import numpy as np
import pytest

from yolov5_obb_tpu.devkit.poly_iou import poly_iou
from yolov5_obb_tpu.devkit.result_merge import poly_nms_np
from yolov5_obb_tpu.native import (
    get_lib,
    iou_poly_native,
    poly_nms_native,
    poly_overlaps_native,
)
from yolov5_obb_tpu.ops.geometry import rbox2poly

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


def _random_polys(rng, n, spread=300.0):
    cx = rng.uniform(50, spread, n)
    cy = rng.uniform(50, spread, n)
    l = rng.uniform(20, 80, n)
    s = l * rng.uniform(0.3, 1.0, n)
    t = rng.uniform(-np.pi / 2, np.pi / 2, n)
    return rbox2poly(np.stack([cx, cy, l, s, t], -1))


def test_iou_matches_numpy(rng):
    p = _random_polys(rng, 40, spread=150.0)
    for i in range(0, 40, 3):
        for j in range(1, 40, 5):
            want = poly_iou(p[i], p[j])
            got = iou_poly_native(p[i], p[j])
            assert abs(got - want) < 1e-9, (i, j, got, want)


def test_overlaps_matrix(rng):
    a = _random_polys(rng, 12, spread=120.0)
    b = _random_polys(rng, 9, spread=120.0)
    mat = poly_overlaps_native(a, b)
    assert mat.shape == (12, 9)
    want = np.array([[poly_iou(a[i], b[j]) for j in range(9)] for i in range(12)])
    np.testing.assert_allclose(mat, want, atol=1e-9)


def test_nms_matches_python(rng):
    for seed in range(3):
        r = np.random.default_rng(seed)
        p = _random_polys(r, 64, spread=150.0)
        s = r.uniform(0.1, 1.0, 64)
        got = poly_nms_native(p, s, 0.3)
        want = poly_nms_np(p, s, 0.3, use_native=False)
        assert got == want, (seed, got, want)


def test_native_speedup(rng):
    import time

    p = _random_polys(rng, 400, spread=300.0)
    s = rng.uniform(0.1, 1.0, 400)
    t0 = time.perf_counter()
    poly_nms_native(p, s, 0.3)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    poly_nms_np(p, s, 0.3, use_native=False)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
