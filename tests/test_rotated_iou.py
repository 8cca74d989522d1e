"""Exact rotated IoU (JAX) vs an independent float64 Sutherland–Hodgman oracle."""

import numpy as np

from yolov5_obb_tpu.devkit.poly_iou import poly_iou
from yolov5_obb_tpu.ops import geometry as G
from yolov5_obb_tpu.ops.rotated_iou import pairwise_rotated_iou, rotated_iou


def _random_rboxes(rng, n, spread=200.0):
    cx = rng.uniform(-spread, spread, n)
    cy = rng.uniform(-spread, spread, n)
    l = rng.uniform(5, 120, n)
    s = l * rng.uniform(0.2, 1.0, n)
    t = rng.uniform(-np.pi / 2, np.pi / 2, n)
    return np.stack([cx, cy, l, s, t], axis=-1).astype(np.float32)


def test_identity_iou(rng):
    rb = _random_rboxes(rng, 32)
    iou = np.asarray(rotated_iou(rb, rb))
    np.testing.assert_allclose(iou, 1.0, atol=2e-3)


def test_disjoint_iou(rng):
    a = _random_rboxes(rng, 16)
    b = a.copy()
    b[:, 0] += 10000.0
    iou = np.asarray(rotated_iou(a, b))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_axis_aligned_analytic():
    # two axis-aligned boxes with known overlap: 10x4 at 0 and shifted 5 in x
    a = np.array([[0.0, 0.0, 10.0, 4.0, 0.0]], np.float32)
    b = np.array([[5.0, 0.0, 10.0, 4.0, 0.0]], np.float32)
    iou = float(rotated_iou(a, b)[0])
    assert abs(iou - (20.0 / (40 + 40 - 20))) < 1e-4


def test_rotated_square_45deg():
    # unit square vs itself rotated 45° about same centre: inter = 2(sqrt2-1)
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], np.float32)
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]], np.float32)
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    assert abs(float(rotated_iou(a, b)[0]) - expect) < 1e-4


def test_pairwise_matches_oracle(rng):
    a = _random_rboxes(rng, 24, spread=60.0)
    b = _random_rboxes(rng, 16, spread=60.0)
    got = np.asarray(pairwise_rotated_iou(a, b))
    pa = G.rbox2poly(a.astype(np.float64))
    pb = G.rbox2poly(b.astype(np.float64))
    want = np.array([[poly_iou(pa[i], pb[j]) for j in range(16)] for i in range(24)])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_containment(rng):
    # small box fully inside big box: IoU = small/big area
    big = np.array([[0.0, 0.0, 100.0, 80.0, 0.3]], np.float32)
    small = np.array([[1.0, -2.0, 10.0, 8.0, -1.0]], np.float32)
    expect = (10 * 8) / (100 * 80)
    assert abs(float(rotated_iou(big, small)[0]) - expect) < 1e-4
