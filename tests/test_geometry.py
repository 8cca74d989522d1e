"""Geometry core tests: oracle checks vs cv2.minAreaRect and the reference CSL formula."""

import cv2
import numpy as np
import pytest

from yolov5_obb_tpu.ops import geometry as G


def _random_rboxes(rng, n, img=1024.0):
    cx = rng.uniform(100, img - 100, n)
    cy = rng.uniform(100, img - 100, n)
    l = rng.uniform(20, 300, n)
    s = l * rng.uniform(0.2, 0.95, n)  # strictly l > s: unique long edge
    t = rng.uniform(-np.pi / 2, np.pi / 2 - 1e-3, n)
    return np.stack([cx, cy, l, s, t], axis=-1)


def test_rbox_poly_roundtrip(rng):
    rb = _random_rboxes(rng, 256)
    poly = G.rbox2poly(rb)
    rb2 = G.poly2rbox(poly)
    np.testing.assert_allclose(rb2[:, :4], rb[:, :4], rtol=1e-5, atol=1e-4)
    dt = G.regular_theta(rb2[:, 4] - rb[:, 4])
    np.testing.assert_allclose(dt, np.zeros_like(dt), atol=1e-5)


def test_poly2rbox_matches_cv2(rng):
    """Our batched min-area-rect must reproduce cv2.minAreaRect + the
    reference's long-edge conversion (rboxs_utils.py:59-75)."""
    rb = _random_rboxes(rng, 128)
    polys = G.rbox2poly(rb)
    # perturb corners so polys are generic quads, not exact rectangles
    polys = polys + rng.normal(0, 1.5, polys.shape)
    ours = G.poly2rbox(polys)
    for i, poly in enumerate(polys):
        (x, y), (w, h), angle = cv2.minAreaRect(np.float32(poly.reshape(4, 2)))
        # 1) minimality: our area must not exceed cv2's (both claim the min)
        assert ours[i, 2] * ours[i, 3] <= w * h * (1 + 2e-3), (i, ours[i], (w, h))
        # and cv2's must not beat ours either
        assert w * h <= ours[i, 2] * ours[i, 3] * (1 + 2e-3), (i, ours[i], (w, h))
        # 2) validity: our rect encloses every polygon point
        cx, cy, l, s, t = ours[i]
        pts = poly.reshape(4, 2) - [cx, cy]
        e1 = pts[:, 0] * np.cos(t) - pts[:, 1] * np.sin(t)
        e2 = pts[:, 0] * np.sin(t) + pts[:, 1] * np.cos(t)
        assert np.all(np.abs(e1) <= l / 2 + 1e-3), i
        assert np.all(np.abs(e2) <= s / 2 + 1e-3), i


def test_poly2rbox_jnp_matches_numpy(rng):
    import jax.numpy as jnp

    rb = _random_rboxes(rng, 64)
    polys = G.rbox2poly(rb) + rng.normal(0, 1.0, (64, 8))
    a = G.poly2rbox(polys)
    b = np.asarray(G.poly2rbox(jnp.asarray(polys, dtype=jnp.float32)))
    # f32 vs f64 may break ties between near-parallel candidate directions
    # differently; areas and centres must still agree
    np.testing.assert_allclose(a[:, 2] * a[:, 3], b[:, 2] * b[:, 3], rtol=2e-3)
    np.testing.assert_allclose(a[:, :2], b[:, :2], atol=3.0)


def test_csl_matches_reference_formula(rng):
    """Byte-level parity with gaussian_label_cpu (rboxs_utils.py:9-26)."""

    def reference_csl(label, num_class=180, sig=2.0):
        x = np.arange(-num_class / 2, num_class / 2)
        y_sig = np.exp(-((x - 0) ** 2) / (2 * sig**2))
        index = int(num_class / 2 - label)
        return np.concatenate([y_sig[index:], y_sig[:index]], axis=0)

    labels = np.concatenate([rng.uniform(0, 180, 64), np.arange(0, 180, 7.0)])
    ours = G.csl_gaussian_labels(labels, num_bins=180, radius=2.0)
    for i, lab in enumerate(labels):
        np.testing.assert_allclose(ours[i], reference_csl(lab), rtol=1e-6, atol=1e-7)
    # peak is 1.0 and at most 180 bins
    assert ours.shape == (len(labels), 180)
    np.testing.assert_allclose(ours.max(axis=1), 1.0)


def test_csl_circularity():
    """Bins 0 and 179 are angular neighbours: csl(0) and csl(179) overlap."""
    a = G.csl_gaussian_labels(np.array([0.0]), radius=6.0)[0]
    assert a[179] == pytest.approx(a[1])
    assert a[90] == pytest.approx(np.exp(-(90**2) / (2 * 36.0)))


def test_poly2hbb_and_filter(rng):
    rb = _random_rboxes(rng, 32)
    poly = G.rbox2poly(rb)
    hbb = G.poly2hbb(poly)
    np.testing.assert_allclose(hbb[:, 0], rb[:, 0], atol=1e-6)
    np.testing.assert_allclose(hbb[:, 1], rb[:, 1], atol=1e-6)
    assert np.all(hbb[:, 2:4] >= rb[:, 3:4] - 1e-6)
    keep = G.poly_filter(poly, 1024, 1024)
    assert keep.all()
    shifted = poly.copy()
    shifted[:, 0::2] += 5000
    assert not G.poly_filter(shifted, 1024, 1024).any()


def test_scale_polys_letterbox_roundtrip():
    # native 800x600 image letterboxed to 1024x1024
    img0 = (600, 800)
    gain = min(1024 / 600, 1024 / 800)
    new = (int(800 * gain), int(600 * gain))
    pad = ((1024 - new[0]) / 2, (1024 - new[1]) / 2)
    poly0 = np.array([[10.0, 20, 300, 20, 300, 200, 10, 200]])
    poly1 = poly0 * gain
    poly1[:, 0::2] += pad[0]
    poly1[:, 1::2] += pad[1]
    back = G.scale_polys((1024, 1024), poly1, img0)
    np.testing.assert_allclose(back, poly0, atol=1e-3)


def test_xywh_xyxy_roundtrip(rng):
    x = rng.uniform(0, 100, (16, 4))
    np.testing.assert_allclose(G.xyxy2xywh(G.xywh2xyxy(x)), x, atol=1e-9)


def test_poly2rbox_degenerate_cases():
    """Square boxes, axis-aligned boxes, and tiny boxes — the angle-edge
    cases called out as reference-parity risks (cv2.minAreaRect quirks)."""
    from yolov5_obb_tpu.ops.geometry import poly2rbox, rbox2poly

    def square(cx, cy, s, t):
        import numpy as np

        base = np.array([[-s, -s], [s, -s], [s, s], [-s, s]], np.float64) / 2
        c, si = np.cos(t), np.sin(t)
        r = base @ np.array([[c, -si], [si, c]])
        return (r + [cx, cy]).reshape(-1)

    import numpy as np

    polys = np.stack([
        square(50, 50, 10, 0.0),          # axis-aligned square
        square(50, 50, 10, np.pi / 4),    # 45-degree square
        square(10, 10, 0.5, 0.3),         # tiny box
        np.array([0, 0, 20, 0, 20, 4, 0, 4], np.float64),  # axis-aligned rect
    ])
    rb = poly2rbox(polys)
    # long-edge convention holds
    assert np.all(rb[:, 2] >= rb[:, 3] - 1e-6)
    # theta in [-pi/2, pi/2)
    assert np.all(rb[:, 4] >= -np.pi / 2 - 1e-6) and np.all(rb[:, 4] < np.pi / 2 + 1e-6)
    # areas preserved
    want_area = np.array([100.0, 100.0, 0.25, 80.0])
    np.testing.assert_allclose(rb[:, 2] * rb[:, 3], want_area, rtol=1e-4)
    # roundtrip poly → rbox → poly encloses the same region (vertex-set match
    # up to cyclic order): compare sorted vertex multisets
    back = rbox2poly(rb)
    for p, q in zip(polys, back):
        ps = np.sort(p.reshape(4, 2), axis=0)
        qs = np.sort(np.asarray(q).reshape(4, 2), axis=0)
        np.testing.assert_allclose(ps, qs, atol=1e-3)
