"""Pallas sparse rotated IoU vs the XLA implementation (interpret mode on CPU)."""

import numpy as np
import pytest

from yolov5_obb_tpu.ops.pallas.iou_kernel import pairs_rotated_iou, sparse_rotated_iou
from yolov5_obb_tpu.ops.rotated_iou import rotated_iou


def _random_rboxes(rng, n, spread=200.0):
    cx = rng.uniform(-spread, spread, n)
    cy = rng.uniform(-spread, spread, n)
    l = rng.uniform(5, 120, n)
    s = l * rng.uniform(0.2, 1.0, n)
    t = rng.uniform(-np.pi / 2, np.pi / 2, n)
    return np.stack([cx, cy, l, s, t], -1).astype(np.float32)


def test_pairs_matches_xla(rng):
    a = _random_rboxes(rng, 300, spread=80.0)
    b = _random_rboxes(rng, 300, spread=80.0)
    got = np.asarray(pairs_rotated_iou(a, b, block=256))
    want = np.asarray(rotated_iou(a, b))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_sparse_wrapper(rng):
    boxes = _random_rboxes(rng, 64, spread=60.0)
    idx = rng.integers(0, 64, (64, 8)).astype(np.int32)
    got = np.asarray(sparse_rotated_iou(boxes, idx, block=256))
    want = np.asarray(rotated_iou(boxes[:, None, :], boxes[idx]))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_kernel_matches_exact_on_hard_pairs():
    """4000 randomized pairs incl. identical / contained / disjoint /
    near-duplicate cases — the compacted 16-slot kernel must agree with the
    XLA exact IoU to float32 precision."""
    import numpy as np

    from yolov5_obb_tpu.ops.pallas.iou_kernel import pairs_rotated_iou
    from yolov5_obb_tpu.ops.rotated_iou import rotated_iou

    rng = np.random.default_rng(7)
    N = 4000
    a = np.stack([rng.uniform(0, 100, N), rng.uniform(0, 100, N),
                  rng.uniform(1, 40, N), rng.uniform(1, 40, N),
                  rng.uniform(-np.pi / 2, np.pi / 2, N)], -1).astype(np.float32)
    b = a.copy()
    b[:, :2] += rng.normal(0, 3, (N, 2)).astype(np.float32)
    b[:, 2:4] = np.maximum(
        b[:, 2:4] * rng.uniform(0.5, 1.5, (N, 2)), 0.5
    ).astype(np.float32)
    b[:, 4] += rng.normal(0, 0.2, N).astype(np.float32)
    b[:50] = a[:50]
    b[50:100, 2:4] = a[50:100, 2:4] * 0.3
    b[100:150, :2] += 500

    got = np.asarray(pairs_rotated_iou(a, b))
    want = np.asarray(rotated_iou(a, b))
    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_allclose(got[:50], 1.0, atol=1e-3)
    np.testing.assert_allclose(got[100:150], 0.0, atol=1e-6)


@pytest.mark.parametrize("n,M", [(128, 16), (128, 64), (640, 64)])
def test_fused_neighbor_iou_matches_xla_reference(n, M):
    """Fused Pallas neighbor-select+IoU == XLA path (_first_m_neighbors +
    exact rotated IoU) on random candidates, incl. class masking and padding.

    n=640 exercises the 4-way program split with a column count that is
    not a multiple of 4*128 (regression: the per-group lattice must round
    up to whole 128-lane vectors, not truncate to a ragged tail)."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.neighbor_kernel import fused_neighbor_iou
    from yolov5_obb_tpu.ops.rotated_iou import rotated_iou
    from yolov5_obb_tpu.ops.rotated_nms import (
        _first_m_neighbors,
        _hbb_cover,
    )

    rng = np.random.default_rng(5)
    thr = 0.45
    rb = np.zeros((n, 5), np.float32)
    rb[:, 0] = rng.uniform(0, 400, n)
    rb[:, 1] = rng.uniform(0, 400, n)
    rb[:, 2] = rng.uniform(20, 90, n)
    rb[:, 3] = rb[:, 2] * rng.uniform(0.3, 1.0, n)
    rb[:, 4] = rng.uniform(-np.pi / 2, np.pi / 2, n)
    cls = rng.integers(0, 3, n).astype(np.int32)
    valid = np.ones(n, bool)
    valid[-7:] = False  # padding tail

    # --- XLA reference (same semantics as nms_rotated's score path) -----
    b = jnp.asarray(rb)
    hbb = _hbb_cover(b)
    a1 = jnp.maximum(hbb[:, None, :2], hbb[None, :, :2])
    a2 = jnp.minimum(hbb[:, None, 2:], hbb[None, :, 2:])
    inter = jnp.clip(a2 - a1, 0).prod(-1)
    area = b[:, 2] * b[:, 3]
    cap = (thr * 0.98) * jnp.maximum(area[:, None], area[None, :])
    tri = np.tril(np.ones((n, n), bool), k=-1)
    edge = (
        np.asarray(inter > cap) & tri & (cls[:, None] == cls[None, :])
        & valid[None, :] & valid[:, None]
    )
    ref_idx, ref_valid = _first_m_neighbors(jnp.asarray(edge), M)
    ref_idx, ref_valid = np.asarray(ref_idx), np.asarray(ref_valid)
    pair_b = rb[ref_idx.reshape(-1)].reshape(n, M, 5)
    riou = np.asarray(rotated_iou(b[:, None, :], jnp.asarray(pair_b)))
    ref_sup = ref_valid & (riou > thr)

    # --- fused kernel (interpret mode off-TPU) --------------------------
    idx, sup = fused_neighbor_iou(
        b, jnp.asarray(cls), jnp.asarray(valid), thr, max_neighbors=M
    )
    idx, sup = np.asarray(idx), np.asarray(sup)

    assert np.array_equal(idx[ref_valid], ref_idx[ref_valid])
    assert np.array_equal(sup, ref_sup)
    assert sup.any(), "test data produced no suppression edges"
