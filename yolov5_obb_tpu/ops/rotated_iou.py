"""Exact rotated-box IoU as fixed-shape, branch-free JAX math.

The reference implements this as a C++/CUDA header (vertex generation,
edge-edge intersection, Graham scan, shoelace —
utils/nms_rotated/src/box_iou_rotated_utils.h:20-360).  On TPU we want the
same exact result but vectorized over the whole pair matrix:

1. The intersection of two convex quadrilaterals is a convex polygon whose
   vertices come from 16 possible edge-edge crossings plus up to 8 contained
   vertices → a fixed buffer of 24 candidate points with a validity mask.
2. A convex polygon's area needs its vertices in angular order around any
   interior point — an ``argsort`` over 24 lanes replaces the data-dependent
   Graham scan.
3. Shoelace over the sorted (masked) ring gives the intersection area.

Everything is static-shaped, so it jits, vmaps, and feeds the Pallas NMS
kernel.  Inputs use the framework's rbox convention ``[cx cy l s theta]``
(see ops/geometry.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import rbox2poly

_EPS = 1e-8


def _vertices(rboxes):
    """``(..., 5)`` rboxes → ``(..., 4, 2)`` corner vertices."""
    return rbox2poly(rboxes).reshape(rboxes.shape[:-1] + (4, 2))


def _cross(o, a, b):
    """2-D cross product (a-o) x (b-o) over trailing dim 2."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _intersection_points(pa, pb):
    """All candidate vertices of the intersection polygon of two quads.

    Args:
        pa, pb: ``(..., 4, 2)`` vertices.

    Returns:
        points ``(..., 24, 2)``, mask ``(..., 24)`` bool.
    """
    # --- 16 edge-edge crossings -------------------------------------------
    a0 = pa  # (..., 4, 2) edge starts
    a1 = jnp.roll(pa, -1, axis=-2)  # edge ends
    b0 = pb
    b1 = jnp.roll(pb, -1, axis=-2)

    r = (a1 - a0)[..., :, None, :]  # (..., 4, 1, 2)
    s = (b1 - b0)[..., None, :, :]  # (..., 1, 4, 2)
    qp = b0[..., None, :, :] - a0[..., :, None, :]  # (..., 4, 4, 2)

    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (..., 4, 4)
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / safe
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / safe
    hit = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS)
        & (t <= 1 + _EPS)
        & (u >= -_EPS)
        & (u <= 1 + _EPS)
    )
    pt = a0[..., :, None, :] + t[..., None] * r  # (..., 4, 4, 2)
    cross_pts = pt.reshape(pt.shape[:-3] + (16, 2))
    cross_mask = hit.reshape(hit.shape[:-2] + (16,))

    # --- vertices of one quad inside the other ----------------------------
    def inside(pts, quad):
        # pts (..., 4, 2) tested against convex quad (..., 4, 2), either
        # winding: all edge cross-products share a sign
        q0 = quad[..., None, :, :]  # (..., 1, 4, 2)
        q1 = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
        p = pts[..., :, None, :]  # (..., 4, 1, 2)
        c = _cross(q0, q1, p)  # (..., 4pts, 4edges)
        eps = 1e-5
        return jnp.all(c >= -eps, axis=-1) | jnp.all(c <= eps, axis=-1)

    a_in_b = inside(pa, pb)  # (..., 4)
    b_in_a = inside(pb, pa)

    points = jnp.concatenate([cross_pts, pa, pb], axis=-2)  # (..., 24, 2)
    mask = jnp.concatenate([cross_mask, a_in_b, b_in_a], axis=-1)
    return points, mask


def _convex_area(points, mask):
    """Area of the convex hull of masked points: angular order + shoelace.

    TPU note: the angular ordering is computed as a *comparison-matrix rank*
    (24x24 boolean ops + a one-hot contraction) instead of ``argsort`` —
    XLA's sort lowers to an expensive generic sort on TPU, while the rank
    formulation stays on the VPU/MXU (this kernel runs on millions of box
    pairs inside NMS)."""
    K = points.shape[-2]
    n = jnp.sum(mask, axis=-1)  # (...,)
    w = mask[..., None].astype(points.dtype)
    centre = jnp.sum(points * w, axis=-2) / jnp.maximum(n, 1)[..., None]
    rel = points - centre[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(mask, ang, 10.0)  # invalid points order to the end

    # rank[i] = #points strictly before i (index tiebreak → a permutation)
    idx = jnp.arange(K)
    a_i = ang[..., :, None]
    a_j = ang[..., None, :]
    before = (a_j < a_i) | ((a_j == a_i) & (idx[None, :] < idx[:, None]))
    rank = jnp.sum(before, axis=-1)  # (..., K) ints in [0, K)

    # ordered ring via one-hot gather: ring[k] = points[rank == k]
    onehot = jax.nn.one_hot(rank, K, dtype=points.dtype, axis=-1)  # (..., K_i, K_k)
    ring = jnp.einsum("...ik,...id->...kd", onehot, points)
    # collapse the invalid tail (k >= n) onto ring[0] → zero-length edges
    valid_k = idx < n[..., None]
    ring = jnp.where(valid_k[..., None], ring, ring[..., 0:1, :])
    nxt = jnp.roll(ring, -1, axis=-2)
    area2 = jnp.sum(ring[..., 0] * nxt[..., 1] - ring[..., 1] * nxt[..., 0], axis=-1)
    area = 0.5 * jnp.abs(area2)
    return jnp.where(n >= 3, area, 0.0)


def rotated_iou(boxes1, boxes2):
    """Elementwise exact IoU of broadcast-compatible rbox arrays.

    Args:
        boxes1, boxes2: ``(..., 5)`` rboxes ``[cx cy l s theta]``.

    Returns:
        ``(...,)`` IoU in [0, 1].
    """
    boxes1, boxes2 = jnp.broadcast_arrays(boxes1, boxes2)
    # centre-shift for precision (reference box_iou_rotated_utils.h:336-349)
    mid = (boxes1[..., :2] + boxes2[..., :2]) / 2
    b1 = jnp.concatenate([boxes1[..., :2] - mid, boxes1[..., 2:]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :2] - mid, boxes2[..., 2:]], axis=-1)
    pa = _vertices(b1)
    pb = _vertices(b2)
    pts, mask = _intersection_points(pa, pb)
    inter = _convex_area(pts, mask)
    area1 = boxes1[..., 2] * boxes1[..., 3]
    area2 = boxes2[..., 2] * boxes2[..., 3]
    return inter / jnp.maximum(area1 + area2 - inter, _EPS)


@jax.jit
def pairwise_rotated_iou(boxes1, boxes2):
    """``(n,5) x (m,5)`` → ``(n,m)`` exact rotated IoU matrix.

    TPU-native replacement for the reference's ``poly_overlaps`` CUDA kernel
    (DOTA_devkit/poly_nms_gpu/poly_overlaps_kernel.cu:330-368) and the IoU
    loop inside ``nms_rotated_cuda.cu``.
    """
    return rotated_iou(boxes1[:, None, :], boxes2[None, :, :])
