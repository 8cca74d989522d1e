"""Pallas TPU kernel: exact rotated IoU over sparse box pairs.

This is the hot kernel of rotated NMS (the role of the reference's
``box_iou_rotated_utils.h`` + ``nms_rotated_cuda.cu`` pair-IoU loop).  The
XLA formulation in ops/rotated_iou.py materialises (pairs, 24, 24)
intermediates in HBM; here every buffer lives in VMEM and the layout is
*pair-index last* so the P pairs occupy the 128-wide lane dimension while
the small geometry dimensions (4 vertices, 24 candidate points) sit on
sublanes:

* vertices:        (4, P) per coordinate
* edge crossings:  (4, 4, P), compacted to 2 slots per subject edge (a
  segment crosses a convex boundary at most twice) → 8 crossing slots
* candidate ring:  (16, P) = 8 crossings + 2x4 vertices
* angular ordering: comparison-rank via an unrolled 16-step loop — no sort,
  no (16, 16, P) buffer.

Output traffic is just the (P,) IoU values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _pairs_iou_math(ax, ay, al, as_, at, bx, by, bl, bs, bt):
    """Exact IoU for P box pairs; every arg is (P,) f32; returns (P,)."""
    # centre shift for precision (reference box_iou_rotated_utils.h:336-349)
    mx = (ax + bx) * 0.5
    my = (ay + by) * 0.5
    ax, bx = ax - mx, bx - mx
    ay, by = ay - my, by - my

    def vertices(cx, cy, l, s, t):
        ct, st = jnp.cos(t), jnp.sin(t)
        a1x, a1y = l * 0.5 * ct, -l * 0.5 * st  # long-edge half vector
        b1x, b1y = -s * 0.5 * st, -s * 0.5 * ct  # short-edge half vector
        vx = jnp.stack(
            [cx + a1x + b1x, cx + a1x - b1x, cx - a1x - b1x, cx - a1x + b1x]
        )  # (4, P)
        vy = jnp.stack(
            [cy + a1y + b1y, cy + a1y - b1y, cy - a1y - b1y, cy - a1y + b1y]
        )
        return vx, vy

    pax, pay = vertices(ax, ay, al, as_, at)  # (4, P)
    pbx, pby = vertices(bx, by, bl, bs, bt)

    def ring_next(v):
        # jnp.roll has no Mosaic lowering; small-dim rotate via concat
        return jnp.concatenate([v[1:], v[0:1]], axis=0)

    # --- 16 edge-edge crossings ------------------------------------------
    a0x, a0y = pax, pay
    a1x, a1y = ring_next(pax), ring_next(pay)
    b0x, b0y = pbx, pby
    b1x, b1y = ring_next(pbx), ring_next(pby)

    rx = (a1x - a0x)[:, None]  # (4, 1, P)
    ry = (a1y - a0y)[:, None]
    sx = (b1x - b0x)[None, :]  # (1, 4, P)
    sy = (b1y - b0y)[None, :]
    qpx = b0x[None, :] - a0x[:, None]  # (4, 4, P)
    qpy = b0y[None, :] - a0y[:, None]

    # Mosaic note: bool (i1) vector arithmetic/bitcasts fail to lower, so
    # every mask is carried as float32 {0,1} via where(compare, 1, 0)
    denom = rx * sy - ry * sx
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = (qpx * sy - qpy * sx) / safe
    u = (qpx * ry - qpy * rx) / safe
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    hit = (
        jnp.where(jnp.abs(denom) > _EPS, one, zero)
        * jnp.where(t >= -_EPS, one, zero)
        * jnp.where(t <= 1 + _EPS, one, zero)
        * jnp.where(u >= -_EPS, one, zero)
        * jnp.where(u <= 1 + _EPS, one, zero)
    )
    crx = a0x[:, None] + t * rx  # (4, 4, P)
    cry = a0y[:, None] + t * ry

    P = ax.shape[-1]
    # A segment crosses a convex quad's boundary at most twice, so the 4
    # candidate crossings per A-edge compact into 2 slots (min-t and max-t
    # valid candidates) — the ordering loops below then run on 16 candidate
    # points instead of 24 (the O(slots²) rank/ring stages dominate runtime).
    BIG = jnp.float32(1e30)
    tv = jnp.where(hit > 0.5, t, BIG)  # (4, 4, P)
    tw = jnp.where(hit > 0.5, t, -BIG)
    tmin = jnp.min(tv, axis=1, keepdims=True)  # (4, 1, P)
    tmax = jnp.max(tw, axis=1, keepdims=True)
    oh0 = jnp.where((tv == tmin) & (hit > 0.5), one, zero)  # (4, 4, P)
    oh1 = jnp.where((tw == tmax) & (hit > 0.5), one, zero)
    n0 = jnp.sum(oh0, axis=1)  # (4, P); >1 only for identical points
    n1 = jnp.sum(oh1, axis=1)
    x0 = jnp.sum(oh0 * crx, axis=1) / jnp.maximum(n0, 1.0)
    y0 = jnp.sum(oh0 * cry, axis=1) / jnp.maximum(n0, 1.0)
    x1 = jnp.sum(oh1 * crx, axis=1) / jnp.maximum(n1, 1.0)
    y1 = jnp.sum(oh1 * cry, axis=1) / jnp.maximum(n1, 1.0)
    cnt = jnp.sum(hit, axis=1)  # (4, P) valid crossings per A-edge
    m0 = jnp.where(cnt >= 1.0, one, zero)
    m1 = jnp.where(cnt >= 2.0, one, zero)

    cross_x = jnp.concatenate([x0, x1], axis=0)  # (8, P)
    cross_y = jnp.concatenate([y0, y1], axis=0)
    cross_m = jnp.concatenate([m0, m1], axis=0)

    # --- containment tests -------------------------------------------------
    def inside(px, py, qx, qy):
        # points (4,P) against convex quad (4,P) of either winding;
        # all(c >= -eps) expressed as min-reduce (no bool reductions)
        q1x, q1y = ring_next(qx), ring_next(qy)
        ex = (q1x - qx)[:, None]  # (4edges, 1, P)
        ey = (q1y - qy)[:, None]
        dx = px[None, :] - qx[:, None]  # (4edges, 4pts, P)
        dy = py[None, :] - qy[:, None]
        c = ex * dy - ey * dx
        eps = 1e-5
        cmin = jnp.min(c, axis=0)  # (4pts, P)
        cmax = jnp.max(c, axis=0)
        return jnp.maximum(
            jnp.where(cmin >= -eps, one, zero), jnp.where(cmax <= eps, one, zero)
        )

    a_in_b = inside(pax, pay, pbx, pby)
    b_in_a = inside(pbx, pby, pax, pay)

    ptx = jnp.concatenate([cross_x, pax, pbx], axis=0)  # (16, P)
    pty = jnp.concatenate([cross_y, pay, pby], axis=0)
    mf = jnp.concatenate([cross_m, a_in_b, b_in_a], axis=0)  # float {0,1}
    NPT = 16

    # --- angular rank ordering + shoelace ----------------------------------
    n = jnp.sum(mf, axis=0)  # (P,)
    inv_n = 1.0 / jnp.maximum(n, 1.0)
    cx_ = jnp.sum(ptx * mf, axis=0) * inv_n
    cy_ = jnp.sum(pty * mf, axis=0) * inv_n
    # "diamond angle": monotonic circular parametrization without atan2
    # (no Mosaic lowering for transcendental atan2; ordering only needs
    # monotonicity, not the true angle)
    dx = ptx - cx_[None, :]
    dy = pty - cy_[None, :]
    tt = dy / jnp.maximum(jnp.abs(dx) + jnp.abs(dy), _EPS)
    ang = jnp.where(dx >= 0, tt, 2.0 - tt)  # ∈ [-1, 3)
    ang = jnp.where(mf > 0.5, ang, 10.0)

    # rank[i] = #points ordered before i (index tiebreak) — unrolled loop,
    # buffers stay (NPT, P)
    # 2-D integer iota (f32 iota has no TPU lowering), cast after
    idx_pt = jax.lax.broadcasted_iota(jnp.int32, (NPT, 1), 0).astype(jnp.float32)
    rank = jnp.zeros_like(ang)
    for j in range(NPT):
        aj = ang[j][None, :]
        lt = jnp.where(aj < ang, one, zero)
        tie = jnp.where(aj == ang, one, zero) * jnp.where(idx_pt > j, one, zero)
        rank = rank + jnp.minimum(lt + tie, one)

    # ring[k] = point with rank k (one-hot accumulation, unrolled)
    kio = idx_pt  # (NPT, 1)
    ringx = jnp.zeros_like(ptx)
    ringy = jnp.zeros_like(pty)
    for i in range(NPT):
        oh = jnp.where(rank[i][None, :] == kio, one, zero)  # (NPT, P)
        ringx = ringx + ptx[i][None, :] * oh
        ringy = ringy + pty[i][None, :] * oh

    valid_k = kio < n[None, :]
    ringx = jnp.where(valid_k, ringx, ringx[0:1])
    ringy = jnp.where(valid_k, ringy, ringy[0:1])
    nxtx = ring_next(ringx)
    nxty = ring_next(ringy)
    area2 = jnp.sum(ringx * nxty - ringy * nxtx, axis=0)
    inter = 0.5 * jnp.abs(area2)
    inter = jnp.where(n >= 3, inter, 0.0)

    area_a = al * as_
    area_b = bl * bs
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)


def _kernel(a_ref, b_ref, out_ref):
    a = a_ref[...]  # (5, PB)
    b = b_ref[...]
    out_ref[...] = _pairs_iou_math(
        a[0], a[1], a[2], a[3], a[4], b[0], b[1], b[2], b[3], b[4]
    )[None, :]


@functools.partial(jax.jit, static_argnames=("block",))
def pairs_rotated_iou(boxes_a, boxes_b, block: int = 2048):
    """Exact rotated IoU of paired boxes.

    Args:
        boxes_a, boxes_b: ``(P, 5)`` f32 rboxes (same leading shape).
        block: pairs per Pallas program (VMEM budget ~6 MB at 2048).

    Returns:
        ``(P,)`` f32 IoU.
    """
    P = boxes_a.shape[0]
    pad = (-P) % block
    if pad:
        boxes_a = jnp.pad(boxes_a, ((0, pad), (0, 0)))
        boxes_b = jnp.pad(boxes_b, ((0, pad), (0, 0)), constant_values=1.0)
    Pp = boxes_a.shape[0]
    at = boxes_a.T  # (5, Pp)
    bt = boxes_b.T

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _kernel,
        grid=(Pp // block,),
        in_specs=[
            pl.BlockSpec((5, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        interpret=interpret,
    )(at.astype(jnp.float32), bt.astype(jnp.float32))
    return out[0, :P]


def sparse_rotated_iou(boxes, nbr_idx, block: int = 2048):
    """(K,5) boxes + (K,M) neighbour indices → (K,M) exact IoU via Pallas."""
    K, M = nbr_idx.shape
    pair_a = jnp.repeat(boxes, M, axis=0)  # (K*M, 5)
    pair_b = boxes[nbr_idx.reshape(-1)]  # (K*M, 5)
    return pairs_rotated_iou(pair_a, pair_b, block=block).reshape(K, M)
