"""Pallas TPU kernel: fused image-ingest + YOLOv5 stem convolution.

The stock path feeds ``(B, H, W, 3)`` uint8 — on TPU the C=3 lane dim pads
3→128 (~42x), so merely *reading* a 50 MB image batch moves ~2.1 GB of HBM
traffic (measured: tools/bench_fwd_decomp.py / bench_stem_layout.py).  This
kernel ingests the image as a **free host-side view** ``(B, H, W*3)`` u8
(no padding: minor dim W*3) and computes the stem
``Conv(c2, k=6, s=2, p=2) + BN + SiLU`` (reference models/yolov5*.yaml row 0,
models/common.py:37-49) in one pass, writing only the conv output.

Key identity: a 6x6/s2/p2 conv equals a 3x3/s1/p1 conv on the 2x2
space-to-depth image (the reference's old ``Focus`` trick in reverse).  In
the deinterleaved layout

    x6[(r*6 + j), ox] = image[r, 6*ox + j]      # (6H, W/2), j in 0..5

the 108 taps of one output row are **36 consecutive x6 rows** at three lane
shifts q in {-1, 0, 1}:

    out[oy, ox, k] = sum_{d in 0..35, q} x6[12*oy + d - 12 + j0, ox + q]
                                         * W[q, d, k]

so each output row is three ``(36, W/2) x (36, c2)`` MXU dots with
sublane-shifted accumulation — no strided access, no gathers.

BN + the /255 normalize fold into W and the bias (inference path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 32  # output rows per program


def remap_w6(w6):
    """(6,6,C,K) HWIO stem kernel → (3, 36, C*?…) tap-ordered (q, d, K) where
    d = dy*6 + jj indexes the 36 consecutive x6 rows of one output row.

    Returns (108, K): row index = (q+1)*36 + dy*6 + jj.
    Original tap (dy, dx, c): lane offset j = 3*dx + c - 6 = 6*q + jj.
    """
    C = w6.shape[2]
    K = w6.shape[3]
    w = np.zeros((3, 36, K), np.float32) if isinstance(w6, np.ndarray) else None
    if w is not None:
        for dy in range(6):
            for dx in range(6):
                for c in range(C):
                    j = 3 * dx + c - 6
                    q, jj = j // 6, j % 6
                    w[q + 1, dy * 6 + jj] += w6[dy, dx, c]  # unique (dy,jj,q)
        return w.reshape(108, K)
    # traced path (jnp): build with scatter-free stacking
    taps = []
    for q in (-1, 0, 1):
        rows = []
        for dy in range(6):
            for jj in range(6):
                j = 6 * q + jj
                dx, c = divmod(j + 6, 3)
                # j = 3*dx + c - 6  =>  j + 6 = 3*dx + c
                rows.append(w6[dy, dx, c])
        taps.append(jnp.stack(rows))
    return jnp.concatenate(taps, axis=0)  # (108, K)


def _kernel(c2, x6_prev, x6_cur, x6_next, w_ref, b_ref, out_ref):
    """One program: _ROWS output rows of one image.

    x6_cur:  (1, 12*_ROWS, W2) — x6 rows [12*_ROWS*p, 12*_ROWS*(p+1))
    x6_prev/next: same-shape neighbour blocks (clamped at the edges; the
    out-of-image taps they contribute are zero-masked via the row mask).
    w_ref: (128, c2) f32 — remapped taps (rows 0..107 used, rest zero)
    b_ref: (1, c2) f32 — folded bias
    out_ref: (1, _ROWS, W2, c2)
    """
    R = _ROWS
    p = pl.program_id(1)
    W2 = x6_cur.shape[2]
    nprog = pl.num_programs(1)

    # (12R + 32, W2): 16 halo rows each side from the neighbour blocks
    # (16 keeps every sublane concat/slice 8-aligned)
    xcat = jnp.concatenate(
        [x6_prev[0, -16:, :], x6_cur[0], x6_next[0, :16, :]], axis=0
    )

    # zero out taps whose source image row is outside [0, H): x6 row g is
    # image row g // 6; globally g = 12*R*p + (local - 16)
    loc = jax.lax.broadcasted_iota(jnp.int32, (12 * R + 32, 1), 0)
    g = 12 * R * p + loc - 16
    total = 12 * R * nprog  # = 6*H
    rowmask = jnp.where((g >= 0) & (g < total), 1.0, 0.0).astype(xcat.dtype)
    xcat = xcat * rowmask

    w = w_ref[...]
    wq = [w[0:36], w[36:72], w[72:108]]  # static sublane slices
    bias = b_ref[...]  # (1, c2)
    zrow = jnp.zeros((1, c2), jnp.float32)

    for oy in range(R):
        # out row oy's taps: x6 rows 12*oy-12 .. +24 globally, +16 halo off
        pb = xcat[12 * oy + 4 : 12 * oy + 40, :]  # (36, W2) static slice
        ys = []
        for qi in range(3):
            ys.append(
                jax.lax.dot_general(
                    pb, wq[qi], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (W2, c2)
        # out[ox] = y0[ox-1] + y1[ox] + y2[ox+1]   (sublane shifts)
        y = (
            jnp.concatenate([zrow, ys[0][:-1]], axis=0)
            + ys[1]
            + jnp.concatenate([ys[2][1:], zrow], axis=0)
        )
        y = y + bias
        y = y * jax.nn.sigmoid(y)  # SiLU
        out_ref[0, oy] = y.astype(out_ref.dtype)


def _stem_xla(x_packed, w108, bias, h: int, w: int):
    """Reference/fallback path: same folded math via a plain XLA conv
    (CPU tests, or shapes the kernel grid doesn't cover)."""
    B = x_packed.shape[0]
    c2 = w108.shape[1]
    # un-remap (108, c2) → (6, 6, 3, c2): row (q+1)*36 + dy*6 + jj holds
    # original tap (dy, dx, c) with 3*dx + c = 6*q + jj + 6
    w6 = jnp.zeros((6, 6, 3, c2), w108.dtype)
    for q in (-1, 0, 1):
        for dy in range(6):
            for jj in range(6):
                dx, c = divmod(6 * q + jj + 6, 3)
                w6 = w6.at[dy, dx, c].set(w108[(q + 1) * 36 + dy * 6 + jj])
    x = x_packed.reshape(B, h, w, 3).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, w6.astype(jnp.float32), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + bias.reshape(1, 1, 1, c2)
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("h", "w", "use_pallas"))
def fused_stem(x_packed, w108, bias, h: int, w: int,
               use_pallas: bool | None = None):
    """Fused ingest + stem conv.

    Args:
        x_packed: ``(B, H, W*3)`` uint8 — a host-side *view* of the NHWC
            image batch (``img.reshape(B, H, -1)``, no copy).
        w108: ``(108, c2)`` f32 — ``remap_w6`` of the stem kernel with the
            /255 normalize and inference BN scale folded in.
        bias: ``(c2,)`` f32 — folded BN shift.
        h, w: image height/width (static).
        use_pallas: force the kernel on/off (default: auto — kernel on TPU,
            plain-XLA fallback elsewhere; tests pass True to run the kernel
            under the Pallas interpreter).

    Returns:
        ``(B, H/2, W/2, c2)`` bf16 — stem output (post-BN+SiLU).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas or (h // 2) % _ROWS or w % 2:
        return _stem_xla(x_packed, w108, bias, h, w)
    B = x_packed.shape[0]
    c2 = w108.shape[1]
    W2 = w // 2
    R = _ROWS
    nprog = (h // 2) // R

    # deinterleave: x6[r*6+j, ox] = row[6*ox + j] — one fused XLA copy,
    # u8 (B,H,3W) read (unpadded) → bf16 (B, 6H, W/2) write (unpadded)
    x6 = (
        x_packed.astype(jnp.bfloat16)
        .reshape(B, h, W2, 6)
        .transpose(0, 1, 3, 2)
        .reshape(B, 6 * h, W2)
    )

    wpad = jnp.zeros((128, c2), jnp.float32).at[:108].set(w108)
    b2 = bias.reshape(1, c2).astype(jnp.float32)

    blk = 12 * R  # x6 rows per program

    def idx_prev(b, p):
        return (b, jnp.maximum(p - 1, 0), 0)

    def idx_cur(b, p):
        return (b, p, 0)

    def idx_next(b, p):
        return (b, jnp.minimum(p + 1, nprog - 1), 0)

    out = pl.pallas_call(
        functools.partial(_kernel, c2),
        grid=(B, nprog),
        in_specs=[
            pl.BlockSpec((1, blk, W2), idx_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, W2), idx_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, W2), idx_next, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c2), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, W2, c2), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, h // 2, W2, c2), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )(x6, x6, x6, wpad, b2)
    return out


def fold_stem_params(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                     eps: float = 1e-3):
    """Stem Conv+BN params → (w108, bias) for :func:`fused_stem`.

    Folds the /255 input normalize and the inference BatchNorm affine into
    the conv weights (reference fuse_conv_and_bn, utils/torch_utils.py:192).
    """
    g = bn_scale / jnp.sqrt(bn_var + eps)
    w6 = kernel * g[None, None, None, :] / 255.0
    b = bn_bias - bn_mean * g
    return remap_w6(w6), b
