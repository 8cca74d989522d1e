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


# ---------------------------------------------------------------------------
# train-mode stem: raw conv (no BN fold) + custom-VJP Pallas wgrad
# ---------------------------------------------------------------------------
#
# Training cannot fold BatchNorm (batch stats come from the live conv
# output), but the layout win is the same: the stock train step reads the
# (B, H, W, 3) image with the C=3 lane dim padded 3→128 in BOTH the forward
# and the weight-grad conv (measured 0.46 + 0.19 ms/img at yolov5m@1024 vs
# a 0.04 byte floor, tools/bench_train_convs.py).  These kernels compute
# the raw pre-BN stem conv from the packed view, with a custom VJP whose
# backward is a second Pallas kernel producing dW directly — the image
# needs no input gradient, so the backward is wgrad-only.


def _deinterleave(x_packed, h: int, W2: int):
    """(B, H, 3W) u8 → (B, 6H, W2) bf16, x6[r*6+j, ox] = row[6*ox + j]."""
    B = x_packed.shape[0]
    return (
        x_packed.astype(jnp.bfloat16)
        .reshape(B, h, W2, 6)
        .transpose(0, 1, 3, 2)
        .reshape(B, 6 * h, W2)
    )


def _xcat_masked(x6_prev, x6_cur, x6_next, halo: int):
    """Concatenate the program's x6 block with ``halo`` neighbour rows each
    side and zero rows outside the image (shared by fwd and wgrad)."""
    R = _ROWS
    p = pl.program_id(1)
    nprog = pl.num_programs(1)
    xcat = jnp.concatenate(
        [x6_prev[0, -halo:, :], x6_cur[0], x6_next[0, :halo, :]], axis=0
    )
    loc = jax.lax.broadcasted_iota(jnp.int32, (12 * R + 2 * halo, 1), 0)
    g = 12 * R * p + loc - halo
    total = 12 * R * nprog  # = 6*H
    rowmask = jnp.where((g >= 0) & (g < total), 1.0, 0.0).astype(xcat.dtype)
    return xcat * rowmask


def _kernel_raw(c2, x6_prev, x6_cur, x6_next, w_ref, out_ref):
    """Raw stem conv rows (no bias / activation): train-mode forward."""
    R = _ROWS
    xcat = _xcat_masked(x6_prev, x6_cur, x6_next, 16)
    w = w_ref[...]
    wq = [w[0:36], w[36:72], w[72:108]]
    zrow = jnp.zeros((1, c2), jnp.float32)
    for oy in range(R):
        pb = xcat[12 * oy + 4 : 12 * oy + 40, :]  # (36, W2)
        ys = [
            jax.lax.dot_general(
                pb, wq[qi], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for qi in range(3)
        ]
        y = (
            jnp.concatenate([zrow, ys[0][:-1]], axis=0)
            + ys[1]
            + jnp.concatenate([ys[2][1:], zrow], axis=0)
        )
        out_ref[0, oy] = y.astype(out_ref.dtype)


def _wgrad_kernel(c2, x6_prev, x6_cur, x6_next, dz_ref, out_ref):
    """Stem weight grad: dW[q*36+d, k] = Σ_{b,oy,ox} pb[d, ox_q] dz[ox, k].

    Sequential-grid accumulation into one (128, c2) f32 block (rows
    0..107 live, rest zero — same tap order as :func:`remap_w6`)."""
    R = _ROWS
    xcat = _xcat_masked(x6_prev, x6_cur, x6_next, 16)
    accs = [jnp.zeros((36, c2), jnp.float32) for _ in range(3)]
    zrow = jnp.zeros((1, c2), jnp.bfloat16)
    for oy in range(R):
        dzr = dz_ref[0, oy].astype(jnp.bfloat16)  # (W2, c2)
        # fwd: out[ox] = ys0[ox-1] + ys1[ox] + ys2[ox+1]
        dq = (
            jnp.concatenate([dzr[1:], zrow], axis=0),  # dys0[j] = dz[j+1]
            dzr,
            jnp.concatenate([zrow, dzr[:-1]], axis=0),  # dys2[j] = dz[j-1]
        )
        pb = xcat[12 * oy + 4 : 12 * oy + 40, :]  # (36, W2)
        for qi in range(3):
            accs[qi] = accs[qi] + jax.lax.dot_general(
                pb, dq[qi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = jnp.concatenate(
        accs + [jnp.zeros((128 - 108, c2), jnp.float32)], axis=0
    )

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc


def _stem_blockspecs(B, nprog, blk, W2):
    def idx_prev(b, p):
        return (b, jnp.maximum(p - 1, 0), 0)

    def idx_cur(b, p):
        return (b, p, 0)

    def idx_next(b, p):
        return (b, jnp.minimum(p + 1, nprog - 1), 0)

    return [
        pl.BlockSpec((1, blk, W2), idx_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, W2), idx_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, W2), idx_next, memory_space=pltpu.VMEM),
    ]


def _stem_raw_xla(x_packed, w108, h: int, w: int, out_dtype=jnp.bfloat16):
    """Differentiable fallback: unremap w108 → plain XLA conv.

    Computes in ``out_dtype``: bf16 mirrors BOTH the stock
    nn.Conv(dtype=bf16) and the Pallas kernel's MXU dots; f32 gives the
    f32-everywhere model elementwise-exact train math (test_packed_train's
    f32 grad-parity A/B).
    """
    B = x_packed.shape[0]
    c2 = w108.shape[1]
    w6 = jnp.zeros((6, 6, 3, c2), w108.dtype)
    for q in (-1, 0, 1):
        for dy in range(6):
            for jj in range(6):
                dx, c = divmod(6 * q + jj + 6, 3)
                w6 = w6.at[dy, dx, c].set(w108[(q + 1) * 36 + dy * 6 + jj])
    x = x_packed.reshape(B, h, w, 3).astype(out_dtype)
    y = jax.lax.conv_general_dilated(
        x, w6.astype(out_dtype), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _stem_train_p(x_packed, w108, h, w):
    z, _ = _stem_train_p_fwd(x_packed, w108, h, w)
    return z


def _stem_train_p_fwd(x_packed, w108, h, w):
    B = x_packed.shape[0]
    c2 = w108.shape[1]
    W2 = w // 2
    R = _ROWS
    nprog = (h // 2) // R
    x6 = _deinterleave(x_packed, h, W2)
    wpad = jnp.zeros((128, c2), jnp.float32).at[:108].set(
        w108.astype(jnp.float32))
    blk = 12 * R
    z = pl.pallas_call(
        functools.partial(_kernel_raw, c2),
        grid=(B, nprog),
        in_specs=_stem_blockspecs(B, nprog, blk, W2)
        + [pl.BlockSpec((128, c2), lambda b, p: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, R, W2, c2), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, h // 2, W2, c2), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )(x6, x6, x6, wpad)
    return z, (x6, x_packed.shape)


def _stem_train_p_bwd(h, w, res, dz):
    x6, x_shape = res
    B = x6.shape[0]
    c2 = dz.shape[-1]
    W2 = w // 2
    R = _ROWS
    nprog = (h // 2) // R
    blk = 12 * R
    dwpad = pl.pallas_call(
        functools.partial(_wgrad_kernel, c2),
        grid=(B, nprog),
        in_specs=_stem_blockspecs(B, nprog, blk, W2)
        + [pl.BlockSpec((1, R, W2, c2), lambda b, p: (b, p, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, c2), lambda b, p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, c2), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x6, x6, x6, dz)
    dw = dwpad[:108]
    # the u8 image takes no gradient (float0 cotangent)
    dx = np.zeros(x_shape, jax.dtypes.float0)
    return (dx, dw)


_stem_train_p.defvjp(_stem_train_p_fwd, _stem_train_p_bwd)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "use_pallas", "out_dtype"))
def stem_conv_train(x_packed, w108, h: int, w: int,
                    use_pallas: bool | None = None,
                    out_dtype=jnp.bfloat16):
    """Train-mode raw stem conv from the packed image view.

    Args:
        x_packed: ``(B, H, W*3)`` uint8 packed image view.
        w108: ``(108, c2)`` — ``remap_w6`` of the stem kernel with any
            input normalize folded in (e.g. ``remap_w6(k) / 255``).
        h, w: image height/width (static).
        out_dtype: compute/output dtype; the Pallas kernel is bf16-only,
            so f32 models take the XLA fallback.

    Returns ``(B, H/2, W/2, c2)`` PRE-BatchNorm conv output.
    Differentiable w.r.t. ``w108`` only (the backward runs a Pallas wgrad
    kernel on TPU); the image input takes no gradient.
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and out_dtype == jnp.bfloat16)
    if not use_pallas or (h // 2) % _ROWS or w % 2:
        return _stem_raw_xla(x_packed, w108, h, w, out_dtype)
    return _stem_train_p(x_packed, w108, h, w)


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


# ---------------------------------------------------------------------------
# fused stem + layer-1 (Conv c2→c3, 3x3/s2) — one kernel, no stem tensor
# ---------------------------------------------------------------------------
#
# The stem output (B, H/2, W/2, 48) lane-pads 48→128 in HBM (2.7x), so the
# stem→layer-1 boundary alone moves ~134 MB/img (write + read).  This
# kernel keeps the stem rows in VMEM and emits only the layer-1 output
# (B, H/4, W/4, c3).  Column stride-2: stem rows are staged in a VMEM
# scratch and read back as strided loads (even cols / odd cols / odd
# shifted down one pair) — Mosaic supports strided VMEM loads but NOT
# sublane→lane shape casts or strided vector slices.  Exactly SAME-pad
# parity with the stock ConvBnAct(c3, 3, 2) (pad (1,1), bottom/right pad
# unused at even sizes).


def fold_stem_l1_params(k0, bn0, k1, bn1, eps: float = 1e-3):
    """Stem + layer-1 Conv+BN params → operands for :func:`fused_stem_l1`.

    k0: (6,6,3,c2); bn0/bn1: (scale, bias, mean, var); k1: (3,3,c2,c3).
    Returns (w108, b0, w1taps, b1) with w1taps (9*c2, c3): tap (ky, kx)
    at rows [(3*ky + kx)*c2 : +c2] (BN scale folded).
    """
    w108, b0 = fold_stem_params(k0, *bn0, eps=eps)
    s1, bb1, m1, v1 = bn1
    g1 = s1 / jnp.sqrt(v1 + eps)
    w1f = k1 * g1  # (3,3,c2,c3), BN scale folded
    b1 = bb1 - m1 * g1
    c3 = w1f.shape[3]
    return (w108, b0, w1f.reshape(-1, c3), b1)


def _stem_l1_xla(x_packed, w108, b0, w1taps, b1, h, w):
    """Fallback: stem fallback + plain XLA 3x3/s2 conv (folded BN+SiLU)."""
    s = _stem_xla(x_packed, w108, b0, h, w)  # (B, h/2, w/2, c2) bf16
    c3 = w1taps.shape[1]
    c2 = w1taps.shape[0] // 9
    w1 = w1taps.reshape(3, 3, c2, c3)
    y = jax.lax.conv_general_dilated(
        s.astype(jnp.float32), w1.astype(jnp.float32), (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b1.reshape(1, 1, 1, c3)
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


def _kernel_l1(c2, c3, x6_prev, x6_cur, x6_next, w_ref, b_ref, w1_ref,
               b1_ref, out_ref, scr):
    """One program: _ROWS stem rows + _ROWS/2 layer-1 output rows.

    x6 blocks as in :func:`_kernel` but with 32 halo rows each side (the
    layer-1 taps need stem row -1 of the block).  w1_ref: (9*c2, c3), tap
    (ky, kx) at rows [(3ky+kx)*c2 : +c2].  ``scr``: ((R+1)*W2, c2) VMEM —
    stem rows staged so the column stride-2 reads lower as strided
    VMEM loads (Mosaic cannot shape-cast sublanes into lanes).
    """
    R = _ROWS
    p = pl.program_id(1)
    W2 = x6_cur.shape[2]
    W4 = W2 // 2
    nprog = pl.num_programs(1)

    xcat = jnp.concatenate(
        [x6_prev[0, -32:, :], x6_cur[0], x6_next[0, :32, :]], axis=0
    )
    loc = jax.lax.broadcasted_iota(jnp.int32, (12 * R + 64, 1), 0)
    g = 12 * R * p + loc - 32
    total = 12 * R * nprog  # = 6*H
    rowmask = jnp.where((g >= 0) & (g < total), 1.0, 0.0).astype(xcat.dtype)
    xcat = xcat * rowmask

    w = w_ref[...]
    wq = [w[0:36], w[36:72], w[72:108]]
    bias = b_ref[...]  # (1, c2)
    zrow = jnp.zeros((1, c2), jnp.float32)

    # stem row -1 of program 0 is the layer-1 top zero pad, not silu(bias)
    top_ok = jnp.where(p > 0, 1.0, 0.0).astype(jnp.bfloat16)

    # stem rows oy = -1 .. R-1, staged in scratch at slot oy+1
    for oy in range(-1, R):
        pb = xcat[12 * oy + 20: 12 * oy + 56, :]  # (36, W2)
        ys = []
        for qi in range(3):
            ys.append(
                jax.lax.dot_general(
                    pb, wq[qi], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        yrow = (
            jnp.concatenate([zrow, ys[0][:-1]], axis=0)
            + ys[1]
            + jnp.concatenate([ys[2][1:], zrow], axis=0)
        ) + bias
        yrow = yrow * jax.nn.sigmoid(yrow)
        if oy == -1:
            yrow = yrow * top_ok
        # f32 staging: Mosaic strided loads only support 32-bit data
        scr[(oy + 1) * W2:(oy + 2) * W2, :] = yrow

    w1 = w1_ref[...]
    b1 = b1_ref[...]  # (1, c3)
    zodd = jnp.zeros((1, c2), jnp.bfloat16)
    for oy2 in range(R // 2):
        # pack the 3 taps sharing a dx (one per row offset d) into one
        # K=3*c2 dot: c2=48 pads each K to the 128-lane MXU tile, so 3
        # dots at K=144 waste fewer MXU passes than 9 at K=48 (same
        # packing measured 1.46x/1.10x in the fused C3, c3_kernel.py)
        taps = {0: [], 1: [], 2: []}
        for d in range(3):
            base = (2 * oy2 + d) * W2  # stem row 2*oy2 + d - 1
            even = scr[base: base + W2: 2, :].astype(jnp.bfloat16)
            odd = scr[base + 1: base + W2: 2, :].astype(jnp.bfloat16)
            sh = jnp.concatenate([zodd, odd[:-1]], axis=0)  # cols 2*ox2-1
            taps[0].append(sh)
            taps[1].append(even)
            taps[2].append(odd)
        acc = jnp.zeros((W4, c3), jnp.float32)
        for dx in range(3):
            hp = jnp.concatenate(taps[dx], axis=1)  # (W4, 3*c2)
            wt = jnp.concatenate(
                [w1[(3 * d + dx) * c2: (3 * d + dx + 1) * c2]
                 for d in range(3)], axis=0)  # (3*c2, c3)
            acc = acc + jax.lax.dot_general(
                hp, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + b1
        acc = acc * jax.nn.sigmoid(acc)
        out_ref[0, oy2] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "use_pallas"))
def fused_stem_l1(x_packed, w108, b0, w1taps, b1, h: int, w: int,
                  use_pallas: bool | None = None):
    """Fused ingest + stem Conv(6,2,2) + layer-1 Conv(c3, 3, 2), BN+SiLU
    folded into both — the stem activation never touches HBM.

    Args are :func:`fold_stem_l1_params` outputs plus the image size.
    Returns ``(B, H/4, W/4, c3)`` bf16.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas or (h // 2) % _ROWS or w % 4:
        return _stem_l1_xla(x_packed, w108, b0, w1taps, b1, h, w)
    B = x_packed.shape[0]
    c2 = b0.shape[0]
    c3 = w1taps.shape[1]
    W2 = w // 2
    R = _ROWS
    nprog = (h // 2) // R

    x6 = (
        x_packed.astype(jnp.bfloat16)
        .reshape(B, h, W2, 6)
        .transpose(0, 1, 3, 2)
        .reshape(B, 6 * h, W2)
    )

    wpad = jnp.zeros((128, c2), jnp.float32).at[:108].set(w108)
    b2 = b0.reshape(1, c2).astype(jnp.float32)
    b1r = b1.reshape(1, c3).astype(jnp.float32)

    blk = 12 * R

    def idx_prev(b, p):
        return (b, jnp.maximum(p - 1, 0), 0)

    def idx_cur(b, p):
        return (b, p, 0)

    def idx_next(b, p):
        return (b, jnp.minimum(p + 1, nprog - 1), 0)

    out = pl.pallas_call(
        functools.partial(_kernel_l1, c2, c3),
        grid=(B, nprog),
        in_specs=[
            pl.BlockSpec((1, blk, W2), idx_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, W2), idx_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, W2), idx_next, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c2), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2, c3), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R // 2, W2 // 2, c3), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, h // 4, W2 // 2, c3),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM(((R + 1) * W2, c2), jnp.float32)],
        # without an explicit window the compiler's default 16M scoped-vmem
        # budget OOMs at B=32 (the b16 shape fits by luck); same 100M window
        # as down/c3 kernels
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x6, x6, x6, wpad, b2, jnp.asarray(w1taps, jnp.bfloat16), b1r)
    return out
