"""Fused C3 (CSP bottleneck, n=2) Pallas kernel — inference only.

The layer-2 ``C3(96, 96, 2)`` at 256x256 costs ~1.1 ms/img in-context
(tools/bench_layers.py), half the yolov5m forward: seven small-channel
convs (48/96 lanes on a 128-lane MXU) each round-tripping activations
through HBM, plus XLA layout copies at the block boundaries.  This kernel
computes the whole block — cv1, two residual bottlenecks (1x1 + 3x3),
cv2, cv3, every BN folded to a per-channel scale/shift, SiLU between —
in VMEM with ONE HBM read of the input and ONE write of the output.

Reference semantics: models/common.py:94-138 (Bottleneck/C3) with SAME
zero padding on the 3x3 convs.

Design notes (Mosaic constraints, see CLAUDE.md):
- Input is zero-padded by the caller to ``(B, H+8, W+24, C)``
  (2 halo rows/cols before, spare after so every block DMA and flatten
  stays 8-aligned).  The kernel grid is ``(B, H//16)``; each program
  DMAs a 24-row slab from HBM (overlapping halo — BlockSpec index maps
  cannot express overlap, manual ``make_async_copy`` can).
- All convs are expressed as 2-D matmuls on ``(rows*W_pad, C)`` flats;
  collapsing (rows, W_pad) into sublanes is legal because W_pad % 8 == 0.
- A 3x3 conv is the sum of 9 tap matmuls on row/col-shifted flat slices.
  A zero row is prepended before flattening so every tap slice start
  ``(dy+1)*W_pad + dx - 1`` is non-negative; unaligned sublane slices
  lower to cheap vector shifts.
- SAME-padding parity: the 3x3 inputs are masked to zero outside the
  real image (the padded halo would otherwise carry silu(shift) values
  where the stock conv sees zeros).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_OUT = 8  # output rows per program (VMEM-bounded)
_ROWS_IN = _ROWS_OUT + 8  # + 4 halo (2 levels of 3x3) + 4 alignment spare
_PAD_TOP = 2
_PAD_LEFT = 2
_PAD_W_EXTRA = 24  # left 2 + right 22 (8-alignment spare)
_PAD_H_EXTRA = 8   # top 2 + bottom 6


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv1x1(flat_bf16, w, scale, shift):
    """(M, Ci) @ (Ci, Co) → scale/shift → SiLU, f32 accum, bf16 out."""
    y = jax.lax.dot_general(
        flat_bf16, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return _silu(y * scale + shift).astype(jnp.bfloat16)


def _conv3x3(h, w_taps, scale, shift, rows_out, wp, c):
    """SAME 3x3 over ``h`` (rows, wp, c) → (rows_out*wp, c) starting at
    row 1.  ``w_taps`` is (9*c, c), tap (dy,dx) at rows [(3dy+dx)*c:+c]."""
    rows = h.shape[0]
    # zero row before (keeps every tap start >= 0) and after (the (dy=2,
    # dx=+1) tap of the last row reads one element past rows*wp — a
    # cropped pad column, but the slice must stay in bounds)
    zrow = jnp.zeros((1, wp, c), jnp.bfloat16)
    h25 = jnp.concatenate([zrow, h, zrow], axis=0).reshape(
        (rows + 2) * wp, c)
    L = rows_out * wp
    acc = jnp.zeros((L, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            s = (dy + 1) * wp + dx - 1
            tap = jax.lax.slice(h25, (s, 0), (s + L, c))
            wt = jax.lax.slice(w_taps, ((dy * 3 + dx) * c, 0),
                               ((dy * 3 + dx + 1) * c, c))
            acc = acc + jax.lax.dot_general(
                tap, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return _silu(acc * scale + shift).astype(jnp.bfloat16)


def _kernel(h_img, w_img, wp, c1, c_, cp,
            x_hbm, mask_ref, w1, s1, wb1a, sb1a, wb1t, sb1t, wb2a, sb2a,
            wb2t, sb2t, w2, s2, w3a, w3b, s3, out_ref, xb, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * _ROWS_OUT, _ROWS_IN)], xb, sem
    )
    dma.start()
    dma.wait()

    x = xb[...]  # (ROWS_IN, wp, cp) bf16
    xf = x.reshape(_ROWS_IN * wp, cp)

    # in-image validity mask {0,1} for SAME-pad parity: shape-constant,
    # precomputed by the caller per block row (3-D iota comparisons do
    # not lower in Mosaic; an XLA-baked constant input does)
    mask = mask_ref[0]  # (ROWS_IN, wp, c_) bf16

    # cv1 on all rows
    a1 = _conv1x1(xf, w1[...], s1[0:1], s1[1:2]).reshape(_ROWS_IN, wp, c_)

    R = _ROWS_OUT
    r1_rows = R + 2  # bottleneck-1 output rows (abs 1..R+2)

    # bottleneck 1: all ROWS_IN rows → out rows 1..R+2
    h1 = _conv1x1(a1.reshape(_ROWS_IN * wp, c_), wb1a[...],
                  sb1a[0:1], sb1a[1:2]).reshape(_ROWS_IN, wp, c_)
    h1 = h1 * mask
    r1 = (
        a1[1:1 + r1_rows].reshape(r1_rows * wp, c_)
        + _conv3x3(h1, wb1t[...], sb1t[0:1], sb1t[1:2], r1_rows, wp, c_)
    ).astype(jnp.bfloat16).reshape(r1_rows, wp, c_)

    # bottleneck 2: r1 rows (abs 1..R+2) → out rows (abs 2..R+1)
    h2 = _conv1x1(r1.reshape(r1_rows * wp, c_), wb2a[...],
                  sb2a[0:1], sb2a[1:2]).reshape(r1_rows, wp, c_)
    h2 = h2 * mask[1:1 + r1_rows]
    r2 = (
        r1[1:1 + R].reshape(R * wp, c_)
        + _conv3x3(h2, wb2t[...], sb2t[0:1], sb2t[1:2], R, wp, c_)
    ).astype(jnp.bfloat16)  # (R*wp, c_), abs rows 2..R+1

    # cv2 on abs rows 2..R+1
    c2c = _conv1x1(x[2:2 + R].reshape(R * wp, cp), w2[...], s2[0:1], s2[1:2])

    # cv3 on concat(r2, c2) — expressed as two matmuls (lane concat at c_
    # is not 128-aligned)
    y = jax.lax.dot_general(r2, w3a[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(c2c, w3b[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = _silu(y * s3[0:1] + s3[1:2]).astype(jnp.bfloat16)
    y = y.reshape(_ROWS_OUT, wp, c1)
    out_ref[...] = y[:, _PAD_LEFT:_PAD_LEFT + w_img, :][None]


def fold_conv_bn(kernel, scale, bias, mean, var, eps: float = 1e-3):
    """(k,k,ci,co) conv + BN stats → (w bf16, scale/shift f32 (2, co))."""
    g = scale / np.sqrt(np.asarray(var, np.float64) + eps)
    sc = np.asarray(g, np.float32)
    sh = np.asarray(bias - mean * g, np.float32)
    return (np.asarray(kernel, np.float32).astype(jnp.bfloat16),
            np.stack([sc, sh]).astype(np.float32))


def fold_c3_params(params, stats, eps: float = 1e-3):
    """C3 module scope (params + batch_stats) → kernel operand dict."""

    def fold(scope_p, scope_s):
        conv = scope_p["Conv_0"]["kernel"]
        bn = scope_p["BatchNorm_0"]
        st = scope_s["BatchNorm_0"]
        return fold_conv_bn(conv, np.asarray(bn["scale"]),
                            np.asarray(bn["bias"]), np.asarray(st["mean"]),
                            np.asarray(st["var"]), eps)

    def taps(w4):
        # (3,3,ci,co) → (9*ci, co), tap (dy,dx) rows [(3dy+dx)*ci : +ci]
        w = np.asarray(w4, np.float32)
        k, _, ci, co = w.shape
        return np.ascontiguousarray(
            w.transpose(0, 1, 2, 3).reshape(9 * ci, co)).astype(jnp.bfloat16)

    out = {}
    w, ss = fold(params["ConvBnAct_0"], stats["ConvBnAct_0"])
    out["w1"], out["s1"] = np.asarray(w)[0, 0], ss
    for bi in (0, 1):
        bp, bs = params[f"Bottleneck_{bi}"], stats[f"Bottleneck_{bi}"]
        wa, ssa = fold(bp["ConvBnAct_0"], bs["ConvBnAct_0"])
        wt_raw = bp["ConvBnAct_1"]["Conv_0"]["kernel"]
        _, sst = fold(bp["ConvBnAct_1"], bs["ConvBnAct_1"])
        out[f"wb{bi+1}a"], out[f"sb{bi+1}a"] = np.asarray(wa)[0, 0], ssa
        out[f"wb{bi+1}t"], out[f"sb{bi+1}t"] = taps(wt_raw), sst
    w, ss = fold(params["ConvBnAct_1"], stats["ConvBnAct_1"])
    out["w2"], out["s2"] = np.asarray(w)[0, 0], ss
    w3, ss3 = fold(params["ConvBnAct_2"], stats["ConvBnAct_2"])
    w3 = np.asarray(w3)[0, 0]  # (2*c_, c1)
    c_ = w3.shape[0] // 2
    out["w3a"], out["w3b"], out["s3"] = w3[:c_], w3[c_:], ss3
    return out


@functools.partial(jax.jit, static_argnames=())
def fused_c3(x, w1, s1, wb1a, sb1a, wb1t, sb1t, wb2a, sb2a, wb2t, sb2t,
             w2, s2, w3a, w3b, s3):
    """Fused C3(c1, c1, n=2, shortcut=True, e=0.5) forward.

    x: (B, H, W, c1) bf16, H % 16 == 0, W % 8 == 0.  Returns same shape.
    """
    B, H, W, c1 = x.shape
    c_ = c1 // 2
    wp = W + _PAD_W_EXTRA
    # channel-pad the input (and the two convs that read it) to a whole
    # number of 128-lane tiles: the manual HBM→VMEM DMA slices must be
    # tile-aligned in the minor dim; zero weight rows keep results exact
    cp = -(-c1 // 128) * 128
    xp = jnp.pad(x, ((0, 0), (_PAD_TOP, _PAD_H_EXTRA - _PAD_TOP),
                     (_PAD_LEFT, _PAD_W_EXTRA - _PAD_LEFT), (0, cp - c1)))
    w1 = jnp.pad(jnp.asarray(w1), ((0, cp - c1), (0, 0)))
    w2 = jnp.pad(jnp.asarray(w2), ((0, cp - c1), (0, 0)))

    # per-block-row in-image mask (shape-constant → XLA bakes it)
    n_i = H // _ROWS_OUT
    ri = np.arange(n_i)[:, None, None, None] * _ROWS_OUT \
        + np.arange(_ROWS_IN)[None, :, None, None]
    wi = np.arange(wp)[None, None, :, None]
    mask = ((ri >= _PAD_TOP) & (ri < _PAD_TOP + H)
            & (wi >= _PAD_LEFT) & (wi < _PAD_LEFT + W))
    mask = jnp.asarray(
        np.broadcast_to(mask, (n_i, _ROWS_IN, wp, c_)), jnp.bfloat16)

    kern = functools.partial(_kernel, H, W, wp, c1, c_, cp)
    interpret = jax.default_backend() != "tpu"
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, n_i),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, _ROWS_IN, wp, c_),
                               lambda b, i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vspec() for _ in range(15)],
        out_specs=pl.BlockSpec((1, _ROWS_OUT, W, c1),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c1), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((_ROWS_IN, wp, cp), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp.astype(jnp.bfloat16), mask,
      jnp.asarray(w1), jnp.asarray(s1), jnp.asarray(wb1a), jnp.asarray(sb1a),
      jnp.asarray(wb1t), jnp.asarray(sb1t), jnp.asarray(wb2a),
      jnp.asarray(sb2a), jnp.asarray(wb2t), jnp.asarray(sb2t),
      jnp.asarray(w2), jnp.asarray(s2), jnp.asarray(w3a), jnp.asarray(w3b),
      jnp.asarray(s3))
