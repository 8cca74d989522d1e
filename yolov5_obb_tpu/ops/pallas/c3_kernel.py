"""Fused C3 (CSP bottleneck) Pallas kernel — inference only.

The high-resolution C3 blocks (layer-2 ``C3(96, 96, 2)`` at 256x256,
layer-4 ``C3(192, 192, 4)`` and the P3-head ``C3(384, 192, 2, False)`` at
128x128 for a 1024px input) are small-channel conv stacks whose
activations round-trip HBM between every conv, with XLA layout copies at
the block boundaries.  This kernel computes a whole block — cv1, ``n``
bottlenecks (1x1 + 3x3, optional residual), cv2, cv3, every BN folded to
a per-channel scale/shift, SiLU between — in VMEM with ONE HBM read of
the input and ONE write of the output.

Reference semantics: models/common.py:94-138 (Bottleneck/C3) with SAME
zero padding on the 3x3 convs.  Supports n <= 4, shortcut on/off, and
c1 != c2 (e fixed at 0.5, g at 1 — the only configs the model zoo uses).

Design notes (Mosaic constraints, see CLAUDE.md):
- Input is zero-padded by the caller to ``(B, H+8, W+24, C)``
  (n halo rows/cols before, spare after so every block DMA and flatten
  stays 8-aligned).  The kernel grid is ``(B, H//8)``; each program
  DMAs a 16-row slab from HBM (overlapping halo — BlockSpec index maps
  cannot express overlap, manual ``make_async_copy`` can).
- All convs are expressed as 2-D matmuls on ``(rows*W_pad, C)`` flats;
  collapsing (rows, W_pad) into sublanes is legal because W_pad % 8 == 0.
- A 3x3 conv is the sum of 9 tap matmuls on row/col-shifted flat slices.
  A zero row is prepended before flattening so every tap slice start
  ``(dy+1)*W_pad + dx - 1`` is non-negative; unaligned sublane slices
  lower to cheap vector shifts.
- SAME-padding parity: the 3x3 inputs are masked to zero outside the
  real image (the padded halo would otherwise carry silu(shift) values
  where the stock conv sees zeros).  The HORIZONTAL halo needs no DMA
  overlap — pad columns carry garbage that the mask zeroes before every
  3x3 and the output crop discards; only rows need real neighbours.
- Each bottleneck shrinks row validity by 1 per side, so bottleneck k
  (1-based) emits ``ROWS_OUT + 2*(n-k)`` rows; with ROWS_IN = ROWS_OUT+8
  the slab carries enough halo for n <= 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Output rows per program.  16 halves the DMA halo amplification vs 8
# (ROWS_IN/ROWS_OUT 1.5x vs 2x) and measured 1.30x vs stock XLA on the
# layer-2 block (tools/bench_c3_blocks.py: 8→0.99x, 16→1.30x, 32→~16).
_ROWS_OUT = int(os.environ.get("C3_ROWS_OUT", 16))
_ROWS_IN = _ROWS_OUT + 8  # + n halo rows per side (n<=4) + alignment spare
_PAD_LEFT = 4   # >= max n; horizontal correctness comes from the mask
_PAD_W_EXTRA = 24  # left 4 + right 20 (8-alignment spare)
_PAD_H_EXTRA = 8   # top n + bottom (8 - n)


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
    row 1.  ``w_taps`` is (9*c, c), tap (dy,dx) at rows [(3dy+dx)*c:+c].

    The 9 tap matmuls are packed 3-at-a-time along K: taps sharing a dx
    have equal sublane offsets (Mosaic refuses lane-concat across
    mismatched offsets), so each dx group concatenates to one (L, 3c)
    operand.  Small c pads every dot's K to the 128-lane MXU tile — 3
    dots at K=3c waste far fewer MXU passes than 9 at K=c (measured
    1.30x→1.46x on the layer-2 block, 0.6x→1.10x on layer-4;
    tools/bench_c3_blocks.py)."""
    rows = h.shape[0]
    # zero row before (keeps every tap start >= 0) and after (the (dy=2,
    # dx=+1) tap of the last row reads one element past rows*wp — a
    # cropped pad column, but the slice must stay in bounds)
    zrow = jnp.zeros((1, wp, c), jnp.bfloat16)
    h25 = jnp.concatenate([zrow, h, zrow], axis=0).reshape(
        (rows + 2) * wp, c)
    L = rows_out * wp
    taps = []
    for dy in range(3):
        for dx in range(3):
            s = (dy + 1) * wp + dx - 1
            taps.append(jax.lax.slice(h25, (s, 0), (s + L, c)))
    acc = jnp.zeros((L, c), jnp.float32)
    for dx in range(3):
        hp = jnp.concatenate([taps[3 * dy + dx] for dy in range(3)],
                             axis=1)  # (L, 3c), offsets match
        wt = jnp.concatenate(
            [jax.lax.slice(w_taps, ((dy * 3 + dx) * c, 0),
                           ((dy * 3 + dx + 1) * c, c))
             for dy in range(3)], axis=0)  # (3c, c)
        acc = acc + jax.lax.dot_general(
            hp, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return _silu(acc * scale + shift).astype(jnp.bfloat16)


def _kernel(n, shortcut, h_img, w_img, wp, c2, c_, cp, *refs):
    (x_hbm, mask_ref, w1, s1), rest = refs[:4], refs[4:]
    bots, rest = rest[:4 * n], rest[4 * n:]
    w2, s2, w3a, w3b, s3, out_ref, xb, sem = rest

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

    R = _ROWS_OUT
    # cv1 on all rows; cur covers abs slab rows [0, ROWS_IN)
    cur = _conv1x1(xf, w1[...], s1[0:1], s1[1:2]).reshape(_ROWS_IN, wp, c_)
    off = 0
    rows_cur = _ROWS_IN
    for k in range(1, n + 1):
        wba, sba, wbt, sbt = bots[4 * (k - 1):4 * k]
        rows_out = R + 2 * (n - k)  # abs rows [k, k + rows_out)
        h = _conv1x1(cur.reshape(rows_cur * wp, c_), wba[...],
                     sba[0:1], sba[1:2]).reshape(rows_cur, wp, c_)
        h = h * mask[off:off + rows_cur]
        y3 = _conv3x3(h, wbt[...], sbt[0:1], sbt[1:2], rows_out, wp, c_)
        if shortcut:
            y3 = cur[1:1 + rows_out].reshape(rows_out * wp, c_) + y3
        cur = y3.astype(jnp.bfloat16).reshape(rows_out, wp, c_)
        off += 1
        rows_cur = rows_out
    # cur covers abs rows [n, n + R) == the output rows (pad_top = n)

    # cv2 on abs rows n..n+R
    c2c = _conv1x1(x[n:n + R].reshape(R * wp, cp), w2[...], s2[0:1], s2[1:2])

    # cv3 on concat(cur, c2c) — expressed as two matmuls (lane concat at c_
    # is not 128-aligned)
    y = jax.lax.dot_general(cur.reshape(R * wp, c_), w3a[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(c2c, w3b[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = _silu(y * s3[0:1] + s3[1:2]).astype(jnp.bfloat16)
    y = y.reshape(_ROWS_OUT, wp, c2)
    out_ref[...] = y[:, _PAD_LEFT:_PAD_LEFT + w_img, :][None]


def fold_conv_bn(kernel, scale, bias, mean, var, eps: float = 1e-3):
    """(k,k,ci,co) conv + BN stats → (w bf16, scale/shift f32 (2, co))."""
    g = scale / np.sqrt(np.asarray(var, np.float64) + eps)
    sc = np.asarray(g, np.float32)
    sh = np.asarray(bias - mean * g, np.float32)
    return (np.asarray(kernel, np.float32).astype(jnp.bfloat16),
            np.stack([sc, sh]).astype(np.float32))


def fold_c3_params(params, stats, n: int = 2, eps: float = 1e-3):
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
    bots = []
    for bi in range(n):
        bp, bs = params[f"Bottleneck_{bi}"], stats[f"Bottleneck_{bi}"]
        wa, ssa = fold(bp["ConvBnAct_0"], bs["ConvBnAct_0"])
        wt_raw = bp["ConvBnAct_1"]["Conv_0"]["kernel"]
        _, sst = fold(bp["ConvBnAct_1"], bs["ConvBnAct_1"])
        out[f"wb{bi+1}a"], out[f"sb{bi+1}a"] = np.asarray(wa)[0, 0], ssa
        out[f"wb{bi+1}t"], out[f"sb{bi+1}t"] = taps(wt_raw), sst
        bots += [out[f"wb{bi+1}a"], out[f"sb{bi+1}a"],
                 out[f"wb{bi+1}t"], out[f"sb{bi+1}t"]]
    out["bots"] = tuple(bots)
    w, ss = fold(params["ConvBnAct_1"], stats["ConvBnAct_1"])
    out["w2"], out["s2"] = np.asarray(w)[0, 0], ss
    w3, ss3 = fold(params["ConvBnAct_2"], stats["ConvBnAct_2"])
    w3 = np.asarray(w3)[0, 0]  # (2*c_, c2)
    c_ = w3.shape[0] // 2
    out["w3a"], out["w3b"], out["s3"] = w3[:c_], w3[c_:], ss3
    return out


@functools.partial(jax.jit, static_argnames=("n", "shortcut"))
def fused_c3(x, w1, s1, bots, w2, s2, w3a, w3b, s3, *, n: int = 2,
             shortcut: bool = True):
    """Fused C3(c1, c2, n, shortcut, e=0.5, g=1) forward.

    x: (B, H, W, c1) bf16, H % 8 == 0, W % 8 == 0, 1 <= n <= 4.
    ``bots`` is a flat tuple (wb_a, sb_a, wb_taps, sb_taps) per
    bottleneck.  Returns (B, H, W, c2) where c2 = w3a.shape[1].
    """
    if not 1 <= n <= 4:
        raise ValueError(f"fused_c3 supports 1 <= n <= 4, got {n}")
    B, H, W, c1 = x.shape
    if H % _ROWS_OUT or W % 8:
        raise ValueError(f"fused_c3 needs H % {_ROWS_OUT} == 0 and "
                         f"W % 8 == 0, got {H}x{W}")
    c_ = w3a.shape[0]
    c2 = w3a.shape[1]
    wp = W + _PAD_W_EXTRA
    # channel-pad the input (and the two convs that read it) to a whole
    # number of 128-lane tiles: the manual HBM→VMEM DMA slices must be
    # tile-aligned in the minor dim; zero weight rows keep results exact
    cp = -(-c1 // 128) * 128
    pad_top = n
    xp = jnp.pad(x, ((0, 0), (pad_top, _PAD_H_EXTRA - pad_top),
                     (_PAD_LEFT, _PAD_W_EXTRA - _PAD_LEFT), (0, cp - c1)))
    w1 = jnp.pad(jnp.asarray(w1), ((0, cp - c1), (0, 0)))
    w2 = jnp.pad(jnp.asarray(w2), ((0, cp - c1), (0, 0)))

    # per-block-row in-image mask (shape-constant → XLA bakes it)
    n_i = H // _ROWS_OUT
    ri = np.arange(n_i)[:, None, None, None] * _ROWS_OUT \
        + np.arange(_ROWS_IN)[None, :, None, None]
    wi = np.arange(wp)[None, None, :, None]
    mask = ((ri >= pad_top) & (ri < pad_top + H)
            & (wi >= _PAD_LEFT) & (wi < _PAD_LEFT + W))
    mask = jnp.asarray(
        np.broadcast_to(mask, (n_i, _ROWS_IN, wp, c_)), jnp.bfloat16)

    kern = functools.partial(_kernel, n, shortcut, H, W, wp, c2, c_, cp)
    interpret = jax.default_backend() != "tpu"
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, n_i),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, _ROWS_IN, wp, c_),
                               lambda b, i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vspec() for _ in range(7 + 4 * n)],
        out_specs=pl.BlockSpec((1, _ROWS_OUT, W, c2),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c2), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((_ROWS_IN, wp, cp), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp.astype(jnp.bfloat16), mask,
      jnp.asarray(w1), jnp.asarray(s1),
      *[jnp.asarray(a) for a in bots],
      jnp.asarray(w2), jnp.asarray(s2), jnp.asarray(w3a), jnp.asarray(w3b),
      jnp.asarray(s3))
