"""Fused stride-2 downsample Conv(3x3, s=2) + BN + SiLU Pallas kernel.

The backbone's downsample convs (reference models/yolov5*.yaml rows 1/3/5/7,
models/common.py:37-49 ``Conv(c, 3, 2)``) sit between C3 blocks.  Once the
adjacent C3 blocks run as Pallas kernels (ops/pallas/c3_kernel.py), a stock
XLA conv between two custom calls pays a layout round-trip on BOTH sides —
the measured reason the layer-4 fused C3 regressed e2e despite a 1.10x
isolated win.  Running the downsample as a Pallas kernel too makes the
fused region contiguous (stem → L1 → C3 → down → C3) so no XLA layout
choice ever materialises between them.

Design (same Mosaic playbook as stem_kernel._kernel_l1):
- grid ``(B, H2 // _ROWS)``; each program emits ``_ROWS`` output rows from
  ``2*_ROWS`` input rows.  A stride-2 3x3 needs ONE extra row above the
  block (rows ``2*oy - 1 .. 2*oy + 1`` stay inside it otherwise), fetched
  as a second input with an 8-row block at index ``4*p - 1`` — 1.25x read
  amplification instead of the 3x a full prev/next pair would cost.
- SAME-pad parity: out-of-image halo rows are zero-masked via a row-index
  mask (float {0,1} — Mosaic has no i1 vectors).
- Column stride-2: the bf16 slab is staged into an f32 VMEM scratch and
  read back as strided loads (Mosaic strided vector loads are 32-bit only;
  no sublane→lane shape casts exist to "reshape" pairs into lanes).
- The 9 taps are packed 3-per-dot along K by shared dx (equal sublane
  offsets), so each output row is 3 MXU dots of ``(W/2, 3*Ci) x (3*Ci,
  Co)`` — small-Ci lane padding wastes 3 dot passes instead of 9
  (the packing measured 1.46x on the fused C3, c3_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 16  # output rows per program (input block = 32 rows)


def shape_eligible(H: int, W: int, ci: int) -> bool:
    """True iff ``fused_down`` takes the Pallas path for an (H, W, ci)
    input — the single source of the kernel's shape constraints (the
    module-level gate in models/layers.py derives from this so the two
    cannot desync if ``_ROWS`` changes).

    ci > 128 spans multiple lane tiles in the scratch memref — Mosaic's
    strided loads require a single-tile minor dim ("last dim size is not
    128 in original base memref", measured on v5e).
    """
    return H % (2 * _ROWS) == 0 and W % 16 == 0 and ci <= 128


def _kernel(ci, co, x_halo, x_cur, w_ref, s_ref, out_ref, scr):
    """One program: _ROWS output rows of one image.

    x_cur: (1, 2*_ROWS, W, ci) bf16 — input rows [2*_ROWS*p, 2*_ROWS*(p+1))
    x_halo: (1, 8, W, ci) bf16 — input rows [2*_ROWS*p - 8, 2*_ROWS*p)
        (clamped at p=0; its out-of-image row is zero-masked).
    w_ref: (9*ci, co) bf16 — tap (dy, dx) at rows [(3*dy+dx)*ci : +ci]
    s_ref: (2, co) f32 — folded BN scale/shift
    out_ref: (1, _ROWS, W/2, co)
    scr: ((2*_ROWS+8)*W, ci) f32 — slab staged for strided column reads
    """
    R = _ROWS
    p = pl.program_id(1)
    W = x_cur.shape[2]
    W2 = W // 2
    nprog = pl.num_programs(1)

    # (2R+8, W, ci): slab row l is input row g = 2*R*p + l - 8
    xcat = jnp.concatenate([x_halo[0], x_cur[0]], axis=0)

    # stage in f32 (strided VMEM loads are 32-bit only), zeroing
    # out-of-image rows in the same pass: slab row l holds input row
    # g = 2*R*p + l - 8, invalid iff g < 0 (the p=0 halo clamp garbage;
    # g >= H never happens: max g = 2*R*(p+1) - 1 <= H - 1).  Mask at the
    # flattened 2-D scratch shape — a bf16 3-D minor-dim broadcast fails
    # Mosaic ("insertion of minor dim only supported for 32-bit types",
    # measured on v5e), and Mosaic only lowers 2-D iota anyway.
    del nprog
    scr_rows = (2 * R + 8) * W
    loc = jax.lax.broadcasted_iota(jnp.int32, (scr_rows, 1), 0)
    mask = jnp.where(loc >= (8 - 2 * R * p) * W, 1.0, 0.0)
    scr[...] = xcat.reshape(scr_rows, ci).astype(jnp.float32) * mask

    w = w_ref[...]
    ss = s_ref[...]
    zodd = jnp.zeros((1, ci), jnp.bfloat16)
    for oy in range(R):
        # taps for out row oy: input rows 2*oy + d - 1, d in 0..2
        # → slab rows 2*oy + d + 7
        taps = {0: [], 1: [], 2: []}
        for d in range(3):
            base = (2 * oy + d + 7) * W
            even = scr[base: base + W: 2, :].astype(jnp.bfloat16)
            odd = scr[base + 1: base + W: 2, :].astype(jnp.bfloat16)
            # dx=0 reads input col 2*ox - 1 = odd col of pair ox-1
            sh = jnp.concatenate([zodd, odd[:-1]], axis=0)
            taps[0].append(sh)
            taps[1].append(even)
            taps[2].append(odd)
        acc = jnp.zeros((W2, co), jnp.float32)
        for dx in range(3):
            hp = jnp.concatenate(taps[dx], axis=1)  # (W2, 3*ci)
            wt = jnp.concatenate(
                [w[(3 * d + dx) * ci: (3 * d + dx + 1) * ci]
                 for d in range(3)], axis=0)  # (3*ci, co)
            acc = acc + jax.lax.dot_general(
                hp, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = acc * ss[0:1] + ss[1:2]
        y = y * jax.nn.sigmoid(y)  # SiLU
        out_ref[0, oy] = y.astype(out_ref.dtype)


def _stage_slab(x_halo, x_cur, scr, ci):
    """Stage the program's input slab (halo + block) into the f32 scratch
    with out-of-image rows zeroed — shared by the fwd and wgrad kernels."""
    R = _ROWS
    p = pl.program_id(1)
    W = x_cur.shape[2]
    xcat = jnp.concatenate([x_halo[0], x_cur[0]], axis=0)
    scr_rows = (2 * R + 8) * W
    loc = jax.lax.broadcasted_iota(jnp.int32, (scr_rows, 1), 0)
    mask = jnp.where(loc >= (8 - 2 * R * p) * W, 1.0, 0.0)
    scr[...] = xcat.reshape(scr_rows, ci).astype(jnp.float32) * mask


def _row_taps(scr, oy, W, ci):
    """The 3 dx-packed tap groups of output row ``oy`` read back from the
    staged slab as strided loads (same packing as the fwd kernel)."""
    zodd = jnp.zeros((1, ci), jnp.bfloat16)
    taps = {0: [], 1: [], 2: []}
    for d in range(3):
        base = (2 * oy + d + 7) * W
        even = scr[base: base + W: 2, :].astype(jnp.bfloat16)
        odd = scr[base + 1: base + W: 2, :].astype(jnp.bfloat16)
        sh = jnp.concatenate([zodd, odd[:-1]], axis=0)
        taps[0].append(sh)
        taps[1].append(even)
        taps[2].append(odd)
    return taps


def _kernel_raw(ci, co, x_halo, x_cur, w_ref, out_ref, scr):
    """Train-mode forward: raw pre-BN conv rows (no scale/shift/SiLU)."""
    R = _ROWS
    W = x_cur.shape[2]
    W2 = W // 2
    _stage_slab(x_halo, x_cur, scr, ci)
    w = w_ref[...]
    for oy in range(R):
        taps = _row_taps(scr, oy, W, ci)
        acc = jnp.zeros((W2, co), jnp.float32)
        for dx in range(3):
            hp = jnp.concatenate(taps[dx], axis=1)  # (W2, 3*ci)
            wt = jnp.concatenate(
                [w[(3 * d + dx) * ci: (3 * d + dx + 1) * ci]
                 for d in range(3)], axis=0)  # (3*ci, co)
            acc = acc + jax.lax.dot_general(
                hp, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, oy] = acc.astype(out_ref.dtype)


def _wgrad_kernel(ci, co, x_halo, x_cur, dz_ref, out_ref, scr):
    """Train-mode weight grad: reuses the fwd's staged-slab tap packing.

    out_ref: (3, 3*ci, co) f32 — ``out[dx, d*ci + c, k] = dW[d, dx, c, k]``
    (reassembled to the (9*ci, co) taps layout outside the kernel);
    sequential-grid accumulation across all (b, p) programs."""
    R = _ROWS
    W = x_cur.shape[2]
    _stage_slab(x_halo, x_cur, scr, ci)
    accs = [jnp.zeros((3 * ci, co), jnp.float32) for _ in range(3)]
    for oy in range(R):
        taps = _row_taps(scr, oy, W, ci)
        dzr = dz_ref[0, oy].astype(jnp.bfloat16)  # (W2, co)
        for dx in range(3):
            hp = jnp.concatenate(taps[dx], axis=1)  # (W2, 3*ci)
            accs[dx] = accs[dx] + jax.lax.dot_general(
                hp, dzr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for dx in range(3):
        out_ref[dx] += accs[dx]


def _conv_raw_xla(x, w_taps):
    """Plain s2 SAME conv, raw output (differentiable fallback)."""
    ci = x.shape[-1]
    co = w_taps.shape[1]
    w = w_taps.reshape(3, 3, ci, co).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _down_train_p(x, w_taps):
    z, _ = _down_train_p_fwd(x, w_taps)
    return z


def _down_train_p_fwd(x, w_taps):
    B, H, W, ci = x.shape
    co = w_taps.shape[1]
    nprog = H // (2 * _ROWS)

    def idx_halo(b, p):
        return (b, jnp.maximum((_ROWS // 4) * p - 1, 0), 0, 0)

    def idx_cur(b, p):
        return (b, p, 0, 0)

    xb = x.astype(jnp.bfloat16)
    z = pl.pallas_call(
        functools.partial(_kernel_raw, ci, co),
        grid=(B, nprog),
        in_specs=[
            pl.BlockSpec((1, 8, W, ci), idx_halo, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * _ROWS, W, ci), idx_cur,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * ci, co), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _ROWS, W // 2, co), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, co),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM(((2 * _ROWS + 8) * W, ci), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xb, xb, jnp.asarray(w_taps, jnp.bfloat16))
    return z, (xb, w_taps)


def _down_train_p_bwd(res, dz):
    x, w_taps = res
    B, H, W, ci = x.shape
    co = w_taps.shape[1]
    nprog = H // (2 * _ROWS)

    def idx_halo(b, p):
        return (b, jnp.maximum((_ROWS // 4) * p - 1, 0), 0, 0)

    def idx_cur(b, p):
        return (b, p, 0, 0)

    dw3 = pl.pallas_call(
        functools.partial(_wgrad_kernel, ci, co),
        grid=(B, nprog),
        in_specs=[
            pl.BlockSpec((1, 8, W, ci), idx_halo, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * _ROWS, W, ci), idx_cur,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, W // 2, co), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3 * ci, co), lambda b, p: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3 * ci, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM(((2 * _ROWS + 8) * W, ci), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, x, dz)
    # out[dx, d*ci+c, k] → taps layout row (3*d+dx)*ci + c
    dw = (dw3.reshape(3, 3, ci, co).transpose(1, 0, 2, 3)
          .reshape(9 * ci, co).astype(w_taps.dtype))
    # igrad via XLA's own conv transpose (measured near its byte floor —
    # the fwd/wgrad layout taxes are the Pallas wins, not this)
    _, pullback = jax.vjp(lambda xx: _conv_raw_xla(xx, w_taps), x)
    dx, = pullback(dz)
    return (dx.astype(x.dtype), dw)


_down_train_p.defvjp(_down_train_p_fwd, _down_train_p_bwd)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def fused_down_train(x, w_taps, use_pallas: bool | None = None):
    """Train-mode raw downsample conv (pre-BN, no activation).

    Same taps layout as :func:`fused_down`; differentiable in ``x`` and
    ``w_taps``.  On TPU the forward and weight-grad run as Pallas kernels
    on the staged-slab layout; the input grad stays on XLA's transposed
    conv.  Returns ``(B, H/2, W/2, co)`` bf16.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, H, W, ci = x.shape
    if not use_pallas or not shape_eligible(H, W, ci):
        return _conv_raw_xla(x, w_taps)
    return _down_train_p(x, w_taps)


def _down_xla(x, w_taps, ss):
    """Fallback: same folded math via a plain XLA conv (CPU tests,
    ineligible shapes)."""
    ci = x.shape[-1]
    co = w_taps.shape[1]
    w = w_taps.reshape(3, 3, ci, co).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * ss[0].reshape(1, 1, 1, co) + ss[1].reshape(1, 1, 1, co)
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def fused_down(x, w_taps, ss, use_pallas: bool | None = None):
    """Fused Conv(co, 3, 2) + BN + SiLU (BN folded to scale/shift).

    Args:
        x: ``(B, H, W, ci)`` bf16, ``H % (2*_ROWS) == 0``, ``W % 16 == 0``.
        w_taps: ``(9*ci, co)`` bf16 — tap (dy, dx) at rows
            ``[(3*dy+dx)*ci : +ci]`` (``c3_kernel.fold_c3_params``' taps
            layout), BN scale NOT folded into the weights.
        ss: ``(2, co)`` f32 — ``fold_conv_bn`` scale/shift.
        use_pallas: force kernel on/off (default: auto — kernel on TPU,
            interpret under tests, XLA fallback for ineligible shapes).

    Returns:
        ``(B, H/2, W/2, co)`` bf16.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, H, W, ci = x.shape
    co = w_taps.shape[1]
    if not use_pallas or not shape_eligible(H, W, ci):
        return _down_xla(x, w_taps, ss)
    nprog = H // (2 * _ROWS)

    def idx_halo(b, p):
        # 8-row blocks: rows [2*_ROWS*p - 8, 2*_ROWS*p), clamped at p=0
        return (b, jnp.maximum((_ROWS // 4) * p - 1, 0), 0, 0)

    def idx_cur(b, p):
        return (b, p, 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, ci, co),
        grid=(B, nprog),
        in_specs=[
            pl.BlockSpec((1, 8, W, ci), idx_halo, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * _ROWS, W, ci), idx_cur,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * ci, co), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _ROWS, W // 2, co), lambda b, p: (b, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, co),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM(((2 * _ROWS + 8) * W, ci), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
      jnp.asarray(w_taps, jnp.bfloat16), jnp.asarray(ss, jnp.float32))
