"""Stat-carrying fused train passes — the TPU-native train path for the
high-resolution low-channel region (stem → down1 → C3 → down2 of
yolov5m@1024; reference semantics models/common.py:37-138).

Why: the train step is HBM-bytes-bound and measurement localizes the
off-floor cost to this region (tools/bench_train_convs2.py: conv bwd sums
to ~3.5 of the measured 6.4 ms/img; tools/bench_glue.py: BN/SiLU backward
glue is 0.50 ms/img at the stem and ~0.55 across the 256² C3 convs, ~0
elsewhere).  Exact train-mode BatchNorm forces an HBM round-trip between
convs (batch statistics are a global reduction), so one fused mega-block
is impossible — the optimal structure is a chain of passes, each reading
one activation tensor and writing one:

    z_out, s1, s2 = P(z_in, g, b, w)
      y     = silu(z_in * g + b)      # the PREVIOUS conv's BN+SiLU
      z_out = conv(y)                 # 1x1 / 3x3, stride 1 / 2
      s1, s2 = per-channel sums of z_out and z_out²   (f32, grid-accum)

The per-channel (g, b) are finalized between passes in XLA from the
producing pass's (s1, s2) — tiny vector math.  Because the statistics
enter each pass as DIFFERENTIABLE inputs, jax composes the exact
BatchNorm backward across the chain automatically: the classic dμ/dσ²
reduction terms arrive through the (ds1, ds2) cotangents.

VJP of P, given (dz_out, ds1, ds2):
    dz_eff = dz_out + ds1 + 2·z_out·ds2          (per-channel broadcast)
    t      = conv_igrad(dz_eff, w)               (transposed / tap-flipped)
    dα     = t · silu'(α),   α = z_in·g + b
    dz_in  = dα · g
    dg     = Σ dα·z_in,  db = Σ dα               (per channel, grid-accum)
    dw     = wgrad(y, dz_eff)                    (grid-accum)

Layout/Mosaic idioms follow ops/pallas/down_kernel.py: unpadded
(B, H, W, c) bf16 storage, channel-pad to 128 only for DMA blocks, row
halos as extra 8-row BlockSpec inputs with clamped index maps + validity
masks, column edges via per-row shift vectors (never wp padding), f32
accumulators, {0,1} float masks, 2-D iota only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 16  # rows of the pass OUTPUT grid per program


def _interpret():
    return jax.default_backend() != "tpu"


def _silu_f32(a):
    return a * jax.nn.sigmoid(a)


def _dsilu_f32(a):
    s = jax.nn.sigmoid(a)
    return s * (1.0 + a * (1.0 - s))


def _cpad(c: int) -> int:
    return -(-c // 128) * 128


def _pad_c(x, cp):
    c = x.shape[-1]
    return x if c == cp else jnp.pad(x, [(0, 0)] * (x.ndim - 1) +
                                     [(0, cp - c)])


# ---------------------------------------------------------------------------
# finalize: (s1, s2) sums → per-channel scale/shift for the NEXT pass
# ---------------------------------------------------------------------------


def finalize_gb(s1, s2, gamma, beta, n: int, eps: float = 1e-3):
    """(Σz, Σz², γ, β) → (g, b) with y = silu(z·g + b) ≡ BN+SiLU.

    Differentiable: grads flow back into (s1, s2) — the producing pass's
    stat outputs — giving the exact batch-stat backward through the
    pass chain.  Also returns (mean, var) for running-stat updates."""
    mean = s1 / n
    var = s2 / n - mean * mean
    g = gamma * jax.lax.rsqrt(var + eps)
    b = beta - mean * g
    return g, b, mean, var


# ---------------------------------------------------------------------------
# 1x1 grouped pass
# ---------------------------------------------------------------------------
#
# Static pass structure:
#   inputs:  tuple of tensors (B, H, W, ci), each with ns flag (True →
#            apply silu(z·g+b), False → use as-is, g/b ignored)
#   groups:  tuple of tuples of input indices; each group's (activated)
#            members are summed → the group value (all members share ci)
#   outs:    tuple of tuples of (group_idx, weight_idx); output o =
#            Σ_k group[g_k] @ w[w_k]
# Weights are (ci, co) f32/bf16.  Every output gets (s1, s2).


def _k1x1(n_in, ns_flags, groups, outs, n_w, *refs):
    zs = refs[:n_in]
    gbs = refs[n_in:2 * n_in]
    ws = refs[2 * n_in:2 * n_in + n_w]
    n_out = len(outs)
    o_refs = refs[2 * n_in + n_w:2 * n_in + n_w + n_out]
    st_refs = refs[2 * n_in + n_w + n_out:]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    gvals = []
    for members in groups:
        acc = None
        for ii in members:
            z = zs[ii][0]  # (R, W, ci)
            R, W, ci = z.shape
            zf = z.reshape(R * W, ci).astype(jnp.float32)
            if ns_flags[ii]:
                y = _silu_f32(zf * gbs[ii][0:1] + gbs[ii][1:2])
            else:
                y = zf
            acc = y if acc is None else acc + y
        gvals.append(acc.astype(jnp.bfloat16))

    for oi, pairs in enumerate(outs):
        zo = None
        for gidx, widx in pairs:
            d = jax.lax.dot_general(
                gvals[gidx], ws[widx][...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            zo = d if zo is None else zo + d
        co = zo.shape[-1]
        _, R, W, _ = o_refs[oi].shape
        o_refs[oi][...] = zo.astype(jnp.bfloat16).reshape(1, R, W, co)

        @pl.when(first)
        def _init(st=st_refs[oi]):
            st[...] = jnp.zeros_like(st)

        st_refs[oi][0, :] += jnp.sum(zo, axis=0)
        st_refs[oi][1, :] += jnp.sum(zo * zo, axis=0)


def _k1x1_bwd(n_in, ns_flags, groups, outs, n_w, cos, *refs):
    """Backward of the grouped 1x1 pass.

    refs: [z_i]*n_in [gb_i]*n_in [w]*n_w [z_out_o]*n_out [dz_out_o]*n_out
          [dstat_o]*n_out  →  outputs: [dz_i]*n_in [dw]*n_w (accum)
          [dgb_i]*n_in (accum (2, ci))
    dstat_o: (2, co) f32 — (ds1, ds2) cotangents of the stat sums.
    """
    n_out = len(outs)
    zs = refs[:n_in]
    gbs = refs[n_in:2 * n_in]
    ws = refs[2 * n_in:2 * n_in + n_w]
    p = 2 * n_in + n_w
    zouts = refs[p:p + n_out]
    dzouts = refs[p + n_out:p + 2 * n_out]
    dstats = refs[p + 2 * n_out:p + 3 * n_out]
    q = p + 3 * n_out
    dz_refs = refs[q:q + n_in]
    dw_refs = refs[q + n_in:q + n_in + n_w]
    dgb_refs = refs[q + n_in + n_w:]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init_accums():
        for r in list(dw_refs) + list(dgb_refs):
            r[...] = jnp.zeros_like(r)

    # effective output cotangents (stat terms folded in)
    dzeffs = []
    for oi in range(n_out):
        zo = zouts[oi][0]
        R, W, co = zo.shape
        zof = zo.reshape(R * W, co).astype(jnp.float32)
        dzf = dzouts[oi][0].reshape(R * W, co).astype(jnp.float32)
        ds = dstats[oi]
        dzeffs.append(
            (dzf + ds[0:1] + 2.0 * zof * ds[1:2]).astype(jnp.bfloat16))

    # group values (recomputed activations) and per-group cotangents
    gvals = []
    acts = {}
    for members in groups:
        acc = None
        for ii in members:
            z = zs[ii][0]
            R, W, ci = z.shape
            zf = z.reshape(R * W, ci).astype(jnp.float32)
            if ns_flags[ii]:
                a = zf * gbs[ii][0:1] + gbs[ii][1:2]
                y = _silu_f32(a)
                acts[ii] = (zf, a)
            else:
                y = zf
                acts[ii] = (zf, None)
            acc = y if acc is None else acc + y
        gvals.append(acc.astype(jnp.bfloat16))

    # dw (accum) and group cotangents t_g = Σ_o dz_eff_o @ w^T
    tgs = [None] * len(groups)
    for oi, pairs in enumerate(outs):
        for gidx, widx in pairs:
            dw = jax.lax.dot_general(
                gvals[gidx], dzeffs[oi], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_refs[widx][...] += dw
            t = jax.lax.dot_general(
                dzeffs[oi], ws[widx][...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            tgs[gidx] = t if tgs[gidx] is None else tgs[gidx] + t

    # per-input cotangents + dg/db accums
    for gidx, members in enumerate(groups):
        t = tgs[gidx]
        for ii in members:
            zf, a = acts[ii]
            if ns_flags[ii]:
                da = t * _dsilu_f32(a)
                dz = da * gbs[ii][0:1]
                dgb_refs[ii][0, :] += jnp.sum(da * zf, axis=0)
                dgb_refs[ii][1, :] += jnp.sum(da, axis=0)
            else:
                dz = t

            _, R, W, ci = dz_refs[ii].shape
            # an input may appear in several groups of ONE pass only if
            # the caller lists it once per group; cross-pass reuse is
            # summed by jax outside
            dz_refs[ii][...] = dz.astype(jnp.bfloat16).reshape(1, R, W, ci)


def _pass1x1_meta(z_ins, ns_flags, groups, outs, ws):
    B, H, W, _ = z_ins[0].shape
    n_in, n_w = len(z_ins), len(ws)
    cos = tuple(w.shape[1] for w in ws)
    out_cos = tuple(cos[pairs[0][1]] for pairs in outs)
    return B, H, W, n_in, n_w, out_cos


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def pass_1x1(ns_flags, groups, outs, z_ins, gbs, ws):
    """Grouped normalize+SiLU → 1x1 conv pass (see module docstring).

    z_ins: tuple of (B, H, W, ci) bf16; gbs: tuple of (2, ci) f32;
    ws: tuple of (ci, co) weights.  Returns (z_outs tuple, stats tuple of
    (2, co) f32 [Σz, Σz²])."""
    z, st = _pass1x1_fwd(ns_flags, groups, outs, z_ins, gbs, ws)[0]
    return z, st


def _pass1x1_fwd(ns_flags, groups, outs, z_ins, gbs, ws):
    B, H, W, n_in, n_w, out_cos = _pass1x1_meta(z_ins, ns_flags, groups,
                                                outs, ws)
    n_out = len(outs)
    grid = (B, H // _ROWS)
    in_specs = (
        [pl.BlockSpec((1, _ROWS, W, z.shape[-1]),
                      lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
         for z in z_ins]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_in + n_w)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((B, H, W, co), jnp.bfloat16)
         for co in out_cos]
        + [jax.ShapeDtypeStruct((2, co), jnp.float32) for co in out_cos]
    )
    out_specs = (
        [pl.BlockSpec((1, _ROWS, W, co), lambda b, i: (b, i, 0, 0),
                      memory_space=pltpu.VMEM) for co in out_cos]
        + [pl.BlockSpec((2, co), lambda b, i: (0, 0),
                        memory_space=pltpu.VMEM) for co in out_cos]
    )
    res = pl.pallas_call(
        functools.partial(_k1x1, n_in, ns_flags, groups, outs, n_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*[z.astype(jnp.bfloat16) for z in z_ins],
      *[jnp.asarray(g, jnp.float32) for g in gbs],
      *[jnp.asarray(w, jnp.bfloat16) for w in ws])
    z_outs = tuple(res[:n_out])
    stats = tuple(res[n_out:])
    return ((z_outs, stats),
            (tuple(z_ins), tuple(gbs), tuple(ws), z_outs))


def _pass1x1_bwd(ns_flags, groups, outs, saved, cot):
    z_ins, gbs, ws, z_outs = saved
    dz_outs, dstats = cot
    n_in, n_w, n_out = len(z_ins), len(ws), len(z_outs)
    B, H, W, _ = z_ins[0].shape
    grid = (B, H // _ROWS)

    blk = lambda c: pl.BlockSpec((1, _ROWS, W, c),
                                 lambda b, i: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    vfull = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    accspec = lambda r, c: pl.BlockSpec((r, c), lambda b, i: (0, 0),
                                        memory_space=pltpu.VMEM)

    cis = [z.shape[-1] for z in z_ins]
    cos = [z.shape[-1] for z in z_outs]

    # replace None cotangents (unused outputs) with zeros
    dz_outs = tuple(
        jnp.zeros_like(z_outs[i]) if dz_outs[i] is None else dz_outs[i]
        for i in range(n_out))
    dstats = tuple(
        jnp.zeros((2, cos[i]), jnp.float32) if dstats[i] is None
        else dstats[i] for i in range(n_out))

    res = pl.pallas_call(
        functools.partial(_k1x1_bwd, n_in, ns_flags, groups, outs, n_w,
                          tuple(cos)),
        grid=grid,
        in_specs=([blk(c) for c in cis]
                  + [vfull() for _ in range(n_in + n_w)]
                  + [blk(c) for c in cos]          # z_out
                  + [blk(c) for c in cos]          # dz_out
                  + [vfull() for _ in range(n_out)]),  # dstats
        out_specs=([blk(c) for c in cis]
                   + [accspec(*ws[i].shape) for i in range(n_w)]
                   + [accspec(2, c) for c in cis]),
        out_shape=([jax.ShapeDtypeStruct((B, H, W, c), jnp.bfloat16)
                    for c in cis]
                   + [jax.ShapeDtypeStruct(ws[i].shape, jnp.float32)
                      for i in range(n_w)]
                   + [jax.ShapeDtypeStruct((2, c), jnp.float32)
                      for c in cis]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*[z.astype(jnp.bfloat16) for z in z_ins],
      *[jnp.asarray(g, jnp.float32) for g in gbs],
      *[jnp.asarray(w, jnp.bfloat16) for w in ws],
      *z_outs, *[d.astype(jnp.bfloat16) for d in dz_outs], *dstats)

    dz_ins = tuple(res[:n_in])
    dws = tuple(res[n_in:n_in + n_w])
    dgbs = tuple(res[n_in + n_w:])
    # non-ns inputs get no (g, b) gradient
    dgbs = tuple(
        dgbs[i] if ns_flags[i] else jnp.zeros_like(dgbs[i])
        for i in range(n_in))
    dws = tuple(dw.astype(ws[i].dtype) for i, dw in enumerate(dws))
    return (dz_ins, dgbs, dws)


def _pass1x1_fwd_rule(ns_flags, groups, outs, z_ins, gbs, ws):
    (z, st), saved = _pass1x1_fwd(ns_flags, groups, outs, z_ins, gbs, ws)
    return (z, st), saved


pass_1x1.defvjp(_pass1x1_fwd_rule, _pass1x1_bwd)


# ---------------------------------------------------------------------------
# 3x3 stride-1 pass
# ---------------------------------------------------------------------------
#
# Row halos come from two extra 8-row blocks with clamped index maps (the
# down_kernel trick); out-of-image halo rows are zero-masked by global row
# index.  Column edges are exact via per-row shift vectors.


def _row_shift_taps(yb, r):
    """dx-packed tap operands for output row ``r`` of a (rows, W, c) slab:
    rows r..r+2 are the dy in/out window (caller aligns)."""
    c = yb.shape[-1]
    z1 = jnp.zeros((1, c), jnp.bfloat16)
    taps = {0: [], 1: [], 2: []}
    for dy in range(3):
        row = yb[r + dy]  # (W, c)
        taps[0].append(jnp.concatenate([z1, row[:-1]], axis=0))
        taps[1].append(row)
        taps[2].append(jnp.concatenate([row[1:], z1], axis=0))
    return taps


def _dx_dot(taps, w_ref, ci, co, W):
    acc = jnp.zeros((W, co), jnp.float32)
    for dx in range(3):
        hp = jnp.concatenate(taps[dx], axis=1)  # (W, 3ci)
        wt = jnp.concatenate(
            [w_ref[(3 * d + dx) * ci:(3 * d + dx + 1) * ci]
             for d in range(3)], axis=0)  # (3ci, co)
        acc = acc + jax.lax.dot_general(
            hp, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _row_mask_flat(W: int, H: int, n_rows: int):
    """(n_rows*W, 1) f32 {0,1} mask of in-image slab rows, built on a flat
    2-D iota (a (n_rows, W)→(n_rows*W, 1) reshape is a lane→sublane shape
    cast Mosaic cannot lower).  Slab row r holds global row
    p*_ROWS - 1 + r, so row r is valid iff 1 - p*_ROWS <= r < H+1 - p*_ROWS
    — as flat bounds, f ∈ [lo*W, hi*W)."""
    fl = jax.lax.broadcasted_iota(jnp.int32, (n_rows * W, 1), 0)
    lo = (1 - pl.program_id(1) * _ROWS) * W
    hi = (H + 1 - pl.program_id(1) * _ROWS) * W
    return ((fl >= lo) & (fl < hi)).astype(jnp.float32)


def _ns_slab(zcat, gb, p, H, n_rows):
    """Activate slab rows [7, 7+n_rows) of a (*, W, ci) concat slab with
    out-of-image rows zeroed. Returns (n_rows, W, ci) bf16."""
    W, ci = zcat.shape[1], zcat.shape[2]
    need = jax.lax.slice(zcat, (7, 0, 0), (7 + n_rows, W, ci))
    zf = need.reshape(n_rows * W, ci).astype(jnp.float32)
    y = _silu_f32(zf * gb[0:1] + gb[1:2])
    m = _row_mask_flat(W, H, n_rows)
    return (y * m).astype(jnp.bfloat16).reshape(n_rows, W, ci)


def _mask_slab(dcat, p, H, n_rows):
    """Zero-mask out-of-image rows of slab rows [7, 7+n_rows) (no ns)."""
    W, c = dcat.shape[1], dcat.shape[2]
    need = jax.lax.slice(dcat, (7, 0, 0), (7 + n_rows, W, c))
    f = need.reshape(n_rows * W, c).astype(jnp.float32)
    return (f * _row_mask_flat(W, H, n_rows)).reshape(n_rows, W, c)


def _k3x3s1(H, z_prev, z_cur, z_next, gb, w_ref, out_ref, st_ref):
    R = _ROWS
    zcat = jnp.concatenate([z_prev[0], z_cur[0], z_next[0]], axis=0)
    W, ci = zcat.shape[1], zcat.shape[2]
    co = w_ref.shape[1]
    yb = _ns_slab(zcat, gb, pl.program_id(1), H, R + 2)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        st_ref[...] = jnp.zeros_like(st_ref)

    s1 = jnp.zeros((co,), jnp.float32)
    s2 = jnp.zeros((co,), jnp.float32)
    for r in range(R):
        taps = _row_shift_taps(yb, r)
        acc = _dx_dot(taps, w_ref[...], ci, co, W)
        out_ref[0, r] = acc.astype(jnp.bfloat16)
        s1 = s1 + jnp.sum(acc, axis=0)
        s2 = s2 + jnp.sum(acc * acc, axis=0)
    st_ref[0, :] += s1
    st_ref[1, :] += s2


def _halo_specs(W, c):
    """(prev8, cur, next8) BlockSpecs for a (B, H, W, c) tensor with
    clamped halo index maps (out-of-range halo rows are masked inside)."""
    blocks_per_r = _ROWS // 8

    def idx_prev(b, i):
        return (b, jnp.maximum(blocks_per_r * i - 1, 0), 0, 0)

    def idx_next(b, i):
        return (b, blocks_per_r * (i + 1), 0, 0)  # clamped by caller pad

    return (
        pl.BlockSpec((1, 8, W, c), idx_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _ROWS, W, c), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, W, c), idx_next, memory_space=pltpu.VMEM),
    )


def _next_padded(z):
    """Pad H by one 8-row block of zeros so the next-halo index map never
    leaves the array (the pad rows are also masked in-kernel)."""
    return jnp.pad(z, ((0, 0), (0, 8), (0, 0), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pass_3x3s1(z_in, gb, w_taps):
    """normalize+SiLU → SAME 3x3 stride-1 conv + stat partials.

    z_in (B, H, W, ci) bf16; gb (2, ci) f32; w_taps (9*ci, co);
    Returns (z_out (B, H, W, co) bf16, stats (2, co) f32)."""
    return _p3s1_fwd(z_in, gb, w_taps)[0]


def _p3s1_fwd(z_in, gb, w_taps):
    B, H, W, ci = z_in.shape
    co = w_taps.shape[1]
    zp = _next_padded(z_in.astype(jnp.bfloat16))
    specs = _halo_specs(W, ci)
    out, st = pl.pallas_call(
        functools.partial(_k3x3s1, H),
        grid=(B, H // _ROWS),
        in_specs=[*specs,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, _ROWS, W, co),
                                lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, co), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, co), jnp.bfloat16),
                   jax.ShapeDtypeStruct((2, co), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(zp, zp, zp, jnp.asarray(gb, jnp.float32),
      jnp.asarray(w_taps, jnp.bfloat16))
    return (out, st), (z_in, gb, w_taps, out)


def _xla_conv_bwd(z_in, gb, w_taps, z_out, dz_out, dst, stride: int):
    """XLA-native backward shared by the 3x3 passes: dz_eff fold, conv
    wgrad+igrad via ``jax.vjp`` of a stock conv (the unused primal is
    DCE'd under jit, leaving exactly the stock wgrad/igrad convs), and
    the dα/(dγ, dβ) chain as fused elementwise+reduce.

    The all-Pallas backwards measured SLOWER than stock at the region
    shapes (tools/bench_train_fused.py: down1 +0.79, 3x3s1 +0.39 ms/img
    — halo re-reads of three tensors plus thin per-row MXU dots), while
    the Pallas FORWARDS hold their fusion win — so the VJPs route here.
    """
    B, H, W, ci = z_in.shape
    co = w_taps.shape[1]
    if dst is None:
        dst = jnp.zeros((2, co), jnp.float32)
    if dz_out is None:
        dz_out = jnp.zeros_like(z_out)
    dz_eff = (dz_out.astype(jnp.float32) + dst[0]
              + 2.0 * z_out.astype(jnp.float32) * dst[1]).astype(jnp.bfloat16)
    zf = z_in.astype(jnp.float32)
    a = zf * gb[0] + gb[1]
    y = _silu_f32(a).astype(jnp.bfloat16)
    w4 = jnp.asarray(w_taps, jnp.bfloat16).reshape(3, 3, ci, co)

    def conv(yy, ww):
        return jax.lax.conv_general_dilated(
            yy, ww, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, conv_vjp = jax.vjp(conv, y, w4)
    dy, dw4 = conv_vjp(dz_eff)
    da = dy.astype(jnp.float32) * _dsilu_f32(a)
    dz_in = (da * gb[0]).astype(z_in.dtype)
    dg = jnp.sum(da * zf, axis=(0, 1, 2))
    db = jnp.sum(da, axis=(0, 1, 2))
    dw = dw4.reshape(9 * ci, co).astype(w_taps.dtype)
    return dz_in, jnp.stack([dg, db]), dw


def _p3s1_bwd(saved, cot):
    z_in, gb, w_taps, z_out = saved
    dz_out, dst = cot
    return _xla_conv_bwd(z_in, gb, w_taps, z_out, dz_out, dst, 1)


def _p3s1_fwd_rule(z_in, gb, w_taps):
    out, saved = _p3s1_fwd(z_in, gb, w_taps)
    return out, saved


pass_3x3s1.defvjp(_p3s1_fwd_rule, _p3s1_bwd)


# ---------------------------------------------------------------------------
# 3x3 stride-2 pass (downsample)
# ---------------------------------------------------------------------------
#
# Structure follows ops/pallas/down_kernel.py: grid (B, H2//_ROWS), each
# program emits _ROWS output rows from 2*_ROWS input rows + an 8-row prev
# halo; the slab is staged into an f32 scratch (strided column loads are
# 32-bit only), with normalize+SiLU and the out-of-image row mask applied
# at staging.  The backward runs the wgrad as a Pallas kernel on the same
# staged activations; the input grad (transposed conv) stays on XLA —
# measured near its byte floor (down_kernel.py:285) — with the dα chain
# and (dg, db) reductions as one fused XLA elementwise+reduce.


def _stage_ns_slab(x_halo, x_cur, gb, scr, ci, H):
    """Stage silu(z·g+b) for the (8 + 2R)-row slab into the f32 scratch,
    zeroing out-of-image rows (slab row l ↔ input row 2R·p + l − 8)."""
    R = _ROWS
    p = pl.program_id(1)
    W = x_cur.shape[2]
    zcat = jnp.concatenate([x_halo[0], x_cur[0]], axis=0)
    scr_rows = (2 * R + 8) * W
    zf = zcat.reshape(scr_rows, ci).astype(jnp.float32)
    y = _silu_f32(zf * gb[0:1] + gb[1:2])
    loc = jax.lax.broadcasted_iota(jnp.int32, (scr_rows, 1), 0)
    mask = jnp.where(loc >= (8 - 2 * R * p) * W, 1.0, 0.0)
    # upper bound (row >= H) never occurs: max row = 2R(p+1)-1 <= H-1
    scr[...] = y * mask


def _row_taps_s2(scr, oy, W, ci):
    """dx-packed tap groups for stride-2 output row ``oy`` (strided f32
    scratch loads; down_kernel._row_taps)."""
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


def _k3x3s2(H, ci, co, x_halo, x_cur, gb, w_ref, out_ref, st_ref, scr):
    R = _ROWS
    W = x_cur.shape[2]
    W2 = W // 2
    _stage_ns_slab(x_halo, x_cur, gb, scr, ci, H)
    w = w_ref[...]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        st_ref[...] = jnp.zeros_like(st_ref)

    s1 = jnp.zeros((co,), jnp.float32)
    s2 = jnp.zeros((co,), jnp.float32)
    for oy in range(R):
        taps = _row_taps_s2(scr, oy, W, ci)
        acc = jnp.zeros((W2, co), jnp.float32)
        for dx in range(3):
            hp = jnp.concatenate(taps[dx], axis=1)
            wt = jnp.concatenate(
                [w[(3 * d + dx) * ci:(3 * d + dx + 1) * ci]
                 for d in range(3)], axis=0)
            acc = acc + jax.lax.dot_general(
                hp, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, oy] = acc.astype(jnp.bfloat16)
        s1 = s1 + jnp.sum(acc, axis=0)
        s2 = s2 + jnp.sum(acc * acc, axis=0)
    st_ref[0, :] += s1
    st_ref[1, :] += s2


def _conv_s2_xla(y, w_taps, ci, co):
    w = w_taps.reshape(3, 3, ci, co).astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        y.astype(jnp.bfloat16), w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pass_3x3s2(z_in, gb, w_taps):
    """normalize+SiLU → SAME 3x3 stride-2 conv + stat partials.

    z_in (B, H, W, ci) bf16 (H % 2*_ROWS == 0, W % 16 == 0, ci <= 128);
    gb (2, ci) f32; w_taps (9*ci, co).
    Returns (z_out (B, H/2, W/2, co) bf16, stats (2, co) f32)."""
    return _p3s2_fwd(z_in, gb, w_taps)[0]


def _p3s2_fwd(z_in, gb, w_taps):
    B, H, W, ci = z_in.shape
    co = w_taps.shape[1]
    zb = z_in.astype(jnp.bfloat16)

    def idx_halo(b, p):
        return (b, jnp.maximum((_ROWS // 4) * p - 1, 0), 0, 0)

    out, st = pl.pallas_call(
        functools.partial(_k3x3s2, H, ci, co),
        grid=(B, H // (2 * _ROWS)),
        in_specs=[
            pl.BlockSpec((1, 8, W, ci), idx_halo, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * _ROWS, W, ci), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _ROWS, W // 2, co), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H // 2, W // 2, co),
                                        jnp.bfloat16),
                   jax.ShapeDtypeStruct((2, co), jnp.float32)],
        scratch_shapes=[pltpu.VMEM(((2 * _ROWS + 8) * W, ci), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(zb, zb, jnp.asarray(gb, jnp.float32),
      jnp.asarray(w_taps, jnp.bfloat16))
    return (out, st), (z_in, gb, w_taps, out)


def _p3s2_bwd(saved, cot):
    z_in, gb, w_taps, z_out = saved
    dz_out, dst = cot
    return _xla_conv_bwd(z_in, gb, w_taps, z_out, dz_out, dst, 2)


def _p3s2_fwd_rule(z_in, gb, w_taps):
    out, saved = _p3s2_fwd(z_in, gb, w_taps)
    return out, saved


pass_3x3s2.defvjp(_p3s2_fwd_rule, _p3s2_bwd)
