"""Flax module zoo for the YOLOv5-OBB graph builder.

TPU-first re-design of the reference's torch module zoo
(models/common.py:37-274): NHWC layout (XLA's native conv layout on TPU),
bf16 compute with fp32 params/BN statistics, SiLU+BN convs fused by XLA.

Every module takes ``(x, train)`` where ``train`` toggles BatchNorm batch
statistics.  BN uses momentum 0.97 / eps 1e-3 to match the reference's
initialisation (utils/torch_utils.py:176-190: torch momentum 0.03).
"""

from __future__ import annotations

import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

DType = Any


def autopad(k, p=None):
    """'same'-style padding for odd kernels (reference models/common.py:30-34)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def make_divisible(x, divisor=8):
    return math.ceil(x / divisor) * divisor


# Minimum input H*W for the fused downsample-conv Pallas path (layer 3 at
# 256² for a 1024px input; env override for hardware A/Bs).
_FUSED_DOWN_MIN_SPATIAL = int(
    os.environ.get("FUSED_DOWN_MIN_SPATIAL", 256 * 256))

def _bn_dtype(train: bool = True):
    """BatchNorm/SiLU elementwise compute dtype on the TRAIN path.

    ``YOLO_BN_HALF=1`` (set by ``train.py --bn-half``, auto-on for TPU)
    switches the normalize/SiLU elementwise math to bfloat16; flax
    BatchNorm always accumulates the batch statistics in f32
    (normalization._compute_stats promotes) and the learned scale/bias and
    running stats stay f32 params.  The train step is HBM-bytes-bound and
    its dominant non-conv cost is the f32 BN/SiLU chains over lane-padded
    ≤96-channel tensors (tools/bench_stem_train.py: the stem's BN/SiLU
    costs more than its conv; e2e +8.6% train throughput).  Eval keeps
    f32 normalize math (torch-parity harness, conv+BN folding)."""
    if train and os.environ.get("YOLO_BN_HALF") == "1":
        return jnp.bfloat16
    return jnp.float32


class ConvBnAct(nn.Module):
    """Conv2D + BatchNorm + SiLU (reference `Conv`, models/common.py:37-49).

    ``fused=True`` (inference only): an eligible stride-2 3x3 downsample
    (the backbone rows between C3 blocks) runs as one Pallas kernel
    (ops/pallas/down_kernel.py) so the fused stem→C3→down→C3 region stays
    contiguous — no XLA layout copy materialises at the custom-call
    boundaries.  The parameter tree is identical to the stock path."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: bool = True
    dtype: DType = jnp.float32
    fused: bool = False

    def _down_eligible(self, x, train):
        from ..ops.pallas.down_kernel import shape_eligible

        initializing = self.scope is not None and self.is_initializing()
        return (
            self.fused and not train and not initializing
            and self.k == 3 and self.s == 2 and self.g == 1 and self.act
            and self.p in (None, 1)
            and x.ndim == 4 and x.shape[-1] % 16 == 0 and self.c2 % 16 == 0
            # kernel shape constraints (single source: down_kernel)
            and shape_eligible(x.shape[1], x.shape[2], x.shape[-1])
            # perf gate: only the high-resolution downsamples adjacent to
            # fused C3 blocks win (halo + boundary economics as in C3)
            and x.shape[1] * x.shape[2] >= _FUSED_DOWN_MIN_SPATIAL
        )

    def _down_train_eligible(self, x, train):
        from ..ops.pallas.down_kernel import shape_eligible

        initializing = self.scope is not None and self.is_initializing()
        return (
            self.fused and train and not initializing
            and self.k == 3 and self.s == 2 and self.g == 1 and self.act
            and self.p in (None, 1)
            and x.ndim == 4 and x.shape[-1] % 16 == 0 and self.c2 % 16 == 0
            and shape_eligible(x.shape[1], x.shape[2], x.shape[-1])
            and x.shape[1] * x.shape[2] >= _FUSED_DOWN_MIN_SPATIAL
        )

    def _fused_down(self, x):
        from ..ops.pallas.down_kernel import fused_down

        ci = x.shape[-1]
        kernel = _AnyConvParams((3, 3, ci, self.c2), name="Conv_0")()
        scale, bias, mean, var = _StemBnParams(self.c2, name="BatchNorm_0")()
        g = scale * jax.lax.rsqrt(var + 1e-3)
        ss = jnp.stack([g, bias - mean * g]).astype(jnp.float32)
        w_taps = kernel.reshape(9 * ci, self.c2).astype(jnp.bfloat16)
        return fused_down(x.astype(jnp.bfloat16), w_taps, ss).astype(
            self.dtype)

    def _fused_down_train(self, x):
        """Train-mode fused downsample: raw-conv Pallas kernel (custom VJP
        with a Pallas wgrad) + live BatchNorm/SiLU in XLA — the stock
        fwd+wgrad run ~5x over their byte floors at the eligible
        high-resolution shapes (tools/bench_train_convs.py)."""
        from ..ops.pallas.down_kernel import fused_down_train

        ci = x.shape[-1]
        kernel = _AnyConvParams((3, 3, ci, self.c2), name="Conv_0")()
        w_taps = kernel.reshape(9 * ci, self.c2)
        z = fused_down_train(x.astype(jnp.bfloat16), w_taps)
        z = checkpoint_name(z, "conv_out")
        z = nn.BatchNorm(
            use_running_average=False,
            momentum=0.97,
            epsilon=1e-3,
            dtype=_bn_dtype(),
            param_dtype=jnp.float32,
            name="BatchNorm_0",
        )(z)
        return nn.silu(z).astype(self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self._down_eligible(x, train):
            return self._fused_down(x)
        if self._down_train_eligible(x, train):
            return self._fused_down_train(x)
        p = autopad(self.k, self.p)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(p, p), (p, p)],
            feature_group_count=self.g,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        # selective-remat anchor: under the train step's
        # save_only_these_names policy ONLY this (bf16) tensor is kept as
        # the bwd residual; BN/SiLU (f32!) are recomputed on the fly.
        # Outside a remat context this is the identity.
        x = checkpoint_name(x, "conv_out")
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=_bn_dtype(train),
            param_dtype=jnp.float32,
        )(x)
        return nn.silu(x).astype(self.dtype) if self.act else x.astype(self.dtype)


class _StemConvParams(nn.Module):
    """Parameter-only twin of the stem ``nn.Conv`` — same scope/param names
    so variables interchange freely with :class:`ConvBnAct`."""

    c2: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (6, 6, 3, self.c2),
            jnp.float32,
        )


class _StemBnParams(nn.Module):
    """Parameter-only twin of the stem ``nn.BatchNorm``.

    Calling it again with this step's batch ``(new_mean, new_var)``
    applies the flax BatchNorm running-stat update (momentum 0.97) — the
    fused train region computes batch statistics inside its Pallas passes
    and pushes them here."""

    c2: int

    @nn.compact
    def __call__(self, new_mean=None, new_var=None):
        scale = self.param("scale", nn.initializers.ones, (self.c2,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.c2,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.c2,), jnp.float32)
        )
        if new_mean is not None and not self.is_initializing():
            mean.value = 0.97 * mean.value + 0.03 * new_mean.astype(jnp.float32)
            var.value = 0.97 * var.value + 0.03 * new_var.astype(jnp.float32)
        return scale, bias, mean.value, var.value


class PackedStem(nn.Module):
    """Fused image ingest + stem Conv(6,2,2)+BN+SiLU.

    Takes the image as a packed ``(B, H, W*3)`` uint8 *view* (a free host
    reshape of the NHWC batch) — the NHWC C=3 feed is lane-padded 3→128 on
    TPU (~42x HBM inflation just to read it; tools/bench_stem_layout.py).
    The /255 normalize folds into the conv weights, and a Pallas kernel
    computes the convolution from the unpadded layout
    (ops/pallas/stem_kernel.py).

    Inference additionally folds the BatchNorm affine + SiLU into the
    kernel; training runs the raw-conv kernel (custom VJP: a Pallas wgrad
    kernel — the image needs no input grad) with live BatchNorm batch
    stats in XLA on the 48-channel output.

    The parameter tree is identical to ``ConvBnAct(c2, 6, 2, 2)`` — trained
    checkpoints load into either module unchanged.
    """

    c2: int
    dtype: DType = jnp.bfloat16

    @nn.compact
    def __call__(self, x_packed, train: bool = False):
        from ..ops.pallas.stem_kernel import (
            fold_stem_params,
            fused_stem,
            remap_w6,
            stem_conv_train,
        )

        kernel = _StemConvParams(self.c2, name="Conv_0")()
        B, H, W3 = x_packed.shape
        if train:
            w108 = remap_w6(kernel) / 255.0  # fold the input normalize
            z = stem_conv_train(x_packed, w108, H, W3 // 3,
                                out_dtype=self.dtype)
            z = checkpoint_name(z, "conv_out")
            z = nn.BatchNorm(
                use_running_average=False,
                momentum=0.97,
                epsilon=1e-3,
                dtype=_bn_dtype(),
                param_dtype=jnp.float32,
                name="BatchNorm_0",
            )(z)
            return nn.silu(z).astype(self.dtype)
        scale, bias, mean, var = _StemBnParams(self.c2, name="BatchNorm_0")()
        w108, b = fold_stem_params(kernel, scale, bias, mean, var)
        return fused_stem(x_packed, w108, b, H, W3 // 3).astype(self.dtype)


class DWConv(nn.Module):
    """Depthwise-separable conv (reference models/common.py:52-55)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(self.c1, self.c2)
        return ConvBnAct(self.c2, self.k, self.s, g=g, act=self.act, dtype=self.dtype)(
            x, train
        )


class Bottleneck(nn.Module):
    """Residual bottleneck (reference models/common.py:94-104)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        y = ConvBnAct(self.c2, 3, 1, g=self.g, dtype=self.dtype)(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck, original formulation (reference models/common.py:107-123)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, e=1.0, dtype=self.dtype)(
                y1, train
            )
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=_bn_dtype(train), param_dtype=jnp.float32,
        )(y)
        y = nn.silu(y).astype(self.dtype)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(y, train)


class _CBAParams(nn.Module):
    """Parameter-only twin of ``ConvBnAct`` — same scope/param names, so
    variables interchange freely between the stock and fused C3 paths."""

    ci: int
    co: int
    k: int = 1

    @nn.compact
    def __call__(self):
        kernel = _AnyConvParams((self.k, self.k, self.ci, self.co),
                                name="Conv_0")()
        bn = _StemBnParams(self.co, name="BatchNorm_0")()
        return kernel, bn


class _AnyConvParams(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          tuple(self.shape), jnp.float32)


class _BottleneckParams(nn.Module):
    c_: int

    @nn.compact
    def __call__(self):
        a = _CBAParams(self.c_, self.c_, 1, name="ConvBnAct_0")()
        b = _CBAParams(self.c_, self.c_, 3, name="ConvBnAct_1")()
        return a, b


class _ConvBnTwin(nn.Module):
    """Param twin of ``ConvBnAct`` for the fused train region.

    First call returns ``(kernel, scale, bias)``; a second call with this
    step's batch ``(mean, var)`` applies the running-stat update (flax
    module reuse under the same scope — params are shared)."""

    ci: int
    co: int
    k: int = 1

    @nn.compact
    def __call__(self, new_mean=None, new_var=None):
        kernel = _AnyConvParams((self.k, self.k, self.ci, self.co),
                                name="Conv_0")()
        scale, bias, _, _ = _StemBnParams(self.co, name="BatchNorm_0")(
            new_mean, new_var)
        return kernel, scale, bias


class _BottleneckTwin(nn.Module):
    """Nested param twin of ``Bottleneck`` (scope Bottleneck_i/ConvBnAct_j)."""

    c_: int

    @nn.compact
    def __call__(self, st_a=(None, None), st_b=(None, None)):
        a = _ConvBnTwin(self.c_, self.c_, 1, name="ConvBnAct_0")(*st_a)
        b = _ConvBnTwin(self.c_, self.c_, 3, name="ConvBnAct_1")(*st_b)
        return a, b


class _C3Twin(nn.Module):
    """Param twin of the stock ``C3`` scope tree (ConvBnAct_0 = cv1,
    Bottleneck_i, ConvBnAct_1 = cv2, ConvBnAct_2 = cv3) for the fused
    train region.  Second call with ``stats`` — a flat tuple of
    ``(mean, var)`` pairs ordered (cv1, cv2, b0.cv1, b0.cv2, …, cv3) —
    pushes the running-stat updates."""

    c1: int
    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, stats=None):
        c_ = int(self.c2 * 0.5)
        st = list(stats) if stats is not None else [(None, None)] * (
            3 + 2 * self.n)
        cv1 = _ConvBnTwin(self.c1, c_, 1, name="ConvBnAct_0")(*st[0])
        bots = []
        for i in range(self.n):
            bots.append(_BottleneckTwin(c_, name=f"Bottleneck_{i}")(
                st[2 + 2 * i], st[3 + 2 * i]))
        cv2 = _ConvBnTwin(self.c1, c_, 1, name="ConvBnAct_1")(*st[1])
        cv3 = _ConvBnTwin(2 * c_, self.c2, 1, name="ConvBnAct_2")(*st[-1])
        return cv1, bots, cv2, cv3


# Minimum H*W for the fused-C3 Pallas path (the only hardware-measured
# winning point is the layer-2 block at 256²; tests lower this to
# exercise the kernel at small shapes).
_FUSED_C3_MIN_SPATIAL = int(
    os.environ.get("FUSED_C3_MIN_SPATIAL", 256 * 256))


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference models/common.py:126-138).

    ``fused=True`` (inference only): when the block is eligible
    (n <= 4, g == 1, e == 0.5, H/W 8-aligned, high-resolution), the
    whole block runs as one Pallas kernel (ops/pallas/c3_kernel.py) — one
    HBM read, one write, every BN folded.  The parameter tree is identical
    to the stock path, so checkpoints load into either."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: DType = jnp.float32
    fused: bool = False

    def _eligible(self, x, train):
        from ..ops.pallas.c3_kernel import _ROWS_OUT

        initializing = self.scope is not None and self.is_initializing()
        return (
            self.fused and not train and not initializing
            # the kernel supports n <= 4, shortcut on/off and c1 != c2
            # (tested); eligibility follows the hardware A/B
            # (tools/bench_c3_blocks.py, dx-packed taps): the shortcut
            # c1==c2 families win — layer-2 @256² 1.46x, layer-4 n=4
            # @128² 1.10x — while the no-shortcut P3 head measured 1.00x
            # (no win, so gated to stock XLA)
            and self.n <= 4 and self.shortcut and self.c1 == self.c2
            and self.g == 1 and self.e == 0.5 and self.c1 % 16 == 0
            and self.c2 % 16 == 0
            and x.ndim == 4 and x.shape[2] % 8 == 0
            and x.shape[1] % _ROWS_OUT == 0
            # halo DMA amplification shrinks the win as spatial extent
            # drops: >=256² wins outright (1.46x isolated AND e2e); the
            # 128² n=4 block measured 1.10x isolated but regressed the
            # e2e bench (3.02→3.31 ms/img — boundary layout copies eat
            # the win), so it stays perf-gated to stock XLA
            and x.shape[1] * x.shape[2] >= _FUSED_C3_MIN_SPATIAL
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self._eligible(x, train):
            return self._fused_call(x)
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, e=1.0, dtype=self.dtype)(
                y1, train
            )
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(
            jnp.concatenate([y1, y2], axis=-1), train
        )

    def _fused_call(self, x):
        from ..ops.pallas.c3_kernel import fused_c3

        c_ = int(self.c2 * self.e)

        def fold(kernel, bn, eps=1e-3):
            scale, bias, mean, var = bn
            g = scale * jax.lax.rsqrt(var + eps)
            ss = jnp.stack([g, bias - mean * g]).astype(jnp.float32)
            return kernel.astype(jnp.bfloat16), ss

        w1, s1 = fold(*_CBAParams(self.c1, c_, 1, name="ConvBnAct_0")())
        bots = []
        for bi in range(self.n):
            ba, bt = _BottleneckParams(c_, name=f"Bottleneck_{bi}")()
            wba, sba = fold(*ba)
            wbt, sbt = fold(*bt)
            bots += [wba[0, 0], sba, wbt.reshape(9 * c_, c_), sbt]
        w2, s2 = fold(*_CBAParams(self.c1, c_, 1, name="ConvBnAct_1")())
        w3, s3 = fold(*_CBAParams(2 * c_, self.c2, 1, name="ConvBnAct_2")())

        w3f = w3[0, 0]  # (2c_, c2)
        out = fused_c3(
            x.astype(jnp.bfloat16),
            w1[0, 0], s1, tuple(bots),
            w2[0, 0], s2, w3f[:c_], w3f[c_:], s3,
            n=self.n, shortcut=bool(self.shortcut),
        )
        return out.astype(self.dtype)


class TransformerLayer(nn.Module):
    """LayerNorm-free transformer layer (reference models/common.py:58-72)."""

    c: int
    num_heads: int
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = lambda name: nn.Dense(
            self.c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, param_dtype=jnp.float32
        )(q, k, v)
        x = attn + x
        return dense("fc2")(dense("fc1")(x)) + x


class TransformerBlock(nn.Module):
    """ViT-style block over flattened feature map (reference models/common.py:75-91)."""

    c1: int
    c2: int
    num_heads: int
    num_layers: int
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.c1 != self.c2:
            x = ConvBnAct(self.c2, dtype=self.dtype)(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32)(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype)(p, train)
        return p.reshape(b, h, w, self.c2)


class C3TR(C3):
    """C3 with a TransformerBlock inner stage (reference models/common.py:141-146)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        y1 = TransformerBlock(c_, c_, 4, self.n, dtype=self.dtype)(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (reference models/common.py:165-178)."""

    c1: int
    c2: int
    k: Sequence[int] = (5, 9, 13)
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        pools = [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)
            for k in self.k
        ]
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(
            jnp.concatenate([x] + pools, axis=-1), train
        )


class C3SPP(C3):
    """C3 with an SPP inner stage (reference models/common.py:149-154)."""

    k: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        y1 = SPP(c_, c_, self.k, dtype=self.dtype)(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class SPPF(nn.Module):
    """Fast SPP: 3 chained k-pools ≡ SPP(k, 2k-1, 3k-2) (reference models/common.py:181-196)."""

    c1: int
    c2: int
    k: int = 5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        k = self.k
        pad = [(k // 2, k // 2)] * 2
        y1 = nn.max_pool(x, (k, k), strides=(1, 1), padding=pad)
        y2 = nn.max_pool(y1, (k, k), strides=(1, 1), padding=pad)
        y3 = nn.max_pool(y2, (k, k), strides=(1, 1), padding=pad)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class Focus(nn.Module):
    """Space-to-depth stem (reference models/common.py:199-208)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return ConvBnAct(self.c2, self.k, self.s, self.p, self.g, self.act, self.dtype)(
            x, train
        )


class GhostConv(nn.Module):
    """Ghost convolution (reference models/common.py:211-221)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBnAct(c_, self.k, self.s, None, self.g, self.act, self.dtype)(x, train)
        y2 = ConvBnAct(c_, 5, 1, None, c_, self.act, self.dtype)(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference models/common.py:224-236)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(self.c1, c_, 1, 1, dtype=self.dtype)(x, train)
        if self.s == 2:
            y = DWConv(c_, c_, self.k, self.s, act=False, dtype=self.dtype)(y, train)
        y = GhostConv(c_, self.c2, 1, 1, act=False, dtype=self.dtype)(y, train)
        if self.s == 2:
            sc = DWConv(self.c1, self.c1, self.k, self.s, act=False, dtype=self.dtype)(
                x, train
            )
            sc = ConvBnAct(self.c2, 1, 1, act=False, dtype=self.dtype)(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottleneck stages (reference models/common.py:157-162)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            y1 = GhostBottleneck(c_, c_, dtype=self.dtype)(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype)(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class CrossConv(nn.Module):
    """Cross convolution downsample (reference models/experimental.py:15-26)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        p1 = autopad(self.k) if self.k > 1 else 0
        y = nn.Conv(
            c_, (1, self.k), strides=(1, self.s), padding=[(0, 0), (p1, p1)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=_bn_dtype(train), param_dtype=jnp.float32,
        )(y)
        y = nn.silu(y).astype(self.dtype)
        y = nn.Conv(
            self.c2, (self.k, 1), strides=(self.s, 1), padding=[(p1, p1), (0, 0)],
            feature_group_count=self.g, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32,
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=_bn_dtype(train), param_dtype=jnp.float32,
        )(y)
        y = nn.silu(y).astype(self.dtype)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class Contract(nn.Module):
    """Space-to-depth: (b,h,w,c) → (b,h/g,w/g,c*g²) (reference models/common.py:239-250)."""

    gain: int = 2

    def __call__(self, x, train: bool = False):
        g = self.gain
        b, h, w, c = x.shape
        x = x.reshape(b, h // g, g, w // g, g, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // g, w // g, c * g * g)


class Expand(nn.Module):
    """Depth-to-space: (b,h,w,c) → (b,h*g,w*g,c/g²) (reference models/common.py:253-264)."""

    gain: int = 2

    def __call__(self, x, train: bool = False):
        g = self.gain
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, g, g, c // (g * g))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * g, w * g, c // (g * g))


class Concat(nn.Module):
    """Concatenate along channels (reference models/common.py:267-274)."""

    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


class Upsample(nn.Module):
    """Nearest-neighbour 2x upsample (the reference's nn.Upsample rows)."""

    scale: int = 2

    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = jnp.repeat(x, self.scale, axis=1)
        return jnp.repeat(x, self.scale, axis=2)


class Classify(nn.Module):
    """Classification head (reference models/common.py:628-638)."""

    c1: int
    c2: int
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # global average pool
        x = nn.Conv(self.c2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x.reshape(x.shape[0], -1)


class Sum(nn.Module):
    """(Optionally learned-weight) sum of n inputs — BiFPN-style fusion
    (reference models/experimental.py:29-47): ``y = x0 + Σ 2σ(wᵢ)·xᵢ₊₁``."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = xs[0]
        if self.weight:
            w = self.param(
                "w", lambda _: -jnp.arange(1.0, self.n, dtype=jnp.float32) / 2
            )
            w = jax.nn.sigmoid(w) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i].astype(y.dtype)
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class MixConv2d(nn.Module):
    """Mixed-kernel-size conv (MixConv, reference models/experimental.py:50-71):
    output channels split across kernel sizes, concat → BN → SiLU.

    Channel split uses the reference's ``equal_ch`` strategy (even floor
    partition of c2 over the kernel list)."""

    c1: int
    c2: int
    k: tuple = (1, 3)
    s: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.k)
        idx = np.floor(np.linspace(0, n - 1e-6, self.c2)).astype(int)
        groups = [int((idx == g).sum()) for g in range(n)]
        outs = []
        for ki, c_ in zip(self.k, groups):
            outs.append(
                nn.Conv(
                    c_, (ki, ki), strides=(self.s, self.s),
                    padding=[(ki // 2, ki // 2)] * 2,
                    feature_group_count=math.gcd(self.c1, c_),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
            )
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=_bn_dtype(train), param_dtype=jnp.float32,
        )(y)
        return nn.silu(y).astype(self.dtype)


class MaxPool(nn.Module):
    """Plain max-pool layer (the reference yolov3-tiny's nn.MaxPool2d rows)."""

    k: int = 2
    s: int | None = None

    def __call__(self, x, train: bool = False):
        s = self.s or self.k
        return nn.max_pool(x, (self.k, self.k), strides=(s, s))
