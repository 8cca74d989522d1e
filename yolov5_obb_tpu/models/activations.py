"""Activation zoo (reference utils/activations.py:12-101) as JAX functions
plus the parameterised ones as Flax modules."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def silu(x):
    return x * nn.sigmoid(x)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


class FReLU(nn.Module):
    """Funnel activation: max(x, depthwise-conv(x)) (reference :37-46)."""

    c1: int
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.c1, (self.k, self.k), padding="SAME",
            feature_group_count=self.c1, use_bias=False,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3)(y)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """ACON-C: (p1-p2)·x·σ(β(p1-p2)x) + p2·x (reference :49-70)."""

    c1: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, self.c1))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, self.c1))
        beta = self.param("beta", nn.initializers.ones, (1, 1, 1, self.c1))
        dpx = (p1 - p2) * x
        return dpx * nn.sigmoid(beta * dpx) + p2 * x


class MetaAconC(nn.Module):
    """ACON-C with a small network generating beta (reference :73-101)."""

    c1: int
    k: int = 1
    s: int = 1
    r: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = max(self.r, self.c1 // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, self.c1))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, self.c1))
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(c2, (self.k, self.k), strides=self.s, use_bias=True)(y)
        y = nn.Conv(self.c1, (self.k, self.k), strides=self.s, use_bias=True)(y)
        beta = nn.sigmoid(y)
        dpx = (p1 - p2) * x
        return dpx * nn.sigmoid(beta * dpx) + p2 * x
