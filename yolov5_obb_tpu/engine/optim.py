"""Optimizer stack: the reference's training recipe as one optax chain.

Reference (train.py:143-199, 302-342):
* SGD, momentum 0.937 nesterov, three param groups — conv/dense kernels get
  weight decay, BN scales and biases don't (train.py:148-163);
* weight decay scaled by ``batch_size * accumulate / 64`` (train.py:144-147);
* one-cycle cosine LR stepped per epoch (general.py:476-479, train.py:169);
* warmup over ``max(warmup_epochs*steps_per_epoch, 1000)`` steps: LR rises
  linearly (biases fall from ``warmup_bias_lr``), momentum rises from
  ``warmup_momentum`` (train.py:302-310);
* EMA with decay ``0.9999 * (1 - exp(-updates/2000))`` (torch_utils.py:284-318);
* gradient accumulation to a nominal batch of 64 (optax.MultiSteps).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax

DEFAULT_OPT_HYP = {
    "lr0": 0.01,
    "lrf": 0.2,
    "momentum": 0.937,
    "weight_decay": 0.0005,
    "warmup_epochs": 3.0,
    "warmup_momentum": 0.8,
    "warmup_bias_lr": 0.1,
}


def one_cycle_factor(epoch: float, epochs: int, lrf: float) -> float:
    """Cosine 1→lrf factor (reference general.py:476-479)."""
    return ((1 - math.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1


def linear_factor(epoch: float, epochs: int, lrf: float) -> float:
    return (1 - epoch / epochs) * (1.0 - lrf) + lrf


def _is_bias(path) -> bool:
    return path[-1].key == "bias"


def _is_kernel(path) -> bool:
    # decayed: conv/dense kernels (ndim > 1); BN scale/bias and biases excluded
    return path[-1].key == "kernel"


def make_schedules(hyp: dict, epochs: int, steps_per_epoch: int, linear_lr=False):
    """Returns (lr_fn(step), bias_lr_fn(step), momentum_fn(step)) as python
    callables over jnp step counters."""
    h = {**DEFAULT_OPT_HYP, **{k: v for k, v in hyp.items() if k in DEFAULT_OPT_HYP}}
    nw = max(round(h["warmup_epochs"] * steps_per_epoch), 100)
    factor = linear_factor if linear_lr else one_cycle_factor

    # per-epoch-stepped target lr table (matches LambdaLR semantics)
    import numpy as np

    lf = np.array([factor(e, epochs, h["lrf"]) for e in range(epochs + 1)], np.float32)
    lf_t = jnp.asarray(lf)

    def target_lr(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs).astype(jnp.int32)
        return h["lr0"] * lf_t[epoch]

    def lr_fn(step):
        t = target_lr(step)
        w = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, w * t, t)

    def bias_lr_fn(step):
        t = target_lr(step)
        w = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, h["warmup_bias_lr"] + w * (t - h["warmup_bias_lr"]), t)

    def momentum_fn(step):
        w = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(
            step < nw,
            h["warmup_momentum"] + w * (h["momentum"] - h["warmup_momentum"]),
            h["momentum"],
        )

    return lr_fn, bias_lr_fn, momentum_fn


def build_optimizer(
    params,
    hyp: dict,
    epochs: int,
    steps_per_epoch: int,
    batch_size: int,
    nominal_batch: int = 64,
    linear_lr: bool = False,
    use_adam: bool = False,
    freeze: int = 0,
):
    """Construct the full optax transformation (+ accumulation).

    ``freeze`` zeroes updates for the first N graph layers (params under
    ``m0..m{N-1}``) — the reference's --freeze (train.py:126-131)."""
    h = {**DEFAULT_OPT_HYP, **{k: v for k, v in hyp.items() if k in DEFAULT_OPT_HYP}}
    accumulate = max(round(nominal_batch / batch_size), 1)
    wd = h["weight_decay"] * batch_size * accumulate / nominal_batch

    lr_fn, bias_lr_fn, momentum_fn = make_schedules(
        hyp, epochs, steps_per_epoch, linear_lr
    )

    decay_mask = jax.tree_util.tree_map_with_path(lambda p, _: _is_kernel(p), params)
    bias_labels = jax.tree_util.tree_map_with_path(
        lambda p, _: "bias" if _is_bias(p) else "other", params
    )

    if use_adam:
        momentum_core = optax.scale_by_adam(b1=h["momentum"], b2=0.999)
    else:
        momentum_core = optax.inject_hyperparams(
            lambda decay: optax.trace(decay=decay, nesterov=True)
        )(decay=momentum_fn)

    parts = [
        optax.masked(optax.add_decayed_weights(wd), decay_mask),
        momentum_core,
        optax.multi_transform(
            {
                "bias": optax.scale_by_schedule(lambda s: -bias_lr_fn(s)),
                "other": optax.scale_by_schedule(lambda s: -lr_fn(s)),
            },
            bias_labels,
        ),
    ]
    if freeze > 0:
        frozen_names = {f"m{i}" for i in range(freeze)}
        frozen_mask = jax.tree_util.tree_map_with_path(
            lambda p, _: p[0].key in frozen_names, params
        )
        parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
    tx = optax.chain(*parts)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, {"accumulate": accumulate, "weight_decay": wd, "lr_fn": lr_fn}


def ema_decay(updates):
    """Ramped EMA decay (reference torch_utils.py:284-318)."""
    return 0.9999 * (1.0 - jnp.exp(-updates / 2000.0))


def ema_update(ema_params, params, updates):
    d = ema_decay(updates)
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params)
