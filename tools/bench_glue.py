#!/usr/bin/env python
"""Backward-glue probe: what the train step pays BEYOND the bare convs.

bench_train_convs2 showed conv fwd sums to the measured model fwd (~3.0
ms/img, no glue) but conv bwd sums to only ~3.5 of the measured 6.4
ms/img — ~2 ms/img of backward runs in non-conv ops. This tool measures
each suspect at its real yolov5m@1024 shapes, as (full site fwd+bwd) −
(bare conv fwd+bwd):

- ConvBnAct train glue: +BN(batch stats)+SiLU forward AND their backward
  chains around the same conv (YOLO_BN_HALF honored).
- PAN upsample (2x nearest) fwd+bwd.
- concat+slice grads at the PAN joins.
- SPPF maxpool stack fwd+bwd.

Run: python tools/bench_glue.py   (TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B = 16

CONV_SITES = [
    # (name, H, ci, co, k, s, mult) — early/mid conv sites with BN+SiLU
    ("stem", 1024, 3, 48, 6, 2, 1),
    ("c48@256", 256, 48, 48, 3, 1, 2),
    ("c48_1x1@256", 256, 96, 48, 1, 1, 2),
    ("c96@128", 128, 96, 96, 3, 1, 6),
    ("c192@64", 64, 192, 192, 3, 1, 10),
    ("c384@32", 32, 384, 384, 3, 1, 4),
]


def main():
    import jax
    import jax.numpy as jnp

    os.environ.setdefault(
        "YOLO_BN_HALF", "1" if jax.default_backend() == "tpu" else "0")
    bn_bf16 = os.environ["YOLO_BN_HALF"] == "1"
    bn_dt = jnp.bfloat16 if bn_bf16 else jnp.float32

    acc0 = jax.device_put(np.zeros((), np.float32))

    def timeit(fn, feeds):
        float(fn(acc0, feeds[0]))
        float(fn(acc0, feeds[1]))
        n = 16
        t0 = time.perf_counter()
        acc = acc0
        for i in range(n):
            acc = fn(acc, feeds[i % 2])
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / n * 1000 / B

    results = {}

    for name, H, ci, co, k, s, mult in CONV_SITES:
        pad = k // 2 if k == 3 else (0 if k == 1 else 2)
        w = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(0), (k, k, ci, co), jnp.bfloat16) * 0.05)
        scale = jax.device_put(jnp.ones((co,), jnp.float32))
        bias = jax.device_put(jnp.zeros((co,), jnp.float32))
        xs = [jax.device_put(jax.random.normal(
            jax.random.PRNGKey(i + 1), (B, H, H, ci), jnp.bfloat16))
            for i in range(2)]
        jax.block_until_ready((w, scale, bias, xs))

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def convbn(x, w, scale, bias):
            z = conv(x, w)
            zf = z.astype(bn_dt)
            mu = jnp.mean(zf.astype(jnp.float32), axis=(0, 1, 2))
            var = jnp.var(zf.astype(jnp.float32), axis=(0, 1, 2))
            g = (scale * jax.lax.rsqrt(var + 1e-3)).astype(bn_dt)
            y = (zf - mu.astype(bn_dt)) * g + bias.astype(bn_dt)
            return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

        @jax.jit
        def bare(acc, x):
            def f(w, x):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)
            l, (gw, gx) = jax.value_and_grad(f, argnums=(0, 1))(w, x)
            return acc + l + jnp.sum(gw.astype(jnp.float32)) + \
                jnp.sum(gx.astype(jnp.float32))

        @jax.jit
        def site(acc, x):
            def f(w, x):
                return jnp.sum(convbn(x, w, scale, bias)
                               .astype(jnp.float32) ** 2)
            l, (gw, gx) = jax.value_and_grad(f, argnums=(0, 1))(w, x)
            return acc + l + jnp.sum(gw.astype(jnp.float32)) + \
                jnp.sum(gx.astype(jnp.float32))

        tb, ts = timeit(bare, xs), timeit(site, xs)
        results[name] = dict(bare_ms=round(tb, 4), site_ms=round(ts, 4),
                             glue_ms=round(ts - tb, 4),
                             glue_total_ms=round((ts - tb) * mult, 4))
        print(json.dumps({name: results[name]}), flush=True)

    # --- non-conv PAN/SPPF ops (fwd+bwd), floor NOT subtracted ---
    def op_case(name, shape, fn, mult=1):
        xs = [jax.device_put(jax.random.normal(
            jax.random.PRNGKey(i + 5), shape, jnp.bfloat16))
            for i in range(2)]
        jax.block_until_ready(xs)

        @jax.jit
        def run(acc, x):
            def f(x):
                return jnp.sum(fn(x).astype(jnp.float32) ** 2)
            l, gx = jax.value_and_grad(f)(x)
            return acc + l + jnp.sum(gx.astype(jnp.float32))

        t = timeit(run, xs)
        results[name] = dict(fwdbwd_ms=round(t, 4), mult=mult)
        print(json.dumps({name: results[name]}), flush=True)

    import jax.numpy as jnp2

    def upsample(x):
        B_, H_, W_, C_ = x.shape
        return jnp2.repeat(jnp2.repeat(x, 2, axis=1), 2, axis=2)

    op_case("upsample_32_384", (B, 32, 32, 384), upsample)
    op_case("upsample_64_192", (B, 64, 64, 192), upsample)

    def sppf_pools(x):
        def mp(v):
            return jax.lax.reduce_window(
                v, -jnp2.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
                "SAME")
        p1 = mp(x)
        p2 = mp(p1)
        p3 = mp(p2)
        return jnp2.concatenate([x, p1, p2, p3], axis=-1)

    op_case("sppf_pools_32_384", (B, 32, 32, 384), sppf_pools)

    def concat_halves(x):
        # PAN join: concat of two same-shape tensors (grad = two slices)
        return jnp2.concatenate([x, x * 2.0], axis=-1)

    op_case("concat_64_384", (B, 64, 64, 384), concat_halves)
    op_case("concat_128_192", (B, 128, 128, 192), concat_halves)

    print(json.dumps({"bn_bf16": bn_bf16}))


if __name__ == "__main__":
    main()
