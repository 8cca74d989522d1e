#!/usr/bin/env python
"""Fused Pallas stem vs the stock ConvBnAct stem on TPU.

Also verifies the two agree on-device (max |Δ| on a checksum grid).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))


def timeit(fn, args_list, iters=10):
    float(fn(*args_list[0]))
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / BATCH


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import ConvBnAct
    from yolov5_obb_tpu.ops.pallas.stem_kernel import (fold_stem_params,
                                                       fused_stem)

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)
            for _ in range(2)]

    mod = ConvBnAct(48, 6, 2, 2, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    variables = jax.tree.map(np.asarray, variables)
    variables["batch_stats"]["BatchNorm_0"]["mean"] = rng.normal(
        0, 0.5, (48,)).astype(np.float32)
    variables["batch_stats"]["BatchNorm_0"]["var"] = rng.uniform(
        0.5, 2.0, (48,)).astype(np.float32)

    # stock path
    xs_a = [jax.device_put(a) for a in imgs]
    jax.block_until_ready(xs_a)

    @jax.jit
    def stock(v, x):
        y = mod.apply(v, x.astype(jnp.float32) / 255.0, train=False)
        return jnp.sum(y.astype(jnp.float32))

    ms_a = timeit(stock, [(variables, x) for x in xs_a])
    print(f"stock ConvBnAct stem: {ms_a:.3f} ms/img", flush=True)

    # fused path (packed view feed)
    w108, bias = fold_stem_params(
        jnp.asarray(variables["params"]["Conv_0"]["kernel"]),
        jnp.asarray(variables["params"]["BatchNorm_0"]["scale"]),
        jnp.asarray(variables["params"]["BatchNorm_0"]["bias"]),
        jnp.asarray(variables["batch_stats"]["BatchNorm_0"]["mean"]),
        jnp.asarray(variables["batch_stats"]["BatchNorm_0"]["var"]),
    )
    xs_b = [jax.device_put(a.reshape(BATCH, IMGSZ, -1)) for a in imgs]
    jax.block_until_ready(xs_b)

    @jax.jit
    def fused(w, b, x):
        y = fused_stem(x, w, b, IMGSZ, IMGSZ)
        return jnp.sum(y.astype(jnp.float32))

    ms_b = timeit(fused, [(w108, bias, x) for x in xs_b])
    print(f"fused Pallas stem   : {ms_b:.3f} ms/img", flush=True)

    # agreement check on-device
    @jax.jit
    def delta(v, w, b, xa, xb):
        ya = mod.apply(v, xa.astype(jnp.float32) / 255.0, train=False)
        yb = fused_stem(xb, w, b, IMGSZ, IMGSZ)
        return jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))

    d = float(delta(variables, w108, bias, xs_a[0], xs_b[0]))
    print(f"max |stock - fused| = {d:.4f}")
    print(json.dumps({"stock": round(ms_a, 3), "fused": round(ms_b, 3),
                      "max_delta": round(d, 4)}))


if __name__ == "__main__":
    main()
