#!/usr/bin/env python
"""A/B: Conv(48,6,2,2) stem vs Focus(48,3) space-to-depth stem at 1024px.

Both have identical receptive field/stride (ultralytics v6 replaced Focus
with the 6x6 conv *for GPUs*; on TPU the blocked form feeds the MXU 12
input channels instead of 3)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 16
IMGSZ = 1024


def timeit(fn, args_list, iters=8):
    float(fn(*args_list[0]))
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / BATCH


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models import layers as L

    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(xs)

    conv = L.ConvBnAct(48, 6, 2, 2, dtype=jnp.bfloat16)
    vc = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def run_conv(v, x):
        y = conv.apply(v, x.astype(jnp.float32) / 255.0, train=False)
        return jnp.sum(y.astype(jnp.float32))

    ms_a = timeit(run_conv, [(vc, x) for x in xs])
    print(f"Conv(48,6,2,2) stem: {ms_a:.3f} ms/img")

    focus = L.Focus(3, 48, 3, dtype=jnp.bfloat16)
    vf = focus.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def run_focus(v, x):
        y = focus.apply(v, x.astype(jnp.float32) / 255.0, train=False)
        return jnp.sum(y.astype(jnp.float32))

    ms_b = timeit(run_focus, [(vf, x) for x in xs])
    print(f"Focus(48,3) stem:    {ms_b:.3f} ms/img")
    print(json.dumps({"conv6": round(ms_a, 3), "focus3": round(ms_b, 3)}))


if __name__ == "__main__":
    main()
