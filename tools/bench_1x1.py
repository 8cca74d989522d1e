#!/usr/bin/env python
"""1x1 conv lowering A/B: conv_general_dilated vs flattened dot_general.

bench_train_convs found the 1x1 family running ~4x above its byte floor in
both fwd and wgrad (c3_1x1@512²: 0.36 fwd + 0.28 wgrad ms/img). A 1x1/s1
conv IS a matmul over the flattened spatial dim — this probe measures
whether expressing it as dot_general (and letting autodiff derive matmul
grads) reaches the floor, which would speed every C3 cv1/cv2/cv3 and head
1x1 in BOTH train and inference with a pure-XLA change (layers.py).

Run: python tools/bench_1x1.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B = 16

# the real yolov5m@1024 1x1 shapes (H, ci, co)
SHAPES = [
    ("c3a_cv1", 256, 96, 48),
    ("c3a_cv3", 256, 96, 96),
    ("c3b_cv1", 128, 192, 96),
    ("sppf_cv1", 32, 768, 384),
]

PEAK_GBS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    for name, H, ci, co in SHAPES:
        w = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(0), (1, 1, ci, co), jnp.bfloat16) * 0.05)
        xs = [jax.device_put(jax.random.normal(
            jax.random.PRNGKey(i + 1), (B, H, H, ci), jnp.bfloat16))
            for i in range(2)]
        jax.block_until_ready((w, xs))

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def dot(x, w):
            y = jax.lax.dot_general(
                x.reshape(-1, ci), w.reshape(ci, co),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y.astype(x.dtype).reshape(B, H, H, co)

        acc0 = jax.device_put(np.zeros((), np.float32))

        def timeit(fn):
            float(fn(acc0, xs[0], w))
            float(fn(acc0, xs[1], w))
            n = 24
            t0 = time.perf_counter()
            acc = acc0
            for i in range(n):
                acc = fn(acc, xs[i % 2], w)
            assert np.isfinite(float(acc))
            return (time.perf_counter() - t0) / n * 1000 / B

        row = dict(name=name, H=H, ci=ci, co=co)
        for tag, op in (("conv", conv), ("dot", dot)):
            @jax.jit
            def fwd(acc, x, w, op=op):
                return acc + jnp.sum(op(x, w).astype(jnp.float32))

            @jax.jit
            def full(acc, x, w, op=op):
                def f(w, x):
                    return jnp.sum(op(x, w).astype(jnp.float32) ** 2)
                l, (gw, gx) = jax.value_and_grad(f, argnums=(0, 1))(w, x)
                return acc + l + jnp.sum(gw.astype(jnp.float32)) + jnp.sum(
                    gx.astype(jnp.float32))

            row[f"{tag}_fwd_ms"] = round(timeit(fwd), 4)
            row[f"{tag}_full_ms"] = round(timeit(full), 4)
        bytes_f = 2 * B * H * H * (ci + co)
        row["byte_sol_ms"] = round(bytes_f / (PEAK_GBS * 1e9) * 1000 / B, 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
