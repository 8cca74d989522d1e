#!/usr/bin/env python
"""Isolated train-stem A/B: stock (u8→f32/255 → conv6/2 → BN(train) → SiLU)
vs the packed path (stem_conv_train Pallas + BN(train) + SiLU), fwd and
fwd+wgrad, at the yolov5m@1024 stem shape.

The e2e train bench moved only 92.9 → 93.7 img/s after wiring the packed
train stem; the per-shape probe predicted ~0.5 ms/img. This isolates
where the prediction fails: the fwd kernel, the wgrad kernel, the extra
deinterleave/BN passes, or an XLA fusion in the full graph that the
standalone probe misses.

Run: python tools/bench_stem_train.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B, H, C2 = 16, 1024, 48


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.stem_kernel import remap_w6, stem_conv_train

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(rng.integers(0, 255, (B, H, H, 3), dtype=np.uint8))
            for _ in range(2)]
    imgs_p = [jax.device_put(np.asarray(x).reshape(B, H, -1)) for x in imgs]
    w6 = jax.device_put(jnp.asarray(
        rng.normal(0, 0.05, (6, 6, 3, C2)), jnp.float32))
    bn = {
        "scale": jnp.ones((C2,), jnp.float32),
        "bias": jnp.zeros((C2,), jnp.float32),
    }
    bn = jax.device_put(bn)
    jax.block_until_ready((imgs, imgs_p, w6, bn))

    def bn_silu(z, scale, bias):
        zf = z.astype(jnp.float32)
        mu = zf.mean((0, 1, 2))
        var = zf.var((0, 1, 2))
        y = (zf - mu) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return y * jax.nn.sigmoid(y)

    def stock(img, w6, scale, bias):
        x = img.astype(jnp.float32) / 255.0
        z = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w6.astype(jnp.bfloat16), (2, 2),
            [(2, 2), (2, 2)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return bn_silu(z, scale, bias)

    def packed(img_p, w6, scale, bias):
        w108 = remap_w6(w6) / 255.0
        z = stem_conv_train(img_p, w108, H, H)
        return bn_silu(z, scale, bias)

    acc0 = jax.device_put(np.zeros((), np.float32))

    def timeit(fn, feed):
        float(fn(acc0, feed[0]))
        float(fn(acc0, feed[1]))
        n = 16
        t0 = time.perf_counter()
        acc = acc0
        for i in range(n):
            acc = fn(acc, feed[i % 2])
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / n * 1000 / B

    results = {}
    for tag, f, feed in (("stock", stock, imgs), ("packed", packed, imgs_p)):
        @jax.jit
        def fwd(acc, x, f=f):
            return acc + jnp.sum(f(x, w6, bn["scale"], bn["bias"])) * 1e-6

        @jax.jit
        def fwdbwd(acc, x, f=f):
            def loss(w6):
                return jnp.sum(f(x, w6, bn["scale"], bn["bias"]) ** 2)

            l, g = jax.value_and_grad(loss)(w6)
            return acc + l * 1e-6 + jnp.sum(g) * 1e-6

        results[f"{tag}_fwd_ms"] = round(timeit(fwd, feed), 4)
        results[f"{tag}_fwdbwd_ms"] = round(timeit(fwdbwd, feed), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
