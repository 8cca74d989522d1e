#!/usr/bin/env python
"""Isolated A/B: fused Pallas C3 vs stock XLA, per eligible block family
(b16, ms/img).  Dispatch pipelined through a device accumulator so the
dev-tunnel RTT overlaps (cf. bench.py pipelined mode)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 16
ITERS = 30


def bench_block(C, c2, n, shortcut, H, W, seed):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    rng = np.random.default_rng(seed)
    xs = [jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, H, W, C)), jnp.bfloat16))
        for _ in range(2)]
    stock = C3(C, c2, n, shortcut, dtype=jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(seed), xs[0], False)
    v = jax.device_put(v)
    jax.block_until_ready((xs, v))

    out = {}
    for name, fused in (("stock", False), ("fused", True)):
        mod = C3(C, c2, n, shortcut, dtype=jnp.bfloat16, fused=fused)

        @jax.jit
        def run(v, x, acc):
            y = mod.apply(v, x, False)
            return acc + jnp.sum(y.astype(jnp.float32))

        acc0 = jax.device_put(np.zeros((), np.float32))
        float(run(v, xs[0], acc0))
        acc = run(v, xs[1], acc0)
        float(acc)
        t0 = time.perf_counter()
        acc = acc0
        for i in range(ITERS):
            acc = run(v, xs[i % 2], acc)
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / ITERS / BATCH * 1e3
        out[name] = dt
    print(f"C3({C},{c2},n={n},sc={shortcut}) @{H}: "
          f"stock {out['stock']:.3f} fused {out['fused']:.3f} ms/img "
          f"({out['stock']/out['fused']:.2f}x)")


def main():
    bench_block(96, 96, 2, True, 256, 256, 0)    # layer 2
    bench_block(192, 192, 4, True, 128, 128, 1)  # layer 4
    bench_block(384, 192, 2, False, 128, 128, 2)  # P3 head


if __name__ == "__main__":
    main()
