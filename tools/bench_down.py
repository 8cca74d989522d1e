#!/usr/bin/env python
"""Isolated A/B: fused Pallas downsample Conv(3,2)+BN+SiLU vs stock XLA
(b16, ms/img), at the backbone downsample shapes of the 1024px graph.
Dispatch pipelined through a device accumulator so the dev-tunnel RTT
overlaps (cf. bench.py pipelined mode)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 16
ITERS = 30


def bench_shape(ci, co, H, W, seed):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models import layers
    from yolov5_obb_tpu.models.layers import ConvBnAct

    layers._FUSED_DOWN_MIN_SPATIAL = 0
    rng = np.random.default_rng(seed)
    xs = [jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, H, W, ci)), jnp.bfloat16))
        for _ in range(2)]
    stock = ConvBnAct(co, 3, 2, dtype=jnp.bfloat16)
    v = jax.device_put(stock.init(jax.random.PRNGKey(seed), xs[0], False))
    jax.block_until_ready((xs, v))

    out = {}
    for name, fused in (("stock", False), ("fused", True)):
        mod = ConvBnAct(co, 3, 2, dtype=jnp.bfloat16, fused=fused)

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
    print(f"Conv({ci}->{co},3,2) @{H}: "
          f"stock {out['stock']:.3f} fused {out['fused']:.3f} ms/img "
          f"({out['stock']/out['fused']:.2f}x)")


def main():
    bench_shape(96, 192, 256, 256, 0)   # layer 3 (the only eligible
    # backbone downsample: ci=192+ spans >1 lane tile, see down_kernel.py)


if __name__ == "__main__":
    main()
