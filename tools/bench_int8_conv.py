#!/usr/bin/env python
"""Probe: does XLA lower int8 convolutions to the v5e MXU at ~2x bf16 rate?

The v5e MXU peaks at 394 TOPS int8 vs 197 TFLOP/s bf16. If
`lax.conv_general_dilated` with s8 operands and s32 accumulation hits
anywhere near that, an int8 PTQ inference path roughly halves the conv
stack cost (the fwd bottleneck per PARITY.md's decomposition). If XLA
instead upcasts to bf16/f32 internally, the timings will match or trail
the bf16 row and the PTQ path needs Pallas kernels instead.

Shapes: representative yolov5m@1024 interior convs (NHWC).
Timing per CLAUDE.md: checksum pulled to host, 2 input buffers cycled.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SHAPES = [
    # (B, H, W, Cin, Cout, k, stride)  — one early, one mid, one late conv
    (16, 256, 256, 96, 96, 3, 1),
    (16, 128, 128, 192, 192, 3, 1),
    (16, 64, 64, 384, 384, 3, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    results = {}

    def conv(x, w, stride, prefer):
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=prefer,
        )

    def bench(fn, bufs, iters=30):
        o = fn(*bufs[0]); float(jnp.sum(o.astype(jnp.float32)))
        o = fn(*bufs[1]); float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            o = fn(*bufs[i % 2])
            if (i + 1) % 10 == 0:
                float(jnp.sum(o.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1000.0

    for (B, H, W, Ci, Co, k, s) in SHAPES:
        tag = f"{H}x{W}x{Ci}->{Co}"
        flops = 2 * B * (H // s) * (W // s) * k * k * Ci * Co
        xs = [rng.standard_normal((B, H, W, Ci), dtype=np.float32) for _ in range(2)]
        ws = rng.standard_normal((k, k, Ci, Co), dtype=np.float32)

        # bf16 baseline
        f_bf16 = jax.jit(partial(conv, stride=s, prefer=jnp.float32))
        bufs = [(jax.device_put(x.astype(jnp.bfloat16)),
                 jax.device_put(ws.astype(jnp.bfloat16))) for x in xs]
        jax.block_until_ready(bufs)
        ms = bench(f_bf16, bufs)
        results[f"bf16 {tag}"] = {"ms": round(ms, 3),
                                  "tflops": round(flops / ms / 1e9, 1)}

        # int8 x int8 -> int32
        f_i8 = jax.jit(partial(conv, stride=s, prefer=jnp.int32))
        bufs8 = [(jax.device_put((x * 10).astype(np.int8)),
                  jax.device_put((ws * 10).astype(np.int8))) for x in xs]
        jax.block_until_ready(bufs8)
        try:
            ms = bench(f_i8, bufs8)
            results[f"int8 {tag}"] = {"ms": round(ms, 3),
                                      "tops": round(flops / ms / 1e9, 1)}
        except Exception as e:  # noqa: BLE001
            results[f"int8 {tag}"] = {"error": str(e)[:200]}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
