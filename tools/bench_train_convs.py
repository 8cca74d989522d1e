#!/usr/bin/env python
"""Per-shape train-conv probe: fwd vs fwd+bwd ms for the representative
yolov5m@1024 conv shapes, against their bf16 FLOP and HBM-byte floors.

Locates where the training step's conv time concentrates (PARITY: step =
fwd 3.0 + bwd 6.4 + loss 1.0 ms/img) so any custom train-kernel effort
targets the shapes that pay. Methodology per CLAUDE.md: device-staged
inputs, scalar checksum pull, 2 buffers.

Run: python tools/bench_train_convs.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B = 16

# (name, H, ci, co, k, s) — yolov5m (width 0.75) backbone spine + one PAN row
SHAPES = [
    ("stem6/2", 1024, 3, 48, 6, 2),
    ("down1", 512, 48, 96, 3, 2),
    ("c3_1x1", 512, 96, 48, 1, 1),
    ("c3_3x3", 512, 48, 48, 3, 1),
    ("down2", 256, 96, 192, 3, 2),
    ("c3_3x3_2", 256, 96, 96, 3, 1),
    ("down3", 128, 192, 384, 3, 2),
    ("c3_3x3_3", 128, 192, 192, 3, 1),
    ("down4", 64, 384, 768, 3, 2),
    ("head_1x1", 32, 768, 384, 1, 1),
]

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBS = 819.0  # v5e HBM


def main():
    import jax
    import jax.numpy as jnp

    rows = []
    for name, H, ci, co, k, s in SHAPES:
        key = jax.random.PRNGKey(0)
        w = jax.device_put(
            jax.random.normal(key, (k, k, ci, co), jnp.bfloat16) * 0.05)
        xs = [
            jax.device_put(jax.random.normal(
                jax.random.PRNGKey(i + 1), (B, H, H, ci), jnp.bfloat16))
            for i in range(2)
        ]
        jax.block_until_ready((w, xs))
        pad = k // 2 if s == 1 else (k // 2 if k == 3 else 2)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def fwd(acc, x, w):
            return acc + jnp.sum(conv(x, w).astype(jnp.float32))

        @jax.jit
        def fwdbwd(acc, x, w):
            def f(w, x):
                y = conv(x, w)
                return jnp.sum(y.astype(jnp.float32) ** 2), y

            (l, y), gw = jax.value_and_grad(f, has_aux=True)(w, x)
            return acc + l + jnp.sum(gw.astype(jnp.float32))

        @jax.jit
        def fwdbwd_full(acc, x, w):
            # the real train step's per-conv cost: igrad AND wgrad
            def f(w, x):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

            l, (gw, gx) = jax.value_and_grad(f, argnums=(0, 1))(w, x)
            return acc + l + jnp.sum(gw.astype(jnp.float32)) + jnp.sum(
                gx.astype(jnp.float32))

        acc0 = jax.device_put(np.zeros((), np.float32))

        def timeit(fn):
            # pipelined: checksums chain through a device accumulator so
            # dispatch overlaps the dev-tunnel RTT (CLAUDE.md methodology)
            float(fn(acc0, xs[0], w))
            float(fn(acc0, xs[1], w))
            n = 24
            t0 = time.perf_counter()
            acc = acc0
            for i in range(n):
                acc = fn(acc, xs[i % 2], w)
            assert np.isfinite(float(acc))
            return (time.perf_counter() - t0) / n * 1000 / B  # ms/img

        t_f = timeit(fwd)
        t_fb = timeit(fwdbwd)
        t_fbf = timeit(fwdbwd_full)

        Ho = H // s
        flops_f = 2 * B * Ho * Ho * k * k * ci * co
        # bwd = igrad + wgrad ≈ 2x fwd flops
        sol_f = flops_f / (PEAK_TFLOPS * 1e12) * 1000 / B
        bytes_f = 2 * B * (H * H * ci + Ho * Ho * co)  # bf16 in+out
        sol_b = bytes_f / (PEAK_GBS * 1e9) * 1000 / B
        rows.append(dict(
            name=name, H=H, ci=ci, co=co, k=k, s=s,
            fwd_ms=round(t_f, 4), fwdbwd_ms=round(t_fb, 4),
            wgrad_ms=round(t_fb - t_f, 4),
            igrad_ms=round(t_fbf - t_fb, 4),
            full_ms=round(t_fbf, 4),
            flop_sol_ms=round(sol_f, 4), byte_sol_ms=round(sol_b, 4),
        ))
        print(json.dumps(rows[-1]), flush=True)

    tot_f = sum(r["fwd_ms"] for r in rows)
    tot_w = sum(r["wgrad_ms"] for r in rows)
    tot_i = sum(r["igrad_ms"] for r in rows)
    print(f"# sum fwd {tot_f:.3f} + wgrad {tot_w:.3f} + igrad {tot_i:.3f} ms/img")


if __name__ == "__main__":
    main()
