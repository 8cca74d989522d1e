#!/usr/bin/env python
"""FULL-inventory train-conv probe for yolov5m@1024: every distinct conv
shape in the graph (backbone+PAN+Detect, with multiplicity), each timed
fwd / +wgrad / +igrad in stock XLA, against bf16 byte floors.

Purpose: the 10-shape probe (bench_train_convs.py) samples the spine; this
sums the WHOLE graph so the conv total can be compared against the
measured step decomposition (bench_train_decomp: fwd 3.0 + bwd 6.4 +
loss 1.0 ms/img). conv_sum ≈ fwd+bwd ⇒ the time is in convs and Pallas
train kernels pay; conv_sum ≪ fwd+bwd ⇒ the gap is glue (BN/SiLU chains,
concats, residuals, layout copies) and fusion/layout work pays instead.

Shape inventory derived from models/yolov5m.yaml (width 0.75 / depth 0.67)
at 1024px; `mult` = how many convs of that exact shape the graph holds.

Run: python tools/bench_train_convs2.py   (TPU; ~1h of compiles first run)
Env: ONLY="name1,name2" to probe a subset.
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

# (name, H_in, ci, co, k, s, mult) — yolov5m @1024
SHAPES = [
    # backbone spine
    ("stem6/2", 1024, 3, 48, 6, 2, 1),
    ("down1", 512, 48, 96, 3, 2, 1),
    ("c3a_cv12", 256, 96, 48, 1, 1, 2),
    ("c3a_m1x1", 256, 48, 48, 1, 1, 2),
    ("c3a_m3x3", 256, 48, 48, 3, 1, 2),
    ("c3a_cv3", 256, 96, 96, 1, 1, 1),
    ("down2", 256, 96, 192, 3, 2, 1),
    ("c3b_cv12", 128, 192, 96, 1, 1, 2),
    ("c3b_m1x1", 128, 96, 96, 1, 1, 4),
    ("c3b_m3x3", 128, 96, 96, 3, 1, 4),
    ("c3b_cv3", 128, 192, 192, 1, 1, 1),
    ("down3", 128, 192, 384, 3, 2, 1),
    ("c3c_cv12", 64, 384, 192, 1, 1, 2),
    ("c3c_m1x1", 64, 192, 192, 1, 1, 6),
    ("c3c_m3x3", 64, 192, 192, 3, 1, 6),
    ("c3c_cv3", 64, 384, 384, 1, 1, 1),
    ("down4", 64, 384, 768, 3, 2, 1),
    ("c3d_cv12", 32, 768, 384, 1, 1, 2),
    ("c3d_m1x1", 32, 384, 384, 1, 1, 2),
    ("c3d_m3x3", 32, 384, 384, 3, 1, 2),
    ("c3d_cv3", 32, 768, 768, 1, 1, 1),
    ("sppf_cv1", 32, 768, 384, 1, 1, 1),
    ("sppf_cv2", 32, 1536, 768, 1, 1, 1),
    # PAN head (two upsample rows, two downsample rows)
    ("h_conv_p5", 32, 768, 384, 1, 1, 1),
    ("h_c3u1_cv12", 64, 768, 192, 1, 1, 2),
    ("h_c3u1_m", 64, 192, 192, 1, 1, 2),  # 1x1 half of n=2 no-shortcut pair
    ("h_c3u1_m3", 64, 192, 192, 3, 1, 2),
    ("h_c3u1_cv3", 64, 384, 384, 1, 1, 1),
    ("h_conv_p4", 64, 384, 192, 1, 1, 1),
    ("h_c3u2_cv12", 128, 384, 96, 1, 1, 2),
    ("h_c3u2_m", 128, 96, 96, 1, 1, 2),
    ("h_c3u2_m3", 128, 96, 96, 3, 1, 2),
    ("h_c3u2_cv3", 128, 192, 192, 1, 1, 1),
    ("h_down_p3", 128, 192, 192, 3, 2, 1),
    ("h_c3d1_cv12", 64, 384, 192, 1, 1, 2),
    ("h_c3d1_m", 64, 192, 192, 1, 1, 2),
    ("h_c3d1_m3", 64, 192, 192, 3, 1, 2),
    ("h_c3d1_cv3", 64, 384, 384, 1, 1, 1),
    ("h_down_p4", 64, 384, 384, 3, 2, 1),
    ("h_c3d2_cv12", 32, 768, 384, 1, 1, 2),
    ("h_c3d2_m", 32, 384, 384, 1, 1, 2),
    ("h_c3d2_m3", 32, 384, 384, 3, 1, 2),
    ("h_c3d2_cv3", 32, 768, 768, 1, 1, 1),
    # Detect 1x1s (no=600)
    ("det_p3", 128, 192, 600, 1, 1, 1),
    ("det_p4", 64, 384, 600, 1, 1, 1),
    ("det_p5", 32, 768, 600, 1, 1, 1),
]

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    only = os.environ.get("ONLY")
    shapes = [s for s in SHAPES if not only or s[0] in only.split(",")]
    # dedupe identical (H, ci, co, k, s) classes (the PAN reuses backbone
    # shapes) — sums keep the combined multiplicity, compiles run once
    dedup: dict = {}
    for name, H, ci, co, k, s, mult in shapes:
        key = (H, ci, co, k, s)
        if key in dedup:
            d = dedup[key]
            dedup[key] = (f"{d[0]}+{name}", H, ci, co, k, s, d[6] + mult)
        else:
            dedup[key] = (name, H, ci, co, k, s, mult)
    shapes = list(dedup.values())
    print(f"# {len(shapes)} distinct conv shapes")

    rows = []
    for name, H, ci, co, k, s, mult in shapes:
        w = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(0), (k, k, ci, co), jnp.bfloat16) * 0.05)
        xs = [jax.device_put(jax.random.normal(
            jax.random.PRNGKey(i + 1), (B, H, H, ci), jnp.bfloat16))
            for i in range(2)]
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
        def fwd_w(acc, x, w):  # fwd + wgrad (x constant)
            def f(w):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)
            l, gw = jax.value_and_grad(f)(w)
            return acc + l + jnp.sum(gw.astype(jnp.float32))

        @jax.jit
        def fwd_wi(acc, x, w):  # fwd + wgrad + igrad (the real train cost)
            def f(w, x):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)
            l, (gw, gx) = jax.value_and_grad(f, argnums=(0, 1))(w, x)
            return acc + l + jnp.sum(gw.astype(jnp.float32)) \
                + jnp.sum(gx.astype(jnp.float32))

        acc0 = jax.device_put(np.zeros((), np.float32))

        def timeit(fn):
            float(fn(acc0, xs[0], w))
            float(fn(acc0, xs[1], w))
            n = 16
            t0 = time.perf_counter()
            acc = acc0
            for i in range(n):
                acc = fn(acc, xs[i % 2], w)
            assert np.isfinite(float(acc))
            return (time.perf_counter() - t0) / n * 1000 / B

        t_f, t_fw, t_fwi = timeit(fwd), timeit(fwd_w), timeit(fwd_wi)
        Ho = H // s
        flops = 2 * B * Ho * Ho * k * k * ci * co
        sol_f = flops / (PEAK_TFLOPS * 1e12) * 1000 / B
        bytes_f = 2 * B * (H * H * ci + Ho * Ho * co)
        sol_b = bytes_f / (PEAK_GBS * 1e9) * 1000 / B
        rows.append(dict(
            name=name, H=H, ci=ci, co=co, k=k, s=s, mult=mult,
            fwd_ms=round(t_f, 4), wgrad_ms=round(t_fw - t_f, 4),
            igrad_ms=round(t_fwi - t_fw, 4), full_ms=round(t_fwi, 4),
            flop_sol_ms=round(sol_f, 4), byte_sol_ms=round(sol_b, 4),
        ))
        print(json.dumps(rows[-1]), flush=True)

    tot = lambda key: sum(r[key] * r["mult"] for r in rows)
    print(json.dumps(dict(
        sum_fwd_ms=round(tot("fwd_ms"), 3),
        sum_wgrad_ms=round(tot("wgrad_ms"), 3),
        sum_igrad_ms=round(tot("igrad_ms"), 3),
        sum_full_ms=round(tot("full_ms"), 3),
        sum_flop_sol_ms=round(tot("flop_sol_ms"), 3),
        sum_byte_sol_ms=round(tot("byte_sol_ms"), 3),
    )))


if __name__ == "__main__":
    main()
