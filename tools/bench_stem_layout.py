#!/usr/bin/env python
"""Stem *input layout* A/B: the (B,H,W,3) u8 feed is lane-padded 3→128 on
TPU (~42x HBM inflation: tools/bench_fwd_decomp.py measured ~8 GB of traffic
just to ingest a 50 MB image batch).  Variants:

  v0 nhwc-u8    (B,H,W,3) u8 → f32/255 → Conv(48,6,2,2)           [current]
  v1 nchw-s2d   (B,3,H,W) u8 → in-graph s2d-2 → (B,H/2,W/2,12) → 3x3 conv
  v2 host-s2d   (B,H/2,W/2,12) u8 (host rearrange) → 3x3 conv
  v3 nchw-tr    (B,3,H,W) u8 → in-graph transpose → 6x6 conv      [control]

The 3x3-on-s2d form is EXACTLY the 6x6/s2/p2 conv (kernel remapped:
dy = 2*qy + py + 2) — v1/v2 checksums must match v0 to bf16 tolerance.
Whole-batch checksums printed for that check.
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


def aot(fn, *args):
    import jax

    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return c, float((ca or {}).get("bytes accessed", 0))


def timeit(fn, args_list, iters=10):
    float(fn(*args_list[0]))
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / BATCH


def s2d_host(x_nhwc):
    """(B,H,W,3) u8 → (B,H/2,W/2,12), channel order (py, px, c)."""
    B, H, W, C = x_nhwc.shape
    x = x_nhwc.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B,H2,W2,py,px,C
    return np.ascontiguousarray(x.reshape(B, H // 2, W // 2, 4 * C))


def remap_kernel(w6):
    """(6,6,3,K) HWIO → (3,3,12,K) for the s2d-2 input, (py,px,c) channels."""
    k3 = np.zeros((3, 3, 12, w6.shape[-1]), w6.dtype)
    for dy in range(6):
        qy, py = (dy - 2) // 2 + 1, (dy - 2) % 2
        for dx in range(6):
            qx, px = (dx - 2) // 2 + 1, (dx - 2) % 2
            k3[qy, qx, (py * 2 + px) * 3:(py * 2 + px) * 3 + 3] = w6[dy, dx]
    return k3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)
            for _ in range(2)]
    w6 = rng.normal(0, 0.05, (6, 6, 3, 48)).astype(np.float32)
    w3 = remap_kernel(w6)
    w6d, w3d = jax.device_put(w6), jax.device_put(w3)
    report = {}

    def run(label, fn, args_list, wref):
        c, bytes_ = aot(fn, wref, args_list[0])
        ms = timeit(c, [(wref, a) for a in args_list])
        chk = float(c(wref, args_list[0]))
        print(f"{label:10s}: {ms:7.3f} ms/img  bytes={bytes_/1e9:6.2f}GB  "
              f"chk={chk:.1f}", flush=True)
        report[label] = {"ms_per_img": round(ms, 3),
                         "gbytes": round(bytes_ / 1e9, 2)}

    conv6 = lambda x: jax.lax.conv_general_dilated(
        x, w6d.astype(jnp.bfloat16), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    conv3 = lambda x: jax.lax.conv_general_dilated(
        x, w3d.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)

    # v0: current NHWC u8 feed
    xs0 = [jax.device_put(a) for a in imgs]
    jax.block_until_ready(xs0)

    def v0(w, x):
        y = conv6((x.astype(jnp.float32) / 255.0).astype(jnp.bfloat16))
        return jnp.sum(y)

    run("v0 nhwc", v0, xs0, w6d)

    # v1: NCHW u8 feed, in-graph s2d
    xs1 = [jax.device_put(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))
           for a in imgs]
    jax.block_until_ready(xs1)

    def v1(w, x):
        B, C, H, W = x.shape
        t = x.reshape(B, C, H // 2, 2, W // 2, 2)
        t = t.transpose(0, 2, 4, 3, 5, 1)  # B,H2,W2,py,px,C
        t = t.reshape(B, H // 2, W // 2, 4 * C)
        y = conv3((t.astype(jnp.float32) / 255.0).astype(jnp.bfloat16))
        return jnp.sum(y)

    run("v1 nchw+s2d", v1, xs1, w3d)

    # v2: host-side s2d feed
    xs2 = [jax.device_put(s2d_host(a)) for a in imgs]
    jax.block_until_ready(xs2)

    def v2(w, x):
        y = conv3((x.astype(jnp.float32) / 255.0).astype(jnp.bfloat16))
        return jnp.sum(y)

    run("v2 host-s2d", v2, xs2, w3d)

    # v3: NCHW feed, transpose only (layout control)
    def v3(w, x):
        t = x.transpose(0, 2, 3, 1)
        y = conv6((t.astype(jnp.float32) / 255.0).astype(jnp.bfloat16))
        return jnp.sum(y)

    run("v3 nchw+tr", v3, xs1, w6d)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
