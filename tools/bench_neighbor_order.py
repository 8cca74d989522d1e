#!/usr/bin/env python
"""A/B: full nms_rotated with sort-free score-order neighbor compaction
("score") vs exact 2048-wide top_k by IoU upper bound ("iou"),
B=16 x 2048 candidates, M=64."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B, K, M = 16, 2048, 64


def timeit(fn, args_list, iters=8):
    float(fn(*args_list[0]))
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / B


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(0, 1024, (B, K))
    cy = rng.uniform(0, 1024, (B, K))
    l = rng.uniform(16, 128, (B, K))
    s = l * rng.uniform(0.3, 1.0, (B, K))
    t = rng.uniform(-np.pi / 2, np.pi / 2, (B, K))
    rb = np.stack([cx, cy, l, s, t], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1.0, (B, K)).astype(np.float32))[:, ::-1].copy()
    cls = rng.integers(0, 15, (B, K)).astype(np.int32)
    return rb, scores, cls


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.rotated_nms import nms_rotated

    inputs = [tuple(map(jax.device_put, make_inputs(sd))) for sd in (0, 1)]
    jax.block_until_ready(inputs)

    def make(order):
        @jax.jit
        def f(rb, scores, cls):
            keep = jax.vmap(
                lambda b, s, c: nms_rotated(
                    b, s, 0.45, class_ids=c, presorted=True,
                    neighbor_order=order,
                )
            )(rb, scores, cls)
            return jnp.sum(keep.astype(jnp.float32))

        return f

    res = {}
    for order in ("score", "iou"):
        ms = timeit(make(order), inputs)
        res[order] = round(ms, 3)
        print(f"nms neighbor_order={order}: {ms:.3f} ms/img")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
