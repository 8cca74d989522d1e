#!/usr/bin/env python
"""On-TPU parity + A/B for the fused stem+layer-1 kernel.

Compares the packed model with PACKED_L1 on vs off (full yolov5m forward,
same weights), asserts bf16-level agreement, then times both e2e-style
(pipelined accumulator, cf. bench.py)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 16
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))
ITERS = 12


def build(l1: bool):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import make_predict_fn
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    os.environ["PACKED_L1"] = "1" if l1 else "0"
    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ,
        packed_stem=True)
    assert model.packed_l1 == l1
    predict = make_predict_fn(
        model, meta, conf_thres=0.25, iou_thres=0.45, max_det=1500,
        multi_label=False, max_candidates=2048)
    return model, variables, meta, predict


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import pack_images
    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    m1, v1, meta, p1 = build(True)
    m0, v0, _, p0 = build(False)
    # same weights for both paths (trees are identical)
    v = jax.device_put(fuse_for_inference(v0))
    jax.block_until_ready(v)

    rng = np.random.default_rng(0)
    xs = [jax.device_put(pack_images(
        rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)))
        for _ in range(3)]
    jax.block_until_ready(xs)

    # parity: detections from both paths on one batch
    d1, n1 = jax.jit(p1)(v, xs[0])
    d0, n0 = jax.jit(p0)(v, xs[0])
    n1, n0 = np.asarray(n1), np.asarray(n0)
    d1, d0 = np.asarray(d1, np.float32), np.asarray(d0, np.float32)
    assert (n1 == n0).all(), (n1, n0)
    err = np.abs(d1 - d0).max()
    print(f"parity: same det counts; max|det delta|={err:.4f}")
    assert err < 1.0, err  # bf16 box-coordinate jitter at 1024px scale

    for name, pred in (("stock-packed", p0), ("fused-l1    ", p1)):

        @jax.jit
        def run_acc(v, x, acc):
            dets, num = pred(v, x)
            return acc + jnp.sum(dets) + jnp.sum(num)

        acc0 = jax.device_put(np.zeros((), np.float32))
        float(run_acc(v, xs[0], acc0))
        acc = run_acc(v, xs[1], acc0)
        float(acc)
        t0 = time.perf_counter()
        acc = acc0
        for i in range(ITERS):
            acc = run_acc(v, xs[i % 3], acc)
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / ITERS / BATCH * 1e3
        print(f"{name}: {dt:.3f} ms/img e2e pipelined")


if __name__ == "__main__":
    main()
