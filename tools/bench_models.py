#!/usr/bin/env python
"""Model-size sweep: yolov5{n,s,m,l,x} b16@1024 inference+decode+NMS,
pipelined dispatch (same methodology as bench.py).  Produces the
README-table counterpart of the reference's speed column
(reference README.md:13-15: m 11.3 / s ~— / n ~— ms/img b16 on 2080Ti;
b1 16.9 / 15.6 / 15.2 ms).

Usage: python tools/bench_models.py [models...]   # default n s m l x
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))
ITERS = 12


def bench_model(cfg: str) -> float:
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import make_predict_fn, pack_images
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    packed = jax.default_backend() == "tpu"
    model, variables, meta = create_model(
        cfg, nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ, packed_stem=packed)
    variables = jax.device_put(fuse_for_inference(variables))
    jax.block_until_ready(variables)
    predict = make_predict_fn(
        model, meta, conf_thres=0.25, iou_thres=0.45, max_det=1500,
        multi_label=False, max_candidates=2048)

    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(
            pack_images(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3),
                                     dtype=np.uint8))
            if getattr(predict, "packed_stem", False) else
            rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    jax.block_until_ready(xs)

    @jax.jit
    def run_acc(v, x, acc):
        dets, num = predict(v, x)
        return acc + jnp.sum(dets) + jnp.sum(num)

    acc0 = jax.device_put(np.zeros((), np.float32))
    float(run_acc(variables, xs[0], acc0))  # compile
    acc = run_acc(variables, xs[1], acc0)   # warm
    float(acc)
    t0 = time.perf_counter()
    acc = acc0
    for i in range(ITERS):
        acc = run_acc(variables, xs[i % 3], acc)
    assert np.isfinite(float(acc))
    return (time.perf_counter() - t0) / ITERS * 1e3 / BATCH


def main():
    sizes = sys.argv[1:] or ["n", "s", "m", "l", "x"]
    out = {}
    for s in sizes:
        cfg = f"yolov5{s}.yaml"
        ms = bench_model(cfg)
        out[f"yolov5{s}"] = round(ms, 3)
        print(f"yolov5{s}: {ms:.3f} ms/img (b{BATCH}@{IMGSZ}, pipelined)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
