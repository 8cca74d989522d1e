#!/usr/bin/env python
"""Decomposition of the flat decode+NMS path (post flat-Detect rewrite).

Stages on pre-staged *flat* Detect maps:
  select  decode planes + candidate top-k + rb assembly (stage="select")
  full    + nms_rotated + det compaction

full − select isolates the suppression cost inside the current pipeline.
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


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.ops.rotated_nms import non_max_suppression_from_maps

    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)
    )
    maps0 = jax.jit(
        lambda v, xx: model.apply(vv := v, xx.astype(jnp.float32) / 255.0,
                                  train=False, flat=True)
    )(variables, x)
    maps1 = jax.tree.map(lambda m: m + 0.001, maps0)
    jax.block_until_ready((maps0, maps1))
    report = {}

    def run(label, fn, args_list):
        c, bytes_ = aot(fn, *args_list[0])
        ms = timeit(c, args_list)
        print(f"{label:8s}: {ms:7.3f} ms/img  bytes={bytes_/1e9:6.2f}GB",
              flush=True)
        report[label] = {"ms_per_img": round(ms, 3),
                         "gbytes": round(bytes_ / 1e9, 2)}

    kw = dict(conf_thres=0.25, iou_thres=0.45, max_candidates=2048,
              max_det=1500, multi_label=False)

    def select(maps):
        rb, scores = non_max_suppression_from_maps(maps, meta, stage="select",
                                                   **kw)
        return jnp.sum(rb) + jnp.sum(scores)

    run("select", select, [(maps0,), (maps1,)])

    def full(maps):
        dets, num = non_max_suppression_from_maps(maps, meta, **kw)
        return jnp.sum(dets) + jnp.sum(num)

    run("full", full, [(maps0,), (maps1,)])
    print(json.dumps(report))


if __name__ == "__main__":
    main()
