#!/usr/bin/env python
"""Stage-split benchmark: model forward vs decode+NMS vs full pipeline.

Times each stage of the yolov5m b16@1024 inference path separately on the
current backend (methodology per CLAUDE.md: checksum pull per call, ≥2
input buffers). Helps target optimization work — run after any change to
the hot path.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 16
IMGSZ = 1024


def timeit(fn, args_list, iters=8):
    float(fn(*args_list[0]))  # compile
    float(fn(*args_list[1 % len(args_list)]))  # warm
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / BATCH


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import make_predict_fn
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.ops.rotated_nms import non_max_suppression_from_maps

    packed = jax.default_backend() == "tpu"
    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ,
        packed_stem=packed,
    )
    from yolov5_obb_tpu.engine.evaluator import pack_images

    rng = np.random.default_rng(0)
    raw = [rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)
           for _ in range(2)]
    xs = [jax.device_put(pack_images(a) if packed else a) for a in raw]
    jax.block_until_ready(xs)

    @jax.jit
    def fwd_only(v, x):
        xin = x if packed else x.astype(jnp.float32) / 255.0
        maps = model.apply(v, xin, train=False, flat=True)
        return sum(jnp.sum(m.astype(jnp.float32)) for m in maps)

    ms_fwd = timeit(fwd_only, [(variables, x) for x in xs])
    print(f"forward only:        {ms_fwd:.3f} ms/img")

    # stage 2: decode+NMS on fixed maps (pre-computed, staged on device)
    maps0 = jax.jit(
        lambda v, x: model.apply(
            v, x if packed else x.astype(jnp.float32) / 255.0,
            train=False, flat=True)
    )(variables, xs[0])
    maps1 = jax.tree.map(lambda m: (m + m.dtype.type(0.001)), maps0)
    jax.block_until_ready((maps0, maps1))

    @jax.jit
    def nms_only(maps):
        dets, num = non_max_suppression_from_maps(
            maps, meta, conf_thres=0.25, iou_thres=0.45,
            max_candidates=2048, max_det=1500, multi_label=False,
        )
        return jnp.sum(dets) + jnp.sum(num)

    ms_nms = timeit(nms_only, [(maps0,), (maps1,)])
    print(f"decode+NMS only:     {ms_nms:.3f} ms/img")

    predict = make_predict_fn(
        model, meta, conf_thres=0.25, iou_thres=0.45, max_det=1500,
        multi_label=False, max_candidates=2048,
    )

    @jax.jit
    def full(v, x):
        dets, num = predict(v, x)
        return jnp.sum(dets) + jnp.sum(num)

    ms_full = timeit(full, [(variables, x) for x in xs])
    print(f"full pipeline:       {ms_full:.3f} ms/img")
    print(json.dumps({
        "fwd_ms_per_img": round(ms_fwd, 3),
        "nms_ms_per_img": round(ms_nms, 3),
        "full_ms_per_img": round(ms_full, 3),
    }))


if __name__ == "__main__":
    main()
