#!/usr/bin/env python
"""Probe: per-image positive-candidate counts at the bench's density regime.

compact_select's batch-level fallback fires when ANY image's positive count
exceeds max_candidates — this prints the actual count distribution at the
bench's tuned detection density (conf 0.25), which decides whether the
sort-free fast path ever engages in the realistic bench and how many slots
it needs.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = 1024
DENSITY = int(os.environ.get("BENCH_DENSITY", "300"))


def main():
    import jax
    import jax.numpy as jnp
    from flax.core import unfreeze

    from yolov5_obb_tpu.engine.evaluator import make_predict_fn, pack_images
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    packed = jax.default_backend() == "tpu"
    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ,
        packed_stem=packed)
    det_name = f"m{len(model.specs) - 1}"
    no, na, nc, nl = meta.no, meta.na, meta.nc, meta.nl

    v = unfreeze(variables)
    det = v["params"][det_name]
    rngb = np.random.default_rng(7)
    for li in range(nl):
        b = np.asarray(det[f"conv{li}"]["bias"]).reshape(na, no).copy()
        b[:, 5:5 + nc] += rngb.normal(0.0, 2.0, (na, nc))
        det[f"conv{li}"]["bias"] = jnp.asarray(b.reshape(-1))
    variables = v
    variables = jax.device_put(unfreeze(fuse_for_inference(variables)))
    jax.block_until_ready(variables)

    def apply_obj_delta(v, delta):
        det = dict(v["params"][det_name])
        for li in range(nl):
            c = dict(det[f"conv{li}"])
            b = c["bias"].reshape(na, no)
            c["bias"] = b.at[:, 4].add(delta).reshape(-1)
            det[f"conv{li}"] = c
        params = dict(v["params"])
        params[det_name] = det
        return {**v, "params": params}

    predict = make_predict_fn(
        model, meta, conf_thres=0.25, iou_thres=0.45, max_det=1500,
        multi_label=False, max_candidates=2048)

    rng = np.random.default_rng(0)
    xs = [jax.device_put(pack_images(
        rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)))
        for _ in range(2)]
    jax.block_until_ready(xs)

    @jax.jit
    def count_dets(v, x, delta):
        _, num = predict(apply_obj_delta(v, delta), x)
        return jnp.mean(num.astype(jnp.float32))

    lo, hi = 0.0, 10.0
    for _ in range(7):
        mid = (lo + hi) / 2
        if float(count_dets(variables, xs[0], mid)) < DENSITY:
            lo = mid
        else:
            hi = mid
    delta = (lo + hi) / 2
    variables = jax.jit(apply_obj_delta)(variables, delta)
    jax.block_until_ready(variables)
    print(f"obj delta {delta:.3f}", flush=True)

    # count positive candidates per image: raw-map forward + the same gate
    # the selection paths use (best cls*obj > conf AND obj > conf)
    @jax.jit
    def counts_fn(v, x):
        maps = model.apply(v, x, train=False, flat=True)
        tot = []
        for p in maps:
            obj = jax.nn.sigmoid(p[..., 4].astype(jnp.float32))
            cls = jax.nn.sigmoid(
                p[..., 5:5 + nc].astype(jnp.float32)) * obj[..., None]
            best = jnp.max(cls, axis=-1)
            tot.append(jnp.sum(
                ((best > 0.25) & (obj > 0.25)).astype(jnp.int32), axis=1))
        return sum(tot)

    for i in range(2):
        c = np.asarray(counts_fn(variables, xs[i]))
        print(f"batch {i}: candidates/img min {c.min()} max {c.max()} "
              f"mean {c.mean():.0f}  dist {sorted(c.tolist())}", flush=True)


if __name__ == "__main__":
    main()
