#!/usr/bin/env python
"""Granular NMS decomposition on *bench-regime* candidates (random-weight
model maps → select stage → rb/scores/cls), matching what bench.py's NMS
actually sees.  Sections (AOT, fast recompiles):

  kernel   fused_neighbor_iou only
  densify  + S one-hot densify
  sweepK   densify + K fixed sweeps (K=4, 12 → per-sweep slope)
  resolve  + full while_loop fixed point (also reports iteration count)
  nms      full nms_rotated
  compact  full nms_rotated + _compact_dets
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
K = int(os.environ.get("BENCH_K", 2048))


def aot(fn, *args):
    import jax

    c = jax.jit(fn).lower(*args).compile()
    return c


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
    from yolov5_obb_tpu.ops import rotated_nms as RN
    from yolov5_obb_tpu.ops.pallas.neighbor_kernel import fused_neighbor_iou

    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    rng = np.random.default_rng(0)

    # real select-stage outputs (bench regime: random weights/images)
    def sel(v, x):
        maps = model.apply(v, x.astype(jnp.float32) / 255.0, train=False,
                           flat=True)
        return RN.non_max_suppression_from_maps(
            maps, meta, conf_thres=0.25, iou_thres=0.45, max_candidates=K,
            max_det=1500, multi_label=False, stage="select")

    cands = []
    for seed in (0, 1):
        x = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3),
                                     dtype=np.uint8))
        rb, scores = jax.jit(sel)(variables, x)
        # class ids: recompute cheaply (argmax path) — approximate with
        # random same-distribution ids; suppression graph density is what
        # matters here
        cls = jnp.asarray(
            np.random.default_rng(seed).integers(0, 15, (BATCH, K)), jnp.int32
        )
        cands.append((jax.device_put(np.asarray(rb)),
                      jax.device_put(np.asarray(scores)),
                      jax.device_put(np.asarray(cls))))
    jax.block_until_ready(cands)
    report = {}

    def run(label, fn, iters=10):
        c = aot(fn, *cands[0])
        ms = timeit(c, cands, iters)
        print(f"{label:8s}: {ms:7.3f} ms/img", flush=True)
        report[label] = round(ms, 3)

    def kernel(rb, scores, cls):
        def one(b, s, c):
            idx, sup = fused_neighbor_iou(b, c, s > 0, 0.45, max_neighbors=64)
            return jnp.sum(idx) + jnp.sum(sup)
        return jnp.sum(jax.vmap(one)(rb, scores, cls))

    run("kernel", kernel)

    def densify_S(idx, sup, n):
        iota_n = jnp.arange(n, dtype=idx.dtype)
        return jnp.any(
            (idx[:, :, None] == iota_n[None, None, :]) & sup[:, :, None], axis=1
        ).astype(jnp.bfloat16)

    def densify(rb, scores, cls):
        def one(b, s, c):
            idx, sup = fused_neighbor_iou(b, c, s > 0, 0.45, max_neighbors=64)
            return jnp.sum(densify_S(idx, sup, b.shape[0]).astype(jnp.float32))
        return jnp.sum(jax.vmap(one)(rb, scores, cls))

    run("densify", densify)

    def sweeps(rb, scores, cls, nsweep):
        def one(b, s, c):
            valid = s > 0
            idx, sup = fused_neighbor_iou(b, c, valid, 0.45, max_neighbors=64)
            S = densify_S(idx, sup, b.shape[0])
            alive = valid
            for _ in range(nsweep):
                hit = jnp.dot(S, alive.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32) > 0.0
                alive = valid & ~hit
            return jnp.sum(alive)
        return jnp.sum(jax.vmap(one)(rb, scores, cls))

    run("sweep4", lambda a, b, c: sweeps(a, b, c, 4))
    run("sweep12", lambda a, b, c: sweeps(a, b, c, 12))

    def resolve_iters(rb, scores, cls):
        # while_loop fixed point, reporting iteration count
        def one(b, s, c):
            valid = s > 0
            idx, sup = fused_neighbor_iou(b, c, valid, 0.45, max_neighbors=64)
            S = densify_S(idx, sup, b.shape[0])

            def cond(st):
                alive, prev, it = st
                return jnp.logical_and(jnp.any(alive != prev), it < 2048)

            def body(st):
                alive, _, it = st
                hit = jnp.dot(S, alive.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32) > 0.0
                return (valid & ~hit, alive, it + 1)

            alive0 = valid
            alive, _, iters = jax.lax.while_loop(
                cond, body, (alive0, ~alive0, jnp.int32(0)))
            return jnp.sum(alive), iters

        kept, iters = jax.vmap(one)(rb, scores, cls)
        return jnp.sum(kept) + jnp.sum(iters) * 1e-6

    c = aot(resolve_iters, *cands[0])
    ms = timeit(c, cands)
    print(f"resolve : {ms:7.3f} ms/img", flush=True)
    report["resolve"] = round(ms, 3)
    # pull iteration counts
    def iters_only(rb, scores, cls):
        def one(b, s, c):
            valid = s > 0
            idx, sup = fused_neighbor_iou(b, c, valid, 0.45, max_neighbors=64)
            S = densify_S(idx, sup, b.shape[0])

            def cond(st):
                alive, prev, it = st
                return jnp.logical_and(jnp.any(alive != prev), it < 2048)

            def body(st):
                alive, _, it = st
                hit = jnp.dot(S, alive.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32) > 0.0
                return (valid & ~hit, alive, it + 1)

            alive0 = valid
            _, _, iters = jax.lax.while_loop(
                cond, body, (alive0, ~alive0, jnp.int32(0)))
            return iters
        return jax.vmap(one)(rb, scores, cls)
    its = np.asarray(jax.jit(iters_only)(*cands[0]))
    print(f"while_loop iterations per image: {its.tolist()}")
    report["iters_max"] = int(its.max())

    def nms(rb, scores, cls):
        def one(b, s, c):
            return jnp.sum(RN.nms_rotated(b, s, 0.45, class_ids=c,
                                          presorted=True))
        return jnp.sum(jax.vmap(one)(rb, scores, cls))

    run("nms", nms)

    def compact(rb, scores, cls):
        def one(b, s, c):
            keep = RN.nms_rotated(b, s, 0.45, class_ids=c, presorted=True)
            det, num = RN._compact_dets(b, s, c, keep, 1500)
            return jnp.sum(det) + num
        return jnp.sum(jax.vmap(one)(rb, scores, cls))

    run("compact", compact)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
