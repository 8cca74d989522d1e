#!/usr/bin/env python
"""Sub-stage split of the decode+NMS path on the current backend.

Stages timed (each incl. one checksum RTT):
  A decode+candidate-topk only (no nms_rotated)
  B full decode+NMS with the fixed-point while_loop
  C full decode+NMS with suppression capped at 4 sweeps (gauges loop depth)
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

    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    maps_list = []
    fwd = jax.jit(lambda v, x: model.apply(v, x.astype(jnp.float32) / 255.0, train=False))
    for x in xs:
        maps_list.append(fwd(variables, x))
    jax.block_until_ready(maps_list)

    # --- stage A: decode + candidate top-k only --------------------------
    def decode_topk(maps):
        nc = meta.nc
        boxes_l, conf_l, obj_l = [], [], []
        for li, p in enumerate(maps):
            B, ny, nx, na, no = p.shape
            obj = jax.nn.sigmoid(p[..., 4])
            cls = jax.nn.sigmoid(p[..., 5 : 5 + nc]) * obj[..., None]
            n = ny * nx * na
            conf_l.append(cls.reshape(B, n, nc))
            obj_l.append(obj.reshape(B, n))
        cls_conf = jnp.concatenate(conf_l, 1)
        obj = jnp.concatenate(obj_l, 1)
        best = jnp.max(cls_conf, axis=-1)
        flat = jnp.where((best > 0.25) & (obj > 0.25), best, 0.0)
        scores, box_idx = jax.lax.approx_max_k(flat, 2048)
        return jnp.sum(scores) + jnp.sum(box_idx)

    ms_a = timeit(jax.jit(decode_topk), [(m,) for m in maps_list])
    print(f"A decode+topk only:      {ms_a:.3f} ms/img")

    # --- stage B: full (while_loop) --------------------------------------
    def full(maps):
        dets, num = RN.non_max_suppression_from_maps(
            maps, meta, conf_thres=0.25, iou_thres=0.45,
            max_candidates=2048, max_det=1500, multi_label=False,
        )
        return jnp.sum(dets) + jnp.sum(num)

    ms_b = timeit(jax.jit(full), [(m,) for m in maps_list])
    print(f"B full decode+NMS:       {ms_b:.3f} ms/img")

    # --- stage C: suppression loop capped at 4 sweeps ---------------------
    orig_nms = RN.nms_rotated

    def capped_nms(rboxes, scores, iou_thr, class_ids=None,
                   max_neighbors=64, approx_topk=False):
        import functools

        # monkeypatched copy of nms_rotated with a 4-sweep cap
        n = scores.shape[0]
        M = min(max_neighbors, n)
        order = jnp.argsort(-scores)
        b = rboxes[order]
        s = scores[order]
        valid = s > 0
        hiou = RN._hbb_iou_matrix(RN._hbb_cover(b))
        tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
        edge_ok = tri & valid[None, :] & valid[:, None]
        if class_ids is not None:
            c = class_ids[order]
            edge_ok = edge_ok & (c[:, None] == c[None, :])
        cand = jnp.where(edge_ok, hiou, -1.0)
        nbr_iou, nbr_idx = jax.lax.approx_max_k(cand, M)
        nbr_valid = nbr_iou > 0.0
        if jax.default_backend() == "tpu":
            from yolov5_obb_tpu.ops.pallas.iou_kernel import sparse_rotated_iou

            riou = sparse_rotated_iou(b, nbr_idx)
        else:
            riou = RN.rotated_iou(b[:, None, :], b[nbr_idx])
        sup_in = nbr_valid & (riou > iou_thr)
        alive = valid
        for _ in range(4):
            alive = valid & ~jnp.any(sup_in & alive[nbr_idx], axis=-1)
        return jnp.zeros_like(alive).at[order].set(alive)

    RN.nms_rotated = capped_nms
    try:
        def full_capped(maps):
            dets, num = RN.non_max_suppression_from_maps(
                maps, meta, conf_thres=0.25, iou_thres=0.45,
                max_candidates=2048, max_det=1500, multi_label=False,
            )
            return jnp.sum(dets) + jnp.sum(num)

        ms_c = timeit(jax.jit(full_capped), [(m,) for m in maps_list])
    finally:
        RN.nms_rotated = orig_nms
    print(f"C full, 4-sweep cap:     {ms_c:.3f} ms/img")

    print(json.dumps({"decode_topk": round(ms_a, 3), "full": round(ms_b, 3),
                      "capped4": round(ms_c, 3)}))


if __name__ == "__main__":
    main()
