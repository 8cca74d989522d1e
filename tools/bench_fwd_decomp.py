#!/usr/bin/env python
"""Forward + decode decomposition with XLA cost analysis.

One process, several AOT-compiled sections (each remote compile ~5 min on
this runtime — keep the count small).  For each section prints measured
ms/img plus XLA's own flops / bytes-accessed estimate, so we can tell
MXU-bound from HBM-bound from overhead-bound:

  rowmax      tiny op → dev-tunnel RTT floor
  stem2       layers 0-1
  bb10        layers 0-9 (backbone)
  fwd         full model forward
  decode_sel  staged maps → candidate top-k + theta + rboxes (pre-NMS)
  nms_maps    staged maps → full decode+NMS

Methodology per CLAUDE.md: checksum pull per call, ≥2 staged buffers.
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


def aot(fn, *args):
    t0 = time.perf_counter()
    c = jax_jit(fn).lower(*args).compile()
    dt = time.perf_counter() - t0
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    ca = ca or {}
    return c, float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0)), dt


def timeit(fn, args_list, iters=10):
    float(fn(*args_list[0]))  # warm (already compiled via AOT)
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / BATCH


def main():
    global jax_jit
    import jax
    import jax.numpy as jnp

    jax_jit = jax.jit

    from yolov5_obb_tpu.models.yolo import (YoloModel, create_model,
                                            parse_model_config, load_config)
    from yolov5_obb_tpu.ops.rotated_nms import non_max_suppression_from_maps

    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(xs)
    report = {}

    def run(label, fn, args_list):
        c, flops, bytes_, ct = aot(fn, *args_list[0])
        ms = timeit(c, args_list)
        dev_flops_ms = flops / 197e12 * 1e3 / BATCH  # v5e bf16 peak
        dev_bw_ms = bytes_ / 819e9 * 1e3 / BATCH     # v5e HBM BW
        print(
            f"{label:12s}: {ms:7.3f} ms/img   XLA flops={flops/1e9:8.1f}G "
            f"(SOL {dev_flops_ms:6.3f} ms/img)  bytes={bytes_/1e9:7.2f}GB "
            f"(SOL {dev_bw_ms:6.3f} ms/img)  [compile {ct:.0f}s]",
            flush=True,
        )
        report[label] = {
            "ms_per_img": round(ms, 3),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bytes_ / 1e9, 2),
        }
        return ms

    # RTT floor
    run("rowmax", lambda x: jnp.sum(jnp.max(
        x.astype(jnp.float32).reshape(BATCH, -1, 128), axis=-1)),
        [(x,) for x in xs])

    # model sections
    d = load_config("yolov5m.yaml")
    d["nc"] = 15
    specs, nc_, na, anc, _ = parse_model_config(d)

    def section(n_layers):
        sub = YoloModel(specs=tuple(specs[:n_layers]), nc=nc_, na=na,
                        dtype=jnp.bfloat16)
        keep = {k: v for k, v in variables["params"].items()
                if int(k[1:].split("_")[0]) < n_layers}
        keep_s = {k: v for k, v in variables["batch_stats"].items()
                  if int(k[1:].split("_")[0]) < n_layers}
        sub_vars = {"params": keep, "batch_stats": keep_s}

        def f(v, x):
            out = sub.apply(v, x.astype(jnp.float32) / 255.0, train=False)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return f, sub_vars

    f2, v2 = section(2)
    run("stem2", f2, [(v2, x) for x in xs])
    f10, v10 = section(10)
    run("bb10", f10, [(v10, x) for x in xs])

    def fwd(v, x):
        maps = model.apply(v, x.astype(jnp.float32) / 255.0, train=False)
        return sum(jnp.sum(m) for m in maps)

    run("fwd", fwd, [(variables, x) for x in xs])

    # staged maps for the post-forward stages
    mfn = jax.jit(lambda v, x: model.apply(v, x.astype(jnp.float32) / 255.0,
                                           train=False))
    maps0 = mfn(variables, xs[0])
    maps1 = jax.tree.map(lambda m: m + 0.001, maps0)
    jax.block_until_ready((maps0, maps1))

    def decode_sel(maps):
        # candidate selection only — mirrors non_max_suppression_from_maps
        # up to (but not including) nms_rotated
        nc = meta.nc
        boxes_l, conf_l, obj_l, th_l = [], [], [], []
        for li, p in enumerate(maps):
            B, ny, nx, na_, no = p.shape
            obj = jax.nn.sigmoid(p[..., 4])
            cls = jax.nn.sigmoid(p[..., 5:5 + nc]) * obj[..., None]
            gy = jnp.arange(ny, dtype=jnp.float32)[:, None, None]
            gx = jnp.arange(nx, dtype=jnp.float32)[None, :, None]
            sxy = jax.nn.sigmoid(p[..., 0:2])
            swh = jax.nn.sigmoid(p[..., 2:4])
            anchor = jnp.asarray(meta.anchors_px[li], jnp.float32)
            xq = (sxy[..., 0] * 2 - 0.5 + gx) * meta.strides[li]
            yq = (sxy[..., 1] * 2 - 0.5 + gy) * meta.strides[li]
            wh = (swh * 2) ** 2 * anchor
            box = jnp.stack([xq, yq, wh[..., 0], wh[..., 1]], axis=-1)
            n = ny * nx * na_
            boxes_l.append(box.reshape(B, n, 4))
            conf_l.append(cls.reshape(B, n, nc))
            obj_l.append(obj.reshape(B, n))
            th_l.append(p[..., 5 + nc:].reshape(B, n, no - 5 - nc))
        boxes = jnp.concatenate(boxes_l, 1)
        cls_conf = jnp.concatenate(conf_l, 1)
        obj = jnp.concatenate(obj_l, 1)
        offs = [0]
        for t in th_l[:-1]:
            offs.append(offs[-1] + t.shape[1])
        k = 2048

        def one(boxes_i, cls_conf_i, obj_i, *tls):
            best = jnp.max(cls_conf_i, axis=-1)
            cid = jnp.argmax(cls_conf_i, axis=-1)
            flat = jnp.where((best > 0.25) & (obj_i > 0.25), best, 0.0)
            scores, bidx = jax.lax.approx_max_k(flat, k)
            theta_idx = jnp.zeros((k,), jnp.int32)
            for off, tl in zip(offs, tls):
                sz = tl.shape[0]
                dense = jnp.argmax(tl, axis=-1).astype(jnp.int32)
                local = bidx - off
                ok = (local >= 0) & (local < sz)
                theta_idx = jnp.where(ok, dense[jnp.clip(local, 0, sz - 1)],
                                      theta_idx)
            theta = (theta_idx.astype(jnp.float32) - 90.0) / 180.0 * 3.14159265 / 1.0
            rb = jnp.concatenate([boxes_i[bidx], theta[:, None]], axis=-1)
            return jnp.sum(rb) + jnp.sum(scores) + jnp.sum(cid[bidx])

        return jnp.sum(jax.vmap(one)(boxes, cls_conf, obj, *th_l))

    run("decode_sel", decode_sel, [(maps0,), (maps1,)])

    def nms_maps(maps):
        dets, num = non_max_suppression_from_maps(
            maps, meta, conf_thres=0.25, iou_thres=0.45,
            max_candidates=2048, max_det=1500, multi_label=False,
        )
        return jnp.sum(dets) + jnp.sum(num)

    run("nms_maps", nms_maps, [(maps0,), (maps1,)])

    print(json.dumps(report))


if __name__ == "__main__":
    main()
