#!/usr/bin/env python
"""approx_max_k vs exact top_k candidate selection: keep-set + timing A/B.

VERDICT r3 weak #3: ``non_max_suppression_obb`` defaults to
``jax.lax.approx_max_k`` on the accuracy-bearing val/detect path, but every
test and the torch-parity harness force exact ``top_k`` — the approximate
selector's recall was never verified. On CPU ``approx_max_k`` lowers to an
exact sort, so only a hardware run answers the question.

This tool reproduces the bench's realistic regime (yolov5m @1024, tuned
Detect biases → BENCH_DENSITY dets/img) and compares the FINAL detection
sets (post-NMS) of the approx and exact selectors at the production val
settings (multi_label, max_candidates=4096), plus the e2e time of each.

Run on TPU: python tools/check_approx_topk_tpu.py
Env: DENSITY (default 300), CONF (default 0.25), BATCH (default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

IMGSZ = 1024
BATCH = int(os.environ.get("BATCH", 16))
DENSITY = int(os.environ.get("DENSITY", 300))
CONF = float(os.environ.get("CONF", 0.25))
MAXC = int(os.environ.get("MAXC", 4096))


def match_sets(a, na, b, nb):
    """Greedy center+class match of two (n,7) det lists → dict of diffs."""
    a, b = np.asarray(a)[:na], np.asarray(b)[:nb]
    if not len(a) and not len(b):
        return dict(unmatched=0, conf_dev=0.0, xy_dev=0.0)
    d2 = ((a[:, None, :2] - b[None, :, :2]) ** 2).sum(-1)
    d2 = np.where(a[:, 6:7] == b[None, :, 6], d2, np.inf)
    d2 = np.where(d2 < 1.0, d2, np.inf)  # within 1px = same detection
    taken = np.zeros(len(b), bool)
    unmatched, conf_dev, xy_dev = abs(len(a) - len(b)), 0.0, 0.0
    for i in range(len(a)):
        j = int(np.argmin(np.where(taken, np.inf, d2[i]))) if len(b) else 0
        if len(b) and np.isfinite(d2[i, j]) and not taken[j]:
            taken[j] = True
            conf_dev = max(conf_dev, float(abs(a[i, 5] - b[j, 5])))
            xy_dev = max(xy_dev, float(np.abs(a[i, :2] - b[j, :2]).max()))
        else:
            unmatched += 1
    return dict(unmatched=unmatched, conf_dev=conf_dev, xy_dev=xy_dev)


def main():
    import jax
    import jax.numpy as jnp
    from flax.core import unfreeze

    from yolov5_obb_tpu.engine.evaluator import pack_images
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.ops.rotated_nms import non_max_suppression_from_maps
    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    packed = jax.default_backend() == "tpu"
    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ,
        packed_stem=packed)
    det_name = f"m{len(model.specs) - 1}"
    no, na, nc, nl = meta.no, meta.na, meta.nc, meta.nl

    # bench.py's density recipe: spread cls biases, bisect an obj-bias delta
    v = unfreeze(variables)
    det = v["params"][det_name]
    rngb = np.random.default_rng(7)
    for li in range(nl):
        b = np.asarray(det[f"conv{li}"]["bias"]).reshape(na, no).copy()
        b[:, 5:5 + nc] += rngb.normal(0.0, 2.0, (na, nc))
        det[f"conv{li}"]["bias"] = jnp.asarray(b.reshape(-1))
    variables = jax.device_put(unfreeze(fuse_for_inference(v)))
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

    def nms(maps, approx):
        return non_max_suppression_from_maps(
            maps, meta, conf_thres=CONF, iou_thres=0.45,
            max_candidates=MAXC, max_det=1500, multi_label=True,
            approx_topk=approx)

    def mk(approx):
        @jax.jit
        def predict(v, x):
            maps = model.apply(v, x, train=False, flat=True)
            return nms(maps, approx)
        return predict

    pred_a, pred_e = mk(True), mk(False)

    rng = np.random.default_rng(0)
    xs = [jax.device_put(pack_images(
        rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), np.uint8))
        if packed else
        rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), np.uint8))
        for _ in range(3)]
    jax.block_until_ready(xs)

    @jax.jit
    def count_dets(v, x, delta):
        _, num = pred_e(apply_obj_delta(v, delta), x)
        return jnp.mean(num.astype(jnp.float32))

    lo, hi = 0.0, 10.0
    for _ in range(7):
        mid = (lo + hi) / 2
        if float(count_dets(variables, xs[0], mid)) < DENSITY:
            lo = mid
        else:
            hi = mid
    variables = jax.jit(apply_obj_delta)(variables, (lo + hi) / 2)
    jax.block_until_ready(variables)

    # --- correctness: final det sets on the same inputs ---
    worst = dict(unmatched=0, conf_dev=0.0, xy_dev=0.0)
    tot_a = tot_e = 0
    for x in xs:
        da, nums_a = jax.block_until_ready(pred_a(variables, x))
        de, nums_e = jax.block_until_ready(pred_e(variables, x))
        da, de = np.asarray(da), np.asarray(de)
        nums_a, nums_e = np.asarray(nums_a), np.asarray(nums_e)
        tot_a += int(nums_a.sum())
        tot_e += int(nums_e.sum())
        for i in range(BATCH):
            m = match_sets(de[i], nums_e[i], da[i], nums_a[i])
            for k in worst:
                worst[k] = max(worst[k], m[k])

    # --- timing: pipelined accumulator chain (CLAUDE.md methodology) ---
    def timeit(pred):
        @jax.jit
        def run_acc(v, x, acc):
            dets, num = pred(v, x)
            return acc + jnp.sum(dets) + jnp.sum(num)

        acc0 = jax.device_put(np.zeros((), np.float32))
        float(run_acc(variables, xs[0], acc0))
        float(run_acc(variables, xs[1], acc0))
        t0 = time.perf_counter()
        acc = acc0
        for i in range(12):
            acc = run_acc(variables, xs[i % 3], acc)
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / 12 * 1000 / BATCH

    t_a, t_e = timeit(pred_a), timeit(pred_e)

    print(json.dumps(dict(
        density=round(tot_e / (3 * BATCH), 1),
        dets_approx=tot_a, dets_exact=tot_e,
        worst_unmatched_per_img=worst["unmatched"],
        conf_dev=worst["conf_dev"], xy_dev=worst["xy_dev"],
        approx_ms_per_img=round(t_a, 3), exact_ms_per_img=round(t_e, 3),
        conf=CONF, max_candidates=MAXC,
    )))


if __name__ == "__main__":
    main()
