#!/usr/bin/env python
"""End-to-end benchmark: yolov5m @1024, batch 16, inference + decode + rotated NMS.

Baseline (BASELINE.md): 11.3 ms/img on RTX 2080Ti (batch 16 @1024, includes
preprocess + NMS).  Prints one JSON line; ``vs_baseline`` is the speedup
ratio baseline_ms / our_ms (>1 = faster than the reference).
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

BASELINE_MS = 11.3
BATCH = int(os.environ.get("BENCH_BATCH", 16))  # driver runs the default b16
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))
# Candidate-selection cap (per image). The default is sized for the
# realistic density regime; BENCH_MAXC=1024 is the b1 latency knob.
MAXC = int(os.environ.get("BENCH_MAXC", 2048))
# BENCH_WEIGHTS=<orbax dir> (+ optional BENCH_CFG) benches a real trained
# checkpoint instead of the density-tuned random weights: the detection
# density is then whatever the training produced — fully honest NMS graph
# (tools/golden_e2e.py produces such checkpoints). Pair it with
# BENCH_IMAGES=<dir> so the model sees its own data distribution — a
# trained checkpoint detects nothing on the default random-noise batches.
WEIGHTS = os.environ.get("BENCH_WEIGHTS", "")
IMAGES = os.environ.get("BENCH_IMAGES", "")
CFG = os.environ.get("BENCH_CFG", "yolov5m.yaml")
# Target detections/img at conf 0.25. Fresh random weights detect nothing
# (focal bias priors put obj conf at ~1e-3), which leaves the NMS
# suppression graph empty — the greedy while_loop converges in one sweep
# and the bench understates NMS. The bench therefore spreads the cls
# biases and tunes an obj-bias delta (bisection on device, no recompiles)
# until the model emits a realistic detection density, like a trained
# checkpoint does. BENCH_DENSITY=0 restores the legacy empty-graph regime.
DENSITY = int(os.environ.get("BENCH_DENSITY", "300"))


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import make_predict_fn, pack_images
    from yolov5_obb_tpu.models.yolo import create_model

    packed = jax.default_backend() == "tpu"
    model, variables, meta = create_model(
        CFG, nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ,
        packed_stem=packed,
    )
    from flax.core import unfreeze

    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    det_name = f"m{len(model.specs) - 1}"
    no, na, nc, nl = meta.no, meta.na, meta.nc, meta.nl
    if WEIGHTS:
        from yolov5_obb_tpu.utils.checkpoint import (
            load_weights,
            restore_model_meta,
        )

        variables, wmeta = load_weights(WEIGHTS)
        restore_model_meta(meta, wmeta)
    if DENSITY and not WEIGHTS:
        # spread the cls biases so conf = obj*cls can clear 0.25 for some
        # (anchor, class) pairs (same recipe as tools/parity_vs_torch.py)
        v = unfreeze(variables)
        det = v["params"][det_name]
        rngb = np.random.default_rng(7)
        for li in range(nl):
            b = np.asarray(det[f"conv{li}"]["bias"]).reshape(na, no).copy()
            b[:, 5:5 + nc] += rngb.normal(0.0, 2.0, (na, nc))
            det[f"conv{li}"]["bias"] = jnp.asarray(b.reshape(-1))
        variables = v

    # folding hands back host-numpy params — stage them on device once, or
    # every call re-uploads them (ruinous through the dev tunnel)
    variables = jax.device_put(unfreeze(fuse_for_inference(variables)))
    jax.block_until_ready(variables)

    def apply_obj_delta(v, delta):
        """Functionally add ``delta`` to every Detect obj bias (traced —
        delta is a runtime scalar, so tuning never recompiles)."""
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
        multi_label=False, max_candidates=MAXC,
    )

    rng = np.random.default_rng(0)
    # Batches are staged on device up front: in this dev environment the TPU
    # sits behind a network tunnel (~7 MB/s device_put), which is not
    # representative of a production host's DMA path.  The timed region is
    # the full on-device pipeline: normalize → convs → decode → rotated NMS
    # (what the reference's 11.3 ms/img figure measures apart from its
    # sub-ms H2D copy).  Each timed call pulls a scalar checksum back to the
    # host — async dispatch on this runtime can otherwise report bogus
    # times — so the measurement also includes one tunnel round trip
    # (~2 ms/img here, ~0 on a production host).
    if IMAGES:
        from yolov5_obb_tpu.data.dota import _scan_images

        image_paths = _scan_images(IMAGES)
        # the timing loop cycles 3 buffers which MUST be pairwise distinct
        # (CLAUDE.md methodology: identical device buffers let this
        # runtime's dispatch path coalesce work and report bogus times)
        assert len(image_paths) >= 2, (
            f"BENCH_IMAGES needs >=2 images for distinct buffers, "
            f"got {len(image_paths)} in {IMAGES}")

    def make_batch(i):
        if IMAGES:
            import cv2

            from yolov5_obb_tpu.data.augment import letterbox

            imgs = []
            for k in range(BATCH):
                # stride-7 start offset per buffer: distinct batches even
                # when the directory holds fewer images than BATCH
                p = image_paths[(i * 7 + k) % len(image_paths)]
                im = cv2.imread(str(p))
                im, _, _ = letterbox(im, IMGSZ, auto=False, scaleup=True)
                imgs.append(np.ascontiguousarray(im[:, :, ::-1]))
            return np.stack(imgs)
        return rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)

    xs = [
        jax.device_put(pack_images(make_batch(i)) if packed else make_batch(i))
        for i in range(3)
    ]
    jax.block_until_ready(xs)

    dets_per_img = 0.0
    if WEIGHTS:
        @jax.jit
        def count_dets0(v, x):
            _, num = predict(v, x)
            return jnp.mean(num.astype(jnp.float32))

        dets_per_img = float(count_dets0(variables, xs[0]))
        print(f"trained weights: {dets_per_img:.0f} dets/img")
    if DENSITY and not WEIGHTS:
        @jax.jit
        def count_dets(v, x, delta):
            _, num = predict(apply_obj_delta(v, delta), x)
            return jnp.mean(num.astype(jnp.float32))

        lo, hi = 0.0, 10.0  # dets/img is monotone in the obj-bias delta
        for _ in range(7):
            mid = (lo + hi) / 2
            if float(count_dets(variables, xs[0], mid)) < DENSITY:
                lo = mid
            else:
                hi = mid
        delta = (lo + hi) / 2
        variables = jax.jit(apply_obj_delta)(variables, delta)
        jax.block_until_ready(variables)
        dets_per_img = float(count_dets(variables, xs[1], 0.0))
        print(f"density: obj delta {delta:.3f} -> {dets_per_img:.0f} dets/img")

    @jax.jit
    def run(v, x):
        dets, num = predict(v, x)
        return jnp.sum(dets) + jnp.sum(num)

    @jax.jit
    def run_acc(v, x, acc):
        # checksum chained through a device accumulator: the final scalar
        # pull has a data dependency on EVERY dispatched batch, so async
        # dispatch overlaps the dev-tunnel RTT with on-device compute
        # (a production host pipelines exactly like this; the reference's
        # CUDA stream does the same implicitly)
        dets, num = predict(v, x)
        return acc + jnp.sum(dets) + jnp.sum(num)

    import os

    mode = os.environ.get("BENCH_MODE", "pipelined")
    iters = 12
    if mode == "sync":
        float(run(variables, xs[0]))  # compile
        float(run(variables, xs[1]))  # warm
        t0 = time.perf_counter()
        for i in range(iters):
            float(run(variables, xs[i % 3]))
        dt = (time.perf_counter() - t0) / iters
    else:
        acc0 = jax.device_put(np.zeros((), np.float32))
        float(run_acc(variables, xs[0], acc0))  # compile
        acc = run_acc(variables, xs[1], acc0)   # warm
        float(acc)
        t0 = time.perf_counter()
        acc = acc0
        for i in range(iters):
            acc = run_acc(variables, xs[i % 3], acc)
        final = float(acc)  # forces completion of the full chain
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(final)
    ms_per_img = dt * 1000.0 / BATCH

    print(
        json.dumps(
            {
                "metric": f"yolov5m_b{BATCH}_{IMGSZ}_infer_nms_ms_per_img",
                "value": round(ms_per_img, 3),
                "unit": "ms/img",
                "vs_baseline": round(BASELINE_MS / ms_per_img, 3),
                "dets_per_img": round(dets_per_img, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
