#!/usr/bin/env python
"""Train-step throughput benchmark: yolov5m b16@1024, bf16, single chip.

Reference point (BASELINE.md / docs/ChangeLog.md:7-10): 59 fps on a 2080Ti
at bs75. Methodology per CLAUDE.md: batches staged on device, loss checksum
pulled every `sync_every` steps (matching the async train loop, which only
syncs at log points).
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
IMGSZ = 1024
# train.py defaults to --max-labels 500 on real DOTA; 64 keeps the legacy
# bench regime (BENCH_MAXL to override)
MAX_LABELS = int(os.environ.get("BENCH_MAXL", 64))


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.engine.optim import build_optimizer
    from yolov5_obb_tpu.engine.trainer import create_train_state, make_train_step
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.general import load_hyp

    from yolov5_obb_tpu.utils.general import scale_hyp_gains

    hyp = load_hyp(None)
    # PACKED=0 disables the train-mode packed-stem Pallas kernels (A/B)
    packed = bool(int(os.environ.get(
        "PACKED", "1" if jax.default_backend() == "tpu" else "0")))
    # mirror train.py's default: bf16 BN/SiLU on TPU (YOLO_BN_HALF=0 A/Bs)
    os.environ.setdefault(
        "YOLO_BN_HALF", "1" if jax.default_backend() == "tpu" else "0")
    # FUSED=1 enables the stat-carrying fused train region (A/B; default
    # mirrors train.py: OFF — measured 94.73 vs 95.47 img/s stock, r5)
    fused = bool(int(os.environ.get("FUSED", "0"))) and packed
    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ,
        packed_stem=packed, fused_train=fused,
    )
    loss_fn = ComputeLoss(meta, scale_hyp_gains(hyp, meta.nl, meta.nc, IMGSZ))
    tx, _ = build_optimizer(
        variables["params"], hyp, epochs=10, steps_per_epoch=100,
        batch_size=BATCH, nominal_batch=BATCH,
    )
    state = create_train_state(variables, tx)
    # REMAT=selective|full A/Bs the rematerialisation policy (see trainer)
    step_fn = make_train_step(model, loss_fn, tx,
                              remat=os.environ.get("REMAT", "") or False)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(2):
        img = rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)
        if packed:
            img = img.reshape(BATCH, IMGSZ, -1)  # free host view
        tg = np.zeros((BATCH, MAX_LABELS, 186), np.float32)
        tg[:, :8, 0] = rng.integers(0, 15, (BATCH, 8))
        tg[:, :8, 1:3] = rng.uniform(100, 900, (BATCH, 8, 2))
        tg[:, :8, 3:5] = rng.uniform(20, 120, (BATCH, 8, 2))
        tg[:, :8, 5] = rng.uniform(-1.5, 1.5, (BATCH, 8))
        tg[:, :8, 6:] = rng.uniform(0, 1, (BATCH, 8, 180))
        mask = np.zeros((BATCH, MAX_LABELS), bool)
        mask[:, :8] = True
        batches.append(tuple(map(jax.device_put, (img, tg, mask))))
    jax.block_until_ready(batches)

    state, m = step_fn(state, *batches[0])  # compile
    float(m["loss"])
    state, m = step_fn(state, *batches[1])  # warm
    float(m["loss"])

    iters, sync_every = 12, 4
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_fn(state, *batches[i % 2])
        if (i + 1) % sync_every == 0:
            float(m["loss"])
    dt = time.perf_counter() - t0
    imgs_per_s = iters * BATCH / dt
    print(json.dumps({
        "metric": "yolov5m_b16_1024_train_imgs_per_s",
        "value": round(imgs_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / 59.0, 3),
    }))


if __name__ == "__main__":
    main()
