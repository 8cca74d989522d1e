#!/usr/bin/env python
"""Train input-pipeline throughput: the real loader (mosaic/affine/HSV at
1024px) measured against the device step rate.

VERDICT r1 flagged that the 92.9 img/s train figure was synthetic-batch
only — the one-core dev host + mosaic at 1024 is a starvation risk that was
never measured (reference counterpart: utils/datasets.py:95-156 worker
pipeline). This tool measures:

  1. host pipeline rate, cold (per-sample decode + mosaic + affine + HSV)
  2. host pipeline rate with --cache ram (decode amortized away)
  3. projected steady-state train rate = min(host rate, device step rate)

Run CPU-only (`PYTHONPATH= JAX_PLATFORMS=cpu python tools/bench_train_pipeline.py`);
the device step rate is taken from tools/bench_train.py's measured figure
(BENCH_STEP_IMGS_PER_S env, default 92.9) rather than re-burning the dev
tunnel. On a production TPU host the pipeline scales with cores (Grain
workers); this box has one core, so the numbers here are the worst case.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))
BATCH = int(os.environ.get("BENCH_BATCH", 16))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", 48))
WORKERS = int(os.environ.get("BENCH_WORKERS", 0))
STEP_RATE = float(os.environ.get("BENCH_STEP_IMGS_PER_S", 92.9))


def _rate(ds, seed, n_batches):
    from yolov5_obb_tpu.data.loader import create_dataloader

    loader = create_dataloader(ds, BATCH, shuffle=True, augment=True,
                               seed=seed, num_workers=WORKERS, num_epochs=None)
    it = iter(loader)
    next(it)  # warm: one batch through (touches decode caches, ram fill pass
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        b = next(it)
        n += len(b.image)
    return n / (time.perf_counter() - t0)


def main():
    from conftest import build_mini_dota

    from yolov5_obb_tpu.data.dota import DOTA_V1_NAMES, DotaDataset
    from yolov5_obb_tpu.utils.general import load_hyp

    root = Path(os.environ.get("BENCH_DATA", "/tmp/bench_pipe_data"))
    if not (root / "images").exists():
        build_mini_dota(root, n_images=N_IMAGES, n_boxes=24,
                        hw=(IMGSZ + 64, IMGSZ + 64), seed=3)
    hyp = load_hyp(None)  # default hyp: mosaic 1.0, full affine + HSV + flips

    n_batches = max(2 * N_IMAGES // BATCH, 4)
    results = {}
    for tag, cache in (("cold", None), ("cache_ram", "ram")):
        ds = DotaDataset(root / "images", DOTA_V1_NAMES, img_size=IMGSZ,
                         hyp=hyp, augment=True, max_labels=64,
                         cache_dir=str(root / "cache"), cache_images=cache)
        if cache == "ram":
            for i in range(len(ds)):  # fill the cache before timing
                ds.load_image(i)
        results[tag] = _rate(ds, seed=1, n_batches=n_batches)

    # --cache shards: pre-augmented mmap replay (train.py --cache shards)
    from yolov5_obb_tpu.data.shards import ShardDataset, write_shards

    sdir = root / "cache" / "shards"
    t0 = time.perf_counter()
    if not (sdir / "meta.json").exists():
        write_shards(ds, sdir, aug_epochs=2, seed=0, verbose=False)
        results["shards_build_s"] = round(time.perf_counter() - t0, 1)
    results["shards"] = _rate(ShardDataset(sdir), seed=1, n_batches=n_batches)

    host = max(results["cache_ram"], results["shards"])
    projected = min(host, STEP_RATE)
    print(json.dumps({
        "metric": "train_pipeline_imgs_per_s",
        "host_cold": round(results["cold"], 2),
        "host_cache_ram": round(results["cache_ram"], 2),
        "host_shards": round(results["shards"], 2),
        "shards_build_s": results.get("shards_build_s"),
        "device_step": STEP_RATE,
        "value": round(projected, 2),
        "unit": "img/s",
        "vs_baseline": round(projected / 59.0, 3),
        "note": "projected = min(host pipeline, device step); one-core host",
    }))


if __name__ == "__main__":
    main()
