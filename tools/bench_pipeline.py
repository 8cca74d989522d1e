#!/usr/bin/env python
"""Host input-pipeline throughput: the real DOTA loader (mosaic, affine,
HSV, CSL encode) measured against the device train-step rate.

The reference's train loop overlaps DataLoader workers with GPU compute
(datasets.py:113-122); the TPU loop overlaps Grain workers with the jitted
step.  In this dev container the TPU sits behind a slow network tunnel and
the host has ONE core, so a true overlapped measurement is not
representative of production — instead this tool measures the host
pipeline in isolation and reports the scaling margin:

    cores_needed = device_imgs_per_s / (host_imgs_per_s_per_core)

Grain worker processes scale linearly with cores (each sample is
independent), so a production host with >= cores_needed cores does not
starve the chip.

Usage: python tools/bench_pipeline.py [--device-rate 92.9]
Prints one JSON line per pipeline variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

IMGSZ = 1024


def build_dataset_on_disk(root: Path, n_images: int = 24, size: int = 1024):
    sys.path.insert(0, str(Path(__file__).parent))
    from golden_e2e import generate_raw

    if not (root / "images").exists() or \
            len(list((root / "images").glob("*.png"))) < n_images:
        generate_raw(root, n_images=n_images, size=size, grid=6, seed=11)
    return root


def measure(ds, augment: bool, n_samples: int, label: str, device_rate: float):
    rng = np.random.default_rng(0)
    # warm one sample (lazy caches, first-touch imports)
    ds.get_train_sample(0, rng) if augment else ds.get_eval_sample(0)
    t0 = time.perf_counter()
    for k in range(n_samples):
        i = k % len(ds)
        if augment:
            ds.get_train_sample(i, rng)
        else:
            ds.get_eval_sample(i)
    dt = time.perf_counter() - t0
    per_core = n_samples / dt
    print(json.dumps({
        "metric": f"host_pipeline_{label}_imgs_per_s_per_core",
        "value": round(per_core, 2),
        "unit": "img/s/core",
        "cores_to_saturate_device": round(device_rate / per_core, 1),
        "ms_per_img": round(1000 * dt / n_samples, 1),
    }))
    return per_core


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device-rate", type=float, default=92.9,
                   help="device train img/s to compare against "
                        "(PARITY.md train bench)")
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--root", type=str, default="/tmp/bench_pipeline_ds")
    a = p.parse_args()

    from yolov5_obb_tpu.data.dota import DOTA_V1_NAMES, DotaDataset
    from yolov5_obb_tpu.utils.general import load_hyp

    root = build_dataset_on_disk(Path(a.root))
    hyp = load_hyp(None)
    hyp.update(dict(mosaic=1.0, mixup=0.0))

    # full aug pipeline, cold decode every sample
    ds = DotaDataset(str(root / "images"), DOTA_V1_NAMES, img_size=IMGSZ,
                     hyp=hyp, augment=True, max_labels=256)
    measure(ds, True, a.n, "mosaic_cold", a.device_rate)

    # RAM image cache (reference --cache ram): decode once, mosaic from cache
    ds_ram = DotaDataset(str(root / "images"), DOTA_V1_NAMES, img_size=IMGSZ,
                         hyp=hyp, augment=True, max_labels=256,
                         cache_images="ram", cache_dir=str(root / "_c"))
    measure(ds_ram, True, a.n, "mosaic_ram_cache", a.device_rate)

    # eval path (letterbox only)
    measure(ds_ram, False, a.n, "eval_letterbox", a.device_rate)


if __name__ == "__main__":
    main()
