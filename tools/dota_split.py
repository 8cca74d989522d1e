#!/usr/bin/env python
"""Tile a DOTA dataset into training patches (reference DOTA_devkit/ImgSplit_multi_process.py
and prepare_dota1_ms.py).

Usage:
    python tools/dota_split.py --src /data/dota/train --dst /data/dotav1_split/train \
        --subsize 1024 --gap 200 --rates 1.0            # single-scale
    python tools/dota_split.py ... --rates 0.5 1.0 1.5  # multi-scale
    python tools/dota_split.py ... --no-labels          # test set (images only)
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from yolov5_obb_tpu.devkit.img_split import split_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="split dir containing images/ [+ labelTxt/]")
    p.add_argument("--dst", required=True)
    p.add_argument("--subsize", type=int, default=1024)
    p.add_argument("--gap", type=int, default=200)
    p.add_argument("--thresh", type=float, default=0.7)
    p.add_argument("--rates", type=float, nargs="+", default=[1.0])
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--ext", type=str, default=".png")
    p.add_argument("--no-labels", action="store_true")
    a = p.parse_args()
    total = 0
    for rate in a.rates:
        n = split_dataset(
            a.src, a.dst, rate=rate, subsize=a.subsize, gap=a.gap,
            thresh=a.thresh, num_workers=a.workers, ext=a.ext,
            with_labels=not a.no_labels,
        )
        print(f"rate {rate}: {n} tiles")
        total += n
    print(f"done: {total} tiles → {a.dst}")


if __name__ == "__main__":
    main()
