#!/usr/bin/env python
"""Merge per-tile detections and compute exact OBB mAP (reference
DOTA_devkit/ResultMerge_multi_process.py + dota_evaluation_task1.py +
tools/TestJson2VocClassTxt.py).

Typical flow after ``val.py --save-json`` on a split val/test set:
    python tools/dota_merge_eval.py --json runs/val/exp/best_obb_predictions.json \
        --data yolov5_obb_tpu/data/configs/dotav1.yaml \
        --anno /data/dota/val/labelTxt --out runs/val/exp/merged
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from yolov5_obb_tpu.devkit.converters import json_to_task1
from yolov5_obb_tpu.devkit.evaluate import evaluate_maoe, evaluate_task1
from yolov5_obb_tpu.devkit.result_merge import merge_by_poly_nms, results_obb2hbb
from yolov5_obb_tpu.utils.general import load_dataset_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", help="val.py --save-json output")
    p.add_argument("--task1", help="or: dir of raw per-class Task1 txts")
    p.add_argument("--data", required=True, help="dataset yaml (names)")
    p.add_argument("--out", required=True)
    p.add_argument("--nms-thresh", type=float, default=0.2)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--anno", help="original (unsplit) labelTxt dir → run OBB mAP")
    p.add_argument("--imageset", help="txt of image ids; default = all in --anno")
    p.add_argument("--ovthresh", type=float, default=0.5)
    p.add_argument("--maoe", action="store_true", help="also compute mAOE")
    p.add_argument("--obb2hbb", action="store_true", help="emit Task2 HBB files too")
    a = p.parse_args()

    names = load_dataset_config(a.data)["names"]
    out = Path(a.out)

    raw = Path(a.task1) if a.task1 else json_to_task1(a.json, out / "task1_raw", names)
    merged = out / "task1_merged"
    merge_by_poly_nms(raw, merged, nms_thresh=a.nms_thresh, num_workers=a.workers)
    print(f"merged results → {merged}")
    if a.obb2hbb:
        results_obb2hbb(merged, out / "task2_merged")
        print(f"HBB results → {out / 'task2_merged'}")

    if a.anno:
        image_ids = a.imageset or sorted(
            f.stem for f in Path(a.anno).glob("*.txt")
        )
        mean_ap, classaps = evaluate_task1(
            merged, a.anno, image_ids, names, ovthresh=a.ovthresh
        )
        print("classaps:")
        for k, v in classaps.items():
            print(f"  {k:>22}: {100 * v:.2f}")
        print(f"map: {mean_ap:.4f}")
        if a.maoe:
            maoe, per_cls = evaluate_maoe(merged, a.anno, image_ids, names)
            print(f"mAOE: {maoe:.2f}° ({per_cls})")


if __name__ == "__main__":
    main()
