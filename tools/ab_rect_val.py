#!/usr/bin/env python
"""A/B: exact-square letterbox val vs reference-style rect pad-0.5 canvas.

Quantifies the one deliberate val-path deviation (VERDICT r4 missing #3):
the reference evaluates aspect-sorted rect batches with pad 0.5 (reference
val.py:167, utils/datasets.py:470-492). DOTA val tiles are square, so its
rect batching degenerates to a single ceil(imgsz/32+.5)*32 canvas (1056 for
1024; 224 for 192) at UNCHANGED content scale — the deviation is only a
16 px border and +~6-36% padded pixels.

Runs the in-repo golden checkpoint (releases/golden_yolov5n_192) on the
regenerated golden tileset both ways and prints mAP + ms/img for each.

Run (CPU ok for mAP; TPU for honest speed):
    python tools/ab_rect_val.py [--imgsz 192]
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ab_rect")
    ap.add_argument("--imgsz", type=int, default=192)
    ap.add_argument("--weights", default="releases/golden_yolov5n_192")
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()

    import val as val_cli
    from golden_e2e import generate_raw, write_configs
    from yolov5_obb_tpu.devkit.img_split import split_dataset

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    # the r4 golden setting: 10 imgs @768, subsize 384 → 90 tiles (seeded)
    raw = generate_raw(out / "raw", n_images=10, size=768, seed=3)
    split_dataset(raw, out / "split", rate=1.0, subsize=384, gap=128,
                  num_workers=1)
    data_yaml, _ = write_configs(out, out / "split")

    rows = {}
    for tag, pad in (("square", 0.0), ("rect_pad0.5", 0.5)):
        vopt = types.SimpleNamespace(
            weights=a.weights, cfg="yolov5n.yaml", data=str(data_yaml),
            task="val", imgsz=a.imgsz, batch_size=a.batch,
            conf_thres=0.01, iou_thres=0.4, max_det=300, max_images=None,
            save_json=False, save_task1=False, save_txt=False,
            save_conf=False, hyp=None, project=str(out / "val"), name=tag,
            exist_ok=True, rect_pad=pad, no_plots=True,
        )
        res = val_cli.run(vopt)
        rows[tag] = {
            "map50_hbb": round(float(res["map50"]), 4),
            "map_hbb": round(float(res["map"]), 4),
            "ms_per_img": round(float(res["speed_ms_per_img"]), 2),
        }
        print(f"[{tag}] {rows[tag]}")
    rows["delta_map50"] = round(
        rows["rect_pad0.5"]["map50_hbb"] - rows["square"]["map50_hbb"], 4)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
