#!/usr/bin/env python
"""Validation CLI: HBB metrics + DOTA-format outputs (reference val.py).

Usage:
    python val.py --weights runs/train/exp/best --data .../dotav1.yaml \
        --cfg yolov5m.yaml --imgsz 1024 --batch-size 8 --save-json

The printed HBB mAP matches the reference's in-train metric (val.py:241-244);
exact OBB mAP comes from the devkit evaluator on the merged Task1 files.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from yolov5_obb_tpu.data.dota import DotaDataset
from yolov5_obb_tpu.engine.evaluator import evaluate, save_dota_task1
from yolov5_obb_tpu.models.yolo import create_model
from yolov5_obb_tpu.utils.checkpoint import load_weights
from yolov5_obb_tpu.utils.general import increment_path, load_dataset_config, load_hyp


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5n.yaml")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--task", type=str, default="val",
                   choices=["train", "val", "test", "speed", "study"])
    p.add_argument("--study-sizes", type=int, nargs="+",
                   default=list(range(256, 1536 + 1, 128)),
                   help="imgsz sweep for --task study")
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--conf-thres", type=float, default=None,
                   help="default 0.01 (0.25 for --task speed, matching "
                        "reference val.py's speed regime)")
    p.add_argument("--iou-thres", type=float, default=0.4, help="NMS IoU threshold")
    p.add_argument("--max-det", type=int, default=1500)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--save-json", action="store_true")
    p.add_argument("--save-txt", action="store_true",
                   help="per-image normalized HBB txts (labels/<stem>.txt)")
    p.add_argument("--save-conf", action="store_true",
                   help="append confidence to --save-txt rows")
    p.add_argument("--save-task1", action="store_true", help="per-class Task1 txts for devkit merge")
    p.add_argument("--augment", action="store_true", help="TTA inference")
    p.add_argument("--no-fuse", action="store_true",
                   help="skip load-time Conv+BN folding")
    p.add_argument("--no-plots", action="store_true",
                   help="skip confusion-matrix / PR-curve PNGs")
    p.add_argument("--rect-pad", type=float, default=0.0,
                   help="reference-style rect-val canvas pad (0.5 = the "
                        "reference's ceil(imgsz/32+0.5)*32 square-tile "
                        "bucket, e.g. 1056 for 1024); 0 = exact square")
    p.add_argument("--coco-eval", action="store_true",
                   help="COCO-style bbox AP from the saved json "
                        "(reference val.py:299-323 pycocotools branch)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard eval batches over N devices (0 = single device)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (bfloat16 ≈ the reference's --half)")
    p.add_argument("--single-cls", action="store_true",
                   help="evaluate as a single-class dataset")
    p.add_argument("--hyp", type=str, default=None)
    p.add_argument("--project", type=str, default="runs/val")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    return p.parse_args()


def run(opt):
    d = load_dataset_config(opt.data)
    hyp = load_hyp(opt.hyp)
    # resolve the conf sentinel BEFORE any branch builds an NMS (the
    # ensemble/artifact predict fns are constructed ahead of the speed
    # branch): default 0.01, or the reference's 0.25 speed regime; an
    # explicit --conf-thres always wins
    if getattr(opt, "conf_thres", None) is None:
        opt.conf_thres = 0.25 if opt.task == "speed" else 0.01

    if opt.task == "study":
        # speed-vs-accuracy sweep over image sizes (reference val.py:379-396).
        # NOTE: every size is a fresh XLA compile — budget accordingly on TPU.
        rows = []
        save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok)
        for sz in opt.study_sizes:
            sub = argparse.Namespace(**{**vars(opt), "task": "val", "imgsz": sz,
                                        "save_json": False, "save_task1": False,
                                        "project": str(save_dir), "name": f"sz{sz}",
                                        "exist_ok": True})
            r = run(sub)
            rows.append([sz, r["mp"], r["mr"], r["map50"], r["map"],
                         r.get("speed_ms_per_img", 0.0)])
            print(f"study imgsz={sz}: mAP50={r['map50']:.4f} "
                  f"{r.get('speed_ms_per_img', 0.0):.2f} ms/img")
        stem = Path(opt.cfg).stem
        out = save_dir / f"study_{Path(opt.data).stem}_{stem}.txt"
        out.write_text("\n".join(
            " ".join(f"{v:.5g}" for v in row) for row in rows) + "\n")
        print(f"study results saved to {out}")
        return rows

    # --single-cls: parse with real names, zero class ids, model sees nc=1
    single_cls = bool(getattr(opt, "single_cls", False))
    nc = 1 if single_cls else d["nc"]
    split = d.get(opt.task if opt.task != "speed" else "val") or d["val"]
    dataset = DotaDataset(
        split, d["names"], img_size=opt.imgsz, hyp=hyp, augment=False,
        max_labels=1000, single_cls=single_cls,
        eval_pad=getattr(opt, "rect_pad", 0.0) or 0.0,
    )

    from yolov5_obb_tpu.models.backend import is_artifact, make_backend_predict_fn

    predict_fn = None
    if opt.weights and "," in str(opt.weights):
        # model-level ensemble: decoded candidates of every member are
        # concatenated inside one jit then NMS'd (reference Ensemble,
        # experimental.py:75-120); `--weights a,b` like the reference CLI
        from yolov5_obb_tpu.engine.evaluator import (
            load_ensemble_members,
            make_ensemble_predict_fn,
        )

        wlist = [w.strip() for w in str(opt.weights).split(",") if w.strip()]
        members, _ = load_ensemble_members(
            wlist, opt.cfg, nc, opt.imgsz,
            fuse=not getattr(opt, "no_fuse", False))
        predict_fn = make_ensemble_predict_fn(
            members, opt.conf_thres, opt.iou_thres, opt.max_det,
            multi_label=True)
        model = variables = meta = None
    elif opt.weights and is_artifact(opt.weights):
        # exported-artifact backend (reference DetectMultiBackend in val)
        predict_fn, _ = make_backend_predict_fn(
            opt.weights, opt.cfg, nc, opt.imgsz, opt.conf_thres,
            opt.iou_thres, opt.max_det, tta=getattr(opt, "augment", False),
        )
        model = variables = meta = None
    else:
        import jax
        import jax.numpy as jnp

        dt = jnp.bfloat16 if getattr(opt, "dtype", "float32") == "bfloat16" else jnp.float32
        # TPU: fused Pallas stem on the packed u8 feed (inference only).
        # The kernel computes in bf16, so enable it only when bf16 was
        # requested — an f32 run must not silently change numerics.
        packed = (jax.default_backend() == "tpu"
                  and dt == jnp.bfloat16
                  and not getattr(opt, "augment", False))
        model, variables, meta = create_model(opt.cfg, nc=nc, imgsz=opt.imgsz,
                                              dtype=dt, packed_stem=packed)
        if opt.weights:
            from yolov5_obb_tpu.utils.checkpoint import restore_model_meta

            variables, wmeta = load_weights(opt.weights)
            restore_model_meta(meta, wmeta)
        from yolov5_obb_tpu.utils.fuse import fuse_for_inference

        variables = fuse_for_inference(
            variables, enable=not getattr(opt, "no_fuse", False))

    save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok)
    if opt.task == "speed":
        # defaults to the reference speed regime (conf 0.25, resolved
        # above); explicit --conf-thres/--iou-thres override so the
        # val-regime NMS cost (conf 0.01, where the fast paths disengage —
        # see tools/bench_dense_stages.py) is measurable here too
        res = evaluate(
            model, variables, meta, dataset, batch_size=opt.batch_size,
            conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
            max_det=opt.max_det, verbose=True,
            max_images=opt.max_images or 64, predict_fn=predict_fn,
        )
        print(f"speed: {res['speed_ms_per_img']:.2f} ms/img "
              f"(bs={opt.batch_size}, conf={opt.conf_thres}, "
              f"iou={opt.iou_thres})")
        return res

    mesh = None
    if getattr(opt, "mesh", 0):
        from yolov5_obb_tpu.engine.trainer import make_mesh

        mesh = make_mesh(opt.mesh)

    res = evaluate(
        model, variables, meta, dataset, batch_size=opt.batch_size,
        conf_thres=opt.conf_thres, iou_thres=opt.iou_thres, max_det=opt.max_det,
        verbose=True, tta=getattr(opt, "augment", False),
        save_json=str(save_dir / "best_obb_predictions.json") if opt.save_json else None,
        max_images=opt.max_images, mesh=mesh, predict_fn=predict_fn,
        plots_dir=None if getattr(opt, "no_plots", False) else save_dir,
    )
    header = f"{'Class':>22}{'P':>10}{'R':>10}{'HBBmAP@.5':>12}{'HBBmAP@.5:.95':>15}"
    print(header)
    print(f"{'all':>22}{res['mp']:>10.3f}{res['mr']:>10.3f}{res['map50']:>12.4f}{res['map']:>15.4f}")
    for name, m in res["per_class"].items():
        print(f"{name:>22}{m['p']:>10.3f}{m['r']:>10.3f}{m['ap50']:>12.4f}{m['ap']:>15.4f}")
    # reference val.py:288-291 per-image speed split (decode+NMS is fused
    # into the jitted forward here, so it reports as one inference stage)
    print(
        f"Speed: {res.get('speed_pre_ms_per_img', 0.0):.1f}ms pre-process, "
        f"{res['speed_ms_per_img']:.1f}ms inference+NMS per image at shape "
        f"({opt.batch_size}, {opt.imgsz}, {opt.imgsz}, 3)"
    )
    if getattr(opt, "save_txt", False):
        # reference val.py save_one_txt: normalized HBB `cls cx cy w h [conf]`
        from yolov5_obb_tpu.ops.geometry import poly2hbb

        lab_dir = save_dir / "labels"
        lab_dir.mkdir(parents=True, exist_ok=True)
        for rec in res["detections"]:
            h0, w0 = rec["hw"]
            lines = []
            for poly, conf, c in zip(rec["polys"], rec["conf"], rec["cls"]):
                cx, cy, w, h = poly2hbb(poly[None])[0]
                row = [int(c), cx / w0, cy / h0, w / w0, h / h0]
                if getattr(opt, "save_conf", False):
                    row.append(float(conf))
                lines.append(" ".join(f"{v:g}" for v in row))
            (lab_dir / f"{Path(rec['path']).stem}.txt").write_text(
                "\n".join(lines) + "\n" if lines else "")
        print(f"HBB txts saved to {lab_dir}")
    if opt.save_task1:
        save_dota_task1(res["detections"],
                        ["item"] if single_cls else d["names"],
                        save_dir / "task1_raw")
        print(f"Task1 txts saved to {save_dir / 'task1_raw'}")
    if getattr(opt, "coco_eval", False) and opt.save_json:
        # reference val.py:299-323: COCO bbox eval of the saved predictions.
        # GT json is generated from the split's labelTxt on the fly.
        try:
            from yolov5_obb_tpu.devkit.coco_eval import coco_eval_bbox
            from yolov5_obb_tpu.devkit.converters import dota_to_coco

            gt_json = save_dir / "gt_coco.json"
            dota_to_coco(Path(split).parent, gt_json,
                         ["item"] if single_cls else d["names"])
            cres = coco_eval_bbox(gt_json,
                                  save_dir / "best_obb_predictions.json")
            print(
                f"COCO bbox eval: AP@[.5:.95]={cres['map']:.4f} "
                f"AP50={cres['map50']:.4f} AP75={cres['map75']:.4f}"
            )
            res["coco"] = cres
        except Exception as e:
            print(f"COCO eval failed: {e}")
    print(f"Results saved to {save_dir}")
    return res


if __name__ == "__main__":
    run(parse_opt())
