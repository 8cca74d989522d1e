#!/usr/bin/env python
"""Inference CLI: oriented-box detection on images/dirs (reference detect.py).

Usage:
    python detect.py --weights runs/train/exp/best --source path/to/images \
        --cfg yolov5n.yaml --data yolov5_obb_tpu/data/configs/dotav1.yaml \
        --imgsz 1024 --conf-thres 0.25 --save-txt

Outputs annotated images and optional label txts
(``cls x1 y1 x2 y2 x3 y3 x4 y4 [conf]``, reference detect.py:156-162).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import cv2
import numpy as np

from yolov5_obb_tpu.data.augment import letterbox
from yolov5_obb_tpu.data.dota import IMG_EXTS
from yolov5_obb_tpu.engine.evaluator import make_predict_fn, pack_images
from yolov5_obb_tpu.models.yolo import create_model
from yolov5_obb_tpu.ops.geometry import rbox2poly, scale_polys
from yolov5_obb_tpu.utils.checkpoint import load_weights
from yolov5_obb_tpu.utils.general import increment_path, load_dataset_config
from yolov5_obb_tpu.utils.plots import annotate_detections


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="", help="orbax weights dir")
    p.add_argument("--cfg", type=str, default="yolov5n.yaml", help="model config")
    p.add_argument("--source", type=str, required=True, help="image file or dir")
    p.add_argument("--data", type=str, default=None, help="dataset yaml (names)")
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-crop", action="store_true",
                   help="save rotation-rectified per-detection crops")
    p.add_argument("--nosave", action="store_true", help="skip annotated images")
    p.add_argument("--classes", type=int, nargs="+", default=None,
                   help="keep only these class ids")
    p.add_argument("--agnostic-nms", action="store_true",
                   help="class-agnostic suppression")
    p.add_argument("--hide-labels", action="store_true")
    p.add_argument("--hide-conf", action="store_true")
    p.add_argument("--augment", action="store_true", help="TTA inference")
    p.add_argument("--line-thickness", type=int, default=2)
    p.add_argument("--no-fuse", action="store_true",
                   help="skip load-time Conv+BN folding")
    p.add_argument("--visualize", action="store_true",
                   help="save feature-map grids for the first frame")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (bfloat16 ≈ the reference's --half)")
    p.add_argument("--vid-stride", type=int, default=1,
                   help="stream frame-rate stride")
    p.add_argument("--max-frames", type=int, default=None,
                   help="stop stream inference after N batches")
    p.add_argument("--project", type=str, default="runs/detect")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    return p.parse_args()


VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".m4v", ".webm"}


def list_images(source):
    p = Path(source)
    if p.is_dir():
        files = [
            f for f in sorted(p.rglob("*"))
            if f.suffix.lower() in (IMG_EXTS | VID_EXTS)
        ]
        if not files:
            raise FileNotFoundError(f"no images found under {source}")
        return files
    if not p.exists():
        raise FileNotFoundError(f"source not found: {source}")
    return [p]


def iter_stream_frames(source, vid_stride=1, max_frames=None):
    """Yield (pseudo-path, frame_idx, BGR image, fps) from live streams
    (webcam index / URL / .streams list) via the threaded LoadStreams reader."""
    from yolov5_obb_tpu.data.streams import LoadStreams

    streams = LoadStreams(source, vid_stride=vid_stride, max_frames=max_frames)
    for idx, (srcs, frames, fps) in enumerate(streams):
        for si, frame in enumerate(frames):
            name = Path(str(srcs[si]).replace("://", "_").replace("/", "_"))
            yield name, idx, frame, fps[si]


def iter_frames(files):
    """Yield (path, frame_idx_or_None, BGR image, video_writer_info)."""
    for f in files:
        if f.suffix.lower() in VID_EXTS:
            cap = cv2.VideoCapture(str(f))
            fps = cap.get(cv2.CAP_PROP_FPS) or 30
            idx = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield f, idx, frame, fps
                idx += 1
            cap.release()
        else:
            im0 = cv2.imread(str(f))
            if im0 is None:
                print(f"skipping unreadable {f}")
                continue
            yield f, None, im0, None


def run(opt):
    import jax.numpy as jnp

    names = None
    nc = None
    if opt.data:
        d = load_dataset_config(opt.data)
        names, nc = d["names"], d["nc"]

    from yolov5_obb_tpu.models.backend import is_artifact, make_backend_predict_fn

    if opt.weights and "," in str(opt.weights):
        # model-level ensemble (reference Ensemble, experimental.py:75-120)
        from yolov5_obb_tpu.engine.evaluator import (
            load_ensemble_members,
            make_ensemble_predict_fn,
        )

        wlist = [w.strip() for w in str(opt.weights).split(",") if w.strip()]
        members, wnames = load_ensemble_members(
            wlist, opt.cfg, nc, opt.imgsz,
            fuse=not getattr(opt, "no_fuse", False))
        names = names or wnames or [str(i) for i in range(members[0][2].nc)]
        predict = make_ensemble_predict_fn(
            members, opt.conf_thres, opt.iou_thres, opt.max_det,
            multi_label=True, agnostic=getattr(opt, "agnostic_nms", False),
            classes=getattr(opt, "classes", None))
        variables = None
    elif opt.weights and is_artifact(opt.weights):
        if names is None:
            raise SystemExit("--data must provide names for exported artifacts")
        predict, _ = make_backend_predict_fn(
            opt.weights, opt.cfg, len(names), opt.imgsz, opt.conf_thres,
            opt.iou_thres, opt.max_det, tta=getattr(opt, "augment", False),
        )
        variables = None
    else:
        dt = (
            jnp.bfloat16
            if getattr(opt, "dtype", "float32") == "bfloat16" else jnp.float32
        )
        import jax

        # TPU: fused Pallas stem on the packed u8 feed (inference only;
        # bf16-only — the kernel computes in bf16 and must not silently
        # change an f32 run's numerics)
        packed = (jax.default_backend() == "tpu"
                  and dt == jnp.bfloat16
                  and not getattr(opt, "augment", False))
        model, variables, meta = create_model(opt.cfg, nc=nc, imgsz=opt.imgsz,
                                              dtype=dt, packed_stem=packed)
        if opt.weights:
            from yolov5_obb_tpu.utils.checkpoint import restore_model_meta

            variables, wmeta = load_weights(opt.weights)
            restore_model_meta(meta, wmeta)
            names = names or wmeta.get("names")
        if names is None:
            names = [str(i) for i in range(meta.nc)]
        from yolov5_obb_tpu.utils.fuse import fuse_for_inference

        variables = fuse_for_inference(
            variables, enable=not getattr(opt, "no_fuse", False))
        # stage host-numpy params (orbax restore / BN folding) on device
        # once — jit re-transfers host arguments on every call
        variables = jax.device_put(variables)

        predict = make_predict_fn(
            model, meta, opt.conf_thres, opt.iou_thres, opt.max_det,
            multi_label=True, tta=getattr(opt, "augment", False),
            agnostic=getattr(opt, "agnostic_nms", False),
            classes=getattr(opt, "classes", None),
        )

    save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok)
    if opt.save_txt:
        (save_dir / "labels").mkdir(parents=True, exist_ok=True)

    from yolov5_obb_tpu.data.streams import is_stream_source

    if is_stream_source(opt.source):
        frame_iter = iter_stream_frames(
            opt.source, vid_stride=getattr(opt, "vid_stride", 1),
            max_frames=getattr(opt, "max_frames", None),
        )
    else:
        frame_iter = iter_frames(list_images(opt.source))
    t_pre = t_inf = 0.0
    n_det_total = 0
    n_frames = 0
    writers = {}
    for f, frame_idx, im0, fps in frame_iter:
        n_frames += 1
        t0 = time.perf_counter()
        img, ratio, pad = letterbox(im0, opt.imgsz, auto=False, scaleup=False)
        x = np.ascontiguousarray(img[:, :, ::-1])[None]  # BGR→RGB, add batch
        t1 = time.perf_counter()
        if getattr(opt, "visualize", False) and variables is not None and n_frames == 1:
            # reference --visualize (plots.py:162 feature_visualization)
            from yolov5_obb_tpu.utils.plots import feature_visualization

            if getattr(model, "packed_stem", False):
                vis_x = jnp.asarray(pack_images(x))
            else:
                vis_x = jnp.asarray(x).astype(jnp.float32) / 255.0
            _, inter = model.apply(
                variables, vis_x,
                train=False, capture_intermediates=True, mutable=["intermediates"],
            )
            feats = inter["intermediates"]
            for mname in sorted(k for k in feats if k.startswith("m"))[:8]:
                out = feats[mname].get("__call__", (None,))[0]
                if out is not None and not isinstance(out, (list, tuple)):
                    feature_visualization(out, mname, save_dir / "features")
            print(f"feature maps saved to {save_dir / 'features'}")
        if getattr(predict, "packed_stem", False):
            dets, num = predict(variables, jnp.asarray(pack_images(x)))
        else:
            dets, num = predict(variables, jnp.asarray(x))
        dets = np.asarray(dets)
        n = int(np.asarray(num)[0])
        t2 = time.perf_counter()
        t_pre += t1 - t0
        t_inf += t2 - t1

        d = dets[0, :n]
        if variables is None and getattr(opt, "classes", None):
            # exported-artifact backend: NMS config is baked into the graph,
            # so the --classes filter applies host-side (equivalent for the
            # per-class suppression the artifacts are exported with)
            d = d[np.isin(d[:, 6].astype(int), opt.classes)]
            n = len(d)
        polys = rbox2poly(d[:, :5]) if n else np.zeros((0, 8))
        if n:
            polys = scale_polys((opt.imgsz, opt.imgsz), polys, im0.shape[:2])
        conf, cls = d[:, 5], d[:, 6]
        n_det_total += n

        if opt.save_txt:
            lines = []
            for k in range(n):
                row = [int(cls[k]), *polys[k].tolist()]
                if opt.save_conf:
                    row.append(float(conf[k]))
                lines.append(" ".join(f"{v:g}" for v in row))
            stem = f.stem if frame_idx is None else f"{f.stem}_{frame_idx}"
            (save_dir / "labels" / f"{stem}.txt").write_text(
                "\n".join(lines) + "\n" if lines else ""
            )

        if getattr(opt, "save_crop", False) and n:
            from yolov5_obb_tpu.api import obb_crop

            stem = f.stem if frame_idx is None else f"{f.stem}_{frame_idx}"
            crop_dir = save_dir / "crops"
            for k in range(n):
                cname = names[int(cls[k])] if int(cls[k]) < len(names) else str(int(cls[k]))
                out = crop_dir / cname
                out.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(out / f"{stem}_{k}.png"), obb_crop(im0, polys[k]))

        if not opt.nosave:
            annotate_detections(
                im0, polys, conf, cls, names,
                line_width=opt.line_thickness, hide_conf=opt.hide_conf,
                hide_labels=getattr(opt, "hide_labels", False),
            )
            if frame_idx is None:
                cv2.imwrite(str(save_dir / f.name), im0)
            else:  # video: stream annotated frames to an mp4 writer
                if f not in writers:
                    out = save_dir / f"{f.stem}_annotated.mp4"
                    writers[f] = cv2.VideoWriter(
                        str(out), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (im0.shape[1], im0.shape[0]),
                    )
                writers[f].write(im0)
        label = f.name if frame_idx is None else f"{f.name}#{frame_idx}"
        print(f"{label}: {n} detections ({(t2 - t1) * 1000:.1f} ms)")

    for w in writers.values():
        w.release()
    n = max(n_frames, 1)
    print(
        f"Speed: {t_pre / n * 1000:.1f}ms pre-process, {t_inf / n * 1000:.1f}ms "
        f"inference+NMS per image at shape (1, {opt.imgsz}, {opt.imgsz}, 3)"
    )
    print(f"Results saved to {save_dir} ({n_det_total} detections)")
    return save_dir


if __name__ == "__main__":
    run(parse_opt())
