"""Evaluation: batched device inference + host HBB metrics & OBB outputs.

Mirrors the reference val flow (val.py:94-330): decode+rotated-NMS on
device (static shapes), then per image on host: rbox→poly, rescale to
native resolution, HBB-cover TP matching at 10 IoU thresholds, AP
aggregation, and DOTA-format JSON/txt export for the devkit merge step.
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dota import DotaDataset
from ..models.yolo import decode
from ..ops.geometry import poly2hbb, rbox2poly, scale_polys, xywh2xyxy
from ..ops.rotated_nms import non_max_suppression_obb
from ..utils.metrics import ap_per_class, process_batch_hbb


def make_predict_fn(model, meta, conf_thres, iou_thres, max_det, multi_label=True,
                    max_candidates=4096, tta: bool = False, mesh=None,
                    agnostic: bool = False, classes=None):
    """Jitted image→detections function; shared by val/detect.
    ``tta`` enables multi-scale + flip augmented inference.

    If ``model.packed_stem`` is set (TPU fast path), the returned function
    expects the image batch as the packed ``(B, H, W*3)`` uint8 view (see
    ``pack_images``) and skips the /255 normalize — it is folded into the
    stem weights.

    ``mesh``: optional 1-D data mesh — the batch shards across its devices
    (replicated params, XLA-SPMD inference; every op here is batch-leading
    so no collectives are needed until the host pulls results).

    ``agnostic``/``classes``: class-agnostic suppression and a static keep
    filter of class ids (reference --agnostic-nms / --classes)."""
    classes = tuple(int(c) for c in classes) if classes is not None else None

    from ..ops.rotated_nms import non_max_suppression_from_maps

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
        rsh = NamedSharding(mesh, P())
        jit_kw = {"in_shardings": (rsh, bsh), "out_shardings": (bsh, bsh)}
    else:
        jit_kw = {}

    packed = bool(getattr(model, "packed_stem", False))
    if packed and tta:
        raise ValueError("packed_stem and tta are mutually exclusive "
                         "(TTA transforms the unpacked image)")

    @functools.partial(jax.jit, **jit_kw)
    def predict(variables, image_u8):
        if tta:
            from ..models.tta import predict_tta

            x = image_u8.astype(jnp.float32) / 255.0
            pred = predict_tta(model, variables, meta, x)
            return non_max_suppression_obb(
                pred, num_classes=meta.nc, conf_thres=conf_thres,
                iou_thres=iou_thres, max_candidates=max_candidates,
                max_det=max_det, multi_label=multi_label,
                agnostic=agnostic, classes=classes,
            )
        # flat=True: Detect emits (B, n, no) levels — avoids the 5-D layout's
        # sublane padding (na=3→8) on every decode read (see rotated_nms)
        x = image_u8 if packed else image_u8.astype(jnp.float32) / 255.0
        maps = model.apply(variables, x, train=False, flat=True)
        return non_max_suppression_from_maps(
            maps, meta, conf_thres=conf_thres, iou_thres=iou_thres,
            max_candidates=max_candidates, max_det=max_det,
            multi_label=multi_label, agnostic=agnostic, classes=classes,
        )

    predict.packed_stem = packed
    return predict


def load_ensemble_members(weights_list, cfg, nc, imgsz, dtype=None,
                          fuse: bool = True):
    """Load N checkpoints as ensemble members (reference attempt_load with
    a weights list, experimental.py:90-120).

    ``cfg``: one config for all members, or a comma-separated list pairing
    each weight.  Each member restores its own checkpoint-side meta
    (evolved anchors) and is Conv+BN-folded."""
    from ..models.yolo import create_model
    from ..utils.checkpoint import load_weights, restore_model_meta
    from ..utils.fuse import fuse_for_inference

    cfgs = [c.strip() for c in str(cfg).split(",")] if cfg else ["yolov5m.yaml"]
    if len(cfgs) == 1:
        cfgs = cfgs * len(weights_list)
    if len(cfgs) != len(weights_list):
        raise ValueError(
            f"{len(weights_list)} weights but {len(cfgs)} configs")
    members = []
    names = None
    for w, c in zip(weights_list, cfgs):
        model, variables, meta = create_model(
            c, nc=nc, imgsz=imgsz, **({"dtype": dtype} if dtype else {}))
        variables, wmeta = load_weights(w)
        restore_model_meta(meta, wmeta)
        variables = fuse_for_inference(variables, enable=fuse)
        names = names or wmeta.get("names")
        members.append((model, variables, meta))
    return members, names


def make_ensemble_predict_fn(members, conf_thres, iou_thres, max_det,
                             multi_label=True, max_candidates=4096,
                             agnostic=False, classes=None):
    """Model-level ensemble inference (reference experimental.py:75-120
    ``Ensemble``/``attempt_load`` with several weights): every member's
    decoded candidates are concatenated along the anchor axis inside one
    jit and suppressed by a single rotated NMS — the 'nms ensemble' of the
    reference's ``torch.cat(y, 1)``.

    ``members``: list of ``(model, variables, meta)``; architectures may
    differ, ``nc`` must match."""
    classes = tuple(int(c) for c in classes) if classes is not None else None
    if not members:
        raise ValueError("ensemble needs at least one member")
    nc = members[0][2].nc
    if any(m[2].nc != nc for m in members):
        raise ValueError("ensemble members must share nc")
    models = [m[0] for m in members]
    metas = [m[2] for m in members]
    # stage every member's (host-numpy) params on device once
    member_vars = jax.device_put(tuple(m[1] for m in members))

    @jax.jit
    def predict(variables_tuple, image_u8):
        x = image_u8.astype(jnp.float32) / 255.0
        preds = [
            decode(mod.apply(v, x, train=False), meta)
            for mod, v, meta in zip(models, variables_tuple, metas)
        ]
        pred = jnp.concatenate(preds, axis=1)  # (B, sum n_anchors, no)
        return non_max_suppression_obb(
            pred, num_classes=nc, conf_thres=conf_thres, iou_thres=iou_thres,
            max_candidates=max_candidates, max_det=max_det,
            multi_label=multi_label, agnostic=agnostic, classes=classes,
        )

    def call(variables, image_u8):
        # ``variables`` arg kept for signature parity with make_predict_fn;
        # the ensemble's member variables are closed over at build time.
        del variables
        return predict(member_vars, image_u8)

    call.packed_stem = False
    return call


def pack_images(batch_u8):
    """NHWC uint8 batch → the packed ``(B, H, W*3)`` view a packed-stem
    predict fn expects.  A zero-copy reshape for contiguous arrays."""
    import numpy as np

    b = np.ascontiguousarray(batch_u8)
    return b.reshape(b.shape[0], b.shape[1], -1)


def evaluate(
    model,
    variables,
    meta,
    dataset: DotaDataset,
    batch_size: int = 8,
    conf_thres: float = 0.01,
    iou_thres: float = 0.4,
    max_det: int = 1500,
    verbose: bool = False,
    save_json: str | None = None,
    max_images: int | None = None,
    tta: bool = False,
    mesh=None,
    predict_fn=None,
    plots_dir=None,
):
    """Run HBB-metric evaluation over `dataset`.

    ``predict_fn(variables, image_u8) -> (dets, num)`` overrides the model
    forward (used for exported-artifact backends).

    ``plots_dir``: write confusion_matrix.png + PR/F1/P/R curve PNGs there
    (reference val.py:174,241-244 / metrics.py plot=True).

    Returns dict with mp, mr, map50, map, per-class ap, speed stats, and the
    raw per-image detections (native-resolution polys) for downstream export.
    """
    names = dataset.names
    iouv = np.linspace(0.5, 0.95, 10)
    confusion = None
    if plots_dir is not None:
        from ..utils.metrics import ConfusionMatrix

        confusion = ConfusionMatrix(nc=len(names))
    predict = predict_fn or make_predict_fn(
        model, meta, conf_thres, iou_thres, max_det, multi_label=True, tta=tta,
        mesh=mesh,
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    elif variables is not None:
        # stage params on device ONCE: orbax restore / Conv+BN folding hand
        # back host-numpy trees, and jit re-transfers host arguments on
        # every call (50+ MB per batch through this container's dev tunnel)
        variables = jax.device_put(variables)

    stats = []  # (tp, conf, cls, target_cls) per image
    json_out = []
    all_dets = []
    n_img = len(dataset) if max_images is None else min(max_images, len(dataset))
    imgsz = dataset.img_size
    canvas = int(getattr(dataset, "eval_canvas", imgsz))  # rect-val pad mode

    # one-deep software pipeline: dispatch batch N+1 (async under jit)
    # before materialising batch N, so host postprocess (poly conversion,
    # HBB matching, json) overlaps device compute.
    t_pre_box = [0.0]  # host pre-processing (decode+letterbox) seconds

    def _dispatch(start):
        idxs = list(range(start, min(start + batch_size, n_img)))
        tp0 = time.perf_counter()
        samples = [dataset.get_eval_sample(i) for i in idxs]
        t_pre_box[0] += time.perf_counter() - tp0
        pad = batch_size - len(samples)
        batch_imgs = np.stack([s["image"] for s in samples + [samples[-1]] * pad])
        if getattr(predict, "packed_stem", False):
            batch_imgs = pack_images(batch_imgs)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(batch_imgs, NamedSharding(mesh, P(mesh.axis_names[0])))
        else:
            x = jnp.asarray(batch_imgs)
        dets, num = predict(variables, x)
        return samples, dets, num

    if n_img:  # warm/compile outside the timed region; materialize to host —
        # block_until_ready is not a reliable barrier on this runtime
        _w = _dispatch(0)
        np.asarray(_w[1])
        np.asarray(_w[2])

    t_start = time.perf_counter()
    pending = _dispatch(0) if n_img else None
    for start in range(0, n_img, batch_size):
        samples, dets_dev, num_dev = pending
        nxt = start + batch_size
        pending = _dispatch(nxt) if nxt < n_img else None

        dets = np.asarray(jax.block_until_ready(dets_dev))
        num = np.asarray(num_dev)

        for bi, s in enumerate(samples):
            n = int(num[bi])
            d = dets[bi, :n]  # (n, [cx cy l s theta conf cls])
            h0, w0 = (int(v) for v in s["orig_hw"])

            rp = s.get("ratio_pad")
            rp = ((rp[0], rp[0]), (rp[1], rp[2])) if rp is not None else None

            # predictions → native-res polys + hbb covers
            polys = rbox2poly(d[:, :5]) if n else np.zeros((0, 8))
            polys = (scale_polys((canvas, canvas), polys, (h0, w0), rp)
                     if n else polys)
            hbb = poly2hbb(polys) if n else np.zeros((0, 4))
            det_xyxy = xywh2xyxy(hbb)
            conf, cls = d[:, 5], d[:, 6]

            # ground truth → native-res hbb
            m = s["target_mask"]
            gt = s["targets"][m]
            gt_polys = rbox2poly(gt[:, 1:6]) if len(gt) else np.zeros((0, 8))
            gt_polys = (
                scale_polys((canvas, canvas), gt_polys, (h0, w0), rp)
                if len(gt) else gt_polys
            )
            gt_xyxy = xywh2xyxy(poly2hbb(gt_polys)) if len(gt) else np.zeros((0, 4))
            gt_cls = gt[:, 0]

            tp = process_batch_hbb(det_xyxy, conf, cls, gt_xyxy, gt_cls, iouv)
            stats.append((tp, conf, cls, gt_cls))
            if confusion is not None:
                confusion.process_batch(det_xyxy, conf, cls, gt_xyxy, gt_cls)
            all_dets.append(
                {"path": dataset.img_files[s["index"]], "polys": polys,
                 "conf": conf, "cls": cls, "hw": (int(h0), int(w0))}
            )
            if save_json is not None:
                stem = Path(dataset.img_files[s["index"]]).stem
                for k in range(n):
                    b = hbb[k]
                    json_out.append(
                        {
                            "image_id": stem,
                            "category_id": int(cls[k]),
                            "bbox": [round(float(v), 1) for v in b],
                            "score": round(float(conf[k]), 5),
                            "poly": [round(float(v), 1) for v in polys[k]],
                            "file_name": stem,
                        }
                    )

    t_infer = time.perf_counter() - t_start if n_img else 0.0

    if stats:
        tp = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        cls = np.concatenate([s[2] for s in stats])
        tcls = np.concatenate([s[3] for s in stats])
    else:  # empty dataset / --max-images 0 → zero metrics, no crash
        tp = np.zeros((0, 10), bool)
        conf = cls = tcls = np.zeros(0)

    curves = None
    if tp.size and tcls.size:
        p, r, ap, f1, cls_idx, curves = ap_per_class(
            tp, conf, cls, tcls, return_curves=True)
        ap50, ap_mean = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap_mean.mean()
    else:
        p = r = ap50 = ap_mean = np.zeros(0)
        ap = np.zeros((0, 10))
        cls_idx = np.zeros(0, int)
        mp = mr = map50 = map_ = 0.0

    if plots_dir is not None:
        from ..utils.plots import (
            plot_confusion_matrix,
            plot_mc_curve,
            plot_pr_curve,
        )

        pdir = Path(plots_dir)
        pdir.mkdir(parents=True, exist_ok=True)
        try:
            plot_confusion_matrix(confusion.matrix, list(names) + ["background"],
                                  pdir / "confusion_matrix.png")
            ap_c = ap
            if curves is None:
                # zero detections (or an unlabeled split): still emit the
                # artifact set — flat curves — so downstream tooling and the
                # reference's per-run file contract (val.py:241-244) hold.
                px = np.linspace(0, 1, 1000)
                z = np.zeros((1, px.size))
                curves = {"px": px, "pr_py": [z[0]], "f1": z, "p": z, "r": z}
                ap_c = np.zeros((1, 10))
            cnames = [names[int(c)] for c in cls_idx]
            plot_pr_curve(curves["px"], list(curves["pr_py"]), ap_c,
                          pdir / "PR_curve.png", cnames)
            for key, ylab, fname in (("f1", "F1", "F1_curve.png"),
                                     ("p", "Precision", "P_curve.png"),
                                     ("r", "Recall", "R_curve.png")):
                plot_mc_curve(curves["px"], curves[key],
                              pdir / fname, cnames, ylabel=ylab)
        except Exception as e:  # plotting must never fail an eval run
            print(f"eval plots failed: {e}")

    if save_json is not None:
        Path(save_json).parent.mkdir(parents=True, exist_ok=True)
        with open(save_json, "w") as f:
            json.dump(json_out, f)

    result = {
        "mp": float(mp),
        "mr": float(mr),
        "map50": float(map50),
        "map": float(map_),
        "per_class": {
            names[int(c)]: {"p": float(p[i]), "r": float(r[i]),
                            "ap50": float(ap50[i]), "ap": float(ap_mean[i])}
            for i, c in enumerate(cls_idx)
        },
        "speed_ms_per_img": 1000.0 * t_infer / max(n_img, 1),
        "speed_pre_ms_per_img": 1000.0 * t_pre_box[0] / max(n_img, 1),
        "detections": all_dets,
    }
    if verbose:
        print(
            f"images={n_img}  P={mp:.3f} R={mr:.3f} "
            f"HBBmAP@.5={map50:.4f} HBBmAP@.5:.95={map_:.4f} "
            f"({result['speed_ms_per_img']:.1f} ms/img)"
        )
    return result


def save_dota_task1(detections, names, out_dir):
    """Write per-class Task1_<name>.txt files for the devkit merge step
    (the output of reference tools/TestJson2VocClassTxt.py:29-48)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = {i: open(out / f"Task1_{n}.txt", "w") for i, n in enumerate(names)}
    try:
        for det in detections:
            stem = Path(det["path"]).stem
            for poly, conf, cls in zip(det["polys"], det["conf"], det["cls"]):
                row = " ".join(f"{v:.1f}" for v in poly)
                files[int(cls)].write(f"{stem} {conf:.5f} {row}\n")
    finally:
        for f in files.values():
            f.close()
