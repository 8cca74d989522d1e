"""High-level convenience API (reference AutoShape/Detections + hubconf).

    import yolov5_obb_tpu as yo
    model = yo.api.load("yolov5m.yaml", weights="runs/train/exp/best",
                        names=DOTA_V1_NAMES)
    results = model(["img1.png", np_array, ...])   # any mix of inputs
    results.pandas()        # per-image DataFrames
    results.save("out/")    # annotated images

Unlike the reference's AutoShape (models/common.py:439-524), the OBB NMS
path is fully wired (the reference still calls the HBB NMS there)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .data.augment import letterbox
from .engine.evaluator import make_predict_fn
from .models.yolo import create_model
from .ops.geometry import rbox2poly, scale_polys
from .utils.checkpoint import load_weights
from .utils.plots import annotate_detections


def obb_crop(img, poly, rectify: bool = True):
    """Cut one detection from a BGR image given its 8-point polygon.

    ``rectify=True`` warps the oriented box upright (long edge horizontal) —
    an OBB upgrade over the reference's axis-aligned ``save_one_box``;
    ``False`` cuts the axis-aligned cover instead."""
    import cv2

    pts = np.asarray(poly, np.float32).reshape(4, 2)
    if rectify:
        w = int(round(float(np.linalg.norm(pts[1] - pts[0])))) or 1
        h = int(round(float(np.linalg.norm(pts[2] - pts[1])))) or 1
        dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                       np.float32)
        m = cv2.getPerspectiveTransform(pts, dst)
        return cv2.warpPerspective(img, m, (w, h))
    x0, y0 = np.maximum(pts.min(0).astype(int), 0)
    x1, y1 = pts.max(0).astype(int) + 1
    return img[y0:y1, x0:x1].copy()


class Detections:
    """Per-image oriented detections (reference models/common.py:527-625)."""

    def __init__(self, imgs, polys, confs, clses, names, paths):
        self.imgs = imgs  # BGR np arrays
        self.polys = polys  # list of (n, 8)
        self.confs = confs
        self.clses = clses
        self.names = names
        self.paths = paths

    def __len__(self):
        return len(self.imgs)

    def pandas(self):
        import pandas as pd

        out = []
        for polys, confs, clses in zip(self.polys, self.confs, self.clses):
            rows = []
            for p, c, k in zip(polys, confs, clses):
                rows.append(
                    {
                        **{f"{ax}{i+1}": float(p[2 * i + j]) for i in range(4)
                           for j, ax in enumerate("xy")},
                        "confidence": float(c),
                        "class": int(k),
                        "name": self.names[int(k)] if self.names else str(int(k)),
                    }
                )
            cols = [f"{ax}{i+1}" for i in range(4) for ax in "xy"] + [
                "confidence", "class", "name",
            ]
            out.append(pd.DataFrame(rows, columns=cols))
        return out

    def render(self):
        for img, polys, confs, clses in zip(self.imgs, self.polys, self.confs, self.clses):
            annotate_detections(img, polys, confs, clses, self.names)
        return self.imgs

    def crop(self, save_dir=None, rectify=True):
        """Per-detection crops (reference Detections.crop, common.py:600-607).

        ``rectify=True`` warps each oriented box upright (long edge
        horizontal) — an OBB upgrade over the reference's axis-aligned
        crops; ``False`` cuts the axis-aligned cover instead. Returns a
        list (per image) of lists of BGR crops; optionally saves them."""
        import cv2

        out = []
        for idx, (img, polys, confs, clses) in enumerate(
            zip(self.imgs, self.polys, self.confs, self.clses)
        ):
            crops = [obb_crop(img, p, rectify) for p in polys]
            out.append(crops)
            if save_dir is not None:
                d = Path(save_dir)
                d.mkdir(parents=True, exist_ok=True)
                stem = Path(self.paths[idx]).stem if self.paths[idx] else f"image{idx}"
                for j, (crop, k) in enumerate(zip(crops, clses)):
                    label = self.names[int(k)] if self.names else str(int(k))
                    cv2.imwrite(str(d / f"{stem}_{label}_{j}.png"), crop)
        return out

    def save(self, save_dir="runs/hub"):
        import cv2

        d = Path(save_dir)
        d.mkdir(parents=True, exist_ok=True)
        self.render()
        for i, img in enumerate(self.imgs):
            name = Path(self.paths[i]).name if self.paths[i] else f"image{i}.jpg"
            cv2.imwrite(str(d / name), img)
        return d

    def print(self):
        for i, polys in enumerate(self.polys):
            print(f"image {i}: {len(polys)} detections")


class OBBModel:
    """Callable wrapper: arbitrary image inputs → Detections."""

    def __init__(self, cfg="yolov5m.yaml", weights: str | None = None,
                 names=None, imgsz: int = 1024, conf_thres: float = 0.25,
                 iou_thres: float = 0.45, max_det: int = 1000, dtype=None):
        import jax
        import jax.numpy as jnp

        self.imgsz = imgsz
        # TPU: fused Pallas stem on the packed u8 feed (inference only;
        # bf16-only — the kernel computes in bf16 and must not silently
        # change f32 numerics)
        packed = (jax.default_backend() == "tpu"
                  and (dtype or jnp.float32) == jnp.bfloat16)
        self.model, self.variables, self.meta = create_model(
            cfg, nc=len(names) if names else None,
            dtype=dtype or jnp.float32, imgsz=imgsz, packed_stem=packed,
        )
        if weights:
            from .utils.checkpoint import restore_model_meta

            self.variables, wmeta = load_weights(weights)
            restore_model_meta(self.meta, wmeta)
            names = names or wmeta.get("names")
        from .utils.fuse import fuse_for_inference

        # fold Conv+BN, then stage the (host-numpy) tree on device once —
        # jit re-transfers host arguments on every call
        self.variables = jax.device_put(fuse_for_inference(self.variables))
        self.names = list(names) if names else [str(i) for i in range(self.meta.nc)]
        self.predict = make_predict_fn(
            self.model, self.meta, conf_thres, iou_thres, max_det, multi_label=False
        )

    def _to_bgr(self, im):
        """Any reference-AutoShape input form → (BGR uint8 HWC, path|None).

        Accepts filename/Path, http(s) URL, PIL.Image, torch tensor
        (CHW or HWC, uint8 or float), and ndarray (BGR, cv2 convention) —
        reference models/common.py:439-475.
        """
        import cv2

        if isinstance(im, str) and im.startswith(("http://", "https://")):
            # URL input (reference common.py:446-448): fetch and decode
            # in memory — no temp file
            from urllib.request import urlopen

            data = np.frombuffer(urlopen(im).read(), np.uint8)
            img = cv2.imdecode(data, cv2.IMREAD_COLOR)
            if img is None:
                raise ValueError(f"undecodable image data from {im}")
            return img, im.split("?")[0]
        if isinstance(im, (str, Path)):
            img = cv2.imread(str(im))
            if img is None:
                raise FileNotFoundError(im)
            return img, str(im)
        if im.__class__.__module__.split(".")[0] == "PIL":
            # PIL images are RGB; flip to the BGR pipeline convention
            arr = np.asarray(im.convert("RGB"))[..., ::-1]
            return np.ascontiguousarray(arr), getattr(im, "filename", None)
        if type(im).__module__.split(".")[0] == "torch":
            im = im.detach().cpu().numpy()
        arr = np.asarray(im)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        elif arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] > 3:
            arr = arr.transpose(1, 2, 0)  # CHW (torch convention) → HWC
            if arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, -1)
        if arr.dtype != np.uint8:
            scale = 255.0 if float(arr.max(initial=0.0)) <= 1.0 else 1.0
            arr = np.clip(np.rint(arr * scale), 0, 255).astype(np.uint8)
        return arr[..., :3].astype(np.uint8), None

    def __call__(self, inputs):
        import jax.numpy as jnp

        single = not isinstance(inputs, (list, tuple))
        if single:
            inputs = [inputs]
        imgs, paths = zip(*(self._to_bgr(im) for im in inputs))

        batch = []
        for im in imgs:
            lb, _, _ = letterbox(im, self.imgsz, auto=False, scaleup=False)
            batch.append(np.ascontiguousarray(lb[:, :, ::-1]))
        # pad the batch to the next power of two so arbitrary request sizes
        # reuse a handful of compiled shapes (each distinct shape is a fresh
        # XLA compile)
        n_real = len(batch)
        n_pad = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        batch.extend([batch[-1]] * (n_pad - n_real))
        stacked = np.stack(batch)
        if getattr(self.predict, "packed_stem", False):
            from .engine.evaluator import pack_images

            stacked = pack_images(stacked)
        x = jnp.asarray(stacked)
        dets, num = self.predict(self.variables, x)
        dets, num = np.asarray(dets)[:n_real], np.asarray(num)[:n_real]

        polys_l, confs_l, clses_l = [], [], []
        for i, im in enumerate(imgs):
            n = int(num[i])
            d = dets[i, :n]
            polys = rbox2poly(d[:, :5]) if n else np.zeros((0, 8))
            if n:
                polys = scale_polys((self.imgsz, self.imgsz), polys, im.shape[:2])
            polys_l.append(polys)
            confs_l.append(d[:, 5])
            clses_l.append(d[:, 6])
        return Detections(list(imgs), polys_l, confs_l, clses_l, self.names, list(paths))


def load(cfg="yolov5m.yaml", weights=None, **kw) -> OBBModel:
    """hubconf-style one-liner (reference hubconf.py:14-66)."""
    return OBBModel(cfg=cfg, weights=weights, **kw)
