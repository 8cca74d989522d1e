"""DOTA-format dataset: label parsing, caching, and the per-sample pipeline.

Counterpart of the reference ``LoadImagesAndLabels`` (utils/datasets.py:377-698)
redesigned for a TPU feed: every sample returns **fixed-shape** padded arrays
(``max_labels`` targets with a validity mask) instead of ragged label lists,
so batches never trigger XLA recompiles.

Label format (DOTA): one object per line,
``x1 y1 x2 y2 x3 y3 x4 y4 classname difficult`` (docs/GetStart.md:8-15);
lines with difficult == '2' are dropped (reference datasets.py:949-995).

Target row layout produced here (see engine/loss.py):
``[cls cx cy l s theta csl_0..csl_179]`` → 186 columns, pixel units.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import cv2
import numpy as np

from ..ops.geometry import poly2rbox_csl
from . import augment as A

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}

# standard class lists (data/dotav1_poly.yaml / dotav15_poly.yaml)
DOTA_V1_NAMES = [
    "plane", "baseball-diamond", "bridge", "ground-track-field",
    "small-vehicle", "large-vehicle", "ship", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field", "roundabout",
    "harbor", "swimming-pool", "helicopter",
]
DOTA_V15_NAMES = DOTA_V1_NAMES + ["container-crane"]

TARGET_COLS = 6 + 180


def img2label_path(img_path: str) -> str:
    """images/xxx.png → labelTxt/xxx.txt (reference datasets.py:371-374)."""
    p = Path(img_path)
    parts = list(p.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labelTxt"
            break
    return str(Path(*parts).with_suffix(".txt"))


def parse_dota_annotation(path, name_to_id: dict, drop_difficult2: bool = True):
    """Parse one labelTxt file → (polys (n,8) f32, cls (n,) f32)."""
    polys, cls = [], []
    p = Path(path)
    if p.exists():
        for line in p.read_text().splitlines():
            parts = line.split()
            if len(parts) < 9:
                continue  # imagesource/gsd headers
            try:
                coords = [float(v) for v in parts[:8]]
            except ValueError:
                continue
            name = parts[8]
            difficult = parts[9] if len(parts) > 9 else "0"
            if drop_difficult2 and difficult == "2":
                continue
            if name not in name_to_id:
                continue
            polys.append(coords)
            cls.append(float(name_to_id[name]))
    return (
        np.array(polys, np.float32).reshape(-1, 8),
        np.array(cls, np.float32),
    )


def _scan_images(path) -> list:
    """Resolve dir / txt-list / glob into a sorted image file list
    (reference datasets.py:402-421)."""
    p = Path(path)
    files: list = []
    if p.is_dir():
        files = [f for f in sorted(p.rglob("*")) if f.suffix.lower() in IMG_EXTS]
    elif p.suffix == ".txt" and p.exists():
        for line in p.read_text().splitlines():
            line = line.strip()
            if line:
                q = Path(line)
                if not q.is_absolute():
                    q = p.parent / q
                files.append(q)
    elif p.exists():
        files = [p]
    else:
        raise FileNotFoundError(f"dataset path not found: {path}")
    if not files:
        raise FileNotFoundError(f"no images found under {path}")
    return [str(f) for f in files]


class DotaDataset:
    """Random-access DOTA dataset with fixed-shape padded outputs."""

    def __init__(
        self,
        path,
        names,
        img_size: int = 1024,
        hyp: dict | None = None,
        augment: bool = False,
        max_labels: int = 500,
        cache_dir: str | None = None,
        stride: int = 32,
        verify: bool = False,
        single_cls: bool = False,
        cache_images: str | None = None,
        eval_pad: float = 0.0,
    ):
        self.img_files = _scan_images(path)
        if verify:
            self.img_files = self._verify_images(self.img_files)
        self.label_files = [img2label_path(f) for f in self.img_files]
        self.names = list(names)
        self.name_to_id = {n: i for i, n in enumerate(self.names)}
        self.img_size = int(img_size)
        # reference-style rect-val canvas (utils/datasets.py:470-492): DOTA
        # val tiles are square, so aspect-sorted rect batching degenerates to
        # ONE bucket — content at img_size scale on a ceil(img_size/stride
        # + pad)*stride canvas (e.g. 1056 for 1024 @ pad 0.5). eval_pad=0.0
        # keeps the exact-square letterbox (this framework's default).
        self.eval_pad = float(eval_pad)
        self.eval_canvas = (
            int(np.ceil(self.img_size / stride + self.eval_pad)) * stride
            if self.eval_pad > 0 else self.img_size
        )
        self.hyp = dict(hyp or {})
        self.augment = augment
        self.max_labels = int(max_labels)
        self.stride = stride
        self._load_labels(cache_dir)
        if single_cls:  # treat all objects as one class (reference --single-cls)
            self.cls = [np.zeros_like(c) for c in self.cls]
        # image cache (reference --cache ram|disk, datasets.py:494-514). Filled
        # lazily on first access instead of an eager preload pass: epoch 1 pays
        # decode cost once, later epochs hit the cache.
        if cache_images not in (None, "", "ram", "disk"):
            raise ValueError(f"cache_images must be ram|disk, got {cache_images!r}")
        if cache_images == "disk" and not cache_dir:
            raise ValueError("cache_images='disk' requires cache_dir")
        self.cache_images = cache_images or None
        self._ram_cache: dict = {}
        # key the image cache by dataset identity (like the labels cache):
        # train and val datasets share cache_dir, and an index-only key would
        # pair train images with val labels (first-writer-wins npz store)
        self._disk_cache_dir = (
            Path(cache_dir) / f"imgs_{self.img_size}_{self._cache_key()}"
            if cache_images == "disk" else None
        )
        if self._disk_cache_dir is not None:
            self._disk_cache_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    @staticmethod
    def _verify_images(files):
        """Quarantine unreadable/corrupt images (reference verify_image_label,
        datasets.py:949-995): PIL header check + truncated-JPEG detection."""
        from PIL import Image

        good = []
        for f in files:
            try:
                with Image.open(f) as im:
                    im.verify()
                    w, h = im.size
                if w < 10 or h < 10:
                    raise ValueError(f"image too small ({w}x{h})")
                if Path(f).suffix.lower() in (".jpg", ".jpeg"):
                    with open(f, "rb") as fh:
                        fh.seek(-2, 2)
                        if fh.read() != b"\xff\xd9":
                            raise ValueError("truncated JPEG")
                good.append(f)
            except Exception as e:
                print(f"dataset: quarantined {f}: {e}")
        if not good:
            raise FileNotFoundError("all images failed verification")
        return good

    # ------------------------------------------------------------------
    def _cache_key(self):
        h = hashlib.md5()
        for f in self.img_files:
            h.update(f.encode())
        h.update(str(len(self.img_files)).encode())
        h.update(",".join(self.names).encode())
        return h.hexdigest()[:16]

    def _load_labels(self, cache_dir):
        cache_path = None
        if cache_dir:
            cache_path = Path(cache_dir) / f"labels_{self._cache_key()}.npz"
            if cache_path.exists():
                z = np.load(cache_path, allow_pickle=True)
                # stored as dtype=object; restore concrete float32 arrays
                self.polys = [
                    np.asarray(p, np.float32).reshape(-1, 8) for p in z["polys"]
                ]
                self.cls = [np.asarray(c, np.float32).reshape(-1) for c in z["cls"]]
                return
        self.polys, self.cls = [], []
        for lf in self.label_files:
            p, c = parse_dota_annotation(lf, self.name_to_id)
            self.polys.append(p)
            self.cls.append(c)
        if cache_path is not None:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(
                cache_path,
                polys=np.array(self.polys, dtype=object),
                cls=np.array(self.cls, dtype=object),
            )

    def __len__(self):
        return len(self.img_files)

    # ------------------------------------------------------------------
    def load_image(self, i):
        """Read + resize so max(h,w) == img_size (reference load_image),
        scaling labels to match. Returns (img BGR, polys, cls, (h0, w0)).

        With ``cache_images`` set, the *resized* image is cached (RAM dict or
        .npy on disk) and a copy is returned — augmentations mutate in place."""
        cached = self._cached_image(i)
        if cached is not None:
            img, r, (h0, w0) = cached
            polys = self.polys[i] * r if r != 1 else self.polys[i]
            return img, polys.copy(), self.cls[i].copy(), (h0, w0)
        img = cv2.imread(self.img_files[i])
        if img is None:
            raise FileNotFoundError(f"image not found: {self.img_files[i]}")
        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        polys = self.polys[i]
        if r != 1:
            img = cv2.resize(
                img,
                (int(w0 * r), int(h0 * r)),
                interpolation=cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA,
            )
            polys = polys * r
        self._store_image(i, img, r, (h0, w0))
        return img, polys.copy(), self.cls[i].copy(), (h0, w0)

    def _cached_image(self, i):
        """Return (resized-img copy, scale, (h0, w0)) on cache hit else None."""
        if self.cache_images == "ram":
            hit = self._ram_cache.get(i)
            if hit is not None:
                img, r, hw0 = hit
                return img.copy(), r, hw0
        elif self.cache_images == "disk":
            p = self._disk_cache_dir / f"{i}.npz"
            if p.exists():
                z = np.load(p)
                return z["img"], float(z["r"]), tuple(int(v) for v in z["hw0"])
        return None

    def _store_image(self, i, img, r, hw0):
        if self.cache_images == "ram":
            self._ram_cache[i] = (img.copy(), r, hw0)
        elif self.cache_images == "disk":
            p = self._disk_cache_dir / f"{i}.npz"
            if not p.exists():
                np.savez(p, img=img, r=np.float64(r), hw0=np.asarray(hw0, np.int64))

    # ------------------------------------------------------------------
    def _encode(self, polys, cls, img_shape):
        """polys/cls → padded (max_labels, 186) targets + mask.

        Keep rule: rbox centre inside the image and min-edge sanity
        (reference datasets.py:653-657 — whose ``&``/``|`` precedence bug
        keeping any box with s>5 we deliberately fix to
        centre-inside AND (l>5 or s>5))."""
        M = self.max_labels
        out = np.zeros((M, TARGET_COLS), np.float32)
        mask = np.zeros((M,), bool)
        if len(polys):
            radius = float(self.hyp.get("csl_radius", 6.0))
            rb, csl = poly2rbox_csl(polys.astype(np.float64), radius=radius)
            h, w = img_shape[:2]
            keep = (
                (rb[:, 0] >= 0)
                & (rb[:, 0] < w)
                & (rb[:, 1] >= 0)
                & (rb[:, 1] < h)
                & ((rb[:, 2] > 5) | (rb[:, 3] > 5))
            )
            rb, csl, cls = rb[keep], csl[keep], cls[keep]
            n = min(len(rb), M)
            out[:n, 0] = cls[:n]
            out[:n, 1:6] = rb[:n]
            out[:n, 6:] = csl[:n]
            mask[:n] = True
        return out, mask

    # ------------------------------------------------------------------
    def get_train_sample(self, index: int, rng: np.random.Generator):
        hyp = self.hyp
        use_mosaic = self.augment and rng.random() < hyp.get("mosaic", 0.0)
        if use_mosaic:
            use9 = rng.random() < hyp.get("mosaic9", 0.0)
            k = 8 if use9 else 3
            idxs = [index] + list(rng.integers(0, len(self), k))
            rng.shuffle(idxs)

            def load(i):
                img, polys, cls, _ = self.load_image(i)
                return img, polys, cls

            mosaic_fn = A.mosaic9 if use9 else A.mosaic4
            img, polys, cls = mosaic_fn(load, idxs, self.img_size, rng, hyp)
            if hyp.get("copy_paste", 0.0) > 0:
                img, polys, cls = A.copy_paste(
                    img, polys, cls, rng, p=hyp["copy_paste"]
                )
            if rng.random() < hyp.get("mixup", 0.0):
                j = int(rng.integers(0, len(self)))
                jdxs = [j] + list(rng.integers(0, len(self), 3))
                img2, polys2, cls2 = A.mosaic4(load, jdxs, self.img_size, rng, hyp)
                img, polys, cls = A.mixup(img, polys, cls, img2, polys2, cls2, rng)
            shapes = None
        else:
            img, polys, cls, (h0, w0) = self.load_image(index)
            img, ratio, pad = A.letterbox(
                img, self.img_size, auto=False, scaleup=self.augment
            )
            if len(polys):
                polys = polys.copy()
                polys[:, 0::2] = polys[:, 0::2] * ratio[0] + pad[0]
                polys[:, 1::2] = polys[:, 1::2] * ratio[1] + pad[1]
            if self.augment:
                img, polys, cls = A.random_perspective(
                    img, polys, cls, rng,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                )
            shapes = ((h0, w0), ((img.shape[0] / h0, img.shape[1] / w0), pad))

        if self.augment:
            if hyp.get("extra_aug", 0.0) > 0:
                img = np.ascontiguousarray(img)
                A.extra_augment(img, rng, p=hyp["extra_aug"])
            A.hsv_augment(
                img, rng,
                hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4),
            )
            if rng.random() < hyp.get("flipud", 0.0):
                img = np.flipud(img)
                if len(polys):
                    polys = A.flip_polys_ud(polys, img.shape[0])
            if rng.random() < hyp.get("fliplr", 0.0):
                img = np.fliplr(img)
                if len(polys):
                    polys = A.flip_polys_lr(polys, img.shape[1])

        targets, mask = self._encode(polys, cls, img.shape)
        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR → RGB, HWC uint8
        return {
            "image": img,
            "targets": targets,
            "target_mask": mask,
            "index": np.int32(index),
        }

    def get_eval_sample(self, index: int):
        """Letterboxed, un-augmented sample + rescale metadata."""
        img, polys, cls, (h0, w0) = self.load_image(index)
        lh, lw = img.shape[:2]
        img, ratio, pad = A.letterbox(img, self.eval_canvas, auto=False,
                                      scaleup=False)
        if len(polys):
            polys = polys.copy()
            polys[:, 0::2] = polys[:, 0::2] * ratio[0] + pad[0]
            polys[:, 1::2] = polys[:, 1::2] * ratio[1] + pad[1]
        targets, mask = self._encode(polys, cls, img.shape)
        img_rgb = np.ascontiguousarray(img[:, :, ::-1])
        out = {
            "image": img_rgb,
            "targets": targets,
            "target_mask": mask,
            "index": np.int32(index),
            "orig_hw": np.array([h0, w0], np.int32),
        }
        if self.eval_pad > 0:
            # canvas→orig mapping can't be recomputed from shapes alone on
            # the padded canvas: gain = load ratio * letterbox ratio
            out["ratio_pad"] = np.array(
                [lh / h0 * ratio[1], pad[0], pad[1]], np.float64)
        return out
