"""Host-side image + polygon augmentations (NumPy / OpenCV).

Poly-aware counterparts of the reference pipeline
(utils/augmentations.py:48-222, utils/datasets.py:562-698): every geometric
transform is applied to all four polygon corners, and filtering keeps boxes
whose centre stays inside the image (no corner clipping — rotated boxes must
survive partially-visible).

All randomness flows through an explicit ``np.random.Generator`` so the
pipeline is reproducible and safe under multi-process loading.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from ..ops.geometry import poly_filter

PAD_COLOR = (114, 114, 114)


def letterbox(img, new_shape, color=PAD_COLOR, auto=False, scale_fill=False,
              scaleup=True, stride=32):
    """Aspect-preserving resize + pad (reference augmentations.py:92-128).

    Returns (img, (rw, rh), (dw, dh)) with dw/dh the one-side paddings.
    """
    h, w = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = int(round(w * r)), int(round(h * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / w, new_shape[0] / h)
    dw /= 2
    dh /= 2
    if (w, h) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return img, ratio, (dw, dh)


def hsv_augment(img, rng: np.random.Generator, hgain=0.5, sgain=0.5, vgain=0.5):
    """In-place LUT HSV jitter (reference augmentations.py:48-61); BGR input."""
    if not (hgain or sgain or vgain):
        return img
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def random_perspective(img, polys, cls, rng: np.random.Generator, degrees=10.0,
                       translate=0.1, scale=0.1, shear=10.0, perspective=0.0,
                       border=(0, 0)):
    """Random affine/perspective warp of image + polygons.

    Mirrors reference augmentations.py:131-222: full ``T@S@R@P@C`` 3x3 warp
    applied to every polygon corner, centre-inside keep mask, no clipping.
    Returns (img, polys, cls).
    """
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=PAD_COLOR)
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=PAD_COLOR)

    n = len(polys)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = polys.reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        keep = poly_filter(xy, h=height, w=width)
        polys, cls = xy[keep], cls[keep]
    return img, polys, cls


def flip_polys_ud(polys, img_h):
    out = polys.copy()
    out[:, 1::2] = img_h - polys[:, 1::2] - 1
    return out


def flip_polys_lr(polys, img_w):
    out = polys.copy()
    out[:, 0::2] = img_w - polys[:, 0::2] - 1
    return out


def mixup(img1, polys1, cls1, img2, polys2, cls2, rng: np.random.Generator):
    """Beta(32,32) image blend, label union (reference augmentations.py:276-281)."""
    r = rng.beta(32.0, 32.0)
    img = (img1 * r + img2 * (1 - r)).astype(np.uint8)
    return img, np.concatenate([polys1, polys2], 0), np.concatenate([cls1, cls2], 0)


def mosaic4(load_fn, indices, img_size: int, rng: np.random.Generator, hyp: dict):
    """4-image mosaic (reference datasets.py:725-785).

    ``load_fn(i)`` → (img BGR HWC uint8 resized to long-side=img_size,
    polys (n,8) pixels, cls (n,)).
    Returns the mosaic after random_perspective with mosaic border crop.
    """
    s = img_size
    border = (-s // 2, -s // 2)
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    polys4, cls4 = [], []
    img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    for i, index in enumerate(indices):
        img, polys, cls = load_fn(index)
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        if len(polys):
            p = polys.copy()
            p[:, 0::2] += x1a - x1b
            p[:, 1::2] += y1a - y1b
            polys4.append(p)
            cls4.append(cls)

    if polys4:
        polys4 = np.concatenate(polys4, 0)
        cls4 = np.concatenate(cls4, 0)
        keep = poly_filter(polys4, h=2 * s, w=2 * s)
        polys4, cls4 = polys4[keep], cls4[keep]
    else:
        polys4 = np.zeros((0, 8), np.float32)
        cls4 = np.zeros((0,), np.float32)

    img4, polys4, cls4 = random_perspective(
        img4, polys4, cls4, rng,
        degrees=hyp.get("degrees", 0.0),
        translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5),
        shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
        border=border,
    )
    return img4, polys4, cls4
