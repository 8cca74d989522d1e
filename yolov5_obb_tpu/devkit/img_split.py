"""DOTA image tiling: split huge aerial images into overlapping patches.

Host-side counterpart of the reference DOTA_devkit/ImgSplit_multi_process.py:
* sliding window ``subsize`` x ``subsize`` with ``gap`` overlap
  (stride = subsize - gap, ImgSplit_multi_process.py:49-87, 252-273);
* GT polygons are kept whole when fully inside a tile; partially-covered
  polygons are clipped to the tile and relabelled difficult '2' when their
  intersection-over-area falls below ``thresh`` (0.7)
  (ImgSplit_multi_process.py:160-224);
* 5-point clip results are repaired to 4 points by merging the shortest
  edge (GetPoly4FromPoly5, :134-158); richer clips fall back to the
  min-area rectangle;
* tile names are ``{stem}__{rate}__{left}___{up}`` (:248).

Uses NumPy polygon clipping (devkit/poly_iou.py) instead of shapely.
"""

from __future__ import annotations

import multiprocessing
from functools import partial
from pathlib import Path

import cv2
import numpy as np

from ..data.dota import IMG_EXTS
from .poly_iou import clip_polygon, poly_area


def _best_point_order(poly: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Cyclic-rotate poly (4,2) to minimise L2 distance to ref
    (reference choose_best_pointorder_fit_another, :19-37)."""
    best, best_d = poly, np.inf
    for k in range(4):
        cand = np.roll(poly, -k, axis=0)
        d = np.sum((cand - ref) ** 2)
        if d < best_d:
            best, best_d = cand, d
    return best


def _poly5to4(poly: np.ndarray) -> np.ndarray:
    """Merge the shortest edge of a 5-gon into its midpoint (reference
    GetPoly4FromPoly5, :134-158)."""
    n = len(poly)
    dists = [np.linalg.norm(poly[i] - poly[(i + 1) % n]) for i in range(n)]
    i = int(np.argmin(dists))
    mid = (poly[i] + poly[(i + 1) % n]) / 2
    out = [mid if k == i else poly[k] for k in range(n) if k != (i + 1) % n]
    return np.asarray(out)


def clip_poly_to_tile(poly8: np.ndarray, left: float, up: float, size: int,
                      thresh: float = 0.7):
    """Clip one GT polygon against a tile window.

    Returns (poly8_in_tile_coords | None, difficult_suffix) where
    difficult_suffix is '' (keep original flag) or '2' (force difficult).
    """
    quad = poly8.reshape(4, 2)
    window = np.array(
        [[left, up], [left + size, up], [left + size, up + size], [left, up + size]],
        np.float64,
    )
    inter = clip_polygon(quad.astype(np.float64), window)
    if len(inter) < 3:
        return None, ""
    a_poly = poly_area(quad.astype(np.float64))
    if a_poly <= 0:
        return None, ""
    ioa = poly_area(inter) / a_poly
    if ioa >= 1 - 1e-6:
        out = quad.astype(np.float64)
        flag = ""
    else:
        if len(inter) == 4:
            out = inter
        elif len(inter) == 5:
            out = _poly5to4(inter)
        else:
            # >5 points: min-area rect of the clipped region
            out = _min_area_rect(inter).reshape(4, 2)
        out = _best_point_order(out, quad)
        flag = "" if ioa > thresh else "2"
    out = out - np.array([left, up])
    out = np.clip(out, 0, size)
    return out.reshape(-1), flag


def _min_area_rect(pts: np.ndarray) -> np.ndarray:
    (x, y), (w, h), ang = cv2.minAreaRect(pts.astype(np.float32))
    box = cv2.boxPoints(((x, y), (w, h), ang))
    return np.asarray(box, np.float64)


def _tile_origins(length: int, subsize: int, slide: int):
    """Window origins covering [0, length) (reference :252-273)."""
    out = [0]
    while out[-1] + subsize < length:
        nxt = min(out[-1] + slide, max(length - subsize, 0))
        if nxt == out[-1]:
            break
        out.append(nxt)
    return out


def split_single_image(
    img_path,
    label_path,
    out_img_dir,
    out_label_dir,
    rate: float = 1.0,
    subsize: int = 1024,
    gap: int = 200,
    thresh: float = 0.7,
    ext: str = ".png",
    padding: bool = True,
):
    """Tile one image (+optional DOTA labels). Returns number of tiles written."""
    img = cv2.imread(str(img_path))
    if img is None:
        return 0
    if rate != 1.0:
        img = cv2.resize(img, None, fx=rate, fy=rate, interpolation=cv2.INTER_CUBIC)

    objs = []
    if label_path is not None and Path(label_path).exists():
        for line in Path(label_path).read_text().splitlines():
            parts = line.split()
            if len(parts) < 9:
                continue
            try:
                coords = np.array([float(v) for v in parts[:8]], np.float64) * rate
            except ValueError:
                continue
            objs.append((coords, parts[8], parts[9] if len(parts) > 9 else "0"))

    h, w = img.shape[:2]
    slide = subsize - gap
    stem = Path(img_path).stem
    out_img_dir = Path(out_img_dir)
    out_label_dir = Path(out_label_dir)
    out_img_dir.mkdir(parents=True, exist_ok=True)
    out_label_dir.mkdir(parents=True, exist_ok=True)

    n = 0
    for up in _tile_origins(h, subsize, slide):
        for left in _tile_origins(w, subsize, slide):
            tile = img[up : up + subsize, left : left + subsize]
            if padding and (tile.shape[0] < subsize or tile.shape[1] < subsize):
                pad = np.zeros((subsize, subsize, 3), img.dtype)
                pad[: tile.shape[0], : tile.shape[1]] = tile
                tile = pad
            name = f"{stem}__{rate}__{left}___{up}"
            lines = []
            for coords, cls_name, diff in objs:
                clipped, force_diff = clip_poly_to_tile(
                    coords, left, up, subsize, thresh
                )
                if clipped is None:
                    continue
                d = force_diff or diff
                lines.append(
                    " ".join(f"{v:.1f}" for v in clipped) + f" {cls_name} {d}"
                )
            cv2.imwrite(str(out_img_dir / f"{name}{ext}"), tile)
            (out_label_dir / f"{name}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
            n += 1
    return n


def split_dataset(
    src_dir,
    dst_dir,
    rate: float = 1.0,
    subsize: int = 1024,
    gap: int = 200,
    thresh: float = 0.7,
    num_workers: int = 8,
    ext: str = ".png",
    with_labels: bool = True,
):
    """Tile a DOTA split dir (images/ [+ labelTxt/]) into dst_dir.

    Multi-process counterpart of reference splitbase.splitdata
    (ImgSplit_multi_process.py:275, SplitOnlyImage_multi_process.py)."""
    src = Path(src_dir)
    imgs = sorted(
        f for f in (src / "images").rglob("*") if f.suffix.lower() in IMG_EXTS
    )
    out_img = Path(dst_dir) / "images"
    out_lab = Path(dst_dir) / "labelTxt"
    work = partial(
        _split_one,
        src=src, out_img=out_img, out_lab=out_lab, rate=rate, subsize=subsize,
        gap=gap, thresh=thresh, ext=ext, with_labels=with_labels,
    )
    if num_workers > 1 and len(imgs) > 1:
        with multiprocessing.Pool(num_workers) as pool:
            counts = pool.map(work, imgs)
    else:
        counts = [work(f) for f in imgs]
    return int(sum(counts))


def _split_one(img_path, *, src, out_img, out_lab, rate, subsize, gap, thresh,
               ext, with_labels):
    label = (
        src / "labelTxt" / (Path(img_path).stem + ".txt") if with_labels else None
    )
    return split_single_image(
        img_path, label, out_img, out_lab, rate=rate, subsize=subsize, gap=gap,
        thresh=thresh, ext=ext,
    )
