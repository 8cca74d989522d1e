"""COCO-like access API over a DOTA dataset dir (reference DOTA_devkit/DOTA.py:18-114
and dota_utils parsers :47-133)."""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from ..data.dota import IMG_EXTS, parse_dota_annotation


def parse_dota_poly(label_file):
    """One labelTxt file → list of dicts {name, poly (4,2), difficult}
    (reference dota_utils.parse_dota_poly:47-90)."""
    objects = []
    p = Path(label_file)
    if not p.exists():
        return objects
    for line in p.read_text().splitlines():
        parts = line.split()
        if len(parts) < 9:
            continue
        try:
            coords = np.array([float(v) for v in parts[:8]]).reshape(4, 2)
        except ValueError:
            continue
        objects.append(
            {
                "name": parts[8],
                "poly": coords,
                "difficult": int(parts[9]) if len(parts) > 9 and parts[9].isdigit() else 0,
                "area": _shoelace(coords),
            }
        )
    return objects


def parse_dota_rec(label_file):
    """Like parse_dota_poly but with axis-aligned xyxy bounds
    (reference dota_utils.parse_dota_rec:110-133)."""
    out = []
    for o in parse_dota_poly(label_file):
        p = o["poly"]
        o = dict(o)
        o["bndbox"] = [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]
        out.append(o)
    return out


def _shoelace(pts):
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


class DOTA:
    """Index over images/ + labelTxt/ with COCO-style queries."""

    def __init__(self, basepath):
        self.basepath = Path(basepath)
        self.image_dir = self.basepath / "images"
        self.label_dir = self.basepath / "labelTxt"
        self.img_paths = {
            f.stem: f
            for f in sorted(self.image_dir.rglob("*"))
            if f.suffix.lower() in IMG_EXTS
        }
        self.anns = {
            stem: parse_dota_poly(self.label_dir / f"{stem}.txt")
            for stem in self.img_paths
        }
        self.cat_to_imgs = defaultdict(set)
        for stem, objs in self.anns.items():
            for o in objs:
                self.cat_to_imgs[o["name"]].add(stem)

    def get_img_ids(self, cat_names=()):
        """Image ids containing ALL the given categories (reference DOTA.py:35-55)."""
        if not cat_names:
            return sorted(self.img_paths)
        sets = [self.cat_to_imgs.get(c, set()) for c in cat_names]
        return sorted(set.intersection(*sets)) if sets else []

    def load_anns(self, cat_names=(), img_id=None, difficult=None):
        ids = [img_id] if img_id else self.get_img_ids(cat_names)
        out = []
        for i in ids:
            for o in self.anns.get(i, []):
                if cat_names and o["name"] not in cat_names:
                    continue
                if difficult is not None and o["difficult"] != difficult:
                    continue
                out.append({**o, "image_id": i})
        return out

    def load_imgs(self, img_ids):
        import cv2

        if isinstance(img_ids, str):
            img_ids = [img_ids]
        return [cv2.imread(str(self.img_paths[i])) for i in img_ids]

    def show_anns(self, img_id, save_path=None):
        """Draw annotations on the image (reference DOTA.py:57-91)."""
        import cv2

        from ..utils.plots import class_color, draw_poly

        img = self.load_imgs(img_id)[0]
        cats = sorted({o["name"] for o in self.anns.get(img_id, [])})
        for o in self.anns.get(img_id, []):
            draw_poly(
                img, o["poly"].reshape(-1), o["name"],
                class_color(cats.index(o["name"])),
            )
        if save_path:
            cv2.imwrite(str(save_path), img)
        return img
