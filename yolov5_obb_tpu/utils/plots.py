"""Drawing helpers: oriented-box annotation on images (reference utils/plots.py:113-147)."""

from __future__ import annotations

import cv2
import numpy as np

_PALETTE = [
    (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
    (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
    (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
    (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
    (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
]


def class_color(i: int):
    return _PALETTE[int(i) % len(_PALETTE)]


def draw_poly(img, poly, label: str | None = None, color=None, line_width: int = 2):
    """Draw one oriented box polygon (+label) on a BGR image in place."""
    pts = np.asarray(poly, np.float64).reshape(4, 2).astype(np.int32)
    color = color or (0, 255, 0)
    cv2.drawContours(img, [pts], 0, color, line_width)
    if label:
        x, y = pts[:, 0].min(), pts[:, 1].min() - 4
        cv2.putText(
            img, label, (int(x), max(int(y), 12)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA,
        )
    return img


def annotate_detections(img, polys, confs, clses, names, line_width=2, hide_conf=False):
    """Draw all detections; img is BGR uint8 (modified in place)."""
    for poly, conf, c in zip(polys, confs, clses):
        name = names[int(c)] if names and int(c) < len(names) else str(int(c))
        label = name if hide_conf else f"{name} {conf:.2f}"
        draw_poly(img, poly, label, class_color(int(c)), line_width)
    return img
