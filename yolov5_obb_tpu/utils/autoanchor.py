"""AutoAnchor: anchor fit check + k-means/GA anchor evolution.

Counterpart of reference utils/autoanchor.py:20-197, operating on the
rotated boxes' (long, short) edge pairs (the reference computes anchors from
rbox l,s extracted from the polys, autoanchor.py:30-80).
"""

from __future__ import annotations

import numpy as np


def _metric(wh: np.ndarray, anchors: np.ndarray):
    """Per-box best anchor ratio metric (reference autoanchor.py:40-46)."""
    r = wh[:, None] / anchors[None]  # (n, k, 2)
    x = np.minimum(r, 1 / r).min(2)  # ratio metric
    best = x.max(1)
    return x, best


def anchor_fitness(wh: np.ndarray, anchors: np.ndarray, thr: float = 4.0):
    """Mean best-ratio over boxes passing 1/thr (reference autoanchor.py:83-90)."""
    _, best = _metric(wh, anchors)
    t = 1.0 / thr
    return float((best * (best > t)).mean())


def best_possible_recall(wh: np.ndarray, anchors: np.ndarray, thr: float = 4.0):
    x, best = _metric(wh, anchors)
    aat = float((x > 1 / thr).sum(1).mean())  # anchors above threshold
    bpr = float((best > 1 / thr).mean())
    return bpr, aat


def dataset_wh(dataset, img_size: int | None = None):
    """Collect (l, s) edges of all rboxes in a DotaDataset, scaled the way
    training scales them (max dim → img_size)."""
    import cv2

    from ..ops.geometry import poly2rbox

    whs = []
    img_size = img_size or dataset.img_size
    for i, polys in enumerate(dataset.polys):
        if not len(polys):
            continue
        # scale like load_image: r = img_size / max(h0, w0)
        img = cv2.imread(dataset.img_files[i])
        if img is None:
            continue
        r = img_size / max(img.shape[:2])
        rb = poly2rbox(polys.astype(np.float64) * r)
        whs.append(rb[:, 2:4])
    return np.concatenate(whs, 0) if whs else np.zeros((0, 2))


def kmean_anchors(wh: np.ndarray, n: int = 9, thr: float = 4.0,
                  gen: int = 1000, seed: int = 0, verbose: bool = False):
    """k-means init + genetic evolution of anchors (reference autoanchor.py:83-197).

    Returns (n, 2) anchors sorted by area."""
    from scipy.cluster.vq import kmeans

    rng = np.random.default_rng(seed)
    wh = wh[(wh >= 2.0).any(1)]  # filter tiny boxes (reference :122)
    if len(wh) < n:
        raise ValueError(f"need ≥{n} boxes for {n} anchors, have {len(wh)}")

    s = wh.std(0)
    k, _ = kmeans(wh / s, n, iter=30, seed=seed)
    if len(k) != n:  # kmeans may collapse clusters; fall back to quantiles
        q = np.linspace(0.05, 0.95, n)
        k = np.quantile(wh / s, q, axis=0)
    k *= s

    f = anchor_fitness(wh, k, thr)
    shape = k.shape
    mp, sigma = 0.9, 0.1  # mutation prob / scale (reference :180)
    for _ in range(gen):
        v = np.ones(shape)
        while (v == 1).all():
            v = ((rng.random(shape) < mp) * rng.random() * rng.normal(1, sigma, shape)).clip(0.3, 3.0)
            v[v == 0] = 1
        kg = (k * v).clip(2.0, None)
        fg = anchor_fitness(wh, kg, thr)
        if fg > f:
            f, k = fg, kg.copy()
    k = k[np.argsort(k.prod(1))]
    if verbose:
        bpr, aat = best_possible_recall(wh, k, thr)
        print(f"autoanchor: fitness={f:.4f} bpr={bpr:.4f} aat={aat:.2f}")
    return k


def check_anchors(dataset, meta, thr: float = 4.0, imgsz: int = 1024,
                  bpr_threshold: float = 0.98, evolve_gen: int = 1000):
    """BPR check; evolve new anchors when fit is poor (reference autoanchor.py:30-80).

    Returns (possibly updated) anchors_px (nl, na, 2)."""
    wh = dataset_wh(dataset, imgsz)
    if not len(wh):
        return meta.anchors_px
    # jitter scales like the reference's random scale augmentation (:37-39)
    anchors = meta.anchors_px.reshape(-1, 2)
    bpr, aat = best_possible_recall(wh, anchors, thr)
    print(f"autoanchor: BPR={bpr:.4f}, anchors/target={aat:.2f}")
    if bpr > bpr_threshold:
        return meta.anchors_px
    print("autoanchor: BPR below threshold, evolving new anchors...")
    try:
        new = kmean_anchors(wh, n=anchors.shape[0], thr=thr, gen=evolve_gen, verbose=True)
    except Exception as e:
        print(f"autoanchor failed: {e}")
        return meta.anchors_px
    new_bpr, _ = best_possible_recall(wh, new, thr)
    if new_bpr > bpr:
        return new.reshape(meta.anchors_px.shape)
    return meta.anchors_px
