"""Rotated-box geometry: poly / rbox / hbb conversions and CSL labels.

Conventions (parity with reference utils/rboxs_utils.py):

* ``poly``: ``(..., 8)`` = ``[x1 y1 x2 y2 x3 y3 x4 y4]`` quadrilateral corners,
  image coordinates (y down).
* ``rbox``: ``(..., 5)`` = ``[cx cy l s theta]`` with *long-edge* convention:
  ``l >= s`` and ``theta`` the angle of the long edge, radians,
  ``theta ∈ [-pi/2, pi/2)``  (reference rboxs_utils.py:39-81).
* ``hbb``:  ``(..., 4)`` = ``[cx cy w h]`` axis-aligned cover
  (reference rboxs_utils.py:147-181).
* CSL angle class index = ``theta_deg + 90 ∈ [0, 180)``
  (reference rboxs_utils.py:70).

Everything is vectorized and works on NumPy arrays (host data pipeline) or
jnp arrays (device); the reference's per-box ``cv2.minAreaRect`` loop is
replaced by a batched min-area-rect over candidate edge directions.
"""

from __future__ import annotations

import numpy as np

PI = np.pi


def _xp(a):
    """Return the array namespace (numpy or jax.numpy) of `a`."""
    if type(a).__module__.startswith(("jax", "jaxlib")):
        import jax.numpy as jnp

        return jnp
    return np


def regular_theta(theta, start=-PI / 2, cycle=PI):
    """Wrap angles into ``[start, start + cycle)``  (reference rboxs_utils.py:28-37)."""
    return (theta - start) % cycle + start


def csl_gaussian_labels(theta_deg, num_bins: int = 180, radius: float = 6.0):
    """Circular Smooth Labels: gaussian window wrapped on the angle circle.

    Args:
        theta_deg: ``(n,)`` float angle-class values in ``[0, num_bins)``
            (i.e. ``theta_deg = theta*180/pi + 90``).
        num_bins: number of angle bins (180).
        radius: gaussian sigma == CSL window radius (hyp ``csl_radius``).

    Returns:
        ``(n, num_bins)`` float32, peak 1.0 at the label bin.

    Matches reference ``gaussian_label_cpu`` (rboxs_utils.py:9-26) including
    its peak-bin placement: the gaussian is centred on bin
    ``(num_bins/2 - trunc(num_bins/2 - theta_deg))`` — i.e. a float label is
    snapped with truncation, not rounding.
    """
    xp = _xp(theta_deg)
    theta_deg = xp.asarray(theta_deg)
    half = num_bins // 2
    # reference: index = int(num_class/2 - label); csl = roll(gaussian, -index)
    idx = xp.trunc(half - theta_deg)
    j = xp.arange(num_bins, dtype=theta_deg.dtype if theta_deg.dtype.kind == "f" else None)
    # distance of bin j from the peak, wrapped to [-half, half)
    d = (j[None, :] + idx[..., None]) % num_bins - half
    return xp.exp(-(d.astype(xp.float32) ** 2) / (2.0 * float(radius) ** 2))


def rbox2poly(rboxes):
    """``(n,5) [cx cy l s theta]`` → ``(n,8)`` corner polygon.

    Vertex layout matches reference ``rbox2poly`` (rboxs_utils.py:106-145):
    unit long-edge direction ``e1 = (cos t, -sin t)``, unit short-edge
    direction ``e2 = (-sin t, -cos t)``; corners are
    ``c+a+b, c+a-b, c-a-b, c-a+b`` with ``a = l/2*e1``, ``b = s/2*e2``.
    """
    xp = _xp(rboxes)
    rboxes = xp.asarray(rboxes)
    c = rboxes[..., 0:2]
    l = rboxes[..., 2:3]
    s = rboxes[..., 3:4]
    t = rboxes[..., 4:5]
    cos, sin = xp.cos(t), xp.sin(t)
    a = xp.concatenate([l / 2 * cos, -l / 2 * sin], axis=-1)
    b = xp.concatenate([-s / 2 * sin, -s / 2 * cos], axis=-1)
    pts = xp.concatenate([c + a + b, c + a - b, c - a - b, c - a + b], axis=-1)
    return pts.reshape(rboxes.shape[:-1] + (8,))


def poly2rbox(polys, return_angle_deg: bool = False):
    """Batched min-area-rect: ``(n,8)`` polys → ``(n,5) [cx cy l s theta]``.

    Replaces the reference's per-box ``cv2.minAreaRect`` loop
    (rboxs_utils.py:59-75) with a vectorized search: the minimum-area
    enclosing rectangle of a convex polygon shares a direction with one of
    its edges, so evaluating the 6 directions spanned by all point pairs of
    the quad (a superset of its convex-hull edges) and taking the min-area
    candidate is exact.

    Returns ``(n,5)`` rboxes, plus ``(n,)`` angle-class floats
    (``theta_deg + 90 ∈ [0,180)``) when ``return_angle_deg``.
    """
    xp = _xp(polys)
    polys = xp.asarray(polys)
    pts = polys.reshape(polys.shape[:-1] + (4, 2))  # (n,4,2)

    # candidate directions: all 6 unordered point pairs
    ii, jj = np.triu_indices(4, 1)
    d = pts[..., jj, :] - pts[..., ii, :]  # (n,6,2)
    # theta convention: long-edge vector (dx,dy) ⇒ theta = atan2(-dy, dx)
    theta = xp.arctan2(-d[..., 1], d[..., 0])  # (n,6)
    cos, sin = xp.cos(theta), xp.sin(theta)
    # orthonormal frame e1=(cos,-sin), e2=(sin,cos)
    p1 = pts[..., None, :, 0] * cos[..., None] - pts[..., None, :, 1] * sin[..., None]  # (n,6,4)
    p2 = pts[..., None, :, 0] * sin[..., None] + pts[..., None, :, 1] * cos[..., None]
    w = p1.max(axis=-1) - p1.min(axis=-1)  # extent along e1, (n,6)
    h = p2.max(axis=-1) - p2.min(axis=-1)
    area = w * h
    k = xp.argmin(area, axis=-1)  # (n,)

    take = lambda a: xp.take_along_axis(a, k[..., None], axis=-1)[..., 0]
    w, h, theta, cos, sin = take(w), take(h), take(theta), take(cos), take(sin)
    m1 = (take(p1.max(axis=-1)) + take(p1.min(axis=-1))) / 2
    m2 = (take(p2.max(axis=-1)) + take(p2.min(axis=-1))) / 2
    cx = m1 * cos + m2 * sin
    cy = -m1 * sin + m2 * cos

    # long-edge convention (reference rboxs_utils.py:66-69)
    swap = h > w
    l = xp.where(swap, h, w)
    s = xp.where(swap, w, h)
    theta = regular_theta(xp.where(swap, theta + PI / 2, theta))
    rb = xp.stack([cx, cy, l, s, theta], axis=-1)
    if return_angle_deg:
        return rb, theta * (180.0 / PI) + 90.0
    return rb


def poly2rbox_csl(polys, num_bins: int = 180, radius: float = 6.0):
    """polys → (rboxes ``(n,5)``, CSL labels ``(n,num_bins)``).

    Mirror of reference ``poly2rbox(..., use_gaussian=True)``
    (rboxs_utils.py:39-81) used by the label pipeline (datasets.py:637-648).
    """
    rb, ang = poly2rbox(polys, return_angle_deg=True)
    return rb, csl_gaussian_labels(ang, num_bins=num_bins, radius=radius)


def poly2hbb(polys):
    """``(n,8)`` polys → ``(n,4) [cx cy w h]`` axis-aligned cover (rboxs_utils.py:147-181)."""
    xp = _xp(polys)
    polys = xp.asarray(polys)
    x = polys[..., 0::2]
    y = polys[..., 1::2]
    x_min, x_max = x.min(axis=-1), x.max(axis=-1)
    y_min, y_max = y.min(axis=-1), y.max(axis=-1)
    return xp.stack(
        [(x_min + x_max) / 2, (y_min + y_max) / 2, x_max - x_min, y_max - y_min], axis=-1
    )


def poly_filter(polys, h, w):
    """Keep-mask for polys whose hbb centre lies inside (0,w)x(0,h) (rboxs_utils.py:183-200)."""
    xp = _xp(polys)
    x = polys[..., 0::2]
    y = polys[..., 1::2]
    xc = (x.min(axis=-1) + x.max(axis=-1)) / 2
    yc = (y.min(axis=-1) + y.max(axis=-1)) / 2
    return (xc > 0) & (xc < w) & (yc > 0) & (yc < h)


# ---------------------------------------------------------------------------
# axis-aligned helpers (reference utils/general.py:545-677)
# ---------------------------------------------------------------------------


def xywh2xyxy(x):
    xp = _xp(x)
    x = xp.asarray(x)
    half = x[..., 2:4] / 2
    return xp.concatenate([x[..., 0:2] - half, x[..., 0:2] + half], axis=-1)


def xyxy2xywh(x):
    xp = _xp(x)
    x = xp.asarray(x)
    return xp.concatenate([(x[..., 0:2] + x[..., 2:4]) / 2, x[..., 2:4] - x[..., 0:2]], axis=-1)


def clip_polys(polys, h, w):
    """Clamp poly coords into the image (reference general.py:652-677)."""
    xp = _xp(polys)
    x = xp.clip(polys[..., 0::2], 0, w)
    y = xp.clip(polys[..., 1::2], 0, h)
    out = xp.stack([x, y], axis=-1).reshape(polys.shape)
    return out


def scale_polys(img1_shape, polys, img0_shape, ratio_pad=None):
    """Rescale polys from letterboxed `img1_shape` (h,w) back to `img0_shape`.

    Parity with reference ``scale_polys`` (general.py:636-651): gain is
    computed from the resize ratio, pad removed from both coordinates.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    xp = _xp(polys)
    polys = xp.asarray(polys).astype(xp.float64 if xp is np else xp.float32)
    x = (polys[..., 0::2] - pad[0]) / gain
    y = (polys[..., 1::2] - pad[1]) / gain
    return xp.stack([x, y], axis=-1).reshape(polys.shape)
