"""OBB training loss: dense, fully-jit target assignment + 4-term loss.

Reference semantics (utils/loss.py:91-275) re-expressed as static-shape
masked math instead of boolean indexing:

* targets arrive padded per image as ``(B, M, 6+180)``
  ``[cls cx cy l s theta csl...]`` (pixels) with a ``(B, M)`` validity mask
  — the collate path pads instead of concatenating ragged rows;
* the candidate set per level is the dense lattice
  ``(B, M, na, 5)`` = targets x anchors x {centre,left,up,right,down}
  with the reference's anchor-ratio filter (``max(r,1/r) < anchor_t``,
  loss.py:237-240) and ±0.5-offset cell rule (loss.py:243-250) as masks;
* predictions for matched cells are fetched with one static-shape gather
  per level, the objectness target grid with one scatter-max.

Loss terms (loss.py:139-192): CIoU box loss, IoU-valued objectness BCE with
per-level balance, label-smoothed class BCE, and the CSL theta BCE.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

THETA_BINS = 180

DEFAULT_HYP = {
    # data/hyps/obb/hyp.finetune_dota.yaml
    "box": 0.05,
    "cls": 0.5,
    "cls_pw": 1.0,
    "obj": 1.0,
    "obj_pw": 1.0,
    "theta": 0.5,
    "theta_pw": 1.0,
    "anchor_t": 4.0,
    "fl_gamma": 0.0,
    "qfl_gamma": 0.0,  # >0: quality-focal modulation (overrides fl_gamma)
    "bce_blur": 0.0,   # >0: BCEBlur missing-label alleviation on obj/cls
    "label_smoothing": 0.0,
    # CSL gaussian window sigma — used by the dense loss path to
    # regenerate theta targets analytically on the grid. MUST match the
    # data pipeline's radius: data/dota.py falls back to 6.0 (the
    # reference gaussian_label_cpu default) when a hyp omits the key, so
    # this fallback is 6.0 too; every shipped hyp yaml sets 2.0 and both
    # sides then read that same value.
    "csl_radius": 6.0,
}


def smooth_bce(eps: float = 0.1):
    """Positive/negative label-smoothing targets (reference loss.py:13-15)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with pos_weight (torch semantics)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_modulation(logits, targets, gamma: float, alpha: float = 0.25):
    """Focal-loss modulation factor (reference loss.py:35-62, TF variant)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_f * (1.0 - p_t) ** gamma


def qfocal_modulation(logits, targets, gamma: float, alpha: float = 0.25):
    """Quality-focal modulation (reference loss.py:65-88): weight by the
    |target − σ(logit)|^γ quality gap instead of p_t."""
    p = jax.nn.sigmoid(logits)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_f * jnp.abs(targets - p) ** gamma


def bce_blur_with_logits(logits, targets, alpha: float = 0.05):
    """BCE with missing-label alleviation (reference loss.py:18-32): reduce
    the loss of confident positives whose target is 0 (likely unlabeled)."""
    loss = bce_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    dx = p - targets
    alpha_factor = 1 - jnp.exp((dx - 1) / (alpha + 1e-4))
    return loss * alpha_factor


def ciou_xywh(box1, box2, eps: float = 1e-7):
    """CIoU of two xywh boxes over trailing dim (reference metrics.py:201-236)."""
    b1x1, b1x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
    b1y1, b1y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
    b2x1, b2x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
    b2y1, b2y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0
    )
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


# ---------------------------------------------------------------------------


_OFFSETS = jnp.array(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]], jnp.float32
)  # centre, left, up, right, down (g=0.5; reference loss.py:220-224)


def _assign_level(t_xyls, t_mask, anchors_ft, stride, ny, nx, anchor_t):
    """Dense assignment for one pyramid level.

    Args:
        t_xyls: (B, M, 4) target [cx cy l s] in input pixels.
        t_mask: (B, M) bool.
        anchors_ft: (na, 2) anchors in feature units.
        stride, ny, nx: level geometry.

    Returns dict with per-candidate (B, M, na, 5) tensors:
        mask, cell (int gj*nx+gi flattened), a (anchor idx), txy, twh.
    """
    g = 0.5
    xyls = t_xyls / stride  # feature units
    gxy = xyls[..., 0:2]  # (B, M, 2)
    gwh = xyls[..., 2:4]

    # anchor-ratio filter (B, M, na)
    r = gwh[..., None, :] / anchors_ft  # (B, M, na, 2)
    afilt = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1) < anchor_t

    # 5-way offset masks (B, M, 5)
    fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
    inv_x, inv_y = nx - gxy[..., 0], ny - gxy[..., 1]
    m_c = jnp.ones_like(fx, dtype=bool)
    m_l = (fx < g) & (gxy[..., 0] > 1)
    m_u = (fy < g) & (gxy[..., 1] > 1)
    m_r = (inv_x % 1.0 < g) & (inv_x > 1)
    m_d = (inv_y % 1.0 < g) & (inv_y > 1)
    off_mask = jnp.stack([m_c, m_l, m_u, m_r, m_d], axis=-1)

    gij = jnp.floor(gxy[..., None, :] - _OFFSETS)  # (B, M, 5, 2)
    gi = jnp.clip(gij[..., 0], 0, nx - 1)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)
    txy = gxy[..., None, :] - jnp.stack([gi, gj], axis=-1)  # (B, M, 5, 2)

    mask = (
        t_mask[..., None, None] & afilt[..., :, None] & off_mask[..., None, :]
    )  # (B, M, na, 5)
    cell = (gj * nx + gi).astype(jnp.int32)  # (B, M, 5)
    return {
        "mask": mask,
        "cell": jnp.broadcast_to(cell[..., None, :], mask.shape),
        "txy": txy,  # (B, M, 5, 2) — broadcast over anchors downstream
        "twh": gwh,  # (B, M, 2)
    }


def _masked_mean(x, mask, eps=1e-9):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


@functools.partial(jax.jit,
                   static_argnames=("nc", "strides", "hyp_static", "dense"))
def _compute_loss_impl(maps, targets, t_mask, anchors_grid, nc, strides,
                       hyp_static, dense=False):
    hyp = dict(hyp_static)
    cp, cn = smooth_bce(hyp.get("label_smoothing", 0.0))
    gamma = hyp.get("fl_gamma", 0.0)
    qgamma = hyp.get("qfl_gamma", 0.0)
    blur = hyp.get("bce_blur", 0.0)

    def modulate(loss, logit, target):
        if qgamma > 0:
            return loss * qfocal_modulation(logit, target, qgamma)
        if gamma > 0:
            return loss * focal_modulation(logit, target, gamma)
        return loss

    def blur_factor(logit, target):
        # reference BCEBlurWithLogitsLoss (loss.py:18-32)
        dx = jax.nn.sigmoid(logit) - target
        return 1.0 - jnp.exp((dx - 1.0) / (blur + 1e-4))
    nl = len(maps)
    balance = {3: (4.0, 1.0, 0.4)}.get(nl, (4.0, 1.0, 0.25, 0.06, 0.02))

    t_cls = targets[..., 0].astype(jnp.int32)  # (B, M)
    t_xyls = targets[..., 1:5]
    t_csl = targets[..., 6 : 6 + THETA_BINS]  # (B, M, 180)

    lbox = lobj = lcls = ltheta = 0.0
    B = maps[0].shape[0]

    na = anchors_grid.shape[1]
    for li in range(nl):
        p = maps[li]  # (B, ny, nx, na, no) or flat (B, ny*nx*na, no)
        if p.ndim == 5:
            _, ny, nx, _, no = p.shape
            pf = p.reshape(B, ny * nx * na, no)
        else:
            # flat Detect output (model.apply(..., flat=True)) — the TPU
            # fast path: the 5-D layout's na=3 sublane pads 3→8 (~2.7x HBM
            # inflation) on every loss read; flat levels assumed square
            _, n_lvl, no = p.shape
            ny = nx = int(round((n_lvl // na) ** 0.5))
            if ny * nx * na != n_lvl:
                raise ValueError(
                    f"flat loss path requires square feature maps: level "
                    f"{li} has {n_lvl} cells with na={na} (ny*nx*na != "
                    f"n_lvl); pass 5-D maps for non-square inputs"
                )
            pf = p
        asn = _assign_level(
            t_xyls, t_mask, anchors_grid[li], strides[li], ny, nx, hyp["anchor_t"]
        )
        mask = asn["mask"]  # (B, M, na, 5)
        Bb, M = mask.shape[:2]
        K = M * na * 5

        # flatten candidates and gather predictions at their cells
        cell = asn["cell"].reshape(B, M, na, 5)
        a_idx = jnp.broadcast_to(
            jnp.arange(na, dtype=jnp.int32)[None, None, :, None], mask.shape
        )
        flat_idx = (cell * na + a_idx).reshape(B, K)

        if dense:
            # --- scatter-free-backward formulation (r5) ------------------
            # The gather path's backward scatter-adds (B,K,no) cotangents
            # into the dense (B,n,no) map gradient at ~1 elem/cycle. Here
            # the scatter moves to the NON-differentiated side: all target
            # data (stop-grad) is scattered to the grid once in the
            # forward, and box/cls/theta are computed densely at every
            # cell under a mask — the backward is pure fused elementwise
            # over map reads that the obj term already pays for.
            # Semantics: identical to the gather path unless two targets
            # claim the same (cell, anchor) candidate — then ONE target
            # wins here (last scatter) where the reference keeps both loss
            # rows (and takes the max iou for tobj). Collisions need two
            # objects within ±0.5 cell at the same anchor; rare in
            # practice, which is why this is an opt-in speed mode
            # (ComputeLoss(dense=True) / train.py --dense-loss) rather
            # than the parity default.
            n_rows = ny * nx * na
            tthdeg = targets[..., 5] * (180.0 / jnp.pi) + 90.0  # (B, M)
            tcat = jnp.concatenate([
                jnp.broadcast_to(asn["txy"][:, :, None, :, :],
                                 (B, M, na, 5, 2)).reshape(B, K, 2),
                jnp.broadcast_to(asn["twh"][:, :, None, None, :],
                                 (B, M, na, 5, 2)).reshape(B, K, 2),
                jnp.broadcast_to(t_cls[:, :, None, None].astype(jnp.float32),
                                 (B, M, na, 5)).reshape(B, K, 1),
                jnp.broadcast_to(tthdeg[:, :, None, None],
                                 (B, M, na, 5)).reshape(B, K, 1),
                jnp.ones((B, K, 1), jnp.float32),
            ], axis=-1)                                   # (B, K, 7)
            mflat = mask.reshape(B, K)
            bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K))
            idx_eff = jnp.where(mflat, flat_idx, n_rows)  # OOB → dropped
            dense_t = jnp.zeros((B, n_rows, 7), jnp.float32)
            dense_t = dense_t.at[bidx, idx_eff].set(tcat, mode="drop")
            d_mask = dense_t[..., 6] > 0                  # (B, n)
            dm = d_mask.astype(jnp.float32)

            # box: CIoU densely, anchors repeat per cell (row % na == a)
            anch_rows = jnp.tile(anchors_grid[li], (ny * nx, 1))  # (n, 2)
            pxy = jax.nn.sigmoid(pf[..., 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(pf[..., 2:4]) * 2.0) ** 2 * anch_rows
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            iou = ciou_xywh(pbox, dense_t[..., 0:4])      # (B, n)
            lbox = lbox + _masked_mean(1.0 - iou, d_mask)

            # objectness target directly on the grid — no scatter at all
            tobj = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * dm
            obj_logit = pf[..., 4]
            obj_l = bce_with_logits(obj_logit, tobj, hyp["obj_pw"])
            obj_l = modulate(obj_l, obj_logit, tobj)
            if blur > 0:
                obj_l = obj_l * blur_factor(obj_logit, tobj)
            lobj = lobj + obj_l.mean() * balance[li]

            if nc > 1:
                cls_logit = pf[..., 5:5 + nc]
                t_onehot = jnp.where(
                    jax.nn.one_hot(dense_t[..., 4].astype(jnp.int32), nc,
                                   dtype=jnp.float32) > 0, cp, cn)
                cls_l = bce_with_logits(cls_logit, t_onehot, hyp["cls_pw"])
                cls_l = modulate(cls_l, cls_logit, t_onehot)
                if blur > 0:
                    cls_l = cls_l * blur_factor(cls_logit, t_onehot)
                lcls = lcls + _masked_mean(
                    cls_l, jnp.broadcast_to(d_mask[..., None], cls_l.shape))

            # theta CSL regenerated analytically (ops/geometry.
            # csl_gaussian_labels semantics, incl. trunc peak snapping);
            # fuses into the BCE — the (B, n, 180) target never hits HBM
            th_logit = pf[..., 5 + nc:]
            idx = jnp.trunc(90.0 - dense_t[..., 5])        # (B, n)
            jbins = jnp.arange(THETA_BINS, dtype=jnp.float32)
            dist = (jbins + idx[..., None]) % THETA_BINS - 90.0
            r2 = 2.0 * float(hyp["csl_radius"]) ** 2
            tth = jnp.exp(-(dist ** 2) / r2)
            th_l = bce_with_logits(th_logit, tth, hyp["theta_pw"])
            th_l = modulate(th_l, th_logit, tth)
            ltheta = ltheta + _masked_mean(
                th_l, jnp.broadcast_to(d_mask[..., None], th_l.shape))
            continue

        # row-slice gather instead of take_along_axis: broadcasting the index
        # over the channel dim asks for a per-element (B*K*no offsets) gather;
        # the vmapped take keeps whole-(no,) row slices. Measured on v5e it is
        # only a ~5% win on the loss fwd+bwd (0.94 vs 0.99 ms/img,
        # tools/bench_train_decomp.py lossgrad) — the bwd scatter-add, not the
        # fwd gather lowering, dominates the block either way.
        ps = jax.vmap(lambda p_, i_: jnp.take(p_, i_, axis=0))(
            pf, flat_idx
        )  # (B, K, no)

        mflat = mask.reshape(B, K)

        # --- box: CIoU in feature units --------------------------------
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        anch = jnp.broadcast_to(
            anchors_grid[li][None, None, :, None, :], (B, M, na, 5, 2)
        ).reshape(B, K, 2)
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anch
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        txy = jnp.broadcast_to(asn["txy"][:, :, None, :, :], (B, M, na, 5, 2)).reshape(
            B, K, 2
        )
        twh = jnp.broadcast_to(
            asn["twh"][:, :, None, None, :], (B, M, na, 5, 2)
        ).reshape(B, K, 2)
        tbox = jnp.concatenate([txy, twh], axis=-1)
        iou = ciou_xywh(pbox, tbox)  # (B, K)
        lbox = lbox + _masked_mean(1.0 - iou, mflat)

        # --- objectness target grid via scatter-max ---------------------
        score_iou = jax.lax.stop_gradient(jnp.clip(iou, 0.0))
        tobj = jnp.zeros((B, ny * nx * na), jnp.float32)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K))
        tobj = tobj.at[bidx, flat_idx].max(
            jnp.where(mflat, score_iou, 0.0), mode="drop"
        )
        obj_logit = pf[..., 4]
        obj_l = bce_with_logits(obj_logit, tobj, hyp["obj_pw"])
        obj_l = modulate(obj_l, obj_logit, tobj)
        if blur > 0:
            obj_l = obj_l * blur_factor(obj_logit, tobj)
        lobj = lobj + obj_l.mean() * balance[li]

        # --- classification ---------------------------------------------
        if nc > 1:
            cls_logit = ps[..., 5 : 5 + nc]  # (B, K, nc)
            tcls = jnp.broadcast_to(
                t_cls[:, :, None, None], (B, M, na, 5)
            ).reshape(B, K)
            t_onehot = jnp.where(
                jax.nn.one_hot(tcls, nc, dtype=jnp.float32) > 0, cp, cn
            )
            cls_l = bce_with_logits(cls_logit, t_onehot, hyp["cls_pw"])
            cls_l = modulate(cls_l, cls_logit, t_onehot)
            if blur > 0:
                cls_l = cls_l * blur_factor(cls_logit, t_onehot)
            lcls = lcls + _masked_mean(
                cls_l, jnp.broadcast_to(mflat[..., None], cls_l.shape)
            )

        # --- theta CSL ---------------------------------------------------
        th_logit = ps[..., 5 + nc :]  # (B, K, 180)
        tth = jnp.broadcast_to(
            t_csl[:, :, None, None, :], (B, M, na, 5, THETA_BINS)
        ).reshape(B, K, THETA_BINS)
        th_l = bce_with_logits(th_logit, tth, hyp["theta_pw"])
        th_l = modulate(th_l, th_logit, tth)
        ltheta = ltheta + _masked_mean(
            th_l, jnp.broadcast_to(mflat[..., None], th_l.shape)
        )

    lbox = lbox * hyp["box"]
    lobj = lobj * hyp["obj"]
    lcls = lcls * hyp["cls"]
    ltheta = ltheta * hyp["theta"]
    total = (lbox + lobj + lcls + ltheta) * B  # reference scales by bs (loss.py:189-192)
    return total, jnp.stack([lbox, lobj, lcls, ltheta])


class ComputeLoss:
    """Callable loss bound to model meta + hyp (reference utils/loss.py:91).

    ``dense=True`` (or env ``YOLO_DENSE_LOSS=1``) selects the
    scatter-free-backward formulation — identical semantics except when
    two targets claim the same (cell, anchor) candidate (see
    _compute_loss_impl); opt-in speed mode, reference parity is the
    default gather path."""

    def __init__(self, meta, hyp: dict | None = None, dense: bool | None = None):
        h = dict(DEFAULT_HYP)
        if hyp:
            h.update({k: v for k, v in hyp.items() if k in DEFAULT_HYP})
        self.hyp_static = tuple(sorted(h.items()))
        self.nc = meta.nc
        self.strides = tuple(meta.strides)
        self.anchors_grid = jnp.asarray(meta.anchors_grid, jnp.float32)
        if dense is None:
            import os

            dense = os.environ.get("YOLO_DENSE_LOSS", "0") == "1"
        self.dense = bool(dense)

    def __call__(self, maps: Sequence[Any], targets, t_mask):
        """maps: list of (B,ny,nx,na,no) raw logits; targets (B,M,186);
        t_mask (B,M) bool. Returns (total_loss, [lbox lobj lcls ltheta])."""
        return _compute_loss_impl(
            tuple(maps),
            targets,
            t_mask,
            self.anchors_grid,
            self.nc,
            self.strides,
            self.hyp_static,
            dense=self.dense,
        )
