"""Test-time augmentation: multi-scale + flip inference.

Counterpart of reference Model._forward_augment (models/yolo.py:149-222):
scales [1.0, 0.83, 0.67], flips [none, lr, none], predictions de-scaled and
merged, with the cross-scale tail clipping of _clip_augmented.

OBB-specific fix over the reference: a left-right flip negates the box
angle, so the 180 CSL bin scores are re-indexed ``b → (180 - b) % 180``
(the reference de-scales only xywh and leaves theta logits flipped —
models/yolo.py:183-199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .yolo import ModelMeta, decode

THETA_BINS = 180


def _scale_shape(imgsz: int, ratio: float, gs: int = 32) -> int:
    return int((imgsz * ratio) // gs * gs) if ratio != 1.0 else imgsz


def _flip_theta_lr(pred, nc: int):
    """Remap theta-bin scores for a horizontally-flipped image."""
    th = pred[..., 5 + nc :]
    # bin b encodes theta_deg = b - 90; mirror: theta → -theta ⇒ b → 180-b (mod 180)
    th_flipped = jnp.roll(th[..., ::-1], 1, axis=-1)
    return jnp.concatenate([pred[..., : 5 + nc], th_flipped], axis=-1)


def predict_tta(model, variables, meta: ModelMeta, image, nc: int | None = None,
                scales=(1.0, 0.83, 0.67), flips=(None, "lr", None)):
    """Augmented inference → (B, total_anchors, no) decoded predictions.

    `image`: (B, H, W, 3) float in [0,1]."""
    nc = nc if nc is not None else meta.nc
    B, H, W, _ = image.shape
    preds = []
    for si, fi in zip(scales, flips):
        h, w = _scale_shape(H, si), _scale_shape(W, si)
        xi = image
        if fi == "lr":
            xi = xi[:, :, ::-1]
        elif fi == "ud":
            xi = xi[:, ::-1]
        if (h, w) != (H, W):
            xi = jax.image.resize(xi, (B, h, w, 3), method="bilinear")
        maps = model.apply(variables, xi, train=False)
        y = decode(maps, meta)
        # de-scale (reference _descale_pred, yolo.py:183-199)
        scale_back = jnp.array([W / w, H / h, W / w, H / h], jnp.float32)
        xywh = y[..., :4] * scale_back
        if fi == "lr":
            xywh = xywh.at[..., 0].set(W - xywh[..., 0])
        elif fi == "ud":
            xywh = xywh.at[..., 1].set(H - xywh[..., 1])
        y = jnp.concatenate([xywh, y[..., 4:]], axis=-1)
        if fi == "lr":
            y = _flip_theta_lr(y, nc)
        preds.append(y)

    # _clip_augmented (yolo.py:200-210): drop large-object rows from the
    # finest output and small-object rows from the coarsest
    nl = meta.nl
    g = sum(4**x for x in range(nl))
    e = 1
    i = preds[0].shape[1] // g * sum(4**x for x in range(e))
    preds[0] = preds[0][:, : preds[0].shape[1] - i]
    i = preds[-1].shape[1] // g * sum(4 ** (nl - 1 - x) for x in range(e))
    preds[-1] = preds[-1][:, i:]
    return jnp.concatenate(preds, axis=1)
