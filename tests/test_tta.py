"""TTA tests: flip theta remap semantics + shape bookkeeping."""

import jax.numpy as jnp
import numpy as np

from yolov5_obb_tpu.models.tta import _flip_theta_lr, predict_tta
from yolov5_obb_tpu.models.yolo import create_model


def test_flip_theta_mapping():
    nc = 3
    pred = np.zeros((1, 4, 5 + nc + 180), np.float32)
    pred[0, 0, 5 + nc + 120] = 1.0  # theta bin 120 (θ=+30°)
    out = np.asarray(_flip_theta_lr(jnp.asarray(pred), nc))
    assert out[0, 0, 5 + nc + 60] == 1.0  # → bin 60 (θ=-30°)
    assert out[0, 0, 5 + nc + 120] == 0.0
    # bin 0 (θ=-90°) maps to itself ((180-0) % 180 = 0)
    pred2 = np.zeros_like(pred)
    pred2[0, 1, 5 + nc + 0] = 1.0
    out2 = np.asarray(_flip_theta_lr(jnp.asarray(pred2), nc))
    assert out2[0, 1, 5 + nc + 0] == 1.0


def test_flip_theta_involution(rng):
    nc = 2
    pred = rng.random((2, 8, 5 + nc + 180)).astype(np.float32)
    once = _flip_theta_lr(jnp.asarray(pred), nc)
    twice = np.asarray(_flip_theta_lr(once, nc))
    np.testing.assert_allclose(twice, pred, atol=1e-7)


def test_predict_tta_shapes():
    model, variables, meta = create_model("yolov5n.yaml", nc=3, imgsz=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pred = predict_tta(model, variables, meta, x)
    # 3 scales: 64 (anchors 1008... n=3*(8²+4²+2²)=252), 32 (63), 32 (63)
    # minus clip_augmented trims
    assert pred.ndim == 3 and pred.shape[0] == 1 and pred.shape[2] == 188
    assert pred.shape[1] > 100
    assert np.isfinite(np.asarray(pred)).all()
