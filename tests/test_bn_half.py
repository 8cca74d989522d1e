"""bf16 BN/SiLU train path (YOLO_BN_HALF=1, the TPU default) must track
the f32 path: same batch stats dtype/values to bf16 precision, and a loss
trajectory that stays within bf16 noise of the f32 trajectory.

The switch only changes the normalize/SiLU elementwise compute dtype —
flax keeps the batch statistics accumulation and the params in f32
(layers._bn_dtype) — so divergence beyond ~1% after a few steps would
indicate a real wiring bug, not rounding.
"""

import numpy as np
import pytest


def _run_steps(bn_half: bool, n_steps: int = 8):
    import os

    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.engine.optim import build_optimizer
    from yolov5_obb_tpu.engine.trainer import create_train_state, make_train_step
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.general import load_hyp, scale_hyp_gains

    old = os.environ.get("YOLO_BN_HALF")
    os.environ["YOLO_BN_HALF"] = "1" if bn_half else "0"
    try:
        imgsz, batch, max_labels = 64, 2, 8
        model, variables, meta = create_model(
            "yolov5n.yaml", nc=3, dtype=jnp.bfloat16, imgsz=imgsz)
        hyp = load_hyp(None)
        loss_fn = ComputeLoss(meta, scale_hyp_gains(hyp, meta.nl, meta.nc, imgsz))
        tx, _ = build_optimizer(variables["params"], hyp, epochs=3,
                                steps_per_epoch=4, batch_size=batch,
                                nominal_batch=batch)
        state = create_train_state(variables, tx)
        step_fn = make_train_step(model, loss_fn, tx)

        rng = np.random.default_rng(0)
        losses = []
        for i in range(n_steps):
            img = rng.integers(0, 255, (batch, imgsz, imgsz, 3), np.uint8)
            tg = np.zeros((batch, max_labels, 186), np.float32)
            tg[:, :3, 0] = rng.integers(0, 3, (batch, 3))
            tg[:, :3, 1:3] = rng.uniform(16, 48, (batch, 3, 2))
            tg[:, :3, 3:5] = rng.uniform(8, 24, (batch, 3, 2))
            tg[:, :3, 5] = rng.uniform(-1.5, 1.5, (batch, 3))
            tg[:, :3, 6:] = rng.uniform(0, 1, (batch, 3, 180))
            mask = np.zeros((batch, max_labels), bool)
            mask[:, :3] = True
            state, m = step_fn(state, *map(jnp.asarray, (img, tg, mask)))
            losses.append(float(m["loss"]))
        stats = jax.tree.leaves(state.batch_stats)
        assert all(s.dtype == jnp.float32 for s in stats)
        return np.asarray(losses), state
    finally:
        if old is None:
            os.environ.pop("YOLO_BN_HALF", None)
        else:
            os.environ["YOLO_BN_HALF"] = old


@pytest.mark.slow
def test_bn_half_tracks_f32():
    l32, _ = _run_steps(False)
    l16, _ = _run_steps(True)
    # step 0 shares identical weights: the loss difference is pure bf16
    # rounding of the normalize/SiLU math (no compounding yet)
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 5e-3, (l32[0], l16[0])
    # later steps compound weight drift through SGD+momentum; the
    # trajectory must stay in the same regime (a wiring bug — e.g. stats
    # in bf16, wrong param dtype — blows this up immediately)
    rel = np.abs(l16 - l32) / np.maximum(np.abs(l32), 1e-6)
    assert rel.max() < 0.05, (l32.tolist(), l16.tolist())
