"""Train-step tests: overfit a fixed batch; identical math on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov5_obb_tpu.engine.loss import ComputeLoss
from yolov5_obb_tpu.engine.optim import build_optimizer
from yolov5_obb_tpu.engine.trainer import (
    create_train_state,
    make_mesh,
    make_train_step,
    put_batch,
    put_state,
)
from yolov5_obb_tpu.models.yolo import create_model
from yolov5_obb_tpu.ops.geometry import csl_gaussian_labels


def _fixed_batch(rng, B=8, M=8, imgsz=64, nc=3):
    img = rng.integers(0, 255, (B, imgsz, imgsz, 3), dtype=np.uint8)
    targets = np.zeros((B, M, 186), np.float32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        n = 3
        for i in range(n):
            cx, cy = rng.uniform(10, 54, 2)
            l = rng.uniform(10, 30)
            s = l * rng.uniform(0.4, 0.9)
            t = rng.uniform(-np.pi / 2, np.pi / 2)
            targets[b, i, 0] = rng.integers(0, nc)
            targets[b, i, 1:6] = [cx, cy, l, s, t]
            targets[b, i, 6:] = csl_gaussian_labels(
                np.array([t * 180 / np.pi + 90]), radius=2.0
            )[0]
            mask[b, i] = True
    return img, targets, mask


class _B:
    def __init__(self, img, targets, mask):
        self.image, self.targets, self.target_mask = img, targets, mask


@pytest.mark.slow
def test_overfit_single_batch(rng):
    nc = 3
    model, variables, meta = create_model("yolov5n.yaml", nc=nc, imgsz=64)
    loss_fn = ComputeLoss(meta, {"box": 0.05, "obj": 1.0, "cls": 0.5, "theta": 0.5})
    hyp = {"lr0": 0.02, "warmup_epochs": 0.0, "warmup_bias_lr": 0.02}
    tx, info = build_optimizer(
        variables["params"], hyp, epochs=10, steps_per_epoch=10, batch_size=64
    )
    assert info["accumulate"] == 1
    state = create_train_state(variables, tx)
    step = make_train_step(model, loss_fn, tx)
    img, targets, mask = _fixed_batch(rng)
    losses = []
    for _ in range(30):
        state, m = step(state, jnp.asarray(img), jnp.asarray(targets), jnp.asarray(mask))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert np.isfinite(losses).all()
    # EMA tracked and differs from params (lagging)
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))
    assert int(state.step) == 30


def test_mesh_step_matches_single_device(rng):
    """The pjit-sharded step must produce the same loss trajectory as the
    unsharded step (data-parallel = pure partitioning, no semantic change)."""
    nc = 2
    model, variables, meta = create_model("yolov5n.yaml", nc=nc, imgsz=64)
    loss_fn = ComputeLoss(meta)
    hyp = {"lr0": 0.01, "warmup_epochs": 0.0}
    tx, _ = build_optimizer(
        variables["params"], hyp, epochs=5, steps_per_epoch=5, batch_size=64
    )
    img, targets, mask = _fixed_batch(rng, B=8)

    mesh8 = make_mesh(8, platform="cpu")
    mesh1 = make_mesh(1, platform="cpu")
    assert mesh8.devices.size == 8

    # independent copies: the steps donate their state, and device_put to an
    # already-matching placement aliases instead of copying
    v1 = jax.tree.map(jnp.copy, variables)
    v2 = jax.tree.map(jnp.copy, variables)
    s1 = put_state(create_train_state(v1, tx), mesh1)
    step1 = make_train_step(model, loss_fn, tx, mesh=mesh1)
    s2 = put_state(create_train_state(v2, tx), mesh8)
    step2 = make_train_step(model, loss_fn, tx, mesh=mesh8)
    batch = _B(img, targets, mask)

    l1, l2 = [], []
    for _ in range(3):
        s1, m1 = step1(s1, *put_batch(batch, mesh1))
        s2, m2 = step2(s2, *put_batch(batch, mesh8))
        l1.append(float(m1["loss"]))
        l2.append(float(m2["loss"]))
    np.testing.assert_allclose(l1, l2, rtol=2e-3)


def test_mesh_eval_matches_single_device(mini_dota_session):
    """Sharded evaluation (batch over a 4-device mesh) must reproduce the
    single-device metrics exactly (pure SPMD, no cross-batch state)."""
    from yolov5_obb_tpu.data.dota import DotaDataset
    from yolov5_obb_tpu.engine.evaluator import evaluate
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.general import load_hyp

    names = [f"c{i}" for i in range(15)]
    ds = DotaDataset(str(mini_dota_session / "images"), names, img_size=128,
                     hyp=load_hyp(None), augment=False, max_labels=32)
    model, variables, meta = create_model("yolov5n.yaml", nc=15, imgsz=128)

    r1 = evaluate(model, variables, meta, ds, batch_size=4, max_images=4)
    r8 = evaluate(model, variables, meta, ds, batch_size=4, max_images=4,
                  mesh=make_mesh(4, platform="cpu"))
    assert r1["map50"] == r8["map50"]
    assert r1["mp"] == r8["mp"] and r1["mr"] == r8["mr"]


def test_selective_remat_matches_stock(rng):
    """remat='selective' (save only conv_out residuals, recompute BN/SiLU
    in the backward) is a pure scheduling change — the loss trajectory must
    match the stock step."""
    import jax

    nc = 2
    model, variables, meta = create_model("yolov5n.yaml", nc=nc, imgsz=64)
    loss_fn = ComputeLoss(meta)
    hyp = {"lr0": 0.01, "warmup_epochs": 0.0}
    tx, _ = build_optimizer(
        variables["params"], hyp, epochs=5, steps_per_epoch=5, batch_size=64
    )
    img, targets, mask = _fixed_batch(rng, B=2)
    batch = _B(img, targets, mask)

    v1 = jax.tree.map(jnp.copy, variables)
    v2 = jax.tree.map(jnp.copy, variables)
    s1 = create_train_state(v1, tx)
    s2 = create_train_state(v2, tx)
    step1 = make_train_step(model, loss_fn, tx)
    step2 = make_train_step(model, loss_fn, tx, remat="selective")

    l1, l2 = [], []
    for _ in range(3):
        s1, m1 = step1(s1, *put_batch(batch, None))
        s2, m2 = step2(s2, *put_batch(batch, None))
        l1.append(float(m1["loss"]))
        l2.append(float(m2["loss"]))
    np.testing.assert_allclose(l1, l2, rtol=1e-4)


def test_mesh_step_dense_loss_matches_single_device(rng):
    """--dense-loss under the 8-device data mesh: the scatter-free loss
    must shard cleanly under GSPMD (per-image scatters partition on the
    batch axis) and reproduce the mesh(1) trajectory."""
    nc = 2
    model, variables, meta = create_model("yolov5n.yaml", nc=nc, imgsz=64)
    loss_fn = ComputeLoss(meta, dense=True)
    hyp = {"lr0": 0.01, "warmup_epochs": 0.0}
    tx, _ = build_optimizer(
        variables["params"], hyp, epochs=5, steps_per_epoch=5, batch_size=64
    )
    img, targets, mask = _fixed_batch(rng, B=8)

    mesh8 = make_mesh(8, platform="cpu")
    mesh1 = make_mesh(1, platform="cpu")
    v1 = jax.tree.map(jnp.copy, variables)
    v2 = jax.tree.map(jnp.copy, variables)
    s1 = put_state(create_train_state(v1, tx), mesh1)
    step1 = make_train_step(model, loss_fn, tx, mesh=mesh1)
    s2 = put_state(create_train_state(v2, tx), mesh8)
    step2 = make_train_step(model, loss_fn, tx, mesh=mesh8)
    batch = _B(img, targets, mask)

    l1, l2 = [], []
    for _ in range(3):
        s1, m1 = step1(s1, *put_batch(batch, mesh1))
        s2, m2 = step2(s2, *put_batch(batch, mesh8))
        l1.append(float(m1["loss"]))
        l2.append(float(m2["loss"]))
    np.testing.assert_allclose(l1, l2, rtol=2e-3)
    assert np.isfinite(l1).all()
