"""Fused train region (models/yolo.YoloModel.fused_train): full-model
loss/grad/batch-stats parity vs the stock train path, plus eligibility
gating.

The region replaces layers 0-3 (stem → down1 → C3 → down2) with the
stat-carrying Pallas pass chain (ops/pallas/train_fused.py; interpret
mode on CPU).  Kernel-level gradient exactness is pinned by
tests/test_train_fused.py's chain test; here we assert the INTEGRATION:
identical param trees, matching loss, directionally-identical gradients
(bf16 rounding amplifies through train-BN — same control argument as
tests/test_packed_train.py:79-101), and matching running-stat updates
(the twin-module momentum path, layers._StemBnParams second call).
"""

import numpy as np
import pytest


def _targets(rng, b=2, nc=3):
    import jax.numpy as jnp

    tg = np.zeros((b, 8, 186), np.float32)
    tg[:, :4, 0] = rng.integers(0, nc, (b, 4))
    tg[:, :4, 1:3] = rng.uniform(20, 100, (b, 4, 2))
    tg[:, :4, 3:5] = rng.uniform(8, 40, (b, 4, 2))
    tg[:, :4, 5] = rng.uniform(-1.5, 1.5, (b, 4))
    tg[:, :4, 6:] = rng.uniform(0, 1, (b, 4, 180))
    mask = np.zeros((b, 8), bool)
    mask[:, :4] = True
    return jnp.asarray(tg), jnp.asarray(mask)


@pytest.fixture(scope="module")
def built():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.yolo import create_model

    stock = create_model("yolov5n.yaml", nc=3, dtype=jnp.bfloat16,
                         rng=jax.random.PRNGKey(0), imgsz=128,
                         packed_stem=True)
    fused = create_model("yolov5n.yaml", nc=3, dtype=jnp.bfloat16,
                         rng=jax.random.PRNGKey(0), imgsz=128,
                         packed_stem=True, fused_train=True)
    return stock, fused


def test_param_trees_identical(built):
    import jax.tree_util as jtu

    (_, v_s, _), (_, v_f, _) = built
    paths = lambda t: [jtu.keystr(k) for k, _ in
                       jtu.tree_flatten_with_path(t)[0]]
    assert paths(v_s) == paths(v_f)


def test_loss_grads_and_stats_match(built):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    (model_s, v_s, meta), (model_f, _, _) = built
    assert model_f.fused_train

    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.utils.general import load_hyp, scale_hyp_gains

    loss_fn = ComputeLoss(
        meta, scale_hyp_gains(load_hyp(None), meta.nl, 3, 128))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8)
    xp = jnp.asarray(img.reshape(2, 128, -1))
    tg, mask = _targets(rng)

    def run(model, params):
        def loss_of(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": v_s["batch_stats"]},
                xp, train=True, flat=True, mutable=["batch_stats"])
            total, _ = loss_fn(outs, tg, mask)
            return total, mut

        (l, mut), g = jax.value_and_grad(loss_of, has_aux=True)(params)
        return l, g, mut

    l_s, g_s, mut_s = run(model_s, v_s["params"])
    l_f, g_f, mut_f = run(model_f, v_s["params"])

    np.testing.assert_allclose(float(l_f), float(l_s), rtol=3e-2)

    # running-stat updates through the twin modules must match flax
    # BatchNorm's (momentum 0.97, biased variance)
    for (path, a), b in zip(jtu.tree_flatten_with_path(mut_s)[0],
                            jtu.tree_leaves(mut_f)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 2e-2, (
            jtu.keystr(path), np.abs(a - b).max())

    # gradient parity: directional (see module docstring)
    def cos(ga, gb):
        a = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jtu.tree_leaves(ga)])
        b = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jtu.tree_leaves(gb)])
        n = np.linalg.norm(a) * np.linalg.norm(b)
        return float(a @ b / n) if n else 1.0

    det = f"m{len(model_s.specs) - 1}"
    assert cos(g_s[det], g_f[det]) > 0.9, cos(g_s[det], g_f[det])
    for name in ("m0", "m1", "m2", "m3", "m4"):
        c = cos(g_s[name], g_f[name])
        assert c > 0.7, (name, c)


def test_gating_falls_back():
    """Ineligible shapes/specs run the stock path (identical outputs)."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.yolo import create_model

    # imgsz 64: (H//4) % 32 != 0 → region gated off; fused model must
    # EXACTLY equal the packed-stem model (same code path)
    ms, vs, _ = create_model("yolov5n.yaml", nc=3, dtype=jnp.bfloat16,
                             rng=jax.random.PRNGKey(0), imgsz=64,
                             packed_stem=True)
    mf, _, _ = create_model("yolov5n.yaml", nc=3, dtype=jnp.bfloat16,
                            rng=jax.random.PRNGKey(0), imgsz=64,
                            packed_stem=True, fused_train=True)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    xp = jnp.asarray(img.reshape(1, 64, -1))
    outs_s, _ = ms.apply(vs, xp, train=True, flat=True,
                         mutable=["batch_stats"])
    outs_f, _ = mf.apply(vs, xp, train=True, flat=True,
                         mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(outs_s),
                    jax.tree_util.tree_leaves(outs_f)):
        assert np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32))


def test_specs_gate():
    from yolov5_obb_tpu.models.yolo import (
        _fused_train_specs_ok,
        build_model,
    )

    for cfg in ("yolov5n.yaml", "yolov5m.yaml", "yolov5x.yaml"):
        model, _, _ = build_model(cfg, nc=3)
        assert _fused_train_specs_ok(model.specs), cfg
    # Focus stem (no Conv(6,2) layer 0) → ineligible
    model, _, _ = build_model("yolov3.yaml", nc=3)
    assert not _fused_train_specs_ok(model.specs)
