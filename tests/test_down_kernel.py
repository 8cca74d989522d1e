"""Fused downsample Conv(3,2)+BN+SiLU Pallas kernel vs stock XLA conv
(interpret mode)."""

import numpy as np


def _parity(H, W, ci, co, seed=0):
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.down_kernel import _down_xla, fused_down

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, H, W, ci)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((9 * ci, co)) * 0.1, jnp.bfloat16)
    ss = jnp.asarray(
        np.stack([rng.uniform(0.5, 1.5, co), rng.standard_normal(co) * 0.2]),
        jnp.float32)
    want = np.asarray(_down_xla(x, w, ss), np.float32)
    got = np.asarray(fused_down(x, w, ss, use_pallas=True), np.float32)
    assert got.shape == want.shape == (2, H // 2, W // 2, co)
    err = np.abs(got - want)
    assert err.max() <= 0.05, err.max()  # bf16 rounding only
    # boundaries specifically (SAME zero-pad parity top/bottom/left)
    assert err[:, :1].max() <= 0.05 and err[:, -1:].max() <= 0.05
    assert err[:, :, :1].max() <= 0.05 and err[:, :, -1:].max() <= 0.05


def test_fused_down_matches_stock():
    """Layer-3 shape family: Conv(192, 3, 2) on a 96-ch input."""
    _parity(64, 48, 32, 48)


def test_fused_down_multiblock():
    """Several grid programs tall — block-boundary halo rows correct."""
    _parity(96, 32, 16, 24, seed=3)


def test_fused_down_module_path_equivalence(monkeypatch):
    """ConvBnAct(fused=True) == stock ConvBnAct with the SAME variables —
    the param-twin tree is identical so checkpoints load into either.
    fused_down is forced onto the (interpret-mode) Pallas kernel so the
    module wiring AND the kernel are exercised together off-TPU."""
    import functools

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from yolov5_obb_tpu.models import layers
    from yolov5_obb_tpu.ops.pallas import down_kernel
    from yolov5_obb_tpu.models.layers import ConvBnAct

    monkeypatch.setattr(layers, "_FUSED_DOWN_MIN_SPATIAL", 0)
    monkeypatch.setattr(
        down_kernel, "fused_down",
        functools.partial(down_kernel.fused_down, use_pallas=True))
    stock = ConvBnAct(48, 3, 2, dtype=jnp.bfloat16)
    fused = ConvBnAct(48, 3, 2, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 64, 32, 32)), jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(1), x, False)
    vf = fused.init(jax.random.PRNGKey(1), x, False)
    paths = lambda t: [jtu.keystr(k) for k, _ in
                      jtu.tree_flatten_with_path(t)[0]]
    assert paths(v) == paths(vf)
    assert fused._down_eligible(x, False)
    a = np.asarray(stock.apply(v, x, False), np.float32)
    b = np.asarray(fused.apply(v, x, False), np.float32)
    assert np.abs(a - b).max() <= 0.05


# ---------------------------------------------------------------------------
# train mode: raw-conv kernel + custom-VJP (Pallas wgrad, XLA igrad)
# ---------------------------------------------------------------------------


def test_fused_down_train_fwd_and_grads_match_xla():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.down_kernel import (_conv_raw_xla,
                                                       fused_down_train)

    rng = np.random.default_rng(11)
    H, W, ci, co = 64, 32, 16, 24
    x = jnp.asarray(rng.standard_normal((2, H, W, ci)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((9 * ci, co)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, H // 2, W // 2, co)),
                      jnp.float32)

    def loss(x, w, use_pallas):
        z = fused_down_train(x, w, use_pallas=use_pallas)
        return jnp.sum(z.astype(jnp.float32) * cot)

    z_p = fused_down_train(x, w, use_pallas=True)
    z_x = _conv_raw_xla(x, w)
    np.testing.assert_allclose(np.asarray(z_p, np.float32),
                               np.asarray(z_x, np.float32),
                               atol=0.05, rtol=0.05)

    gx_p, gw_p = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(x, w)
    gw_x_np = np.asarray(gw_x)
    np.testing.assert_allclose(np.asarray(gw_p), gw_x_np,
                               atol=0.02 * np.abs(gw_x_np).max(), rtol=0.05)
    np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                               np.asarray(gx_x, np.float32),
                               atol=0.05, rtol=0.05)


def test_fused_down_train_module_path(monkeypatch):
    """ConvBnAct(fused=True, train) == stock ConvBnAct(train): output,
    batch-stats update, and grads, with the interpret-mode kernel forced."""
    import functools

    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models import layers
    from yolov5_obb_tpu.models.layers import ConvBnAct
    from yolov5_obb_tpu.ops.pallas import down_kernel

    monkeypatch.setattr(layers, "_FUSED_DOWN_MIN_SPATIAL", 0)
    monkeypatch.setattr(
        down_kernel, "fused_down_train",
        functools.partial(down_kernel.fused_down_train, use_pallas=True))
    stock = ConvBnAct(48, 3, 2, dtype=jnp.bfloat16)
    fused = ConvBnAct(48, 3, 2, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 32, 32)), jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(1), x, False)
    assert fused._down_train_eligible(x, True)

    a, upd_a = stock.apply(v, x, True, mutable=["batch_stats"])
    b, upd_b = fused.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=0.05,
                               rtol=0.05)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd_a["batch_stats"]["BatchNorm_0"][k]),
            np.asarray(upd_b["batch_stats"]["BatchNorm_0"][k]),
            atol=1e-2, rtol=1e-2)

    def loss(params, mod):
        y, _ = mod.apply({"params": params,
                          "batch_stats": v["batch_stats"]},
                         x, True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    ga = jax.grad(lambda p: loss(p, stock))(v["params"])
    gb = jax.grad(lambda p: loss(p, fused))(v["params"])
    ka = np.asarray(ga["Conv_0"]["kernel"])
    kb = np.asarray(gb["Conv_0"]["kernel"])
    np.testing.assert_allclose(kb, ka, atol=0.05 * np.abs(ka).max(),
                               rtol=0.05)
