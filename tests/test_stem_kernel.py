"""Fused Pallas stem (ingest + Conv6/2 + BN + SiLU) vs the stock module."""

import numpy as np


def test_fused_stem_matches_convbnact(rng):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import ConvBnAct
    from yolov5_obb_tpu.ops.pallas.stem_kernel import (fold_stem_params,
                                                       fused_stem)

    B, H, W, C2 = 2, 64, 64, 48
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)

    mod = ConvBnAct(C2, 6, 2, 2, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    # non-trivial BN statistics
    stats = {
        "mean": jnp.asarray(rng.normal(0, 0.5, (C2,)), jnp.float32),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, (C2,)), jnp.float32),
    }
    variables = {
        "params": variables["params"],
        "batch_stats": {"BatchNorm_0": stats},
    }

    ref = mod.apply(variables, jnp.asarray(img, jnp.float32) / 255.0,
                    train=False)

    w108, bias = fold_stem_params(
        variables["params"]["Conv_0"]["kernel"],
        variables["params"]["BatchNorm_0"]["scale"],
        variables["params"]["BatchNorm_0"]["bias"],
        stats["mean"], stats["var"],
    )
    # use_pallas=True: exercise the kernel under the Pallas interpreter
    got = fused_stem(jnp.asarray(img.reshape(B, H, -1)), w108, bias, H, W,
                     use_pallas=True)
    # and the XLA fallback must agree too
    got_xla = fused_stem(jnp.asarray(img.reshape(B, H, -1)), w108, bias, H, W,
                         use_pallas=False)
    np.testing.assert_allclose(np.asarray(got_xla, np.float32),
                               np.asarray(got, np.float32), atol=2e-2, rtol=2e-2)

    assert got.shape == (B, H // 2, W // 2, C2)
    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    # bf16 compute path: tolerance ~bf16 epsilon on O(1) activations
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
    # and the bulk must be much tighter than the worst case
    assert np.median(np.abs(got - ref)) < 5e-3


def test_fused_stem_xla_fallback_for_odd_heights(rng):
    """Heights whose H/2 is not a multiple of the kernel row-block must fall
    back to the XLA path and still match the stock module."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import ConvBnAct
    from yolov5_obb_tpu.ops.pallas.stem_kernel import (fold_stem_params,
                                                       fused_stem)

    B, H, W, C2 = 1, 96, 96, 16  # H/2 = 48, not a multiple of 32
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
    mod = ConvBnAct(C2, 6, 2, 2, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))
    stats = {"mean": jnp.zeros((C2,)), "var": jnp.ones((C2,))}
    variables = {"params": variables["params"],
                 "batch_stats": {"BatchNorm_0": stats}}
    ref = mod.apply(variables, jnp.asarray(img, jnp.float32) / 255.0,
                    train=False)
    w108, bias = fold_stem_params(
        variables["params"]["Conv_0"]["kernel"],
        variables["params"]["BatchNorm_0"]["scale"],
        variables["params"]["BatchNorm_0"]["bias"],
        stats["mean"], stats["var"],
    )
    got = fused_stem(jnp.asarray(img.reshape(B, H, -1)), w108, bias, H, W)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2,
                               rtol=5e-2)


def test_fused_stem_l1_matches_stock_chain(rng):
    """Fused stem + layer-1 kernel == stock ConvBnAct(6,2,2) → ConvBnAct(3,2)
    chain, kernel (interpret) AND XLA fallback."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import ConvBnAct
    from yolov5_obb_tpu.ops.pallas.stem_kernel import (fold_stem_l1_params,
                                                       fused_stem_l1)

    B, H, W, C2, C3 = 2, 64, 64, 48, 96
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)

    m0 = ConvBnAct(C2, 6, 2, 2, dtype=jnp.float32)
    m1 = ConvBnAct(C3, 3, 2, dtype=jnp.float32)
    v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    v1 = m1.init(jax.random.PRNGKey(1), jnp.zeros((1, H // 2, W // 2, C2)))

    def stats(c, seed):
        r = np.random.default_rng(seed)
        return {"mean": jnp.asarray(r.normal(0, 0.3, (c,)), jnp.float32),
                "var": jnp.asarray(r.uniform(0.5, 2.0, (c,)), jnp.float32)}

    st0, st1 = stats(C2, 5), stats(C3, 6)
    v0 = {"params": v0["params"], "batch_stats": {"BatchNorm_0": st0}}
    v1 = {"params": v1["params"], "batch_stats": {"BatchNorm_0": st1}}

    s = m0.apply(v0, jnp.asarray(img, jnp.float32) / 255.0, train=False)
    ref = np.asarray(m1.apply(v1, s, train=False), np.float32)

    bn0 = (v0["params"]["BatchNorm_0"]["scale"],
           v0["params"]["BatchNorm_0"]["bias"], st0["mean"], st0["var"])
    bn1 = (v1["params"]["BatchNorm_0"]["scale"],
           v1["params"]["BatchNorm_0"]["bias"], st1["mean"], st1["var"])
    ops = fold_stem_l1_params(v0["params"]["Conv_0"]["kernel"], bn0,
                              v1["params"]["Conv_0"]["kernel"], bn1)
    xp = jnp.asarray(img.reshape(B, H, -1))
    got = np.asarray(fused_stem_l1(xp, *ops, H, W, use_pallas=True),
                     np.float32)
    got_xla = np.asarray(fused_stem_l1(xp, *ops, H, W, use_pallas=False),
                         np.float32)

    assert got.shape == (B, H // 4, W // 4, C3)
    np.testing.assert_allclose(got_xla, got, atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(got, ref, atol=6e-2, rtol=6e-2)
    assert np.median(np.abs(got - ref)) < 8e-3
    # boundaries specifically (top row / left col read the zero pad)
    np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=6e-2, rtol=6e-2)
    np.testing.assert_allclose(got[:, :, 0], ref[:, :, 0], atol=6e-2,
                               rtol=6e-2)
    np.testing.assert_allclose(got[:, -1], ref[:, -1], atol=6e-2, rtol=6e-2)
    np.testing.assert_allclose(got[:, :, -1], ref[:, :, -1], atol=6e-2,
                               rtol=6e-2)


# ---------------------------------------------------------------------------
# train mode: raw-conv kernel + custom-VJP Pallas wgrad
# ---------------------------------------------------------------------------


def test_stem_conv_train_fwd_matches_xla(rng):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.stem_kernel import (remap_w6,
                                                       stem_conv_train)

    B, H, W, C2 = 2, 64, 64, 48
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
    w6 = jnp.asarray(rng.normal(0, 0.05, (6, 6, 3, C2)), jnp.float32)
    w108 = remap_w6(w6) / 255.0
    xp = jnp.asarray(img.reshape(B, H, -1))

    got = stem_conv_train(xp, w108, H, W, use_pallas=True)
    ref = stem_conv_train(xp, w108, H, W, use_pallas=False)
    assert got.shape == (B, H // 2, W // 2, C2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_stem_conv_train_wgrad_matches_autodiff(rng):
    """The custom-VJP Pallas wgrad must agree with XLA autodiff through the
    fallback conv (same remapped-tap parameterization)."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.stem_kernel import (remap_w6,
                                                       stem_conv_train)

    B, H, W, C2 = 2, 64, 64, 16
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
    w6 = jnp.asarray(rng.normal(0, 0.05, (6, 6, 3, C2)), jnp.float32)
    w108 = remap_w6(w6) / 255.0
    xp = jnp.asarray(img.reshape(B, H, -1))
    # a non-uniform cotangent so every tap row is exercised
    cot = jnp.asarray(
        rng.normal(0, 1.0, (B, H // 2, W // 2, C2)), jnp.float32)

    def loss(w108, use_pallas):
        z = stem_conv_train(xp, w108, H, W, use_pallas=use_pallas)
        return jnp.sum(z.astype(jnp.float32) * cot)

    g_pallas = jax.grad(lambda w: loss(w, True))(w108)
    g_xla = jax.grad(lambda w: loss(w, False))(w108)
    # bf16 dot accumulation: relative tolerance on O(100) grads
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=2e-2 * float(jnp.abs(g_xla).max()),
                               rtol=2e-2)


def test_packed_stem_train_matches_convbnact(rng):
    """PackedStem(train=True) == ConvBnAct(6,2,2)(train=True): output,
    batch-stats update, and kernel gradient."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import ConvBnAct, PackedStem

    B, H, W, C2 = 2, 64, 64, 48
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)

    ref_mod = ConvBnAct(C2, 6, 2, 2, dtype=jnp.bfloat16)
    variables = ref_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))

    xf = jnp.asarray(img, jnp.float32) / 255.0
    ref, ref_upd = ref_mod.apply(variables, xf, train=True,
                                 mutable=["batch_stats"])

    pk_mod = PackedStem(C2, dtype=jnp.bfloat16)
    xp = jnp.asarray(img.reshape(B, H, -1))
    got, got_upd = pk_mod.apply(variables, xp, train=True,
                                mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(got_upd["batch_stats"]["BatchNorm_0"][k]),
            np.asarray(ref_upd["batch_stats"]["BatchNorm_0"][k]),
            atol=1e-2, rtol=1e-2)

    def loss(params, mod, x):
        y, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda p: loss(p, ref_mod, xf))(variables["params"])
    g_got = jax.grad(lambda p: loss(p, pk_mod, xp))(variables["params"])
    gr = np.asarray(g_ref["Conv_0"]["kernel"])
    gg = np.asarray(g_got["Conv_0"]["kernel"])
    np.testing.assert_allclose(gg, gr, atol=5e-2 * np.abs(gr).max(),
                               rtol=5e-2)
