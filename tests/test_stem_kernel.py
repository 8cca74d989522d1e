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
