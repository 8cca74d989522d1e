"""Fused C3 Pallas kernel vs the stock Flax C3 block (interpret mode)."""

import numpy as np
import pytest


def _trained_c3(C, n=2, seed=0):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    c3 = C3(C, C, n, dtype=jnp.bfloat16)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 32, 40, C)), jnp.bfloat16)
    v = c3.init(jax.random.PRNGKey(seed), x, False)
    _, upd = c3.apply(v, x.astype(jnp.float32) * 1.5 + 0.2, train=True,
                      mutable=["batch_stats"])
    return c3, {"params": v["params"], "batch_stats": upd["batch_stats"]}, x


def test_fused_c3_matches_stock():
    """Kernel output == stock block to bf16 rounding, incl. the image
    boundary (SAME-padding parity via the in-image mask)."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.c3_kernel import fold_c3_params, fused_c3

    c3, v, x = _trained_c3(96)
    want = np.asarray(c3.apply(v, x, False), np.float32)
    p = fold_c3_params(v["params"], v["batch_stats"])
    got = np.asarray(
        fused_c3(x, p["w1"], p["s1"], p["wb1a"], p["sb1a"], p["wb1t"],
                 p["sb1t"], p["wb2a"], p["sb2a"], p["wb2t"], p["sb2t"],
                 p["w2"], p["s2"], p["w3a"], p["w3b"], p["s3"]),
        np.float32)
    assert got.shape == want.shape
    err = np.abs(got - want)
    assert err.max() <= 0.05, err.max()  # bf16 rounding only
    # boundaries specifically (first/last rows+cols)
    assert err[:, :2].max() <= 0.05 and err[:, -2:].max() <= 0.05
    assert err[:, :, :2].max() <= 0.05 and err[:, :, -2:].max() <= 0.05


def test_fused_c3_module_path_equivalence():
    """C3(fused=True) == C3(fused=False) with the SAME variables — the
    param-twin tree is identical so checkpoints load into either path."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from yolov5_obb_tpu.models.layers import C3

    stock = C3(96, 96, 2, dtype=jnp.bfloat16)
    fused = C3(96, 96, 2, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 96)), jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(1), x, False)
    vf = fused.init(jax.random.PRNGKey(1), x, False)
    paths = lambda t: [jtu.keystr(k) for k, _ in
                       jtu.tree_flatten_with_path(t)[0]]
    assert paths(v) == paths(vf)
    a = np.asarray(stock.apply(v, x, False), np.float32)
    b = np.asarray(fused.apply(v, x, False), np.float32)
    np.testing.assert_allclose(a, b, atol=0.05)
    assert not np.array_equal(a, np.zeros_like(a))


def test_fused_c3_ineligible_falls_back():
    """n != 2 or small spatial extents use the stock path (no crash, same
    variables)."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    m = C3(32, 32, 1, dtype=jnp.bfloat16, fused=True)  # n=1 → stock
    x = jnp.zeros((1, 16, 16, 32), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out.shape == (1, 16, 16, 32)
