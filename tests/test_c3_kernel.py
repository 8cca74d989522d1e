"""Fused C3 Pallas kernel vs the stock Flax C3 block (interpret mode)."""

import numpy as np
import pytest


def _trained_c3(C, n=2, seed=0, c2=None, shortcut=True):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    c3 = C3(C, c2 or C, n, shortcut, dtype=jnp.bfloat16)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 32, 40, C)), jnp.bfloat16)
    v = c3.init(jax.random.PRNGKey(seed), x, False)
    _, upd = c3.apply(v, x.astype(jnp.float32) * 1.5 + 0.2, train=True,
                      mutable=["batch_stats"])
    return c3, {"params": v["params"], "batch_stats": upd["batch_stats"]}, x


def _check_parity(C, n, c2=None, shortcut=True, seed=0):
    from yolov5_obb_tpu.ops.pallas.c3_kernel import fold_c3_params, fused_c3

    c3, v, x = _trained_c3(C, n=n, seed=seed, c2=c2, shortcut=shortcut)
    want = np.asarray(c3.apply(v, x, False), np.float32)
    p = fold_c3_params(v["params"], v["batch_stats"], n=n)
    got = np.asarray(
        fused_c3(x, p["w1"], p["s1"], p["bots"],
                 p["w2"], p["s2"], p["w3a"], p["w3b"], p["s3"],
                 n=n, shortcut=shortcut),
        np.float32)
    assert got.shape == want.shape
    err = np.abs(got - want)
    assert err.max() <= 0.06, err.max()  # bf16 rounding only
    # boundaries specifically (first/last rows+cols)
    assert err[:, :2].max() <= 0.06 and err[:, -2:].max() <= 0.06
    assert err[:, :, :2].max() <= 0.06 and err[:, :, -2:].max() <= 0.06


def test_fused_c3_matches_stock():
    """Kernel output == stock block to bf16 rounding, incl. the image
    boundary (SAME-padding parity via the in-image mask)."""
    _check_parity(96, n=2)


def test_fused_c3_matches_stock_n4():
    """Layer-4 shape family: C3(c, c, n=4) — deeper halo chain."""
    _check_parity(64, n=4, seed=2)


def test_fused_c3_matches_stock_noshortcut_c1c2():
    """P3-head shape family: C3(2c, c, n=2, shortcut=False)."""
    _check_parity(64, n=2, c2=32, shortcut=False, seed=3)


def test_fused_c3_module_path_equivalence(monkeypatch):
    """C3(fused=True) == C3(fused=False) with the SAME variables — the
    param-twin tree is identical so checkpoints load into either path."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from yolov5_obb_tpu.models import layers
    from yolov5_obb_tpu.models.layers import C3

    # lower the perf gate so the kernel path runs at a test-size shape
    monkeypatch.setattr(layers, "_FUSED_C3_MIN_SPATIAL", 0)
    stock = C3(96, 96, 2, dtype=jnp.bfloat16)
    fused = C3(96, 96, 2, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 96)), jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(1), x, False)
    vf = fused.init(jax.random.PRNGKey(1), x, False)
    paths = lambda t: [jtu.keystr(k) for k, _ in
                       jtu.tree_flatten_with_path(t)[0]]
    assert paths(v) == paths(vf)
    assert fused._eligible(x, False)
    a = np.asarray(stock.apply(v, x, False), np.float32)
    b = np.asarray(fused.apply(v, x, False), np.float32)
    np.testing.assert_allclose(a, b, atol=0.05)
    assert not np.array_equal(a, np.zeros_like(a))


def test_fused_c3_ineligible_falls_back():
    """n > 4 or small spatial extents use the stock path (no crash, same
    variables)."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    m = C3(32, 32, 1, dtype=jnp.bfloat16, fused=True)  # small → stock
    x = jnp.zeros((1, 16, 16, 32), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out.shape == (1, 16, 16, 32)


def test_fused_c3_gate_excludes_slow_families():
    """The kernel supports n<=4 / no-shortcut / c1!=c2 (parity-tested
    above); the eligibility gate must follow the hardware A/B
    (tools/bench_c3_blocks.py, dx-packed taps): shortcut c1==c2 families
    win at >=256² (1.46x) and at 128² when n>=4 (1.10x); the no-shortcut
    head (1.00x) and shallow 128² blocks stay on the stock path."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    x256 = jnp.zeros((1, 256, 256, 96), jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 192), jnp.bfloat16)
    assert C3(96, 96, 2, dtype=jnp.bfloat16, fused=True)._eligible(
        x256, False)
    # deeper shortcut blocks at 256² ride the same winning regime
    assert C3(96, 96, 4, dtype=jnp.bfloat16, fused=True)._eligible(
        x256, False)
    # 128² blocks: 1.10x isolated but e2e-negative (boundary layout
    # copies), perf-gated out
    assert not C3(192, 192, 4, dtype=jnp.bfloat16, fused=True)._eligible(
        x128, False)
    assert not C3(192, 192, 2, dtype=jnp.bfloat16, fused=True)._eligible(
        x128, False)
    # no-shortcut head family: no measured win, perf-gated out
    assert not C3(192, 96, 2, False, dtype=jnp.bfloat16,
                  fused=True)._eligible(x256, False)
    # train mode never fuses
    assert not C3(96, 96, 2, dtype=jnp.bfloat16, fused=True)._eligible(
        x256, True)
