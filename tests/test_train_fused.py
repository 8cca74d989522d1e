"""Stat-carrying fused train passes (ops/pallas/train_fused.py) vs a pure
JAX reference implementing identical math — forward AND backward, on the
interpret path (CPU).

The reference mirrors the kernels' dtype discipline (bf16 tensors, f32
normalize/accumulate) so deviations are orderings-only; the chain test
differentiates through finalize_gb to exercise the (ds1, ds2) stat
cotangents — the exact-BatchNorm backward composition the design relies
on (train_fused.py module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov5_obb_tpu.ops.pallas.train_fused import (
    finalize_gb,
    pass_1x1,
    pass_3x3s1,
    pass_3x3s2,
)


def _silu(a):
    return a * jax.nn.sigmoid(a)


def _ns_ref(z, gb):
    return _silu(z.astype(jnp.float32) * gb[0] + gb[1])


def _conv_ref(y, w4, stride):
    return jax.lax.conv_general_dilated(
        y.astype(jnp.bfloat16), w4.astype(jnp.bfloat16), (stride, stride),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _stats_ref(zo_f32):
    return jnp.stack([jnp.sum(zo_f32, axis=(0, 1, 2)),
                      jnp.sum(zo_f32 * zo_f32, axis=(0, 1, 2))])


def _mk(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(0, scale, shape), jnp.float32)


@pytest.fixture
def rngs():
    return np.random.default_rng(0)


def test_pass_1x1_forward(rngs):
    B, H, W, ci, co = 2, 32, 32, 16, 24
    z = _mk(rngs, (B, H, W, ci)).astype(jnp.bfloat16)
    gb = jnp.stack([_mk(rngs, (ci,), 0.3) + 1.0, _mk(rngs, (ci,), 0.2)])
    w = _mk(rngs, (ci, co), 0.2)

    (zo,), (st,) = pass_1x1((True,), ((0,),), (((0, 0),),),
                            (z,), (gb,), (w,))
    y = _ns_ref(z, gb).astype(jnp.bfloat16)
    ref = jnp.einsum("bhwc,cd->bhwd", y.astype(jnp.float32),
                     jnp.asarray(w, jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(zo, np.float32),
                               np.asarray(ref.astype(jnp.bfloat16),
                                          np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(st), np.asarray(_stats_ref(ref)),
                               rtol=2e-2, atol=0.5)


def test_pass_1x1_groups_residual(rngs):
    """Two ns-inputs summed (bottleneck residual) + a plain input group,
    two outputs sharing group A (cv1/cv2 pattern) — the structures the
    C3 chain uses."""
    B, H, W, ci = 2, 32, 32, 16
    z1 = _mk(rngs, (B, H, W, ci)).astype(jnp.bfloat16)
    z2 = _mk(rngs, (B, H, W, ci)).astype(jnp.bfloat16)
    z3 = _mk(rngs, (B, H, W, ci)).astype(jnp.bfloat16)  # plain
    gb1 = jnp.stack([_mk(rngs, (ci,), 0.3) + 1.0, _mk(rngs, (ci,), 0.2)])
    gb2 = jnp.stack([_mk(rngs, (ci,), 0.3) + 1.0, _mk(rngs, (ci,), 0.2)])
    gb0 = jnp.zeros((2, ci), jnp.float32)
    wa, wb, wc = (_mk(rngs, (ci, ci), 0.2) for _ in range(3))

    # group0 = ns(z1)+ns(z2); group1 = z3 (plain)
    # out0 = g0@wa + g1@wb ; out1 = g0@wc
    (o0, o1), (st0, st1) = pass_1x1(
        (True, True, False), ((0, 1), (2,)), (((0, 0), (1, 1)), ((0, 2),)),
        (z1, z2, z3), (gb1, gb2, gb0), (wa, wb, wc))

    g0 = (_ns_ref(z1, gb1) + _ns_ref(z2, gb2)).astype(jnp.bfloat16)
    g1 = z3
    f = lambda t, w: jnp.einsum(
        "bhwc,cd->bhwd", t.astype(jnp.float32),
        jnp.asarray(w, jnp.bfloat16).astype(jnp.float32))
    r0 = f(g0, wa) + f(g1, wb)
    r1 = f(g0, wc)
    np.testing.assert_allclose(np.asarray(o0, np.float32),
                               np.asarray(r0.astype(jnp.bfloat16),
                                          np.float32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(r1.astype(jnp.bfloat16),
                                          np.float32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(st1), np.asarray(_stats_ref(r1)),
                               rtol=2e-2, atol=0.5)


def test_pass_3x3s1_forward(rngs):
    B, H, W, ci, co = 2, 32, 32, 16, 16
    z = _mk(rngs, (B, H, W, ci)).astype(jnp.bfloat16)
    gb = jnp.stack([_mk(rngs, (ci,), 0.3) + 1.0, _mk(rngs, (ci,), 0.2)])
    w4 = _mk(rngs, (3, 3, ci, co), 0.2)
    w_taps = w4.reshape(9 * ci, co)

    zo, st = pass_3x3s1(z, gb, w_taps)
    y = _ns_ref(z, gb).astype(jnp.bfloat16)
    ref = _conv_ref(y, w4, 1)
    np.testing.assert_allclose(np.asarray(zo, np.float32),
                               np.asarray(ref.astype(jnp.bfloat16),
                                          np.float32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(st), np.asarray(_stats_ref(ref)),
                               rtol=2e-2, atol=0.5)


def test_pass_3x3s2_forward(rngs):
    B, H, W, ci, co = 2, 32, 32, 16, 24
    z = _mk(rngs, (B, H, W, ci)).astype(jnp.bfloat16)
    gb = jnp.stack([_mk(rngs, (ci,), 0.3) + 1.0, _mk(rngs, (ci,), 0.2)])
    w4 = _mk(rngs, (3, 3, ci, co), 0.2)
    w_taps = w4.reshape(9 * ci, co)

    zo, st = pass_3x3s2(z, gb, w_taps)
    y = _ns_ref(z, gb).astype(jnp.bfloat16)
    ref = _conv_ref(y, w4, 2)
    np.testing.assert_allclose(np.asarray(zo, np.float32),
                               np.asarray(ref.astype(jnp.bfloat16),
                                          np.float32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(st), np.asarray(_stats_ref(ref)),
                               rtol=2e-2, atol=0.5)


def test_chain_gradients_match_reference(rngs):
    """s2 → 1x1 → 3x3 chain differentiating through finalize_gb: grads of
    the input, every weight, and every (γ, β) must match the pure-JAX
    reference — this is the exact-BatchNorm-backward composition."""
    B, H, W, c0, c1, c2 = 2, 32, 32, 8, 16, 16
    z0 = _mk(rngs, (B, H, W, c0), 1.0)
    gamma0, beta0 = jnp.ones((c0,)), jnp.zeros((c0,))
    w_d = _mk(rngs, (3, 3, c0, c1), 0.3)
    gamma1, beta1 = jnp.ones((c1,)) * 1.1, jnp.zeros((c1,)) + 0.05
    w_a = _mk(rngs, (c1, c2), 0.3)
    gamma2, beta2 = jnp.ones((c2,)) * 0.9, jnp.zeros((c2,)) - 0.05
    w_t = _mk(rngs, (3, 3, c2, c2), 0.3)

    n0 = B * H * W
    n1 = B * (H // 2) * (W // 2)

    def fused(params):
        z0_, wd, wa, wt, g0, b0, g1, b1, g2, b2 = params
        s1 = jnp.sum(z0_.astype(jnp.float32), axis=(0, 1, 2))
        s2 = jnp.sum(z0_.astype(jnp.float32) ** 2, axis=(0, 1, 2))
        gg, bb, _, _ = finalize_gb(s1, s2, g0, b0, n0)
        zd, std = pass_3x3s2(z0_.astype(jnp.bfloat16), jnp.stack([gg, bb]),
                             wd.reshape(9 * c0, c1))
        gg1, bb1, _, _ = finalize_gb(std[0], std[1], g1, b1, n1)
        (za,), (sta,) = pass_1x1((True,), ((0,),), (((0, 0),),),
                                 (zd,), (jnp.stack([gg1, bb1]),), (wa,))
        gg2, bb2, _, _ = finalize_gb(sta[0], sta[1], g2, b2, n1)
        zt, _ = pass_3x3s1(za, jnp.stack([gg2, bb2]),
                           wt.reshape(9 * c2, c2))
        return jnp.sum(zt.astype(jnp.float32) ** 2)

    def ref(params):
        # f32 convs (the bf16-operand conv's autodiff rejects the f32
        # cotangent); the bf16-vs-f32 operand difference sits inside the
        # grad tolerances
        z0_, wd, wa, wt, g0, b0, g1, b1, g2, b2 = params

        def conv_f32(y, w4, s):
            return jax.lax.conv_general_dilated(
                y.astype(jnp.float32), w4.astype(jnp.float32), (s, s),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def bnsilu(z, gamma, beta, n):
            zf = z.astype(jnp.float32)
            s1 = jnp.sum(zf, axis=(0, 1, 2))
            s2 = jnp.sum(zf * zf, axis=(0, 1, 2))
            gg, bb, _, _ = finalize_gb(s1, s2, gamma, beta, n)
            return _silu(zf * gg + bb)

        y0 = bnsilu(z0_, g0, b0, n0)
        zd = conv_f32(y0, wd, 2)
        y1 = bnsilu(zd, g1, b1, n1)
        za = jnp.einsum("bhwc,cd->bhwd", y1, wa.astype(jnp.float32))
        y2 = bnsilu(za, g2, b2, n1)
        zt = conv_f32(y2, wt, 1)
        return jnp.sum(zt ** 2)

    params = (z0, w_d, w_a, w_t, gamma0, beta0, gamma1, beta1,
              gamma2, beta2)
    lf, gf = jax.value_and_grad(fused)(params)
    lr, gr = jax.value_and_grad(ref)(params)

    assert abs(lf - lr) / abs(lr) < 2e-2, (lf, lr)
    names = ["z0", "w_down", "w_1x1", "w_3x3", "g0", "b0", "g1", "b1",
             "g2", "b2"]
    for name, a, b in zip(names, gf, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max() / scale
        assert err < 5e-2, (name, err, scale)
