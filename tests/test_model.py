"""Model builder tests: shapes, strides, parameter counts vs reference table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov5_obb_tpu.models.yolo import build_model, create_model, decode, probe_strides


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.mark.parametrize(
    "size,expect_m",
    [("n", 2.0), ("s", 7.5), ("m", 21.6)],
)
def test_param_counts_match_reference(size, expect_m):
    """Param counts from the reference README table (README.md:13-15, nc=15)."""
    model, variables, meta = create_model(f"yolov5{size}.yaml", nc=15, imgsz=64)
    total = n_params(variables["params"]) / 1e6
    assert abs(total - expect_m) / expect_m < 0.03, f"{size}: {total:.2f}M vs {expect_m}M"


def test_strides_and_shapes():
    model, meta, _ = build_model("yolov5n.yaml", nc=15)
    meta = probe_strides(model, meta)
    assert meta.strides == (8.0, 16.0, 32.0)
    assert meta.nl == 3 and meta.na == 3
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)
    outs = model.apply(variables, jnp.zeros((2, 128, 128, 3)), train=False)
    assert len(outs) == 3
    for o, s in zip(outs, (8, 16, 32)):
        assert o.shape == (2, 128 // s, 128 // s, 3, 15 + 5 + 180)


def test_decode_shapes_and_ranges():
    model, variables, meta = create_model("yolov5n.yaml", nc=15, imgsz=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    outs = model.apply(variables, x, train=False)
    pred = decode(outs, meta)
    total = sum(3 * (64 // s) ** 2 for s in (8, 16, 32))
    assert pred.shape == (1, total, 200)
    pred = np.asarray(pred)
    # xy within image bounds (loosely), obj/cls/theta are sigmoids
    assert pred[..., 4:].min() >= 0 and pred[..., 4:].max() <= 1
    assert pred[..., 0:2].min() > -20 and pred[..., 0:2].max() < 84


def test_bias_priors_applied():
    """Detect obj bias ≈ log(8/(640/s)²) after init (reference yolo.py:224-232)."""
    model, variables, meta = create_model("yolov5n.yaml", nc=15, imgsz=64)
    det = variables["params"][f"m{len(model.specs)-1}"]
    for li, s in enumerate(meta.strides):
        b = np.asarray(det[f"conv{li}"]["bias"]).reshape(3, meta.no)
        np.testing.assert_allclose(b[:, 4], np.log(8 / (640 / s) ** 2), atol=1e-5)


def test_train_mode_updates_batch_stats():
    model, variables, meta = create_model("yolov5n.yaml", nc=2, imgsz=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    outs, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates
    leaves = jax.tree.leaves(updates["batch_stats"])
    assert leaves, "no BN stats tracked"


def test_sum_and_mixconv_modules():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models import layers as L

    x = jnp.ones((2, 8, 8, 16))
    # unweighted Sum is a plain add; weighted starts near x0 + Σ 2σ(wᵢ)xᵢ
    s = L.Sum(2)
    assert jnp.allclose(s.apply({}, [x, 2 * x]), 3 * x)
    sw = L.Sum(3, weight=True)
    vs = sw.init(jax.random.PRNGKey(0), [x, x, x])
    y = sw.apply(vs, [x, x, x])
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))

    m = L.MixConv2d(16, 24, k=(1, 3), s=1)
    vm = m.init(jax.random.PRNGKey(0), x)
    ym = m.apply(vm, x, train=False)
    assert ym.shape == (2, 8, 8, 24)
    # channel partition covers c2 exactly: kernel-1 group + kernel-3 group
    convs = [k for k in vm["params"] if k.startswith("Conv")]
    assert len(convs) == 2
