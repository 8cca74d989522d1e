"""Torch→Flax weight import: key mapping completeness + numerical parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yolov5_obb_tpu.models.yolo import build_model, parse_model_config  # noqa: E402
from yolov5_obb_tpu.utils.torch_import import import_state_dict, layer_entries  # noqa: E402


def _torch_conv_bn_silu(c1, c2, k, s, p):
    """Reference-style Conv block built from raw torch prims (test-local)."""
    conv = torch.nn.Conv2d(c1, c2, k, s, p, bias=False)
    # the reference sets eps=1e-3 on every BN via initialize_weights
    # (reference utils/torch_utils.py:161) — match it, as our layers do
    bn = torch.nn.BatchNorm2d(c2, eps=1e-3)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.running_mean.uniform_(-0.2, 0.2)
    bn.running_var.uniform_(0.5, 1.5)
    return conv, bn


def test_conv_block_numerical_parity():
    """Imported Conv weights reproduce torch conv+BN+SiLU bit-for-bit(ish)."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import ConvBnAct

    torch.manual_seed(0)
    conv, bn = _torch_conv_bn_silu(3, 8, 6, 2, 2)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = torch.nn.functional.silu(bn.eval()(conv(x))).permute(0, 2, 3, 1).numpy()

    sd = {
        "model.0.conv.weight": conv.weight.detach().numpy(),
        "model.0.bn.weight": bn.weight.detach().numpy(),
        "model.0.bn.bias": bn.bias.detach().numpy(),
        "model.0.bn.running_mean": bn.running_mean.numpy(),
        "model.0.bn.running_var": bn.running_var.numpy(),
    }

    class Spec:
        index, name, args, frm = 0, "Conv", (3, 8, 6, 2, 2), -1

    variables = import_state_dict(sd, [Spec()])
    m = ConvBnAct(8, 6, 2, 2)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    got = m.apply(
        {"params": variables["params"]["m0"],
         "batch_stats": variables["batch_stats"]["m0"]},
        xj, train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_full_model_import_covers_tree():
    """A synthetic reference-shaped state_dict fills our yolov5n tree exactly."""
    import jax

    model, meta, d = build_model("yolov5n.yaml", nc=15)
    specs, *_ = parse_model_config(d)

    # build the torch-side dict by inverting the mapping (shapes from flax)
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    flat = {
        "/".join(str(p.key) for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    stats_flat = {
        "/".join(str(p.key) for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(
            variables["batch_stats"])[0]
    }

    rng = np.random.default_rng(0)
    sd = {}
    for spec in specs:
        for tk, fp, kind in layer_entries(spec):
            base = f"model.{spec.index}.{tk}"
            fkey = f"m{spec.index}/" + "/".join(fp)
            if kind == "bn":
                c = flat[fkey + "/scale"].shape[0]
                for suffix in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{base}.{suffix}"] = rng.normal(size=c).astype(np.float32)
            elif kind == "cw":
                h, w, ci, co = flat[fkey].shape
                sd[base] = rng.normal(size=(co, ci, h, w)).astype(np.float32)
            else:
                sd[base] = rng.normal(size=flat[fkey].shape).astype(np.float32)

    imported = import_state_dict(sd, specs)
    flat_imp = {
        "/".join(str(p.key) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(imported["params"])[0]
    }
    assert flat_imp == set(flat)  # same tree, no missing/extra leaves
    stats_imp = {
        "/".join(str(p.key) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(
            imported["batch_stats"])[0]
    }
    assert stats_imp == set(stats_flat)
    # transpose applied: spot-check the stem conv
    np.testing.assert_allclose(
        imported["params"]["m0"]["Conv_0"]["kernel"],
        sd["model.0.conv.weight"].transpose(2, 3, 1, 0),
    )
    # missing keys raise with a helpful error
    bad = dict(sd)
    bad.pop("model.0.conv.weight")
    with pytest.raises(KeyError):
        import_state_dict(bad, specs)
