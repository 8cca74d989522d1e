"""Model-level ensemble inference (reference experimental.py:75-120)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    from yolov5_obb_tpu.models.yolo import create_model

    return create_model("yolov5n.yaml", nc=3, imgsz=64)


def _train_bn(model, variables, x):
    import jax.numpy as jnp

    _, upd = model.apply(variables, jnp.asarray(x) * 2.0 + 0.5, train=True,
                         mutable=["batch_stats"])
    return {"params": variables["params"], "batch_stats": upd["batch_stats"]}


def test_two_identical_members_equal_one(tiny_model):
    """Ensemble of [m, m] must produce the same detections as [m]: the
    concatenated duplicates are exact-IoU pairs that rotated NMS collapses."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import make_ensemble_predict_fn

    model, variables, meta = tiny_model
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    variables = _train_bn(model, variables, x.astype(np.float32) / 255.0)

    one = make_ensemble_predict_fn(
        [(model, variables, meta)], 0.001, 0.45, 50, multi_label=False)
    two = make_ensemble_predict_fn(
        [(model, variables, meta)] * 2, 0.001, 0.45, 50, multi_label=False)

    d1, n1 = (np.asarray(v) for v in one(None, jnp.asarray(x)))
    d2, n2 = (np.asarray(v) for v in two(None, jnp.asarray(x)))
    assert n1.sum() > 0, "no detections — test not exercising the path"
    assert np.array_equal(n1, n2)
    for b in range(2):
        k1 = d1[b, : n1[b]]
        k2 = d2[b, : n2[b]]
        # same boxes kept (order by score then cx for tie stability)
        o1 = np.lexsort((k1[:, 0], -k1[:, 5]))
        o2 = np.lexsort((k2[:, 0], -k2[:, 5]))
        np.testing.assert_allclose(k1[o1], k2[o2], atol=1e-5)


def test_ensemble_nc_mismatch_raises(tiny_model):
    from yolov5_obb_tpu.engine.evaluator import make_ensemble_predict_fn
    from yolov5_obb_tpu.models.yolo import create_model

    model, variables, meta = tiny_model
    other = create_model("yolov5n.yaml", nc=5, imgsz=64)
    with pytest.raises(ValueError, match="share nc"):
        make_ensemble_predict_fn(
            [(model, variables, meta), other], 0.1, 0.45, 10)


def test_load_ensemble_members_roundtrip(tmp_path, tiny_model):
    """--weights a,b loading: two saved checkpoints come back as two
    members with names/meta restored."""
    from yolov5_obb_tpu.engine.evaluator import load_ensemble_members
    from yolov5_obb_tpu.utils.checkpoint import save_weights

    model, variables, meta = tiny_model
    for k in range(2):
        save_weights(tmp_path / f"m{k}", variables["params"],
                     variables["batch_stats"],
                     {"names": ["a", "b", "c"],
                      "anchors": np.asarray(meta.anchors_px).tolist()})
    members, names = load_ensemble_members(
        [str(tmp_path / "m0"), str(tmp_path / "m1")], "yolov5n.yaml",
        nc=3, imgsz=64)
    assert len(members) == 2
    assert names == ["a", "b", "c"]
    np.testing.assert_allclose(members[0][2].anchors_px, meta.anchors_px)
