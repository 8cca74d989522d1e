"""Packed-stem model: identical parameter tree + equivalent predictions."""

import numpy as np


def test_packed_tree_and_predictions_match(rng):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.evaluator import make_predict_fn, pack_images
    from yolov5_obb_tpu.models.yolo import create_model

    nc, imgsz = 15, 64
    model, variables, meta = create_model("yolov5n.yaml", nc=nc, imgsz=imgsz)
    pmodel, pvariables, pmeta = create_model(
        "yolov5n.yaml", nc=nc, imgsz=imgsz, packed_stem=True
    )
    assert pmodel.packed_stem

    # identical tree (paths + shapes) → checkpoints interchange freely
    f1 = jax.tree_util.tree_leaves_with_path(variables)
    f2 = jax.tree_util.tree_leaves_with_path(pvariables)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in f1] == [
        (jax.tree_util.keystr(k), v.shape) for k, v in f2
    ]

    # same weights → equivalent detections (f32 XLA fallback path on CPU)
    img = rng.integers(0, 255, (2, imgsz, imgsz, 3)).astype(np.uint8)
    kw = dict(conf_thres=0.01, iou_thres=0.45, max_det=32, multi_label=False,
              max_candidates=128)
    p1 = make_predict_fn(model, meta, **kw)
    p2 = make_predict_fn(pmodel, pmeta, **kw)
    assert p2.packed_stem and not p1.packed_stem
    d1, n1 = p1(variables, jnp.asarray(img))
    d2, n2 = p2(variables, jnp.asarray(pack_images(img)))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3,
                               rtol=1e-3)


def test_packed_stem_falls_back_for_focus_configs():
    from yolov5_obb_tpu.models.yolo import build_model

    # yolov3 has no Conv(6,2) stem — flag must silently downgrade
    model, _, _ = build_model("yolov3.yaml", nc=15, packed_stem=True)
    assert not model.packed_stem
