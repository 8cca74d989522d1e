"""Fused maps→NMS path must match decode() + non_max_suppression_obb."""

import numpy as np

from yolov5_obb_tpu.models.yolo import ModelMeta, decode
from yolov5_obb_tpu.ops.rotated_nms import (
    non_max_suppression_from_maps,
    non_max_suppression_obb,
)


def test_fused_matches_decode_path(rng):
    import jax.numpy as jnp

    nc = 4
    meta = ModelMeta(
        nc=nc, nl=2, na=3, strides=(8.0, 16.0),
        anchors_px=np.array(
            [[[10, 13], [16, 30], [33, 23]], [[30, 61], [62, 45], [59, 119]]],
            np.float32,
        ),
    )
    B, sz = 2, 64
    maps = [
        jnp.asarray(
            rng.normal(0, 2.0, (B, sz // s, sz // s, 3, nc + 5 + 180)), jnp.float32
        )
        for s in (8, 16)
    ]
    kw = dict(conf_thres=0.2, iou_thres=0.45, max_candidates=64, max_det=32,
              multi_label=False, approx_topk=False)
    d1, n1 = non_max_suppression_obb(decode(maps, meta), num_classes=nc, **kw)
    d2, n2 = non_max_suppression_from_maps(maps, meta, **kw)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)

    # the flat 3-D form (Detect flat=True layout) must agree exactly
    flat_maps = [m.reshape(m.shape[0], -1, m.shape[-1]) for m in maps]
    d3, n3 = non_max_suppression_from_maps(flat_maps, meta, **kw)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n3))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d3), atol=1e-6)


def test_fused_multilabel_matches_decode_path(rng):
    import jax.numpy as jnp

    nc = 4
    meta = ModelMeta(
        nc=nc, nl=2, na=3, strides=(8.0, 16.0),
        anchors_px=np.array(
            [[[10, 13], [16, 30], [33, 23]], [[30, 61], [62, 45], [59, 119]]],
            np.float32,
        ),
    )
    B, sz = 2, 64
    maps = [
        jnp.asarray(
            rng.normal(0, 2.0, (B, sz // s, sz // s, 3, nc + 5 + 180)), jnp.float32
        )
        for s in (8, 16)
    ]
    kw = dict(conf_thres=0.2, iou_thres=0.45, max_candidates=64, max_det=32,
              multi_label=True, approx_topk=False)
    d1, n1 = non_max_suppression_obb(decode(maps, meta), num_classes=nc, **kw)
    d2, n2 = non_max_suppression_from_maps(maps, meta, **kw)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


def test_two_stage_multilabel_selection_is_exact(rng):
    """The exact path's two-stage (box-prefilter) candidate selection must
    reproduce the single-stage full (N*nc) top_k bit-for-bit.

    On CPU ``jax.lax.approx_max_k`` lowers to an exact sort, so the legacy
    ``approx_topk=True`` branch is an exact single-stage oracle here."""
    import jax.numpy as jnp

    nc = 7
    meta = ModelMeta(
        nc=nc, nl=2, na=3, strides=(8.0, 16.0),
        anchors_px=np.array(
            [[[10, 13], [16, 30], [33, 23]], [[30, 61], [62, 45], [59, 119]]],
            np.float32,
        ),
    )
    B, sz = 3, 96
    maps = [
        jnp.asarray(
            rng.normal(0, 2.0, (B, sz // s, sz // s, 3, nc + 5 + 180)),
            jnp.float32,
        )
        for s in (8, 16)
    ]
    # max_candidates chosen BELOW the above-threshold pair count so the
    # overflow ranking (keep the highest-confidence pairs) is exercised too
    # (1024 still exceeds the positive-pair count -> non-overflow leg; the
    # earlier 4096 leg = k=3780 built an (n, M, n) suppression lattice that
    # XLA CPU materializes at ~4 GB -> minutes per leg, no extra coverage)
    kw = dict(conf_thres=0.15, iou_thres=0.45, max_det=64, multi_label=True)
    for max_candidates in (32, 256, 1024):
        d1, n1 = non_max_suppression_from_maps(
            maps, meta, max_candidates=max_candidates, approx_topk=True, **kw)
        d2, n2 = non_max_suppression_from_maps(
            maps, meta, max_candidates=max_candidates, approx_topk=False, **kw)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
