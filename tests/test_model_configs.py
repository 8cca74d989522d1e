"""Build every bundled model config (reference models/yolo.py --test smoke)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from yolov5_obb_tpu.models.yolo import build_model, probe_strides

CONFIG_DIR = Path(__file__).parent.parent / "yolov5_obb_tpu" / "models" / "configs"
# anchors.yaml is a data asset (anchor-set lists), not a buildable model
ALL_CONFIGS = sorted(
    p.name for p in CONFIG_DIR.glob("*.yaml") if p.name != "anchors.yaml")


@pytest.mark.parametrize("cfg", ALL_CONFIGS)
def test_config_builds_and_probes(cfg):
    model, meta, d = build_model(cfg, nc=15)
    meta = probe_strides(model, meta, imgsz=128 if "p2" in cfg else 256)
    assert meta.nl == meta.anchors_px.shape[0]
    assert len(meta.strides) == meta.nl
    assert all(s > 0 for s in meta.strides)
    # stride ladder is strictly increasing
    assert list(meta.strides) == sorted(meta.strides)
    # abstract forward shape check at a second size
    import jax.numpy as jnp

    sz = 128
    vars_shape = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, sz, sz, 3))
    )
    outs = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False),
        vars_shape,
        jnp.zeros((2, sz, sz, 3)),
    )
    for o, s in zip(outs, meta.strides):
        assert o.shape == (2, sz // int(s), sz // int(s), meta.na, meta.no)


def test_anchors_yaml_asset(tmp_path):
    """anchors.yaml sets are well-formed and usable as a model's anchors
    (reference models/hub/anchors.yaml)."""
    import yaml

    sets = yaml.safe_load((CONFIG_DIR / "anchors.yaml").read_text())
    assert set(sets) == {
        "anchors_p5_640", "anchors_p6_640", "anchors_p6_1280",
        "anchors_p6_1920", "anchors_p7_640", "anchors_p7_1280",
        "anchors_p7_1920",
    }
    for name, rows in sets.items():
        nl = int(name.split("_p")[1][0])- 2  # p5→3, p6→4, p7→5 levels
        assert len(rows) == nl
        assert all(len(r) == 6 and all(v > 0 for v in r) for r in rows)

    # a set drops into a model yaml's anchors key and builds
    d = yaml.safe_load((CONFIG_DIR / "yolov5n.yaml").read_text())
    d["anchors"] = sets["anchors_p5_640"]
    f = tmp_path / "with_asset_anchors.yaml"
    f.write_text(yaml.safe_dump(d))
    _, meta, _ = build_model(str(f), nc=15)
    assert meta.nl == 3 and meta.na == 3
    assert np.allclose(meta.anchors_px[0, 0], [10, 13])


def test_integer_anchor_spec(tmp_path):
    """`anchors: N` synthesizes stride-scaled placeholder priors
    (reference models/hub/yolov5-p7.yaml uses this form)."""
    import yaml

    d = yaml.safe_load((CONFIG_DIR / "yolov5n.yaml").read_text())
    d["anchors"] = 3
    f = tmp_path / "int_anchor.yaml"
    f.write_text(yaml.safe_dump(d))
    model, meta, _ = build_model(str(f), nc=15)
    meta = probe_strides(model, meta, imgsz=256)
    assert meta.na == 3 and meta.nl == 3
    assert np.all(meta.anchors_px > 0)
    # ladder grows with level stride
    assert np.all(meta.anchors_px[1] > meta.anchors_px[0])
