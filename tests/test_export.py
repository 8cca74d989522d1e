"""Export tests: StableHLO serialize/deserialize round trip on a tiny model."""

import types
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_stablehlo_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=64, batch_size=1, nc=3,
        include=["stablehlo"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    path = export_cli.export_stablehlo(fwd, opt, tmp_path)
    assert path.exists() and path.stat().st_size > 1000

    rehydrated = jexport.deserialize(path.read_bytes())
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    got = rehydrated.call(jnp.asarray(x))
    want = fwd(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_saved_model_export(tmp_path):
    import types

    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=64, batch_size=1, nc=3,
        include=["saved_model"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    sm = export_cli.export_saved_model(fwd, opt, tmp_path)
    assert (Path(sm) / "saved_model.pb").exists()


@pytest.mark.slow
def test_detect_via_stablehlo_backend(tmp_path, mini_dota_session):
    """export → MultiBackend → detect CLI end-to-end on the artifact."""
    import types

    import detect as detect_cli
    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=128, batch_size=1, nc=15,
        include=["stablehlo"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    path = export_cli.export_stablehlo(fwd, opt, tmp_path)
    assert Path(path).exists()

    dopt = types.SimpleNamespace(
        weights=str(path), cfg="yolov5n.yaml", data=None,
        source=str(mini_dota_session / "images"), imgsz=128, conf_thres=0.01,
        iou_thres=0.45, max_det=50, batch_size=1, save_txt=False,
        save_conf=False, nosave=True, hide_conf=False, augment=False,
        line_thickness=2, project=str(tmp_path / "runs"), name="hlo",
        exist_ok=True,
    )
    # names must come from --data or metadata; pass via data yaml
    data_yaml = tmp_path / "d.yaml"
    data_yaml.write_text(
        f"path: {mini_dota_session}\ntrain: images\nval: images\nnc: 15\n"
        f"names: [{', '.join(f'c{i}' for i in range(15))}]\n")
    dopt.data = str(data_yaml)
    save_dir = detect_cli.run(dopt)
    assert save_dir.exists()


@pytest.mark.slow
def test_tflite_export_and_inference(tmp_path):
    """TFLite conversion (reference export.py:218 export_tflite) + the
    interpreter reproduces the JAX forward on one image."""
    import types

    import jax.numpy as jnp
    import tensorflow as tf

    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=64, batch_size=1, nc=3,
        include=["tflite"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    res = export_cli.run(opt)
    path = res["tflite"]
    assert Path(path).exists() and Path(path).stat().st_size > 1000

    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    got = interp.get_tensor(out["index"])
    want = np.asarray(fwd(jnp.asarray(x)))
    assert got.shape == want.shape  # (1, n_anchors, 5+nc+180) decoded
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_detect_via_tflite_backend(tmp_path, mini_dota_session):
    """export → tflite MultiBackend → detect CLI end-to-end (reference
    DetectMultiBackend tflite leg, models/common.py:342-366)."""
    import types

    import detect as detect_cli
    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=128, batch_size=1, nc=15,
        include=["tflite"], out=str(tmp_path),
    )
    res = export_cli.run(opt)
    path = res["tflite"]
    assert Path(path).exists()

    from yolov5_obb_tpu.models.backend import MultiBackend, is_artifact

    assert is_artifact(path)
    assert MultiBackend._sniff(Path(path)) == "tflite"

    data_yaml = tmp_path / "d.yaml"
    data_yaml.write_text(
        f"path: {mini_dota_session}\ntrain: images\nval: images\nnc: 15\n"
        f"names: [{', '.join(f'c{i}' for i in range(15))}]\n")
    dopt = types.SimpleNamespace(
        weights=str(path), cfg="yolov5n.yaml", data=str(data_yaml),
        source=str(mini_dota_session / "images"), imgsz=128, conf_thres=0.01,
        iou_thres=0.45, max_det=50, batch_size=1, save_txt=False,
        save_conf=False, nosave=True, hide_conf=False, augment=False,
        line_thickness=2, project=str(tmp_path / "runs"), name="tfl",
        exist_ok=True,
    )
    save_dir = detect_cli.run(dopt)
    assert save_dir.exists()


@pytest.mark.slow
def test_val_speed_task_with_artifact(tmp_path, mini_dota_session):
    """`val.py --task speed` with an exported artifact: the conf sentinel
    (None until resolved) must be resolved BEFORE the artifact predict fn
    is built (r5 regression: it reached the jitted NMS as None)."""
    import types

    import export as export_cli
    import val as val_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=128, batch_size=2, nc=15,
        include=["stablehlo"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    path = export_cli.export_stablehlo(fwd, opt, tmp_path)

    data_yaml = tmp_path / "d.yaml"
    data_yaml.write_text(
        f"path: {mini_dota_session}\ntrain: images\nval: images\nnc: 15\n"
        f"names: [{', '.join(f'c{i}' for i in range(15))}]\n")
    vopt = types.SimpleNamespace(
        weights=str(path), cfg="yolov5n.yaml", data=str(data_yaml),
        task="speed", imgsz=128, batch_size=2, conf_thres=None,
        iou_thres=0.4, max_det=100, max_images=4, save_json=False,
        save_task1=False, save_txt=False, save_conf=False, hyp=None,
        project=str(tmp_path / "runs"), name="spd", exist_ok=True)
    res = val_cli.run(vopt)
    assert res["speed_ms_per_img"] > 0
