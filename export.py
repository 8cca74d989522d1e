#!/usr/bin/env python
"""Export CLI: StableHLO / TF SavedModel / TFLite (reference export.py).

The reference exports torchscript/ONNX/TensorRT/CoreML/TF-family from torch
(export.py:5-16); on the JAX stack the native interchange format is
StableHLO (``jax.export``), and the TF family (SavedModel → TFLite) comes
via jax2tf.  CUDA-only formats (TensorRT) have no TPU analogue.

Usage:
    python export.py --weights runs/train/exp/best --cfg yolov5m.yaml \
        --imgsz 1024 --include stablehlo saved_model tflite
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5n.yaml")
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--nc", type=int, default=15)
    p.add_argument(
        "--include", nargs="+", default=["stablehlo"],
        choices=["stablehlo", "saved_model", "tflite"],
    )
    p.add_argument("--out", type=str, default="runs/export")
    return p.parse_args()


def build_forward(opt):
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.yolo import create_model, decode
    from yolov5_obb_tpu.utils.checkpoint import load_weights, restore_model_meta

    model, variables, meta = create_model(opt.cfg, nc=opt.nc, imgsz=opt.imgsz)
    if opt.weights:
        variables, wmeta = load_weights(opt.weights)
        restore_model_meta(meta, wmeta)
    from yolov5_obb_tpu.utils.fuse import fuse_for_inference

    variables = fuse_for_inference(variables)  # reference attempt_load(fuse=True)

    def fwd(image_f32):
        """(B, H, W, 3) float32 in [0,1] → (B, n_anchors, 5+nc+180) decoded."""
        maps = model.apply(variables, image_f32, train=False)
        return decode(maps, meta)

    return fwd, variables, meta


def export_stablehlo(fwd, opt, out_dir: Path):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    t0 = time.time()
    # symbolic batch dim: the artifact serves any batch size (val/detect/serve)
    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, opt.imgsz, opt.imgsz, 3), jnp.float32)
    exported = jexport.export(jax.jit(fwd))(spec)
    path = out_dir / f"model_{opt.imgsz}.stablehlo"
    path.write_bytes(exported.serialize())
    print(f"stablehlo → {path} ({time.time()-t0:.1f}s)")
    return path


def export_saved_model(fwd, opt, out_dir: Path):
    import tensorflow as tf
    from jax.experimental import jax2tf

    t0 = time.time()
    tf_fn = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec((opt.batch_size, opt.imgsz, opt.imgsz, 3), tf.float32)
        ],
    )
    module = tf.Module()
    module.f = tf_fn
    path = out_dir / f"saved_model_{opt.imgsz}"
    tf.saved_model.save(module, str(path))
    print(f"saved_model → {path} ({time.time()-t0:.1f}s)")
    return path


def export_tflite(saved_model_path: Path, out_dir: Path, opt):
    import tensorflow as tf

    t0 = time.time()
    conv = tf.lite.TFLiteConverter.from_saved_model(str(saved_model_path))
    conv.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    blob = conv.convert()
    path = out_dir / f"model_{opt.imgsz}.tflite"
    path.write_bytes(blob)
    print(f"tflite → {path} ({time.time()-t0:.1f}s)")
    return path


def run(opt):
    out_dir = Path(opt.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    fwd, variables, meta = build_forward(opt)
    results = {}
    if "stablehlo" in opt.include:
        results["stablehlo"] = export_stablehlo(fwd, opt, out_dir)
    sm = None
    if "saved_model" in opt.include or "tflite" in opt.include:
        sm = export_saved_model(fwd, opt, out_dir)
        results["saved_model"] = sm
    if "tflite" in opt.include:
        results["tflite"] = export_tflite(sm, out_dir, opt)
    return results


if __name__ == "__main__":
    run(parse_opt())
