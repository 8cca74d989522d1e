"""Multi-backend inference loader (reference DetectMultiBackend,
models/common.py:277-437).

Backends:
* ``orbax``      — native weights dir (+ model config) → jitted JAX fn
* ``stablehlo``  — a serialized ``jax.export`` artifact (.stablehlo)
* ``saved_model``— a TF SavedModel dir (from export.py / jax2tf)
* ``tflite``     — a .tflite flatbuffer (reference DetectMultiBackend's
  tflite leg, models/common.py:342-366; ours runs the decoded-output
  artifact through tf.lite.Interpreter on host)

All return a callable ``fn(image_f32 (B,H,W,3)) → (B, n_anchors, no)``
decoded predictions, plus metadata.
"""

from __future__ import annotations

from pathlib import Path


class MultiBackend:
    def __init__(self, path: str, cfg: str | None = None, nc: int | None = None,
                 imgsz: int = 1024):
        import jax.numpy as jnp

        p = Path(path)
        self.kind = self._sniff(p)
        self.names = None
        if self.kind == "stablehlo":
            from jax import export as jexport

            exported = jexport.deserialize(p.read_bytes())
            self._fn = exported.call
        elif self.kind == "tflite":
            import numpy as np
            import tensorflow as tf

            interp = tf.lite.Interpreter(model_path=str(p))
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]
            out = interp.get_output_details()[0]

            def call(x):
                xh = np.asarray(x, np.float32)
                if list(inp["shape"]) != list(xh.shape):
                    interp.resize_tensor_input(inp["index"], xh.shape)
                    interp.allocate_tensors()
                    inp["shape"] = xh.shape
                interp.set_tensor(inp["index"], xh)
                interp.invoke()
                return jnp.asarray(interp.get_tensor(out["index"]))

            self._fn = call
        elif self.kind == "saved_model":
            import tensorflow as tf

            mod = tf.saved_model.load(str(p))
            tf_f = mod.f

            def call(x):
                import numpy as np

                return jnp.asarray(tf_f(tf.constant(np.asarray(x))).numpy())

            self._fn = call
        else:  # orbax weights
            import jax

            from ..utils.checkpoint import load_weights
            from .yolo import create_model, decode

            model, variables, meta = create_model(cfg or "yolov5m.yaml", nc=nc,
                                                  imgsz=imgsz)
            from ..utils.checkpoint import restore_model_meta
            from ..utils.fuse import fuse_for_inference

            variables, wmeta = load_weights(p)
            restore_model_meta(meta, wmeta)
            # fold BN, then stage the host-numpy tree on device once — jit
            # re-transfers host arguments on every call
            variables = jax.device_put(fuse_for_inference(variables))
            self.names = wmeta.get("names")
            self.meta = meta

            @jax.jit
            def call(x):
                return decode(model.apply(variables, x, train=False), meta)

            self._fn = call

    @staticmethod
    def _sniff(p: Path) -> str:
        if p.suffix == ".tflite":
            return "tflite"
        if p.suffix == ".stablehlo" or (p.is_file() and p.suffix != ""):
            return "stablehlo"
        if (p / "saved_model.pb").exists():
            return "saved_model"
        return "orbax"

    def __call__(self, image_f32):
        return self._fn(image_f32)

    def warmup(self, shape=(1, 1024, 1024, 3)):
        import jax.numpy as jnp

        self(jnp.zeros(shape, jnp.float32))
        return self


def is_artifact(path) -> bool:
    """True if ``path`` is an exported artifact rather than orbax weights."""
    p = Path(path)
    return (p.suffix in (".stablehlo", ".tflite")
            or (p / "saved_model.pb").exists())


def make_backend_predict_fn(weights, cfg, nc, imgsz, conf_thres, iou_thres,
                            max_det, tta: bool = False):
    """Exported-artifact path shared by val.py/detect.py: returns
    ``(predict_fn(variables_ignored, image_u8) -> (dets, num), names)``.

    The artifact emits decoded ``(B, n_anchors, no)`` predictions; rotated
    NMS runs here. TTA needs the raw maps, which artifacts don't expose."""
    if tta:
        raise ValueError("--augment (TTA) is not supported with exported "
                         "artifacts — use orbax weights")
    from ..ops.rotated_nms import non_max_suppression_obb

    backend = MultiBackend(str(weights), cfg=cfg, nc=nc, imgsz=imgsz)

    def predict(_vars, image_u8):
        pred = backend(image_u8.astype("float32") / 255.0)
        return non_max_suppression_obb(
            pred, num_classes=nc, conf_thres=conf_thres,
            iou_thres=iou_thres, max_det=max_det, multi_label=True,
        )

    return predict, backend.names
