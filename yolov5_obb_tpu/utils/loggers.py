"""Training loggers: CSV / TensorBoard / Weights & Biases fan-out.

Counterpart of reference utils/loggers/__init__.py:37-175 with the same
metric key schema (incl. ``train/theta_loss`` and ``metrics/HBBmAP.5``).
TensorBoard uses tf.summary; W&B activates only if wandb is importable.
"""

from __future__ import annotations

import csv
from pathlib import Path

LOSS_KEYS = ("train/box_loss", "train/obj_loss", "train/cls_loss", "train/theta_loss")
METRIC_KEYS = (
    "metrics/precision", "metrics/recall", "metrics/HBBmAP.5",
    "metrics/HBBmAP.5:.95",
)
LR_KEY = "x/lr0"


class Loggers:
    def __init__(self, save_dir, include=("csv", "tb"), hyp=None, opt=None):
        self.save_dir = Path(save_dir)
        self.csv_path = self.save_dir / "results.csv"
        self.keys = [*LOSS_KEYS, *METRIC_KEYS, "fitness", LR_KEY]
        self.csv = "csv" in include
        self.tb = None
        self.wandb = None

        if "tb" in include:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(str(self.save_dir / "tb"))
            except Exception:
                self.tb = None
        if "wandb" in include:
            try:
                import wandb

                self.wandb = wandb.init(
                    project="yolov5_obb_tpu", dir=str(self.save_dir),
                    config={"hyp": hyp, "opt": vars(opt) if opt else None},
                )
            except Exception:
                self.wandb = None

    def log_epoch(self, epoch: int, values: dict):
        """values keyed by self.keys (missing → 0)."""
        row = {k: float(values.get(k, 0.0)) for k in self.keys}
        if self.csv:
            new = not self.csv_path.exists()
            with open(self.csv_path, "a", newline="") as f:
                w = csv.writer(f)
                if new:
                    w.writerow(["epoch", *self.keys])
                w.writerow([epoch, *(f"{row[k]:.6f}" for k in self.keys)])
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in row.items():
                    tf.summary.scalar(k, v, step=epoch)
                self.tb.flush()
        if self.wandb is not None:
            self.wandb.log(row, step=epoch)

    def log_model_artifact(self, ckpt_dir, epoch: int, fitness: float = 0.0,
                           best: bool = False):
        """Version a checkpoint directory as a W&B artifact
        (reference utils/loggers/wandb/wandb_utils.py:404-419). No-op when
        wandb is inactive."""
        if self.wandb is None:
            return
        import wandb

        art = wandb.Artifact(
            f"run_{self.wandb.id}_model", type="model",
            metadata={"epoch": epoch, "fitness": float(fitness)},
        )
        art.add_dir(str(ckpt_dir))
        aliases = ["latest", f"epoch{epoch}"] + (["best"] if best else [])
        self.wandb.log_artifact(art, aliases=aliases)

    def log_val_predictions(self, epoch: int, detections, names,
                            max_images: int = 16):
        """Per-epoch W&B Table of validation images with predicted OBBs
        (reference utils/loggers/wandb/wandb_utils.py:138-252,379-400
        val/prediction Tables). Redesigned OBB-native: W&B's box overlays
        are axis-aligned only, so the rotated polygons are rendered onto
        the image instead. ``detections`` is evaluate()'s per-image list
        ({path, polys, conf, cls, hw}). No-op when wandb is inactive.
        """
        if self.wandb is None or not detections:
            return
        import cv2
        import numpy as np
        import wandb

        from .plots import annotate_detections

        table = wandb.Table(
            columns=["epoch", "id", "prediction", "n_det", "avg_conf"])
        for d in detections[:max_images]:
            img = cv2.imread(str(d["path"]))
            if img is None:
                continue
            conf = np.asarray(d["conf"], np.float32)
            annotate_detections(img, d["polys"], conf, d["cls"], list(names))
            table.add_data(epoch, Path(d["path"]).stem,
                           wandb.Image(img[..., ::-1]),  # BGR → RGB
                           int(len(conf)),
                           float(conf.mean()) if len(conf) else 0.0)
        self.wandb.log({"val/predictions": table}, step=epoch)

    def log_dataset_artifact(self, data_yaml):
        """Version the dataset yaml (+label dir if local) as a W&B artifact
        (reference wandb_utils.py:192-238). No-op when wandb is inactive."""
        if self.wandb is None:
            return
        import wandb

        art = wandb.Artifact(f"run_{self.wandb.id}_dataset", type="dataset")
        art.add_file(str(data_yaml))
        self.wandb.log_artifact(art)

    def finish(self):
        if self.wandb is not None:
            self.wandb.finish()


def resolve_wandb_artifact(path: str) -> str:
    """``wandb-artifact://entity/project/name:alias`` → local download dir
    (reference wandb_utils.py:68-80 resume path). Returns ``path`` unchanged
    for ordinary paths; raises if wandb is requested but unavailable."""
    prefix = "wandb-artifact://"
    if not str(path).startswith(prefix):
        return path
    import wandb  # noqa: F401 — ImportError is the correct failure here

    api = wandb.Api()
    art = api.artifact(str(path)[len(prefix):])
    return art.download()
