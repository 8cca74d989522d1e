"""Execute the W&B logger paths with a vendored test double.

wandb is not installed in this image, so the artifact/resume branches in
utils/loggers.py (reference counterpart: utils/loggers/wandb/wandb_utils.py)
would otherwise never run. A minimal fake `wandb` module exercises them:
run init, scalar logging, model/dataset artifact versioning with aliases,
wandb-artifact:// resume resolution, finish.
"""

import sys
import types

import pytest


class _FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.files, self.dirs = [], []

    def add_file(self, p):
        self.files.append(p)

    def add_dir(self, p):
        self.dirs.append(p)

    def download(self):
        return f"/tmp/fake_artifact/{self.name}"


class _FakeRun:
    def __init__(self):
        self.id = "fake123"
        self.logged, self.artifacts = [], []
        self.finished = False

    def log(self, row, step=None):
        self.logged.append((step, dict(row)))

    def log_artifact(self, art, aliases=()):
        self.artifacts.append((art, list(aliases)))

    def finish(self):
        self.finished = True


class _FakeTable:
    def __init__(self, columns=()):
        self.columns, self.rows = list(columns), []

    def add_data(self, *row):
        self.rows.append(row)


class _FakeImage:
    def __init__(self, data, **kw):
        self.shape = getattr(data, "shape", None)


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    run = _FakeRun()
    mod.init = lambda **kw: run
    mod.Artifact = _FakeArtifact
    mod.Table = _FakeTable
    mod.Image = _FakeImage

    class _Api:
        def artifact(self, spec):
            return _FakeArtifact(spec)

    mod.Api = _Api
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return run


def test_wandb_logger_branches(tmp_path, fake_wandb):
    from yolov5_obb_tpu.utils.loggers import Loggers

    lg = Loggers(tmp_path, include=("csv", "wandb"), hyp={"lr0": 0.01},
                 opt=None)
    assert lg.wandb is fake_wandb

    lg.log_dataset_artifact(tmp_path / "data.yaml")
    (tmp_path / "data.yaml").write_text("nc: 1\n")
    lg.log_epoch(0, {"train/box_loss": 0.5, "fitness": 0.1})
    (tmp_path / "ckpt").mkdir()
    lg.log_model_artifact(tmp_path / "ckpt", epoch=0, fitness=0.1, best=True)
    lg.finish()

    assert fake_wandb.logged and fake_wandb.logged[0][0] == 0
    kinds = {a.type for a, _ in fake_wandb.artifacts}
    assert kinds == {"model", "dataset"}
    model_art, aliases = [x for x in fake_wandb.artifacts
                          if x[0].type == "model"][0]
    assert "best" in aliases and "latest" in aliases
    assert model_art.metadata["epoch"] == 0
    assert fake_wandb.finished
    assert (tmp_path / "results.csv").exists()  # csv still written


def test_wandb_val_prediction_table(tmp_path, fake_wandb):
    """Per-epoch val-image prediction Table (reference wandb_utils.py:138-252)
    renders OBB polygons and logs one row per image."""
    import cv2
    import numpy as np

    from yolov5_obb_tpu.utils.loggers import Loggers

    img_path = tmp_path / "img0.png"
    cv2.imwrite(str(img_path), np.zeros((64, 64, 3), np.uint8))
    dets = [{
        "path": str(img_path),
        "polys": np.array([[10, 10, 30, 10, 30, 25, 10, 25],
                           [5, 40, 25, 35, 28, 47, 8, 52]], np.float32),
        "conf": np.array([0.9, 0.6], np.float32),
        "cls": np.array([0, 3], np.float32),
        "hw": (64, 64),
    }, {"path": str(tmp_path / "missing.png"), "polys": np.zeros((0, 8)),
        "conf": np.zeros(0), "cls": np.zeros(0), "hw": (64, 64)}]

    lg = Loggers(tmp_path, include=("wandb",))
    lg.log_val_predictions(epoch=3, detections=dets,
                           names=["plane", "b", "c", "ship"])
    assert len(fake_wandb.logged) == 1
    step, row = fake_wandb.logged[0]
    assert step == 3
    table = row["val/predictions"]
    assert table.columns == ["epoch", "id", "prediction", "n_det", "avg_conf"]
    assert len(table.rows) == 1  # unreadable image skipped
    ep, iid, im, n_det, avg = table.rows[0]
    assert (ep, iid, n_det) == (3, "img0", 2)
    assert im.shape == (64, 64, 3)
    assert abs(avg - 0.75) < 1e-6

    # inactive wandb → silent no-op
    lg2 = Loggers(tmp_path, include=())
    lg2.log_val_predictions(0, dets, ["a"])


def test_wandb_artifact_resume_resolution(fake_wandb):
    from yolov5_obb_tpu.utils.loggers import resolve_wandb_artifact

    # ordinary paths pass through untouched
    assert resolve_wandb_artifact("/runs/x/last") == "/runs/x/last"
    # artifact URIs resolve to the (fake) download dir
    got = resolve_wandb_artifact("wandb-artifact://me/proj/run_model:best")
    assert got == "/tmp/fake_artifact/me/proj/run_model:best"


def test_sweep_entry_point(fake_wandb, monkeypatch):
    """tools/sweep.py (reference utils/loggers/wandb/sweep.py counterpart):
    wandb.config splits into driver options + a hyp override for train.run."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import sweep as sweep_mod
    import train as train_mod

    cfg = types.SimpleNamespace(_items={
        "data": "/tmp/ds/data.yaml", "batch_size": 4, "epochs": 2,
        "imgsz": 128, "lr0": 0.02, "theta": 1.5, "csl_radius": 1,
    })
    _sys.modules["wandb"].config = cfg

    calls = {}

    def fake_run(opt, hyp_override=None, callbacks=None):
        calls["opt"], calls["hyp"] = opt, hyp_override
        return {"fitness": 0.0}

    monkeypatch.setattr(train_mod, "run", fake_run)
    sweep_mod.sweep()

    opt, hyp = calls["opt"], calls["hyp"]
    assert (opt.data, opt.batch_size, opt.epochs, opt.imgsz) == (
        "/tmp/ds/data.yaml", 4, 2, 128)
    assert opt.nosave and opt.wandb
    assert hyp == {"lr0": 0.02, "theta": 1.5, "csl_radius": 1}
