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


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    run = _FakeRun()
    mod.init = lambda **kw: run
    mod.Artifact = _FakeArtifact

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


def test_wandb_artifact_resume_resolution(fake_wandb):
    from yolov5_obb_tpu.utils.loggers import resolve_wandb_artifact

    # ordinary paths pass through untouched
    assert resolve_wandb_artifact("/runs/x/last") == "/runs/x/last"
    # artifact URIs resolve to the (fake) download dir
    got = resolve_wandb_artifact("wandb-artifact://me/proj/run_model:best")
    assert got == "/tmp/fake_artifact/me/proj/run_model:best"
