"""End-to-end slice: train a tiny model on mini-DOTA, checkpoint, val, detect."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def _write_dataset_yaml(root, out):
    out.write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: 15\n"
        "names: [plane, baseball-diamond, bridge, ground-track-field,\n"
        "        small-vehicle, large-vehicle, ship, tennis-court,\n"
        "        basketball-court, storage-tank, soccer-ball-field,\n"
        "        roundabout, harbor, swimming-pool, helicopter]\n"
    )
    return out


@pytest.mark.slow
def test_train_val_detect_roundtrip(mini_dota_session, tmp_path):
    import train as train_cli
    import val as val_cli
    import detect as detect_cli

    data_yaml = _write_dataset_yaml(mini_dota_session, tmp_path / "data.yaml")

    opt = types.SimpleNamespace(
        cfg="yolov5n.yaml", data=str(data_yaml), hyp=None, weights="",
        epochs=2, batch_size=2, nominal_batch=64, imgsz=128, max_labels=16, workers=0,
        dtype="float32", seed=0, noval=False, nosave=False, val_images=2,
        save_period=-1, patience=100, linear_lr=False, image_weights=False,
        adam=False, resume="",
        log_interval=100, project=str(tmp_path / "runs/train"), name="exp",
        exist_ok=True,
    )
    save_dir, best_fit, _ = train_cli.run(opt)
    assert (save_dir / "results.csv").exists()
    assert (save_dir / "last").exists()
    # results.csv has 2 epochs + header
    lines = (save_dir / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 3
    weights = save_dir / ("best" if (save_dir / "best").exists() else "last")

    # --- val CLI -------------------------------------------------------
    vopt = types.SimpleNamespace(
        weights=str(save_dir / "best") if (save_dir / "best").exists() else "",
        cfg="yolov5n.yaml", data=str(data_yaml), task="val", imgsz=128,
        batch_size=2, conf_thres=0.01, iou_thres=0.4, max_det=100,
        max_images=None, save_json=True, save_task1=True, save_txt=True,
        save_conf=True, hyp=None,
        project=str(tmp_path / "runs/val"), name="exp", exist_ok=True,
    )
    res = val_cli.run(vopt)
    assert 0.0 <= res["map50"] <= 1.0
    assert (tmp_path / "runs/val/exp/best_obb_predictions.json").exists()
    # observability parity: confusion matrix + PR/F1 curves (reference
    # val.py:174,241-244) and labels.png at train start (train.py:222-241)
    assert (tmp_path / "runs/val/exp/confusion_matrix.png").exists()
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png"):
        assert (tmp_path / "runs/val/exp" / f).exists(), f
    assert (save_dir / "labels.png").exists()
    assert list((tmp_path / "runs/val/exp/task1_raw").glob("Task1_*.txt"))
    labels = list((tmp_path / "runs/val/exp/labels").glob("*.txt"))
    assert labels, "val --save-txt produced no label files"
    for line in labels[0].read_text().splitlines():
        vals = line.split()
        assert len(vals) == 6  # cls cx cy w h conf
        assert all(0.0 <= float(v) <= 1.5 for v in vals[1:5])

    # --- detect CLI ----------------------------------------------------
    dopt = types.SimpleNamespace(
        weights=str(save_dir / "best") if (save_dir / "best").exists() else "",
        cfg="yolov5n.yaml", source=str(mini_dota_session / "images"),
        data=str(data_yaml), imgsz=128, conf_thres=0.05, iou_thres=0.45,
        max_det=50, batch_size=1, save_txt=True, save_conf=True, nosave=False,
        hide_conf=False, line_thickness=2,
        project=str(tmp_path / "runs/detect"), name="exp", exist_ok=True,
    )
    out_dir = detect_cli.run(dopt)
    imgs = list(out_dir.glob("*.png"))
    assert len(imgs) == 4, "annotated images missing"

    # --- resume path ----------------------------------------------------
    opt.resume = str(save_dir / "last")
    opt.epochs = 3
    save_dir2, _, _ = train_cli.run(opt)
    lines = (save_dir2 / "results.csv").read_text().strip().splitlines()
    assert len(lines) >= 4  # header + epochs 0,1 (+2 resumed)


@pytest.mark.slow
def test_val_study_task(mini_dota_session, tmp_path):
    import val as val_cli

    data_yaml = _write_dataset_yaml(mini_dota_session, tmp_path / "data.yaml")
    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", data=str(data_yaml), task="study",
        study_sizes=[96, 128], imgsz=128, batch_size=2, conf_thres=0.01,
        iou_thres=0.4, max_det=50, max_images=2, save_json=False,
        save_task1=False, hyp=None, project=str(tmp_path / "runs/val"),
        name="study", exist_ok=True,
    )
    rows = val_cli.run(opt)
    assert [int(r[0]) for r in rows] == [96, 128]
    out = list((tmp_path / "runs/val").rglob("study_*.txt"))
    assert len(out) == 1 and len(out[0].read_text().strip().splitlines()) == 2


@pytest.mark.slow
def test_train_fires_callbacks(mini_dota_session, tmp_path):
    import train as train_cli
    from yolov5_obb_tpu.utils.callbacks import Callbacks

    data_yaml = _write_dataset_yaml(mini_dota_session, tmp_path / "data.yaml")
    seen = []
    cb = Callbacks()
    for ev in ("on_pretrain_routine_start", "on_train_start",
               "on_train_epoch_start", "on_train_batch_end",
               "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
               "on_train_end"):
        cb.register_action(ev, name="rec",
                           callback=lambda *a, _ev=ev, **k: seen.append(_ev))

    opt = types.SimpleNamespace(
        cfg="yolov5n.yaml", data=str(data_yaml), hyp=None, weights="",
        epochs=1, batch_size=2, nominal_batch=64, imgsz=128, max_labels=16,
        workers=0, dtype="float32", seed=0, noval=True, nosave=False,
        val_images=2, save_period=-1, patience=100, linear_lr=False,
        image_weights=False, adam=False, resume="", log_interval=100,
        project=str(tmp_path / "runs/train"), name="cb", exist_ok=True,
    )
    train_cli.run(opt, callbacks=cb)
    for ev in ("on_pretrain_routine_start", "on_train_start",
               "on_train_epoch_start", "on_train_batch_end",
               "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
               "on_train_end"):
        assert ev in seen, f"{ev} never fired"


@pytest.mark.slow
def test_resume_continues_epochs(mini_dota_session, tmp_path):
    """--resume restores optimizer/EMA/epoch and continues numbering
    (reference train.py:179-199 resume semantics)."""
    import train as train_cli

    data_yaml = _write_dataset_yaml(mini_dota_session, tmp_path / "data.yaml")
    base = dict(
        cfg="yolov5n.yaml", data=str(data_yaml), hyp=None, weights="",
        batch_size=2, nominal_batch=64, imgsz=128, max_labels=16, workers=0,
        dtype="float32", seed=0, noval=True, nosave=False, val_images=2,
        save_period=-1, patience=100, linear_lr=False, image_weights=False,
        adam=False, log_interval=100, project=str(tmp_path / "runs"),
        name="r", exist_ok=True,
    )
    save_dir, _, _ = train_cli.run(types.SimpleNamespace(**base, epochs=2, resume=""))
    lines = (save_dir / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs

    save_dir2, _, _ = train_cli.run(types.SimpleNamespace(
        **base, epochs=4, resume=str(save_dir / "last")))
    lines = (save_dir2 / "results.csv").read_text().strip().splitlines()
    rows = [ln.split(",")[0] for ln in lines[1:]]
    assert rows == ["0", "1", "2", "3"]  # epochs continued, no restart


@pytest.mark.slow
def test_evolve_two_generations(mini_dota_session, tmp_path):
    import train as train_cli

    data_yaml = _write_dataset_yaml(mini_dota_session, tmp_path / "data.yaml")
    opt = types.SimpleNamespace(
        cfg="yolov5n.yaml", data=str(data_yaml), hyp=None, weights="",
        epochs=1, batch_size=2, nominal_batch=64, imgsz=128, max_labels=16,
        workers=0, dtype="float32", seed=0, noval=True, nosave=False,
        val_images=2, save_period=-1, patience=100, linear_lr=False,
        image_weights=False, adam=False, resume="", log_interval=100,
        project=str(tmp_path / "runs"), name="ev", exist_ok=True, evolve=2,
    )
    train_cli.evolve(opt)
    csv = list((tmp_path / "runs").rglob("evolve.csv"))
    assert len(csv) == 1
    assert len(csv[0].read_text().strip().splitlines()) == 3  # header + 2 gens


def test_evolve_logs_run_metrics(tmp_path, monkeypatch):
    """evolve.csv metric columns must carry the run's actual metrics, not
    placeholders (regression: round 1 logged zeros for map50/map)."""
    import train as train_cli

    calls = []

    def fake_run(opt, hyp_override=None, callbacks=None):
        calls.append(hyp_override)
        return tmp_path / "fake", 0.4321, {"mp": 0.5, "mr": 0.6,
                                           "map50": 0.123, "map": 0.077}

    monkeypatch.setattr(train_cli, "run", fake_run)
    opt = types.SimpleNamespace(
        hyp=None, evolve=2, seed=0, exist_ok=True, nosave=True,
        project=str(tmp_path / "runs"), name="ev",
    )
    train_cli.evolve(opt)
    rows = list((tmp_path / "runs").rglob("evolve.csv"))[0].read_text()
    lines = rows.strip().splitlines()
    assert len(lines) == 3 and len(calls) == 2
    header = lines[0].split(",")
    for line in lines[1:]:
        rec = dict(zip(header, line.split(",")))
        assert float(rec["fitness"]) == pytest.approx(0.4321, abs=1e-4)
        assert float(rec["map50"]) == pytest.approx(0.123, abs=1e-4)
        assert float(rec["map"]) == pytest.approx(0.077, abs=1e-4)
