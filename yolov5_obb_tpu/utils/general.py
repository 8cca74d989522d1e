"""Misc config/path helpers (the slim counterpart of reference utils/general.py)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

DEFAULT_HYP_NAME = "hyp_finetune_dota.yaml"


def load_yaml(path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def load_hyp(path=None) -> dict:
    """Load hyperparameter yaml; falls back to the bundled DOTA finetune set
    (reference data/hyps/obb/hyp.finetune_dota.yaml)."""
    if path is None:
        path = Path(__file__).parent.parent / "data" / "configs" / DEFAULT_HYP_NAME
    return load_yaml(path)


def load_dataset_config(path) -> dict:
    """Dataset yaml: path/train/val/test/nc/names (reference general.py:371-421).

    Relative train/val/test entries are resolved against `path`."""
    d = load_yaml(path)
    root = Path(d.get("path", "."))
    if not root.is_absolute():
        root = Path(path).parent / root
    for k in ("train", "val", "test"):
        if d.get(k):
            p = Path(d[k])
            d[k] = str(p if p.is_absolute() else root / p)
    if isinstance(d.get("names"), dict):
        d["names"] = [d["names"][i] for i in sorted(d["names"])]
    return d


def increment_path(path, exist_ok=False, mkdir=True) -> Path:
    """runs/exp → runs/exp2, exp3... (reference general.py:955-968)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        for n in range(2, 9999):
            p = Path(f"{path}{n}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def init_seeds(seed: int = 0):
    import random

    random.seed(seed)
    np.random.seed(seed)


def colorstr(*args):
    """ANSI color helper (reference general.py:481-504)."""
    *prefix, string = args if len(args) > 1 else ("blue", "bold", args[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
        "end": "\033[0m",
    }
    return "".join(colors[p] for p in prefix) + str(string) + colors["end"]


def scale_hyp_gains(hyp: dict, nl: int, nc: int, imgsz: int) -> dict:
    """Per-model loss-gain scaling (reference train.py:249-252)."""
    h = dict(hyp)
    h["box"] = h.get("box", 0.05) * 3.0 / nl
    h["cls"] = h.get("cls", 0.5) * nc / 80.0 * 3.0 / nl
    h["obj"] = h.get("obj", 1.0) * (imgsz / 640.0) ** 2 * 3.0 / nl
    h["theta"] = h.get("theta", 0.5) * 3.0 / nl
    return h
