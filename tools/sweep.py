#!/usr/bin/env python
"""W&B hyperparameter-sweep entry point.

Counterpart of the reference's ``utils/loggers/wandb/sweep.py``: the W&B
sweep agent launches this program once per trial; ``wandb.config`` carries
the sampled hyperparameters, which are split into driver options
(data/batch_size/epochs/imgsz) and a ``hyp`` override dict passed to
``train.run``.  Launch with::

    wandb sweep yolov5_obb_tpu/data/configs/sweep.yaml
    wandb agent <sweep-id>

The in-repo GA evolution (``train.py --evolve``, engine/evolve.py) covers
the same search without a W&B account; this entry point exists for teams
already running W&B sweep infrastructure (reference sweep.yaml).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# sweep-config keys consumed by the driver rather than the hyp dict
_OPT_KEYS = ("data", "batch_size", "epochs", "imgsz", "cfg", "weights")


def sweep():
    import wandb

    wandb.init()
    # reference reads the private ``_items``; fall back to the public
    # mapping interface for test doubles / newer clients
    cfg = getattr(wandb.config, "_items", None) or dict(wandb.config)

    import train as train_mod

    argv = ["--data", str(cfg["data"])]
    opt = train_mod.parse_opt(argv, known=True)
    opt.batch_size = int(cfg.get("batch_size", opt.batch_size))
    opt.epochs = int(cfg.get("epochs", opt.epochs))
    opt.imgsz = int(cfg.get("imgsz", opt.imgsz))
    if cfg.get("cfg"):
        opt.cfg = str(cfg["cfg"])
    if cfg.get("weights"):
        opt.weights = str(cfg["weights"])
    opt.nosave = True  # sweeps keep metrics, not checkpoints (as reference)
    opt.wandb = True

    hyp_override = {k: v for k, v in cfg.items() if k not in _OPT_KEYS}
    return train_mod.run(opt, hyp_override=hyp_override)


if __name__ == "__main__":
    sweep()
