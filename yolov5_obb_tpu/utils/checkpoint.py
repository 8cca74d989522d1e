"""Orbax checkpointing: explicit pytrees instead of pickled modules.

The reference pickles whole ``nn.Module`` objects into last.pt/best.pt
(train.py:384-400); here a checkpoint is {params, batch_stats, ema_params,
opt_state, step, ema_updates} plus a small JSON metadata sidecar, and
``strip`` (reference general.py:864-878) saves the EMA weights only.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def _to_host(tree):
    """Device arrays → numpy so checkpoints restore on any topology
    (a mesh-replicated save would otherwise pin sharding metadata to the
    saving process's device count)."""
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state, metadata: dict | None = None):
    """Save full train state for resume."""
    path = Path(path).absolute()
    tree = _to_host(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
            "step": state.step,
            "ema_updates": state.ema_updates,
        }
    )
    _ckptr().save(path, tree, force=True)
    if metadata is not None:
        (path / "meta.json").write_text(json.dumps(metadata, default=str))


def restore_checkpoint(path, state):
    """Restore into an existing state template (shapes/dtypes must match)."""
    path = Path(path).absolute()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "step": state.step,
        "ema_updates": state.ema_updates,
    }
    tree = _ckptr().restore(path, item=template)
    meta = {}
    mp = path / "meta.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    return (
        state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            ema_params=tree["ema_params"],
            opt_state=tree["opt_state"],
            step=tree["step"],
            ema_updates=tree["ema_updates"],
        ),
        meta,
    )


def save_weights(path, params, batch_stats, metadata: dict | None = None):
    """Deployment weights (e.g. stripped EMA): params + BN stats only."""
    path = Path(path).absolute()
    _ckptr().save(
        path,
        _to_host({"params": params, "batch_stats": batch_stats}),
        force=True,
    )
    if metadata is not None:
        (path / "meta.json").write_text(json.dumps(metadata, default=str))


def load_weights(path):
    """Load deployment weights → ({'params':..., 'batch_stats':...}, meta).

    Accepts a local orbax dir or a ``wandb-artifact://`` reference
    (reference wandb_utils.py:68-80)."""
    if str(path).startswith("wandb-artifact://"):
        from .loggers import resolve_wandb_artifact

        path = resolve_wandb_artifact(str(path))
    path = Path(path).absolute()
    tree = _ckptr().restore(path)
    meta = {}
    mp = path / "meta.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    variables = {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}
    return variables, meta


def restore_model_meta(meta, ckpt_meta: dict):
    """Apply checkpoint-side model metadata to a live ModelMeta.

    Autoanchor-evolved anchors are saved in the checkpoint's meta.json
    (the reference keeps them inside the pickled model, train.py:241);
    without this, inference on an evolved checkpoint would decode with the
    config anchors — silently wrong boxes."""
    import numpy as np

    anchors = ckpt_meta.get("anchors") if ckpt_meta else None
    if anchors is not None and meta is not None:
        arr = np.asarray(anchors, dtype=np.float32)
        if arr.shape == tuple(np.shape(meta.anchors_px)):
            meta.anchors_px = arr
    return meta
