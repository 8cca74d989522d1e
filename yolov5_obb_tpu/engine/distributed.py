"""Multi-host (multi-process) data-parallel training support.

The reference's primary scale path is DDP across processes and machines
(reference train.py:519-526, launch docs at docs/GetStart.md:60-63, with a
``DistributedSampler`` slicing the dataset per rank, utils/datasets.py:114).
The TPU-native equivalent has no per-rank model wrapper and no explicit
collectives: ``jax.distributed.initialize`` joins the processes into one
runtime, the SAME 1-D ``data`` mesh + jit train step then spans every
host's devices, and XLA inserts the gradient all-reduce over ICI/DCN.  The
only host-side obligations are (1) feeding each process its slice of the
global batch and (2) doing filesystem/logging work on host 0 only.

Launch (one command per host; on TPU pod slices ``initialize()``
auto-detects, so only ``YOLO_MULTIHOST=auto`` is needed):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<rank> python train.py ...
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_initialize() -> bool:
    """Join the multi-process runtime when a coordinator is configured.

    Returns True when running multi-process.  Triggers, in order:

    - ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``,
      ``JAX_PROCESS_ID``) — explicit, any backend (the analogue of the
      reference's MASTER_ADDR/RANK/WORLD_SIZE env protocol, train.py:53-55);
    - ``YOLO_MULTIHOST=auto`` — bare ``jax.distributed.initialize()``
      (TPU-pod / cluster-env auto-detection).

    Idempotent: safe to call when already initialized or single-process.
    """
    # NB: must not touch jax.process_count()/jax.devices() here — any
    # backend-initialising call before jax.distributed.initialize raises
    try:
        from jax._src import distributed as _d

        if _d.global_state.client is not None:  # already joined
            return jax.process_count() > 1
    except ImportError:
        pass
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        return True
    if os.environ.get("YOLO_MULTIHOST", "").lower() == "auto":
        jax.distributed.initialize()
        return True
    return False


def is_main() -> bool:
    """True on the process that owns filesystem side effects (checkpoints,
    logs, plots) — the reference's RANK in (-1, 0) gating (train.py:86)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def local_batch_size(global_batch: int) -> int:
    """Per-process slice of the global batch (reference train.py:213)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def broadcast_scalar(x: float) -> float:
    """Host-0's value on every process — keeps replicated control flow
    (early stopping, best-fitness) consistent when only host 0 validates.
    The reference left this unsolved (commented-out broadcast_object_list,
    reference train.py:406-414)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    return float(multihost_utils.broadcast_one_to_all(
        np.asarray(x, np.float32)))
