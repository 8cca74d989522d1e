"""Train state + pjit data-parallel train step.

The reference's DDP/NCCL setup (train.py:202-252, 517-533) maps to a 1-D
``data`` mesh: the batch is sharded across devices, parameters are
replicated, and XLA inserts the gradient all-reduce — there is no explicit
collective code.  The same step function runs single-chip (mesh of 1) and
multi-chip unchanged.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .optim import ema_update


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jax.Array  # int32
    step: jax.Array  # int32


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        # a real copy: params and ema_params must not alias (the train step
        # donates the whole state; aliased buffers → "donated twice")
        ema_params=jax.tree.map(jnp.copy, params),
        ema_updates=jnp.int32(0),
        step=jnp.int32(0),
    )


def make_mesh(n_devices: int | None = None, axis: str = "data",
              platform: str | None = None) -> Mesh:
    """1-D data mesh. Falls back to the CPU backend (virtual host devices,
    ``--xla_force_host_platform_device_count``) when the default platform
    has fewer than ``n_devices`` — used by tests and the multi-chip dry run."""
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None and len(devs) < n_devices and platform is None:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devs = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_train_step(model, loss_fn, tx, use_ema: bool = True, mesh: Mesh | None = None,
                    remat: bool = False):
    """Build the jitted train step.

    loss_fn(maps, targets, t_mask) -> (total, items[4]).
    Batch: image uint8 (B,H,W,3), targets (B,M,186) f32, mask (B,M) bool.

    ``remat``:
      - ``True`` / ``"full"``: rematerialise the whole forward during
        backward (jax.checkpoint) — trades ~30% step time for roughly
        halved activation memory, enabling larger per-chip batches.
      - ``"selective"``: save ONLY the bf16 conv outputs as backward
        residuals (``checkpoint_name("conv_out")`` anchors in
        models/layers.ConvBnAct) and recompute the f32 BN/SiLU chains in
        the backward. Stock autodiff keeps ~3 residual tensors per conv
        block (conv-out bf16 + BN-out/SiLU values f32); the step is
        HBM-bytes-bound on TPU, so dropping the f32 residuals buys speed
        AND memory for a few cheap elementwise recomputes.
    """

    def step_fn(state: TrainState, image, targets, t_mask):
        if image.ndim == 3:
            # packed (B, H, W*3) uint8 view for a packed_stem model — the
            # /255 normalize folds into the stem kernel weights
            x = image
        else:
            x = image.astype(jnp.float32) / 255.0

        def fwd(params, xx):
            # flat=True: Detect emits (B, n, no) levels — avoids the 5-D
            # layout's na=3 sublane padding on every loss read (see loss.py)
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xx,
                train=True,
                flat=True,
                mutable=["batch_stats"],
            )

        if remat == "selective":
            fwd = jax.checkpoint(
                fwd,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"),
            )
        elif remat:
            fwd = jax.checkpoint(fwd)

        def loss_of(params):
            outs, updates = fwd(params, x)
            total, items = loss_fn(outs, targets, t_mask)
            return total, (items, updates["batch_stats"])

        (total, (items, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if use_ema:
            new_updates = state.ema_updates + 1
            new_ema = ema_update(state.ema_params, new_params, new_updates)
        else:
            new_updates = state.ema_updates
            new_ema = state.ema_params

        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            ema_updates=new_updates,
            step=state.step + 1,
        )
        return new_state, {"loss": total, "items": items}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rsh, bsh, bsh, bsh),
        out_shardings=(rsh, rsh),
        donate_argnums=(0,),
    )


def put_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state replicated on the mesh.  Required before the
    first sharded step: donating buffers that simultaneously need an
    automatic single-device→mesh reshard can deadlock the runtime."""
    return jax.device_put(state, replicated(mesh))


def put_batch(batch, mesh: Mesh | None, packed: bool = False):
    """Host batch → device arrays (sharded over the data axis if mesh given).

    Multi-process: each host passes its LOCAL slice of the global batch
    (``batch_size // process_count`` rows, the reference's per-rank batch,
    train.py:213) and the slices assemble into one global array across the
    mesh — the multi-host analogue of DistributedSampler + DDP.

    ``packed``: upload the image as the ``(B, H, W*3)`` u8 view a
    packed-stem model consumes (a free host-side reshape — uploading NHWC
    and reshaping on device would pay the padded-layout copy)."""
    image = batch.image
    if packed:
        image = np.ascontiguousarray(image).reshape(
            image.shape[0], image.shape[1], -1)
    arrs = (image, batch.targets, batch.target_mask)
    if mesh is None:
        return tuple(jnp.asarray(a) for a in arrs)
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return tuple(
            jax.make_array_from_process_local_data(sh, np.asarray(a))
            for a in arrs
        )
    return tuple(jax.device_put(a, sh) for a in arrs)
