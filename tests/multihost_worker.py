"""Worker for the 2-process multi-host equivalence test (test_multihost.py).

Run as:  python tests/multihost_worker.py <process_id> <num_procs> <port> <out>

Each process owns ONE virtual CPU device; jax.distributed joins them into a
2-device global runtime. The train step runs over the global data mesh with
each process feeding its strided slice of a deterministic global batch —
exactly train.py's multi-host path (engine/distributed.py).
"""

import json
import os
import sys

import numpy as np


def fixed_batch(seed: int = 0, B: int = 4, M: int = 8, imgsz: int = 64,
                nc: int = 2):
    """Deterministic global batch — identical on every process."""
    from yolov5_obb_tpu.ops.geometry import csl_gaussian_labels

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (B, imgsz, imgsz, 3), dtype=np.uint8)
    targets = np.zeros((B, M, 186), np.float32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        for i in range(3):
            cx, cy = rng.uniform(10, 54, 2)
            length = rng.uniform(10, 30)
            s = length * rng.uniform(0.4, 0.9)
            t = rng.uniform(-np.pi / 2, np.pi / 2)
            targets[b, i, 0] = rng.integers(0, nc)
            targets[b, i, 1:6] = [cx, cy, length, s, t]
            targets[b, i, 6:] = csl_gaussian_labels(
                np.array([t * 180 / np.pi + 90]), radius=2.0)[0]
            mask[b, i] = True
    return img, targets, mask


def run_steps(mesh, local_slice, n_steps: int = 3, barrier=None):
    """Build model/optimizer/step and run n_steps on the fixed batch.

    ``local_slice``: rows of the global batch this process feeds (None =
    single-process, feed everything).  ``barrier(name)``: optional
    coordination-service rendezvous called before the first Gloo-backed
    collective and again after jit compilation — on a contended host the
    per-process model-build/compile skew can exceed Gloo's fixed 30 s
    context-init deadline, so the workers sync on the (long-timeout)
    coordination service first.
    """
    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.engine.optim import build_optimizer
    from yolov5_obb_tpu.engine.trainer import (
        create_train_state,
        make_train_step,
        put_batch,
        put_state,
    )
    from yolov5_obb_tpu.models.yolo import create_model

    nc = 2
    model, variables, meta = create_model("yolov5n.yaml", nc=nc, imgsz=64)
    loss_fn = ComputeLoss(meta)
    hyp = {"lr0": 0.01, "warmup_epochs": 0.0}
    tx, _ = build_optimizer(
        variables["params"], hyp, epochs=5, steps_per_epoch=5, batch_size=64)

    img, targets, mask = fixed_batch()
    if local_slice is not None:
        img, targets, mask = (
            img[local_slice], targets[local_slice], mask[local_slice])

    class _B:
        pass

    batch = _B()
    batch.image, batch.targets, batch.target_mask = img, targets, mask

    if barrier is not None:
        barrier("pre_first_collective")
    state = put_state(create_train_state(variables, tx), mesh)
    step = make_train_step(model, loss_fn, tx, mesh=mesh)
    dev = put_batch(batch, mesh)
    # Pay the minutes-long XLA compile BEFORE the rendezvous (no
    # collectives run during compilation). lower().compile() does not
    # seed step's jit dispatch cache, but it DOES populate the
    # persistent compilation cache (JAX_COMPILATION_CACHE_DIR, set by
    # the test), so the post-barrier first `step` call re-traces and
    # loads the cached executable in milliseconds — both processes then
    # reach the first collective well inside Gloo's 30 s window. (The
    # AOT executable itself is deliberately NOT invoked in the loop:
    # executables pin exact input avals, and the donated TrainState's
    # avals are not stable across steps.)
    step.lower(state, *dev).compile()
    if barrier is not None:
        barrier("post_compile")
    losses = []
    for _ in range(n_steps):
        dev = put_batch(batch, mesh)
        state, m = step(state, *dev)
        losses.append(float(m["loss"]))
    return losses


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    from yolov5_obb_tpu.engine.distributed import (
        broadcast_scalar,
        is_main,
        local_batch_size,
        maybe_initialize,
    )
    from yolov5_obb_tpu.engine.trainer import make_mesh

    assert maybe_initialize()
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc  # 1 virtual CPU device per process
    assert local_batch_size(4) == 4 // nproc
    assert is_main() == (pid == 0)

    def barrier(name, _timeout_ms=600_000):
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        if client is not None:
            client.wait_at_barrier(name, _timeout_ms)

    mesh = make_mesh(nproc)
    # strided slice, matching data/loader.py shard semantics
    losses = run_steps(mesh, local_slice=np.s_[pid::nproc], barrier=barrier)

    # replicated-control-flow broadcast must agree everywhere
    assert broadcast_scalar(float(pid == 0) * 7.0) == 7.0

    if is_main():
        with open(out, "w") as f:
            json.dump(losses, f)
    print(f"proc {pid} OK {losses}", flush=True)


if __name__ == "__main__":
    main()
