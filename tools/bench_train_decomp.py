#!/usr/bin/env python
"""Train-step decomposition: where do the ~172 ms/batch (b16@1024) go?

Stages (each its own jit compile; run on TPU):
  full           the real train step (baseline: bench_train.py)
  sumloss        loss replaced by sum-of-maps -> model fwd+bwd + optimizer
                 only (no assignment / gather / BCE terms)
  noema          full step without the EMA update
  lossgrad       grad of ComputeLoss wrt the detect maps, maps precomputed
                 (assignment + 4 terms + their backward, incl. the
                 take_along_axis gather and its scatter-add transpose)
  lossgrad_noga  same but the candidate gather replaced by a static slice
                 (wrong values, same arithmetic) -> isolates gather/scatter

Usage: python tools/bench_train_decomp.py [stage ...]  (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = 1024
MAX_LABELS = 64


def make_batches(rng):
    import jax

    out = []
    for _ in range(2):
        img = rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8)
        tg = np.zeros((BATCH, MAX_LABELS, 186), np.float32)
        tg[:, :8, 0] = rng.integers(0, 15, (BATCH, 8))
        tg[:, :8, 1:3] = rng.uniform(100, 900, (BATCH, 8, 2))
        tg[:, :8, 3:5] = rng.uniform(20, 120, (BATCH, 8, 2))
        tg[:, :8, 5] = rng.uniform(-1.5, 1.5, (BATCH, 8))
        tg[:, :8, 6:] = rng.uniform(0, 1, (BATCH, 8, 180))
        mask = np.zeros((BATCH, MAX_LABELS), bool)
        mask[:, :8] = True
        out.append(tuple(map(jax.device_put, (img, tg, mask))))
    jax.block_until_ready(out)
    return out


def time_step(fn, state, batches, iters=12, sync_every=4):
    state, m = fn(state, *batches[0])
    float(m["loss"])
    state, m = fn(state, *batches[1])
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = fn(state, *batches[i % 2])
        if (i + 1) % sync_every == 0:
            float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1000.0, state


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.engine.optim import build_optimizer
    from yolov5_obb_tpu.engine.trainer import create_train_state, make_train_step
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.general import load_hyp, scale_hyp_gains

    stages = sys.argv[1:] or ["full", "sumloss", "noema", "fwdtrain",
                              "nofeed", "lossgrad", "lossgrad_noga"]

    hyp = load_hyp(None)
    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    loss_fn = ComputeLoss(meta, scale_hyp_gains(hyp, meta.nl, meta.nc, IMGSZ))
    tx, _ = build_optimizer(
        variables["params"], hyp, epochs=10, steps_per_epoch=100,
        batch_size=BATCH, nominal_batch=BATCH,
    )
    # host snapshot: each stage's step donates its state, so stage N+1 must
    # not reuse stage N's (invalidated) device buffers
    host_vars = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(0)
    batches = make_batches(rng)
    results = {}

    def fresh_vars():
        return jax.tree.map(jnp.asarray, host_vars)

    def fresh_state():
        return create_train_state(fresh_vars(), tx)

    if "full" in stages:
        fn = make_train_step(model, loss_fn, tx)
        results["full"], _ = time_step(fn, fresh_state(), batches)

    if "sumloss" in stages:
        def sum_loss(maps, targets, t_mask):
            tot = sum(jnp.sum(m.astype(jnp.float32)) for m in maps) * 1e-9
            return tot, jnp.zeros(4)
        fn = make_train_step(model, sum_loss, tx)
        results["sumloss"], _ = time_step(fn, fresh_state(), batches)

    if "noema" in stages:
        fn = make_train_step(model, loss_fn, tx, use_ema=False)
        results["noema"], _ = time_step(fn, fresh_state(), batches)

    if "fwdtrain" in stages:
        # forward in train mode only (no grad / no optimizer): splits the
        # model cost into fwd vs bwd+opt
        @jax.jit
        def fwd_only(params, bstats, image):
            x = image.astype(jnp.float32) / 255.0
            outs, _ = model.apply(
                {"params": params, "batch_stats": bstats},
                x, train=True, flat=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        v = fresh_vars()
        float(fwd_only(v["params"], v["batch_stats"], batches[0][0]))
        float(fwd_only(v["params"], v["batch_stats"], batches[1][0]))
        t0 = time.perf_counter()
        it = 12
        for i in range(it):
            s = fwd_only(v["params"], v["batch_stats"], batches[i % 2][0])
            if (i + 1) % 4 == 0:
                float(s)
        results["fwdtrain"] = (time.perf_counter() - t0) / it * 1000.0

    if "nofeed" in stages:
        # image synthesized on-device from the step counter: removes the fed
        # (B,H,W,3) u8 buffer (lane-padded 3->128, ~2.1 GB stored) entirely.
        # full - nofeed bounds the whole image-feed tax.
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_nofeed(state, targets, t_mask):
                img = jnp.broadcast_to(
                    (state.step % 255).astype(jnp.uint8),
                    (BATCH, IMGSZ, IMGSZ, 3))
                x = img.astype(jnp.float32) / 255.0

                def loss_of(params):
                    outs, updates = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        x, train=True, flat=True, mutable=["batch_stats"])
                    total, items = loss_fn(outs, targets, t_mask)
                    return total, (items, updates["batch_stats"])

                (total, (items, new_stats)), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(state.params)
                updates, new_opt = tx.update(
                    grads, state.opt_state, state.params)
                new_params = jax.tree.map(
                    lambda p, u: p + u, state.params, updates)
                from yolov5_obb_tpu.engine.optim import ema_update
                new_ema = ema_update(
                    state.ema_params, new_params, state.ema_updates + 1)
                return state.replace(
                    params=new_params, batch_stats=new_stats,
                    opt_state=new_opt, ema_params=new_ema,
                    ema_updates=state.ema_updates + 1,
                    step=state.step + 1), {"loss": total, "items": items}

        st = fresh_state()
        tg, mk = batches[0][1], batches[0][2]
        st, m = step_nofeed(st, tg, mk)
        float(m["loss"])
        st, m = step_nofeed(st, tg, mk)
        float(m["loss"])
        t0 = time.perf_counter()
        it = 12
        for i in range(it):
            st, m = step_nofeed(st, tg, mk)
            if (i + 1) % 4 == 0:
                float(m["loss"])
        results["nofeed"] = (time.perf_counter() - t0) / it * 1000.0

    if "lossgrad" in stages or "lossgrad_noga" in stages:
        # precompute flat maps once, time the loss fwd+bwd alone
        @jax.jit
        def get_maps(params, image):
            x = image.astype(jnp.float32) / 255.0
            outs, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, flat=True, mutable=["batch_stats"])
            return outs
        maps = get_maps(variables["params"], batches[0][0])
        maps = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), maps)
        jax.block_until_ready(maps)
        tg, mk = batches[0][1], batches[0][2]

        def run_loss_variant(tag, loss_callable):
            @jax.jit
            def lstep(mp):
                g = jax.grad(
                    lambda mp_: loss_callable(mp_, tg, mk)[0])(mp)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in g)
            float(lstep(maps))  # compile
            t0 = time.perf_counter()
            it = 10
            for _ in range(it):
                v = lstep(maps)
            float(v)
            results[tag] = (time.perf_counter() - t0) / it * 1000.0

        if "lossgrad" in stages:
            run_loss_variant("lossgrad", loss_fn)

        if "lossgrad_noga" in stages:
            import yolov5_obb_tpu.engine.loss as L

            def loss_noga(maps_, targets_, mask_):
                # static slice stand-in: same shapes/arithmetic, no gather
                # (the loss gathers rows via a vmapped jnp.take — patch it)
                orig = jnp.take
                try:
                    L.jnp.take = (
                        lambda p_, i_, axis=0: p_[: i_.shape[0]])
                    return L._compute_loss_impl.__wrapped__(
                        tuple(maps_), targets_, mask_, loss_fn.anchors_grid,
                        loss_fn.nc, loss_fn.strides, loss_fn.hyp_static)
                finally:
                    L.jnp.take = orig
            run_loss_variant("lossgrad_noga", loss_noga)

    per_img = {k: round(v / BATCH, 3) for k, v in results.items()}
    print(json.dumps({
        "batch": BATCH,
        "ms_per_batch": {k: round(v, 2) for k, v in results.items()},
        "ms_per_img": per_img,
    }))


if __name__ == "__main__":
    main()
