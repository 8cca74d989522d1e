#!/usr/bin/env python
"""Training CLI (reference train.py redesigned for TPU/pjit).

Usage:
    python train.py --data yolov5_obb_tpu/data/configs/dotav1.yaml \
        --cfg yolov5m.yaml --imgsz 1024 --batch-size 16 --epochs 300 \
        --workers 8

Data parallelism: the global batch is sharded over all visible devices via a
1-D ``data`` mesh (no DDP launcher, no NCCL — XLA inserts the grad
all-reduce).  Checkpoints are Orbax trees under runs/train/exp*/.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import jax
import numpy as np

from yolov5_obb_tpu.data.dota import DotaDataset
from yolov5_obb_tpu.data.loader import create_dataloader
from yolov5_obb_tpu.engine.evaluator import evaluate
from yolov5_obb_tpu.engine.loss import ComputeLoss
from yolov5_obb_tpu.engine.optim import build_optimizer
from yolov5_obb_tpu.engine.trainer import (
    create_train_state,
    make_mesh,
    make_train_step,
    put_batch,
    put_state,
)
from yolov5_obb_tpu.models.yolo import create_model
from yolov5_obb_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    save_weights,
)
from yolov5_obb_tpu.utils.general import (
    increment_path,
    init_seeds,
    load_dataset_config,
    load_hyp,
    scale_hyp_gains,
)
from yolov5_obb_tpu.utils.metrics import fitness


def parse_opt(args=None, known: bool = False):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default="yolov5n.yaml")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--hyp", type=str, default=None)
    p.add_argument("--weights", type=str, default="", help="initial weights (orbax dir)")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16, help="global batch size")
    p.add_argument("--nominal-batch", type=int, default=64,
                   help="gradient-accumulation target batch (reference nbs=64)")
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--max-labels", type=int, default=500)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noval", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--noautoanchor", action="store_true",
                   help="skip the anchor-fit check / k-means evolution")
    p.add_argument("--single-cls", action="store_true",
                   help="train as a single-class dataset")
    p.add_argument("--label-smoothing", type=float, default=None,
                   help="cls BCE label smoothing epsilon (overrides hyp)")
    p.add_argument("--cache", type=str, default=None,
                   choices=["ram", "disk", "shards"],
                   help="ram/disk: cache resized images (reference --cache);"
                        " shards: pre-augment into memory-mapped shards and"
                        " replay at memory bandwidth (one-core hosts)")
    p.add_argument("--aug-epochs", type=int, default=4,
                   help="--cache shards: pre-augmented variants per sample")
    p.add_argument("--packed-stem", dest="packed_stem", default=None,
                   action="store_true",
                   help="train with the packed-view Pallas stem kernels "
                        "(default: auto — on for TPU backends)")
    p.add_argument("--no-packed-stem", dest="packed_stem",
                   action="store_false")
    p.add_argument("--bn-half", dest="bn_half", default=None,
                   action="store_true",
                   help="bfloat16 BatchNorm-normalize/SiLU elementwise math"
                        " on the train path (batch stats stay f32); +8.6%%"
                        " step throughput on TPU (default: auto — on for"
                        " TPU backends)")
    p.add_argument("--no-bn-half", dest="bn_half", action="store_false")
    p.add_argument("--fused-train", dest="fused_train", default=None,
                   action="store_true",
                   help="stat-carrying fused Pallas train passes for the "
                        "high-resolution prefix (stem→down1→C3→down2). "
                        "Default OFF: measured e2e-neutral-to-slightly-"
                        "slower than stock XLA on v5e (94.73 vs 95.47 "
                        "img/s, BENCH r5 FUSED×BN_HALF matrix) — the "
                        "Pallas forwards win isolated but the XLA-routed "
                        "backwards give the win back; kept for A/B and "
                        "future backward work")
    p.add_argument("--no-fused-train", dest="fused_train",
                   action="store_false")
    p.add_argument("--dense-loss", action="store_true",
                   help="scatter-free-backward loss formulation (r5): "
                        "target data scattered to the grid under "
                        "stop_gradient, box/cls/theta computed densely — "
                        "kills the backward scatter-add, whose cost scales "
                        "with --max-labels. Measured v5e b16@1024: "
                        "91.46 vs 85.57 img/s (+6.9%) at the DOTA default "
                        "--max-labels 500; 93.6 vs 95.5 (-2%) at 64. "
                        "Semantics equal to the reference gather path "
                        "except when two targets claim the same "
                        "(cell,anchor) candidate (one wins instead of "
                        "both contributing); opt-in for that reason")
    p.add_argument("--val-images", type=int, default=None, help="cap val set size during training")
    p.add_argument("--save-period", type=int, default=-1)
    p.add_argument("--patience", type=int, default=100, help="early-stop patience (epochs)")
    p.add_argument("--linear-lr", action="store_true")
    p.add_argument("--image-weights", action="store_true",
                   help="weighted image sampling by inverse class frequency")
    p.add_argument("--adam", action="store_true")
    p.add_argument("--freeze", type=int, default=0,
                   help="freeze the first N graph layers")
    p.add_argument("--remat", nargs="?", const="full", default="",
                   choices=["", "full", "selective"],
                   help="activation rematerialisation: 'full' (larger "
                        "batches, ~30%% slower) or 'selective' (save only "
                        "bf16 conv outputs — faster AND smaller on TPU)")
    p.add_argument("--resume", type=str, default="", help="checkpoint dir to resume from")
    p.add_argument("--wandb", action="store_true",
                   help="enable W&B logging (also auto-enabled by WANDB_API_KEY)")
    p.add_argument("--evolve", type=int, default=0, help="hyp-evolution generations")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--project", type=str, default="runs/train")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    # known=True: tolerate extra argv (the W&B sweep agent appends
    # --key=value pairs; tools/sweep.py maps them via wandb.config instead)
    return p.parse_known_args(args)[0] if known else p.parse_args(args)


def run(opt, hyp_override: dict | None = None, callbacks=None):
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.distributed import (
        broadcast_scalar,
        is_main,
        maybe_initialize,
    )

    # multi-host: join the process group BEFORE any device use (the
    # reference's dist.init_process_group, train.py:519-526)
    maybe_initialize()
    main = is_main()

    if callbacks is None:
        from yolov5_obb_tpu.utils.callbacks import Callbacks

        callbacks = Callbacks()
    callbacks.run("on_pretrain_routine_start")
    init_seeds(opt.seed)
    d = load_dataset_config(opt.data)
    hyp = hyp_override or load_hyp(opt.hyp)
    if getattr(opt, "label_smoothing", None) is not None:
        hyp["label_smoothing"] = float(opt.label_smoothing)
    single_cls = bool(getattr(opt, "single_cls", False))
    # --single-cls: annotations are parsed with the dataset's real class names
    # (the DotaDataset zeroes the class ids) but the model/metrics see one
    # class (reference train.py: nc=1, names=['item'])
    nc = 1 if single_cls else d["nc"]
    names = ["item"] if single_cls and len(d["names"]) != 1 else d["names"]
    save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok)
    print(f"run dir: {save_dir}; devices: {jax.devices()}")

    # --- data ---------------------------------------------------------
    cache_images = getattr(opt, "cache", None)
    use_shards = cache_images == "shards"
    train_ds = DotaDataset(
        d["train"], d["names"], img_size=opt.imgsz, hyp=hyp, augment=True,
        max_labels=opt.max_labels, cache_dir=save_dir / "cache",
        single_cls=single_cls,
        cache_images=None if use_shards else cache_images,
    )
    shard_ds = None
    if use_shards:
        from yolov5_obb_tpu.data.shards import ShardDataset, write_shards

        sdir = Path(save_dir) / "cache" / "shards"
        if not (sdir / "meta.json").exists():
            print("building pre-augmented shard cache "
                  f"({getattr(opt, 'aug_epochs', 4)} variants/sample)...")
            write_shards(train_ds, sdir,
                         aug_epochs=getattr(opt, "aug_epochs", 4),
                         seed=opt.seed)
        shard_ds = ShardDataset(sdir)
    val_ds = None
    if not opt.noval and d.get("val"):
        val_ds = DotaDataset(
            d["val"], d["names"], img_size=opt.imgsz, hyp=hyp, augment=False,
            max_labels=1000, cache_dir=save_dir / "cache",
            single_cls=single_cls,
            cache_images=None if use_shards else cache_images,
        )
    steps_per_epoch = max(len(train_ds) // opt.batch_size, 1)

    # label-distribution snapshot at train start (reference train.py:222-241
    # plot_labels → labels.jpg); host-0 only, like all filesystem artifacts
    try:
        from yolov5_obb_tpu.ops.geometry import poly2rbox
        from yolov5_obb_tpu.utils.plots import plot_labels

        all_polys = [p for p in train_ds.polys if len(p)] if main else []
        if all_polys:
            rb = poly2rbox(np.concatenate(all_polys).astype(np.float64))
            plot_labels(rb, np.concatenate([c for c in train_ds.cls if len(c)]),
                        names, save_dir)
    except Exception as e:
        print(f"plot_labels failed: {e}")

    # --- model / loss / optimizer -------------------------------------
    dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
    # packed stem (TPU): train-mode Pallas stem kernel reads the image from
    # the unpadded (B, H, W*3) u8 view instead of paying the NHWC C=3
    # lane-pad (3→128) in fwd AND wgrad; default on for TPU backends
    packed = getattr(opt, "packed_stem", None)
    if packed is None:
        packed = jax.default_backend() == "tpu"
    # bf16 BN/SiLU elementwise math (stats stay f32) — +8.6% train
    # throughput on TPU (tools/bench_train.py A/B); see layers._bn_dtype
    bn_half = getattr(opt, "bn_half", None)
    if bn_half is None:
        bn_half = jax.default_backend() == "tpu"
    if bn_half:
        os.environ["YOLO_BN_HALF"] = "1"
    # fused train region (TPU): layers 0-3 as stat-carrying Pallas passes.
    # Opt-in only: the r5 hardware matrix measured it e2e-slower than
    # stock XLA (94.73 vs 95.47 img/s FUSED=1/0 at BN_HALF=1) — the XLA
    # backward re-reads cost more than the forward fusion saves
    fused_train = getattr(opt, "fused_train", None)
    if fused_train is None:
        fused_train = False
    fused_train = fused_train and packed
    model, variables, meta = create_model(
        opt.cfg, nc=nc, dtype=dtype, rng=jax.random.PRNGKey(opt.seed),
        imgsz=opt.imgsz, packed_stem=packed, fused_train=fused_train,
    )
    if opt.weights:
        from yolov5_obb_tpu.utils.checkpoint import load_weights

        loaded, _ = load_weights(opt.weights)
        variables = loaded

    # anchor-fit check + k-means/GA evolution (reference train.py:241,
    # autoanchor.py:30-80). Anchors live in meta (not params), so an update
    # flows into both the loss assignment and the decode without re-init.
    if not getattr(opt, "noautoanchor", False) and not opt.resume:
        from yolov5_obb_tpu.utils.autoanchor import check_anchors

        try:
            meta.anchors_px = check_anchors(
                train_ds, meta, thr=hyp.get("anchor_t", 4.0), imgsz=opt.imgsz
            )
        except Exception as e:
            print(f"autoanchor check failed (continuing with config anchors): {e}")
    elif opt.resume:
        # restore evolved anchors from the checkpoint BEFORE the loss/step
        # fns capture meta — otherwise a resumed run silently reverts to
        # config anchors mid-training
        import json as _json

        mp = Path(opt.resume) / "meta.json"
        if mp.exists():
            from yolov5_obb_tpu.utils.checkpoint import restore_model_meta

            restore_model_meta(meta, _json.loads(mp.read_text()))

    hyp_scaled = scale_hyp_gains(hyp, meta.nl, meta.nc, opt.imgsz)
    loss_fn = ComputeLoss(meta, hyp_scaled,
                          dense=True if getattr(opt, "dense_loss", False)
                          else None)  # None → YOLO_DENSE_LOSS env / off
    tx, opt_info = build_optimizer(
        variables["params"], hyp, epochs=opt.epochs,
        steps_per_epoch=steps_per_epoch, batch_size=opt.batch_size,
        nominal_batch=opt.nominal_batch,
        linear_lr=opt.linear_lr, use_adam=opt.adam,
        freeze=getattr(opt, "freeze", 0),
    )
    print(
        f"optimizer: {'adam' if opt.adam else 'sgd'} accumulate={opt_info['accumulate']} "
        f"wd={opt_info['weight_decay']:.5f} steps/epoch={steps_per_epoch}"
    )

    import math

    n_proc = jax.process_count()
    if n_proc > 1:
        # multi-host: every process's devices must participate (the global
        # batch assembles from per-process slices in put_batch)
        if opt.batch_size % len(jax.devices()):
            raise SystemExit(
                f"multi-host run: batch {opt.batch_size} must be divisible "
                f"by the {len(jax.devices())} global devices")
        n_dev = len(jax.devices())
    else:
        n_dev = math.gcd(opt.batch_size, len(jax.devices()))
        if n_dev < len(jax.devices()):
            print(
                f"note: using {n_dev}/{len(jax.devices())} devices "
                f"(batch {opt.batch_size} must divide across the data mesh)"
            )
    mesh = make_mesh(n_dev)
    state = create_train_state(variables, tx)
    start_epoch = 0
    best_fit = -1.0
    if opt.resume:
        state, ckpt_meta = restore_checkpoint(opt.resume, state)
        start_epoch = int(ckpt_meta.get("epoch", 0)) + 1
        best_fit = float(ckpt_meta.get("best_fitness", -1.0))
        print(f"resumed from {opt.resume} at epoch {start_epoch}")
    state = put_state(state, mesh)
    step_fn = make_train_step(
        model, loss_fn, tx, mesh=mesh, remat=getattr(opt, "remat", False)
    )

    # --- loop ----------------------------------------------------------
    from yolov5_obb_tpu.data.tools import (
        labels_to_class_weights,
        labels_to_image_weights,
    )
    from yolov5_obb_tpu.utils.loggers import Loggers

    # wandb is opt-in (flag or API key in env) — wandb.init with the package
    # installed but no login would hang training on an interactive prompt
    use_wandb = getattr(opt, "wandb", False) or bool(os.environ.get("WANDB_API_KEY"))
    include = ("csv", "tb", "wandb") if use_wandb else ("csv", "tb")
    # host-0 only (the reference's rank-gated Loggers, train.py:86-95)
    loggers = Loggers(save_dir, include=include if main else (), hyp=hyp, opt=opt)
    loggers.log_dataset_artifact(opt.data)
    class_weights = (
        labels_to_class_weights(train_ds.cls, meta.nc) if opt.image_weights else None
    )
    iw_rng = np.random.default_rng(opt.seed + 99)

    callbacks.run("on_pretrain_routine_end")
    callbacks.run("on_train_start")
    patience_left = opt.patience
    final_metrics = None  # metrics of the best-fitness epoch (evolve logging)
    for epoch in range(start_epoch, opt.epochs):
        callbacks.run("on_train_epoch_start")
        t0 = time.time()
        indices = None
        if opt.image_weights:
            iw = labels_to_image_weights(train_ds.cls, meta.nc, class_weights)
            indices = iw_rng.choice(len(train_ds), size=len(train_ds), p=iw)
        # multi-host: each process loads its strided slice of the epoch at
        # batch_size/n_proc; put_batch assembles the global batch on the mesh
        if shard_ds is not None:
            # one epoch = a fresh pre-augmented variant of each source image
            # (composes with image-weighted resampling), already shuffled
            indices = shard_ds.epoch_indices(epoch, seed=opt.seed,
                                             source_indices=indices)
        loader = create_dataloader(
            shard_ds if shard_ds is not None else train_ds,
            opt.batch_size // n_proc,
            shuffle=shard_ds is None, augment=True,
            seed=opt.seed + epoch, num_workers=opt.workers, num_epochs=1,
            indices=indices,
            shard_index=jax.process_index(), shard_count=n_proc,
        )
        # loss items accumulate ON DEVICE — pulling them to host every step
        # would sync the dispatch pipeline (one tunnel RTT per step here;
        # lost overlap everywhere). Host sees them only at log points.
        mloss_dev = None
        nb = 0
        for batch in loader:
            if main and epoch == start_epoch and nb == 0:
                try:  # reference train_batch0.jpg mosaic (plots.py:221)
                    from yolov5_obb_tpu.utils.plots import plot_images

                    plot_images(batch.image, batch.targets, batch.target_mask,
                                names, save_dir / "train_batch0.png")
                except Exception as e:
                    print(f"train-batch plot failed: {e}")
            dev = put_batch(batch, mesh, packed=model.packed_stem)
            state, m = step_fn(state, *dev)
            mloss_dev = m["items"] if mloss_dev is None else mloss_dev + m["items"]
            nb += 1
            callbacks.run("on_train_batch_end", epoch=epoch, step=nb)
            if nb % opt.log_interval == 0:
                cur = np.asarray(mloss_dev, dtype=np.float64) / nb
                print(
                    f"epoch {epoch} step {nb}/{steps_per_epoch} "
                    f"box {cur[0]:.4f} obj {cur[1]:.4f} cls {cur[2]:.4f} "
                    f"theta {cur[3]:.4f}"
                )
        mloss = (
            np.asarray(mloss_dev, dtype=np.float64) / nb
            if mloss_dev is not None else np.zeros(4)
        )

        callbacks.run("on_train_epoch_end", epoch=epoch)

        # validation with EMA weights — host 0 only (local, unsharded jit);
        # the fitness scalar is broadcast so every process takes the same
        # early-stop/best-checkpoint branches (replicated control flow)
        metrics = {"mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0}
        if val_ds is not None and main:
            callbacks.run("on_val_start")
            ema_vars = {"params": state.ema_params, "batch_stats": state.batch_stats}
            metrics = evaluate(
                model, ema_vars, meta, val_ds, batch_size=max(opt.batch_size, 2),
                conf_thres=0.01, iou_thres=0.4, verbose=True,
                max_images=opt.val_images,
            )
            callbacks.run("on_val_end", metrics=metrics)
            # per-epoch W&B val-prediction Table (reference
            # wandb_utils.py:138-252); no-op unless wandb is active
            loggers.log_val_predictions(
                epoch, metrics.get("detections", ()), val_ds.names)
        fit = fitness(metrics["mp"], metrics["mr"], metrics["map50"], metrics["map"])
        if n_proc > 1:
            fit = broadcast_scalar(fit)
        callbacks.run("on_fit_epoch_end", epoch=epoch, fitness=fit, metrics=metrics)
        if fit >= best_fit or final_metrics is None:
            final_metrics = dict(metrics)

        lr_now = float(opt_info["lr_fn"](int(state.step)))
        loggers.log_epoch(
            epoch,
            {
                "train/box_loss": mloss[0], "train/obj_loss": mloss[1],
                "train/cls_loss": mloss[2], "train/theta_loss": mloss[3],
                "metrics/precision": metrics["mp"], "metrics/recall": metrics["mr"],
                "metrics/HBBmAP.5": metrics["map50"],
                "metrics/HBBmAP.5:.95": metrics["map"],
                "fitness": fit, "x/lr0": lr_now,
            },
        )
        print(
            f"epoch {epoch}/{opt.epochs - 1} done in {time.time()-t0:.1f}s  "
            f"loss(box,obj,cls,theta)={np.round(mloss, 4).tolist()}  "
            f"HBBmAP@.5={metrics['map50']:.4f} fitness={fit:.4f}"
        )

        if not opt.nosave:
            ckpt_meta = {
                "epoch": epoch, "best_fitness": max(best_fit, fit),
                "names": names, "cfg": opt.cfg, "imgsz": opt.imgsz,
                # evolved anchors must travel with the weights (see
                # utils/checkpoint.restore_model_meta)
                "anchors": np.asarray(meta.anchors_px).tolist(),
            }
            if main:
                save_checkpoint(save_dir / "last", state, ckpt_meta)
                # artifact upload only on new-best or at --save-period
                # epochs — per-epoch uploads of the full dir are enormous
                if fit > best_fit or (
                    opt.save_period > 0 and epoch % opt.save_period == 0
                ):
                    loggers.log_model_artifact(save_dir / "last", epoch, fit,
                                               best=fit > best_fit)
            callbacks.run("on_model_save", epoch=epoch, path=save_dir / "last")
            # best/patience state must update identically on every process
            # (fit is broadcast above) — only the file writes are gated
            if fit > best_fit or val_ds is None:
                best_fit = max(best_fit, fit)
                patience_left = opt.patience
                if main:
                    save_weights(
                        save_dir / "best",
                        state.ema_params, state.batch_stats, ckpt_meta,
                    )
            else:
                patience_left -= 1
            if main and opt.save_period > 0 and epoch % opt.save_period == 0:
                save_checkpoint(save_dir / f"epoch{epoch}", state, ckpt_meta)
        if patience_left <= 0:
            print(f"early stopping at epoch {epoch} (patience {opt.patience})")
            break

    callbacks.run("on_train_end", best_fitness=best_fit, save_dir=save_dir)
    loggers.finish()
    try:
        from yolov5_obb_tpu.utils.plots import plot_results

        if main:
            plot_results(save_dir / "results.csv")
    except Exception as e:
        print(f"plot_results failed: {e}")
    print(f"training complete; best fitness {best_fit:.4f}; results in {save_dir}")
    return save_dir, best_fit, (final_metrics or
                                {"mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0})


def evolve(opt):
    """Hyp-evolution driver (reference train.py:536-620)."""
    import numpy as np

    from yolov5_obb_tpu.engine.evolve import log_generation, mutate, read_population

    base_hyp = load_hyp(opt.hyp)
    evolve_dir = increment_path(Path(opt.project) / f"{opt.name}_evolve",
                                exist_ok=opt.exist_ok)
    evolve_csv = evolve_dir / "evolve.csv"
    rng = np.random.default_rng(opt.seed)
    gens = opt.evolve
    opt.evolve = 0
    opt.exist_ok = True
    opt.nosave = True
    for gen in range(gens):
        parents = read_population(evolve_csv)
        hyp = mutate(base_hyp, rng, parents or None)
        opt.name = f"gen{gen}"
        opt.project = str(evolve_dir)
        _, fit, gen_metrics = run(opt, hyp_override=hyp)
        log_generation(evolve_csv, hyp, gen_metrics, fit)
        print(f"evolve gen {gen}: fitness {fit:.4f}")
    try:
        from yolov5_obb_tpu.utils.plots import plot_evolve

        plot_evolve(evolve_csv)
    except Exception as e:
        print(f"evolve plot failed: {e}")
    print(f"evolution complete → {evolve_csv}")


if __name__ == "__main__":
    _opt = parse_opt()
    if _opt.evolve:
        evolve(_opt)
    else:
        run(_opt)
