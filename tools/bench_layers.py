#!/usr/bin/env python
"""Per-layer forward cost on TPU: time model prefixes (layers 0..k) and
difference consecutive measurements — the constant dev-tunnel RTT cancels
in the deltas.

The fwd pass is HBM-bytes-bound at ~XLA's own roofline
(tools/bench_fwd_decomp.py), so this ranks layers by the bytes they
actually cost, to target Pallas/layout work.

Usage: python tools/bench_layers.py            # yolov5m @1024 b16
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.yolo import (
        YoloModel,
        create_model,
        load_config,
        parse_model_config,
    )

    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(
            rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(xs)

    d = load_config("yolov5m.yaml")
    d["nc"] = 15
    specs, nc_, na, anc, _ = parse_model_config(d)
    n_total = len(specs)

    def section(n_layers):
        sub = YoloModel(specs=tuple(specs[:n_layers]), nc=nc_, na=na,
                        dtype=jnp.bfloat16)
        keep = {k: v for k, v in variables["params"].items()
                if int(k[1:].split("_")[0]) < n_layers}
        keep_s = {k: v for k, v in variables["batch_stats"].items()
                  if int(k[1:].split("_")[0]) < n_layers}
        sub_vars = {"params": keep, "batch_stats": keep_s}

        def f(v, x):
            out = sub.apply(v, x.astype(jnp.float32) / 255.0, train=False)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return f, sub_vars

    def measure(n_layers):
        f, v = section(n_layers)
        t0 = time.perf_counter()
        c = jax.jit(f).lower(v, xs[0]).compile()
        ct = time.perf_counter() - t0
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        ca = ca or {}
        float(c(v, xs[0]))
        float(c(v, xs[1]))
        iters = 8
        t0 = time.perf_counter()
        for i in range(iters):
            float(c(v, xs[i % 2]))
        ms = (time.perf_counter() - t0) / iters * 1000.0 / BATCH
        return ms, float(ca.get("bytes accessed", 0)), ct

    rows = []
    prev_ms, prev_by = 0.0, 0.0
    for k in range(1, n_total):  # skip the Detect layer (covered elsewhere)
        spec = specs[k - 1]
        ms, by, ct = measure(k)
        d_ms, d_by = ms - prev_ms, (by - prev_by) / 1e9
        rows.append({"k": k - 1, "layer": f"{spec.name}{tuple(spec.args)}",
                     "cum_ms": round(ms, 3), "d_ms": round(d_ms, 3),
                     "d_gbytes": round(d_by, 2)})
        print(f"layer {k-1:2d} {spec.name:12s} cum={ms:7.3f} ms/img  "
              f"Δ={d_ms:+7.3f}  Δbytes={d_by:6.2f}GB  [compile {ct:.0f}s]",
              flush=True)
        prev_ms, prev_by = ms, by
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
