#!/usr/bin/env python
"""Forward-path section timing + approx_max_k recall A/B.

Sections: stem (layers 0-1), backbone (0-9), full model. Differences
locate the conv-time concentration. Also times the NMS candidate top-k at
recall_target 0.95 (default) vs 0.85.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 16
IMGSZ = 1024


def timeit(fn, args_list, iters=8):
    float(fn(*args_list[0]))
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / BATCH


def main():
    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict

    from yolov5_obb_tpu.models.yolo import YoloModel, build_model, create_model

    model, variables, meta = create_model(
        "yolov5m.yaml", nc=15, dtype=jnp.bfloat16, imgsz=IMGSZ
    )
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(xs)

    _, _, d = build_model("yolov5m.yaml", nc=15)

    def section(n_layers, label):
        from yolov5_obb_tpu.models.yolo import parse_model_config

        specs, nc_, na, anc, _ = parse_model_config(d)
        sub = YoloModel(specs=tuple(specs[:n_layers]), nc=nc_, na=na,
                        dtype=jnp.bfloat16)

        # reuse the full model's params for the first n layers
        keep = {k: v for k, v in variables["params"].items()
                if int(k[1:].split("_")[0]) < n_layers}
        keep_s = {k: v for k, v in variables["batch_stats"].items()
                  if int(k[1:].split("_")[0]) < n_layers}
        sub_vars = {"params": keep, "batch_stats": keep_s}

        @jax.jit
        def f(v, x):
            out = sub.apply(v, x.astype(jnp.float32) / 255.0, train=False)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        ms = timeit(f, [(sub_vars, x) for x in xs])
        print(f"{label}: {ms:.3f} ms/img")
        return ms

    ms_stem = section(2, "stem  (layers 0-1)")
    ms_bb = section(10, "backbone (0-9)   ")

    @jax.jit
    def full(v, x):
        maps = model.apply(v, x.astype(jnp.float32) / 255.0, train=False)
        return sum(jnp.sum(m) for m in maps)

    ms_full = timeit(full, [(variables, x) for x in xs])
    print(f"full fwd          : {ms_full:.3f} ms/img")

    # --- approx_max_k recall A/B on a (2048, 2048) bf16 matrix -------------
    cands = [
        jax.device_put(rng.random((BATCH, 2048, 2048), np.float32).astype(np.dtype("bfloat16" if hasattr(np, "bfloat16") else "float32")))
        for _ in range(2)
    ]
    cands = [jnp.asarray(c, jnp.bfloat16) for c in cands]
    jax.block_until_ready(cands)

    @jax.jit
    def topk95(c):
        v, i = jax.vmap(lambda r: jax.lax.approx_max_k(r, 64))(c)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(i)

    @jax.jit
    def topk85(c):
        v, i = jax.vmap(lambda r: jax.lax.approx_max_k(r, 64, recall_target=0.85))(c)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(i)

    ms95 = timeit(topk95, [(c,) for c in cands])
    ms85 = timeit(topk85, [(c,) for c in cands])
    print(f"approx_max_k r=.95: {ms95:.3f} ms/img   r=.85: {ms85:.3f} ms/img")

    print(json.dumps({"stem": round(ms_stem, 3), "backbone": round(ms_bb, 3),
                      "full": round(ms_full, 3), "topk95": round(ms95, 3),
                      "topk85": round(ms85, 3)}))


if __name__ == "__main__":
    main()
