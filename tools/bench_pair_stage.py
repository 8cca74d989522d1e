#!/usr/bin/env python
"""Decompose the sparse-IoU pair stage: XLA pair gather vs Pallas kernel math.

  A gather+repeat only (materialize pair_a, pair_b)
  B Pallas kernel on PRE-gathered pairs (kernel math only)
  C full sparse_rotated_iou (gather + kernel)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B, K, M = 16, 2048, 64


def timeit(fn, args_list, iters=8):
    float(fn(*args_list[0]))
    float(fn(*args_list[1 % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % len(args_list)]))
    return (time.perf_counter() - t0) / iters * 1000.0 / B


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.iou_kernel import pairs_rotated_iou, sparse_rotated_iou

    inputs = []
    for sd in (0, 1):
        rng = np.random.default_rng(sd)
        boxes = np.stack([rng.uniform(0, 1024, (B, K)), rng.uniform(0, 1024, (B, K)),
                          rng.uniform(8, 120, (B, K)), rng.uniform(4, 60, (B, K)),
                          rng.uniform(-1.5, 1.5, (B, K))], -1).astype(np.float32)
        nbr = rng.integers(0, K, (B, K, M)).astype(np.int32)
        inputs.append((jax.device_put(boxes), jax.device_put(nbr)))
    jax.block_until_ready(inputs)

    @jax.jit
    def gather_only(boxes, nbr):
        def one(b, ni):
            pa = jnp.repeat(b, M, axis=0)
            pb = b[ni.reshape(-1)]
            return jnp.sum(pa) + jnp.sum(pb)
        return jnp.sum(jax.vmap(one)(boxes, nbr))

    ms_a = timeit(gather_only, inputs)
    print(f"A gather+repeat:   {ms_a:.3f} ms/img")

    pre = []
    for boxes, nbr in inputs:
        def mk(b, ni):
            return jnp.repeat(b, M, axis=0), b[ni.reshape(-1)]
        pa, pb = jax.jit(jax.vmap(mk))(boxes, nbr)
        pre.append((pa.reshape(-1, 5), pb.reshape(-1, 5)))
    jax.block_until_ready(pre)

    @jax.jit
    def kernel_only(pa, pb):
        return jnp.sum(pairs_rotated_iou(pa, pb))

    ms_b = timeit(kernel_only, pre)
    print(f"B kernel math:     {ms_b:.3f} ms/img")

    @jax.jit
    def full(boxes, nbr):
        return jnp.sum(jax.vmap(sparse_rotated_iou)(boxes, nbr))

    ms_c = timeit(full, inputs)
    print(f"C gather+kernel:   {ms_c:.3f} ms/img")
    print(json.dumps({"gather": round(ms_a, 3), "kernel": round(ms_b, 3),
                      "full": round(ms_c, 3)}))


if __name__ == "__main__":
    main()
