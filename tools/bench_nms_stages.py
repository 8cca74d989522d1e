#!/usr/bin/env python
"""Granular stage timing inside nms_rotated on fixed candidate tensors.

Stages (cumulative, each vmapped over B):
  S1 hbb cover + masked pair matrix + approx top-M neighbors
  S2 + sparse exact rotated IoU (Pallas on TPU)
  S3 + scatter into dense suppression matrix
  S4 full nms_rotated (presorted)
Differences between consecutive numbers isolate each stage's cost.
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


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(0, 1024, (B, K))
    cy = rng.uniform(0, 1024, (B, K))
    l = rng.uniform(16, 128, (B, K))
    s = l * rng.uniform(0.3, 1.0, (B, K))
    t = rng.uniform(-np.pi / 2, np.pi / 2, (B, K))
    rb = np.stack([cx, cy, l, s, t], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1.0, (B, K)).astype(np.float32))[:, ::-1].copy()
    cls = rng.integers(0, 15, (B, K)).astype(np.int32)
    return rb, scores, cls


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops import rotated_nms as RN

    inputs = [tuple(map(jax.device_put, make_inputs(sd))) for sd in (0, 1)]
    jax.block_until_ready(inputs)

    def neighbors(rb, scores, cls):
        n = scores.shape[0]
        valid = scores > 0
        hiou = RN._hbb_iou_matrix(RN._hbb_cover(rb))
        tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
        edge_ok = tri & valid[None, :] & valid[:, None] & (cls[:, None] == cls[None, :])
        cand = jnp.where(edge_ok, hiou, -1.0)
        nbr_iou, nbr_idx = jax.lax.approx_max_k(cand, M)
        return nbr_iou, nbr_idx

    @jax.jit
    def s1(rb, scores, cls):
        nbr_iou, nbr_idx = jax.vmap(neighbors)(rb, scores, cls)
        return jnp.sum(nbr_iou) + jnp.sum(nbr_idx)

    ms1 = timeit(s1, inputs)
    print(f"S1 hbb+topM:        {ms1:.3f} ms/img")

    def pairs_iou(rb, nbr_idx):
        if jax.default_backend() == "tpu":
            from yolov5_obb_tpu.ops.pallas.iou_kernel import sparse_rotated_iou

            return sparse_rotated_iou(rb, nbr_idx)
        return RN.rotated_iou(rb[:, None, :], rb[nbr_idx])

    @jax.jit
    def s2(rb, scores, cls):
        nbr_iou, nbr_idx = jax.vmap(neighbors)(rb, scores, cls)
        riou = jax.vmap(pairs_iou)(rb, nbr_idx)
        return jnp.sum(riou)

    ms2 = timeit(s2, inputs)
    print(f"S2 +sparse IoU:     {ms2:.3f} ms/img")

    def scatter_S(nbr_iou, nbr_idx, riou):
        n = nbr_idx.shape[0]
        sup = (nbr_iou > 0) & (riou > 0.45)
        return (
            jnp.zeros((n, n), jnp.bfloat16)
            .at[jnp.arange(n)[:, None], nbr_idx]
            .max(sup.astype(jnp.bfloat16))
        )

    @jax.jit
    def s3(rb, scores, cls):
        nbr_iou, nbr_idx = jax.vmap(neighbors)(rb, scores, cls)
        riou = jax.vmap(pairs_iou)(rb, nbr_idx)
        S = jax.vmap(scatter_S)(nbr_iou, nbr_idx, riou)
        return jnp.sum(S.astype(jnp.float32))

    ms3 = timeit(s3, inputs)
    print(f"S3 +scatter S:      {ms3:.3f} ms/img")

    @jax.jit
    def s4(rb, scores, cls):
        keep = jax.vmap(
            lambda b, s, c: RN.nms_rotated(b, s, 0.45, class_ids=c,
                                           presorted=True)
        )(rb, scores, cls)
        return jnp.sum(keep)

    ms4 = timeit(s4, inputs)
    print(f"S4 full NMS:        {ms4:.3f} ms/img")

    print(json.dumps({"s1": round(ms1, 3), "s2": round(ms2, 3),
                      "s3": round(ms3, 3), "s4": round(ms4, 3)}))


if __name__ == "__main__":
    main()
