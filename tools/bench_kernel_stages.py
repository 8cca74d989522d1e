#!/usr/bin/env python
"""In-kernel stage decomposition of fused_neighbor_iou (stage debug arg).

stage 1 = edge mask; 2 = + cumsum/selection; 3 = + compaction dots;
4 = + pair IoU (full).  Consecutive differences isolate each part.
Also sweeps iters to separate fixed RTT from on-device time.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B = int(os.environ.get("BENCH_BATCH", 16))
K = int(os.environ.get("BENCH_K", 2048))


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.neighbor_kernel import fused_neighbor_iou

    rng = np.random.default_rng(0)

    def mk(seed):
        r = np.random.default_rng(seed)
        cx = r.uniform(0, 1024, (B, K))
        cy = r.uniform(0, 1024, (B, K))
        l = r.uniform(16, 128, (B, K))
        s = l * r.uniform(0.3, 1.0, (B, K))
        t = r.uniform(-np.pi / 2, np.pi / 2, (B, K))
        rb = np.stack([cx, cy, l, s, t], -1).astype(np.float32)
        sc = np.sort(r.uniform(0.01, 1.0, (B, K)).astype(np.float32))[:, ::-1].copy()
        cls = r.integers(0, 15, (B, K)).astype(np.int32)
        return (jax.device_put(rb), jax.device_put(sc), jax.device_put(cls))

    cands = [mk(0), mk(1)]
    jax.block_until_ready(cands)
    report = {}

    def timeit(c, iters=10):
        float(c(*cands[0]))
        float(c(*cands[1]))
        t0 = time.perf_counter()
        for i in range(iters):
            float(c(*cands[i % 2]))
        return (time.perf_counter() - t0) / iters * 1000.0 / B

    for stage in (1, 2, 3, 4):
        def f(rb, sc, cls, _stage=stage):
            def one(b, s, c):
                idx, sup = fused_neighbor_iou(b, c, s > 0, 0.45,
                                              max_neighbors=64, stage=_stage)
                return jnp.sum(idx) + jnp.sum(sup)
            return jnp.sum(jax.vmap(one)(rb, sc, cls))

        c = jax.jit(f).lower(*cands[0]).compile()
        ms = timeit(c)
        print(f"stage{stage}: {ms:7.3f} ms/img", flush=True)
        report[f"s{stage}"] = round(ms, 3)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
