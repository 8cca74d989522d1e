#!/usr/bin/env python
"""b1 dispatch/RTT floor: the pipelined per-call cost of a near-empty
kernel at batch 1, measured exactly like bench.py's pipelined mode
(checksum chained through a device accumulator).

Purpose (VERDICT r4 weak #2): the b1 e2e figure (PARITY.md: 6.94 ms/img
pipelined) is dominated by this container's dev-tunnel dispatch path, not
device compute. total_b1 − floor_b1 ≈ the on-device b1 cost a production
host would see; this tool measures the floor with the same image-sized
input (so the arg-ref plumbing is identical) but a trivial reduction.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

IMGSZ = int(os.environ.get("BENCH_IMGSZ", 1024))
ITERS = int(os.environ.get("BENCH_ITERS", 64))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xs = [jax.device_put(rng.integers(0, 255, (1, IMGSZ, IMGSZ * 3),
                                      dtype=np.uint8)) for _ in range(3)]
    jax.block_until_ready(xs)
    acc0 = jax.device_put(np.zeros((), np.float32))

    @jax.jit
    def run_acc(x, acc):
        # one cheap full-tensor reduction — a lower bound for any kernel
        # that must at least read its input once
        return acc + jnp.sum(x.astype(jnp.float32) * 1e-6)

    float(run_acc(xs[0], acc0))  # compile
    acc = run_acc(xs[1], acc0)   # warm
    float(acc)
    t0 = time.perf_counter()
    acc = acc0
    for i in range(ITERS):
        acc = run_acc(xs[i % 3], acc)
    final = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(final)
    print(json.dumps({
        "metric": "b1_pipelined_dispatch_floor_ms",
        "value": round(dt * 1000.0, 3),
        "unit": "ms/call",
        "iters": ITERS,
    }))


if __name__ == "__main__":
    main()
