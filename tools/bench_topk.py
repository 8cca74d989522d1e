#!/usr/bin/env python
"""A/B: exact lax.top_k vs approx_max_k for the NMS neighbor selection
((2048, 2048) bf16 rows → top-64), vmapped over batch 16."""

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

    rng = np.random.default_rng(0)
    cands = [
        jnp.asarray(rng.random((B, K, K), np.float32), jnp.bfloat16)
        for _ in range(2)
    ]
    jax.block_until_ready(cands)

    @jax.jit
    def exact(c):
        v, i = jax.vmap(lambda m: jax.lax.top_k(m, M))(c)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(i)

    @jax.jit
    def approx(c):
        v, i = jax.vmap(lambda m: jax.lax.approx_max_k(m, M))(c)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(i)

    @jax.jit
    def hier(c):
        """Exact two-level top-k: per-chunk top-M then top-M of the C*M
        survivors. Exact because every global top-M element is a top-M
        element of its own chunk; sorts 256-wide (36 bitonic stages) over
        the bulk data instead of 2048-wide (121 stages)."""
        C = 8
        m = K // C

        def one(mat):
            v1, i1 = jax.lax.top_k(mat.reshape(K, C, m), M)  # (K, C, M)
            base = jnp.arange(C, dtype=i1.dtype)[None, :, None] * m
            v2, i2 = jax.lax.top_k(v1.reshape(K, C * M), M)
            idx = jnp.take_along_axis((i1 + base).reshape(K, C * M), i2, axis=1)
            return v2, idx

        v, i = jax.vmap(one)(c)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(i)

    @jax.jit
    def floor(c):
        # one full data pass (row max) — lower bound for any selection
        return jnp.sum(jnp.max(c, axis=-1).astype(jnp.float32))

    ms_e = timeit(exact, [(c,) for c in cands])
    ms_a = timeit(approx, [(c,) for c in cands])
    ms_h = timeit(hier, [(c,) for c in cands])
    ms_f = timeit(floor, [(c,) for c in cands])
    print(f"exact top_k:   {ms_e:.3f} ms/img")
    print(f"approx_max_k:  {ms_a:.3f} ms/img")
    print(f"hier top_k:    {ms_h:.3f} ms/img")
    print(f"row-max floor: {ms_f:.3f} ms/img")
    print(json.dumps({"exact": round(ms_e, 3), "approx": round(ms_a, 3),
                      "hier": round(ms_h, 3), "floor": round(ms_f, 3)}))


if __name__ == "__main__":
    main()
