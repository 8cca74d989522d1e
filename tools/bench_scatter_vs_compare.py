#!/usr/bin/env python
"""A/B: build the dense (n,n) suppression matrix by scatter vs by a fused
one-hot comparison reduction (S[j,i] = any_m (nbr_idx[j,m]==i) & sup[j,m])."""

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
    inputs = []
    for sd in (0, 1):
        rng = np.random.default_rng(sd)
        nbr_idx = rng.integers(0, K, (B, K, M)).astype(np.int32)
        sup = (rng.random((B, K, M)) < 0.05).astype(np.float32)
        inputs.append((jax.device_put(nbr_idx), jax.device_put(sup)))
    jax.block_until_ready(inputs)

    @jax.jit
    def by_scatter(nbr_idx, sup):
        def one(ni, su):
            return (
                jnp.zeros((K, K), jnp.bfloat16)
                .at[jnp.arange(K)[:, None], ni]
                .set(su.astype(jnp.bfloat16), mode="drop", unique_indices=True)
            )
        S = jax.vmap(one)(nbr_idx, sup)
        return jnp.sum(S.astype(jnp.float32))

    ms_a = timeit(by_scatter, inputs)
    print(f"scatter build:  {ms_a:.3f} ms/img")

    @jax.jit
    def by_compare(nbr_idx, sup):
        def one(ni, su):
            iota = jnp.arange(K, dtype=jnp.int32)
            # (K, M, K) compare fused into the any-reduce over m
            eq = ni[:, :, None] == iota[None, None, :]
            return jnp.any(eq & (su[:, :, None] > 0), axis=1).astype(jnp.bfloat16)
        S = jax.vmap(one)(nbr_idx, sup)
        return jnp.sum(S.astype(jnp.float32))

    ms_b = timeit(by_compare, inputs)
    print(f"compare build:  {ms_b:.3f} ms/img")
    print(json.dumps({"scatter": round(ms_a, 3), "compare": round(ms_b, 3)}))


if __name__ == "__main__":
    main()
