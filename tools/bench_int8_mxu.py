#!/usr/bin/env python
"""Probe: does Mosaic route s8xs8->s32 dots to the v5e's 2x int8 MXU path?

tools/bench_int8_conv.py showed XLA's conv emitter does NOT (int8 conv is
only 5-10% faster than bf16).  This probes the *Pallas* path with a plain
tiled matmul at a backbone-representative shape: if the int8 kernel runs
~2x the bf16 kernel, hand-written int8 conv kernels are worth building;
if it also lands at ~1x, the int8 MXU path is unreachable from this stack
and PTQ stays shelved (negative result to record).

The dev-tunnel RTT (~27 ms/call) dwarfs one matmul, so each timed call
runs T matmuls inside one jit via fori_loop, with the A operand perturbed
per iteration so XLA cannot hoist the loop-invariant dot.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

M, K, N = 8192, 512, 512
TM, TN = 512, 512  # per-program tile; K kept whole
T = 200            # matmuls per timed call


def make_matmul(acc_dtype):
    import jax
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    def matmul(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, TN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            interpret=jax.default_backend() != "tpu",
        )(a, b)

    return matmul


def bench(name, in_dtype, acc_dtype, a_buffers, b):
    import jax
    import jax.numpy as jnp

    matmul = make_matmul(acc_dtype)

    @jax.jit
    def run(a, b):
        def body(i, acc):
            # perturb one element of A per iteration (defeats hoisting;
            # negligible cost) and fold the dot back into the accumulator
            ai = a.at[0, 0].set(i.astype(in_dtype))
            return acc + matmul(ai, b)[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, T, body, jnp.float32(0))

    float(run(a_buffers[0], b))  # compile
    float(run(a_buffers[1], b))  # warm
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        float(run(a_buffers[i % 2], b))
    dt = (time.perf_counter() - t0) / iters / T
    flops = 2 * M * K * N
    print(f"{name}: {dt*1e6:.1f} us/matmul  ({flops/dt/1e12:.1f} TFLOP/s)")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    a8 = [jax.device_put(rng.integers(-127, 127, (M, K), dtype=np.int8))
          for _ in range(2)]
    b8 = jax.device_put(rng.integers(-127, 127, (K, N), dtype=np.int8))
    abf = [jax.device_put(x.astype(np.float32).astype(jnp.bfloat16))
           for x in [rng.standard_normal((M, K)) for _ in range(2)]]
    bbf = jax.device_put(rng.standard_normal((K, N)).astype(jnp.bfloat16))
    jax.block_until_ready([a8, b8, abf, bbf])

    t_bf = bench("bf16xbf16->f32", jnp.bfloat16, jnp.float32, abf, bbf)
    t_s8 = bench("s8xs8->s32    ", jnp.int8, jnp.int32, a8, b8)
    print(f"int8 speedup vs bf16: {t_bf / t_s8:.2f}x")


if __name__ == "__main__":
    main()
