#!/usr/bin/env python
"""Per-pass A/B of the stat-carrying fused train passes vs their stock
XLA equivalents, at the yolov5m@1024 region shapes.

Each leg times fwd and fwd+bwd (value_and_grad wrt weights + input) of
ONE pass vs the stock chain it replaces (BN-normalize+SiLU of the input
-> conv -> output stats), per image.  Run after an e2e regression to
localize which pass composes badly (the e2e A/B is tools/bench_train.py
FUSED=0/1).

Env: BENCH_BATCH (default 16), PASS=all|down1|c3_1x1|c3_3x3|down2|cv3.
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
WHICH = os.environ.get("PASS", "all")


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas import train_fused as TF

    rng = np.random.default_rng(0)

    def mk(shape, scale=1.0):
        return jnp.asarray(rng.normal(0, scale, shape), jnp.float32)

    def timeit(fn, args_list, iters=8):
        # block_until_ready is unreliable on this runtime (CLAUDE.md):
        # fn returns a SCALAR checksum, float() is the barrier
        float(fn(*args_list[0]))
        float(fn(*args_list[1]))
        t0 = time.perf_counter()
        for i in range(iters):
            float(fn(*args_list[i % 2]))
        dt = time.perf_counter() - t0
        return dt / iters * 1000.0 / B

    def stock_chain(z, gb, w4, stride):
        y = jax.nn.silu(z.astype(jnp.float32) * gb[0] + gb[1]).astype(
            jnp.bfloat16)
        zo = jax.lax.conv_general_dilated(
            y, w4.astype(jnp.bfloat16), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        zf = zo.astype(jnp.float32)
        s1 = jnp.sum(zf, (0, 1, 2))
        s2 = jnp.sum(zf * zf, (0, 1, 2))
        return zo, jnp.stack([s1, s2])

    def loss(zo_st):
        zo, st = zo_st
        return (jnp.sum(zo.astype(jnp.float32) ** 2) * 1e-6
                + jnp.sum(st) * 1e-6)

    report = {}

    def leg(label, fused_fn, stock_fn, args_maker):
        a0, a1 = args_maker(), args_maker()
        nargs = len(a0)

        def chk(tree):
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(tree))

        f_f = jax.jit(lambda *a: chk(fused_fn(*a)))
        f_s = jax.jit(lambda *a: chk(stock_fn(*a)))
        g_f = jax.jit(lambda *a: chk(jax.grad(
            lambda *b: loss(fused_fn(*b)),
            argnums=tuple(range(nargs)))(*a)))
        g_s = jax.jit(lambda *a: chk(jax.grad(
            lambda *b: loss(stock_fn(*b)),
            argnums=tuple(range(nargs)))(*a)))
        report[label] = {
            "fused_fwd": round(timeit(f_f, [a0, a1]), 4),
            "stock_fwd": round(timeit(f_s, [a0, a1]), 4),
            "fused_fwdbwd": round(timeit(g_f, [a0, a1]), 4),
            "stock_fwdbwd": round(timeit(g_s, [a0, a1]), 4),
        }
        print(label, json.dumps(report[label]), flush=True)

    # --- down1: 512² x48 -> 256² x96, stride 2
    if WHICH in ("all", "down1"):
        def mk_args():
            return (mk((B, 512, 512, 48)).astype(jnp.bfloat16),
                    jnp.stack([jnp.ones((48,)), jnp.zeros((48,))]),
                    mk((3, 3, 48, 96), 0.1))

        leg("down1_512x48_96",
            lambda z, gb, w: TF.pass_3x3s2(z, gb, w.reshape(9 * 48, 96)),
            lambda z, gb, w: stock_chain(z, gb, w, 2),
            mk_args)

    # --- C3 1x1 pair: 256² x96 -> (48, 48) (cv1+cv2, one read)
    if WHICH in ("all", "c3_1x1"):
        def mk_args():
            return (mk((B, 256, 256, 96)).astype(jnp.bfloat16),
                    jnp.stack([jnp.ones((96,)), jnp.zeros((96,))]),
                    mk((96, 48), 0.1), mk((96, 48), 0.1))

        def fused(z, gb, wa, wb):
            (o1, o2), (s1, s2) = TF.pass_1x1(
                (True,), ((0,),), (((0, 0),), ((0, 1),)),
                (z,), (gb,), (wa, wb))
            return o1, s1

        def stock(z, gb, wa, wb):
            y = jax.nn.silu(z.astype(jnp.float32) * gb[0] + gb[1]).astype(
                jnp.bfloat16)
            o1 = jnp.einsum("bhwc,cd->bhwd", y, wa.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            o2 = jnp.einsum("bhwc,cd->bhwd", y, wb.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            st = jnp.stack([jnp.sum(o1, (0, 1, 2)),
                            jnp.sum(o1 * o1, (0, 1, 2))])
            _ = jnp.sum(o2)
            return o1.astype(jnp.bfloat16), st

        leg("c3cv12_256x96_48", fused, stock, mk_args)

    # --- C3 bottleneck 3x3 s1: 256² x48 -> x48
    if WHICH in ("all", "c3_3x3"):
        def mk_args():
            return (mk((B, 256, 256, 48)).astype(jnp.bfloat16),
                    jnp.stack([jnp.ones((48,)), jnp.zeros((48,))]),
                    mk((3, 3, 48, 48), 0.1))

        leg("c3b_3x3_256x48",
            lambda z, gb, w: TF.pass_3x3s1(z, gb, w.reshape(9 * 48, 48)),
            lambda z, gb, w: stock_chain(z, gb, w, 1),
            mk_args)

    # --- cv3 (3 ns-inputs summed + 1 ns-input, split weights): 256² -> 96
    if WHICH in ("all", "cv3"):
        def mk_args():
            return (mk((B, 256, 256, 48)).astype(jnp.bfloat16),
                    mk((B, 256, 256, 48)).astype(jnp.bfloat16),
                    mk((B, 256, 256, 48)).astype(jnp.bfloat16),
                    jnp.stack([jnp.ones((48,)), jnp.zeros((48,))]),
                    mk((48, 96), 0.1), mk((48, 96), 0.1))

        def fused(z1, z2, z3, gb, wa, wb):
            (o,), (s,) = TF.pass_1x1(
                (True, True, True), ((0, 1), (2,)),
                ((((0, 0), (1, 1))),),
                (z1, z2, z3), (gb, gb, gb), (wa, wb))
            return o, s

        def stock(z1, z2, z3, gb, wa, wb):
            ns = lambda z: jax.nn.silu(
                z.astype(jnp.float32) * gb[0] + gb[1])
            g0 = (ns(z1) + ns(z2)).astype(jnp.bfloat16)
            g1 = ns(z3).astype(jnp.bfloat16)
            o = (jnp.einsum("bhwc,cd->bhwd", g0, wa.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                 + jnp.einsum("bhwc,cd->bhwd", g1, wb.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32))
            st = jnp.stack([jnp.sum(o, (0, 1, 2)),
                            jnp.sum(o * o, (0, 1, 2))])
            return o.astype(jnp.bfloat16), st

        leg("cv3_256_3in", fused, stock, mk_args)

    # --- down2: 256² x96 -> 128² x192, stride 2
    if WHICH in ("all", "down2"):
        def mk_args():
            return (mk((B, 256, 256, 96)).astype(jnp.bfloat16),
                    jnp.stack([jnp.ones((96,)), jnp.zeros((96,))]),
                    mk((3, 3, 96, 192), 0.1))

        leg("down2_256x96_192",
            lambda z, gb, w: TF.pass_3x3s2(z, gb, w.reshape(9 * 96, 192)),
            lambda z, gb, w: stock_chain(z, gb, w, 2),
            mk_args)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
