#!/usr/bin/env python
"""Isolate the layer-2 C3(96,96,2)@256² hotspot (tools/bench_layers.py:
+1.13 ms/img, half the forward) and A/B the suspected byte inflators:

  stock      — ConvBnAct as in models/layers.py (BatchNorm in f32)
  bn_bf16    — identical but BN computed in bf16
  scale_shift— inference-math formulation: conv → y*scale+shift (bf16),
               what a fused kernel would compute; BN op gone entirely

Each prints measured ms/img + XLA bytes.  If scale_shift reaches its
bytes SOL, XLA handles the fused form and no Pallas kernel is needed —
the fix is an inference-mode module, not a custom kernel.
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
H = W = int(os.environ.get("BENCH_HW", 256))
C = int(os.environ.get("BENCH_C", 96))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16

    class ConvBN(nn.Module):
        c2: int
        k: int = 1
        bn_dtype: any = jnp.float32

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.c2, (self.k, self.k), padding="SAME",
                        use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.97,
                             epsilon=1e-3, dtype=self.bn_dtype,
                             param_dtype=jnp.float32)(x)
            return nn.silu(x).astype(dt)

    class ConvSS(nn.Module):
        """conv → y*scale+shift in bf16 (BN folded the fused-kernel way)."""

        c2: int
        k: int = 1

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.c2, (self.k, self.k), padding="SAME",
                        use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
            scale = self.param("scale", nn.initializers.ones, (self.c2,), jnp.float32)
            shift = self.param("shift", nn.initializers.zeros, (self.c2,), jnp.float32)
            x = x * scale.astype(dt) + shift.astype(dt)
            return nn.silu(x)

    def make_c3(conv_cls, **kw):
        class C3x(nn.Module):
            @nn.compact
            def __call__(self, x):
                c_ = C // 2
                y1 = conv_cls(c_, 1, **kw)(x)
                for _ in range(2):
                    h = conv_cls(c_, 1, **kw)(y1)
                    h = conv_cls(c_, 3, **kw)(h)
                    y1 = y1 + h
                y2 = conv_cls(c_, 1, **kw)(x)
                return conv_cls(C, 1, **kw)(jnp.concatenate([y1, y2], -1))

        return C3x()

    rng = np.random.default_rng(0)
    xs = [jax.device_put(
        jnp.asarray(rng.standard_normal((BATCH, H, W, C)), dt))
        for _ in range(2)]
    jax.block_until_ready(xs)

    report = {}

    def run(label, mod):
        v = mod.init(jax.random.PRNGKey(0), xs[0])

        def f(v, x):
            return jnp.sum(mod.apply(v, x).astype(jnp.float32))

        t0 = time.perf_counter()
        c = jax.jit(f).lower(v, xs[0]).compile()
        ct = time.perf_counter() - t0
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        by = float((ca or {}).get("bytes accessed", 0))
        v = jax.device_put(v)
        float(c(v, xs[0]))
        float(c(v, xs[1]))
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            float(c(v, xs[i % 2]))
        ms = (time.perf_counter() - t0) / iters * 1000.0 / BATCH
        sol = by / 819e9 * 1e3 / BATCH
        print(f"{label:12s}: {ms:7.3f} ms/img  bytes={by/1e9:6.2f}GB "
              f"(SOL {sol:6.3f} ms/img)  [compile {ct:.0f}s]", flush=True)
        report[label] = {"ms_per_img": round(ms, 3),
                         "gbytes": round(by / 1e9, 2)}

    # RTT floor for reference
    def fr(x):
        return jnp.sum(jnp.max(x.astype(jnp.float32).reshape(BATCH, -1, 128), -1))

    cr = jax.jit(fr).lower(xs[0]).compile()
    float(cr(xs[0]))
    t0 = time.perf_counter()
    for i in range(8):
        float(cr(xs[i % 2]))
    print(f"{'rtt_floor':12s}: {(time.perf_counter()-t0)/8*1000/BATCH:7.3f} ms/img",
          flush=True)

    run("stock", make_c3(ConvBN))
    run("bn_bf16", make_c3(ConvBN, bn_dtype=dt))
    run("scale_shift", make_c3(ConvSS))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
