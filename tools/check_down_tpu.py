#!/usr/bin/env python
"""On-TPU parity check: fused downsample Conv(3,2) Pallas kernel vs the
stock ConvBnAct, at the backbone shape families of the 1024px yolov5m
graph.  Interpret-mode tests can miss Mosaic lowering divergences; this is
the hardware truth check (cf. tools/check_c3_tpu.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def check(ci, co, H, W, seed):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models import layers
    from yolov5_obb_tpu.models.layers import ConvBnAct

    layers._FUSED_DOWN_MIN_SPATIAL = 0
    stock = ConvBnAct(co, 3, 2, dtype=jnp.bfloat16)
    fused = ConvBnAct(co, 3, 2, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, H, W, ci)), jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(seed), x, False)
    a = np.asarray(jax.jit(lambda v, x: stock.apply(v, x, False))(v, x),
                   np.float32)
    b = np.asarray(jax.jit(lambda v, x: fused.apply(v, x, False))(v, x),
                   np.float32)
    err = np.abs(a - b).max()
    ok = err <= 0.1
    print(f"Conv({ci}->{co},3,2) @{H}x{W}: max|err|={err:.4f} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    ok = True
    ok &= check(96, 192, 256, 256, 0)   # layer 3
    # layer 5 (ci=192) is ineligible — Mosaic strided loads need a
    # one-lane-tile minor dim; this exercises the stock fallback route
    ok &= check(192, 384, 128, 128, 1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
