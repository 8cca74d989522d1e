#!/usr/bin/env python
"""On-TPU parity check: fused C3 kernel vs stock block, all three shape
families the 1024px yolov5m graph uses (layer-2, layer-4 n=4, P3-head
no-shortcut).  Interpret-mode tests can miss Mosaic lowering divergences;
this is the hardware truth check (cf. tools/check_nms_tpu.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def check(C, c2, n, shortcut, H, W, seed):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.layers import C3

    stock = C3(C, c2, n, shortcut, dtype=jnp.bfloat16)
    fused = C3(C, c2, n, shortcut, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.bfloat16)
    v = stock.init(jax.random.PRNGKey(seed), x, False)
    a = np.asarray(jax.jit(lambda v, x: stock.apply(v, x, False))(v, x),
                   np.float32)
    b = np.asarray(jax.jit(lambda v, x: fused.apply(v, x, False))(v, x),
                   np.float32)
    err = np.abs(a - b).max()
    ok = err <= 0.1
    print(f"C3({C},{c2},n={n},shortcut={shortcut}) @{H}x{W}: "
          f"max|err|={err:.4f} {'OK' if ok else 'FAIL'}")
    return ok


def main():
    ok = True
    ok &= check(96, 96, 2, True, 256, 256, 0)    # layer 2
    ok &= check(192, 192, 4, True, 128, 128, 1)  # layer 4
    ok &= check(384, 192, 2, False, 128, 128, 2)  # P3 head
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
