"""Batch-size estimation for TPU HBM (reference utils/autobatch.py:22-57).

The reference empirically fits CUDA memory vs batch; on TPU, XLA compiles
per shape (an empirical probe costs a full compile), so we estimate
analytically from parameter/optimizer state plus a per-image activation
model and leave headroom.
"""

from __future__ import annotations

import numpy as np


def estimate_activation_bytes_per_image(imgsz: int, width_multiple: float,
                                        depth_multiple: float,
                                        bytes_per_el: int = 2) -> float:
    """Rough activation footprint of a CSP backbone+PAN at `imgsz` (bf16).

    Activation volume is dominated by the early pyramid levels:
    sum over strides s of (imgsz/s)^2 * C(s) with C(s) ≈ 64·(s/2)·width.
    The constant was calibrated against yolov5m@1024 (~0.6 GB/img bf16)."""
    total = 0.0
    for s, base_c in ((2, 64), (4, 128), (8, 256), (16, 512), (32, 1024)):
        c = base_c * width_multiple
        reuse = 2.5 + 2.0 * depth_multiple  # residual stacks keep activations alive
        total += (imgsz / s) ** 2 * c * reuse
    return total * bytes_per_el


def autobatch(n_params: int, imgsz: int = 1024, width_multiple: float = 0.75,
              depth_multiple: float = 0.67, hbm_bytes: int = 16 << 30,
              train: bool = True, fraction: float = 0.85,
              remat: bool = False) -> int:
    """Suggest a per-chip batch size that fits in `hbm_bytes`."""
    # params + grads + momentum + EMA, fp32
    state_bytes = n_params * 4 * (4 if train else 1)
    act = estimate_activation_bytes_per_image(imgsz, width_multiple, depth_multiple)
    if train:
        act *= 2.0  # saved residuals for backward
        if remat:
            act *= 0.5
    budget = hbm_bytes * fraction - state_bytes
    if budget <= 0:
        return 1
    b = int(budget // act)
    # round down to a power of two for clean mesh sharding
    return max(1 << int(np.log2(max(b, 1))), 1)
