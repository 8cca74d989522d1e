#!/usr/bin/env python
"""Stage-level TPU debug: fused_neighbor_iou vs the XLA reference
(edge mask + _first_m_neighbors + sparse_rotated_iou)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B, K, M = 16, 2048, 64


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.pallas.iou_kernel import sparse_rotated_iou
    from yolov5_obb_tpu.ops.pallas.neighbor_kernel import fused_neighbor_iou
    from yolov5_obb_tpu.ops.rotated_nms import _first_m_neighbors, _hbb_cover

    rng = np.random.default_rng(7)
    cx = rng.uniform(0, 1024, (B, K))
    cy = rng.uniform(0, 1024, (B, K))
    l = rng.uniform(16, 128, (B, K))
    s = l * rng.uniform(0.3, 1.0, (B, K))
    t = rng.uniform(-np.pi / 2, np.pi / 2, (B, K))
    rb = jnp.asarray(np.stack([cx, cy, l, s, t], -1).astype(np.float32))
    cls = jnp.asarray(rng.integers(0, 15, (B, K)).astype(np.int32))
    thr = 0.45

    @jax.jit
    def check(rb, cls):
        def one(b, c):
            valid = jnp.ones((K,), bool)
            # XLA reference
            hbb = _hbb_cover(b)
            a1 = jnp.maximum(hbb[:, None, :2], hbb[None, :, :2])
            a2 = jnp.minimum(hbb[:, None, 2:], hbb[None, :, 2:])
            inter = jnp.clip(a2 - a1, 0).prod(-1)
            area = b[:, 2] * b[:, 3]
            cap = (thr * 0.98) * jnp.maximum(area[:, None], area[None, :])
            tri = jnp.tril(jnp.ones((K, K), bool), k=-1)
            edge = (inter > cap) & tri & (c[:, None] == c[None, :])
            ref_idx, ref_valid = _first_m_neighbors(edge, M)
            riou = sparse_rotated_iou(b, ref_idx)
            ref_sup = ref_valid & (riou > thr)
            # fused kernel
            idx, sup = fused_neighbor_iou(b, c, valid, thr, max_neighbors=M)
            occ_mis = jnp.sum(
                (jnp.sum(sup, 1) * 0).astype(jnp.int32)
            )  # placeholder keeps shapes simple
            idx_mis = jnp.sum(jnp.where(ref_valid, idx != ref_idx, False))
            sup_mis = jnp.sum(sup != ref_sup)
            edge_cnt_ref = jnp.sum(ref_valid.astype(jnp.int32))
            # fused valid slots = slots with occ: recover via idx!=0 | sup —
            # not directly output; compare edge counts via sup only
            return idx_mis, sup_mis, edge_cnt_ref, occ_mis

        r = jax.vmap(one)(rb, cls)
        return tuple(jnp.sum(v) for v in r)

    idx_mis, sup_mis, edges, _ = (int(v) for v in check(rb, cls))
    print(f"idx mismatches (valid slots): {idx_mis}")
    print(f"sup mismatches: {sup_mis}")
    print(f"reference edge count: {edges}")


if __name__ == "__main__":
    main()
