#!/usr/bin/env python
"""Candidate-selection stage benchmark + exact sort-free prototype.

The exact-top_k default (VERDICT r4: approx_max_k drops 12% of
detections) made candidate selection the dominant decode+NMS cost: a full
bitonic sort over N=64512 per image (single-label bench path), or N plus
k*nc=61440 (multi-label val path).  This tool times the alternatives:

  approx     jax.lax.approx_max_k           (inexact baseline)
  exact      jax.lax.top_k over N           (current default, single-label)
  compact    sort-free exact selection:     threshold -> cumsum slot ->
             two-level one-hot compaction as ONE (K/128, N)@(N, 128) MXU
             matmul carrying anchor indices -> top_k over the K compacted
             scores only.  Exact whenever #positives <= K (the production
             regime; callers guard the overflow case with a batch-level
             lax.cond fallback to `exact`).
  pairs      _topk_pairs_exact over (N, nc) (current default, multi-label)
  pairs_cpt  compact applied to the multi-label pair selection

Prints one JSON line with ms/img per variant and cross-checks compact
against exact on every sample.
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
N = int(os.environ.get("BENCH_N", 64512))
K = int(os.environ.get("BENCH_K", 4096))
NC = 15
CONF = 0.25
POS = int(os.environ.get("BENCH_POS", 1500))  # positives per image


def make_data(seed=0):
    """Scores with ~POS entries above CONF per image (bench density)."""
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.0, 0.2, (B, N)).astype(np.float32)
    for b in range(B):
        idx = rng.choice(N, POS, replace=False)
        s[b, idx] = rng.uniform(CONF + 0.01, 0.95, POS)
    cls = rng.uniform(0.3, 1.0, (B, N, NC)).astype(np.float32)
    cls /= cls.max(-1, keepdims=True)  # best class carries the gate score
    return s, s[..., None] * cls


def main():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.rotated_nms import (
        _topk_pairs_exact,
        compact_select,
    )

    gate_np, cc_np = make_data()
    gates = [jnp.asarray(np.where(g > CONF, g, 0.0))
             for g in (gate_np, np.roll(gate_np, 1, 0))]
    ccs = [jnp.asarray(c) for c in (cc_np, np.roll(cc_np, 1, 0))]

    def chk(x):
        return float(jnp.sum(x[0].astype(jnp.float32)))

    def timeit(fn, args_list, iters=10):
        fn(args_list[0]); fn(args_list[1])
        t0 = time.perf_counter()
        for i in range(iters):
            fn(args_list[i % 2])
        return (time.perf_counter() - t0) / iters * 1000.0 / B

    report = {}

    f_approx = jax.jit(jax.vmap(lambda g: jax.lax.approx_max_k(g, K)))
    report["approx_ms"] = round(timeit(lambda g: chk(f_approx(g)), gates), 4)

    f_exact = jax.jit(jax.vmap(lambda g: jax.lax.top_k(g, K)))
    report["exact_ms"] = round(timeit(lambda g: chk(f_exact(g)), gates), 4)

    f_cpt = jax.jit(jax.vmap(lambda g: compact_select(g, K)))
    report["compact_ms"] = round(timeit(lambda g: chk(f_cpt(g)), gates), 4)

    # correctness: same (score, idx) sets as exact top_k
    se, ie = map(np.asarray, f_exact(gates[0]))
    sc, ic = map(np.asarray, f_cpt(gates[0]))
    for b in range(B):
        ne = int((se[b] > 0).sum())
        nc_ = int((sc[b] > 0).sum())
        assert ne == nc_, (b, ne, nc_)
        assert set(ie[b, :ne].tolist()) == set(ic[b, :nc_].tolist()), b
        np.testing.assert_allclose(se[b, :ne], sc[b, :nc_], rtol=0, atol=0)
    report["compact_exact"] = True

    f_pairs = jax.jit(jax.vmap(
        lambda cc: _topk_pairs_exact(cc, CONF, K, NC)))
    report["pairs_ms"] = round(timeit(lambda c: chk(f_pairs(c)), ccs), 4)

    def pairs_cpt(cc):
        # two-stage: box compaction (unsorted) -> pair compaction + sort,
        # mirroring _topk_pairs_exact's prefilter argument
        best = jnp.max(cc, axis=-1)
        gate = jnp.where(best > CONF, best, 0.0)
        bsc, bidx = compact_select(gate, K, sort=False)
        sub = cc[bidx] * (bsc > 0)[:, None]
        flat = jnp.where(sub > CONF, sub, 0.0).reshape(-1)
        sc, fi = compact_select(flat, K)
        return sc, bidx[fi // NC], fi % NC

    f_pc = jax.jit(jax.vmap(pairs_cpt))
    report["pairs_compact_ms"] = round(timeit(lambda c: chk(f_pc(c)), ccs), 4)

    sp, ip_, _ = map(np.asarray, f_pairs(ccs[0]))
    sq, iq, _cq = map(np.asarray, f_pc(ccs[0]))
    npairs = [int((sp[b] > 0).sum()) for b in range(B)]
    for b in range(B):
        nq = int((sq[b] > 0).sum())
        assert npairs[b] == nq, (b, npairs[b], nq)
    report["pairs_compact_same_count"] = True
    report.update(B=B, N=N, K=K, pos=POS)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
