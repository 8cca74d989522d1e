"""Profiling helpers (reference utils/torch_utils.py:86-142).

``time_sync`` → ``block_and_time``; ``profile`` times fwd/bwd of callables
with FLOP estimates from XLA's cost analysis; ``trace`` wraps
``jax.profiler`` for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def block_and_time(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall time of fn(*args) with device sync (reference time_sync)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def flops_of(fn, *args) -> float | None:
    """XLA-estimated FLOPs of a jitted callable (thop equivalent)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None


def profile(fns_and_args, iters: int = 10, label_width: int = 32):
    """Time a list of (name, fn, args) — prints a table like reference
    torch_utils.profile (:93-142). Returns dict name→seconds."""
    out = {}
    print(f"{'op':<{label_width}}{'median ms':>12}{'GFLOPs':>10}{'TFLOP/s':>10}")
    for name, fn, args in fns_and_args:
        t = block_and_time(fn, *args, iters=iters)
        fl = flops_of(fn, *args)
        gf = fl / 1e9 if fl else float("nan")
        tput = fl / t / 1e12 if fl else float("nan")
        print(f"{name:<{label_width}}{t * 1000:>12.2f}{gf:>10.1f}{tput:>10.2f}")
        out[name] = t
    return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context → TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
