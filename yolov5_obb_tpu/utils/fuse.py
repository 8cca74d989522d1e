"""Deploy-time Conv+BN folding and model info.

Counterpart of reference ``fuse_conv_and_bn`` / ``model_info``
(utils/torch_utils.py:192-238).  Folding rewrites the variables tree:
every Conv kernel followed by a BatchNorm absorbs the BN affine +
running statistics, and the BN becomes an identity (scale=1, bias'
carried by a new conv bias).  XLA fuses the arithmetic anyway at run
time, but folding shrinks the parameter tree and removes the BN
ops from exported artifacts.
"""

from __future__ import annotations

import numpy as np


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def fuse_conv_bn(variables, eps: float = 1e-3):
    """Fold sibling Conv_*/BatchNorm_* pairs in a flax variables tree.

    Returns a new {'params', 'batch_stats'} with BN statistics folded into
    conv kernels/biases and BN scale/bias reset to identity."""
    import jax

    params = jax.tree.map(np.asarray, _to_plain(variables["params"]))
    stats = jax.tree.map(np.asarray, _to_plain(variables.get("batch_stats", {})))

    def fold(pdict, sdict):
        convs = sorted(k for k in pdict if k.startswith("Conv_") and isinstance(pdict[k], dict))
        bns = sorted(k for k in pdict if k.startswith("BatchNorm_") and isinstance(pdict[k], dict))
        for conv_k, bn_k in zip(convs, bns):
            conv = pdict[conv_k]
            bn = pdict[bn_k]
            st = sdict.get(bn_k, {})
            if "kernel" not in conv or "mean" not in st:
                continue
            gamma = bn.get("scale", 1.0)
            beta = bn.get("bias", 0.0)
            mean, var = st["mean"], st["var"]
            std = np.sqrt(var + eps)
            # kernel absorbs the BN scale; the BN keeps only a shift
            # (convs here are bias-less, so the shift stays in the BN's
            # running-mean slot: y = x - mean_new with scale=1, std=1)
            conv["kernel"] = (conv["kernel"] * (gamma / std)).astype(
                conv["kernel"].dtype
            )
            bn["scale"] = np.ones_like(gamma)
            bn["bias"] = np.zeros_like(beta)
            st["mean"] = (gamma * mean / std - beta).astype(mean.dtype)
            st["var"] = np.ones_like(var) - eps
        for k, v in pdict.items():
            if isinstance(v, dict):
                fold(v, sdict.get(k, {}))

    fold(params, stats)
    return {"params": params, "batch_stats": stats}


def fuse_for_inference(variables, enable: bool = True):
    """Load-time Conv+BN folding for every inference driver (reference
    ``attempt_load(fuse=True)``, experimental.py:90 / yolo.py:246).

    After folding, each BatchNorm reduces to a per-channel subtract that
    XLA fuses into the conv epilogue — the separate scale multiply is
    gone from the compiled graph.  Returns ``variables`` unchanged when
    disabled or when there are no batch statistics to fold."""
    if not enable or not variables.get("batch_stats"):
        return variables
    return fuse_conv_bn(variables)


def _to_plain(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    return {k: _to_plain(v) if isinstance(v, dict) or hasattr(v, "unfreeze") else v
            for k, v in dict(tree).items()}


def model_info(variables, meta=None, imgsz: int = 640, fwd=None, example=None):
    """Parameter count + optional XLA FLOPs estimate (reference model_info)."""
    import jax

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    info = {"params": n_params, "params_M": round(n_params / 1e6, 2)}
    if fwd is not None and example is not None:
        try:
            analysis = jax.jit(fwd).lower(*example).compile().cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            info["gflops"] = round(float(analysis.get("flops", 0)) / 1e9, 1)
        except Exception:
            pass
    return info
