"""Import reference (torch) yolov5_obb checkpoints into this framework.

Migration tooling: users of the reference train with torch and hold ``.pt``
checkpoints; this maps a torch ``state_dict`` onto our Flax parameter tree so
those weights run here unchanged (reference layer registry:
models/common.py:37-274, models/yolo.py:33-92).

Usage (dump the state_dict in any torch env — no reference code needed here):

    # in the reference environment:
    import torch
    ckpt = torch.load("best.pt", map_location="cpu")
    sd = (ckpt.get("ema") or ckpt["model"]).float().state_dict()
    torch.save(sd, "best_sd.pt")

    # here:
    python tools/import_torch_weights.py --sd best_sd.pt --cfg yolov5m.yaml \
        --nc 15 --out weights/yolov5m_dota

Key correspondences (torch → flax, per graph layer ``model.{i}.`` → ``m{i}/``):

    Conv:       conv.weight→Conv_0/kernel (OIHW→HWIO), bn.{weight,bias}→
                BatchNorm_0/{scale,bias}, bn.running_{mean,var}→batch_stats
    Focus:      conv.* nested under ConvBnAct_0
    Bottleneck: cv1→ConvBnAct_0, cv2→ConvBnAct_1
    C3:         cv1/cv2/cv3→ConvBnAct_0/1/2, m.{j}→Bottleneck_{j}
    SPP/SPPF:   cv1→ConvBnAct_0, cv2→ConvBnAct_1
    BottleneckCSP: cv1→ConvBnAct_0, cv3→Conv_0, cv2→Conv_1, bn→BatchNorm_0,
                cv4→ConvBnAct_1, m.{j}→Bottleneck_{j}
    Detect:     m.{l}.{weight,bias}→conv{l}/{kernel,bias}

The Detect channel layout (na-major, [x y w h obj cls... theta...] per
anchor) is identical on both sides, so head weights map 1:1.
"""

from __future__ import annotations

import numpy as np

# (torch_subkey, flax_path_under_layer, kind) templates per module type.
# kind: "cw" conv weight OIHW→HWIO, "cb" conv bias, "bn" batchnorm params,
#       "none" parameterless
_CONV = [("conv.weight", ("Conv_0", "kernel"), "cw"),
         ("bn", ("BatchNorm_0",), "bn")]


def _conv_at(torch_prefix, flax_prefix):
    out = []
    for tk, fp, kind in _CONV:
        out.append((f"{torch_prefix}.{tk}" if torch_prefix else tk,
                    (*flax_prefix, *fp), kind))
    return out


def _bottleneck(torch_prefix, flax_prefix):
    return (_conv_at(f"{torch_prefix}.cv1", (*flax_prefix, "ConvBnAct_0"))
            + _conv_at(f"{torch_prefix}.cv2", (*flax_prefix, "ConvBnAct_1")))


def layer_entries(spec):
    """(torch_subkey, flax_path, kind) list for one LayerSpec."""
    kind, a = spec.name, spec.args
    if kind == "Conv":
        return _conv_at("", ())
    if kind == "Focus":
        return _conv_at("conv", ("ConvBnAct_0",))
    if kind == "Bottleneck":
        return (_conv_at("cv1", ("ConvBnAct_0",))
                + _conv_at("cv2", ("ConvBnAct_1",)))
    if kind in ("SPP", "SPPF"):
        return (_conv_at("cv1", ("ConvBnAct_0",))
                + _conv_at("cv2", ("ConvBnAct_1",)))
    if kind in ("C3", "C3Ghost"):
        n_rep = a[2] if len(a) > 2 else 1
        out = (_conv_at("cv1", ("ConvBnAct_0",))
               + _conv_at("cv2", ("ConvBnAct_1",))
               + _conv_at("cv3", ("ConvBnAct_2",)))
        if kind == "C3":
            for j in range(n_rep):
                out += _bottleneck(f"m.{j}", (f"Bottleneck_{j}",))
        return out
    if kind == "BottleneckCSP":
        n_rep = a[2] if len(a) > 2 else 1
        out = (_conv_at("cv1", ("ConvBnAct_0",))
               + [("cv3.weight", ("Conv_0", "kernel"), "cw"),
                  ("cv2.weight", ("Conv_1", "kernel"), "cw"),
                  ("bn", ("BatchNorm_0",), "bn")]
               + _conv_at("cv4", ("ConvBnAct_1",)))
        for j in range(n_rep):
            out += _bottleneck(f"m.{j}", (f"Bottleneck_{j}",))
        return out
    if kind == "Detect":
        nl = len(spec.frm)
        out = []
        for li in range(nl):
            out.append((f"m.{li}.weight", (f"conv{li}", "kernel"), "cw"))
            out.append((f"m.{li}.bias", (f"conv{li}", "bias"), "cb"))
        return out
    if kind in ("Upsample", "Concat", "MaxPool", "Contract", "Expand"):
        return []
    raise NotImplementedError(
        f"torch import not implemented for module {kind!r} — add a mapping"
    )


def _set(tree, path, value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def import_state_dict(state_dict, specs):
    """torch state_dict (str → ndarray) + parsed graph specs →
    {'params': ..., 'batch_stats': ...} numpy pytrees."""
    sd = {}
    for k, v in state_dict.items():
        k = k[len("module."):] if k.startswith("module.") else k
        sd[k if k.startswith("model.") else f"model.{k}"] = np.asarray(v)

    params: dict = {}
    stats: dict = {}
    missing = []
    for spec in specs:
        base = f"model.{spec.index}"
        layer = f"m{spec.index}"
        for tk, fp, kind in layer_entries(spec):
            key = f"{base}.{tk}"
            if kind == "bn":
                pairs = [(f"{key}.weight", params, (*fp, "scale")),
                         (f"{key}.bias", params, (*fp, "bias")),
                         (f"{key}.running_mean", stats, (*fp, "mean")),
                         (f"{key}.running_var", stats, (*fp, "var"))]
                for tkey, tree, path in pairs:
                    if tkey not in sd:
                        missing.append(tkey)
                        continue
                    _set(tree, (layer, *path), sd[tkey].astype(np.float32))
            else:
                if key not in sd:
                    missing.append(key)
                    continue
                w = sd[key].astype(np.float32)
                if kind == "cw":
                    w = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
                _set(params, (layer, *fp), w)
    if missing:
        raise KeyError(
            f"{len(missing)} expected torch keys absent, e.g. {missing[:5]} — "
            "wrong --cfg for this checkpoint?"
        )
    return {"params": params, "batch_stats": stats}


def import_torch_checkpoint(sd_path, cfg, nc):
    """Load a torch-saved state_dict file and map it onto ``cfg``'s tree."""
    import torch

    from ..models.yolo import build_model, parse_model_config

    obj = torch.load(sd_path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}

    model, meta, d = build_model(cfg, nc=nc)
    specs, *_ = parse_model_config(d)
    return import_state_dict(state_dict, specs), model, meta
