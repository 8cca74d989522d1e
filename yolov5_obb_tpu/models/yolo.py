"""YOLOv5-OBB model: YAML graph spec → Flax module, Detect head, decode.

The reference builds a flat ``nn.Sequential`` with a save-list from YAML
(models/yolo.py:271-323 ``parse_model``); we keep the YAML spec as the
single source of truth (so every n/s/m/l/x + hub variant comes free) but
build a Flax module graph in NHWC, and split the Detect head into

* a pure conv module producing raw per-level maps ``(b, ny, nx, na, no)``
  (training path — feeds the dense loss), and
* a jit-friendly ``decode()`` that applies the reference's sigmoid
  grid/anchor transform (models/yolo.py:71-78) as one fused batched op.

Strides are derived with ``jax.eval_shape`` (zero-FLOP abstract probe) the
way the reference probes with a dummy forward (models/yolo.py:121-124).
"""

from __future__ import annotations

import dataclasses
import math
import os
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.core import freeze, unfreeze

from . import layers as L

THETA_BINS = 180


# ---------------------------------------------------------------------------
# config parsing
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    index: int
    frm: Any  # int or tuple of ints
    repeats: int
    name: str
    args: tuple


@dataclasses.dataclass
class ModelMeta:
    """Static model metadata needed by loss/decode/eval."""

    nc: int
    nl: int
    na: int
    strides: tuple  # per level, input pixels
    anchors_px: np.ndarray  # (nl, na, 2) in input pixels
    names: list | None = None

    @property
    def anchors_grid(self) -> np.ndarray:
        """Anchors in feature-map units per level (reference yolo.py:124)."""
        return self.anchors_px / np.asarray(self.strides)[:, None, None]

    @property
    def no(self) -> int:
        return self.nc + 5 + THETA_BINS


def load_config(cfg) -> dict:
    if isinstance(cfg, dict):
        return dict(cfg)
    p = Path(cfg)
    if not p.exists():
        p = Path(__file__).parent / "configs" / p.name
    with open(p) as f:
        return yaml.safe_load(f)


# modules whose first arg is an output-channel count subject to width scaling
_CH_MODULES = {
    "Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP", "SPPF",
    "DWConv", "Focus", "CrossConv", "BottleneckCSP", "C3", "C3TR", "C3SPP",
    "C3Ghost", "MixConv2d",
}
# modules that additionally take the repeat count as a constructor arg
_REPEAT_MODULES = {"BottleneckCSP", "C3", "C3TR", "C3Ghost"}


def parse_model_config(d: dict, ch_in: int = 3):
    """YAML dict → (specs, meta-ish info). Mirrors reference parse_model
    channel arithmetic (models/yolo.py:271-323)."""
    anchors, nc = d["anchors"], d["nc"]
    gd, gw = d["depth_multiple"], d["width_multiple"]
    na = len(anchors[0]) // 2 if isinstance(anchors, list) else anchors

    specs: list[LayerSpec] = []
    ch = [ch_in]
    detect_from = None
    for i, (f, n, name, args) in enumerate(d["backbone"] + d["head"]):
        name = {"nn.Upsample": "Upsample", "nn.BatchNorm2d": "BatchNorm",
                "nn.MaxPool": "MaxPool", "nn.MaxPool2d": "MaxPool"}.get(name, name)
        args = list(args)
        n_eff = max(round(n * gd), 1) if n > 1 else n

        if name in _CH_MODULES:
            c1 = ch[f]
            c2 = args[0]
            c2 = L.make_divisible(c2 * gw, 8)
            args = [c1, c2, *args[1:]]
            if name in _REPEAT_MODULES:
                args.insert(2, n_eff)
                n_eff = 1
        elif name == "Concat":
            c2 = sum(ch[x] for x in f)
        elif name == "Sum":
            args = [len(f), *args[1:]] if args else [len(f)]
            c2 = ch[f[0]]
        elif name == "Detect":
            detect_from = tuple(f)
            args = [tuple(ch[x] for x in f)]
            c2 = None
        elif name == "Contract":
            c2 = ch[f] * args[0] ** 2
        elif name == "Expand":
            c2 = ch[f] // args[0] ** 2
        else:
            c2 = ch[f] if isinstance(f, int) else ch[f[0]]

        specs.append(
            LayerSpec(
                i, tuple(f) if isinstance(f, list) else f, n_eff, name,
                tuple(tuple(v) if isinstance(v, list) else v for v in args),
            )
        )
        if i == 0:
            ch = []
        ch.append(c2)

    if isinstance(anchors, int):
        # `anchors: N` (reference models/hub/yolov5-p7.yaml) — synthesize a
        # stride-scaled geometric ladder as placeholder priors (square boxes
        # of 1.25/2.5/5/...× the level stride, assuming a P3-first ladder);
        # run utils/autoanchor.kmean_anchors to fit them to a dataset.
        nl = len(detect_from)
        sizes = np.array(
            [[1.25 * 2.0 ** a] * 2 for a in range(anchors)], dtype=np.float32
        )
        anchors_px = np.stack(
            [sizes * 2.0 ** (li + 3) for li in range(nl)]
        ).astype(np.float32)
    else:
        anchors_px = np.asarray(anchors, dtype=np.float32).reshape(len(anchors), -1, 2)
    return specs, nc, na, anchors_px, detect_from


# ---------------------------------------------------------------------------
# Detect head
# ---------------------------------------------------------------------------


class Detect(nn.Module):
    """OBB detection head: per-level 1x1 conv → (b, ny, nx, na, nc+5+180).

    Output channel layout per anchor: ``[x y w h obj cls*nc theta*180]``
    (reference models/yolo.py:33-47, no = nc+5+180).
    """

    nc: int
    na: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 flat: bool = False):
        no = self.nc + 5 + THETA_BINS
        outs = []
        for li, x in enumerate(xs):
            y = nn.Conv(
                self.na * no, (1, 1), use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{li}",
            )(x)
            b, ny, nx, _ = y.shape
            if flat:
                # (b, ny*nx*na, no): anchor index varies fastest, matching the
                # 5-D view's reshape order.  TPU-layout motivation: the 5-D
                # (…, na, no) form puts na=3 on the sublane dim (padded 3→8,
                # ~2.7x HBM inflation on every decode read); the flat form's
                # minor dims (n, no) pad only 200→256.
                # Inference keeps the compute dtype (bf16 on TPU — halves the
                # dominant map traffic, the reference's --half equivalent);
                # the train/loss path stays f32.
                flat_map = y.reshape(b, ny * nx * self.na, no)
                outs.append(flat_map.astype(jnp.float32) if train else flat_map)
            else:
                outs.append(y.reshape(b, ny, nx, self.na, no).astype(jnp.float32))
        return outs


def decode(maps, meta: ModelMeta):
    """Raw Detect maps → ``(b, sum(na*ny*nx), no)`` decoded predictions.

    xy = (2σ-0.5+grid)·stride, wh = (2σ)²·anchor_px, everything else σ
    (reference models/yolo.py:71-79).
    """
    zs = []
    for li, p in enumerate(maps):
        b, ny, nx, na, no = p.shape
        y = jax.nn.sigmoid(p)
        gy = jnp.arange(ny, dtype=jnp.float32)[:, None, None, None]
        gx = jnp.arange(nx, dtype=jnp.float32)[None, :, None, None]
        grid = jnp.broadcast_to(
            jnp.concatenate(
                [jnp.broadcast_to(gx, (ny, nx, na, 1)), jnp.broadcast_to(gy, (ny, nx, na, 1))],
                axis=-1,
            ),
            (ny, nx, na, 2),
        )
        anchor = jnp.asarray(meta.anchors_px[li], dtype=jnp.float32)  # (na, 2)
        xy = (y[..., 0:2] * 2 - 0.5 + grid) * meta.strides[li]
        wh = (y[..., 2:4] * 2) ** 2 * anchor
        z = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        zs.append(z.reshape(b, ny * nx * na, no))
    return jnp.concatenate(zs, axis=1)


# ---------------------------------------------------------------------------
# full model graph
# ---------------------------------------------------------------------------


def _build_module(spec: LayerSpec, dtype, name: str, fused_c3: bool = False):
    kind, a = spec.name, spec.args
    mk = {
        # Conv args are [c1, c2, k, s, ...]; ConvBnAct takes c2 onwards
        "Conv": lambda: L.ConvBnAct(*a[1:], dtype=dtype, fused=fused_c3,
                                    name=name),
        "DWConv": lambda: L.DWConv(*a, dtype=dtype, name=name),
        "Bottleneck": lambda: L.Bottleneck(*a, dtype=dtype, name=name),
        "BottleneckCSP": lambda: L.BottleneckCSP(*a, dtype=dtype, name=name),
        "C3": lambda: L.C3(*a, dtype=dtype, fused=fused_c3, name=name),
        "C3TR": lambda: L.C3TR(*a, dtype=dtype, name=name),
        "C3SPP": lambda: L.C3SPP(*a, dtype=dtype, name=name),
        "C3Ghost": lambda: L.C3Ghost(*a, dtype=dtype, name=name),
        "SPP": lambda: L.SPP(*a, dtype=dtype, name=name),
        "SPPF": lambda: L.SPPF(*a, dtype=dtype, name=name),
        "Focus": lambda: L.Focus(*a, dtype=dtype, name=name),
        "GhostConv": lambda: L.GhostConv(*a, dtype=dtype, name=name),
        "GhostBottleneck": lambda: L.GhostBottleneck(*a, dtype=dtype, name=name),
        "CrossConv": lambda: L.CrossConv(*a, dtype=dtype, name=name),
        "Contract": lambda: L.Contract(*a, name=name),
        "Expand": lambda: L.Expand(*a, name=name),
        "Concat": lambda: L.Concat(name=name),
        "Sum": lambda: L.Sum(*a, name=name),
        "MixConv2d": lambda: L.MixConv2d(*a, dtype=dtype, name=name),
        "Upsample": lambda: L.Upsample(
            scale=int(a[1]) if len(a) > 1 else 2, name=name
        ),
        "MaxPool": lambda: L.MaxPool(*(int(v) for v in a), name=name),
        "Classify": lambda: L.Classify(*a, dtype=dtype, name=name),
    }
    if kind not in mk:
        raise ValueError(f"unknown module {kind!r} in model config")
    return mk[kind]()


def _fused_train_specs_ok(specs) -> bool:
    """True iff layers 0-3 form the standard high-resolution prefix
    stem Conv(6,2) → Conv(3,2) → C3(c,c,n shortcut) → Conv(3,2) and no
    later layer references layers 0-2 (whose activations the fused train
    region never materializes)."""
    if len(specs) < 5:
        return False
    s0, s1, s2, s3 = specs[:4]
    if not (s0.name == "Conv" and list(s0.args[2:4]) == [6, 2]):
        return False
    if not (s1.name == "Conv" and list(s1.args[2:4]) == [3, 2]
            and s1.frm == -1 and s1.repeats == 1):
        return False
    if not (s2.name == "C3" and s2.frm == -1 and s2.repeats == 1):
        return False
    a2 = list(s2.args)
    if a2[0] != a2[1] or a2[1] % 2 or (len(a2) > 3 and not a2[3]):
        return False
    if len(a2) > 4 and a2[4] != 1:  # groups
        return False
    if not (s3.name == "Conv" and list(s3.args[2:4]) == [3, 2]
            and s3.frm == -1 and s3.repeats == 1):
        return False
    for sp in specs[4:]:
        refs = (sp.frm,) if isinstance(sp.frm, int) else tuple(sp.frm)
        if any(j in (0, 1, 2) for j in refs):
            return False
    return True


class YoloModel(nn.Module):
    """The full backbone+PAN+Detect graph built from a parsed spec.

    ``packed_stem``: inference-only TPU fast path — ``__call__`` then takes
    the RAW image as a packed ``(B, H, W*3)`` uint8 view (the /255 normalize
    folds into the stem weights) and layer 0 runs as the fused Pallas stem
    (models/layers.PackedStem; identical parameter tree to the stock stem).
    Requires the config's first layer to be ``Conv(c2, 6, 2, 2)``.

    ``fused_train``: train-mode TPU fast path for the high-resolution
    low-channel prefix (layers 0-3: stem → down1 → C3 → down2) — the
    region measured 4-12x over its HBM byte floor under stock XLA
    (PARITY.md; tools/bench_train_convs2.py + bench_glue.py).  Runs as a
    chain of stat-carrying Pallas passes (ops/pallas/train_fused.py):
    each pass fuses the previous conv's BatchNorm+SiLU with its own conv
    and emits per-channel (Σz, Σz²); statistics finalize between passes
    in XLA, so autodiff composes the exact train-mode BatchNorm backward.
    Parameter/batch-stats trees are identical to the stock graph.
    """

    specs: tuple  # tuple[LayerSpec]
    nc: int
    na: int
    dtype: Any = jnp.float32
    packed_stem: bool = False
    packed_l1: bool = False  # absorb layer-1 Conv(3,2) into the stem kernel
    # eligible C3 blocks AND the eligible stride-2 downsample Convs between
    # them run as fused Pallas kernels (ops/pallas/{c3,down}_kernel.py) —
    # one flag for the whole fused-region family
    fused_c3: bool = False
    fused_train: bool = False

    def _fused_train_ok(self, x) -> bool:
        if not (self.fused_train and self.packed_stem):
            return False
        if self.scope is not None and self.is_initializing():
            return False
        if x.ndim != 3 or not _fused_train_specs_ok(self.specs):
            return False
        B, H, W3 = x.shape
        W = W3 // 3
        c0, c1v = self.specs[1].args[0], self.specs[1].args[1]
        # pass_3x3s2 shape constraints at both downsample sites
        return (
            (H // 2) % 32 == 0 and (W // 2) % 16 == 0
            and (H // 4) % 32 == 0 and (W // 4) % 16 == 0
            and c0 <= 128 and c1v <= 128
        )

    def _fused_train_region(self, x_packed):
        """Layers 0-3 as the stat-carrying fused pass chain (train only)."""
        from ..ops.pallas import train_fused as TF
        from ..ops.pallas.stem_kernel import remap_w6, stem_conv_train

        s0, s1, s2, s3 = self.specs[:4]
        c0, c1v, c3v = s0.args[1], s1.args[1], s3.args[1]
        nb = s2.args[2] if len(s2.args) > 2 else 1
        c_ = c1v // 2
        B, H, W3 = x_packed.shape
        W = W3 // 3

        m0 = L._ConvBnTwin(3, c0, 6, name="m0")
        m1 = L._ConvBnTwin(c0, c1v, 3, name="m1")
        m2 = L._C3Twin(c1v, c1v, nb, name="m2")
        m3 = L._ConvBnTwin(c1v, c3v, 3, name="m3")

        k0, g0, b0 = m0()
        k1, g1, b1 = m1()
        (kc1, gc1, bc1), bots, (kc2, gc2, bc2), (kc3, gc3, bc3) = m2()
        k3, g3, b3 = m3()

        def fin(st, gamma, beta, n):
            gg, bb, mean, var = TF.finalize_gb(st[0], st[1], gamma, beta, n)
            return jnp.stack([gg, bb]), mean, var

        # stem conv (Pallas raw conv; wgrad-only VJP) + stats in XLA —
        # the ds0 cotangent terms fuse into the stem wgrad's dz input
        z0 = stem_conv_train(x_packed, remap_w6(k0) / 255.0, H, W,
                             out_dtype=jnp.bfloat16)
        z0f = z0.astype(jnp.float32)
        st0 = jnp.stack([jnp.sum(z0f, (0, 1, 2)),
                         jnp.sum(z0f * z0f, (0, 1, 2))])
        n0 = B * (H // 2) * (W // 2)
        gb0, mean0, var0 = fin(st0, g0, b0, n0)

        # down1: BN+SiLU of the stem output fused with the stride-2 conv
        z1, st1 = TF.pass_3x3s2(z0, gb0, k1.reshape(9 * c0, c1v))
        n1 = n0 // 4
        gb1, mean1, var1 = fin(st1, g1, b1, n1)

        # C3 cv1 + cv2: one read of z1, two 1x1 outputs
        (zc1, zc2), (sta, stb) = TF.pass_1x1(
            (True,), ((0,),), (((0, 0),), ((0, 1),)),
            (z1,), (gb1,), (kc1[0, 0], kc2[0, 0]))
        gba, mc1, vc1 = fin(sta, gc1, bc1, n1)
        gbb, mc2, vc2 = fin(stb, gc2, bc2, n1)

        # bottlenecks: residual sums stay in z-space — bottleneck k's
        # input is Σ ns(chain) over cv1's and every prior cv2's output
        chain, gbs = [zc1], [gba]
        bot_stats = []
        for (ka, ga, ba), (kb, gbe_, bbe_) in bots:
            m = len(chain)
            (zd,), (std,) = TF.pass_1x1(
                (True,) * m, (tuple(range(m)),), (((0, 0),),),
                tuple(chain), tuple(gbs), (ka[0, 0],))
            gbd, md, vd = fin(std, ga, ba, n1)
            ze, ste = TF.pass_3x3s1(zd, gbd, kb.reshape(9 * c_, c_))
            gbe, me, ve = fin(ste, gbe_, bbe_, n1)
            chain.append(ze)
            gbs.append(gbe)
            bot_stats += [(md, vd), (me, ve)]

        # cv3 on concat(m_out, cv2_out): split-weight sum of two groups
        m = len(chain)
        wc3 = kc3[0, 0]
        (z3,), (st3,) = TF.pass_1x1(
            (True,) * (m + 1), (tuple(range(m)), (m,)),
            (((0, 0), (1, 1)),),
            tuple(chain) + (zc2,), tuple(gbs) + (gbb,),
            (wc3[:c_], wc3[c_:]))
        gb3, mc3, vc3 = fin(st3, gc3, bc3, n1)

        # down2
        zd2, std2 = TF.pass_3x3s2(z3, gb3, k3.reshape(9 * c1v, c3v))
        gbo, mean3, var3 = fin(std2, g3, b3, n1 // 4)

        # handoff to stock XLA: one elementwise pass at 1/64 the pixels
        bd = L._bn_dtype()
        h = nn.silu(zd2.astype(bd) * gbo[0].astype(bd)
                    + gbo[1].astype(bd)).astype(self.dtype)

        # running-stat updates (second twin calls under the same scopes)
        m0(mean0, var0)
        m1(mean1, var1)
        m2(((mc1, vc1), (mc2, vc2), *bot_stats, (mc3, vc3)))
        m3(mean3, var3)
        return h

    @nn.compact
    def __call__(self, x, train: bool = False, flat: bool = False):
        y: list = []
        out = None

        def fetch(j):
            return (y[-1] if y else x) if j == -1 else y[j]

        skip = 0
        if train and self._fused_train_ok(x):
            h = self._fused_train_region(x)
            y.extend([None, None, None, h])
            skip = 4
        elif self.packed_stem:
            s0 = self.specs[0]
            if not (s0.name == "Conv" and list(s0.args[2:4]) == [6, 2]):
                raise ValueError(
                    f"packed_stem needs a Conv(c2, 6, 2) first layer, got "
                    f"{s0.name}{tuple(s0.args)}"
                )
            if self.packed_l1 and not train:
                # stem + layer-1 in ONE kernel: the (H/2, W/2, 48) stem
                # activation never touches HBM.  Param-twin scopes m0/m1
                # keep the checkpoint tree identical to the stock graph;
                # layer 0's slot in `y` stays None (validated unreferenced
                # by build_model before setting packed_l1).
                # (train=True drops to the PackedStem train branch below —
                # raw-conv Pallas kernel + live BN — with layer 1 stock.)
                from ..ops.pallas.stem_kernel import (
                    fold_stem_l1_params,
                    fused_stem_l1,
                )

                s1 = self.specs[1]
                k0, bn0 = L._CBAParams(3, s0.args[1], 6, name="m0")()
                k1, bn1 = L._CBAParams(s0.args[1], s1.args[1], 3,
                                       name="m1")()
                ops = fold_stem_l1_params(k0, bn0, k1, bn1)
                B, H, W3 = x.shape
                x = fused_stem_l1(x, *ops, H, W3 // 3).astype(self.dtype)
                y.append(None)
                y.append(x)
                skip = 2
            else:
                x = L.PackedStem(s0.args[1], dtype=self.dtype,
                                 name="m0")(x, train)
                y.append(x)
                skip = 1

        for spec in self.specs[skip:]:
            f = spec.frm
            if spec.name == "Detect":
                out = Detect(self.nc, self.na, dtype=self.dtype, name=f"m{spec.index}")(
                    [fetch(j) for j in f], train, flat=flat
                )
                y.append(None)
                continue
            h = fetch(f) if isinstance(f, int) else [fetch(j) for j in f]
            for r in range(spec.repeats):
                name = f"m{spec.index}" if spec.repeats == 1 else f"m{spec.index}_{r}"
                h = _build_module(spec, self.dtype, name, self.fused_c3)(h, train)
            y.append(h)
        # graphs without a Detect head (classification configs, truncated
        # sub-graphs) yield the last layer's output
        return out if out is not None else y[-1]


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------


def build_model(cfg, nc: int | None = None, dtype=jnp.float32,
                packed_stem: bool = False, fused_c3: bool = False,
                fused_train: bool = False):
    """Load config → (YoloModel, ModelMeta-without-strides, raw dict)."""
    d = load_config(cfg)
    if nc is not None and nc != d.get("nc"):
        d["nc"] = nc
    specs, nc_, na, anchors_px, _ = parse_model_config(d)
    packed_l1 = False
    if packed_stem:
        s0 = specs[0]
        # silently fall back for configs without the Conv(c2,6,2) stem
        # (Focus/yolov3 variants) — the packed path only accelerates that stem
        packed_stem = s0.name == "Conv" and list(s0.args[2:4]) == [6, 2]
        if packed_stem and len(specs) > 1:
            # absorb layer 1 into the stem kernel when it is the standard
            # Conv(c3, 3, 2) downsample consuming layer 0, and NO later
            # layer references layer 0 (its activation is never written)
            s1 = specs[1]
            refs0 = any(
                (spec.frm == 0 if isinstance(spec.frm, int)
                 else 0 in tuple(spec.frm))
                for spec in specs[2:]
            )
            packed_l1 = (
                s1.name == "Conv" and list(s1.args[2:4]) == [3, 2]
                and s1.frm == -1 and s1.repeats == 1 and not refs0
                and int(os.environ.get("PACKED_L1", "1")) != 0
            )
    model = YoloModel(specs=tuple(specs), nc=nc_, na=na, dtype=dtype,
                      packed_stem=packed_stem, packed_l1=packed_l1,
                      fused_c3=fused_c3,
                      fused_train=fused_train and packed_stem)
    meta = ModelMeta(nc=nc_, nl=anchors_px.shape[0], na=na, strides=(), anchors_px=anchors_px)
    return model, meta, d


def packed_stem_eligible(model: "YoloModel") -> bool:
    """True iff the config's first layer is the Conv(c2, 6, 2) stem."""
    s0 = model.specs[0]
    return s0.name == "Conv" and list(s0.args[2:4]) == [6, 2]


def _dummy_input(model: YoloModel, imgsz: int):
    if model.packed_stem:
        return jnp.zeros((1, imgsz, imgsz * 3), jnp.uint8)
    return jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)


def probe_strides(model: YoloModel, meta: ModelMeta, imgsz: int = 256) -> ModelMeta:
    """Derive per-level strides with an abstract (zero-FLOP) forward."""
    dummy = _dummy_input(model, imgsz)
    vars_shape = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)
    outs = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), vars_shape, dummy
    )
    strides = tuple(float(imgsz // o.shape[1]) for o in outs)
    meta = dataclasses.replace(meta, strides=strides)
    # sanity: anchor order must match stride order (reference check_anchor_order)
    areas = meta.anchors_px.prod(-1).mean(-1)
    if len(areas) > 1 and (np.argsort(areas) != np.argsort(strides)).any():
        meta = dataclasses.replace(
            meta, anchors_px=meta.anchors_px[np.argsort(np.argsort(strides))]
        )
    return meta


def init_model(model: YoloModel, meta: ModelMeta, rng, imgsz: int = 640):
    """Init variables + focal-style Detect bias priors (reference yolo.py:224-232)."""
    dummy = _dummy_input(model, imgsz)
    variables = model.init(rng, dummy, train=False)
    variables = unfreeze(variables)
    params = variables["params"]
    det_name = f"m{len(model.specs) - 1}"
    det = params[det_name]
    no = meta.no
    for li, s in enumerate(meta.strides):
        b = np.asarray(det[f"conv{li}"]["bias"]).reshape(meta.na, no).copy()
        b[:, 4] += math.log(8 / (640 / s) ** 2)  # obj prior
        b[:, 5:] += math.log(0.6 / (meta.nc - 0.999999))  # cls (+theta) prior
        det[f"conv{li}"]["bias"] = jnp.asarray(b.reshape(-1))
    variables["params"] = params
    return freeze(variables)


def create_model(cfg, nc: int | None = None, dtype=jnp.float32, rng=None, imgsz: int = 640,
                 packed_stem: bool = False, fused_c3: bool | None = None,
                 fused_train: bool = False):
    """One-call constructor: (model, variables, meta).

    ``fused_c3`` enables the fused-region Pallas family: eligible C3
    blocks AND the eligible stride-2 downsample Convs between them run as
    fused kernels.  Defaults to ``packed_stem`` (all are the TPU inference
    fast path; training/export builds leave them off).  ``fused_train``
    enables the stat-carrying fused train region (layers 0-3; see
    YoloModel docstring)."""
    if fused_c3 is None:
        fused_c3 = packed_stem
    model, meta, d = build_model(cfg, nc=nc, dtype=dtype,
                                 packed_stem=packed_stem, fused_c3=fused_c3,
                                 fused_train=fused_train)
    meta = probe_strides(model, meta)
    meta.names = d.get("names")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    variables = init_model(model, meta, rng, imgsz=imgsz)
    return model, variables, meta
