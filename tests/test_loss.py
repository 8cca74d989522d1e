"""Loss tests: dense assignment vs a NumPy re-derivation of the reference
build_targets semantics (utils/loss.py:194-275), and loss sanity/overfit."""

import jax
import jax.numpy as jnp
import numpy as np

from yolov5_obb_tpu.engine.loss import ComputeLoss, _assign_level, ciou_xywh
from yolov5_obb_tpu.models.yolo import ModelMeta


def _np_build_targets_level(targets, stride, anchors_ft, ny, nx, anchor_t=4.0, g=0.5):
    """Loop/boolean-index reimplementation of the reference's per-level
    assignment (image idx, anchor idx, gj, gi, txy, twh) for testing."""
    out = set()
    offs = [(0.0, 0.0), (g, 0.0), (0.0, g), (-g, 0.0), (0.0, -g)]
    for b, cls, cx, cy, l, s in targets:
        gx, gy, gl, gs = cx / stride, cy / stride, l / stride, s / stride
        for a, (aw, ah) in enumerate(anchors_ft):
            r = max(gl / aw, aw / max(gl, 1e-9))
            r2 = max(gs / ah, ah / max(gs, 1e-9))
            if max(r, r2) >= anchor_t:
                continue
            cand = [0]
            if gx % 1 < g and gx > 1:
                cand.append(1)
            if gy % 1 < g and gy > 1:
                cand.append(2)
            if (nx - gx) % 1 < g and (nx - gx) > 1:
                cand.append(3)
            if (ny - gy) % 1 < g and (ny - gy) > 1:
                cand.append(4)
            for o in cand:
                gi = int(np.clip(np.floor(gx - offs[o][0]), 0, nx - 1))
                gj = int(np.clip(np.floor(gy - offs[o][1]), 0, ny - 1))
                out.add((int(b), a, gj, gi, round(gx - gi, 4), round(gy - gj, 4)))
    return out


def test_assignment_matches_reference_semantics(rng):
    B, M = 2, 40
    stride, ny, nx = 8.0, 16, 16
    anchors = np.array([[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]], np.float32)

    t_mask = np.zeros((B, M), bool)
    t_xyls = np.zeros((B, M, 4), np.float32)
    rows = []
    for b in range(B):
        n = rng.integers(5, 20)
        t_mask[b, :n] = True
        cx = rng.uniform(2, 126, n)
        cy = rng.uniform(2, 126, n)
        l = rng.uniform(6, 80, n)
        s = l * rng.uniform(0.3, 1.0, n)
        t_xyls[b, :n] = np.stack([cx, cy, l, s], -1)
        for i in range(n):
            rows.append((b, 0, cx[i], cy[i], l[i], s[i]))

    asn = _assign_level(
        jnp.asarray(t_xyls), jnp.asarray(t_mask), jnp.asarray(anchors), stride, ny, nx, 4.0
    )
    mask = np.asarray(asn["mask"])  # (B, M, na, 5)
    cell = np.asarray(asn["cell"])
    txy = np.asarray(asn["txy"])  # (B, M, 5, 2)

    got = set()
    for b in range(B):
        for m in range(M):
            for a in range(3):
                for o in range(5):
                    if mask[b, m, a, o]:
                        c = cell[b, m, a, o]
                        gj, gi = divmod(int(c), nx)
                        got.add(
                            (b, a, gj, gi, round(float(txy[b, m, o, 0]), 4), round(float(txy[b, m, o, 1]), 4))
                        )

    want = _np_build_targets_level(rows, stride, anchors, ny, nx)
    assert got == want, (len(got), len(want), got ^ want)


def _toy_setup(nc=3, M=8, B=2, imgsz=64):
    meta = ModelMeta(
        nc=nc,
        nl=3,
        na=3,
        strides=(8.0, 16.0, 32.0),
        anchors_px=np.array(
            [[[10, 13], [16, 30], [33, 23]],
             [[30, 61], [62, 45], [59, 119]],
             [[116, 90], [156, 198], [373, 326]]],
            np.float32,
        ),
    )
    rng = np.random.default_rng(0)
    maps = [
        jnp.asarray(rng.normal(0, 0.01, (B, imgsz // s, imgsz // s, 3, nc + 5 + 180)), jnp.float32)
        for s in (8, 16, 32)
    ]
    targets = np.zeros((B, M, 6 + 180), np.float32)
    t_mask = np.zeros((B, M), bool)
    targets[0, 0] = 0
    targets[0, 0, 0] = 1  # cls
    targets[0, 0, 1:6] = [32, 32, 20, 10, 0.3]
    targets[0, 0, 6 + 107] = 1.0  # csl peak
    t_mask[0, 0] = True
    return meta, maps, jnp.asarray(targets), jnp.asarray(t_mask)


def test_loss_finite_and_positive():
    meta, maps, targets, t_mask = _toy_setup()
    loss_fn = ComputeLoss(meta, {"box": 0.05, "obj": 1.0, "cls": 0.5, "theta": 0.5})
    total, items = loss_fn(maps, targets, t_mask)
    assert np.isfinite(float(total)) and float(total) > 0
    assert items.shape == (4,) and np.isfinite(np.asarray(items)).all()


def test_loss_zero_targets_only_obj():
    meta, maps, targets, t_mask = _toy_setup()
    t_mask = jnp.zeros_like(t_mask)
    loss_fn = ComputeLoss(meta)
    total, items = loss_fn(maps, targets, t_mask)
    lbox, lobj, lcls, ltheta = np.asarray(items)
    assert lbox == 0 and lcls == 0 and ltheta == 0 and lobj > 0


def test_loss_decreases_under_gradient():
    """A few SGD steps on the raw maps must reduce the loss (differentiability
    + sane signal; the real overfit test lives in the train-step tests)."""
    meta, maps, targets, t_mask = _toy_setup()
    loss_fn = ComputeLoss(meta)

    def f(ms):
        return loss_fn(ms, targets, t_mask)[0]

    import optax

    opt = optax.adam(0.05)
    ms = list(maps)
    state = opt.init(ms)
    g = jax.jit(jax.grad(lambda m: f(m)))
    l0 = float(f(ms))
    for _ in range(60):
        upd, state = opt.update(g(ms), state)
        ms = optax.apply_updates(ms, upd)
    l1 = float(f(ms))
    assert l1 < l0 * 0.2, (l0, l1)


def test_ciou_identity_and_disjoint():
    a = jnp.array([[5.0, 5.0, 4.0, 2.0]])
    assert float(ciou_xywh(a, a)[0]) > 0.999
    b = jnp.array([[50.0, 50.0, 4.0, 2.0]])
    assert float(ciou_xywh(a, b)[0]) < 0.0


def test_aux_loss_variants():
    """QFocal and BCEBlur (reference loss.py:18-88) behave as documented."""
    import jax.numpy as jnp
    import numpy as np

    from yolov5_obb_tpu.engine.loss import (
        bce_blur_with_logits,
        bce_with_logits,
        focal_modulation,
        qfocal_modulation,
    )

    logits = jnp.asarray([-3.0, -1.0, 0.0, 1.0, 3.0])
    targets = jnp.asarray([0.0, 0.0, 1.0, 1.0, 1.0])

    # qfocal: zero quality gap → zero modulation; large gap → larger weight
    qf = qfocal_modulation(logits, targets, gamma=1.5)
    assert float(qf[4]) < float(qf[2])  # confident correct < uncertain
    assert np.all(np.asarray(qf) >= 0)

    # focal and qfocal agree on hard 0/1 targets ordering
    f = focal_modulation(logits, targets, gamma=1.5)
    assert float(f[0]) < float(f[1])  # easy negative < harder negative

    # bce_blur: confident false positive (p>>t=0) is strongly downweighted
    blur = bce_blur_with_logits(logits, targets)
    plain = bce_with_logits(logits, targets)
    assert float(blur[1]) < float(plain[1]) * 1.01  # fp downweighted
    ratio_fp = float(blur[1] / plain[1])
    ratio_tp = float(blur[3] / plain[3])
    assert ratio_fp < ratio_tp  # false positives reduced more than positives


def test_loss_variant_hyps_finite():
    """qfl_gamma / bce_blur / fl_gamma hyp keys all produce finite, positive
    losses that differ from the plain BCE configuration."""
    meta, maps, targets, t_mask = _toy_setup()
    base = {"box": 0.05, "obj": 1.0, "cls": 0.5, "theta": 0.5}
    plain, _ = ComputeLoss(meta, base)(maps, targets, t_mask)
    for extra in ({"fl_gamma": 1.5}, {"qfl_gamma": 1.5}, {"bce_blur": 0.05}):
        total, items = ComputeLoss(meta, {**base, **extra})(maps, targets, t_mask)
        assert np.isfinite(float(total)) and float(total) > 0, extra
        assert np.isfinite(np.asarray(items)).all(), extra
        assert float(total) != float(plain), extra  # variant actually applied


def test_dense_loss_matches_gather_no_collisions():
    """The r5 scatter-free-backward (dense) loss must equal the gather
    formulation — values AND map gradients — whenever no two targets claim
    the same (cell, anchor) candidate (the only documented divergence)."""
    from yolov5_obb_tpu.ops.geometry import csl_gaussian_labels

    nc, M, B, imgsz = 5, 8, 2, 128
    meta = ModelMeta(
        nc=nc, nl=3, na=3, strides=(8.0, 16.0, 32.0),
        anchors_px=np.array(
            [[[10, 13], [16, 30], [33, 23]],
             [[30, 61], [62, 45], [59, 119]],
             [[116, 90], [156, 198], [373, 326]]], np.float32),
    )
    rng = np.random.default_rng(3)
    maps = [
        jnp.asarray(rng.normal(0, 0.05,
                               (B, imgsz // s, imgsz // s, 3, nc + 5 + 180)),
                    jnp.float32)
        for s in (8, 16, 32)
    ]
    # targets far apart (≥64 px) → no shared (cell, anchor) even at stride 32
    targets = np.zeros((B, M, 6 + 180), np.float32)
    t_mask = np.zeros((B, M), bool)
    # off-boundary coords: exact-integer grid positions make BOTH side
    # offsets fire and floor to duplicate (cell, anchor) rows (true in the
    # reference as well) — that is the documented divergence case, not the
    # equality case under test
    spots = [(26.3, 25.8), (90.1, 26.7), (25.7, 89.2), (91.4, 90.6)]
    for b in range(B):
        for i, (cx, cy) in enumerate(spots[: 3 + b]):
            th = rng.uniform(-np.pi / 2, np.pi / 2)
            targets[b, i, 0] = rng.integers(0, nc)
            targets[b, i, 1:6] = [cx, cy, rng.uniform(18, 40),
                                  rng.uniform(9, 16), th]
            targets[b, i, 6:] = csl_gaussian_labels(
                np.array([th * 180 / np.pi + 90]), radius=2.0)[0]
            t_mask[b, i] = True
    targets, t_mask = jnp.asarray(targets), jnp.asarray(t_mask)

    hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "theta": 0.5,
           "csl_radius": 2.0}
    gather_fn = ComputeLoss(meta, hyp, dense=False)
    dense_fn = ComputeLoss(meta, hyp, dense=True)

    tg, ig = gather_fn(maps, targets, t_mask)
    td, idn = dense_fn(maps, targets, t_mask)
    np.testing.assert_allclose(np.asarray(ig), np.asarray(idn),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(tg), float(td), rtol=2e-5)

    gg = jax.grad(lambda ms: gather_fn(ms, targets, t_mask)[0])(maps)
    gd = jax.grad(lambda ms: dense_fn(ms, targets, t_mask)[0])(maps)
    for a, b_ in zip(gg, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_dense_loss_collision_divergence_documented():
    """When two targets claim the same (cell, anchor) candidate the dense
    path keeps ONE (last scatter) while the gather path keeps both rows —
    this test pins the divergence so it stays a *documented* trade, and
    asserts the dense loss remains finite/sane there."""
    nc, M, B, imgsz = 3, 8, 1, 64
    meta = ModelMeta(
        nc=nc, nl=3, na=3, strides=(8.0, 16.0, 32.0),
        anchors_px=np.array(
            [[[10, 13], [16, 30], [33, 23]],
             [[30, 61], [62, 45], [59, 119]],
             [[116, 90], [156, 198], [373, 326]]], np.float32),
    )
    rng = np.random.default_rng(0)
    maps = [
        jnp.asarray(rng.normal(0, 0.05,
                               (B, imgsz // s, imgsz // s, 3, nc + 5 + 180)),
                    jnp.float32)
        for s in (8, 16, 32)
    ]
    targets = np.zeros((B, M, 6 + 180), np.float32)
    t_mask = np.zeros((B, M), bool)
    # two targets in the SAME stride-8 cell with similar size → same
    # (cell, anchor) candidates
    for i, (cx, cy) in enumerate([(26.2, 25.9), (26.9, 26.4)]):
        targets[0, i, 0] = i
        targets[0, i, 1:6] = [cx, cy, 20, 10, 0.2 + 0.1 * i]
        targets[0, i, 6 + 100 + i] = 1.0
        t_mask[0, i] = True
    targets, t_mask = jnp.asarray(targets), jnp.asarray(t_mask)

    tg, _ = ComputeLoss(meta, dense=False)(maps, targets, t_mask)
    td, items = ComputeLoss(meta, dense=True)(maps, targets, t_mask)
    assert np.isfinite(float(td)) and float(td) > 0
    assert np.isfinite(np.asarray(items)).all()
    # the divergence is real (collapsed candidate rows change the means)
    assert abs(float(tg) - float(td)) > 1e-6
