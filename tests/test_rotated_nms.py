"""Rotated NMS vs the greedy NumPy oracle, and the batched decode+NMS path."""

import numpy as np

from yolov5_obb_tpu.devkit.poly_iou import poly_iou
from yolov5_obb_tpu.ops import geometry as G
from yolov5_obb_tpu.ops.rotated_nms import (
    nms_rotated,
    nms_rotated_np,
    non_max_suppression_obb,
)


def _clustered_rboxes(rng, n, n_clusters=8, spread=400.0):
    """Random boxes clustered so plenty of pairs overlap."""
    centers = rng.uniform(100, spread, (n_clusters, 2))
    which = rng.integers(0, n_clusters, n)
    cx = centers[which, 0] + rng.normal(0, 12, n)
    cy = centers[which, 1] + rng.normal(0, 12, n)
    l = rng.uniform(20, 60, n)
    s = l * rng.uniform(0.3, 1.0, n)
    t = rng.uniform(-np.pi / 2, np.pi / 2, n)
    return np.stack([cx, cy, l, s, t], -1).astype(np.float32)


def _oracle_iou(a, b):
    return poly_iou(G.rbox2poly(a[None])[0], G.rbox2poly(b[None])[0])


def test_nms_matches_greedy_oracle():
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = 64
        boxes = _clustered_rboxes(rng, n)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        keep = np.asarray(nms_rotated(boxes, scores, 0.4))
        want = nms_rotated_np(boxes, scores, 0.4, _oracle_iou)
        assert (keep == want).all(), (seed, np.nonzero(keep != want))


def test_nms_respects_padding():
    rng = np.random.default_rng(1)
    boxes = _clustered_rboxes(rng, 32)
    scores = rng.uniform(0.1, 1.0, 32).astype(np.float32)
    scores[20:] = 0.0  # padding
    keep = np.asarray(nms_rotated(boxes, scores, 0.4))
    assert not keep[20:].any()


def test_nms_classwise():
    # identical overlapping boxes, different classes: both survive class-aware NMS
    boxes = np.array([[50, 50, 30, 20, 0.1], [50, 50, 30, 20, 0.1]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    cls = np.array([0, 1], np.int32)
    keep = np.asarray(nms_rotated(boxes, scores, 0.3, class_ids=cls))
    assert keep.all()
    keep_agn = np.asarray(nms_rotated(boxes, scores, 0.3))
    assert keep_agn.tolist() == [True, False]


def test_batched_decode_nms():
    rng = np.random.default_rng(0)
    nc = 3
    N = 256
    B = 2
    pred = np.zeros((B, N, 5 + nc + 180), np.float32)
    pred[..., 4] = rng.uniform(0, 0.2, (B, N))  # low obj everywhere
    # plant two strong detections in image 0: same spot/class (one must die)
    for j, (score, theta_bin) in enumerate([(0.95, 120), (0.9, 121)]):
        pred[0, j, :4] = [100 + j, 100, 40, 20]
        pred[0, j, 4] = score
        pred[0, j, 5 + 1] = 0.99  # class 1
        pred[0, j, 5 + nc + theta_bin] = 1.0
    # and one far away, class 0
    pred[0, 7, :4] = [400, 400, 50, 25]
    pred[0, 7, 4] = 0.8
    pred[0, 7, 5 + 0] = 0.9
    pred[0, 7, 5 + nc + 90] = 1.0

    dets, num = non_max_suppression_obb(
        pred, num_classes=nc, conf_thres=0.25, iou_thres=0.45, max_candidates=64, max_det=16
    )
    dets, num = np.asarray(dets), np.asarray(num)
    assert num[0] == 2 and num[1] == 0
    got = dets[0, :2]
    # highest score first
    assert got[0, 5] > got[1, 5]
    assert got[0, 6] == 1.0 and got[1, 6] == 0.0
    # theta of the kept strong det: bin 120 → (120-90)/180*pi
    np.testing.assert_allclose(got[0, 4], (120 - 90) / 180 * np.pi, atol=1e-6)
    np.testing.assert_allclose(got[0, :4], [100, 100, 40, 20], atol=1e-4)
    # conf = obj * cls
    np.testing.assert_allclose(got[0, 5], 0.95 * 0.99, atol=1e-5)


def test_batched_decode_multilabel():
    nc = 2
    pred = np.zeros((1, 32, 5 + nc + 180), np.float32)
    pred[0, 0, :4] = [50, 50, 30, 20]
    pred[0, 0, 4] = 0.9
    pred[0, 0, 5 + 0] = 0.8
    pred[0, 0, 5 + 1] = 0.7  # same box confident in both classes
    pred[0, 0, 5 + nc + 45] = 1.0
    dets, num = non_max_suppression_obb(
        pred, num_classes=nc, conf_thres=0.25, iou_thres=0.45,
        max_candidates=16, max_det=8, multi_label=True,
    )
    assert int(num[0]) == 2  # one detection per class survives class-aware NMS


def test_classes_filter_and_agnostic():
    """--classes keeps only listed ids; --agnostic suppresses across classes."""
    nc = 3
    N = 64
    pred = np.zeros((1, N, 5 + nc + 180), np.float32)
    # box A: class 1, strong; box B: same spot, class 2, weaker
    for j, (c, score) in enumerate([(1, 0.95), (2, 0.9)]):
        pred[0, j, :4] = [100, 100, 40, 20]
        pred[0, j, 4] = score
        pred[0, j, 5 + c] = 0.99
        pred[0, j, 5 + nc + 120] = 1.0
    # box C: far away, class 0
    pred[0, 7, :4] = [400, 400, 50, 25]
    pred[0, 7, 4] = 0.8
    pred[0, 7, 5 + 0] = 0.9
    pred[0, 7, 5 + nc + 90] = 1.0

    kw = dict(num_classes=nc, conf_thres=0.25, iou_thres=0.45,
              max_candidates=32, max_det=8, approx_topk=False)

    dets, num = non_max_suppression_obb(pred, **kw)
    assert int(num[0]) == 3  # per-class NMS: A and B both survive

    dets, num = non_max_suppression_obb(pred, agnostic=True, **kw)
    assert int(num[0]) == 2  # agnostic: B suppressed by A

    dets, num = non_max_suppression_obb(pred, classes=(0,), **kw)
    assert int(num[0]) == 1
    assert dets[0, 0, 6] == 0  # only the class-0 box kept

    dets, num = non_max_suppression_obb(pred, classes=(0, 2), **kw)
    kept = sorted(int(c) for c in np.asarray(dets[0, : int(num[0]), 6]))
    assert kept == [0, 2]


def test_neighbor_order_paths_agree():
    """Sort-free score-order selection == top-k selection when rows don't
    overflow the cap, and both match the greedy oracle."""
    from yolov5_obb_tpu.ops.rotated_nms import nms_rotated

    rng = np.random.default_rng(3)
    n = 128
    rb = np.zeros((n, 5), np.float32)
    rb[:, 0] = rng.uniform(0, 300, n)
    rb[:, 1] = rng.uniform(0, 300, n)
    rb[:, 2] = rng.uniform(20, 80, n)
    rb[:, 3] = rb[:, 2] * rng.uniform(0.3, 1.0, n)
    rb[:, 4] = rng.uniform(-np.pi / 2, np.pi / 2, n)
    sc = rng.uniform(0.05, 1.0, n).astype(np.float32)
    k_score = np.asarray(nms_rotated(rb, sc, 0.3, neighbor_order="score"))
    k_iou = np.asarray(nms_rotated(rb, sc, 0.3, neighbor_order="iou"))
    assert np.array_equal(k_score, k_iou)

    def iou_fn(a, b):
        pa = G.rbox2poly(a[None])[0]
        pb = G.rbox2poly(b[None])[0]
        return poly_iou(pa, pb)

    oracle = nms_rotated_np(rb, sc, 0.3, iou_fn)
    assert np.array_equal(k_score, oracle)

def test_compact_dets_matches_topk_formulation():
    """_compact_dets ≡ the lax.top_k(final, max_det) + gather formulation it
    replaced (including tie order, overflow truncation, and padding)."""
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.rotated_nms import _compact_dets

    rng = np.random.default_rng(3)
    for n, max_det, kept_frac in [(64, 16, 0.5), (64, 16, 0.1), (32, 64, 0.4),
                                  (128, 128, 1.0)]:
        rb = rng.uniform(0, 500, (n, 5)).astype(np.float32)
        # descending scores with deliberate ties and zero (invalid) tail rows
        scores = np.sort(rng.choice([0.9, 0.7, 0.5, 0.3], n))[::-1].copy()
        scores[-4:] = 0.0
        scores = scores.astype(np.float32)
        cls_id = rng.integers(0, 5, n).astype(np.int32)
        keep = rng.random(n) < kept_frac

        det, num = _compact_dets(jnp.asarray(rb), jnp.asarray(scores),
                                 jnp.asarray(cls_id), jnp.asarray(keep), max_det)
        det, num = np.asarray(det), int(num)

        final = np.where(keep, scores, 0.0)
        k = min(max_det, n)
        top_i = np.argsort(-final, kind="stable")[:k]
        top_s = final[top_i]
        want = np.concatenate(
            [rb[top_i], top_s[:, None], cls_id[top_i].astype(np.float32)[:, None]],
            axis=-1,
        ) * (top_s > 0)[:, None]
        if max_det > n:
            want = np.pad(want, ((0, max_det - n), (0, 0)))
        assert det.shape == (max_det, 7)
        np.testing.assert_allclose(det, want, atol=1e-6, err_msg=f"{n},{max_det}")
        assert num == int((top_s > 0).sum())


def test_compact_select_matches_topk():
    """compact_select ≡ exact lax.top_k (set and sorted scores) whenever
    #positives <= k — the sort-free exact selection fast path."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.rotated_nms import compact_select

    rng = np.random.default_rng(7)
    for n, k, pos in [(4096, 512, 300), (4096, 512, 512), (1024, 256, 0),
                      (8192, 1024, 7)]:
        gate = np.zeros(n, np.float32)
        if pos:
            idx = rng.choice(n, pos, replace=False)
            gate[idx] = rng.uniform(0.26, 0.99, pos)
        sc, ic = compact_select(jnp.asarray(gate), k)
        sc, ic = np.asarray(sc), np.asarray(ic)
        order = np.argsort(-gate, kind="stable")[:k]
        want = gate[order]
        m = int((want > 0).sum())
        np.testing.assert_allclose(sc[:m], want[:m], rtol=0, atol=0)
        assert (sc[m:] == 0).all()
        assert set(ic[:m].tolist()) == set(order[:m].tolist())
        # unsorted variant returns the same index set
        sc2, ic2 = compact_select(jnp.asarray(gate), k, sort=False)
        assert set(np.asarray(ic2)[np.asarray(sc2) > 0].tolist()) == set(
            order[:m].tolist())


def test_compact_select_slots_overflow():
    """slots > k keeps the top-k EXACT when #positives exceeds k (but not
    slots) — the production regime the batched fast paths now cover with
    slots=4*k."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.rotated_nms import compact_select

    rng = np.random.default_rng(11)
    for n, k, slots, pos in [(8192, 512, 2048, 1500),
                             (8192, 512, 2048, 2048),
                             (4096, 128, 512, 130),
                             (4096, 128, 512, 100)]:
        gate = np.zeros(n, np.float32)
        idx = rng.choice(n, pos, replace=False)
        gate[idx] = rng.uniform(0.26, 0.99, pos)
        sc, ic = compact_select(jnp.asarray(gate), k, slots=slots)
        sc, ic = np.asarray(sc), np.asarray(ic)
        order = np.argsort(-gate, kind="stable")[:k]
        want = gate[order]
        m = int((want > 0).sum())
        np.testing.assert_allclose(sc[:m], want[:m], rtol=0, atol=0)
        assert (sc[m:] == 0).all()
        assert set(ic[:m].tolist()) == set(order[:m].tolist())


def test_suppress_tier_ladder_exact():
    """The adaptive k→k/2→k/4 suppression lattice (r5 quarter tier for the
    low-conf val regime) must be EXACT at every density: per-image keep
    sets equal the greedy oracle whether the batch lands on the quarter,
    half, or full lattice."""
    import jax.numpy as jnp

    from yolov5_obb_tpu.ops.rotated_nms import _suppress_compact_batch

    k, max_det = 1024, 600
    rng = np.random.default_rng(5)
    # densities straddling the tier bounds: ≤256 (quarter), ≤512 (half),
    # >512 (full lattice)
    for density in (200, 400, 700):
        rb = np.zeros((1, k, 5), np.float32)
        sc = np.zeros((1, k), np.float32)
        cid = np.zeros((1, k), np.float32)
        boxes = _clustered_rboxes(rng, density, n_clusters=10, spread=600.0)
        scores = np.sort(rng.uniform(0.1, 1.0, density))[::-1].astype(
            np.float32)  # presorted, zeros padding after
        rb[0, :density] = boxes
        sc[0, :density] = scores
        dets, num = _suppress_compact_batch(
            jnp.asarray(rb), jnp.asarray(sc), jnp.asarray(cid),
            iou_thres=0.4, agnostic=True, max_det=max_det)
        dets, num = np.asarray(dets), np.asarray(num)

        want_keep = nms_rotated_np(boxes, scores, 0.4, _oracle_iou)
        want_boxes = boxes[want_keep.astype(bool)]
        assert num[0] == want_boxes.shape[0], (density, num[0])
        np.testing.assert_allclose(dets[0, :num[0], :4],
                                   want_boxes[:, :4], atol=1e-3)
