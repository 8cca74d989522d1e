"""Rotated NMS and the batched OBB decode+NMS post-processing path.

TPU-native replacement for the reference's CUDA extension + per-image Python
loop (utils/nms_rotated/src/nms_rotated_cuda.cu:12-134 and
utils/general.py:772-861 ``non_max_suppression_obb``):

* static shapes end-to-end: top-k candidate selection instead of boolean
  indexing, padded ``(max_det, 7)`` outputs with a validity count;
* the greedy suppression scan is computed as a *fixed-point iteration*
  ``alive[j] <- ¬∃ i<j : alive[i] ∧ iou(i,j) > thr`` (score-sorted order).
  Any fixed point of that equation is, by induction over score order, the
  unique greedy-NMS solution — so a ``lax.while_loop`` that stops at
  no-change is exact while running each sweep as one (n,n)·(n,) matvec on
  the MXU instead of the reference's host-side sequential bitmask scan
  (nms_rotated_cuda.cu:105-128);
* class separation is a mask on the IoU matrix rather than the reference's
  ``+class*4096`` coordinate-offset trick (general.py:849-851), which would
  destroy f32 precision on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .rotated_iou import rotated_iou

PI = 3.141592653589793


def _hbb_cover(rboxes):
    """Axis-aligned cover (x1 y1 x2 y2) of rboxes — closed form, no vertices."""
    cx, cy, l, s, t = (rboxes[..., i] for i in range(5))
    ct, st = jnp.abs(jnp.cos(t)), jnp.abs(jnp.sin(t))
    w = l * ct + s * st
    h = l * st + s * ct
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def _hbb_iou_matrix(hbb):
    """(n,4) xyxy → (n,n) IoU.

    Math stays f32: casting the *coordinates* to bf16 would quantize a
    few-pixel box at x~1000 to zero width (4-8 px coordinate spacing) and
    silently drop true suppression edges. Only the materialized output may
    be narrowed by the caller — XLA fuses these intermediates, so the f32
    math costs no HBM traffic."""
    a1 = jnp.maximum(hbb[:, None, :2], hbb[None, :, :2])
    a2 = jnp.minimum(hbb[:, None, 2:], hbb[None, :, 2:])
    inter = jnp.clip(a2 - a1, 0).prod(-1)
    area = jnp.clip(hbb[:, 2:] - hbb[:, :2], 0).prod(-1)
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


def _riou_upper_bound(rboxes, hbb):
    """(n,n) provable upper bound on the pairwise *rotated* IoU.

    riou = I_r/U_r with I_r ≤ I_cover (each rbox ⊆ its cover, so their
    intersection is inside the covers' intersection) and U_r ≥ max of the
    two rbox areas — so riou ≤ inter_cover / max(areaA, areaB). Pairs whose
    bound is below the NMS threshold provably cannot suppress, which makes
    the top-M neighbour cap far harder to saturate than ranking by raw
    cover IoU."""
    a1 = jnp.maximum(hbb[:, None, :2], hbb[None, :, :2])
    a2 = jnp.minimum(hbb[:, None, 2:], hbb[None, :, 2:])
    inter = jnp.clip(a2 - a1, 0).prod(-1)
    area = rboxes[:, 2] * rboxes[:, 3]  # exact rotated-box areas
    return inter / jnp.maximum(jnp.maximum(area[:, None], area[None, :]), 1e-9)


def _first_m_neighbors(edge_ok, M: int):
    """Select the first ``M`` true columns per row of ``edge_ok`` (n, n) —
    sort-free compaction.

    Rows are in descending-score order, so "first M" = the M *highest-scored*
    admissible neighbours.  A 2048-wide ``top_k`` costs ~1.5 ms/img on TPU
    (121 bitonic stages over the full matrix); this replaces it with one
    lane-dim cumsum plus the same fused one-hot-compare reduce the dense
    suppression build uses (measured 8x faster than scatter,
    tools/bench_scatter_vs_compare.py).

    Returns (nbr_idx (n, M) int32, nbr_valid (n, M) bool).
    """
    n = edge_ok.shape[0]
    # f32 cumsum: counts ≤ n < 2^24 are exact; keeps lane-dim layout
    pos = jnp.cumsum(edge_ok.astype(jnp.float32), axis=1)  # rank of col among row's edges
    count = jnp.minimum(pos[:, -1], float(M))  # per-row selected count
    tgt = jnp.arange(1, M + 1, dtype=jnp.float32)  # slot p holds the p-th edge
    # one-hot over columns, c on the lane (last) dim: (n, M, n) never
    # materialises — XLA fuses compare → select → sum like the S build below
    onehot = (pos[:, None, :] == tgt[None, :, None]) & edge_ok[:, None, :]
    iota_c = jnp.arange(n, dtype=jnp.float32)
    nbr_idx = jnp.sum(
        onehot.astype(jnp.float32) * iota_c[None, None, :], axis=-1
    ).astype(jnp.int32)
    nbr_valid = tgt[None, :] <= count[:, None]
    return nbr_idx, nbr_valid


def nms_rotated(rboxes, scores, iou_thr: float, class_ids=None,
                max_neighbors: int = 64, presorted: bool = False,
                neighbor_order: str = "score"):
    """Greedy rotated NMS over static-shaped inputs — sparse exact algorithm.

    A dense n×n exact rotated-IoU matrix materialises n²·24-point clip
    buffers (34 GB at n=2048, b=16 — see the CUDA kernel it replaces,
    nms_rotated_cuda.cu:13-68, which streams 64-box tiles for the same
    reason).  Instead:

    1. cheap n×n *upper bound* on the rotated IoU from the axis-aligned
       covers (riou ≤ inter_cover / max(areaA, areaB)) — pairs whose bound
       is below ``iou_thr`` provably cannot suppress;
    2. per box, the top-``max_neighbors`` highest-bound *higher-scored*
       same-class boxes (sparse suppression graph);
    3. exact rotated IoU only on those n×M pairs;
    4. greedy resolution as a fixed-point sweep over the sparse graph
       (any fixed point of ``alive[j] = ¬∃ i→j : alive[i]`` in score order
       is the unique greedy solution).

    Args:
        rboxes: ``(n, 5)`` ``[cx cy l s theta]``; padding rows allowed.
        scores: ``(n,)``; padding / invalid boxes must carry score <= 0.
        iou_thr: suppression threshold.
        class_ids: optional ``(n,)`` int; suppression only within a class.
        max_neighbors: sparse-graph degree cap (exact as long as no box has
            more threshold-capable higher-scored neighbours than this).
        presorted: scores are already descending (e.g. straight out of
            ``top_k``) — skips the argsort + permutation gathers.
        neighbor_order: which M neighbours to keep when a box has more than
            ``max_neighbors`` admissible ones: ``"score"`` keeps the M
            highest-scored via a sort-free cumsum compaction (fast path);
            ``"iou"`` keeps the M highest-upper-bound via an exact 2048-wide
            ``top_k`` (~1.5 ms/img slower on TPU). Identical results when no
            row overflows the cap (the overwhelmingly common case).

    Returns:
        keep: ``(n,)`` bool mask of surviving boxes (in input order).
    """
    n = scores.shape[0]
    M = min(max_neighbors, n)
    if presorted:
        order = None
        b, s = rboxes, scores
    else:
        order = jnp.argsort(-scores)
        b = rboxes[order]
        s = scores[order]
    valid = s > 0

    # TPU fast path: edge test + first-M compaction + exact pair IoU fused
    # in one VMEM-resident Pallas pass (ops/pallas/neighbor_kernel.py) —
    # skips the (n, n) cumsum/one-hot HBM passes and the pair gather
    if (
        neighbor_order == "score"
        and jax.default_backend() == "tpu"
        and n % 128 == 0
        and M <= 128
        and 128 % M == 0
    ):
        from .pallas.neighbor_kernel import fused_neighbor_iou

        c = None
        if class_ids is not None:
            c = class_ids if presorted else class_ids[order]
        nbr_idx, sup_in = fused_neighbor_iou(
            b, c, valid, float(iou_thr), max_neighbors=M
        )
        return _resolve_greedy(sup_in, nbr_idx, valid, n, order)

    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)  # [j, i]: i<j in score
    # only pairs whose rotated-IoU upper bound clears the threshold can
    # suppress (see _riou_upper_bound); the 0.98 slack keeps float rounding
    # from masking a borderline true edge
    if neighbor_order == "score":
        # threshold test only — no bound *values* needed, so the divide in
        # inter/max(areaA, areaB) > thr becomes a multiply on the rhs
        hbb = _hbb_cover(b)
        a1 = jnp.maximum(hbb[:, None, :2], hbb[None, :, :2])
        a2 = jnp.minimum(hbb[:, None, 2:], hbb[None, :, 2:])
        inter = jnp.clip(a2 - a1, 0).prod(-1)
        area = b[:, 2] * b[:, 3]
        cap = (iou_thr * 0.98) * jnp.maximum(area[:, None], area[None, :])
        bound_ok = inter > cap
    else:
        ub = _riou_upper_bound(b, _hbb_cover(b))  # (n, n)
        bound_ok = ub > iou_thr * 0.98
    edge_ok = tri & valid[None, :] & valid[:, None] & bound_ok
    if class_ids is not None:
        c = class_ids if presorted else class_ids[order]
        edge_ok = edge_ok & (c[:, None] == c[None, :])

    # neighbor selection is EXACT (approx_max_k's ~0.95 recall can miss a
    # true suppressor edge and let duplicate detections through). The fast
    # path avoids any top-k sort: only threshold-capable pairs are edges,
    # so per row we just compact the first M admissible columns, which in
    # descending-score order are the M highest-scored neighbours.
    if neighbor_order == "score":
        nbr_idx, nbr_valid = _first_m_neighbors(edge_ok, M)
    else:
        cand = jnp.where(edge_ok, ub, -1.0).astype(jnp.bfloat16)  # (n_j, n_i)
        nbr_iou, nbr_idx = jax.lax.top_k(cand, M)  # (n, M)
        nbr_valid = nbr_iou > 0.0

    # exact rotated IoU on the sparse pairs only; on TPU the Pallas kernel
    # keeps all clip/ordering buffers in VMEM (ops/pallas/iou_kernel.py)
    if jax.default_backend() == "tpu":
        from .pallas.iou_kernel import sparse_rotated_iou

        riou = sparse_rotated_iou(b, nbr_idx)
    else:
        pair_b = b[nbr_idx]  # (n, M, 5)
        riou = rotated_iou(b[:, None, :], pair_b)  # (n, M)
    sup_in = nbr_valid & (riou > iou_thr)  # j suppressed-by-edge from nbr_idx[j,m]
    return _resolve_greedy(sup_in, nbr_idx, valid, n, order)


def _resolve_greedy(sup_in, nbr_idx, valid, n, order):
    """Sparse suppression edges → greedy-NMS keep mask.

    Densify the sparse edges into an (n, n) 0/1 matrix ONCE, so each
    fixed-point sweep is an MXU matvec instead of an (n, M) gather — TPU
    gathers/scatters run ~1 elem/cycle and dominated this kernel's runtime.
    The build itself is a one-hot comparison fused into the any-reduce
    (S[j,i] = ∃m: nbr_idx[j,m]==i ∧ sup[j,m]); measured ~8x faster than the
    equivalent scatter (tools/bench_scatter_vs_compare.py). bf16 is exact
    for {0,1} and matvec row sums ≤ M << 256."""
    iota_n = jnp.arange(n, dtype=nbr_idx.dtype)
    S = jnp.any(
        (nbr_idx[:, :, None] == iota_n[None, None, :]) & sup_in[:, :, None],
        axis=1,
    ).astype(jnp.bfloat16)

    def cond(state):
        alive, prev, it = state
        return jnp.logical_and(jnp.any(alive != prev), it < n)

    def body(state):
        alive, _, it = state
        hit = (
            jnp.dot(S, alive.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) > 0.0
        )
        return (valid & ~hit, alive, it + 1)

    alive0 = valid
    alive, _, _ = jax.lax.while_loop(cond, body, (alive0, ~alive0, jnp.int32(0)))

    if order is None:
        return alive
    return jnp.zeros_like(alive).at[order].set(alive)


def _compact_dets(rb, scores, cls_id, keep, max_det: int):
    """Stable front-compaction of the kept candidate rows → ``(max_det, 7)``.

    Candidates arrive score-descending (straight out of ``top_k``), so the
    final det list is just the kept rows in input order — no re-sort needed.
    ``lax.top_k(final, max_det)`` with max_det≈n is a full bitonic sort on
    TPU; this replaces it with a lane-dim cumsum (slot assignment) plus one
    one-hot matmul that copies the 7 det columns on the MXU (same pattern as
    ``_first_m_neighbors``; measured 8x faster than scatter/gather styles).
    ``Precision.HIGHEST`` because the dot copies VALUES — the default
    single-pass bf16 dot would quantize coordinates (see CLAUDE.md).

    Returns (det (max_det, 7), num int32) — identical to the
    ``top_k`` + gather formulation, including zero padding rows.
    """
    n = scores.shape[0]
    det = jnp.concatenate(
        [rb, scores[:, None], cls_id.astype(jnp.float32)[:, None]], axis=-1
    )
    kept = keep & (scores > 0)
    pos = jnp.cumsum(kept.astype(jnp.float32)) * kept  # 1-based slot, 0 = dropped
    m = min(max_det, n)
    tgt = jnp.arange(1, m + 1, dtype=jnp.float32)
    onehot = (pos[None, :] == tgt[:, None]).astype(jnp.float32)  # (m, n)
    out = jnp.matmul(onehot, det, precision=jax.lax.Precision.HIGHEST)
    if max_det > n:
        out = jnp.pad(out, ((0, max_det - n), (0, 0)))
    num = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), m)
    return out, num


def _topk_pairs_exact(cc_i, conf_thres: float, k: int, nc: int):
    """Exact top-k over the thresholded multi-label ``(box, cls)`` pairs via
    a box prefilter — two small sorts instead of one ``(N*nc,)`` sort.

    Let τ be the k-th largest thresholded pair confidence.  Any pair
    ``(b, c)`` with conf ≥ τ has per-box best ``max_c cc[b, c] ≥ τ``, and at
    most k boxes can have best ≥ τ (each contributes at least one of the k
    pairs ≥ τ), so the exact top-k boxes by best confidence contain every
    box of every top-k pair; re-ranking their ``(k, nc)`` pairs is then
    exact.  Ties at τ resolve by selector order, exactly as a single-stage
    ``top_k``.  The reference's obj gate (general.py:784-798) is implied:
    ``cc = cls_sigmoid * obj ≤ obj``, so ``cc > conf ⟹ obj > conf``.

    Sort sizes: N + k·nc instead of N·nc — at the production shape
    (N=64512, nc=15, k=4096) ~8x less sort work on the TPU's
    sort-based ``top_k``.

    Returns ``(scores, box_idx, cls_id)``, each ``(min(k, kb*nc),)``.
    """
    n = cc_i.shape[0]
    kb = min(k, n)
    best = jnp.max(cc_i, axis=-1)
    gate = jnp.where(best > conf_thres, best, 0.0)
    _, bidx = jax.lax.top_k(gate, kb)
    sub = cc_i[bidx]  # (kb, nc)
    sub = jnp.where(sub > conf_thres, sub, 0.0)
    scores, idx2 = jax.lax.top_k(sub.reshape(-1), min(k, kb * nc))
    return scores, bidx[idx2 // nc], idx2 % nc


def compact_select(gate, k: int, sort: bool = True, slots: int | None = None):
    """Exact top-k of a THRESHOLDED score vector without sorting it.

    ``jax.lax.top_k`` over the full anchor axis is a bitonic sort of
    N=64512 keys per image — the dominant selection cost since exact
    selection became the default.  When the number of positive entries is
    at most ``slots`` (the production regime at conf 0.25), the top-k SET
    is contained in the first ``slots`` nonzeros — no N-wide sort needed:

      1. slot assignment: ``pos = cumsum(gate > 0)`` (order-preserving);
      2. compaction as ONE MXU matmul via two-level slot decomposition
         ``pos = hi*128 + lo``: out[hi, lo] = Σ_i A[hi, i]·L[i, lo] with
         ``A[h, i] = [hi_i == h]·(i + 1)`` carrying the anchor index
         (f32, ``Precision.HIGHEST`` — each output slot receives exactly
         one nonzero term, so the copy is exact) and ``L`` the {0,1}
         lane one-hot (bf16).  Replaces the (k, N) one-hot that a direct
         ``_compact_dets``-style compaction would materialise (528 MB);
      3. (``sort=True``) one ``top_k(..., k)`` over the ``slots``
         compacted scores — a slots-wide sort instead of N-wide.

    ``slots`` (default ``k``) decouples the exactness bound from the
    returned size: with ``slots=4*k`` the fast path stays exact at 4x
    the candidate overflow, for one extra cheap slots-wide sort stage.
    EXACT iff ``#nonzero <= slots``; callers must guard the overflow case
    with a batch-level ``lax.cond`` fallback to ``top_k`` (see
    ``non_max_suppression_from_maps``).  Returns ``(scores, idx)``
    score-descending (or slot-ordered when ``sort=False``, where ``k``
    must equal ``slots``), zero-padded.
    """
    n = gate.shape[0]
    k = min(k, n)
    if slots is None:
        slots = k
    slots = min(max(slots, k), n)
    if not sort and slots != k:
        raise ValueError("sort=False requires slots == k (slot order)")
    kept = gate > 0
    # 1-based slot, 0 = dropped; f32 cumsum exact to 2^24 >> n
    pos = jnp.cumsum(kept.astype(jnp.float32)) * kept.astype(jnp.float32)
    pos = pos - 1.0  # 0-based, -1 = dropped (matches no hi row)
    rows = -(-slots // 128)
    hi = jnp.floor(pos * (1.0 / 128.0))  # exact: /128 is a 2^-7 scale
    lo = pos - hi * 128.0
    av = jnp.where(kept, jnp.arange(n, dtype=jnp.float32) + 1.0, 0.0)
    A = jnp.where(
        hi[None, :] == jnp.arange(rows, dtype=jnp.float32)[:, None],
        av[None, :], 0.0)  # (rows, n) f32, carries index+1
    L = (lo[:, None] == jnp.arange(128, dtype=jnp.float32)[None, :]
         ).astype(jnp.bfloat16)  # (n, 128) {0,1}
    slotv = jax.lax.dot_general(
        A, L, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    idx = slotv.reshape(rows * 128)[:slots].astype(jnp.int32) - 1
    valid = idx >= 0
    sc = jnp.where(valid, gate[jnp.maximum(idx, 0)], 0.0)
    idx = jnp.where(valid, idx, 0)
    if not sort:
        return sc, idx
    sc, order = jax.lax.top_k(sc, k)
    return sc, jnp.where(sc > 0, idx[order], 0)


def _batched_exact_select(gate, k: int):
    """Batched exact selection over a thresholded (B, N) gate: the
    sort-free ``compact_select`` fast path when every image has at most
    ``4*k`` positives (``slots=4*k`` decouples the exactness bound from
    the NMS candidate budget — at the realistic bench density images
    carry 2-3x ``k`` positives, which used to kick the whole batch onto
    the N-wide sort), with a whole-batch ``lax.cond`` fallback to the
    N-wide ``top_k`` otherwise — the predicate is batch-scalar, so only
    ONE branch executes (a per-image cond under vmap would lower to a
    select that runs both)."""
    slots = min(4 * k, gate.shape[1])
    counts = jnp.sum((gate > 0).astype(jnp.int32), axis=1)
    return jax.lax.cond(
        jnp.all(counts <= slots),
        lambda g: tuple(
            jax.vmap(lambda gi: compact_select(gi, k, slots=slots))(g)),
        lambda g: tuple(jax.vmap(lambda gi: jax.lax.top_k(gi, k))(g)),
        gate)


def _batched_exact_pairs(cls_conf, conf_thres: float, k: int, nc: int):
    """Batched exact multi-label (box, cls) pair selection: two-stage
    compaction (boxes unsorted, then pairs sorted) when every image has
    at most ``slots=4*k`` positive pairs — #positive boxes <= #positive
    pairs, so one predicate covers both stages — else the sort-based
    ``_topk_pairs_exact``."""
    n_boxes = cls_conf.shape[1]
    slots = min(4 * k, n_boxes * nc)  # pairs-count exactness bound
    bslots = min(slots, n_boxes)  # boxes <= pairs <= slots, and <= N
    counts = jnp.sum((cls_conf > conf_thres).astype(jnp.int32), axis=(1, 2))

    def fast(cc):
        def one(cc_i):
            best = jnp.max(cc_i, axis=-1)
            gate = jnp.where(best > conf_thres, best, 0.0)
            bsc, bidx = compact_select(gate, bslots, sort=False)
            sub = cc_i[bidx] * (bsc > 0).astype(cc_i.dtype)[:, None]
            flat = jnp.where(sub > conf_thres, sub, 0.0).reshape(-1)
            sc, fi = compact_select(flat, k, slots=min(slots, flat.shape[0]))
            return sc, bidx[fi // nc], fi % nc

        return tuple(jax.vmap(one)(cc))

    def slow(cc):
        return tuple(jax.vmap(
            lambda cc_i: _topk_pairs_exact(cc_i, conf_thres, k, nc))(cc))

    return jax.lax.cond(jnp.all(counts <= slots), fast, slow, cls_conf)


def _suppress_compact_batch(rb, scores, cls_id, iou_thres: float,
                            agnostic: bool, max_det: int):
    """Batched suppression + det compaction with ADAPTIVE lattice size.

    The suppression cost is quadratic in the candidate budget ``k`` (edge
    lattice, dense suppression matrix, sweep matvecs), but the realistic
    regime fills only a fraction of the budget: rows arrive score-sorted,
    so when every image has at most ``k//2`` positive candidates the NMS
    over the first ``k//2`` rows is EXACT — a batch-scalar ``lax.cond``
    picks the half lattice (~4x less edge/matrix work) and falls back to
    the full one otherwise.  Same trick as ``_batched_exact_select``; the
    predicate must be batch-level (a per-image cond under vmap lowers to
    a select that runs both branches).
    """
    B, k = scores.shape

    def run_at(kk: int):
        def f(args):
            rb_, sc_, cid_ = args
            rb_s, sc_s, cid_s = rb_[:, :kk], sc_[:, :kk], cid_[:, :kk]

            def one(rb_i, sc_i, cid_i):
                keep = nms_rotated(
                    rb_i, sc_i, iou_thres,
                    class_ids=None if agnostic else cid_i,
                    presorted=True)
                return _compact_dets(rb_i, sc_i, cid_i, keep, max_det)

            return jax.vmap(one)(rb_s, sc_s, cid_s)

        return f

    # tier ladder k → k/2 → k/4 (suppression cost is ~quadratic in the
    # lattice size, so each tier is ~4x cheaper): rows arrive score-sorted,
    # so NMS over the first ``t`` rows is EXACT whenever every image has
    # at most ``t`` positive candidates.  Each tier must satisfy the fused
    # kernel's layout contract on TPU (n % 128 == 0); tiny k isn't worth
    # the extra compiles.  The low-conf val regime (conf 0.01-0.05,
    # multi-label, 4096-candidate budget) is where the deeper tiers pay:
    # most val images fill a fraction of the budget (see
    # tools/bench_dense_stages.py val-regime row in PARITY.md).
    tiers = [t for t in (k // 2, k // 4)
             if t >= 256 and t % 128 == 0 and k >= 512]
    if not tiers:
        return run_at(k)((rb, scores, cls_id))
    counts = jnp.sum((scores > 0).astype(jnp.int32), axis=1)
    mx = jnp.max(counts)

    def pick(remaining):
        t = remaining[0]
        if len(remaining) == 1:
            return lambda args: jax.lax.cond(mx <= t, run_at(t), run_at(k),
                                             args)
        return lambda args: jax.lax.cond(
            mx <= remaining[-1], run_at(remaining[-1]), pick(remaining[:-1]),
            args)

    return pick(tiers)((rb, scores, cls_id))


def _apply_class_filter(cls_conf, classes, nc: int):
    """Zero the confidence of classes outside ``classes`` (a static tuple of
    kept ids) — reference ``--classes`` filter (general.py:833-835) applied
    before candidate selection, so excluded classes never enter NMS."""
    if classes is None:
        return cls_conf
    keep = jnp.zeros((nc,), cls_conf.dtype).at[jnp.asarray(classes)].set(1.0)
    return cls_conf * keep


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "conf_thres",
        "iou_thres",
        "max_candidates",
        "max_det",
        "multi_label",
        "agnostic",
        "approx_topk",
        "classes",
    ),
)
def non_max_suppression_obb(
    prediction,
    num_classes: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_candidates: int = 4096,
    max_det: int = 1500,
    multi_label: bool = False,
    agnostic: bool = False,
    approx_topk: bool = False,
    classes: tuple | None = None,
):
    """Batched decode + rotated NMS of raw head outputs.

    ``approx_topk`` (``jax.lax.approx_max_k`` candidate selection) is an
    opt-in bench mode, NOT the default: measured on v5e hardware at the
    realistic bench regime (yolov5m@1024, ~430 dets/img, conf 0.25,
    max_candidates=4096) it silently dropped ~12% of final detections
    (18086 vs 20581 over 48 images, worst image -340) because the
    conf-thresholded candidate array is sparse — approx_max_k's
    bin-reduction collides several true candidates into one bin and keeps
    only the bin max (tools/check_approx_topk_tpu.py). Exact ``top_k``
    matches the reference's exact candidate set (general.py:784-827) and
    costs ~1.3 ms/img more at that density.

    Args:
        prediction: ``(B, n_anchors, 5+nc+180)`` decoded sigmoid outputs
            ``[cx cy l s obj cls... theta_bins...]`` in image pixels
            (the Detect head's inference concat).
        num_classes: nc.

    Returns:
        dets: ``(B, max_det, 7)`` ``[cx cy l s theta conf cls]``,
            theta ∈ [-pi/2, pi/2) decoded as ``(argmax_bin - 90)°``
            (reference general.py:822-823).
        num: ``(B,)`` int32 count of valid rows (rows are score-sorted;
            invalid rows are zero).
    """
    nc = num_classes
    boxes = prediction[..., :4]
    obj = prediction[..., 4]
    cls_conf = prediction[..., 5 : 5 + nc] * obj[..., None]  # conf = obj * cls
    cls_conf = _apply_class_filter(cls_conf, classes, nc)

    B, N = obj.shape
    k = min(max_candidates, N * nc if multi_label else N)
    topk = jax.lax.approx_max_k if approx_topk else jax.lax.top_k

    if multi_label and not approx_topk:
        scores, box_idx, cls_id = _batched_exact_pairs(
            cls_conf, conf_thres, k, nc)
    elif multi_label:
        def sel_image(cls_conf_i, obj_i):
            flat = jnp.where(
                (cls_conf_i > conf_thres) & (obj_i[:, None] > conf_thres),
                cls_conf_i,
                0.0,
            ).reshape(-1)  # (N*nc,)
            scores, idx = topk(flat, k)
            return scores, idx // nc, idx % nc

        scores, box_idx, cls_id = jax.vmap(sel_image)(cls_conf, obj)
    else:
        best = jnp.max(cls_conf, axis=-1)
        gate = jnp.where((best > conf_thres) & (obj > conf_thres), best, 0.0)
        if approx_topk:
            scores, box_idx = jax.vmap(lambda g: topk(g, k))(gate)
        else:
            scores, box_idx = _batched_exact_select(gate, k)
        cls_id = jnp.take_along_axis(
            jnp.argmax(cls_conf, axis=-1), box_idx, axis=1)

    def assemble(scores, box_idx, boxes_i, theta_logits_i):
        # theta argmax only on selected candidates ((k,180) not (N,180))
        theta_idx = jnp.argmax(theta_logits_i[box_idx], axis=-1)
        theta = (theta_idx.astype(jnp.float32) - 90.0) / 180.0 * PI
        return jnp.concatenate(
            [boxes_i[box_idx], theta[:, None]], axis=-1)  # (k, 5)

    rb = jax.vmap(assemble)(scores, box_idx, boxes, prediction[..., 5 + nc:])
    return _suppress_compact_batch(rb, scores, cls_id, iou_thres, agnostic,
                                   max_det)


def non_max_suppression_from_maps(
    maps,
    meta,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_candidates: int = 4096,
    max_det: int = 1500,
    multi_label: bool = False,
    agnostic: bool = False,
    approx_topk: bool = False,
    classes: tuple | None = None,
    stage: str = "full",
):
    """Decode + NMS fused over raw Detect maps — avoids materialising the
    full ``(B, N, 5+nc+180)`` sigmoid tensor (~800 MB at b16/1024): only
    per-anchor *planes* (decoded x/y/w/h, obj, best-class score/id, theta
    argmax) are formed before candidate selection.

    ``maps`` may be the Detect head's 5-D per-level outputs
    ``(B, ny, nx, na, no)`` or the flat 3-D form ``(B, ny*nx*na, no)``
    (``model.apply(..., flat=True)``).  The flat form is the TPU fast path:
    the 5-D layout puts ``na=3`` on the sublane dim (padded 3→8, ~2.7x HBM
    inflation on every read) whereas the flat form pads only ``no`` 200→256.
    All decode intermediates here are (B, n) planes — no minor-dim-3/4/15
    tensors ever hit HBM.  Flat levels are assumed square (ny == nx).

    Same output contract as :func:`non_max_suppression_obb`."""
    import numpy as np

    nc = meta.nc
    x_l, y_l, w_l, h_l = [], [], [], []
    obj_l, best_l, cid_l, thidx_l, conf_l = [], [], [], [], []
    for li, p in enumerate(maps):
        if p.ndim == 5:
            B, ny, nx, na, no = p.shape
            n = ny * nx * na
            p = p.reshape(B, n, no)
        else:
            B, n, no = p.shape
            na = meta.na
            ny = nx = int(round((n // na) ** 0.5))
            if ny * nx * na != n:
                raise ValueError(
                    f"flat Detect level {li}: n={n} is not a square grid "
                    f"of na={na} anchors; pass 5-D maps for non-square inputs"
                )
        # static per-anchor grid/anchor vectors (host numpy, embedded consts)
        ii = np.arange(n)
        a = ii % na
        cell = ii // na
        gx = (cell % nx).astype(np.float32)
        gy = (cell // nx).astype(np.float32)
        aw = np.asarray(meta.anchors_px[li], np.float32)[a, 0]
        ah = np.asarray(meta.anchors_px[li], np.float32)[a, 1]
        stride = float(meta.strides[li])

        # slices upcast to f32 before the sigmoid/decode math — the maps may
        # arrive bf16 (inference flat path); the upcast fuses into each pass
        f = lambda sl: sl.astype(jnp.float32)
        obj = jax.nn.sigmoid(f(p[..., 4]))  # (B, n)
        x_l.append((jax.nn.sigmoid(f(p[..., 0])) * 2 - 0.5 + gx) * stride)
        y_l.append((jax.nn.sigmoid(f(p[..., 1])) * 2 - 0.5 + gy) * stride)
        w_l.append((jax.nn.sigmoid(f(p[..., 2])) * 2) ** 2 * aw)
        h_l.append((jax.nn.sigmoid(f(p[..., 3])) * 2) ** 2 * ah)
        obj_l.append(obj)
        cls = jax.nn.sigmoid(f(p[..., 5 : 5 + nc])) * obj[..., None]
        cls = _apply_class_filter(cls, classes, nc)
        if multi_label:
            conf_l.append(cls)
        else:
            # reduce over nc per level: the (B, n, nc) tensor stays a fused
            # intermediate, never concatenated/materialised across levels
            best_l.append(jnp.max(cls, axis=-1))
            cid_l.append(jnp.argmax(cls, axis=-1).astype(jnp.int32))
        thidx_l.append(
            jnp.argmax(p[..., 5 + nc :], axis=-1).astype(jnp.int32)
        )

    xs = jnp.concatenate(x_l, 1)
    ys = jnp.concatenate(y_l, 1)
    ws = jnp.concatenate(w_l, 1)
    hs = jnp.concatenate(h_l, 1)
    obj = jnp.concatenate(obj_l, 1)
    thidx = jnp.concatenate(thidx_l, 1)

    B, N = obj.shape
    k = min(max_candidates, N * nc if multi_label else N)
    topk = jax.lax.approx_max_k if approx_topk else jax.lax.top_k

    def assemble(scores, box_idx, x_i, y_i, w_i, h_i, th_i):
        theta = (th_i[box_idx].astype(jnp.float32) - 90.0) / 180.0 * PI
        return jnp.stack(
            [x_i[box_idx], y_i[box_idx], w_i[box_idx], h_i[box_idx], theta],
            axis=-1,
        )

    if multi_label:
        cls_conf = jnp.concatenate(conf_l, 1)

        if approx_topk:  # bench-only legacy single-stage selection
            def sel_image(cc_i, obj_i):
                flat = jnp.where(
                    (cc_i > conf_thres) & (obj_i[:, None] > conf_thres),
                    cc_i, 0.0,
                ).reshape(-1)
                scores, idx = topk(flat, k)
                return scores, idx // nc, idx % nc

            scores, box_idx, cls_id = jax.vmap(sel_image)(cls_conf, obj)
        else:
            scores, box_idx, cls_id = _batched_exact_pairs(
                cls_conf, conf_thres, k, nc)

        rb = jax.vmap(assemble)(scores, box_idx, xs, ys, ws, hs, thidx)
        if stage == "select":  # bench hook: stop before suppression
            return rb, scores
        return _suppress_compact_batch(rb, scores, cls_id, iou_thres,
                                       agnostic, max_det)

    best = jnp.concatenate(best_l, 1)
    cid = jnp.concatenate(cid_l, 1)

    gate = jnp.where((best > conf_thres) & (obj > conf_thres), best, 0.0)
    if approx_topk:
        scores, box_idx = jax.vmap(lambda g: topk(g, k))(gate)
    else:
        scores, box_idx = _batched_exact_select(gate, k)

    cls_id = jnp.take_along_axis(cid, box_idx, axis=1)
    rb = jax.vmap(assemble)(scores, box_idx, xs, ys, ws, hs, thidx)
    if stage == "select":  # bench hook: stop before suppression
        return rb, scores
    return _suppress_compact_batch(rb, scores, cls_id, iou_thres, agnostic,
                                   max_det)


def nms_rotated_np(rboxes, scores, iou_thr, iou_fn):
    """Reference greedy NMS oracle in NumPy (mirrors nms_rotated_cpu.cpp:8-74).

    `iou_fn(a, b) -> float` is injected so tests can use the independent
    float64 polygon clipper.
    """
    import numpy as np

    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(scores), dtype=bool)
    for ii, i in enumerate(order):
        if scores[i] <= 0:
            continue
        ok = True
        for j in order[:ii]:
            if keep[j] and iou_fn(rboxes[i], rboxes[j]) > iou_thr:
                ok = False
                break
        keep[i] = ok
    return keep
