"""Pallas TPU kernel: fused NMS neighbor selection + exact pair IoU.

Replaces three XLA stages of the sparse rotated NMS (ops/rotated_nms.py)
with one VMEM-resident pass — the role the blocked shared-memory tile loop
plays in the reference CUDA kernel (nms_rotated_cuda.cu:13-68):

1. suppression-edge test per (row, col) pair: axis-aligned-cover
   intersection > thr * max(area)  (a provable rotated-IoU upper bound),
   lower-triangle (higher-scored only), same class, both valid;
2. first-M compaction per row (rows are score-sorted, so this keeps the M
   highest-scored admissible neighbours — identical semantics to
   ``_first_m_neighbors``): lane-dim cumsum + slot one-hot;
3. neighbour *gather* — NOT an element gather (TPU gathers run ~1
   elem/cycle): the slot one-hot doubles as an MXU matrix, so compacted
   neighbour boxes come out of one ``dot_general(boxes8, OH)`` per row
   pair;
4. exact rotated IoU on the (row, M) pairs via the same in-VMEM clip /
   diamond-angle-order math as ops/pallas/iou_kernel.py.

Outputs only (n, M) suppression flags + neighbour indices — the dense
suppression matrix build and the fixed-point sweep stay in XLA where the
MXU matvec formulation is already optimal.

Mosaic constraints observed (see iou_kernel.py): float {0,1} masks, 2-D
iota only, lane-dim last, transposes avoided by choosing dot_general
contraction dims, NO lane-dim concats of non-128-multiple pieces (the
cumsum therefore runs as chunked lower-triangular MXU matmuls instead of
shift-adds), results placed by iota-select instead of dynamic stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .iou_kernel import _pairs_iou_math

# rows per program: R*M = 2048 pair lanes per program (same pair-math block
# size as pairs_rotated_iou); n/R programs per image
_R = 32
_CHUNK = 128  # cumsum chunk width (one lane vector)


def _kernel(thr_edge, iou_thr, M, stage, row_off, cols_ref, boxes8_ref,
            rows_ref, arows_ref, out_ref):
    """One program = _R consecutive rows of the n x n pair lattice.

    cols_ref:   (8, n)  lane-major per-column data [x1 y1 x2 y2 area cls valid 0]
    boxes8_ref: (n, 8)  sublane-major [cx cy l s theta iota 1 0] (MXU rhs)
    rows_ref:   (R, 8)  this program's rows, same fields as cols
    arows_ref:  (R, 8)  this program's row rboxes [cx cy l s theta 0 0 0]
    out_ref:    (1, 8, R*M): sublane 0 = suppression flags {0,1},
                sublane 1 = neighbour indices (lane = r*M + m); rest zero
    """
    R = _R
    p = pl.program_id(0)
    row0 = ((p + row_off) * R).astype(jnp.float32)

    cols = cols_ref[...]
    boxes8 = boxes8_ref[...]
    rows = rows_ref[...]
    arows = arows_ref[...]
    n = cols.shape[1]
    RM = R * M

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    f32 = jnp.float32

    # --- edge mask for all R rows at once: (R, n) ------------------------
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (R, n), 1).astype(f32)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (R, n), 0).astype(f32) + row0

    rx1, ry1 = rows[:, 0:1], rows[:, 1:2]
    rx2, ry2 = rows[:, 2:3], rows[:, 3:4]
    rarea, rcls, rval = rows[:, 4:5], rows[:, 5:6], rows[:, 6:7]
    cx1, cy1 = cols[0:1, :], cols[1:2, :]
    cx2, cy2 = cols[2:3, :], cols[3:4, :]
    carea, ccls, cval = cols[4:5, :], cols[5:6, :], cols[6:7, :]

    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1), zero)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1), zero)
    cap = thr_edge * jnp.maximum(rarea, carea)
    m_all = (
        jnp.where(iw * ih > cap, one, zero)
        * jnp.where(lane_n < row_i, one, zero)  # strictly higher-scored
        * jnp.where(ccls == rcls, one, zero)
        * cval
        * rval
    )  # (R, n)

    if stage == 1:  # debug decomposition: edge mask only
        s1 = jnp.sum(m_all, axis=1)[None, :]  # (1, R)
        out_ref[...] = jnp.broadcast_to(s1[:, :1], (1, 8, R * M))
        return

    # --- lane-dim inclusive cumsum via chunked LT matmuls ----------------
    # (no shift-concat: Mosaic rejects non-128-aligned lane concats)
    C = _CHUNK
    lt = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (C, C), 1),
        one, zero,
    )  # LT[c', c] = c' <= c
    pos_chunks = []
    off = jnp.zeros((R, 1), f32)
    for j in range(n // C):
        cj = m_all[:, j * C : (j + 1) * C]  # (R, C) static aligned slice
        within = jax.lax.dot_general(
            cj, lt, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        pos_chunks.append(within + off)
        off = off + jnp.sum(cj, axis=1, keepdims=True)
    pos_all = jnp.concatenate(pos_chunks, axis=1)  # (R, n), 128-aligned pieces
    sel_all = m_all * jnp.where(pos_all <= M, one, zero)  # first M per row

    if stage == 2:  # debug decomposition: + cumsum/selection
        s2 = jnp.sum(sel_all) + jnp.sum(pos_all)
        out_ref[...] = jnp.broadcast_to(s2[None, None, None], (1, 8, R * M))
        return

    # the compaction + pair-IoU below is the kernel's dominant cost, and a
    # program with NO admissible edges produces all-zero output — predicate
    # the whole block on the edge count (detection tiles are sparse: most
    # row-blocks see zero threshold-capable higher-scored neighbours)
    any_edges = jnp.sum(sel_all) > 0.0

    @pl.when(jnp.logical_not(any_edges))
    def _zero_out():
        out_ref[...] = jnp.zeros((1, 8, RM), f32)

    @pl.when(any_edges)
    def _full_block():
        # --- compaction: G = 128/M rows per MXU dot (G*M = 128 lanes so
        # every lane concat below stays vreg-aligned) ----------------------
        G = max(1, 128 // M)
        GM = G * M
        su = jax.lax.broadcasted_iota(jnp.int32, (GM, n), 0)
        tgt_g = (su % M).astype(f32) + 1.0  # slot target per sublane
        sub_row = su // M  # which of the G rows this sublane serves

        lane_rm = jax.lax.broadcasted_iota(jnp.int32, (8, RM), 1)
        b_acc = jnp.zeros((8, RM), f32)
        for u in range(R // G):
            # rank 0 = not selected; slot targets are 1-based → 0 never hits
            pos_g = jnp.zeros((GM, n), f32)
            for ri in range(G):
                r = G * u + ri
                pr = pos_all[r : r + 1, :] * sel_all[r : r + 1, :]
                pos_g = jnp.where(sub_row == ri, pr, pos_g)
            oh = jnp.where(pos_g == tgt_g, one, zero)  # (GM, n)
            # Precision.HIGHEST: the default TPU f32 dot truncates inputs
            # to bf16 (one MXU pass), which quantizes compacted indices
            # >= 256 and box coordinates; the multi-pass split keeps
            # one-hot copies exact
            grp = jax.lax.dot_general(
                boxes8, oh, (((0,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (8, GM): fields x [row Gu slots | ... | row Gu+G-1 slots]
            tiled = jnp.concatenate([grp] * (RM // GM), axis=1)  # (8, RM)
            inchunk = jnp.where(lane_rm // GM == u, one, zero)
            b_acc = b_acc + tiled * inchunk

        if stage == 3:  # debug decomposition: + compaction (no pair IoU)
            out_ref[...] = b_acc[None]
            return

        # --- A-side: row r's rbox broadcast over its M-lane chunk --------
        erow = jax.lax.broadcasted_iota(jnp.int32, (R, RM), 0)
        elane = jax.lax.broadcasted_iota(jnp.int32, (R, RM), 1)
        E = jnp.where(elane // M == erow, one, zero)
        a = jax.lax.dot_general(
            arows, E, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,  # exact copies (see above)
        )  # (8, RM)

        riou = _pairs_iou_math(
            a[0], a[1], a[2], a[3], a[4],
            b_acc[0], b_acc[1], b_acc[2], b_acc[3], b_acc[4],
        )  # (RM,)
        occ = b_acc[6]  # 1 iff the slot holds a real neighbour
        sup = jnp.where(riou > iou_thr, one, zero) * occ  # (RM,)

        # assemble (8, RM) by sublane select (no 1-sublane concats)
        su8 = jax.lax.broadcasted_iota(jnp.int32, (8, RM), 0)
        out8 = jnp.where(
            su8 == 0, sup[None, :], jnp.where(su8 == 1, b_acc[5:6, :], zero)
        )
        out_ref[...] = out8[None]


@functools.partial(jax.jit, static_argnames=("iou_thr", "max_neighbors",
                                             "stage"))
def fused_neighbor_iou(boxes, class_ids, valid, iou_thr: float,
                       max_neighbors: int = 64, stage: int = 4):
    """Fused edge-test + first-M compaction + exact pair IoU.

    Args:
        boxes: ``(n, 5)`` f32 ``[cx cy l s theta]`` in descending-score order.
        class_ids: ``(n,)`` int/float class per box (pass ``None`` for
            class-agnostic suppression).
        valid: ``(n,)`` bool / {0,1}.
        iou_thr: NMS threshold.
        max_neighbors: M (sparse-graph degree cap).

    Returns:
        nbr_idx: ``(n, M)`` int32 — the selected higher-scored neighbours.
        sup_in: ``(n, M)`` bool — exact rotated IoU > iou_thr at that edge.
    """
    n = boxes.shape[0]
    M = max_neighbors
    assert n % _R == 0 and n % _CHUNK == 0, f"n={n} must be a multiple of 128"
    assert M <= 128 and 128 % M == 0, f"M={M} must divide 128"
    assert _R % max(1, 128 // M) == 0
    boxes = boxes.astype(jnp.float32)

    cx, cy, l, s, t = (boxes[:, i] for i in range(5))
    ct, st = jnp.abs(jnp.cos(t)), jnp.abs(jnp.sin(t))
    w = l * ct + s * st
    h = l * st + s * ct
    area = l * s
    clsf = (jnp.zeros((n,), jnp.float32) if class_ids is None
            else class_ids.astype(jnp.float32))
    validf = valid.astype(jnp.float32)
    iota = jnp.arange(n, dtype=jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    ones = jnp.ones((n,), jnp.float32)

    cols = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, area, clsf, validf,
         zeros]
    )  # (8, n) lane-major
    rows8 = cols.T  # (n, 8) row-major (XLA transpose, once)
    boxes8 = jnp.stack([cx, cy, l, s, t, iota, ones, zeros], axis=1)  # (n, 8)
    arows = jnp.stack([cx, cy, l, s, t, zeros, zeros, zeros], axis=1)

    interpret = jax.default_backend() != "tpu"

    def call(n_cols: int, p0: int, n_prog: int):
        """Programs p0..p0+n_prog-1 against the first ``n_cols`` columns.

        Exact: rows in program p only admit neighbours at columns
        < R*(p+1) (strict lower triangle), so the column lattice can be
        truncated per program group — ~38% less edge/compaction work
        across the 4-way split below."""
        kern = functools.partial(
            _kernel, float(iou_thr) * 0.98, float(iou_thr), M, stage, p0
        )
        return pl.pallas_call(
            kern,
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec((8, n_cols), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_cols, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_R, 8), lambda i: (i + p0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_R, 8), lambda i: (i + p0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, _R * M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_prog, 8, _R * M), jnp.float32),
            interpret=interpret,
        )(cols[:, :n_cols], boxes8[:n_cols], rows8, arows)

    n_prog_total = n // _R
    splits = 4 if n_prog_total % 4 == 0 and n >= 4 * _CHUNK else 1
    per = n_prog_total // splits
    # each group's column lattice must cover the strict lower triangle of
    # its last program (R*(p0+per) columns) AND be a whole number of
    # _CHUNK-lane vectors — round up, capped at n (n=640 etc. would
    # otherwise hand the kernel a ragged 160-lane tail and fail to trace)
    outs = [
        call(min(n, -(-(_R * (g + 1) * per) // _CHUNK) * _CHUNK),
             g * per, per)
        for g in range(splits)
    ]
    out = jnp.concatenate(outs, axis=0) if splits > 1 else outs[0]

    nbr_idx = out[:, 1].reshape(n, M).astype(jnp.int32)
    sup_in = out[:, 0].reshape(n, M) > 0.5
    return nbr_idx, sup_in
