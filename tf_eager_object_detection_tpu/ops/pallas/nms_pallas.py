"""Pallas TPU kernel for sorted-box NMS.

Same algorithm as ops/nms.py (sorted blockwise suppression with an in-block
greedy fixpoint) but fused into a single on-chip kernel: the sorted boxes
live in VMEM in a lane-major [8, K] layout (rows x1, y1, x2, y2; K padded to
the 128-lane boundary), every block step computes its [B, B] self-IoU and
[B, K] tail-IoU entirely in registers/VMEM, and the alive mask never visits
HBM between steps. Host-side sorting (XLA top-k) stays outside the kernel.

Interface: `pallas_nms_alive(sorted_boxes [K, 4], valid [K], iou_threshold,
max_output)` -> alive [K] bool, over score-descending boxes. Semantics match
`tf.image.non_max_suppression` (strict `iou > t` suppression, no +1
convention) — identical to the XLA path, property-tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_nms_alive"]


def _nms_kernel(thr_ref, maxout_ref, boxes_ref, valid_ref, alive_ref, *, block: int):
    """boxes_ref: [8, K] VMEM; valid/alive: [1, K] float32 (1.0 = true)."""
    k = boxes_ref.shape[1]
    num_blocks = k // block
    thr = thr_ref[0]
    max_output = maxout_ref[0]

    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = (x2 - x1) * (y2 - y1)  # [1, K]

    alive_ref[:, :] = valid_ref[:, :]

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)

    def iou_block_vs(bs, b_area, xs):
        """IoU of block rows ([B,1] coords) vs column coords ([1, N])."""
        bx1, by1, bx2, by2 = bs
        cx1, cy1, cx2, cy2, c_area = xs
        iw = jnp.maximum(
            0.0, jnp.minimum(bx2, cx2) - jnp.maximum(bx1, cx1)
        )
        ih = jnp.maximum(
            0.0, jnp.minimum(by2, cy2) - jnp.maximum(by1, cy1)
        )
        inter = iw * ih
        union = b_area + c_area - inter
        return jnp.where(inter > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)

    def outer_body(state):
        i, kept = state
        s = i * block
        # block coords read straight off the ref (Mosaic lowers pl.ds on
        # refs; lax.dynamic_slice on loaded values is not lowered)
        bx1r = boxes_ref[0:1, pl.ds(s, block)]  # [1, B]
        by1r = boxes_ref[1:2, pl.ds(s, block)]
        bx2r = boxes_ref[2:3, pl.ds(s, block)]
        by2r = boxes_ref[3:4, pl.ds(s, block)]
        bx1 = jnp.transpose(bx1r)  # [B, 1]
        by1 = jnp.transpose(by1r)
        bx2 = jnp.transpose(bx2r)
        by2 = jnp.transpose(by2r)
        b_area = (bx2 - bx1) * (by2 - by1)  # [B, 1]
        c_area = (bx2r - bx1r) * (by2r - by1r)  # [1, B]

        blk_init = alive_ref[:, pl.ds(s, block)]  # [1, B] f32

        # ---- in-block greedy fixpoint --------------------------------
        iou_bb = iou_block_vs(
            (bx1, by1, bx2, by2),
            b_area,
            (bx1r, by1r, bx2r, by2r, c_area),
        )  # [B, B]; rows = earlier index i, cols = later index j
        ov = jnp.where((iou_bb > thr) & (rows_b < cols_b), 1.0, 0.0)

        def fix_cond(fs):
            a, prev, it = fs
            return jnp.logical_and(jnp.any(a != prev), it < block)

        def fix_body(fs):
            a, _, it = fs
            killed = jnp.max(jnp.transpose(a) * ov, axis=0, keepdims=True)
            return blk_init * (1.0 - killed), a, it + 1

        a0 = blk_init
        killed0 = jnp.max(jnp.transpose(a0) * ov, axis=0, keepdims=True)
        a1 = blk_init * (1.0 - killed0)
        blk_alive, _, _ = jax.lax.while_loop(fix_cond, fix_body, (a1, a0, 0))

        # ---- suppress the tail against this block's survivors --------
        iou_bk = iou_block_vs(
            (bx1, by1, bx2, by2), b_area, (x1, y1, x2, y2, area)
        )  # [B, K]
        hit = jnp.transpose(blk_alive) * jnp.where(iou_bk > thr, 1.0, 0.0)
        killed_tail = jnp.max(hit, axis=0, keepdims=True)  # [1, K]
        killed_tail = jnp.where(pos >= s + block, killed_tail, 0.0)

        alive_ref[:, :] = alive_ref[:, :] * (1.0 - killed_tail)
        alive_ref[:, pl.ds(s, block)] = blk_alive
        kept = kept + jnp.sum(blk_alive).astype(jnp.int32)
        return i + 1, kept

    def outer_cond(state):
        i, kept = state
        return jnp.logical_and(i < num_blocks, kept < max_output)

    jax.lax.while_loop(outer_cond, outer_body, (jnp.int32(0), jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("max_output", "block", "interpret"))
def pallas_nms_alive(
    sorted_boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold,
    max_output: int,
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """alive [K] bool over score-sorted boxes [K, 4] xyxy."""
    k = sorted_boxes.shape[0]
    k_pad = -(-k // block) * block
    boxes8 = jnp.zeros((8, k_pad), jnp.float32)
    boxes8 = boxes8.at[0:4, :k].set(jnp.transpose(sorted_boxes).astype(jnp.float32))
    valid_row = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(
        valid.astype(jnp.float32)
    )
    thr = jnp.asarray([iou_threshold], jnp.float32)
    maxout = jnp.asarray([max_output], jnp.int32)

    alive = pl.pallas_call(
        functools.partial(_nms_kernel, block=block),
        out_shape=jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thr, maxout, boxes8, valid_row)

    alive_k = alive[0, :k] > 0.5
    # enforce the max_output cap by kept-rank (outer loop may overshoot
    # within its final block, same as the XLA path before rank-clearing)
    rank = jnp.cumsum(alive_k.astype(jnp.int32)) - 1
    return alive_k & (rank < max_output)
