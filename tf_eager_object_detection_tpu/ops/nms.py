"""Fixed-shape non-maximum suppression for TPU.

Replaces the reference's `tf.image.non_max_suppression` C++ fused kernel
(used in `object_detection/model/region_proposal.py:74` and
`object_detection/model/prediction.py:146`) with a jittable blockwise
suppression algorithm over padded tensors:

1. sort candidates by score (stable, descending; invalid -> -inf),
2. process the sorted list in blocks of `block` boxes; within each block run
   an iterative self-suppression fixpoint (equivalent to sequential greedy
   NMS inside the block), then suppress the tail against the block's
   survivors with one [block, K] IoU matrix,
3. stop early once `max_output` boxes are kept.

Semantics match TF NMS: IoU *without* the +1 pixel convention, suppression on
`iou > threshold` (strict), ties broken by original index (stable sort).
Everything is static-shaped; validity is carried in masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["non_max_suppression", "nms_keep_mask", "nms_alive_sorted"]


def _nms_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with TF-NMS conventions (no +1). [N,4]x[M,4] -> [N,M]."""
    x11, y11, x12, y12 = jnp.split(boxes1, 4, axis=-1)
    x21, y21, x22, y22 = jnp.split(boxes2, 4, axis=-1)
    iw = jnp.maximum(0.0, jnp.minimum(x12, x22.T) - jnp.maximum(x11, x21.T))
    ih = jnp.maximum(0.0, jnp.minimum(y12, y22.T) - jnp.maximum(y11, y21.T))
    inter = iw * ih
    a1 = (x12 - x11) * (y12 - y11)  # [N,1]
    a2 = (x22 - x21) * (y22 - y21)  # [M,1]
    union = a1 + a2.T - inter
    return jnp.where(inter > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)


def _self_suppress(ov_earlier: jnp.ndarray, init_alive: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS inside one block via fixpoint iteration.

    ov_earlier[i, j] = True iff i precedes j in score order and IoU > t.
    Iterates a[j] <- init[j] & !any_i(a[i] & ov[i, j]) until stable; this
    converges to the sequential greedy solution in <= block iterations.
    """

    def cond(state):
        a, prev, it = state
        return jnp.logical_and(jnp.any(a != prev), it < ov_earlier.shape[0])

    def body(state):
        a, _, it = state
        killed = jnp.any(a[:, None] & ov_earlier, axis=0)
        return init_alive & ~killed, a, it + 1

    a0 = init_alive
    a1 = init_alive & ~jnp.any(a0[:, None] & ov_earlier, axis=0)
    final, _, _ = jax.lax.while_loop(cond, body, (a1, a0, jnp.int32(0)))
    return final


@functools.partial(jax.jit, static_argnames=("max_output", "block"))
def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold,
    max_output: int,
    block: int = 256,
):
    """Core NMS. Returns (alive_sorted [K] bool, order [K] int32).

    `alive_sorted[p]` marks survivors at sorted position p; `order[p]` is the
    original index of that position. Survivors beyond `max_output` (by kept
    rank) are cleared.
    """
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-scores, stable=True).astype(jnp.int32)  # [k]
    alive = _nms_alive_sorted_xla(
        boxes[order], valid[order], iou_threshold, max_output, block
    )
    return alive, order


def _nms_alive_sorted_xla(sboxes, salive, iou_threshold, max_output: int, block: int):
    """Blockwise suppression over score-sorted boxes -> alive [K] bool."""
    k = sboxes.shape[0]
    k_pad = -(-k // block) * block
    if k_pad != k:
        sboxes = jnp.pad(sboxes, ((0, k_pad - k), (0, 0)))
        salive = jnp.pad(salive, (0, k_pad - k))
    num_blocks = k_pad // block

    def outer_cond(state):
        i, alive, kept = state
        return jnp.logical_and(i < num_blocks, kept < max_output)

    def outer_body(state):
        i, alive, kept = state
        start = i * block
        blk_boxes = jax.lax.dynamic_slice(sboxes, (start, 0), (block, 4))
        blk_alive = jax.lax.dynamic_slice(alive, (start,), (block,))

        iou_bb = _nms_iou(blk_boxes, blk_boxes)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        ov_earlier = (iou_bb > iou_threshold) & (rows < cols)
        blk_alive = _self_suppress(ov_earlier, blk_alive)

        # Suppress every later sorted position against this block's survivors.
        iou_bk = _nms_iou(blk_boxes, sboxes)  # [block, k_pad]
        pos = jax.lax.broadcasted_iota(jnp.int32, (k_pad,), 0)
        later = pos >= start + block
        killed_tail = jnp.any(
            blk_alive[:, None] & (iou_bk > iou_threshold), axis=0
        ) & later
        alive = jax.lax.dynamic_update_slice(alive, blk_alive, (start,))
        alive = alive & ~killed_tail
        kept = kept + jnp.sum(blk_alive.astype(jnp.int32))
        return i + 1, alive, kept

    alive0 = salive
    _, alive, _ = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), alive0, jnp.int32(0))
    )
    # Clear survivors beyond max_output by kept-rank.
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    alive = alive & (rank < max_output)
    return alive[:k]


def nms_alive_sorted(
    sorted_boxes: jnp.ndarray,
    sorted_valid: jnp.ndarray,
    iou_threshold,
    max_output: int,
    block: int = 256,
    impl: str = "auto",
) -> jnp.ndarray:
    """NMS over boxes ALREADY in score-descending order -> alive [K] bool.

    Lets callers that sorted for other reasons (pre-NMS top-k) skip the
    second sort the classic formulation pays.
    """
    k = sorted_boxes.shape[0]
    if _use_pallas(impl, k):
        from tf_eager_object_detection_tpu.ops.pallas.nms_pallas import (
            pallas_nms_alive,
        )

        return pallas_nms_alive(
            sorted_boxes, sorted_valid, iou_threshold, max_output, block=128
        )
    return _nms_alive_sorted_xla(
        sorted_boxes, sorted_valid, iou_threshold, max_output, block
    )


# Box count at and above which the fused Pallas kernel beats the XLA path on
# TPU (measured on v5e: 12k boxes — pallas 0.95 ms vs XLA 6.7 ms; at 6k/300
# the two are within noise of each other, so only the 12k train path opts in).
_PALLAS_MIN_BOXES = 8192


def _use_pallas(impl: str, k: int) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    # auto: only on TPU and only where the kernel's fixed cost amortizes
    return k >= _PALLAS_MIN_BOXES and jax.default_backend() == "tpu"


def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray | None,
    max_output: int,
    iou_threshold,
    block: int = 256,
    impl: str = "auto",
):
    """TF-compatible NMS over padded boxes.

    Args:
      boxes: [K, 4] xyxy.
      scores: [K].
      valid: [K] bool or None (all valid).
      max_output: static; number of output slots.
      iou_threshold: scalar (may be traced).
      impl: 'auto' | 'xla' | 'pallas' (fused on-chip kernel; TPU only).

    Returns:
      indices: [max_output] int32 indices into the input (score-descending),
        clamped to 0 where invalid.
      out_valid: [max_output] bool.
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), bool)
    if _use_pallas(impl, k):
        from tf_eager_object_detection_tpu.ops.pallas.nms_pallas import (
            pallas_nms_alive,
        )

        neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
        order = jnp.argsort(
            -jnp.where(valid, scores, neg_inf), stable=True
        ).astype(jnp.int32)
        alive = pallas_nms_alive(
            boxes[order], valid[order], iou_threshold, max_output, block=128
        )
    else:
        alive, order = nms_keep_mask(
            boxes, scores, valid, iou_threshold, max_output, block=block
        )
    (pos,) = jnp.nonzero(alive, size=max_output, fill_value=k)
    out_valid = pos < k
    indices = order[jnp.minimum(pos, k - 1)]
    return jnp.where(out_valid, indices, 0), out_valid
