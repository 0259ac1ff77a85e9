"""RPN / RoI training-target sampling as fixed-shape jittable kernels.

Re-implements the reference's eager-only target builders as pure functions
over padded tensors with explicit PRNG keys:

- `anchor_target` replaces `object_detection/model/anchor_target.py:29-125`
  (tf.Variable + tf.scatter_update + Python `if` on tensor sizes) with masked
  selects and random-priority top-k subsampling.
- `proposal_target` replaces `object_detection/model/proposal_target.py:32-124`
  (the host `.numpy()` round-trip loop) with a one-shot fused select/gather.

Known deliberate deviation: the reference writes class-specific roi box
targets/weights at column `labels[idx]` (the label of the idx-th roi overall,
proposal_target.py:97-99,114-117) instead of the selected fg roi's label —
an indexing bug. By default we use the selected roi's own label (standard
Faster R-CNN semantics); `strict_class_column=True` (driven by the
`strict_reference_parity` config key) reproduces the reference's indexing
bit-for-bit — including ascending-index fg/bg slot ordering, which is what
the reference's `tf.where` produces in its deterministic (non-shuffled)
branches — for bit-faithful fine-tuning from imported reference checkpoints.

Random subsampling uses the Gumbel-style trick: candidates get i.i.d. uniform
priorities and `lax.top_k` picks the winners, which matches the distribution
of `tf.random_shuffle(...)[:k]` (uniform without replacement).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.core.boxes import inside_image_mask, pairwise_iou
from tf_eager_object_detection_tpu.core.transforms import encode_boxes

__all__ = ["anchor_target", "proposal_target", "AnchorTargets", "ProposalTargets"]


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # [A] int32: -1 ignore / 0 bg / 1 fg
    bbox_targets: jnp.ndarray  # [A, 4]
    in_weights: jnp.ndarray  # [A, 4]
    out_weights: jnp.ndarray  # [A, 4]


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray  # [S, 4]
    labels: jnp.ndarray  # [S] int32 class ids (0 = bg)
    bbox_targets: jnp.ndarray  # [S, num_classes * 4]
    in_weights: jnp.ndarray  # [S, num_classes * 4]
    out_weights: jnp.ndarray  # [S, num_classes * 4]
    valid: jnp.ndarray  # [S] bool (all True unless no rois at all)


def _select_topk_random(candidates: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """Uniformly select min(k, count) of `candidates` ([N] bool) -> [N] bool."""
    n = candidates.shape[0]
    pri = jax.random.uniform(key, (n,))
    scores = jnp.where(candidates, pri, -jnp.inf)
    _, idx = jax.lax.top_k(scores, min(k, n))
    chosen = jnp.zeros((n,), bool).at[idx].set(True)
    return chosen & candidates


@functools.partial(
    jax.jit,
    static_argnames=("total_num_samples", "max_pos_samples"),
)
def anchor_target(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    image_height,
    image_width,
    key,
    pos_iou_threshold=0.7,
    neg_iou_threshold=0.3,
    total_num_samples: int = 256,
    max_pos_samples: int = 128,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> AnchorTargets:
    """RPN training targets over all (padded) anchors.

    anchors: [A, 4] xyxy; gt_boxes: [G, 4] padded; gt_mask: [G] bool;
    image_height/width: traced valid image extents.
    """
    a = anchors.shape[0]
    inside = inside_image_mask(anchors, image_height, image_width)  # [A]

    iou = pairwise_iou(anchors, gt_boxes, mask2=gt_mask)  # [A, G]
    iou = jnp.where(inside[:, None] & gt_mask[None, :], iou, -1.0)
    argmax_overlaps = jnp.argmax(iou, axis=1)  # [A]
    max_overlaps = jnp.max(iou, axis=1)  # [A]; -1 rows for outside anchors
    gt_max = jnp.max(iou, axis=0)  # [G]

    # Label rules (anchor_target.py:67-69): bg if max < neg_thr; the anchors
    # achieving each gt's max IoU are fg; fg if max >= pos_thr.
    labels = jnp.full((a,), -1, jnp.int32)
    labels = jnp.where(max_overlaps < neg_iou_threshold, 0, labels)
    is_gt_argmax = jnp.any(
        (iou == gt_max[None, :]) & gt_mask[None, :] & (gt_max[None, :] >= 0.0),
        axis=1,
    )
    labels = jnp.where(is_gt_argmax & inside, 1, labels)
    labels = jnp.where(max_overlaps >= pos_iou_threshold, 1, labels)
    labels = jnp.where(inside, labels, -1)

    # Subsample fg to <= max_pos_samples (anchor_target.py:72-77).
    key_fg, key_bg = jax.random.split(key)
    fg = labels == 1
    fg_kept = _select_topk_random(fg, max_pos_samples, key_fg)
    labels = jnp.where(fg & ~fg_kept, -1, labels)

    # Subsample bg to <= total - num_fg (anchor_target.py:78-84). The bg
    # budget is dynamic, so take a static top-k and keep the first num_bg.
    num_fg = jnp.sum(fg_kept.astype(jnp.int32))
    num_bg = total_num_samples - num_fg
    bg = labels == 0
    pri = jax.random.uniform(key_bg, (a,))
    bg_scores = jnp.where(bg, pri, -jnp.inf)
    k_bg = min(total_num_samples, a)
    _, bg_idx = jax.lax.top_k(bg_scores, k_bg)
    bg_rank = jnp.arange(k_bg)
    bg_take = (bg_rank < num_bg) & (bg_scores[bg_idx] > -jnp.inf)
    bg_kept = jnp.zeros((a,), bool).at[bg_idx].set(bg_take)
    labels = jnp.where(bg & ~bg_kept, -1, labels)

    # Regression targets vs the argmax gt for every inside anchor
    # (anchor_target.py:88); zeros outside (the _unmap fill).
    matched_gt = gt_boxes[argmax_overlaps]
    bbox_targets = encode_boxes(anchors, matched_gt, target_means, target_stds)
    bbox_targets = jnp.where(inside[:, None], bbox_targets, 0.0)

    in_weights = jnp.where((labels == 1)[:, None], 1.0, 0.0) * jnp.ones((a, 4))
    num_examples = jnp.sum((labels >= 0).astype(jnp.float32))
    out_w = 1.0 / jnp.maximum(num_examples, 1.0)
    out_weights = jnp.where((labels >= 0)[:, None], out_w, 0.0) * jnp.ones((a, 4))

    return AnchorTargets(labels, bbox_targets, in_weights, out_weights)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "total_num_samples",
        "max_pos_samples",
        "strict_class_column",
    ),
)
def proposal_target(
    rois: jnp.ndarray,
    roi_mask: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_labels: jnp.ndarray,
    key,
    num_classes: int = 21,
    pos_iou_threshold=0.5,
    neg_iou_threshold=0.0,
    total_num_samples: int = 128,
    max_pos_samples: int = 32,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    strict_class_column: bool = False,
) -> ProposalTargets:
    """RoI-head training batch of exactly `total_num_samples` rois.

    rois: [R, 4] padded proposals with roi_mask [R]; gt_labels: [G] int32
    (class ids >= 1 for real objects).
    Output slot layout matches the reference: fg samples first, then bg.
    """
    r = rois.shape[0]
    s = total_num_samples

    iou = pairwise_iou(rois, gt_boxes, mask2=gt_mask)  # [R, G]
    iou = jnp.where(roi_mask[:, None] & gt_mask[None, :], iou, -1.0)
    max_overlaps = jnp.max(iou, axis=1)  # [R]; -1 for invalid rois
    gt_assignment = jnp.argmax(iou, axis=1)  # [R]
    roi_labels = gt_labels[gt_assignment]  # [R]

    fg_cand = max_overlaps >= pos_iou_threshold
    bg_cand = (max_overlaps < pos_iou_threshold) & (
        max_overlaps >= neg_iou_threshold
    )

    key_fg, key_bg, key_bg_wr = jax.random.split(key, 3)

    # fg: uniformly keep <= max_pos_samples (proposal_target.py:67-68), and
    # materialize their indices in a fixed [max_pos_samples] prefix.
    pri_fg = jax.random.uniform(key_fg, (r,))
    fg_scores = jnp.where(fg_cand, pri_fg, -jnp.inf)
    k_fg = min(max_pos_samples, r)
    _, fg_idx = jax.lax.top_k(fg_scores, k_fg)
    fg_valid = fg_scores[fg_idx] > -jnp.inf  # [max_pos]
    num_fg = jnp.sum(fg_valid.astype(jnp.int32))
    if strict_class_column:
        # the reference's fg_inds come from tf.where in ascending roi order
        # (shuffled only when count > max_pos, where order is random anyway):
        # sort the selected set ascending, invalid slots pushed to the end
        fg_idx = jnp.sort(jnp.where(fg_valid, fg_idx, r))
        fg_valid = fg_idx < r
        fg_idx = jnp.minimum(fg_idx, r - 1)

    # bg without replacement when plentiful (proposal_target.py:69-71) ...
    num_bg_needed = s - num_fg
    pri_bg = jax.random.uniform(key_bg, (r,))
    bg_scores = jnp.where(bg_cand, pri_bg, -jnp.inf)
    bg_vals_wor, bg_idx_wor = jax.lax.top_k(bg_scores, min(s, r))
    if strict_class_column:
        # ascending-index order for the selected bg set (reference tf.where
        # order in its deterministic `bg == quota` branch)
        nb = jnp.clip(num_bg_needed, 1, bg_vals_wor.shape[0])
        kth = jnp.take(bg_vals_wor, nb - 1)
        selected_bg = bg_cand & (bg_scores >= kth)
        asc = jnp.where(selected_bg, -jnp.arange(r, dtype=jnp.float32), -jnp.inf)
        _, bg_idx_wor = jax.lax.top_k(asc, min(s, r))
    if bg_idx_wor.shape[0] < s:  # fewer rois than slots: tile indices
        reps = -(-s // bg_idx_wor.shape[0])
        bg_idx_wor = jnp.tile(bg_idx_wor, reps)[:s]
    num_bg_avail = jnp.sum(bg_cand.astype(jnp.int32))

    # ... and WITH replacement when scarce (proposal_target.py:74-77).
    # Guard: if there are no bg candidates at all, fall back to any valid roi
    # (the reference would crash on np.random.choice over an empty set).
    bg_logits = jnp.where(bg_cand, 0.0, -jnp.inf)
    any_bg = num_bg_avail > 0
    bg_logits = jnp.where(
        any_bg, bg_logits, jnp.where(roi_mask, 0.0, -jnp.inf)
    )
    bg_idx_wr = jax.random.categorical(key_bg_wr, bg_logits, shape=(s,))

    # without replacement also when bg EXACTLY fills the quota — the
    # reference's `elif ==: pass` keeps each bg once (proposal_target.py:72-73;
    # proven by the executing-oracle test); replacement only when scarce
    use_wor = num_bg_avail >= num_bg_needed
    bg_idx_all = jnp.where(use_wor, bg_idx_wor, bg_idx_wr)  # [S]

    # Assemble output slots: [fg_0..fg_{num_fg-1}, bg_0, ...].
    slot = jnp.arange(s)
    is_fg_slot = slot < num_fg
    fg_slot_idx = fg_idx[jnp.minimum(slot, k_fg - 1)]
    bg_slot_idx = bg_idx_all[jnp.maximum(slot - num_fg, 0)]
    src = jnp.where(is_fg_slot, fg_slot_idx, bg_slot_idx)  # [S] roi indices

    out_rois = rois[src]
    out_labels = jnp.where(is_fg_slot, roi_labels[src], 0).astype(jnp.int32)

    # Class-specific targets/weights (one-hot over the *selected* roi label;
    # see module docstring for the deviation from the reference's indexing).
    matched_gt = gt_boxes[gt_assignment[src]]
    enc = encode_boxes(out_rois, matched_gt, target_means, target_stds)  # [S,4]
    if strict_class_column:
        # reference bug (proposal_target.py:97-99,114-117): fg slot idx writes
        # its target at column labels[idx] — the label of the idx-th roi in
        # the ORIGINAL proposal order — not the selected fg roi's own label
        col_labels = jnp.where(
            is_fg_slot, roi_labels[jnp.minimum(slot, r - 1)], 0
        ).astype(jnp.int32)
    else:
        col_labels = out_labels
    onehot = jax.nn.one_hot(col_labels, num_classes, dtype=jnp.float32)  # [S,C]
    fg_f = is_fg_slot.astype(jnp.float32)[:, None, None]
    bbox_targets = onehot[:, :, None] * enc[:, None, :] * fg_f
    in_weights = onehot[:, :, None] * jnp.ones((1, 1, 4)) * fg_f
    out_weights = jnp.ones((s, num_classes, 4), jnp.float32)

    valid = jnp.broadcast_to(jnp.any(roi_mask), (s,))
    return ProposalTargets(
        jax.lax.stop_gradient(out_rois),
        jax.lax.stop_gradient(out_labels),
        jax.lax.stop_gradient(bbox_targets.reshape(s, num_classes * 4)),
        jax.lax.stop_gradient(in_weights.reshape(s, num_classes * 4)),
        jax.lax.stop_gradient(out_weights.reshape(s, num_classes * 4)),
        valid,
    )
