"""Final detection post-processing (padded, batched-over-classes).

Fixed-shape equivalent of `object_detection/model/prediction.py:103-163`
(`post_ops_prediction`): the reference's Python loop over classes (score
filter -> class-specific decode -> clip + min-edge filter -> per-class NMS
-> concat -> global top-k) becomes a vmap over the class axis with one
batched NMS, then a single top-k. The reference's `(None, None, None)`
empty-result case is encoded as an all-False validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.core.boxes import clip_boxes, min_edge_mask
from tf_eager_object_detection_tpu.core.transforms import decode_boxes
from tf_eager_object_detection_tpu.ops.nms import non_max_suppression

__all__ = ["post_ops_prediction", "predict_after_roi", "Detections"]


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [D, 4] xyxy
    labels: jnp.ndarray  # [D] int32 class ids (>= 1)
    scores: jnp.ndarray  # [D]
    valid: jnp.ndarray  # [D] bool


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "max_num_per_class", "max_num_per_image"),
)
def predict_after_roi(
    roi_scores_softmax: jnp.ndarray,
    roi_deltas: jnp.ndarray,
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    image_height,
    image_width,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    max_num_per_class: int = 5,
    max_num_per_image: int = 5,
    nms_iou_threshold=0.3,
    score_threshold=0.3,
    num_classes: int = 21,
) -> Detections:
    """Mask-RCNN-style alternative predictor (the reference's unused
    `predict_after_roi`, prediction.py:10-100): each roi contributes only its
    argmax class; class-specific decode + clip; per-class NMS; global top-k.
    """
    class_ids = jnp.argmax(roi_scores_softmax, axis=1)  # [N]
    n = rois.shape[0]
    rows = jnp.arange(n)
    class_scores = roi_scores_softmax[rows, class_ids]
    deltas_specific = roi_deltas[rows, class_ids]
    refined = decode_boxes(rois, deltas_specific, target_means, target_stds)
    refined = clip_boxes(refined, image_height, image_width)
    keep = roi_valid & (class_ids > 0) & (class_scores >= score_threshold)

    def per_class(cls):
        cls_keep = keep & (class_ids == cls)
        idx, ok = non_max_suppression(
            refined, class_scores, cls_keep, max_num_per_class, nms_iou_threshold
        )
        return refined[idx], class_scores[idx], ok

    c_minus_1 = num_classes - 1
    boxes_c, scores_c, ok_c = jax.vmap(per_class)(
        jnp.arange(1, num_classes)
    )
    labels_c = jnp.broadcast_to(
        (jnp.arange(c_minus_1, dtype=jnp.int32) + 1)[:, None],
        (c_minus_1, max_num_per_class),
    )
    flat_scores = jnp.where(ok_c, scores_c, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_scores, max_num_per_image)
    valid = top_scores > -jnp.inf
    return Detections(
        jnp.where(valid[:, None], boxes_c.reshape(-1, 4)[top_idx], 0.0),
        jnp.where(valid, labels_c.reshape(-1)[top_idx], 0),
        jnp.where(valid, top_scores, 0.0),
        valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "max_num_per_class",
        "max_num_per_image",
        "clip_deltas",
    ),
)
def post_ops_prediction(
    roi_scores_softmax: jnp.ndarray,
    roi_deltas: jnp.ndarray,
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    image_height,
    image_width,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    max_num_per_class: int = 50,
    max_num_per_image: int = 50,
    nms_iou_threshold=0.3,
    score_threshold=0.0,
    min_edge=16.0,
    num_classes: int = 21,
    clip_deltas: bool = True,
) -> Detections:
    """roi_scores_softmax: [N, C]; roi_deltas: [N, C, 4]; rois: [N, 4]."""

    def per_class(cls_scores, cls_deltas):
        # cls_scores: [N], cls_deltas: [N, 4]
        keep = roi_valid & (cls_scores > score_threshold)
        boxes = decode_boxes(
            rois, cls_deltas, target_means, target_stds, clip_deltas=clip_deltas
        )
        boxes = clip_boxes(boxes, image_height, image_width)
        keep = keep & min_edge_mask(boxes, min_edge)
        idx, ok = non_max_suppression(
            boxes, cls_scores, keep, max_num_per_class, nms_iou_threshold
        )
        return boxes[idx], cls_scores[idx], ok

    # Skip background class 0 (prediction.py:135 loops over 1..num_classes-1).
    fg_scores = jnp.swapaxes(roi_scores_softmax[:, 1:], 0, 1)  # [C-1, N]
    fg_deltas = jnp.swapaxes(roi_deltas[:, 1:, :], 0, 1)  # [C-1, N, 4]
    boxes_c, scores_c, ok_c = jax.vmap(per_class)(fg_scores, fg_deltas)
    # boxes_c: [C-1, K, 4], scores_c: [C-1, K], ok_c: [C-1, K]

    c_minus_1 = num_classes - 1
    k = max_num_per_class
    labels_c = jnp.broadcast_to(
        (jnp.arange(c_minus_1, dtype=jnp.int32) + 1)[:, None], (c_minus_1, k)
    )
    flat_boxes = boxes_c.reshape(-1, 4)
    flat_scores = jnp.where(ok_c, scores_c, -jnp.inf).reshape(-1)
    flat_labels = labels_c.reshape(-1)

    top_scores, top_idx = jax.lax.top_k(flat_scores, max_num_per_image)
    valid = top_scores > -jnp.inf
    out_boxes = jnp.where(valid[:, None], flat_boxes[top_idx], 0.0)
    out_labels = jnp.where(valid, flat_labels[top_idx], 0)
    out_scores = jnp.where(valid, top_scores, 0.0)
    return Detections(out_boxes, out_labels, out_scores, valid)
