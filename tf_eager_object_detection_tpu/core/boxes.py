"""Box geometry primitives (TPU-native, fixed-shape, mask-based).

Re-implements the semantics of the reference's box utilities
(`object_detection/utils/bbox_tf.py` and `bbox_np.py`) as pure jittable
jnp functions over padded fixed-shape tensors:

- areas use the reference's "+1 pixel" convention
  (bbox_tf.py:15 `(y_max - y_min + 1) * (x_max - x_min + 1)`).
- `pairwise_iou` matches bbox_tf.py:37-56 (zero IoU where intersection == 0).
- clip/range filters (bbox_tf.py:59-101) become clamp + boolean masks instead
  of dynamic `tf.where` gathers, so every shape stays static under jit.

Coordinate convention: boxes are `[..., 4]` in `(x1, y1, x2, y2)` pixel
coordinates (same as the reference model internals after the yxyx->xyxy swap
in scripts/train.py:89-96).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "area",
    "pairwise_intersection",
    "pairwise_iou",
    "clip_boxes",
    "min_edge_mask",
    "inside_image_mask",
]


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas with the +1 pixel convention. boxes: [..., 4] xyxy."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w * h


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas. boxes1: [N,4], boxes2: [M,4] -> [N,M]."""
    x_min1, y_min1, x_max1, y_max1 = jnp.split(boxes1, 4, axis=-1)  # [N,1]
    x_min2, y_min2, x_max2, y_max2 = jnp.split(boxes2, 4, axis=-1)  # [M,1]
    ih = jnp.maximum(
        0.0, jnp.minimum(y_max1, y_max2.T) - jnp.maximum(y_min1, y_min2.T) + 1.0
    )
    iw = jnp.maximum(
        0.0, jnp.minimum(x_max1, x_max2.T) - jnp.maximum(x_min1, x_min2.T) + 1.0
    )
    return ih * iw


def pairwise_iou(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    mask2: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pairwise IoU [N, M]; zero where the intersection is empty.

    If `mask2` ([M] bool) is given, IoU of invalid columns is forced to 0 so
    padded gt boxes never match anything (the fixed-shape analogue of the
    reference operating on dynamically-shaped gt tensors).
    """
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    iou = jnp.where(inter > 0.0, inter / union, 0.0)
    if mask2 is not None:
        iou = jnp.where(mask2[None, :], iou, 0.0)
    return iou


def clip_boxes(boxes: jnp.ndarray, max_height, max_width) -> jnp.ndarray:
    """Clamp boxes into [0, max_width-1] x [0, max_height-1].

    Matches bbox_tf.py:59-84 `bboxes_clip_filter` clamping (min_value = 0).
    `max_height`/`max_width` may be traced scalars (per-image valid shapes).
    """
    max_w = jnp.asarray(max_width, jnp.float32) - 1.0
    max_h = jnp.asarray(max_height, jnp.float32) - 1.0
    x1 = jnp.clip(boxes[..., 0], 0.0, max_w)
    y1 = jnp.clip(boxes[..., 1], 0.0, max_h)
    x2 = jnp.clip(boxes[..., 2], 0.0, max_w)
    y2 = jnp.clip(boxes[..., 3], 0.0, max_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def min_edge_mask(boxes: jnp.ndarray, min_edge) -> jnp.ndarray:
    """Validity mask for boxes whose both edges are >= min_edge.

    Mask analogue of the min-edge filter in bbox_tf.py:76-84. NOTE: the
    reference computes edge lengths from the wrong channel pairs
    (`channels[2]-channels[0]` = x2-x1 labelled y_len) but since it requires
    *both* >= min_edge the resulting set is identical; we use w/h directly.
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    min_edge = jnp.asarray(min_edge, jnp.float32)
    return jnp.logical_and(w >= min_edge, h >= min_edge)


def inside_image_mask(anchors: jnp.ndarray, max_height, max_width) -> jnp.ndarray:
    """Mask of anchors fully inside the image (bbox_tf.py:87-101)."""
    max_w = jnp.asarray(max_width, jnp.float32)
    max_h = jnp.asarray(max_height, jnp.float32)
    return (
        (anchors[..., 0] >= 0)
        & (anchors[..., 1] >= 0)
        & (anchors[..., 2] <= max_w - 1.0)
        & (anchors[..., 3] <= max_h - 1.0)
    )
