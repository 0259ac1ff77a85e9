"""Region proposal: decode RPN deltas, clip, NMS -> padded proposals.

Fixed-shape equivalent of `object_detection/model/region_proposal.py:37-81`:
decode all anchors, clip to the (valid) image, optional pre-NMS score top-k
(present in the reference config — rpn_proposal_*_pre_nms_sample_number —
though commented out in its code at region_proposal.py:65-69), then NMS with
`num_post_nms` output slots. Invalid (padded-grid) anchors are masked out via
score = -inf rather than gathered away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.core.boxes import clip_boxes
from tf_eager_object_detection_tpu.core.transforms import decode_boxes
from tf_eager_object_detection_tpu.ops.nms import nms_alive_sorted

__all__ = ["region_proposal"]


def region_proposal(
    rpn_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    scores: jnp.ndarray,
    anchor_valid: jnp.ndarray,
    image_height,
    image_width,
    num_post_nms: int,
    nms_iou_threshold=0.7,
    num_pre_nms: int | None = None,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
    clip_deltas: bool = True,
):
    """Returns (rois [num_post_nms, 4], roi_valid [num_post_nms] bool).

    rpn_deltas: [A, 4]; anchors: [A, 4]; scores: [A] objectness probs;
    anchor_valid: [A] bool mask of anchors inside the valid feature grid.
    """
    decoded = decode_boxes(
        anchors, rpn_deltas, target_means, target_stds, clip_deltas=clip_deltas
    )
    decoded = clip_boxes(decoded, image_height, image_width)
    decoded = jax.lax.stop_gradient(decoded)
    scores = jax.lax.stop_gradient(scores)

    # ONE ordering op covers both the pre-NMS top-k and NMS's score order:
    # lax.top_k returns its k results score-descending, so its output is
    # already in NMS processing order (and is cheaper than a full argsort
    # for FPN's 163k anchors: 1.9 ms sort vs sub-ms top-k).
    masked = jnp.where(anchor_valid, scores, -jnp.inf)
    k = decoded.shape[0]
    if num_pre_nms is not None and num_pre_nms < k:
        top_scores, order = jax.lax.top_k(masked, num_pre_nms)
        order = order.astype(jnp.int32)
        svalid = top_scores > -jnp.inf
    else:
        order = jnp.argsort(-masked, stable=True).astype(jnp.int32)
        svalid = masked[order] > -jnp.inf
    sboxes = decoded[order]

    alive = nms_alive_sorted(
        sboxes, svalid, nms_iou_threshold, num_post_nms
    )
    (pos,) = jnp.nonzero(alive, size=num_post_nms, fill_value=order.shape[0])
    out_valid = pos < order.shape[0]
    rois = sboxes[jnp.minimum(pos, order.shape[0] - 1)]
    rois = jnp.where(out_valid[:, None], rois, 0.0)
    return rois, out_valid
