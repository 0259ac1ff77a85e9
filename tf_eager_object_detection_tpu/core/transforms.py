"""Box encode/decode between xyxy corners and (tx, ty, tw, th) deltas.

Re-implements `object_detection/utils/bbox_transform.py:4-55` with the same
+1 width convention and (mean, std) normalization. Pure jittable jnp; works
on any leading batch shape.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["encode_boxes", "decode_boxes"]


def encode_boxes(
    src_boxes: jnp.ndarray,
    dst_boxes: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """xyxy (src anchor/roi, dst gt) -> normalized (tx, ty, tw, th).

    Matches bbox_transform.py:4-29 `encode_bbox_with_mean_and_std`.
    """
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    box = src_boxes.astype(jnp.float32)
    gt = dst_boxes.astype(jnp.float32)

    w = box[..., 2] - box[..., 0] + 1.0
    h = box[..., 3] - box[..., 1] + 1.0
    cx = box[..., 0] + 0.5 * w
    cy = box[..., 1] + 0.5 * h

    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    gcx = gt[..., 0] + 0.5 * gw
    gcy = gt[..., 1] + 0.5 * gh

    dx = (gcx - cx) / w
    dy = (gcy - cy) / h
    dw = jnp.log(gw / w)
    dh = jnp.log(gh / h)

    delta = jnp.stack([dx, dy, dw, dh], axis=-1)
    return (delta - means) / stds


def decode_boxes(
    anchors: jnp.ndarray,
    deltas: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    clip_deltas: bool = True,
) -> jnp.ndarray:
    """(tx, ty, tw, th) deltas + anchors -> xyxy boxes.

    Matches bbox_transform.py:32-55 `decode_bbox_with_mean_and_std`,
    including the x2 = x1 + width (no -1) convention of the reference.

    Deviation: dw/dh are clamped to log(1000/16) before exp (the standard
    Detectron BBOX_XFORM_CLIP). The reference has no clamp but also never
    trains from random init; without it, early-training deltas overflow
    exp() and poison the step with NaNs. `clip_deltas=False` (driven by the
    `strict_reference_parity` config key) reproduces the unclamped
    reference arithmetic exactly.
    """
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    delta = deltas.astype(jnp.float32) * stds + means
    if clip_deltas:
        clip = 4.135166556742356  # log(1000 / 16)
        delta = delta.at[..., 2:].set(jnp.clip(delta[..., 2:], -clip, clip))

    w = anchors[..., 2] - anchors[..., 0] + 1.0
    h = anchors[..., 3] - anchors[..., 1] + 1.0
    cx = anchors[..., 0] + 0.5 * w
    cy = anchors[..., 1] + 0.5 * h

    cx = cx + delta[..., 0] * w
    cy = cy + delta[..., 1] * h
    w = w * jnp.exp(delta[..., 2])
    h = h * jnp.exp(delta[..., 3])

    x1 = cx - 0.5 * w
    y1 = cy - 0.5 * h
    x2 = x1 + w
    y2 = y1 + h
    return jnp.stack([x1, y1, x2, y2], axis=-1)
