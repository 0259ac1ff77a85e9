"""Detection losses (reference: `object_detection/model/losses.py:4-28`).

Mask-aware jnp versions: `cls_loss` reproduces
`tf.losses.sparse_softmax_cross_entropy` (mean over *selected* rows) via an
explicit weight mask instead of a dynamic gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cls_loss", "smooth_l1_loss"]


def cls_loss(logits: jnp.ndarray, labels: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Sparse softmax cross entropy, averaged over rows with weight > 0.

    logits: [N, C]; labels: [N] int; weights: [N] float/bool mask or None.
    Matches the reference's gather-then-mean (e.g.
    base_faster_rcnn_model.py:204-208 where rows with label >= 0 are kept).
    """
    labels = jnp.maximum(labels, 0)  # masked rows contribute 0 anyway
    log_p = jax.nn.log_softmax(logits, axis=-1)
    # one-hot multiply-sum instead of take_along_axis: the row gather lowered
    # to a ~1.3 ms/step custom fusion on the FPN 163k-anchor RPN loss (trace
    # fusion.19); the one-hot form fuses into plain elementwise + reduce
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=log_p.dtype)
    nll = -jnp.sum(log_p * onehot, axis=-1)
    if weights is None:
        return jnp.mean(nll)
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def smooth_l1_loss(
    bbox_pred: jnp.ndarray,
    bbox_targets: jnp.ndarray,
    in_weights: jnp.ndarray,
    out_weights: jnp.ndarray,
    sigma: float = 1.0,
    dim=(1,),
) -> jnp.ndarray:
    """Smooth-L1 with inside/outside weights (losses.py:16-28).

    sum over `dim`, then mean over the rest. RPN uses sigma=3, dim=(0, 1);
    RoI head uses sigma=1, dim=(1,).
    """
    sigma_2 = sigma**2
    diff = in_weights * (bbox_pred - bbox_targets)
    abs_diff = jnp.abs(diff)
    sign = jax.lax.stop_gradient((abs_diff < 1.0 / sigma_2).astype(jnp.float32))
    per_elem = (
        jnp.square(diff) * (sigma_2 / 2.0) * sign
        + (abs_diff - 0.5 / sigma_2) * (1.0 - sign)
    )
    out = out_weights * per_elem
    return jnp.mean(jnp.sum(out, axis=dim))
