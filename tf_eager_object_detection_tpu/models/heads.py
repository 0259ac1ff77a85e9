"""RPN head (shared by Faster R-CNN and FPN).

Reference: `base_faster_rcnn_model.py:309-350` / `base_fpn_model.py:393-434`:
3x3 conv(512, relu) + 1x1 score conv(2A) + 1x1 box conv(4A). Init std 0.01
(FPN box conv 0.001). Returns raw NHWC maps; callers do the layout-specific
reshapes (tf-faster-rcnn [2, A] channel order vs FPN [A, 2]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["RpnHead", "reshuffle_frcnn_scores", "frcnn_score_logits"]


class RpnHead(nn.Module):
    num_anchors: int = 9
    box_init_std: float = 0.01  # FPN uses 0.001 (base_fpn_model.py:415)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = nn.Conv(
            512,
            (3, 3),
            padding="SAME",
            name="rpn_first_conv",
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        score = nn.Conv(
            self.num_anchors * 2,
            (1, 1),
            name="rpn_score_conv",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        bbox = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            name="rpn_bbox_conv",
            kernel_init=nn.initializers.normal(self.box_init_std),
        )(x)
        return score, bbox


def frcnn_score_logits(score_map: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """[h, w, 2A] score map -> [h*w*A, 2] logits, tf-faster-rcnn layout.

    The 2A channels are laid out class-major: channel s*A + a. Matches the
    reshape dance at base_faster_rcnn_model.py:149-152/:204 exactly.
    """
    h, w, _ = score_map.shape
    m = score_map.reshape(h * w, 2, num_anchors)
    return jnp.swapaxes(m, 1, 2).reshape(-1, 2)


def reshuffle_frcnn_scores(score_map: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """[h, w, 2A] -> [h*w*A] foreground probabilities (anchor-minor order)."""
    logits = frcnn_score_logits(score_map, num_anchors)
    return nn.softmax(logits, axis=-1)[:, 1]
