"""Shared NN layers for the detection models (flax.linen).

`FrozenBatchNorm` mirrors the reference's universally-frozen BatchNorms
(`trainable=False` AND `training=False`, resnet_faster_rcnn.py:53-74,111-112):
a pure affine transform using stored moving statistics. The statistics are
kept as params (not batch_stats collections) so the whole model is a single
pytree and checkpoint importers can write them directly; the trainable-mask
machinery (models/freeze.py) excludes them from gradients and weight decay.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["FrozenBatchNorm", "max_pool_same"]


class FrozenBatchNorm(nn.Module):
    """Affine-only batch norm with frozen moving statistics.

    epsilon matches keras ResNet (1.001e-5, resnet_faster_rcnn.py:55).
    """

    epsilon: float = 1.001e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        mean = self.param("moving_mean", nn.initializers.zeros, (c,))
        var = self.param("moving_variance", nn.initializers.ones, (c,))
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        # Fold into a single scale/shift (computed in f32, applied in the
        # input's compute dtype so a bf16 conv chain stays bf16); XLA fuses
        # this into the adjacent conv.
        scale = (gamma * inv).astype(x.dtype)
        shift = (beta - mean * gamma * inv).astype(x.dtype)
        return x * scale + shift


def max_pool_same(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Max pool with keras 'same' padding over NHWC."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding="SAME"
    )
