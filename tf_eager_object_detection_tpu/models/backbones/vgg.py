"""VGG16 backbone + RoI head (flax.linen), keras-compatible naming.

Mirrors the reference's `Vgg16Extractor` (vgg16_faster_rcnn.py:260-390: 13
convs, 4 max pools, output stride 16) and `Vgg16RoiHead` (:178-257:
flatten -> fc4096 -> dropout -> fc4096 -> dropout -> {cls, box} Dense).
Module names match the keras .h5 weight names (block1_conv1, fc1, ...) so the
checkpoint importers are a direct name map. Blocks 1-2 are frozen by the
trainable mask (models/freeze.py), matching trainable=False in the reference.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tf_eager_object_detection_tpu.models.layers import max_pool_same

__all__ = ["Vgg16Extractor", "Vgg16RoiHead", "VGG16_FROZEN_PREFIXES"]

# Param sub-trees with no gradient / no weight decay (reference freezes
# blocks 1-2: vgg16_faster_rcnn.py:268-288).
VGG16_FROZEN_PREFIXES = ("block1_conv1", "block1_conv2", "block2_conv1", "block2_conv2")

_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class Vgg16Extractor(nn.Module):
    """Image [B, H, W, 3] (BGR, caffe-preprocessed) -> features [B, H/16, W/16, 512]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for block_idx, (n_convs, ch) in enumerate(_BLOCKS, start=1):
            for conv_idx in range(1, n_convs + 1):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding="SAME",
                    name=f"block{block_idx}_conv{conv_idx}",
                    dtype=self.dtype,
                )(x)
                x = nn.relu(x)
            if block_idx < 5:  # no pool after block5 (stride stays 16)
                x = max_pool_same(x, 2, 2)
        return x


class Vgg16RoiHead(nn.Module):
    """RoI features [N, 7, 7, 512] -> (scores [N, C], deltas [N, 4C])."""

    num_classes: int = 21
    keep_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> tuple:
        n = x.shape[0]
        x = x.reshape(n, -1)
        x = nn.relu(nn.Dense(4096, name="fc1", dtype=self.dtype)(x))
        x = nn.Dropout(rate=1.0 - self.keep_rate, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc2", dtype=self.dtype)(x))
        x = nn.Dropout(rate=1.0 - self.keep_rate, deterministic=not train)(x)
        score = nn.Dense(
            self.num_classes,
            name="roi_head_score",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        boxes = nn.Dense(
            4 * self.num_classes,
            name="roi_head_bboxes",
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return score, boxes
