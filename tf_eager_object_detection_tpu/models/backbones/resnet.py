"""ResNet v1 backbone + conv5 RoI head (flax.linen), keras-compatible naming.

Mirrors the reference's keras-style ResNet builders
(`object_detection/model/faster_rcnn/resnet_faster_rcnn.py:31-185`):
- `block1`/`stack1` bottlenecks with stride on the *first* 1x1 conv,
- conv1 7x7/2 with explicit (3,3) zero padding + 3x3/2 max pool,
- extractor = conv1..conv4 (stride 16), RoI head = conv5 stack (stride 1)
  + global average pool + two Dense heads,
- every BatchNorm frozen (FrozenBatchNorm), conv1 + conv2 non-trainable.

Param names match keras .h5 weight names (conv2_block1_1_conv, ...) so the
checkpoint importers are direct name maps. `return_stages` exposes (c2..c5)
for the FPN neck (resnet_fpn.py:262-289 multi-output extractor).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tf_eager_object_detection_tpu.models.layers import FrozenBatchNorm

__all__ = [
    "ResNetBackbone",
    "ResNetRoiHead",
    "RESNET_DEPTH_BLOCKS",
    "resnet_frozen_predicate",
]

# blocks per (conv3, conv4) stack; conv2 and conv5 always have 3 blocks
RESNET_DEPTH_BLOCKS = {50: (4, 6), 101: (4, 23), 152: (8, 36)}


def resnet_frozen_predicate(path: str) -> bool:
    """True for params with no gradient / no weight decay.

    Reference: conv1 + the conv2 stack are trainable=False
    (resnet_faster_rcnn.py:111,140-156) and every BN is frozen (:53-74).
    """
    name = path.split("/")[0] if "/" in path else path
    if "_bn" in name or name == "conv1_bn":
        return True
    return name.startswith("conv1_") or name.startswith("conv2_")


class ResNetBackbone(nn.Module):
    """Image [B, H, W, 3] (caffe BGR) -> features at stride 16 (or stages).

    depth in {50, 101, 152}; return_stages selects which of (c2, c3, c4, c5)
    to return — default ("c4",) matches the Faster R-CNN extractor; FPN uses
    ("c2", "c3", "c4", "c5") with include_c5=True.
    """

    depth: int = 50
    return_stages: Sequence[str] = ("c4",)
    include_c5: bool = False
    dtype: jnp.dtype = jnp.float32

    def _bottleneck(
        self, x, filters: int, stride: int, conv_shortcut: bool, prefix: str
    ):
        if conv_shortcut:
            shortcut = nn.Conv(
                4 * filters,
                (1, 1),
                strides=(stride, stride),
                name=f"{prefix}_0_conv",
                dtype=self.dtype,
            )(x)
            shortcut = FrozenBatchNorm(name=f"{prefix}_0_bn")(shortcut)
        else:
            shortcut = x
        y = nn.Conv(
            filters,
            (1, 1),
            strides=(stride, stride),
            name=f"{prefix}_1_conv",
            dtype=self.dtype,
        )(x)
        y = nn.relu(FrozenBatchNorm(name=f"{prefix}_1_bn")(y))
        y = nn.Conv(
            filters, (3, 3), padding="SAME", name=f"{prefix}_2_conv", dtype=self.dtype
        )(y)
        y = nn.relu(FrozenBatchNorm(name=f"{prefix}_2_bn")(y))
        y = nn.Conv(4 * filters, (1, 1), name=f"{prefix}_3_conv", dtype=self.dtype)(y)
        y = FrozenBatchNorm(name=f"{prefix}_3_bn")(y)
        return nn.relu(shortcut + y)

    def _stack(self, x, filters: int, blocks: int, stride1: int, name: str):
        x = self._bottleneck(x, filters, stride1, True, f"{name}_block1")
        for i in range(2, blocks + 1):
            x = self._bottleneck(x, filters, 1, False, f"{name}_block{i}")
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.depth not in RESNET_DEPTH_BLOCKS:
            raise ValueError(f"unknown resnet depth {self.depth}")
        b3, b4 = RESNET_DEPTH_BLOCKS[self.depth]

        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding="VALID", name="conv1_conv",
            dtype=self.dtype,
        )(x)
        x = nn.relu(FrozenBatchNorm(name="conv1_bn")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        stages = {}
        x = self._stack(x, 64, 3, 1, "conv2")
        stages["c2"] = x
        x = self._stack(x, 128, b3, 2, "conv3")
        stages["c3"] = x
        x = self._stack(x, 256, b4, 2, "conv4")
        stages["c4"] = x
        if self.include_c5:
            x = self._stack(x, 512, 3, 2, "conv5")
            stages["c5"] = x

        out = tuple(stages[s] for s in self.return_stages)
        return out[0] if len(out) == 1 else out


class SlimResNetBackbone(nn.Module):
    """Slim-style ResNet v1 multi-output extractor (FPN's alternative
    backbone, resnet_fpn.py:31-150; unused by default in the reference —
    selected-out at resnet_fpn.py:537-539 — but kept for parity).

    Differences vs the keras-style `ResNetBackbone`: the stride sits on the
    *last* block of each stack (on its 3x3 conv, with explicit asymmetric
    padding + VALID), identity shortcuts subsample via a 1x1/stride-2 "max
    pool", and each stack returns its pre-stride output as the FPN lateral
    (c2..c4) with conv5 run at stride 1.
    """

    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    def _bottleneck(self, x, filters: int, stride: int, prefix: str):
        in_depth = x.shape[-1]
        if 4 * filters == in_depth:
            shortcut = x if stride == 1 else x[:, ::stride, ::stride, :]
        else:
            shortcut = nn.Conv(
                4 * filters, (1, 1), strides=(stride, stride),
                name=f"{prefix}_0_conv", kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
            )(x)
            shortcut = FrozenBatchNorm(name=f"{prefix}_0_bn")(shortcut)
        y = nn.Conv(
            filters, (1, 1), name=f"{prefix}_1_conv",
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
        )(x)
        y = nn.relu(FrozenBatchNorm(name=f"{prefix}_1_bn")(y))
        # explicit (1, 1) pad + VALID (== slim's fixed padding; differs from
        # SAME only when stride > 1)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = nn.Conv(
            filters, (3, 3), strides=(stride, stride), padding="VALID",
            name=f"{prefix}_2_conv", kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
        )(y)
        y = nn.relu(FrozenBatchNorm(name=f"{prefix}_2_bn")(y))
        y = nn.Conv(
            4 * filters, (1, 1), name=f"{prefix}_3_conv",
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
        )(y)
        y = FrozenBatchNorm(name=f"{prefix}_3_bn")(y)
        return nn.relu(shortcut + y)

    def _stack(self, x, filters: int, blocks: int, stride: int, name: str):
        """Returns (pre-stride output, post-stride output)."""
        for i in range(1, blocks):
            x = self._bottleneck(x, filters, 1, f"{name}_block{i}")
        final = self._bottleneck(x, filters, stride, f"{name}_block{blocks}")
        return x, final

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b3, b4 = RESNET_DEPTH_BLOCKS[self.depth]
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding="VALID", name="conv1_conv",
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
        )(x)
        x = nn.relu(FrozenBatchNorm(name="conv1_bn")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        c2, c2f = self._stack(x, 64, 3, 2, "conv2")
        c3, c3f = self._stack(c2f, 128, b3, 2, "conv3")
        c4, c4f = self._stack(c3f, 256, b4, 2, "conv4")
        _, c5f = self._stack(c4f, 512, 3, 1, "conv5")
        return c2, c3, c4, c5f


class ResNetRoiHead(nn.Module):
    """RoI features [N, 7, 7, 1024] -> (scores [N, C], deltas [N, 4C]).

    conv5 stack with stride 1 (resnet_faster_rcnn.py:161-185) + global
    average pool + Dense heads (init std 0.01 / 0.001).
    """

    num_classes: int = 21
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        x = _roi_conv5(self, x, self.dtype)
        x = jnp.mean(x, axis=(1, 2))
        score = nn.Dense(
            self.num_classes,
            name="roi_head_score",
            kernel_init=nn.initializers.normal(0.01),
        )(x.astype(jnp.float32))
        boxes = nn.Dense(
            4 * self.num_classes,
            name="roi_head_bboxes",
            kernel_init=nn.initializers.normal(0.001),
        )(x.astype(jnp.float32))
        return score, boxes


def _roi_conv5(mod: nn.Module, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """conv5 stack (3 bottlenecks, stride 1) inside `mod`'s scope."""

    def bottleneck(x, stride, conv_shortcut, prefix):
        filters = 512
        if conv_shortcut:
            shortcut = nn.Conv(
                4 * filters, (1, 1), strides=(stride, stride),
                name=f"{prefix}_0_conv", dtype=dtype,
            )(x)
            shortcut = FrozenBatchNorm(name=f"{prefix}_0_bn")(shortcut)
        else:
            shortcut = x
        y = nn.Conv(
            filters, (1, 1), strides=(stride, stride), name=f"{prefix}_1_conv",
            dtype=dtype,
        )(x)
        y = nn.relu(FrozenBatchNorm(name=f"{prefix}_1_bn")(y))
        y = nn.Conv(
            filters, (3, 3), padding="SAME", name=f"{prefix}_2_conv", dtype=dtype
        )(y)
        y = nn.relu(FrozenBatchNorm(name=f"{prefix}_2_bn")(y))
        y = nn.Conv(4 * filters, (1, 1), name=f"{prefix}_3_conv", dtype=dtype)(y)
        y = FrozenBatchNorm(name=f"{prefix}_3_bn")(y)
        return nn.relu(shortcut + y)

    x = bottleneck(x, 1, True, "conv5_block1")
    x = bottleneck(x, 1, False, "conv5_block2")
    x = bottleneck(x, 1, False, "conv5_block3")
    return x
