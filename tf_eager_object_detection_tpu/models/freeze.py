"""Trainable/frozen parameter masks.

The reference freezes layers with keras `trainable=False`: VGG blocks 1-2
(vgg16_faster_rcnn.py:268-288), ResNet conv1 + conv2 stack
(resnet_faster_rcnn.py:111,140-156), and every BatchNorm (:53-74). Here the
same policy is a pytree mask consumed by the optimizer (zero updates) and by
the weight-decay mask (L2 only on trainable kernels, matching keras
regularizers having no effect on non-trainable layers).
"""

from __future__ import annotations

from typing import Any, Dict

import jax

__all__ = ["trainable_mask", "weight_decay_mask"]

_BN_PARAMS = {"gamma", "beta", "moving_mean", "moving_variance"}


def _frozen_path(backbone: str, path, model_type: str = "faster_rcnn") -> bool:
    names = [getattr(k, "key", str(k)) for k in path]
    if any(n in _BN_PARAMS for n in names) or any("_bn" in n for n in names):
        return True
    top = names[0] if names else ""
    layer = names[1] if len(names) > 1 else ""
    if top != "extractor":
        return False
    if model_type == "fpn":
        # FPN keeps conv1/conv2 trainable (resnet_fpn.py:233,135-141);
        # only the BNs (handled above) are frozen.
        return False
    if backbone == "vgg16":
        return layer.startswith("block1_") or layer.startswith("block2_")
    # resnet faster r-cnn: conv1 + whole conv2 stack
    return layer.startswith("conv1_") or layer.startswith("conv2_")


def trainable_mask(params: Dict[str, Any], backbone: str, model_type: str = "faster_rcnn"):
    """Pytree of bools: True where the param receives gradient updates."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _frozen_path(backbone, path, model_type), params
    )


def stop_frozen_gradients(params: Dict[str, Any], backbone: str, model_type: str = "faster_rcnn"):
    """stop_gradient on frozen leaves.

    Beyond zeroing their grads, this lets XLA dead-code-eliminate the whole
    backward chain that only feeds frozen params — measured ~25% of the
    Faster R-CNN train step (the conv1 7x7 kernel gradient alone was the
    single most expensive op at 2.7 ms/step before this).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, p: jax.lax.stop_gradient(p)
        if _frozen_path(backbone, path, model_type)
        else p,
        params,
    )


def weight_decay_mask(params: Dict[str, Any], backbone: str, model_type: str = "faster_rcnn"):
    """True for trainable kernels (L2 applies to conv/dense kernels only)."""

    def f(path, _):
        names = [getattr(k, "key", str(k)) for k in path]
        return names[-1] == "kernel" and not _frozen_path(backbone, path, model_type)

    return jax.tree_util.tree_map_with_path(f, params)
