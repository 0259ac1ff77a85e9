"""Jitted train step (the reference's `train_step`, scripts/train.py:22-40).

One fused program: loss + grads + optimizer update. Batch tensors are
padded/static; randomness comes in via the PRNG key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["make_train_step", "train_step_body", "TrainState"]


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def train_step_body(detector, optimizer, with_probe: bool = False):
    """Unjitted (state, batch, rng) -> (state, metrics): the ONE train-step
    body shared by the single-device, DP (parallel/mesh.py) and spatial
    (parallel/spatial.py) factories — only the jit shardings differ."""

    from tf_eager_object_detection_tpu.models.freeze import stop_frozen_gradients

    def train_step(state: TrainState, batch, rng):
        images, image_hw, gt_boxes, gt_mask, gt_labels = batch

        def loss(params):
            # frozen leaves contribute no grads; stop_gradient lets XLA DCE
            # their entire backward chain (see models/freeze.py)
            params = stop_frozen_gradients(
                params, detector.backbone, detector.model_type
            )
            return detector.loss_fn(
                params, images, image_hw, gt_boxes, gt_mask, gt_labels, rng
            )

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if with_probe:
            # scalar depending on every updated parameter: fetching it to
            # host is the only reliable way to await step completion on
            # backends where block_until_ready returns early (see bench.py)
            metrics["probe"] = sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(params)
            )
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_train_step(detector, optimizer, with_probe: bool = False):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    batch = (images, image_hw, gt_boxes, gt_mask, gt_labels).

    with_probe=True adds a `probe` scalar (a full-params sum) to the
    metrics for benchmark-only device->host sync (see bench.py); the
    default keeps metrics to the reference's loss series so training
    logs/TensorBoard match the reference's observability contract
    (scripts/train.py:106-112).
    """
    return jax.jit(
        train_step_body(detector, optimizer, with_probe), donate_argnums=(0,)
    )
