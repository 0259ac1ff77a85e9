"""Spatial partitioning: shard the image H axis over a second mesh dimension.

The reference has no parallelism at all (SURVEY.md §2.7); `parallel/mesh.py`
adds batch data parallelism. This module adds the detection-world analog of
sequence parallelism (SURVEY.md §5.7: the "large input" axis of this model
family is image resolution, not sequence length): a 2-D
`Mesh(("batch", "space"))` where each image's rows are sharded over the
`space` axis. Use it when the per-device batch would otherwise drop below 1
image — high-resolution inputs, or more chips than images.

The mechanics are pure GSPMD: images enter the jitted step with sharding
`P("batch", "space")` (N, H sharded, W, C) and params replicated; XLA's SPMD
partitioner propagates the sharding through the conv stack, inserting halo
exchanges (`collective-permute` of boundary rows) for every >1x1 conv window
and keeping each device's activation slice resident. The detection tail
(NMS, target sampling, RoIAlign) needs global rows, so the partitioner
all-gathers the [H/16, W/16] feature map along `space` there — a small
transfer next to the backbone activations that never materialize globally.
Model code is untouched: there is no sharding annotation anywhere in
`models/`; everything follows from the input sharding (the scaling-book
recipe: pick a mesh, annotate the inputs, let XLA insert collectives).

Numerics are identical to the unsharded step up to f32 summation order
(tested to rtol 1e-4 on losses and updated params in tests/test_spatial.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tf_eager_object_detection_tpu.training.train_step import train_step_body

__all__ = [
    "make_spatial_mesh",
    "make_spatial_train_step",
    "make_spatial_predict",
    "shard_batch",
]


def make_spatial_mesh(
    dp: Optional[int] = None,
    sp: int = 2,
    devices=None,
) -> Mesh:
    """2-D mesh: `dp` x `sp` devices as ("batch", "space").

    `dp=None` uses every available device (dp = n_devices // sp). The inner
    (fastest-varying) axis is `space` so halo exchanges ride neighboring
    devices — on a TPU slice these are ICI neighbors.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if dp is None:
        dp = len(devices) // sp
    n = dp * sp
    if n > len(devices) or n < 1:
        raise ValueError(
            f"mesh {dp}x{sp} needs {n} devices, have {len(devices)}"
        )
    return Mesh(np.asarray(devices[:n]).reshape(dp, sp), ("batch", "space"))


def _shardings(mesh: Mesh):
    repl = NamedSharding(mesh, P())
    img = NamedSharding(mesh, P("batch", "space"))  # [B, H, W, C]
    per_img = NamedSharding(mesh, P("batch"))  # everything else in the batch
    return repl, img, per_img


def shard_batch(batch, mesh: Mesh):
    """(images, image_hw, gt_boxes, gt_mask, gt_labels) -> device-put with
    images sharded ("batch", "space") and the per-image tensors ("batch")."""
    _, img, per_img = _shardings(mesh)
    images, *rest = batch
    return (jax.device_put(images, img),) + tuple(
        jax.device_put(x, per_img) for x in rest
    )


def make_spatial_train_step(detector, optimizer, mesh: Mesh):
    """Jitted train step over a ("batch", "space") mesh.

    Same contract as `mesh.make_parallel_train_step`: (state, batch, rng) ->
    (state, metrics), global batch divisible by the mesh's batch extent, and
    image H divisible by the space extent (bucket heights are multiples of
    16; any space extent up to 16 that divides H works — the partitioner
    handles uneven halos but even shards keep the collectives balanced).
    """
    repl, img, per_img = _shardings(mesh)
    batch_shardings = (img, per_img, per_img, per_img, per_img)
    return jax.jit(
        train_step_body(detector, optimizer),
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_spatial_predict(detector, mesh: Mesh):
    """Jitted batched predict with images sharded ("batch", "space").

    Wraps the detector's batched eval path (vmapped `predict`); outputs are
    replicated. For serving a batch smaller than the device count, set the
    mesh's batch extent to the batch size and give the rest to `space`.
    """
    repl, img, per_img = _shardings(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, img, per_img),
        out_shardings=repl,
    )
    def predict(params, images, image_hw):
        return jax.vmap(
            lambda im, hw: detector.predict(params, im, hw)
        )(images, image_hw)

    return predict
