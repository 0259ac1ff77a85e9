"""Data-parallel scale-out over a device mesh (jax.sharding + jit).

The reference is strictly single-GPU batch-1 (SURVEY.md §2.7); the TPU-native
equivalent (SURVEY.md §5.8) is SPMD data parallelism over the batch axis:
params replicated across the mesh, the padded batch sharded on axis 0, and
XLA inserting the gradient all-reduce over ICI. Detection numerics are
per-image, so DP changes nothing (all BNs are frozen).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tf_eager_object_detection_tpu.training.train_step import train_step_body

__all__ = ["make_mesh", "make_parallel_train_step", "replicate", "shard_batch"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "batch") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "batch"):
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def make_parallel_train_step(detector, optimizer, mesh: Mesh, axis_name: str = "batch"):
    """Jitted DP train step: batch sharded over `axis_name`, params replicated.

    Returns (state, batch, rng) -> (state, metrics). The global batch size
    must be divisible by the mesh size.
    """
    repl = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P(axis_name))
    batch_shardings = (bshard, bshard, bshard, bshard, bshard)
    return jax.jit(
        train_step_body(detector, optimizer),
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
