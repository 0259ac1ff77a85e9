"""Multi-host (DCN) data parallelism.

The reference has no distributed backend at all (SURVEY.md §2.7); §5.8 scoped
the TPU-native equivalent as single-host SPMD DP over ICI "DCN only if
multi-host later". This is the multi-host layer: the same jitted DP program
(parallel/mesh.py) over a mesh that spans *processes*, with

- `initialize(...)`: `jax.distributed.initialize` wrapper (coordinator on
  DCN; on TPU pods the defaults are auto-detected from the environment),
- `make_global_mesh()`: 1-D batch mesh over every device of every process,
- `host_local_to_global(...)`: per-host batch shards -> one global
  jax.Array via `jax.make_array_from_process_local_data` (each host feeds
  only its local slice; no cross-host host-side traffic),
- `local_batch_slice(...)`: which rows of the global batch this process
  should load (contiguous by process index, matching the device order of
  `make_global_mesh`).

Gradient all-reduce stays inside the jitted program: XLA partitions it into
an ICI all-reduce per host plus a DCN all-reduce across hosts. Numerics are
identical to single-host DP (tests/test_multihost.py proves 2 procs x 4
virtual CPU devices == 1 proc x 8).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "make_global_mesh",
    "local_batch_slice",
    "host_local_to_global",
    "replicate_from_host",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join the distributed runtime. On TPU pods call with no arguments
    (everything is auto-detected); on CPU/GPU clusters pass coordinator
    address + process count + rank."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_global_mesh(axis_name: str = "batch") -> Mesh:
    """1-D DP mesh over every device of every process, ordered so each
    process's devices are contiguous (process-local rows of the batch land on
    process-local devices — host->device transfers never cross DCN)."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices), (axis_name,))


def local_batch_slice(global_batch: int, mesh: Mesh) -> Tuple[int, int]:
    """[start, stop) rows of the global batch this process must load."""
    devices = list(mesh.devices.flat)
    n = len(devices)
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n}")
    per_dev = global_batch // n
    mine = [i for i, d in enumerate(devices) if d.process_index == jax.process_index()]
    if not mine:
        return 0, 0
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError("mesh devices of one process must be contiguous")
    return mine[0] * per_dev, (mine[-1] + 1) * per_dev


def host_local_to_global(local_batch, mesh: Mesh, axis_name: str = "batch"):
    """Per-host arrays (this host's rows only) -> global batch-sharded
    jax.Arrays. `local_batch` is a pytree of numpy arrays whose leading dim is
    this process's share of the global batch."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def replicate_from_host(tree, mesh: Mesh):
    """Replicate host-resident values across every device of the mesh
    (multi-host-safe twin of parallel.mesh.replicate: every process passes
    the same values, e.g. params built from the same PRNG seed)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), np.shape(x)
        ),
        tree,
    )
