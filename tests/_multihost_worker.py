"""Worker process for tests/test_multihost.py.

Joins a 2-process jax.distributed cluster (4 virtual CPU devices each),
runs ONE data-parallel train step over the global 8-device mesh on its local
half of a deterministic global batch, and writes {total_loss, checksums} as
JSON for the parent to compare against the single-process oracle.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    coordinator = sys.argv[1]
    num_procs = int(sys.argv[2])
    rank = int(sys.argv[3])
    out_path = sys.argv[4]

    import jax

    from tf_eager_object_detection_tpu.parallel.multihost import (
        host_local_to_global,
        initialize,
        local_batch_slice,
        make_global_mesh,
        replicate_from_host,
    )

    initialize(coordinator, num_procs, rank)
    assert jax.process_count() == num_procs

    import jax.numpy as jnp
    import numpy as np

    from test_parallel import _batch, _small_cfg
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.parallel.mesh import make_parallel_train_step
    from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
    from tf_eager_object_detection_tpu.training.train_step import TrainState

    cfg = _small_cfg()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, params, "vgg16")

    mesh = make_global_mesh()
    assert mesh.devices.size == 8, mesh
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state = replicate_from_host(jax.device_get(state), mesh)

    global_batch = tuple(np.asarray(x) for x in _batch(cfg, 8))
    lo, hi = local_batch_slice(8, mesh)
    local = tuple(x[lo:hi] for x in global_batch)
    batch = host_local_to_global(local, mesh)
    rng = replicate_from_host(jax.device_get(jax.random.PRNGKey(7)), mesh)

    step = make_parallel_train_step(det, opt, mesh)
    state, metrics = step(state, batch, rng)

    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(jnp.sum(jnp.abs(l).astype(jnp.float64)) for l in leaves))
    probe = jax.device_get(leaves[0]).astype(np.float64)
    result = {
        "rank": rank,
        "total_loss": float(metrics["total_loss"]),
        "param_checksum": checksum,
        "probe_mean": float(probe.mean()),
        "probe_std": float(probe.std()),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print("worker", rank, "ok", result, flush=True)


if __name__ == "__main__":
    main()
