"""Bucket-grouped batched eval inference, shared by the VOC and COCO paths.

The reference evaluates strictly per image (pascal_eval_files_utils.py:76,
eval_coco.py:117-155). The TPU-first version groups the eval stream by
padded bucket shape and flushes bucket-uniform batches through
`detector.im_detect_batch` (one compiled program per bucket, backbone
batched on the MXU) — the measured ~8x batched-serving win (BENCHLOG.md).
Results are yielded per image, so consumers keep per-image semantics.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["batched_im_detect"]


def batched_im_detect(
    detector,
    params,
    items: Iterable,
    batch_size: int = 8,
    data_parallel: int = 0,
    spatial_partition: int = 0,
) -> Iterator[Tuple[int, tuple, tuple]]:
    """Yields (stream_index, item, (softmax, deltas, rois, roi_valid)).

    `items` yields host-side tuples whose first three entries are
    (padded_image [Hp, Wp, 3], image_hw [2], scale); any further entries
    ride along untouched. Images with the same padded shape are batched
    together (final partial batches are padded by repeating the last
    element; padded rows are dropped before yielding). Yield order is
    batch-completion order, NOT stream order — consumers index by
    `stream_index`.

    data_parallel > 0 shards each flushed batch's leading axis over the
    first `data_parallel` devices (params replicated) — pure GSPMD: the
    committed input shardings make `im_detect_batch`'s jits compile one
    SPMD program per bucket, with per-image detection numerics unchanged
    (the reference has no multi-GPU eval at all; this is the TPU-mesh
    scale-out of its per-image loop, eval_coco.py:117-155).

    spatial_partition > 0 instead shards each image's ROWS over a
    ("batch"=1, "space"=N) mesh (parallel/spatial.py) — the
    more-devices-than-images eval regime; GSPMD inserts conv halo
    exchanges, raw-head numerics unchanged.
    """
    if data_parallel and spatial_partition:
        raise ValueError("data_parallel and spatial_partition are exclusive")
    mesh = None
    shard = None
    if data_parallel:
        from tf_eager_object_detection_tpu.parallel.mesh import (
            make_mesh,
            replicate,
            shard_batch,
        )

        if batch_size % data_parallel:
            raise ValueError(
                f"batch_size={batch_size} not divisible by data_parallel={data_parallel}"
            )
        mesh = make_mesh(data_parallel)
        params = replicate(params, mesh)
        shard = lambda b: shard_batch(b, mesh)  # noqa: E731
    elif spatial_partition:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tf_eager_object_detection_tpu.parallel.mesh import replicate
        from tf_eager_object_detection_tpu.parallel.spatial import (
            make_spatial_mesh,
        )

        mesh = make_spatial_mesh(dp=1, sp=spatial_partition)
        params = replicate(params, mesh)

        def shard(batch):
            images, hws, scales = batch
            img_s = NamedSharding(mesh, P("batch", "space"))
            per_img = NamedSharding(mesh, P("batch"))
            return (
                jax.device_put(images, img_s),
                jax.device_put(hws, per_img),
                jax.device_put(scales, per_img),
            )

    def flush(group):
        n_real = len(group)
        padded = [it for _, it in group]
        while len(padded) < batch_size:
            padded.append(padded[-1])
        images = jnp.asarray(np.stack([it[0] for it in padded]))
        hws = jnp.asarray(np.stack([it[1] for it in padded]))
        scales = jnp.asarray(
            np.asarray([it[2] for it in padded], np.float32)
        )
        if shard is not None:
            images, hws, scales = shard((images, hws, scales))
        sm, deltas, rois, roi_valid = detector.im_detect_batch(
            params, images, hws, scales
        )
        for i in range(n_real):
            idx, item = group[i]
            yield idx, item, (sm[i], deltas[i], rois[i], roi_valid[i])

    pending: dict = {}
    for idx, item in enumerate(items):
        key = tuple(item[0].shape[:2])
        pending.setdefault(key, []).append((idx, item))
        if len(pending[key]) == batch_size:
            yield from flush(pending.pop(key))
    for group in pending.values():
        yield from flush(group)
