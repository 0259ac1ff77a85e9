"""Training loop (the reference's `train_one_epoch`/`train`,
scripts/train.py:77-202), driven by the jitted train step.

Per step: padded batch -> jitted train_step; every `logging_every_n_steps`
log the 4 loss series + lr; every `summary_every_n_steps` write scalars (and
a gt-overlay image) to the metric writer; every `saving_every_n_steps` save a
checkpoint. Restore precedence: explicit ckpt path -> latest in dir.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tf_eager_object_detection_tpu.training.checkpoints import CheckpointManager
from tf_eager_object_detection_tpu.training.metrics import MetricWriter
from tf_eager_object_detection_tpu.training.optimizer import (
    make_lr_schedule,
    make_optimizer,
)
from tf_eager_object_detection_tpu.training.train_step import (
    TrainState,
    make_train_step,
)

__all__ = ["Trainer", "prefetch"]


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run the host-side batch pipeline ahead of the device.

    jax dispatch is async, but the host must still decode/pad the next batch;
    a small background-thread queue overlaps that work with device compute
    (the tf.data prefetch analogue, pascal_tf_dataset_generator.py:101).
    """
    import queue
    import sys
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    done = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(done)
        except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
            # Interpreter teardown can GC modules under the thread's feet;
            # that (and only that) is swallowed. A real data-pipeline error
            # (corrupt tfrecord, decode failure) is forwarded to the consumer
            # and re-raised there, so an epoch never silently ends early.
            if sys.is_finalizing():
                return
            try:
                q.put(exc)
            except BaseException:
                pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class Trainer:
    def __init__(
        self,
        detector,
        train_dir: str,
        logging_every_n_steps: int = 100,
        summary_every_n_steps: int = 100,
        saving_every_n_steps: int = 5000,
        restore_ckpt_path: Optional[str] = None,
        seed: int = 0,
        data_parallel: bool = False,
        backbone_weights: Optional[str] = None,
        multihost: bool = False,
        spatial_partition: int = 1,
    ):
        """multihost=True runs data parallelism over a mesh spanning every
        process of an initialized `jax.distributed` runtime (call
        `parallel.multihost.initialize` first). Every process feeds the SAME
        global batch stream; the trainer slices out this process's rows and
        assembles global arrays via make_array_from_process_local_data
        (parallel/multihost.py). Only process 0 writes logs/summaries; all
        processes participate in checkpoint saves (orbax requirement).
        """
        self.det = detector
        cfg = detector.cfg
        self.multihost = multihost
        self.spatial = int(spatial_partition) > 1
        if self.spatial and multihost:
            raise ValueError(
                "spatial_partition with --multihost is not supported; spatial "
                "partitioning targets the single-host more-chips-than-images "
                "regime"
            )
        self.params = detector.init_params(jax.random.PRNGKey(seed))
        if backbone_weights:
            # pretrained-backbone start (reference fresh-training UX,
            # resnet_faster_rcnn.py:122-131); a restored checkpoint below
            # takes precedence over this init-time load
            from tf_eager_object_detection_tpu.ref_import.cli import (
                load_backbone_weights,
            )

            self.params = jax.tree_util.tree_map(
                jnp.asarray,
                load_backbone_weights(
                    detector, jax.device_get(self.params), backbone_weights
                ),
            )
        self.optimizer = make_optimizer(
            cfg, self.params, detector.backbone, detector.model_type
        )
        self.state = TrainState(
            self.params, self.optimizer.init(self.params), jnp.zeros((), jnp.int32)
        )
        if multihost:
            from tf_eager_object_detection_tpu.parallel.mesh import (
                make_parallel_train_step,
            )
            from tf_eager_object_detection_tpu.parallel.multihost import (
                make_global_mesh,
            )

            self.mesh = make_global_mesh()
            self.step_fn = make_parallel_train_step(
                detector, self.optimizer, self.mesh
            )
            self.shard_fn = None  # multihost feeds via host_local_to_global
        elif self.spatial:
            # 2-D ("batch", "space") mesh: each image's rows are sharded
            # over `spatial_partition` devices, the rest of the devices form
            # the data-parallel axis (parallel/spatial.py)
            from tf_eager_object_detection_tpu.parallel.spatial import (
                make_spatial_mesh,
                make_spatial_train_step,
                shard_batch as spatial_shard_batch,
            )

            self.mesh = make_spatial_mesh(sp=int(spatial_partition))
            self.step_fn = make_spatial_train_step(
                detector, self.optimizer, self.mesh
            )
            self.shard_fn = spatial_shard_batch
        elif data_parallel:
            from tf_eager_object_detection_tpu.parallel.mesh import (
                make_mesh,
                make_parallel_train_step,
                shard_batch,
            )

            self.mesh = make_mesh()
            self.step_fn = make_parallel_train_step(
                detector, self.optimizer, self.mesh
            )
            self.shard_fn = shard_batch
        else:
            self.mesh = None
            self.step_fn = make_train_step(detector, self.optimizer)
            self.shard_fn = None
        self.lr_schedule = make_lr_schedule(cfg)
        self.ckpt = CheckpointManager(train_dir)
        if restore_ckpt_path:
            restore_mgr = CheckpointManager(restore_ckpt_path)
            self.state = restore_mgr.restore(self.state)
        else:
            self.state = self.ckpt.restore(self.state)
        if multihost:
            from tf_eager_object_detection_tpu.parallel.multihost import (
                replicate_from_host,
            )

            self.state = replicate_from_host(
                jax.device_get(self.state), self.mesh
            )
        elif self.mesh is not None:
            from tf_eager_object_detection_tpu.parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
        self.is_primary = (not multihost) or jax.process_index() == 0
        self.writer = MetricWriter(train_dir) if self.is_primary else None
        self.logging_every = logging_every_n_steps
        self.summary_every = summary_every_n_steps
        self.saving_every = saving_every_n_steps
        self.rng = jax.random.PRNGKey(seed + 1)

    def train_one_epoch(self, batches: Iterator[dict], steps: Optional[int] = None):
        t_start = time.time()
        n = 0
        # ONE device->host sync per epoch: reading state.step inside the
        # loop would synchronize on every just-dispatched step (a full
        # tunnel/PCIe round-trip per step — measured 3 steps/s vs the
        # chip's 80+, BENCHLOG round 4). The device step advances by
        # exactly 1 per train_step, so a host-side counter tracks it.
        step0 = int(jax.device_get(self.state.step))
        for batch in batches:
            self.rng, step_rng = jax.random.split(self.rng)
            batch_tuple = (
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["image_hw"]),
                jnp.asarray(batch["gt_boxes"]),
                jnp.asarray(batch["gt_mask"]),
                jnp.asarray(batch["gt_labels"]),
            )
            if self.multihost:
                from tf_eager_object_detection_tpu.parallel.multihost import (
                    host_local_to_global,
                    local_batch_slice,
                    replicate_from_host,
                )

                lo, hi = local_batch_slice(
                    int(batch_tuple[0].shape[0]), self.mesh
                )
                local = tuple(np.asarray(x)[lo:hi] for x in batch_tuple)
                batch_tuple = host_local_to_global(local, self.mesh)
                step_rng = replicate_from_host(
                    jax.device_get(step_rng), self.mesh
                )
            elif self.mesh is not None:
                from tf_eager_object_detection_tpu.parallel.mesh import replicate

                # batch divisibility is over the mesh's batch axis only (the
                # DP mesh is 1-D so this equals the device count; the spatial
                # mesh's "space" axis shards rows, not images)
                n_dp = dict(self.mesh.shape)["batch"]
                if batch_tuple[0].shape[0] % n_dp:
                    raise ValueError(
                        f"global batch {batch_tuple[0].shape[0]} not divisible "
                        f"by mesh batch axis {n_dp}"
                    )
                batch_tuple = self.shard_fn(batch_tuple, self.mesh)
                step_rng = replicate(step_rng, self.mesh)
            self.state, metrics = self.step_fn(self.state, batch_tuple, step_rng)
            n += 1
            step = step0 + n  # == int(self.state.step) without the sync
            if step % self.logging_every == 0 and self.is_primary:
                vals = {k: float(v) for k, v in metrics.items()}
                lr = float(self.lr_schedule(step))
                print(
                    f"step {step} lr={lr:.2e} "
                    + " ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                    flush=True,
                )
            if step % self.summary_every == 0 and self.writer is not None:
                vals = {k: float(v) for k, v in metrics.items()}
                vals["learning_rate"] = float(self.lr_schedule(step))
                self.writer.write_scalars(step, vals)
                self._write_gt_overlay(step, batch)
                self._write_pred_overlay(step, batch)
            if step % self.saving_every == 0:
                self.ckpt.save(self.state)
            if steps is not None and n >= steps:
                break
        dt = time.time() - t_start
        if self.is_primary:
            print(
                f"epoch finished: {n} steps in {dt:.1f}s "
                f"({n / max(dt, 1e-9):.2f} steps/s)"
            )
        return self.state

    def _write_gt_overlay(self, step: int, batch: dict):
        """gt-box overlay image summary (scripts/train.py:114-142 analogue)."""
        try:
            from tf_eager_object_detection_tpu.utils.visual import show_one_image

            img = np.asarray(batch["images"][0])
            mask = np.asarray(batch["gt_mask"][0])
            boxes = np.asarray(batch["gt_boxes"][0])[mask]
            labels = np.asarray(batch["gt_labels"][0])[mask]
            overlay = show_one_image(
                img, boxes, labels.tolist(),
                bgr_means=self.det.cfg.get(
                    "bgr_pixel_means", (103.939, 116.779, 123.68)
                ),
            )
            self.writer.write_image(step, "gt_boxes", overlay)
        except Exception as exc:
            self._warn_overlay_once("gt", exc)

    def _write_pred_overlay(self, step: int, batch: dict):
        """Eval-mode forward on the current batch image -> predicted-box
        overlay next to the gt one (reference scripts/train.py:114-142)."""
        try:
            from tf_eager_object_detection_tpu.utils.visual import show_one_image

            img = jnp.asarray(batch["images"][0])
            hw = jnp.asarray(batch["image_hw"][0])
            params = self.state.params
            if self.multihost:
                # predict runs on THIS process only, but multihost params
                # are global (non-fully-addressable) arrays; DP replicates
                # them, so the local shard is a complete copy.
                params = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x.addressable_data(0)), params
                )
            # detector.predict is already jit-compiled at class level
            det = self.det.predict(params, img, hw)
            thr = self.det.cfg.get("show_image_score_threshold", 0.3)
            keep = np.asarray(det.valid) & (np.asarray(det.scores) >= thr)
            if not keep.any():
                return
            boxes = np.asarray(det.boxes)[keep]
            tags = [
                f"{int(l)}:{s:.2f}"
                for l, s in zip(np.asarray(det.labels)[keep],
                                np.asarray(det.scores)[keep])
            ]
            overlay = show_one_image(
                np.asarray(batch["images"][0]), boxes, tags,
                bgr_means=self.det.cfg.get(
                    "bgr_pixel_means", (103.939, 116.779, 123.68)
                ),
            )
            self.writer.write_image(step, "pred_boxes", overlay)
        except Exception as exc:
            self._warn_overlay_once("pred", exc)

    def _warn_overlay_once(self, kind: str, exc: Exception):
        """Visualization must never break training, but a permanently broken
        overlay writer should not fail silently either."""
        warned = getattr(self, "_overlay_warned", set())
        if kind not in warned:
            warned.add(kind)
            self._overlay_warned = warned
            print(f"warning: {kind}-box overlay summary failed: {exc!r}", flush=True)

    def train(self, batches: Iterator[dict], epochs: int, steps_per_epoch: int):
        batches = prefetch(batches)
        for epoch in range(epochs):
            if self.is_primary:
                print(f"epoch {epoch + 1}/{epochs}")
            self.train_one_epoch(batches, steps_per_epoch)
            self.ckpt.save(self.state)
        if self.writer is not None:
            self.writer.flush()
        self.close()
        return self.state

    def close(self):
        if self.writer is not None:
            self.writer.close()
        self.ckpt.close()
