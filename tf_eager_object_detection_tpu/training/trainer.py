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
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    done = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except Exception:
            pass  # interpreter teardown can GC modules under our feet
        finally:
            try:
                q.put(done)
            except Exception:
                pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
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
    ):
        self.det = detector
        cfg = detector.cfg
        self.params = detector.init_params(jax.random.PRNGKey(seed))
        self.optimizer = make_optimizer(
            cfg, self.params, detector.backbone, detector.model_type
        )
        self.state = TrainState(
            self.params, self.optimizer.init(self.params), jnp.zeros((), jnp.int32)
        )
        self.step_fn = make_train_step(detector, self.optimizer)
        self.lr_schedule = make_lr_schedule(cfg)
        self.ckpt = CheckpointManager(train_dir)
        if restore_ckpt_path:
            restore_mgr = CheckpointManager(restore_ckpt_path)
            self.state = restore_mgr.restore(self.state)
        else:
            self.state = self.ckpt.restore(self.state)
        self.writer = MetricWriter(train_dir)
        self.logging_every = logging_every_n_steps
        self.summary_every = summary_every_n_steps
        self.saving_every = saving_every_n_steps
        self.rng = jax.random.PRNGKey(seed + 1)

    def train_one_epoch(self, batches: Iterator[dict], steps: Optional[int] = None):
        t_start = time.time()
        n = 0
        for batch in batches:
            self.rng, step_rng = jax.random.split(self.rng)
            batch_tuple = (
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["image_hw"]),
                jnp.asarray(batch["gt_boxes"]),
                jnp.asarray(batch["gt_mask"]),
                jnp.asarray(batch["gt_labels"]),
            )
            self.state, metrics = self.step_fn(self.state, batch_tuple, step_rng)
            n += 1
            step = int(self.state.step)
            if step % self.logging_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                lr = float(self.lr_schedule(step))
                print(
                    f"step {step} lr={lr:.2e} "
                    + " ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                    flush=True,
                )
            if step % self.summary_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                vals["learning_rate"] = float(self.lr_schedule(step))
                self.writer.write_scalars(step, vals)
                self._write_gt_overlay(step, batch)
            if step % self.saving_every == 0:
                self.ckpt.save(self.state)
            if steps is not None and n >= steps:
                break
        dt = time.time() - t_start
        print(f"epoch finished: {n} steps in {dt:.1f}s ({n / max(dt, 1e-9):.2f} steps/s)")
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
        except Exception:
            pass  # visualization must never break training

    def train(self, batches: Iterator[dict], epochs: int, steps_per_epoch: int):
        batches = prefetch(batches)
        for epoch in range(epochs):
            print(f"epoch {epoch + 1}/{epochs}")
            self.train_one_epoch(batches, steps_per_epoch)
            self.ckpt.save(self.state)
        self.writer.flush()
        self.close()
        return self.state

    def close(self):
        self.writer.close()
        self.ckpt.close()
