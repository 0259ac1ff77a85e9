"""FPN train-step benchmark on the real TPU chip (A/B for RoIAlign impls).

Usage:
  BENCH_ROI_ALIGN=einsum python scripts/bench_fpn.py
  BENCH_ROI_ALIGN=pallas python scripts/bench_fpn.py

Prints one JSON line with ms/step and images/sec. Uses the same
probe-scalar device->host sync as bench.py (jax.block_until_ready is a
no-op on this remote-TPU backend — see BENCHLOG.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
    from tf_eager_object_detection_tpu.training.train_step import (
        TrainState,
        make_train_step,
    )

    impl = os.environ.get("BENCH_ROI_ALIGN", "einsum")
    phase = os.environ.get("BENCH_PHASE", "train")
    cfg = dict(config_factory("pascal", "fpn"))
    cfg["tpu_roi_align_impl"] = impl
    cfg["tpu_roi_align_window_dtype"] = os.environ.get(
        "BENCH_WINDOW_DTYPE", cfg.get("tpu_roi_align_window_dtype", "float32")
    )
    cfg["tpu_roi_align_window"] = int(os.environ.get("BENCH_WINDOW", "64"))
    cfg["tpu_roi_align_contract"] = os.environ.get("BENCH_CONTRACT", "auto")
    cfg["tpu_roi_align_fused_levels"] = (
        os.environ.get("BENCH_FUSED_LEVELS", "1") != "0"
    )
    cfg["tpu_compute_dtype"] = os.environ.get("BENCH_DTYPE", cfg["tpu_compute_dtype"])
    if "BENCH_PRENMS" in os.environ:  # per-level pre-NMS prefilter A/B
        cfg["tpu_fpn_per_level_prenms"] = os.environ["BENCH_PRENMS"] != "0"
    b = int(os.environ.get("BENCH_BATCH", "1"))
    cfg["tpu_train_batch_size_per_device"] = b
    backbone = os.environ.get("BENCH_BACKBONE", "resnet50")
    model_type = os.environ.get("BENCH_MODEL", "fpn")
    if model_type != "fpn":
        cfg = dict(config_factory("pascal", model_type))
        cfg["tpu_compute_dtype"] = os.environ.get(
            "BENCH_DTYPE", cfg["tpu_compute_dtype"]
        )
        cfg["tpu_roi_align_contract"] = os.environ.get("BENCH_CONTRACT", "auto")
        cfg["tpu_train_batch_size_per_device"] = b
    det = model_factory(model_type, backbone, cfg)
    params = det.init_params(jax.random.PRNGKey(0))

    if phase == "predict":
        h, w = cfg["tpu_image_buckets"][0]
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        image_hw = jnp.asarray([[h - 8, w - 16]] * b, jnp.int32)
        scales = jnp.ones((b,), jnp.float32)
        sm, deltas, rois, valid = det.im_detect_batch(params, images, image_hw, scales)
        float(sm.sum())
        n_steps = 20
        t0 = time.perf_counter()
        for _ in range(n_steps):
            sm, deltas, rois, valid = det.im_detect_batch(
                params, images, image_hw, scales
            )
        float(sm.sum())  # device->host sync (block_until_ready is a no-op here)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"{model_type}_{backbone}_im_detect_{impl}_" + cfg["tpu_roi_align_window_dtype"] + f"_b{b}",
                    "ms_per_step": round(dt / n_steps * 1e3, 2),
                    "images_per_sec": round(n_steps * b / dt, 2),
                }
            )
        )
        return

    opt = make_optimizer(cfg, params, backbone)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(det, opt, with_probe=True)

    h, w = cfg["tpu_image_buckets"][0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    image_hw = jnp.asarray([[h - 8, w - 16]] * b, jnp.int32)
    g = cfg["tpu_max_gt_boxes"]
    gt = np.zeros((b, g, 4), np.float32)
    gt_mask = np.zeros((b, g), bool)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = 4
        x1 = rng.uniform(0, 800, n)
        y1 = rng.uniform(0, 400, n)
        gt[i, :n] = np.stack(
            [x1, y1, x1 + rng.uniform(30, 180, n), y1 + rng.uniform(30, 180, n)], 1
        )
        gt_mask[i, :n] = True
        gt_labels[i, :n] = rng.randint(1, 21, n)
    batch = (
        images, image_hw, jnp.asarray(gt), jnp.asarray(gt_mask), jnp.asarray(gt_labels)
    )

    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    float(metrics["probe"])
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    float(metrics["probe"])

    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 10))
    float(metrics["probe"])
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()

    print(
        json.dumps(
            {
                "metric": f"{model_type}_{backbone}_train_step_{impl}",
                "ms_per_step": round(dt / n_steps * 1e3, 2),
                "images_per_sec": round(n_steps * b / dt, 2),
                "total_loss": round(float(metrics["total_loss"]), 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
