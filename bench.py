"""End-to-end train-step benchmark on the real TPU chip.

Measures steady-state train-step throughput in images/sec/chip at the
reference's working resolution (600x1000-class images padded to the static
bucket, batch 1 per reference semantics, scripts/train.py batch_size=1).

Knobs (env): BENCH_MODEL=faster_rcnn|fpn, BENCH_BACKBONE=resnet50|...,
BENCH_BATCH=N, BENCH_DTYPE=float32|bfloat16, BENCH_BUCKET=HxW,
BENCH_PROFILE_DIR=dir, BENCH_EXTRA=0 (skip the extra b8-bf16 datapoint),
BENCH_CONFIG_OVERRIDE="key=json;key=json" (per-key config overrides for
A/B runs; unknown keys raise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"baseline_note", "extras"}. The headline metric stays the reference-exact
f32 batch-1 configuration; "extras" carries the measured
batch-8 bfloat16 throughput of the same model (the documented fast path,
BENCHLOG.md round 2) so regressions in it are driver-visible too.
"""

import json
import sys
import time

ASSUMED_BASELINE_IMG_PER_SEC = 5.0


def _parse_config_override(raw):
    """Parse BENCH_CONFIG_OVERRIDE ("key=json;key=json") -> dict."""
    out = {}
    for kv in raw.split(";"):
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(
                f"BENCH_CONFIG_OVERRIDE: segment {kv!r} has no '='; "
                "expected key=json (e.g. fused_momentum=false)"
            )
        k, v = kv.split("=", 1)
        out[k] = json.loads(v)
    return out


def measure(model_type, backbone, batch=None, dtype=None, bucket=None,
            profile_dir=None, n_steps=40, n_windows=3, config_override=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
    from tf_eager_object_detection_tpu.training.train_step import (
        TrainState,
        make_train_step,
    )

    cfg = dict(config_factory("pascal", model_type))
    if dtype:
        cfg["tpu_compute_dtype"] = dtype
    if batch:
        cfg["tpu_train_batch_size_per_device"] = batch
    if bucket:
        bh, bw = (int(v) for v in bucket.split("x"))
        cfg["tpu_image_buckets"] = [[bh, bw]]
    for key, value in (config_override or {}).items():
        if key not in cfg:
            raise KeyError(f"BENCH_CONFIG_OVERRIDE: unknown config key {key!r}")
        cfg[key] = value
    det = model_factory(model_type, backbone, cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, params, backbone, model_type)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(det, opt, with_probe=True)

    b = cfg["tpu_train_batch_size_per_device"]
    h, w = cfg["tpu_image_buckets"][0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    # valid extent must fit inside the (possibly overridden) padded bucket
    vh, vw = min(600, h), min(1000, w)
    image_hw = jnp.asarray([[vh, vw]] * b, jnp.int32)
    g = cfg["tpu_max_gt_boxes"]
    gt = np.zeros((b, g, 4), np.float32)
    gt_mask = np.zeros((b, g), bool)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = 4
        x1 = rng.uniform(0, 0.8 * vw, n)
        y1 = rng.uniform(0, 0.6 * vh, n)
        gt[i, :n] = np.stack(
            [
                x1,
                y1,
                np.minimum(x1 + rng.uniform(30, 180, n), vw - 1),
                np.minimum(y1 + rng.uniform(30, 180, n), vh - 1),
            ],
            1,
        )
        gt_mask[i, :n] = True
        gt_labels[i, :n] = rng.randint(1, 21, n)
    batch_t = (images, image_hw, jnp.asarray(gt), jnp.asarray(gt_mask),
               jnp.asarray(gt_labels))

    # compile + warmup. NOTE: on this remote-TPU backend
    # jax.block_until_ready does NOT actually wait for execution (verified:
    # a 66-TFLOP matmul chain "completes" in 0.1 ms under it). The only
    # reliable sync is a device->host transfer, so the step returns a
    # `probe` scalar that transitively depends on every updated parameter
    # and we force it to host with float().
    state, metrics = step(state, batch_t, jax.random.PRNGKey(0))
    float(metrics["probe"])
    for i in range(3):
        state, metrics = step(state, batch_t, jax.random.PRNGKey(i + 1))
    float(metrics["probe"])

    # The tunneled backend intermittently stalls dispatch for seconds at a
    # time (observed: a multi-minute hiccup that halved a 20-step reading
    # while the very same program measured 82 img/s moments later). Measure
    # several independent windows and report the best one: steady-state
    # throughput is the quantity a transient stall corrupts, never inflates.
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    best = 0.0
    for win in range(max(1, n_windows)):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(
                state, batch_t, jax.random.PRNGKey(win * n_steps + i + 10)
            )
        float(metrics["probe"])  # device->host sync (see note above)
        dt = time.perf_counter() - t0
        best = max(best, n_steps * b / dt)
    if profile_dir:
        jax.profiler.stop_trace()
    return best


def _tunnel_precheck():
    """Fail fast with a legible JSON error when the TPU tunnel is dead.

    Under the ambient axon environment, jax backend init claims the remote
    chip via 127.0.0.1:8083 (axon/register/pjrt.py); when that agent is down
    the claim attempt blocks ~15 minutes before raising UNAVAILABLE. Only
    fast-fails when the axon env markers are present AND the claim port
    refuses connections — any other configuration passes through untouched.
    """
    import os
    import socket

    if "axon" not in os.environ.get("PYTHONPATH", "") and os.environ.get(
        "JAX_PLATFORMS", ""
    ) not in ("axon",):
        return
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=5).close()
    except OSError:
        print(
            json.dumps(
                {
                    "metric": "train_step_throughput",
                    "value": None,
                    "unit": "images/sec/chip",
                    "error": (
                        "TPU tunnel down: 127.0.0.1:8083 refuses "
                        "connections, backend claim would hang then fail "
                        "UNAVAILABLE"
                    ),
                }
            )
        )
        sys.exit(1)


def main():
    import os

    _tunnel_precheck()

    # Concurrent host load corrupts tunneled-dispatch timing (measured: a
    # CPU pytest run sharing this 1-core host depressed the b1 reading by
    # 25% with zero code delta — BENCHLOG). Flag it rather than silently
    # reporting a deflated number.
    try:
        load1 = os.getloadavg()[0]
    except OSError:  # pragma: no cover
        load1 = 0.0
    ncpu = os.cpu_count() or 1
    if load1 > 0.5 * ncpu:
        print(
            json.dumps(
                {
                    "warning": (
                        f"host 1-min load {load1:.1f} on {ncpu} cpu(s): "
                        "concurrent processes stall tunneled dispatch and "
                        "deflate throughput readings"
                    )
                }
            ),
            file=sys.stderr,
        )

    import jax

    # Persistent compilation cache: repeat benchmark runs skip the multi-minute
    # XLA compile (first run still pays it).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    model_type = os.environ.get("BENCH_MODEL", "faster_rcnn")
    backbone = os.environ.get("BENCH_BACKBONE", "resnet50")
    config_override = _parse_config_override(
        os.environ.get("BENCH_CONFIG_OVERRIDE", "")
    )
    img_per_sec = measure(
        model_type,
        backbone,
        batch=int(os.environ["BENCH_BATCH"]) if os.environ.get("BENCH_BATCH") else None,
        dtype=os.environ.get("BENCH_DTYPE"),
        bucket=os.environ.get("BENCH_BUCKET"),
        profile_dir=os.environ.get("BENCH_PROFILE_DIR"),
        config_override=config_override,
    )
    extras = {}
    if os.environ.get("BENCH_EXTRA", "1") != "0" and not any(
        os.environ.get(k)
        for k in ("BENCH_BATCH", "BENCH_DTYPE", "BENCH_BUCKET",
                  "BENCH_PROFILE_DIR", "BENCH_CONFIG_OVERRIDE")
    ):
        extras["b8_bfloat16_img_per_sec"] = round(
            measure(model_type, backbone, batch=8, dtype="bfloat16"), 3
        )
    print(
        json.dumps(
            {
                "metric": f"{model_type}_{backbone}_train_step_throughput",
                "value": round(img_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / ASSUMED_BASELINE_IMG_PER_SEC, 3),
                "baseline_note": (
                    "reference publishes no throughput; vs_baseline assumes "
                    f"{ASSUMED_BASELINE_IMG_PER_SEC} img/s (tf-faster-rcnn-era "
                    "single-GPU training speed)"
                ),
                "extras": extras,
                # mark A/B datapoints so they can't be confused with the
                # headline configuration in archived BENCH_r*.json files
                **(
                    {"config_override": config_override}
                    if config_override
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
