"""End-to-end train-step benchmark on the real TPU chip.

Measures steady-state train-step throughput in images/sec/chip at the
reference's working resolution (600x1000-class images padded to the static
bucket, batch 1 per reference semantics, scripts/train.py batch_size=1).

Knobs (env): BENCH_MODEL=faster_rcnn|fpn, BENCH_BACKBONE=resnet50|...,
BENCH_BATCH=N, BENCH_DTYPE=float32|bfloat16, BENCH_BUCKET=HxW,
BENCH_PROFILE_DIR=dir, BENCH_EXTRA=0 (headline only, skip the framework
sweep), BENCH_WAIT_IDLE_S=secs (bounded idle-wait budget, default 300),
BENCH_CONFIG_OVERRIDE="key=json;key=json" (per-key config overrides for
A/B runs; unknown keys raise).

Prints ONE JSON line: {"metric", "value", "unit", "degraded",
"vs_baseline", "baseline_note", "extras"}. The headline metric stays the
reference-exact f32 batch-1 configuration; "extras" carries the framework
sweep — b8-bf16 train throughput + MFU for BOTH model families, batched
eval (im_detect_batch) throughput for both, and a 12k-box on-chip
Pallas-vs-XLA NMS index-exactness bit. Host load above 0.5*ncpu deflates
tunneled readings 3x (BENCH_r04); the bench poll-waits for idle up to the
budget and, if every window still ran loaded, sets "degraded": true.
"""

import json
import sys
import time

ASSUMED_BASELINE_IMG_PER_SEC = 5.0

# Measured on this host by scripts/measure_reference_baseline.py: the
# reference's OWN train step (its scripts/train.py:22-50 semantics,
# executing the reference's code) CPU-eager at 600x800. A lower bound on
# the reference's (unpublished) GPU speed; recorded in BENCHLOG round 4.
# Measured 2026-08-19 (round 4): 25.1 s/step at 600x800 -> 0.0398 img/s.
MEASURED_REFERENCE_CPU_IMG_PER_SEC = 0.0398

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 (f32 matmuls lower via bf16
# passes — the bf16 peak is used for BOTH dtypes, making f32 MFU
# conservative)
V5E_PEAK_FLOPS_BF16 = 197e12


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
            profile_dir=None, n_steps=40, n_windows=3, config_override=None,
            collect_flops=False, load_samples=None):
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
        if load_samples is not None:
            load_samples.append(_load1())
    if profile_dir:
        jax.profiler.stop_trace()
    if collect_flops:
        # XLA's own cost model for the compiled train step (analytic
        # FLOPs at the bucket shape) — the basis of the MFU figure
        try:
            cost = step.lower(
                state, batch_t, jax.random.PRNGKey(0)
            ).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", -1.0))
        except Exception:
            flops = -1.0
        return best, flops
    return best


def _load1():
    import os

    try:
        return os.getloadavg()[0]
    except OSError:  # pragma: no cover
        return 0.0


def _load_threshold():
    import os

    return 0.5 * (os.cpu_count() or 1)


def _wait_for_idle(max_wait_s):
    """Poll-wait (bounded) for host load to drop below the corruption
    threshold before measuring. Concurrent host processes stall tunneled
    dispatch and deflate readings by 3x with zero code delta (BENCH_r04:
    28.4 img/s captured at load 8.3 vs ~89 verified at idle) — a bench that
    knowingly publishes a deflated headline is worse than one that waits.
    Returns the final load."""
    deadline = time.monotonic() + max_wait_s
    load = _load1()
    thr = _load_threshold()
    while load > thr and time.monotonic() < deadline:
        print(
            json.dumps(
                {
                    "info": f"host load {load:.1f} > {thr:.1f}: waiting for "
                    f"idle ({int(deadline - time.monotonic())}s budget left)"
                }
            ),
            file=sys.stderr,
        )
        time.sleep(15)
        load = _load1()
    return load


def measure_eval(model_type, backbone, batch=8, dtype=None, bucket=None,
                 n_batches=15, n_windows=3, load_samples=None):
    """Steady-state batched-eval (im_detect_batch) throughput in img/s/chip.

    Mirrors the eval CLIs' hot loop (evaluation/batched_inference.py):
    the two-jit backbone+RPN / RoI-stage split over a device-resident
    batch at the stock bucket. Synthetic steady-state chip rate — same
    methodology as the train measurement (device-resident args; the
    tunnel's H2D pathology is a dev-harness artifact, BENCHLOG r4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", model_type))
    if dtype:
        cfg["tpu_compute_dtype"] = dtype
    if bucket:
        bh, bw = (int(v) for v in bucket.split("x"))
        cfg["tpu_image_buckets"] = [[bh, bw]]
    det = model_factory(model_type, backbone, cfg)
    params = det.init_params(jax.random.PRNGKey(0))

    h, w = cfg["tpu_image_buckets"][0]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, h, w, 3).astype(np.float32))
    vh, vw = min(600, h), min(1000, w)
    image_hw = jnp.asarray([[vh, vw]] * batch, jnp.int32)
    scales = jnp.ones((batch,), jnp.float32)

    def run_once():
        out = det.im_detect_batch(params, images, image_hw, scales)
        # device->host transfer of the smallest output = the only reliable
        # sync on this backend (see the probe note in measure())
        return np.asarray(out[3])

    run_once()  # compile both stages
    run_once()  # warm
    best = 0.0
    for _ in range(max(1, n_windows)):
        t0 = time.perf_counter()
        for _ in range(n_batches):
            valid = run_once()
        dt = time.perf_counter() - t0
        del valid
        best = max(best, n_batches * batch / dt)
        if load_samples is not None:
            load_samples.append(_load1())
    return best


def nms_onchip_exactness():
    """One 12000-box NMS on the chip: Pallas kernel vs the XLA path, index
    exactness required. Re-proves the auto-engage training path
    (ops/nms.py) on every driver bench run — a Mosaic regression at the
    chunked-tail boundary would flip this to false."""
    import jax.numpy as jnp
    import numpy as np

    from tf_eager_object_detection_tpu.ops.nms import nms_alive_sorted

    n = 12000
    rng = np.random.RandomState(7)
    x1 = rng.uniform(0, 900, n)
    y1 = rng.uniform(0, 500, n)
    bw = rng.uniform(8, 300, n)
    bh = rng.uniform(8, 300, n)
    boxes = np.stack(
        [x1, y1, np.minimum(x1 + bw, 1000.0), np.minimum(y1 + bh, 600.0)], 1
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sboxes = jnp.asarray(boxes[order])
    valid = np.ones(n, bool)
    valid[rng.choice(n, 1200, replace=False)] = False
    svalid = jnp.asarray(valid[order])
    alive_p = np.asarray(
        nms_alive_sorted(sboxes, svalid, 0.7, 2000, impl="pallas")
    )
    alive_x = np.asarray(
        nms_alive_sorted(sboxes, svalid, 0.7, 2000, impl="xla")
    )
    return bool(np.array_equal(alive_p, alive_x))


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

    # Concurrent host load corrupts tunneled-dispatch timing (measured 3x
    # deflation at load 8.3 on 1 cpu, BENCH_r04 vs BENCHLOG). Wait (bounded)
    # for idle; if the host never quiets, measure anyway but mark the JSON
    # `degraded` so the archived number can't be mistaken for a regression.
    start_load = _wait_for_idle(
        float(os.environ.get("BENCH_WAIT_IDLE_S", "300"))
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
    batch_env = (
        int(os.environ["BENCH_BATCH"]) if os.environ.get("BENCH_BATCH") else None
    )
    load_samples = []
    img_per_sec, flops_per_step = measure(
        model_type,
        backbone,
        batch=batch_env,
        dtype=os.environ.get("BENCH_DTYPE"),
        bucket=os.environ.get("BENCH_BUCKET"),
        profile_dir=os.environ.get("BENCH_PROFILE_DIR"),
        config_override=config_override,
        collect_flops=True,
        load_samples=load_samples,
    )
    headline_batch = batch_env or 1
    extras = {}
    if flops_per_step > 0:
        extras["flops_per_step"] = flops_per_step
        extras["mfu_vs_bf16_peak"] = round(
            flops_per_step * (img_per_sec / headline_batch)
            / V5E_PEAK_FLOPS_BF16,
            4,
        )
    if os.environ.get("BENCH_EXTRA", "1") != "0" and not any(
        os.environ.get(k)
        for k in ("BENCH_BATCH", "BENCH_DTYPE", "BENCH_BUCKET",
                  "BENCH_PROFILE_DIR", "BENCH_CONFIG_OVERRIDE")
    ):
        # framework-wide sweep (VERDICT r4 item 3b): the fast train path,
        # BOTH families' train + MFU, and the batched-eval path both
        # families — one JSON line tracks the framework, not one config.
        bf16_ips, bf16_flops = measure(
            model_type, backbone, batch=8, dtype="bfloat16",
            collect_flops=True, load_samples=load_samples,
        )
        extras["b8_bfloat16_img_per_sec"] = round(bf16_ips, 3)
        if bf16_flops > 0:
            extras["b8_bfloat16_mfu_vs_bf16_peak"] = round(
                bf16_flops * (bf16_ips / 8) / V5E_PEAK_FLOPS_BF16, 4
            )
        fpn_ips, fpn_flops = measure(
            "fpn", "resnet50", batch=8, dtype="bfloat16",
            collect_flops=True, load_samples=load_samples,
        )
        extras["fpn_b8_bfloat16_img_per_sec"] = round(fpn_ips, 3)
        if fpn_flops > 0:
            extras["fpn_flops_per_step"] = fpn_flops
            extras["fpn_b8_bfloat16_mfu_vs_bf16_peak"] = round(
                fpn_flops * (fpn_ips / 8) / V5E_PEAK_FLOPS_BF16, 4
            )
        extras["eval_b8_img_per_sec"] = round(
            measure_eval(model_type, backbone, batch=8,
                         load_samples=load_samples), 3
        )
        extras["fpn_eval_b8_img_per_sec"] = round(
            measure_eval("fpn", "resnet50", batch=8,
                         load_samples=load_samples), 3
        )
        try:
            extras["pallas_nms_12k_index_exact"] = nms_onchip_exactness()
        except Exception as e:  # visible, not fatal
            extras["pallas_nms_12k_index_exact"] = f"error: {e}"
    if MEASURED_REFERENCE_CPU_IMG_PER_SEC:
        extras["vs_measured_reference_cpu"] = round(
            img_per_sec / MEASURED_REFERENCE_CPU_IMG_PER_SEC, 2
        )
    # degraded: every measurement window ran with host load above the
    # corruption threshold (and the idle wait expired) — the value is a
    # floor, not the chip rate. A single quiet window clears the flag since
    # best-of-N picks it.
    thr = _load_threshold()
    degraded = bool(load_samples) and min(load_samples) > thr
    if degraded:
        extras["load_samples_1min"] = [round(v, 2) for v in load_samples]
    print(
        json.dumps(
            {
                "metric": f"{model_type}_{backbone}_train_step_throughput",
                "value": round(img_per_sec, 3),
                "unit": "images/sec/chip",
                "degraded": degraded,
                "load_1min_at_start": round(start_load, 2),
                "vs_baseline": round(img_per_sec / ASSUMED_BASELINE_IMG_PER_SEC, 3),
                "baseline_note": (
                    "reference publishes no throughput; vs_baseline assumes "
                    f"{ASSUMED_BASELINE_IMG_PER_SEC} img/s (tf-faster-rcnn-era "
                    "single-GPU training speed). extras carries the measured "
                    "comparison: the reference's own train step CPU-eager on "
                    "this host (scripts/measure_reference_baseline.py, a "
                    "lower bound on its GPU speed) and XLA-cost-model MFU "
                    "vs the v5e 197 TFLOP/s bf16 peak"
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
