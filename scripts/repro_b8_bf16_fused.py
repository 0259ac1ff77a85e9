#!/usr/bin/env python
"""Minimized on-chip repro + fence experiment for the b8-bf16 fused
im_detect_batch XLA:TPU runtime crash (BENCHLOG round 2; VERDICT r3
task 2).

The fault: jitting Faster R-CNN's full im_detect pipeline (batched
backbone+RPN, then the vmapped per-image RoI stage) as ONE program
deterministically kills the TPU runtime ("TPU worker process crashed or
restarted") at exactly batch 8 + bfloat16 compute — each half runs fine
alone, b8 f32 fuses fine, b8 bf16 *training* fuses fine. The shipped
workaround is a two-jit split; this script measures whether a
`jax.lax.optimization_barrier` between the stages inside ONE jit also
avoids the fault (composition-safe: the barrier survives inlining under
an outer jit/shard_map, unlike the python-level split).

Each variant runs in a SUBPROCESS (a reproduced crash kills the child's
runtime claim, not the parent). Default batch/dtype target the crash
point; --batch/--dtype sweep the boundary.

Usage:
  python scripts/repro_b8_bf16_fused.py                 # all variants
  python scripts/repro_b8_bf16_fused.py --variants barrier,split
  python scripts/repro_b8_bf16_fused.py --child fused   # (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("fused", "barrier", "split")


def build(dtype: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory,
    )
    from tf_eager_object_detection_tpu.models.model_factory import (
        model_factory,
    )

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg["tpu_compute_dtype"] = dtype
    det = model_factory("faster_rcnn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    h, w = cfg["tpu_image_buckets"][0]
    return det, params, (h, w), jnp, np


def child(variant: str, batch: int, dtype: str, steps: int) -> dict:
    import jax

    det, params, (h, w), jnp, np = build(dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, h, w, 3).astype(np.float32))
    image_hw = jnp.asarray([[600, 1000]] * batch, jnp.int32)
    scales = jnp.ones((batch,), jnp.float32)

    if variant == "split":
        fn = lambda p, im, hw, s: det.im_detect_batch(p, im, hw, s)  # noqa: E731
    else:
        def fused(p, im, hw, s):
            feats, score_map, bbox_map = det._backbone_rpn(p, im)
            if variant == "barrier":
                feats, score_map, bbox_map = jax.lax.optimization_barrier(
                    (feats, score_map, bbox_map)
                )
            return det._im_detect_roi_stage(p, feats, score_map, bbox_map,
                                            hw, s)

        fn = jax.jit(fused)

    # the only reliable sync on this backend is a device->host transfer
    out = fn(params, images, image_hw, scales)
    first = float(out[0].reshape(-1)[0])
    t0 = time.time()
    for _ in range(steps):
        out = fn(params, images, image_hw, scales)
        _ = np.asarray(out[0].reshape(-1)[0])
    dt = time.time() - t0
    return {
        "variant": variant,
        "batch": batch,
        "dtype": dtype,
        "ok": True,
        "img_per_sec": round(batch * steps / dt, 2),
        "first_value": first,
        "checksum": float(np.asarray(out[0], np.float32).sum()),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--child", choices=VARIANTS, help="internal: run one "
                   "variant in-process and print its JSON result")
    p.add_argument("--variants", default="fused,barrier,split")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--timeout", type=int, default=900)
    args = p.parse_args()

    if args.child:
        print("CHILD " + json.dumps(
            child(args.child, args.batch, args.dtype, args.steps)
        ))
        return

    results = {}
    for variant in args.variants.split(","):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", variant,
             "--batch", str(args.batch), "--dtype", args.dtype,
             "--steps", str(args.steps)],
            capture_output=True, text=True, cwd=REPO, timeout=args.timeout,
        )
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("CHILD "):
                rec = json.loads(line[6:])
        if rec is None:
            rec = {
                "variant": variant, "batch": args.batch, "dtype": args.dtype,
                "ok": False, "returncode": proc.returncode,
                "stderr_tail": proc.stderr[-800:],
            }
        results[variant] = rec
        print(json.dumps(rec), flush=True)

    oks = {v: r["ok"] for v, r in results.items()}
    sums = {v: r.get("checksum") for v, r in results.items() if r["ok"]}
    print("SUMMARY " + json.dumps({"ok": oks, "checksums": sums}))


if __name__ == "__main__":
    main()
