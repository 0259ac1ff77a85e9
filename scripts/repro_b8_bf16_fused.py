#!/usr/bin/env python
"""Minimized on-chip repro + bisection harness for the b8-bf16 fused
im_detect_batch XLA:TPU runtime crash (BENCHLOG rounds 2+4; VERDICT r3
task 2).

The fault: jitting Faster R-CNN's full im_detect pipeline as ONE program
with the per-image RoI stage VMAPPED deterministically kills the TPU
runtime ("TPU worker process crashed or restarted") at batch 8 +
bfloat16 compute.

Round-4 bisection results (this harness, each variant a subprocess):

  backbone   (batched backbone+RPN alone)                 OK   220 im/s
  proposals  (vmapped decode+clip+topk+NMS alone)         OK   297 im/s
  crop       (proposals + vmapped RoIAlign)               OK   203 im/s
  headonly   (RoI head alone on random [8,300,7,7,1024])  OK   168 im/s
  minimal    (vmapped crop_and_resize alone, w_first)     OK   129 im/s
  head       (proposals + crop + head, vmapped)           CRASH
  roi        (the full vmapped RoI stage, random inputs)  CRASH
  headbarrier(optimization_barrier between crop and head) HANGS >600s
  scanfused  (ONE jit, RoI stage as lax.map over images)  OK   124 im/s
  traced     (production im_detect_batch under outer jit) OK

So the fault needs the NMS->RoIAlign->RoI-head chain compiled together
under vmap; no single component reproduces it, a barrier converts the
crash into a hang, and a lax.map (scan) RoI stage sidesteps it entirely
at split-equal throughput (124.2 vs 124.8 im/s). The production fix:
im_detect_batch host calls keep the two-jit split (GSPMD-shardable for
data-parallel eval); when TRACED under an outer jit it now switches to
the lax.map body instead of warning (models/faster_rcnn.py).

Each variant runs in a SUBPROCESS (a reproduced crash kills the child's
runtime claim, not the parent; a hang is reaped by --timeout). Default
batch/dtype target the crash point; --batch/--dtype sweep the boundary.

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

VARIANTS = ("fused", "barrier", "split", "backbone", "roi", "minimal",
            "proposals", "crop", "head", "headonly", "headbarrier",
            "scanfused", "traced")


def build(dtype: str, overrides: dict | None = None):
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
    for k, v in (overrides or {}).items():
        if k not in cfg:
            raise KeyError(f"unknown config key {k!r}")
        cfg[k] = v
    det = model_factory("faster_rcnn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    h, w = cfg["tpu_image_buckets"][0]
    return det, params, (h, w), jnp, np


def child_minimal(batch: int, dtype: str, steps: int,
                  overrides: dict | None = None) -> dict:
    """Candidate minimal repro: the Faster R-CNN EVAL RoIAlign alone —
    vmapped crop_and_resize over [B, 38, 63, 1024] {dtype} features x
    300 rois x crop 14 (the C4 eval shapes at bucket 608x1008). No
    backbone, no NMS, no heads. Contraction order comes from the
    tpu_roi_align_contract override (default w_first — what 'auto'
    resolves to for bf16 landscape maps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_eager_object_detection_tpu.ops.roi_align import crop_and_resize

    order = (overrides or {}).get("tpu_roi_align_contract", "w_first")
    rng = np.random.RandomState(0)
    feats = jnp.asarray(
        rng.randn(batch, 38, 63, 1024).astype(np.float32), jnp.dtype(dtype)
    )
    # normalized TF-order boxes in-bounds
    y1x1 = rng.uniform(0.0, 0.5, (batch, 300, 2))
    y2x2 = y1x1 + rng.uniform(0.05, 0.5, (batch, 300, 2))
    boxes = jnp.asarray(
        np.concatenate([y1x1, np.minimum(y2x2, 1.0)], -1).astype(np.float32)
    )
    fn = jax.jit(jax.vmap(
        lambda f, b: crop_and_resize(f, b, 14, order=order)
    ))
    out = fn(feats, boxes)
    first = float(out.reshape(-1)[0])
    t0 = time.time()
    for _ in range(steps):
        out = fn(feats, boxes)
        _ = np.asarray(out.reshape(-1)[0])
    dt = time.time() - t0
    return {
        "variant": "minimal", "order": order, "batch": batch,
        "dtype": dtype, "ok": True,
        "img_per_sec": round(batch * steps / dt, 2), "first_value": first,
        "checksum": float(np.asarray(out, np.float32).sum()),
    }


def child(variant: str, batch: int, dtype: str, steps: int,
          overrides: dict | None = None) -> dict:
    import jax

    if variant == "minimal":
        return child_minimal(batch, dtype, steps, overrides)

    det, params, (h, w), jnp, np = build(dtype, overrides)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, h, w, 3).astype(np.float32))
    image_hw = jnp.asarray([[600, 1000]] * batch, jnp.int32)
    scales = jnp.ones((batch,), jnp.float32)

    if variant == "split":
        fn = lambda p, im, hw, s: det.im_detect_batch(p, im, hw, s)  # noqa: E731
    elif variant == "traced":
        # the PRODUCTION composition path: im_detect_batch under an outer
        # jit (tracer-detected -> lax.map RoI stage in one program)
        fn = jax.jit(
            lambda p, im, hw, s: det.im_detect_batch(p, im, hw, s)
        )
    elif variant == "backbone":
        # first half alone: batched backbone+RPN heads
        fn = lambda p, im, hw, s: det._backbone_rpn_jit(p, im)  # noqa: E731
    elif variant == "roi":
        # second half alone: feed the vmapped RoI stage RANDOM arrays of
        # the exact shapes/dtypes the backbone would produce (eval_shape —
        # no device execution of the first half)
        shapes = jax.eval_shape(det._backbone_rpn, params, images)
        fakes = tuple(
            jnp.asarray(
                np.random.RandomState(7 + i).randn(*sd.shape), sd.dtype
            )
            for i, sd in enumerate(shapes)
        )
        fn = lambda p, im, hw, s: det._im_detect_roi_stage(  # noqa: E731
            p, *fakes, hw, s
        )
    elif variant in ("head", "headbarrier"):
        # 'head': full _roi_forward vmapped (proposals + crop + roi_head +
        # softmax) minus only the trailing rois/scale + deltas reshape of
        # the real stage. 'headbarrier': same, but with an
        # optimization_barrier between the crop output and the head — the
        # candidate composition-safe fence (unlike the two-jit split it
        # survives inlining under an outer jit).
        from tf_eager_object_detection_tpu.ops.roi_align import (
            roi_crop_faster_rcnn,
        )

        shapes = jax.eval_shape(det._backbone_rpn, params, images)
        fakes = tuple(
            jnp.asarray(
                np.random.RandomState(7 + i).randn(*sd.shape), sd.dtype
            )
            for i, sd in enumerate(shapes)
        )
        gh, gw = shapes[0].shape[1], shapes[0].shape[2]
        anchors = det.anchors_for_grid(gh, gw)

        def one_rf(p, feat_i, score_i, bbox_i, hw_i):
            rois, roi_valid, _ = det._proposals(
                score_i, bbox_i, anchors, hw_i, (gh, gw), training=False
            )
            roi_feats = roi_crop_faster_rcnn(
                feat_i, rois, det.stride, det.cfg["roi_pooling_size"],
                det.roi_max_pooling, order=det._contract_order(),
            )
            if variant == "headbarrier":
                roi_feats = jax.lax.optimization_barrier(roi_feats)
            sc, dl = det.roi_head.apply(
                {"params": p["roi_head"]}, roi_feats, train=False
            )
            return rois, roi_valid, jax.nn.softmax(sc, -1), dl

        fn = jax.jit(  # noqa: E731
            lambda p, im, hw, s: jax.vmap(
                one_rf, (None, 0, 0, 0, 0)
            )(p, *fakes, hw)
        )
    elif variant == "headonly":
        # the RoI head alone: random [B, 300, 7, 7, C] crops (the crop
        # stage's output shape/dtype) -> vmapped head + softmax
        n_roi = det.cfg["rpn_proposal_test_after_nms_sample_number"]
        ps = det.cfg["roi_pooling_size"]
        ch = det.roi_feature_channels
        crops = jnp.asarray(
            np.random.RandomState(3).randn(batch, n_roi, ps, ps, ch),
            jnp.dtype(dtype),
        )

        def one_head(p, crop_i):
            sc, dl = det.roi_head.apply(
                {"params": p["roi_head"]}, crop_i, train=False
            )
            return jax.nn.softmax(sc, -1), dl

        # crops must be an ARGUMENT, not a closed-over constant: a 241 MB
        # bf16 literal exceeds the tunnel's remote_compile request limit
        # (HTTP 413)
        head_jit = jax.jit(lambda p, c: jax.vmap(one_head, (None, 0))(p, c))
        fn = lambda p, im, hw, s: head_jit(p, crops)  # noqa: E731
    elif variant in ("proposals", "crop"):
        # sub-bisect INSIDE the RoI stage (the 'roi' variant reproduces the
        # crash standalone): run only its prefix — per-image proposal
        # generation (decode+clip+topk+NMS), optionally + the RoIAlign crop
        # — vmapped over batch, from the same eval_shape fakes as 'roi'.
        from tf_eager_object_detection_tpu.ops.roi_align import (
            roi_crop_faster_rcnn,
        )

        shapes = jax.eval_shape(det._backbone_rpn, params, images)
        fakes = tuple(
            jnp.asarray(
                np.random.RandomState(7 + i).randn(*sd.shape), sd.dtype
            )
            for i, sd in enumerate(shapes)
        )
        gh, gw = shapes[0].shape[1], shapes[0].shape[2]
        anchors = det.anchors_for_grid(gh, gw)

        def one(feat_i, score_i, bbox_i, hw_i):
            rois, roi_valid, _ = det._proposals(
                score_i, bbox_i, anchors, hw_i, (gh, gw), training=False
            )
            if variant == "proposals":
                return rois * roi_valid[:, None]
            roi_feats = roi_crop_faster_rcnn(
                feat_i, rois, det.stride, det.cfg["roi_pooling_size"],
                det.roi_max_pooling, order=det._contract_order(),
            )
            return roi_feats

        fn = jax.jit(  # noqa: E731
            lambda p, im, hw, s: (jax.vmap(one)(*fakes, hw),)
        )
    elif variant == "scanfused":
        # ONE jit program, but the per-image RoI stage is a lax.map
        # (scan) over the batch instead of a vmap: bounded per-iteration
        # intermediates and a completely different fusion/layout outcome
        # for the crop->head boundary. If this survives b8-bf16 it is a
        # composition-safe single-program alternative to the two-jit
        # split.

        def scanfused(p, im, hw, s):
            feats, score_map, bbox_map = det._backbone_rpn(p, im)

            def one(args):
                f_i, sc_i, bb_i, hw_i, s_i = args
                rois, roi_valid, roi_softmax, roi_deltas = det._roi_forward(
                    p, f_i, sc_i, bb_i, hw_i
                )
                return (
                    roi_softmax,
                    roi_deltas.reshape(-1, det.num_classes, 4),
                    rois / s_i,
                    roi_valid,
                )

            return jax.lax.map(
                one, (feats, score_map, bbox_map, hw, s)
            )

        fn = jax.jit(scanfused)
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

    # phase breadcrumbs on stderr: on a hang the parent's stderr_tail says
    # whether we died in trace/compile or at runtime
    if hasattr(fn, "lower"):
        lowered = fn.lower(params, images, image_hw, scales)
        print(f"PHASE lowered t={time.time():.1f}", file=sys.stderr,
              flush=True)
        compiled = lowered.compile()
        print(f"PHASE compiled t={time.time():.1f}", file=sys.stderr,
              flush=True)
        fn = lambda *a: compiled(*a)  # noqa: E731
    print(f"PHASE dispatch_first t={time.time():.1f}", file=sys.stderr,
          flush=True)
    # the only reliable sync on this backend is a device->host transfer
    out = fn(params, images, image_hw, scales)
    print(f"PHASE sync_first t={time.time():.1f}", file=sys.stderr,
          flush=True)
    first = float(out[0].reshape(-1)[0])
    print(f"PHASE first_done t={time.time():.1f}", file=sys.stderr,
          flush=True)
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
    p.add_argument("--override", action="append", default=[],
                   help="KEY=JSON config override applied in the child")
    args = p.parse_args()

    overrides = {}
    for seg in args.override:
        k, _, v = seg.partition("=")
        if not _:
            raise SystemExit(f"--override segment {seg!r} lacks '='")
        overrides[k] = json.loads(v)

    if args.child:
        print("CHILD " + json.dumps(
            child(args.child, args.batch, args.dtype, args.steps, overrides)
        ))
        return

    results = {}
    for variant in args.variants.split(","):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", variant,
                 "--batch", str(args.batch), "--dtype", args.dtype,
                 "--steps", str(args.steps)]
                + [a for seg in args.override for a in ("--override", seg)],
                capture_output=True, text=True, cwd=REPO,
                timeout=args.timeout,
            )
        except subprocess.TimeoutExpired as e:
            # a HUNG runtime (not a crash): the kill issued by subprocess.run
            # frees the chip claim; record it and keep bisecting
            results[variant] = {
                "variant": variant, "batch": args.batch, "dtype": args.dtype,
                "ok": False, "timeout_s": args.timeout,
                "stderr_tail": ((e.stderr or b"")[-400:]).decode(
                    "utf-8", "replace"
                ) if isinstance(e.stderr, bytes) else (e.stderr or "")[-400:],
            }
            print(json.dumps(results[variant]), flush=True)
            continue
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
