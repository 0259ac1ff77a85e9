#!/usr/bin/env python
"""Measure the REFERENCE's own train step, CPU-eager, on this host.

The reference publishes no throughput numbers (SURVEY.md §6) and no GPU
exists in this environment, so the only *measurable* reference figure is
its own training loop executed CPU-eager — the same reference code the
oracle tests run (`/root/reference/scripts/train.py:22-50,95-103`:
full model call(training=True) + GradientTape + bias-double +
MomentumOptimizer incl. the keras L2 term), on a 600x800 image with the
stock pascal resnet50 config semantics.

Prints one JSON line {"reference_cpu_img_per_sec": ..., "n_steps": ...,
"sec_per_step": ...}. Record the result in BENCHLOG.md; bench.py's
baseline_note cites it. This is a LOWER bound on the reference's real
(GPU) speed — stated explicitly wherever the number is used.

Usage: PYTHONPATH= python scripts/measure_reference_baseline.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_reference_resnet50():
    """The reference's own ResNetFasterRcnn(50), random init (downloads
    patched out), via the oracle-test loader."""
    import test_reference_oracle_model as orm

    ref_ns = orm.ref_ns.__wrapped__()
    base_ns = ref_ns["__base_ns__"]
    resnet = orm._load_ref(
        "object_detection/model/faster_rcnn/resnet_faster_rcnn.py",
        inject={"BaseFasterRcnn": base_ns["BaseFasterRcnn"]},
    )
    resnet["WEIGHTS_HASHES"] = {}  # zero egress: random init
    orm._seed_all(11)
    return resnet["ResNetFasterRcnn"](
        depth=50, roi_pooling_max_pooling_flag=False
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--hw", default="600x800")
    args = p.parse_args()

    import tensorflow as tf

    ref = build_reference_resnet50()
    h, w = (int(v) for v in args.hw.split("x"))
    rs = np.random.RandomState(0)
    img = tf.constant(rs.randn(1, h, w, 3).astype(np.float32))
    # a few well-formed gt boxes (xyxy pixels) + labels, like the bench's
    gt = np.stack(
        [
            rs.uniform(0, 0.5 * w, 4),
            rs.uniform(0, 0.5 * h, 4),
            rs.uniform(0.55 * w, w - 1, 4),
            rs.uniform(0.55 * h, h - 1, 4),
        ],
        1,
    ).astype(np.float32)
    gt_t = tf.constant(gt)
    labels_t = tf.constant(rs.randint(1, 21, 4).astype(np.int32))

    # MomentumOptimizer math applied manually (the tf.compat.v1 optimizer
    # rejects keras-3 Variables): accum = m*accum + grad; var -= lr*accum —
    # identical update, negligible share of the step cost
    lr, mom = 1e-3, 0.9
    velocities = {}

    def apply(pairs):
        for g, v in pairs:
            vel = velocities.get(id(v))
            if vel is None:
                vel = tf.Variable(tf.zeros_like(v), trainable=False)
                velocities[id(v)] = vel
            vel.assign(mom * vel + g)
            v.assign_sub(lr * vel)

    def one_step():
        with tf.GradientTape() as tape:
            rpn_cls, rpn_reg, roi_cls, roi_reg = ref(
                (img, gt_t, labels_t), training=True
            )
            total = (
                rpn_cls + rpn_reg + roi_cls + roi_reg + tf.add_n(ref.losses)
            )
        # reference train_step semantics (scripts/train.py:22-40):
        # grads over model.variables, bias grads doubled
        all_vars = ref.variables
        grads = tape.gradient(total, all_vars)
        pairs = [
            (g * (2.0 if "bias" in v.name else 1.0), v)
            for g, v in zip(grads, all_vars)
            if g is not None
        ]
        apply(pairs)
        return float(total)

    for _ in range(args.warmup):
        one_step()
    t0 = time.perf_counter()
    losses = [one_step() for _ in range(args.steps)]
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "reference_cpu_img_per_sec": round(args.steps / dt, 4),
                "sec_per_step": round(dt / args.steps, 4),
                "n_steps": args.steps,
                "image_hw": [h, w],
                "last_loss": losses[-1],
                "note": (
                    "reference's own train step (model call(training=True) "
                    "+ GradientTape + bias-double + Momentum + keras L2), "
                    "CPU-eager on this host; lower bound on its GPU speed"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
