#!/usr/bin/env python
"""80-class procedural COCO rehearsal: train + eval through the REAL COCO
CLIs to a recorded AP number (VERDICT r4 item 1).

No real COCO data reaches this environment (egress is DNS-dead), so this
is the at-scale stand-in for the reference's COCO capability
(/root/reference/scripts/eval_coco.py:76-168 + coco_tf_dataset_generator.py):
a procedural 80-category COCO-format dataset — COCO's REAL non-contiguous
category ids (1..90 with the 10 standard gaps), multi-object 600x800
images, iscrowd-flagged small objects — trained from scratch with the
STOCK coco config (scales (4,8,16,32), num_classes 81, 100-det caps; only
the from-scratch LR schedule is overridden) through the real
`scripts/train.py --data_type coco`, then scored through the real
`scripts/eval_coco.py` -> evaluation/coco_eval.py 12-metric summary.

What it exercises beyond the VOC rehearsal:
- all 80 class columns of the softmax/delta heads + the contiguous-label
  <-> gapped-COCO-cat-id remap (data/coco.py:53-56, reference :75-90),
- the COCO config preset (T2's coco branch) end to end,
- D3's training pipeline (direct-JSON CocoDataset, crowd exclusion) and
  E4's evaluator at 80-category scale with populated crowd-ignore paths,
- batched eval inference through evaluation/batched_inference.py.

Class visual signatures (learnable from scratch): 10 saturated colors x
4 textures (solid / h-stripes / v-stripes / checker) x 2 texture periods
(14 px / 34 px).

Usage:
  python scripts/coco_rehearsal.py gen   --root /tmp/coco_rehearsal
  python scripts/coco_rehearsal.py train --steps 16000
  python scripts/coco_rehearsal.py eval
  python scripts/coco_rehearsal.py run   # gen+train+eval
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voc_rehearsal import _place_box  # noqa: E402  (shared layout sampler)

IMG_H, IMG_W = 600, 800

# The real COCO 2014/2017 detection category-id space: 1..90 with these 10
# ids unused — the remap quirk the reference handles at
# coco_tf_dataset_generator.py:75-90 and eval_coco.py:22-62.
_MISSING_COCO_IDS = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83}
COCO_CAT_IDS = [i for i in range(1, 91) if i not in _MISSING_COCO_IDS]
assert len(COCO_CAT_IDS) == 80

BASE_COLORS_10 = (
    (205, 40, 40),
    (40, 190, 40),
    (50, 70, 220),
    (230, 200, 40),
    (200, 50, 200),
    (40, 200, 200),
    (240, 130, 30),
    (130, 240, 130),
    (150, 110, 250),
    (250, 150, 150),
)


def class_patch80(ci: int, h: int, w: int, rng: np.random.RandomState) -> np.ndarray:
    """Textured uint8 [h, w, 3] patch for class index ci (0..79):
    color = ci % 10, texture = (ci // 10) % 4, period = 14 or 34 px."""
    base = np.array(BASE_COLORS_10[ci % 10], np.float32)
    second = base * 0.3
    period = 14 if ci < 40 else 34
    pattern = (ci // 10) % 4
    jit = rng.uniform(0.8, 1.15)
    yy, xx = np.mgrid[0:h, 0:w]
    if pattern == 0:
        mask = np.ones((h, w), bool)
    elif pattern == 1:
        mask = (yy // period) % 2 == 0
    elif pattern == 2:
        mask = (xx // period) % 2 == 0
    else:
        mask = ((yy // period) + (xx // period)) % 2 == 0
    patch = np.where(mask[..., None], base, second) * jit
    patch += rng.normal(0.0, 6.0, patch.shape)
    return np.clip(patch, 0, 255).astype(np.uint8)


def draw_image80(rng: np.random.RandomState):
    """-> (uint8 [600, 800, 3], [(class_idx, x, y, w, h, iscrowd)])."""
    img = rng.randint(0, 55, (IMG_H, IMG_W, 3)).astype(np.uint8)
    for _ in range(rng.randint(3, 7)):  # unlabeled gray distractors
        g = rng.randint(70, 160)
        col = np.clip(
            np.array([g, g, g]) + rng.randint(-18, 18, 3), 0, 255
        ).astype(np.uint8)
        dw, dh = rng.randint(40, 200), rng.randint(40, 200)
        dx, dy = rng.randint(0, IMG_W - dw), rng.randint(0, IMG_H - dh)
        img[dy : dy + dh, dx : dx + dw] = col

    objs, placed = [], []
    n_normal = rng.randint(3, 8)
    # small iscrowd-flagged objects drive the evaluator's crowd-ignore path
    # (they are excluded from training by CocoDataset, like real crowds)
    n_crowd = int(rng.uniform() < 0.5) + int(rng.uniform() < 0.2)
    specs = [(0, 110.0, 420.0)] * n_normal + [(1, 48.0, 90.0)] * n_crowd
    rng.shuffle(specs)
    for iscrowd, smin, smax in specs:
        box = _place_box(rng, placed, smin, smax)
        if box is None:
            continue
        placed.append(box)
        ci = rng.randint(0, 80)
        x1, y1, x2, y2 = box
        x2, y2 = min(x2, IMG_W - 1.0), min(y2, IMG_H - 1.0)
        objs.append((ci, x1, y1, x2 - x1, y2 - y1, iscrowd))
    for ci, x, y, w, h, _ic in sorted(
        objs, key=lambda o: o[3] * o[4], reverse=True
    ):
        x1, y1 = int(round(x)), int(round(y))
        x2, y2 = int(round(x + w)), int(round(y + h))
        img[y1:y2, x1:x2] = class_patch80(ci, y2 - y1, x2 - x1, rng)
    return img, objs


def generate(root: str, n_train: int, n_val: int, seed: int = 0):
    import cv2

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    splits = {"train": ([], []), "val": ([], [])}  # (images, annotations)
    class_counts = np.zeros(80, np.int64)
    for i in range(n_train + n_val):
        split = "train" if i < n_train else "val"
        images, annotations = splits[split]
        img, objs = draw_image80(rng)
        fname = f"{i:06d}.jpg"
        cv2.imwrite(
            os.path.join(img_dir, fname),
            img[:, :, ::-1],
            [int(cv2.IMWRITE_JPEG_QUALITY), 92],
        )
        images.append(
            {"id": i + 1, "file_name": fname, "height": IMG_H, "width": IMG_W}
        )
        for ci, x, y, w, h, iscrowd in objs:
            annotations.append(
                {
                    "id": len(annotations) + 1,
                    "image_id": i + 1,
                    "category_id": COCO_CAT_IDS[ci],
                    "bbox": [round(x, 2), round(y, 2), round(w, 2), round(h, 2)],
                    "area": round(w * h, 2),
                    "iscrowd": iscrowd,
                }
            )
            if split == "val" and not iscrowd:
                class_counts[ci] += 1
    categories = [
        {"id": cid, "name": f"class_{cid:02d}"} for cid in COCO_CAT_IDS
    ]
    for split, (images, annotations) in splits.items():
        with open(os.path.join(root, f"instances_{split}.json"), "w") as f:
            json.dump(
                {
                    "images": images,
                    "annotations": annotations,
                    "categories": categories,
                },
                f,
            )
    if n_val >= 100:  # smoke-scale sets cannot cover 80 classes
        assert class_counts.min() > 0, (
            f"val split missing classes: {np.where(class_counts == 0)[0]}"
        )
    return {int(c): int(n) for c, n in zip(COCO_CAT_IDS, class_counts)}


def _run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, cwd=REPO, **kw)


def _dirs(args):
    return (
        os.path.join(args.root, "images"),
        os.path.join(args.root, "instances_train.json"),
        os.path.join(args.root, "instances_val.json"),
        os.path.join(args.root, f"logs_{args.model_type}_{args.backbone}"),
    )


def cmd_gen(args):
    counts = generate(args.root, args.n_train, args.n_val, args.seed)
    print(json.dumps({
        "gen": "ok",
        "val_instances_min": min(counts.values()),
        "val_instances_total": sum(counts.values()),
    }))


def cmd_train(args):
    img_dir, train_json, _, logs = _dirs(args)
    if os.path.exists(logs) and not args.resume:
        shutil.rmtree(logs)
    # The dev tunnel's client leaks every H2D staging buffer (~6 MB per
    # b1 600x800 step, measured: 3000 bare device_puts grow RSS by
    # exactly the array size each); one 16000-step process exhausts host
    # RAM near step ~14k. Chunked sequential invocations sidestep it:
    # the trainer auto-resumes from logs_dir (orbax keeps the step) and
    # the LR schedule uses absolute boundaries, so N processes of
    # steps/N are step-for-step identical to one process. Real TPU hosts
    # (no tunnel) don't need this; --chunks 1 restores one process.
    per = (args.steps + args.chunks - 1) // args.chunks
    done = 0
    while done < args.steps:
        n = min(per, args.steps - done)
        cmd = [
            sys.executable, "scripts/train.py",
            "--model_type", args.model_type, "--backbone", args.backbone,
            "--data_type", "coco",
            "--coco_annotation_file", train_json,
            "--coco_image_dir", img_dir,
            "--logs_dir", logs, "--epochs", "1",
            "--steps_per_epoch", str(n),
            "--logging_every_n_steps", "200",
            "--summary_every_n_steps", str(args.steps // 2),
            "--saving_every_n_steps", str(args.steps),
            "--batch_size", str(args.batch_size),
            # from-scratch LR schedule (the stock 1e-3-from-ImageNet schedule
            # diverges from random init; same protocol as the VOC rehearsal)
            "--config_override", "learning_rate_multi_decay_steps=[%d]" % (args.steps // 2),
            "--config_override", "learning_rate_multi_lrs=[0.00025,5e-05]",
            # distinct data-order/sampling stream per chunk (init is
            # overwritten by the restored checkpoint after chunk 0)
            "--seed", str(args.seed + done),
        ]
        if args.compute_dtype:
            cmd += ["--compute_dtype", args.compute_dtype]
        _run(cmd)
        done += n


def cmd_eval(args):
    img_dir, _, val_json, logs = _dirs(args)
    results_json = os.path.join(
        args.root, f"results_{args.model_type}_{args.backbone}.json"
    )
    out = _run(
        [sys.executable, "scripts/eval_coco.py", logs,
         "--annotation_file", val_json, "--image_dir", img_dir,
         "--model_type", args.model_type, "--backbone", args.backbone,
         "--results_json", results_json,
         "--batch_size", str(args.eval_batch_size)],
        capture_output=True, text=True,
    )
    sys.stderr.write(out.stderr[-1500:])
    print(out.stdout[-2500:])
    metrics = {}
    for line in out.stdout.splitlines():
        # evaluation/coco_eval.py summarize() format: "AP @[.50:.95]  = 0.123"
        s = line.strip()
        if (s.startswith("AP ") or s.startswith("AR ")) and " = " in s:
            key, val = s.rsplit(" = ", 1)
            try:
                metrics[" ".join(key.split())] = float(val)
            except ValueError:
                pass
    summary = {
        "proof": "coco80_rehearsal",
        "model_type": args.model_type,
        "backbone": args.backbone,
        "metrics": metrics,
    }
    print("COCO80_REHEARSAL " + json.dumps(summary))
    return summary


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["gen", "train", "eval", "run"])
    p.add_argument("--root", default="/tmp/coco_rehearsal")
    p.add_argument("--n_train", type=int, default=1000)
    p.add_argument("--n_val", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_type", default="faster_rcnn",
                   choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--steps", type=int, default=16000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--compute_dtype", default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--chunks", type=int, default=4,
                   help="sequential train.py invocations (tunnel H2D-leak "
                        "workaround; 1 = single process)")
    p.add_argument("--resume", action="store_true",
                   help="keep logs_dir and continue from its latest "
                        "checkpoint; --steps then counts ADDITIONAL "
                        "steps (each chunk restores the running step)")
    args = p.parse_args()

    if args.cmd == "gen":
        cmd_gen(args)
    elif args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "eval":
        cmd_eval(args)
    else:
        cmd_gen(args)
        cmd_train(args)
        cmd_eval(args)


if __name__ == "__main__":
    main()
