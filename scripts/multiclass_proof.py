#!/usr/bin/env python
"""Multi-class end-to-end accuracy proof.

Builds a deterministic synthetic VOC set with THREE visually-distinct
foreground classes (car = wide red, person = tall green, dog = square
blue; one of each per image, non-overlapping), trains a detector from
scratch through the REAL `scripts/train.py` CLI, then scores it through
the REAL `scripts/eval_pascal.py` path (im_detect -> VOC file writer ->
detectron voc_eval) and prints per-class AP + mAP as one JSON line.

Exercises with a known answer everything the single-class proofs
(BENCHLOG rounds 1-2) could not: per-class NMS and decode
(reference prediction.py:135-151), the class-column layout of
proposal_target (proposal_target.py:97-117), and the per-class AP
matcher. A confusion (e.g. class columns off by one) caps the wrong
class's AP at 0.

Usage:
    python scripts/multiclass_proof.py --model_type fpn --steps 600
    python scripts/multiclass_proof.py --model_type faster_rcnn --steps 800
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLASSES = ("car", "person", "dog")  # wide red / tall green / square blue
COLORS = {"car": (220, 30, 30), "person": (30, 220, 30), "dog": (40, 60, 230)}


def make_voc(root: str, n_images: int, size: int = 256, seed: int = 0):
    from PIL import Image

    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    ids = []
    # 3 non-overlapping cells so the three objects never collide
    cells = [(0, 0), (0, size // 2), (size // 2, 0)]
    for i in range(n_images):
        image_id = f"{i:06d}"
        ids.append(image_id)
        img = rng.randint(0, 50, (size, size, 3), np.uint8)
        objs = []
        order = rng.permutation(3)
        for slot, ci in enumerate(order):
            cls = CLASSES[ci]
            cy0, cx0 = cells[slot]
            if cls == "car":  # wide: ~2:1
                w, h = rng.randint(70, 100), rng.randint(36, 50)
            elif cls == "person":  # tall: ~1:2
                w, h = rng.randint(36, 50), rng.randint(70, 100)
            else:  # square
                w, h = rng.randint(52, 68), rng.randint(52, 68)
            x1 = cx0 + rng.randint(8, size // 2 - w - 8)
            y1 = cy0 + rng.randint(8, size // 2 - h - 8)
            img[y1 : y1 + h, x1 : x1 + w] = COLORS[cls]
            objs.append((cls, x1, y1, x1 + w, y1 + h))
        Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", image_id + ".jpg"), quality=95
        )
        obj_xml = "".join(
            f"<object><name>{c}</name><difficult>0</difficult>"
            f"<bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            for c, x1, y1, x2, y2 in objs
        )
        xml = (
            f"<annotation><filename>{image_id}.jpg</filename>"
            f"<size><width>{size}</width><height>{size}</height>"
            f"<depth>3</depth></size>{obj_xml}</annotation>"
        )
        with open(os.path.join(root, "Annotations", image_id + ".xml"), "w") as f:
            f.write(xml)
    listing = "\n".join(ids) + "\n"
    for mode in ("trainval", "test"):
        with open(
            os.path.join(root, "ImageSets", "Main", mode + ".txt"), "w"
        ) as f:
            f.write(listing)
    return ids


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="fpn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--n_images", type=int, default=16)
    p.add_argument("--lr", type=float, default=2.5e-4,
                   help="from-scratch LR (reference 1e-3 diverges from "
                        "random init at small resolution; BENCHLOG r1/r2)")
    p.add_argument("--work_dir", default="/tmp/multiclass_proof")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    work = os.path.join(args.work_dir, args.model_type)
    if os.path.exists(work):
        shutil.rmtree(work)
    voc_root = os.path.join(work, "VOC2007")
    make_voc(voc_root, args.n_images)

    # tfrecords via the framework's own writer (D6 path)
    env = dict(os.environ)
    run = lambda cmd: subprocess.run(cmd, check=True, env=env, cwd=REPO)
    devkit = os.path.join(work, "VOCdevkit")
    os.makedirs(devkit, exist_ok=True)
    os.symlink(voc_root, os.path.join(devkit, "VOC2007"))
    run(
        [sys.executable, "scripts/generate_pascal_tf_records.py",
         "--voc_root", devkit, "--year", "2007", "--mode", "trainval",
         "--output_dir", os.path.join(work, "tfrecords"), "--num_shards", "2"]
    )

    overrides = [
        "image_min_size=256", "image_max_size=256",
        "tpu_image_buckets=[[256,256]]", "tpu_max_gt_boxes=8",
    ]
    if args.model_type == "faster_rcnn":
        # default anchor scales (8,16,32)x16 = 128-512 px dwarf the 36-100 px
        # objects at this resolution; use smaller scales (hyperparameter, not
        # semantics — the reference's COCO preset also re-scales anchors)
        overrides.append("scales=[2,4,8]")
    o_flags = []
    for o in overrides:
        o_flags += ["--config_override", o]

    logs = os.path.join(work, "logs")
    run(
        [sys.executable, "scripts/train.py",
         "--model_type", args.model_type, "--backbone", args.backbone,
         "--data_type", "pascal",
         "--tf_records_dir", os.path.join(work, "tfrecords"),
         "--logs_dir", logs, "--epochs", "1",
         "--steps_per_epoch", str(args.steps),
         "--logging_every_n_steps", "50",
         "--summary_every_n_steps", str(max(1, args.steps // 2)),
         "--saving_every_n_steps", str(args.steps),
         "--learning_rate", str(args.lr), "--batch_size", "1"] + o_flags
    )

    result_dir = os.path.join(work, "results")
    out = subprocess.run(
        [sys.executable, "scripts/eval_pascal.py", logs,
         "--root_path", voc_root, "--model_type", args.model_type,
         "--backbone", args.backbone, "--mode", "test",
         "--result_dir", result_dir] + o_flags,
        check=True, env=env, cwd=REPO, capture_output=True, text=True,
    )
    print(out.stdout[-2000:])

    aps = {}
    for line in out.stdout.splitlines():
        parts = line.split()
        if len(parts) == 4 and parts[1] == "AP" and parts[2] == "=":
            aps[parts[0]] = float(parts[3])
    per_class = {c: aps.get(c, -1.0) for c in CLASSES}
    summary = {
        "proof": "multiclass",
        "model_type": args.model_type,
        "backbone": args.backbone,
        "steps": args.steps,
        "n_images": args.n_images,
        "per_class_ap": per_class,
        "mean_ap_3class": float(np.mean(list(per_class.values()))),
        "other_class_max_ap": max(
            (v for k, v in aps.items() if k not in CLASSES), default=0.0
        ),
    }
    print("MULTICLASS_PROOF " + json.dumps(summary))
    if not args.keep:
        shutil.rmtree(os.path.join(work, "tfrecords"), ignore_errors=True)
    ok = all(v > 0.99 for v in per_class.values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
