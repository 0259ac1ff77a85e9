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


def _draw_image(rng, size: int):
    """One synthetic image: 3 objects (one per class) in non-overlapping
    cells. -> (uint8 [size,size,3], [(cls, x1, y1, x2, y2)])."""
    cells = [(0, 0), (0, size // 2), (size // 2, 0)]
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
    return img, objs


def make_voc(root: str, n_images: int, size: int = 256, seed: int = 0):
    from PIL import Image

    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    ids = []
    for i in range(n_images):
        image_id = f"{i:06d}"
        ids.append(image_id)
        img, objs = _draw_image(rng, size)
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


# non-contiguous category ids exercise the reference's cat-id -> contiguous
# label remap (data/coco.py:54-57)
COCO_CAT_IDS = {"car": 3, "person": 7, "dog": 12}


def make_coco(root: str, n_images: int, size: int = 256, seed: int = 0):
    """COCO-format twin of make_voc: images/ + annotations.json."""
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img, objs = _draw_image(rng, size)
        fname = f"{i:06d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, fname), quality=95)
        images.append(
            {"id": i + 1, "file_name": fname, "height": size, "width": size}
        )
        for cls, x1, y1, x2, y2 in objs:
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": COCO_CAT_IDS[cls],
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "area": float((x2 - x1) * (y2 - y1)),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    ann_file = os.path.join(root, "annotations.json")
    with open(ann_file, "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [
                    {"id": cid, "name": name}
                    for name, cid in COCO_CAT_IDS.items()
                ],
            },
            f,
        )
    return ann_file, img_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="fpn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--dataset", default="voc", choices=["voc", "coco"],
                   help="voc: D1/D6 tfrecord train + E1/E2 pascal eval; "
                        "coco: D3 direct-JSON train + E4 COCOeval")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--n_images", type=int, default=16)
    p.add_argument("--lr", type=float, default=2.5e-4,
                   help="from-scratch LR (reference 1e-3 diverges from "
                        "random init at small resolution; BENCHLOG r1/r2)")
    p.add_argument("--work_dir", default="/tmp/multiclass_proof")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    work = os.path.join(args.work_dir, f"{args.model_type}_{args.dataset}")
    if os.path.exists(work):
        shutil.rmtree(work)
    env = dict(os.environ)
    run = lambda cmd: subprocess.run(cmd, check=True, env=env, cwd=REPO)

    if args.dataset == "voc":
        voc_root = os.path.join(work, "VOC2007")
        make_voc(voc_root, args.n_images)
        # tfrecords via the framework's own writer (D6 path)
        devkit = os.path.join(work, "VOCdevkit")
        os.makedirs(devkit, exist_ok=True)
        os.symlink(voc_root, os.path.join(devkit, "VOC2007"))
        run(
            [sys.executable, "scripts/generate_pascal_tf_records.py",
             "--voc_root", devkit, "--year", "2007", "--mode", "trainval",
             "--output_dir", os.path.join(work, "tfrecords"),
             "--num_shards", "2"]
        )
        data_flags = [
            "--data_type", "pascal",
            "--tf_records_dir", os.path.join(work, "tfrecords"),
        ]
    else:
        coco_root = os.path.join(work, "coco")
        ann_file, img_dir = make_coco(coco_root, args.n_images)
        data_flags = [
            "--data_type", "coco",
            "--coco_annotation_file", ann_file,
            "--coco_image_dir", img_dir,
        ]

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
         "--model_type", args.model_type, "--backbone", args.backbone]
        + data_flags
        + ["--logs_dir", logs, "--epochs", "1",
           "--steps_per_epoch", str(args.steps),
           "--logging_every_n_steps", "50",
           "--summary_every_n_steps", str(max(1, args.steps // 2)),
           "--saving_every_n_steps", str(args.steps),
           "--learning_rate", str(args.lr), "--batch_size", "1"] + o_flags
    )

    if args.dataset == "voc":
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
        other_max = max(
            (v for k, v in aps.items() if k not in CLASSES), default=0.0
        )
    else:
        results_json = os.path.join(work, "coco_results.json")
        run(
            [sys.executable, "scripts/eval_coco.py", logs,
             "--annotation_file", ann_file, "--image_dir", img_dir,
             "--model_type", args.model_type, "--backbone", args.backbone,
             "--results_json", results_json] + o_flags
        )
        from tf_eager_object_detection_tpu.evaluation.coco_eval import (
            CocoBboxEval,
        )

        with open(ann_file) as f:
            gt = json.load(f)
        with open(results_json) as f:
            results = json.load(f)
        ap50 = CocoBboxEval(gt, results).per_category_ap()
        per_class = {c: ap50.get(COCO_CAT_IDS[c], -1.0) for c in CLASSES}
        # the annotation file only has the 3 categories, so there are no
        # "other" classes on the COCO path; any spurious class-column
        # confusion surfaces as a depressed per-class AP instead
        other_max = 0.0

    summary = {
        "proof": "multiclass",
        "dataset": args.dataset,
        "model_type": args.model_type,
        "backbone": args.backbone,
        "steps": args.steps,
        "n_images": args.n_images,
        "per_class_ap": per_class,
        "mean_ap_3class": float(np.mean(list(per_class.values()))),
        "other_class_max_ap": other_max,
    }
    print("MULTICLASS_PROOF " + json.dumps(summary))
    if not args.keep:
        shutil.rmtree(os.path.join(work, "tfrecords"), ignore_errors=True)
    ok = all(v > 0.99 for v in per_class.values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
