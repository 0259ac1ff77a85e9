#!/usr/bin/env python
"""Full-scale 20-class VOC rehearsal: train + eval through the real CLIs
to a recorded mAP number (VERDICT r3 task 1).

No real VOC data exists in this environment, so this is the closest
achievable stand-in for the reference's README mAP table
(/root/reference/README.md:81-95): a procedural 20-class VOC-format
dataset at the reference's working resolution, trained from scratch with
the STOCK pascal config (stock anchor scales (8,16,32)x16 = 128-512 px,
stock thresholds/sampling/buckets — no semantic re-tuning), then scored
through the real eval_pascal path (im_detect -> VOC writer -> detectron
voc_eval).

What it exercises that the 3-class 256x256 proof could not:
- all 20 class columns of the softmax/delta heads + per-class NMS/AP,
- multi-object images (3-7 objects) with overlapping boxes (IoU < 0.3),
- scale (110-420 px) and aspect (0.45-2.2) diversity inside the stock
  anchor range,
- difficult-flagged small objects (48-90 px, below the anchor range),
  driving voc_eval's ignore path (detectron_pascal_evaluation_utils.py),
- the full ~17k-anchor (Faster R-CNN) / ~200k-anchor (FPN) sampling
  regime at 600x800 through the stock 608x1008 bucket.

Class visual signatures (learnable from scratch): 5 saturated base
colors x 4 textures (solid / horizontal stripes / vertical stripes /
checker, 24 px period), rectangles on a noisy background with unlabeled
gray distractor rectangles.

Usage:
  python scripts/voc_rehearsal.py gen   --root /tmp/voc_rehearsal
  python scripts/voc_rehearsal.py train --model_type faster_rcnn --steps 6000
  python scripts/voc_rehearsal.py eval  --model_type faster_rcnn
  python scripts/voc_rehearsal.py run   --model_type faster_rcnn   # gen+train+eval

The only non-stock knob is the from-scratch learning rate (the reference
always starts from ImageNet weights; 1e-3 diverges from random init —
BENCHLOG rounds 1-3). LR is a training hyperparameter, not a model
semantic.
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

from tf_eager_object_detection_tpu.data.label_map import PASCAL_CLASSES  # noqa: E402

IMG_H, IMG_W = 600, 800  # scale=min(600/600, 1000/800)=1.0 under the stock rule

BASE_COLORS = (
    (205, 40, 40),    # red
    (40, 190, 40),    # green
    (50, 70, 220),    # blue
    (230, 200, 40),   # yellow
    (200, 50, 200),   # magenta
)
PERIOD = 24  # texture period in pixels; survives conv1-4 before stride 16


def class_patch(ci: int, h: int, w: int, rng: np.random.RandomState) -> np.ndarray:
    """Textured uint8 [h, w, 3] patch for class index ci (0..19)."""
    base = np.array(BASE_COLORS[ci % 5], np.float32)
    second = base * 0.3
    jit = rng.uniform(0.8, 1.15)
    yy, xx = np.mgrid[0:h, 0:w]
    pattern = ci // 5  # 0 solid / 1 h-stripes / 2 v-stripes / 3 checker
    if pattern == 0:
        mask = np.ones((h, w), bool)
    elif pattern == 1:
        mask = (yy // PERIOD) % 2 == 0
    elif pattern == 2:
        mask = (xx // PERIOD) % 2 == 0
    else:
        mask = ((yy // PERIOD) + (xx // PERIOD)) % 2 == 0
    patch = np.where(mask[..., None], base, second) * jit
    patch += rng.normal(0.0, 6.0, patch.shape)
    return np.clip(patch, 0, 255).astype(np.uint8)


def _overlaps(a, boxes):
    """(max IoU, max intersection-over-smaller-area) of box a vs boxes."""
    if not boxes:
        return 0.0, 0.0
    b = np.asarray(boxes, np.float32)
    ix = np.maximum(
        0.0, np.minimum(a[2], b[:, 2]) - np.maximum(a[0], b[:, 0])
    )
    iy = np.maximum(
        0.0, np.minimum(a[3], b[:, 3]) - np.maximum(a[1], b[:, 1])
    )
    inter = ix * iy
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iou = inter / np.maximum(area_a + area_b - inter, 1.0)
    ioa = inter / np.maximum(np.minimum(area_a, area_b), 1.0)
    return float(np.max(iou)), float(np.max(ioa))


def _place_box(rng, placed, smin, smax, max_iou=0.3, max_ioa=0.4, tries=40):
    """Rejection-sample an xyxy box with sqrt-area in [smin, smax].

    max_ioa bounds intersection-over-smaller-area so no object is mostly
    contained in (or containing) another — with large-to-small draw order
    every object keeps >= 1 - max_ioa of its area visible per overlap.
    """
    for _ in range(tries):
        s = rng.uniform(smin, smax)
        a = np.exp(rng.uniform(np.log(0.45), np.log(2.2)))
        w = min(s * np.sqrt(a), IMG_W - 16.0)
        h = min(s / np.sqrt(a), IMG_H - 16.0)
        x1 = rng.uniform(4, IMG_W - w - 4)
        y1 = rng.uniform(4, IMG_H - h - 4)
        box = (x1, y1, x1 + w, y1 + h)
        iou, ioa = _overlaps(np.asarray(box), placed)
        if iou < max_iou and ioa < max_ioa:
            return box
    return None


def draw_image(rng: np.random.RandomState):
    """-> (uint8 [600, 800, 3], [(class_name, x1, y1, x2, y2, difficult)])"""
    img = rng.randint(0, 55, (IMG_H, IMG_W, 3)).astype(np.uint8)
    # unlabeled low-saturation distractors so background is not plain noise
    for _ in range(rng.randint(3, 7)):
        g = rng.randint(70, 160)
        col = np.clip(
            np.array([g, g, g]) + rng.randint(-18, 18, 3), 0, 255
        ).astype(np.uint8)
        dw, dh = rng.randint(40, 200), rng.randint(40, 200)
        dx, dy = rng.randint(0, IMG_W - dw), rng.randint(0, IMG_H - dh)
        img[dy : dy + dh, dx : dx + dw] = col

    objs, placed = [], []
    n_normal = rng.randint(3, 8)
    n_difficult = int(rng.uniform() < 0.5) + int(rng.uniform() < 0.2)
    specs = [(False, 110.0, 420.0)] * n_normal + [(True, 48.0, 90.0)] * n_difficult
    rng.shuffle(specs)
    for difficult, smin, smax in specs:
        box = _place_box(rng, placed, smin, smax)
        if box is None:
            continue
        placed.append(box)
        ci = rng.randint(0, 20)
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        x2, y2 = min(x2, IMG_W - 1), min(y2, IMG_H - 1)
        objs.append((PASCAL_CLASSES[ci], x1, y1, x2, y2, int(difficult)))
    # draw large -> small: small objects are never buried, large ones lose
    # at most max_ioa of their area per overlapping smaller neighbor
    for c, x1, y1, x2, y2, _d in sorted(
        objs, key=lambda o: (o[3] - o[1]) * (o[4] - o[2]), reverse=True
    ):
        ci = PASCAL_CLASSES.index(c)
        img[y1:y2, x1:x2] = class_patch(ci, y2 - y1, x2 - x1, rng)
    return img, objs


def generate(root: str, n_train: int, n_test: int, seed: int = 0):
    """Write a VOC2007-layout tree with trainval/test splits."""
    import cv2

    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    splits = {"trainval": [], "test": []}
    counts = {c: 0 for c in PASCAL_CLASSES}
    for i in range(n_train + n_test):
        image_id = f"{i:06d}"
        split = "trainval" if i < n_train else "test"
        splits[split].append(image_id)
        img, objs = draw_image(rng)
        cv2.imwrite(
            os.path.join(root, "JPEGImages", image_id + ".jpg"),
            img[:, :, ::-1],  # RGB -> BGR for cv2
            [int(cv2.IMWRITE_JPEG_QUALITY), 92],
        )
        obj_xml = "".join(
            f"<object><name>{c}</name><difficult>{d}</difficult>"
            f"<bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            for c, x1, y1, x2, y2, d in objs
        )
        with open(os.path.join(root, "Annotations", image_id + ".xml"), "w") as f:
            f.write(
                f"<annotation><filename>{image_id}.jpg</filename>"
                f"<size><width>{IMG_W}</width><height>{IMG_H}</height>"
                f"<depth>3</depth></size>{obj_xml}</annotation>"
            )
        if split == "test":
            for c, *_rest, d in objs:
                if not d:
                    counts[c] += 1
    for mode, ids in splits.items():
        with open(os.path.join(root, "ImageSets", "Main", mode + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    assert min(counts.values()) > 0, f"test split missing classes: {counts}"
    return counts


def _run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, cwd=REPO, **kw)


def cmd_gen(args):
    voc_root = os.path.join(args.root, "VOC2007")
    if os.path.exists(voc_root):
        shutil.rmtree(voc_root)
    counts = generate(voc_root, args.n_train, args.n_test, args.seed)
    devkit = os.path.join(args.root, "VOCdevkit")
    os.makedirs(devkit, exist_ok=True)
    link = os.path.join(devkit, "VOC2007")
    if not os.path.exists(link):
        os.symlink(voc_root, link)
    tfr = os.path.join(args.root, "tfrecords")
    if os.path.exists(tfr):
        shutil.rmtree(tfr)
    _run(
        [sys.executable, "scripts/generate_pascal_tf_records.py",
         "--voc_root", devkit, "--year", "2007", "--mode", "trainval",
         "--output_dir", tfr, "--num_shards", "4"]
    )
    print(json.dumps({"gen": "ok", "test_obj_counts": counts}))


def _dirs(args):
    voc_root = os.path.join(args.root, "VOC2007")
    logs = os.path.join(args.root, f"logs_{args.model_type}_{args.backbone}")
    return voc_root, os.path.join(args.root, "tfrecords"), logs


def cmd_train(args):
    _, tfr, logs = _dirs(args)
    if os.path.exists(logs) and not args.resume:
        shutil.rmtree(logs)
    # Chunked sequential invocations: the dev tunnel's client leaks every
    # H2D staging buffer (~6 MB per b1 600x800 step, measured with bare
    # device_puts), so one 16000-step process exhausts host RAM. The
    # trainer auto-resumes from logs_dir (orbax keeps the step) and LR
    # boundaries are absolute, so N processes of steps/N are
    # step-for-step identical to one. --chunks 1 = single process.
    per = (args.steps + args.chunks - 1) // args.chunks
    done = 0
    while done < args.steps:
        n = min(per, args.steps - done)
        cmd = [
            sys.executable, "scripts/train.py",
            "--model_type", args.model_type, "--backbone", args.backbone,
            "--data_type", "pascal", "--tf_records_dir", tfr,
            "--logs_dir", logs, "--epochs", "1",
            "--steps_per_epoch", str(n),
            "--logging_every_n_steps", "200",
            "--summary_every_n_steps", str(args.steps // 2),
            "--saving_every_n_steps", str(args.steps),
            "--batch_size", str(args.batch_size),
            "--seed", str(args.seed + done),
        ]
        if args.lr > 0:  # 0 = keep the config's (possibly overridden) schedule
            cmd += ["--learning_rate", str(args.lr)]
        for ov in args.config_override:
            cmd += ["--config_override", ov]
        if args.compute_dtype:
            cmd += ["--compute_dtype", args.compute_dtype]
        _run(cmd)
        done += n


def cmd_eval(args):
    voc_root, _, logs = _dirs(args)
    result_dir = os.path.join(
        args.root, f"results_{args.model_type}_{args.backbone}"
    )
    if os.path.exists(result_dir):
        shutil.rmtree(result_dir)
    out = _run(
        [sys.executable, "scripts/eval_pascal.py", logs,
         "--root_path", voc_root, "--model_type", args.model_type,
         "--backbone", args.backbone, "--mode", "test",
         "--result_dir", result_dir, "--batch_size", str(args.eval_batch_size)],
        capture_output=True, text=True,
    )
    sys.stderr.write(out.stderr[-1500:])
    print(out.stdout[-3000:])
    aps = {}
    for line in out.stdout.splitlines():
        parts = line.split()
        if len(parts) == 4 and parts[1] == "AP" and parts[2] == "=":
            aps[parts[0]] = float(parts[3])
    per_class = {c: aps.get(c, -1.0) for c in PASCAL_CLASSES}
    summary = {
        "proof": "voc_rehearsal",
        "model_type": args.model_type,
        "backbone": args.backbone,
        "per_class_ap": per_class,
        "mAP": float(np.mean(list(per_class.values()))),
        "classes_populated": sum(v >= 0.0 for v in per_class.values()),
    }
    print("VOC_REHEARSAL " + json.dumps(summary))
    return summary


def _voc_to_coco_json(voc_root: str, split: str, out_path: str) -> int:
    """Convert the rehearsal's VOC XML annotations to a COCO annotation
    file: categories 1..20 in PASCAL_CLASSES order, bbox [x, y, w, h]
    with the same +1 w/h pixel convention the detection writer uses
    (evaluation/coco_eval.py::coco_results_for_image), difficult ->
    iscrowd=1 so COCOeval's crowd-ignore path is exercised at scale."""
    from tf_eager_object_detection_tpu.data.voc import parse_voc_xml

    ids = open(
        os.path.join(voc_root, "ImageSets", "Main", split + ".txt")
    ).read().split()
    images, annotations = [], []
    for image_id in ids:
        ann = parse_voc_xml(
            os.path.join(voc_root, "Annotations", f"{image_id}.xml")
        )
        images.append({
            "id": int(image_id),
            "file_name": f"{image_id}.jpg",
            "height": ann["height"],
            "width": ann["width"],
        })
        for o in ann["objects"]:
            xmin, ymin, xmax, ymax = o["bbox"]  # 1-based VOC corners
            x, y = xmin - 1.0, ymin - 1.0  # 0-based origin
            w, h = xmax - xmin + 1.0, ymax - ymin + 1.0
            annotations.append({
                "id": len(annotations) + 1,
                "image_id": int(image_id),
                "category_id": PASCAL_CLASSES.index(o["name"]) + 1,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h),
                "iscrowd": int(o.get("difficult", 0)),
            })
    with open(out_path, "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [
                {"id": i + 1, "name": c}
                for i, c in enumerate(PASCAL_CLASSES)
            ],
        }, f)
    return len(annotations)


def cmd_coco(args):
    """Score the rehearsal checkpoint through the REAL COCO eval CLI
    (scripts/eval_coco.py -> self-written COCOeval core): the
    at-scale complement to the 20 adversarial hand fixtures (VERDICT r3
    task 3) — 150 images / ~750 boxes / 20 categories / iscrowd gts
    through every stage of evaluation/coco_eval.py."""
    voc_root, _, logs = _dirs(args)
    ann_file = os.path.join(args.root, "coco_test_annotations.json")
    n_ann = _voc_to_coco_json(voc_root, "test", ann_file)
    results_json = os.path.join(
        args.root, f"coco_results_{args.model_type}_{args.backbone}.json"
    )
    # the checkpoint is a pascal model: carry its class count, anchor
    # scales, pixel means, and per-image caps into the coco config
    overrides = [
        "num_classes=21",
        "scales=[8, 16, 32]",
        "bgr_pixel_means=[103.939, 116.779, 123.68]",
        "max_objects_per_class_per_image=50",
        "max_objects_per_image=50",
    ]
    cmd = [sys.executable, "scripts/eval_coco.py", logs,
           "--annotation_file", ann_file,
           "--image_dir", os.path.join(voc_root, "JPEGImages"),
           "--model_type", args.model_type, "--backbone", args.backbone,
           "--results_json", results_json,
           "--batch_size", str(args.eval_batch_size)]
    for ov in overrides:
        cmd += ["--config_override", ov]
    out = _run(cmd, capture_output=True, text=True)
    sys.stderr.write(out.stderr[-1000:])
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
        "proof": "coco_rehearsal",
        "model_type": args.model_type,
        "backbone": args.backbone,
        "n_gt_annotations": n_ann,
        "metrics": metrics,
    }
    print("COCO_REHEARSAL " + json.dumps(summary))
    return summary


def cmd_consistency(args):
    """mAP-level multi-device consistency (VERDICT r3 task 4): run the
    rehearsal eval three ways — single device, --data_parallel 8, and
    --spatial_partition 4 — on 8 virtual CPU devices and assert the VOC
    detection files are byte-identical and the mAP equal."""
    voc_root, _, logs = _dirs(args)
    ids = open(
        os.path.join(voc_root, "ImageSets", "Main", "test.txt")
    ).read().split()[: args.n_consistency]
    with open(
        os.path.join(voc_root, "ImageSets", "Main", "consistency.txt"), "w"
    ) as f:
        f.write("\n".join(ids) + "\n")

    env = dict(
        os.environ,
        PYTHONPATH="",
        JAX_PLATFORMS="cpu",
        # 8 virtual devices time-slice this host's core(s); XLA:CPU's
        # default 40s collective-rendezvous termination aborts the whole
        # process when a participant thread is merely starved (reproduced:
        # sp4 resnet50 eval SIGABRTs in InProcessCommunicator::AllReduce) —
        # raise it far past worst-case contention
        XLA_FLAGS=(
            "--xla_force_host_platform_device_count=8 "
            "--xla_cpu_collective_call_terminate_timeout_seconds=1200 "
            "--xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        ),
    )
    variants = {
        "single": [],
        "dp8": ["--data_parallel", "8"],
        "sp4": ["--spatial_partition", "4"],
    }
    maps, result_dirs = {}, {}
    for name, flags in variants.items():
        rdir = os.path.join(args.root, f"consistency_{args.model_type}_{name}")
        if os.path.exists(rdir):
            shutil.rmtree(rdir)
        result_dirs[name] = rdir
        out = _run(
            [sys.executable, "scripts/eval_pascal.py", logs,
             "--root_path", voc_root, "--model_type", args.model_type,
             "--backbone", args.backbone, "--mode", "consistency",
             "--result_dir", rdir, "--batch_size", "8"] + flags,
            capture_output=True, text=True, env=env,
        )
        for line in out.stdout.splitlines():
            if line.strip().startswith("mAP"):
                maps[name] = float(line.split()[-1])
    # byte-identical detection files across the three shardings
    identical = True
    for cls in PASCAL_CLASSES:
        blobs = set()
        for name, rdir in result_dirs.items():
            path = os.path.join(rdir, f"{cls}.txt")
            blobs.add(open(path, "rb").read() if os.path.exists(path) else b"")
        if len(blobs) != 1:
            identical = False
            print(f"MISMATCH in {cls}.txt across variants")
    summary = {
        "proof": "rehearsal_consistency",
        "model_type": args.model_type,
        "n_images": len(ids),
        "mAP": maps,
        "files_identical": identical,
        "maps_equal": len(set(maps.values())) == 1,
    }
    print("CONSISTENCY " + json.dumps(summary))
    sys.exit(0 if identical and summary["maps_equal"] else 1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["gen", "train", "eval", "run",
                                   "consistency", "coco"])
    p.add_argument("--root", default="/tmp/voc_rehearsal")
    p.add_argument("--n_train", type=int, default=600)
    p.add_argument("--n_test", type=int, default=150)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_type", default="faster_rcnn",
                   choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--lr", type=float, default=2.5e-4,
                   help="0 = use the config schedule (see --config_override)")
    p.add_argument("--config_override", action="append", default=[],
                   help="passed through to scripts/train.py")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--compute_dtype", default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--n_consistency", type=int, default=8)
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
    elif args.cmd == "consistency":
        cmd_consistency(args)
    elif args.cmd == "coco":
        cmd_coco(args)
    elif args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "eval":
        summary = cmd_eval(args)
        sys.exit(0 if summary["mAP"] >= 0.85 else 1)
    else:  # run
        cmd_gen(args)
        cmd_train(args)
        summary = cmd_eval(args)
        sys.exit(0 if summary["mAP"] >= 0.85 else 1)


if __name__ == "__main__":
    main()
