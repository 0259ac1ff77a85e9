"""COCO dataset (train + eval) without pycocotools.

Replaces `object_detection/dataset/coco_tf_dataset_generator.py` (D3): the
annotation JSON is parsed directly. Reference semantics kept:
- category ids remapped to contiguous 1..80 in sorted-cat-id order
  (coco_tf_dataset_generator.py:75-90),
- images filtered to min edge >= 32 and >= 1 box (:92-106),
- train items: (image, boxes, labels) with the same bucket-padded batch
  contract as data/pascal.py,
- eval items: (image, image_hw, scale, raw_h, raw_w, img_id) (:210-236).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from tf_eager_object_detection_tpu.data.preprocessing import (
    preprocess_eval_image,
    preprocess_train_image,
)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

__all__ = ["CocoDataset", "coco_train_batches", "coco_eval_iterator"]


def _read_image(path: str) -> np.ndarray:
    if cv2 is not None:
        img = cv2.imread(path)
        if img is None:
            raise IOError(f"cannot read {path}")
        return img[..., ::-1]
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


class CocoDataset:
    """Lightweight index over a COCO instances JSON."""

    def __init__(self, annotation_file: str, image_dir: str, min_edge: int = 32):
        with open(annotation_file) as f:
            data = json.load(f)
        self.image_dir = image_dir
        cat_ids = sorted(c["id"] for c in data["categories"])
        # contiguous 1..K in sorted-cat-id order (reference :75-90)
        self.cat_id_to_label = {cid: i + 1 for i, cid in enumerate(cat_ids)}
        self.label_to_cat_id = {v: k for k, v in self.cat_id_to_label.items()}
        self.cat_names = {
            c["id"]: c["name"] for c in data["categories"]
        }

        anns_by_img: Dict[int, List[dict]] = {}
        for ann in data["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            anns_by_img.setdefault(ann["image_id"], []).append(ann)

        self.images: List[dict] = []
        self.anns: Dict[int, List[dict]] = {}
        for img in data["images"]:
            if min(img["height"], img["width"]) < min_edge:
                continue
            anns = anns_by_img.get(img["id"], [])
            boxes = [a for a in anns if a["bbox"][2] > 0 and a["bbox"][3] > 0]
            if not boxes:
                continue
            self.images.append(img)
            self.anns[img["id"]] = boxes

    def __len__(self):
        return len(self.images)

    def item(self, idx: int) -> Tuple[str, np.ndarray, np.ndarray, int, int, int]:
        """-> (path, boxes01 yxyx [N,4], labels [N], h, w, img_id)."""
        img = self.images[idx]
        h, w = img["height"], img["width"]
        anns = self.anns[img["id"]]
        boxes = np.zeros((len(anns), 4), np.float32)
        labels = np.zeros((len(anns),), np.int32)
        for i, a in enumerate(anns):
            x, y, bw, bh = a["bbox"]
            boxes[i] = [y / h, x / w, (y + bh) / h, (x + bw) / w]  # yxyx in [0,1]
            labels[i] = self.cat_id_to_label[a["category_id"]]
        np.clip(boxes, 0.0, 1.0, out=boxes)
        path = os.path.join(self.image_dir, img["file_name"])
        return path, boxes, labels, h, w, img["id"]


def coco_train_batches(
    dataset: CocoDataset,
    cfg: dict,
    batch_size: int = 1,
    shuffle: bool = True,
    repeat: bool = True,
    seed: int = 0,
    augment: bool = True,
    preprocessing_type: str = "caffe",
    num_workers: int = 4,
) -> Iterator[dict]:
    """Same padded batch contract as data/pascal.pascal_train_batches."""
    import random as pyrandom

    rng = pyrandom.Random(seed)

    def load(args):
        idx, img_seed = args
        path, boxes, labels, _, _, _ = dataset.item(idx)
        image = _read_image(path)
        return preprocess_train_image(
            image, boxes, labels, cfg, np.random.RandomState(img_seed),
            augment=augment, preprocessing_type=preprocessing_type,
        )

    pool = ThreadPoolExecutor(num_workers)
    try:
        while True:
            order = list(range(len(dataset)))
            if shuffle:
                rng.shuffle(order)
            seeds = [rng.randrange(2**31) for _ in order]
            buckets: dict = {}
            for item in pool.map(load, zip(order, seeds)):
                key = item[0].shape[:2]
                buckets.setdefault(key, []).append(item)
                if len(buckets[key]) == batch_size:
                    yield _stack(buckets.pop(key))
            for group in buckets.values():
                while len(group) < batch_size:
                    group.append(group[-1])
                yield _stack(group)
            if not repeat:
                return
    finally:
        try:
            pool.shutdown(wait=False, cancel_futures=True)
        except Exception:  # interpreter teardown: queue module may be gone
            pass


def _stack(group):
    imgs, hws, boxes, masks, labels = zip(*group)
    return {
        "images": np.stack(imgs),
        "image_hw": np.stack(hws),
        "gt_boxes": np.stack(boxes),
        "gt_mask": np.stack(masks),
        "gt_labels": np.stack(labels),
    }


def coco_eval_iterator(
    annotation_file: str,
    image_dir: str,
    cfg: dict,
    preprocessing_type: str = "caffe",
    num_workers: int = 4,
    image_format: Optional[str] = None,
):
    """Returns (iterator of (image, image_hw, scale, raw_h, raw_w, img_id),
    dataset)."""
    ds = CocoDataset(annotation_file, image_dir)

    def load(idx):
        path, _, _, h, w, img_id = ds.item(idx)
        image = _read_image(path)
        img, hw, scale, raw_h, raw_w = preprocess_eval_image(
            image, cfg, preprocessing_type, image_format=image_format
        )
        return img, hw, scale, raw_h, raw_w, img_id

    def iterator():
        pool = ThreadPoolExecutor(num_workers)
        try:
            yield from pool.map(load, range(len(ds)))
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:  # interpreter teardown: queue module may be gone
                pass

    return iterator(), ds
