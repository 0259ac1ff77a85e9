"""Pascal VOC dataset iterators (train from tfrecords, eval from VOC tree).

TF-free replacements for the reference datasets:
- `pascal_train_batches` ~ `pascal_tf_dataset_generator.get_dataset` (D1):
  parse tfrecords -> hflip augment -> caffe/tf normalize -> resize -> pad to
  static bucket -> yield padded batch dicts (contract documented in the
  reference's dataset README: image float32 BGR, boxes pixel xyxy on the
  resized image, labels int).
- `pascal_eval_iterator` ~ `eval_pascal_tf_dataset.get_dataset_by_local_file`
  (D4): cv2 BGR reads, returns (image, image_hw, scale, raw_h, raw_w) plus
  the image-id list.

Decoding/augmentation runs in a small thread pool (the tf.data analogue of
num_parallel_calls) with deterministic per-image RNG derived from the seed.
"""

from __future__ import annotations

import io
import os
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from tf_eager_object_detection_tpu.data.preprocessing import (
    preprocess_eval_image,
    preprocess_train_image,
)
from tf_eager_object_detection_tpu.data.tfrecord import decode_example, read_tfrecords

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

__all__ = [
    "parse_pascal_example",
    "pascal_train_batches",
    "pascal_train_batches_from_voc",
    "pascal_eval_iterator",
    "pascal_eval_iterator_from_tf_records",
]


def _decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB uint8 array."""
    if cv2 is not None:
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        return img[..., ::-1]  # BGR -> RGB
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def _use_native(cfg: dict) -> bool:
    """True when the fused C++ pipeline is requested AND loadable."""
    if not cfg.get("tpu_native_decode"):
        return False
    from tf_eager_object_detection_tpu.data import native_image

    return native_image.available()


def parse_pascal_example_raw(record: bytes):
    """Serialized Example -> (jpeg bytes, boxes01 yxyx [N,4], labels [N])."""
    feats = decode_example(record)
    jpeg = feats["image/encoded"][1][0]
    ymin = np.asarray(feats.get("image/object/bbox/ymin", ("float", []))[1])
    xmin = np.asarray(feats.get("image/object/bbox/xmin", ("float", []))[1])
    ymax = np.asarray(feats.get("image/object/bbox/ymax", ("float", []))[1])
    xmax = np.asarray(feats.get("image/object/bbox/xmax", ("float", []))[1])
    boxes = np.stack([ymin, xmin, ymax, xmax], axis=1).astype(np.float32) if len(ymin) else np.zeros((0, 4), np.float32)
    labels = np.asarray(
        feats.get("image/object/class/label", ("int64", []))[1], np.int32
    )
    return jpeg, boxes, labels


def parse_pascal_example(record: bytes):
    """Serialized Example -> (rgb image, boxes01 yxyx [N,4], labels [N])."""
    jpeg, boxes, labels = parse_pascal_example_raw(record)
    return _decode_jpeg(jpeg), boxes, labels


def pascal_train_batches(
    tfrecord_paths: Sequence[str],
    cfg: dict,
    batch_size: int = 1,
    shuffle: bool = True,
    repeat: bool = True,
    seed: int = 0,
    augment: bool = True,
    preprocessing_type: str = "caffe",
    num_workers: int = 4,
) -> Iterator[dict]:
    """Yields dict batches grouped by bucket shape.

    Batch keys: images [B,Hb,Wb,3], image_hw [B,2], gt_boxes [B,G,4] xyxy,
    gt_mask [B,G], gt_labels [B,G]. All images in a batch share one bucket
    (so the jitted step compiles once per bucket).
    """
    paths = list(tfrecord_paths)
    py_rng = random.Random(seed)
    epoch = 0

    use_native = _use_native(cfg)

    def load_one(args):
        record, img_seed = args
        jpeg, boxes, labels = parse_pascal_example_raw(record)
        rng = np.random.RandomState(img_seed)
        if use_native:
            from tf_eager_object_detection_tpu.data.native_image import (
                preprocess_train_bytes,
            )

            return preprocess_train_bytes(
                jpeg, boxes, labels, cfg, rng, augment=augment,
                preprocessing_type=preprocessing_type,
            )
        return preprocess_train_image(
            _decode_jpeg(jpeg), boxes, labels, cfg, rng, augment=augment,
            preprocessing_type=preprocessing_type,
        )

    pool = ThreadPoolExecutor(num_workers)
    try:
        while True:
            records = []
            for p in paths:
                records.extend(read_tfrecords(p))
            if shuffle:
                py_rng.shuffle(records)
            seeds = [py_rng.randrange(2**31) for _ in records]
            buckets: dict = {}
            for item in pool.map(load_one, zip(records, seeds)):
                img, hw, boxes, mask, labels = item
                key = img.shape[:2]
                buckets.setdefault(key, []).append(item)
                if len(buckets[key]) == batch_size:
                    group = buckets.pop(key)
                    yield _stack_batch(group)
            # flush incomplete groups by repeating their last element
            for group in buckets.values():
                while len(group) < batch_size:
                    group.append(group[-1])
                yield _stack_batch(group)
            epoch += 1
            if not repeat:
                return
    finally:
        # generator may be closed mid-epoch (or at interpreter teardown):
        # don't block joining worker threads
        try:
            pool.shutdown(wait=False, cancel_futures=True)
        except Exception:  # interpreter teardown: queue module may be gone
            pass


def _stack_batch(group):
    imgs, hws, boxes, masks, labels = zip(*group)
    return {
        "images": np.stack(imgs),
        "image_hw": np.stack(hws),
        "gt_boxes": np.stack(boxes),
        "gt_mask": np.stack(masks),
        "gt_labels": np.stack(labels),
    }


def pascal_train_batches_from_voc(
    root_path: str,
    mode: str,
    cfg: dict,
    batch_size: int = 1,
    shuffle: bool = True,
    repeat: bool = True,
    seed: int = 0,
    augment: bool = True,
    preprocessing_type: str = "caffe",
    num_workers: int = 4,
) -> Iterator[dict]:
    """Train directly from a VOC tree without tfrecords (the reference's
    legacy `pascal_tf_dataset_local_file.get_dataset`, D5). Same padded batch
    contract as `pascal_train_batches`."""
    import random as pyrandom

    from tf_eager_object_detection_tpu.data.label_map import pascal_label_map_dict
    from tf_eager_object_detection_tpu.data.voc import parse_voc_xml

    label_map = pascal_label_map_dict()
    with open(os.path.join(root_path, "ImageSets", "Main", f"{mode}.txt")) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    rng = pyrandom.Random(seed)

    use_native = _use_native(cfg)

    def load(args):
        image_id, img_seed = args
        ann = parse_voc_xml(
            os.path.join(root_path, "Annotations", f"{image_id}.xml")
        )
        path = os.path.join(root_path, "JPEGImages", f"{image_id}.jpg")
        h, w = ann["height"], ann["width"]
        boxes01 = np.asarray(
            [
                [
                    (o["bbox"][1] - 1.0) / (h - 1.0),
                    (o["bbox"][0] - 1.0) / (w - 1.0),
                    (o["bbox"][3] - 1.0) / (h - 1.0),
                    (o["bbox"][2] - 1.0) / (w - 1.0),
                ]
                for o in ann["objects"]
            ],
            np.float32,
        ).reshape(-1, 4)
        labels = np.asarray(
            [label_map[o["name"]] for o in ann["objects"]], np.int32
        )
        if use_native:
            from tf_eager_object_detection_tpu.data.native_image import (
                preprocess_train_bytes,
            )

            with open(path, "rb") as f:
                jpeg = f.read()
            return preprocess_train_bytes(
                jpeg, boxes01, labels, cfg, np.random.RandomState(img_seed),
                augment=augment, preprocessing_type=preprocessing_type,
            )
        if cv2 is not None:
            image = cv2.imread(path)[..., ::-1]
        else:
            from PIL import Image

            image = np.asarray(Image.open(path).convert("RGB"))
        return preprocess_train_image(
            image, boxes01, labels, cfg, np.random.RandomState(img_seed),
            augment=augment, preprocessing_type=preprocessing_type,
        )

    pool = ThreadPoolExecutor(num_workers)
    try:
        while True:
            order = list(ids)
            if shuffle:
                rng.shuffle(order)
            seeds = [rng.randrange(2**31) for _ in order]
            buckets: dict = {}
            for item in pool.map(load, zip(order, seeds)):
                key = item[0].shape[:2]
                buckets.setdefault(key, []).append(item)
                if len(buckets[key]) == batch_size:
                    yield _stack_batch(buckets.pop(key))
            for group in buckets.values():
                while len(group) < batch_size:
                    group.append(group[-1])
                yield _stack_batch(group)
            if not repeat:
                return
    finally:
        try:
            pool.shutdown(wait=False, cancel_futures=True)
        except Exception:  # interpreter teardown: queue module may be gone
            pass


def pascal_eval_iterator_from_tf_records(
    tfrecord_paths: Sequence[str],
    cfg: dict,
    preprocessing_type: str = "caffe",
    num_workers: int = 4,
    image_format: Optional[str] = None,
):
    """Eval iterator over tfrecords (the reference's
    `eval_pascal_tf_dataset.get_dataset_by_tf_records`, D4). Returns
    (iterator of (image, image_hw, scale, raw_h, raw_w), image_ids from the
    stored filenames)."""
    records: List[bytes] = []
    for p in tfrecord_paths:
        records.extend(read_tfrecords(p))
    image_ids = []
    for rec in records:
        feats = decode_example(rec)
        name = feats.get("image/filename", ("bytes", [b""]))[1][0].decode()
        image_ids.append(os.path.splitext(name)[0])

    use_native = _use_native(cfg)

    def load(rec):
        jpeg, _, _ = parse_pascal_example_raw(rec)
        if use_native:
            from tf_eager_object_detection_tpu.data.native_image import (
                preprocess_eval_bytes,
            )

            return preprocess_eval_bytes(
                jpeg, cfg, preprocessing_type, image_format=image_format
            )
        return preprocess_eval_image(
            _decode_jpeg(jpeg), cfg, preprocessing_type,
            image_format=image_format,
        )

    def iterator():
        pool = ThreadPoolExecutor(num_workers)
        try:
            yield from pool.map(load, records)
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:  # interpreter teardown: queue module may be gone
                pass

    return iterator(), image_ids


def pascal_eval_iterator(
    root_path: str,
    mode: str,
    cfg: dict,
    preprocessing_type: str = "caffe",
    num_workers: int = 4,
    image_format: Optional[str] = None,
):
    """Returns (iterator of (image, image_hw, scale, raw_h, raw_w), image_ids).

    root_path points at .../VOC2007 (like the reference's `root_path`,
    eval_pascal_tf_dataset.py:11).
    """
    with open(os.path.join(root_path, "ImageSets", "Main", f"{mode}.txt")) as f:
        image_ids = [line.strip().split()[0] for line in f if line.strip()]
    img_dir = os.path.join(root_path, "JPEGImages")

    use_native = _use_native(cfg)

    def load(image_id):
        path = os.path.join(img_dir, image_id + ".jpg")
        if use_native:
            from tf_eager_object_detection_tpu.data.native_image import (
                preprocess_eval_bytes,
            )

            with open(path, "rb") as f:
                jpeg = f.read()
            return preprocess_eval_bytes(
                jpeg, cfg, preprocessing_type, image_format=image_format
            )
        if cv2 is not None:
            img = cv2.imread(path)[..., ::-1]  # BGR file -> RGB
        else:
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
        return preprocess_eval_image(
            img, cfg, preprocessing_type, image_format=image_format
        )

    def iterator():
        pool = ThreadPoolExecutor(num_workers)
        try:
            yield from pool.map(load, image_ids)
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:  # interpreter teardown: queue module may be gone
                pass

    return iterator(), image_ids
