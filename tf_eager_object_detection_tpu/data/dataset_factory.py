"""Public data API with the reference's dispatch semantics
(`object_detection/dataset/dataset_factory.py:7-22`):

    dataset_factory(dataset_type, mode, configs) -> iterator (train) or
        (iterator, ids/dataset) (eval)

dataset_type in {'pascal', 'coco'}; mode in {'train', 'test'} (pascal) /
{'train', 'val'} (coco). `configs` is a dict of keyword args for the
underlying builder (tfrecord paths, roots, batch size, ...), merged with the
model config dict under key 'model_config'.
"""

from __future__ import annotations

from tf_eager_object_detection_tpu.data.coco import (
    CocoDataset,
    coco_eval_iterator,
    coco_train_batches,
)
from tf_eager_object_detection_tpu.data.pascal import (
    pascal_eval_iterator,
    pascal_train_batches,
)

__all__ = ["dataset_factory"]


def dataset_factory(dataset_type: str, mode: str, configs: dict):
    cfg = configs["model_config"]
    if dataset_type == "pascal":
        if mode == "train":
            return pascal_train_batches(
                configs["tf_records_list"],
                cfg,
                batch_size=configs.get("batch_size", 1),
                shuffle=configs.get("shuffle", True),
                repeat=configs.get("repeat", True),
                seed=configs.get("seed", 0),
                augment=configs.get("argument", True),
                preprocessing_type=configs.get("preprocessing_type", "caffe"),
            )
        if mode == "test":
            return pascal_eval_iterator(
                configs["root_path"],
                configs.get("image_set", "test"),
                cfg,
                preprocessing_type=configs.get("preprocessing_type", "caffe"),
            )
    elif dataset_type == "coco":
        if mode == "train":
            ds = CocoDataset(configs["annotation_file"], configs["image_dir"])
            return coco_train_batches(
                ds,
                cfg,
                batch_size=configs.get("batch_size", 1),
                shuffle=configs.get("shuffle", True),
                repeat=configs.get("repeat", True),
                seed=configs.get("seed", 0),
                augment=configs.get("argument", True),
                preprocessing_type=configs.get("preprocessing_type", "caffe"),
            )
        if mode == "val":
            return coco_eval_iterator(
                configs["annotation_file"],
                configs["image_dir"],
                cfg,
                preprocessing_type=configs.get("preprocessing_type", "caffe"),
            )
    raise ValueError(
        f"unknown dataset type {dataset_type} / mode {mode} combination"
    )
