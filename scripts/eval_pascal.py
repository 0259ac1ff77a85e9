#!/usr/bin/env python
"""Pascal VOC evaluation CLI (reference: scripts/eval_pascal.py:109-216).

Runs im_detect over the eval set, writes per-class VOC detection files, and
computes per-class AP + mAP with the detectron-style voc_eval.

    python scripts/eval_pascal.py CKPT_DIR --root_path /data/VOC2007 \
        --model_type faster_rcnn --backbone resnet50
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", nargs="?", default=None,
                   help="checkpoint dir (orbax) or params .npz; optional "
                        "with --use_local_result_files")
    p.add_argument("--root_path", required=True, help=".../VOCdevkit/VOC2007")
    p.add_argument("--model_type", default="faster_rcnn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50",
                   choices=["vgg16", "resnet50", "resnet101", "resnet152"])
    p.add_argument("--mode", default="test")
    p.add_argument("--result_dir", default="./voc_results")
    # VOC07 uses the 11-point metric by default (reference eval_pascal.py:128)
    p.add_argument("--use_07_metric", action="store_true", default=True)
    p.add_argument("--no_07_metric", dest="use_07_metric", action="store_false")
    p.add_argument("--preprocessing_type", default="caffe", choices=["caffe", "tf"])
    # reference eval_pascal.py:115: dataset_type 'cv2' reads JPEGs directly,
    # 'tf' iterates eval tfrecords (our D4 twin)
    p.add_argument("--dataset_type", default="cv2", choices=["cv2", "tf"])
    p.add_argument("--tf_records_glob", default=None,
                   help="with --dataset_type tf: glob of eval tfrecords")
    # reference eval_pascal.py:126: evaluate existing result files without
    # running the model
    p.add_argument("--use_local_result_files", action="store_true")
    p.add_argument("--batch_size", type=int, default=8,
                   help="bucket-grouped im_detect_batch size (1 = "
                        "reference-style per-image)")
    p.add_argument("--spatial_partition", type=int, default=0,
                   help="shard each image's rows over N devices during eval "
                        "inference (parallel/spatial.py; exclusive with "
                        "--data_parallel)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard each eval batch over the first N devices "
                        "(GSPMD; batch_size must divide by N; 0 = single device)")
    p.add_argument("--config_override", action="append", default=[],
                   metavar="KEY=JSON",
                   help="override a single config key (JSON value; repeatable)")
    from tf_eager_object_detection_tpu.ref_import.cli import add_import_flags

    add_import_flags(p)
    return p.parse_args()


def main():
    args = parse_args()
    from tf_eager_object_detection_tpu.config.config_factory import (
        apply_config_overrides,
        config_factory,
    )
    from tf_eager_object_detection_tpu.data.label_map import PASCAL_CLASSES
    from tf_eager_object_detection_tpu.evaluation.voc_eval import voc_eval

    cfg = apply_config_overrides(
        dict(config_factory("pascal", args.model_type)), args.config_override
    )
    os.makedirs(args.result_dir, exist_ok=True)
    result_fmt = os.path.join(args.result_dir, "{:s}.txt")

    if not args.use_local_result_files:
        if not args.ckpt:
            raise SystemExit("a checkpoint is required unless "
                             "--use_local_result_files is set")
        from tf_eager_object_detection_tpu.data.pascal import (
            pascal_eval_iterator,
            pascal_eval_iterator_from_tf_records,
        )
        from tf_eager_object_detection_tpu.evaluation.pascal_eval_files import (
            get_prediction_files,
        )
        from tf_eager_object_detection_tpu.models.model_factory import model_factory
        from tf_eager_object_detection_tpu.ref_import.cli import (
            load_checkpoint_params,
        )

        detector = model_factory(args.model_type, args.backbone, cfg)
        params, image_format = load_checkpoint_params(detector, args.ckpt, args)

        if args.dataset_type == "tf":
            import glob as _glob

            if not args.tf_records_glob:
                raise SystemExit("--dataset_type tf requires --tf_records_glob")
            records = sorted(_glob.glob(args.tf_records_glob))
            if not records:
                raise FileNotFoundError(args.tf_records_glob)
            iterator, image_ids = pascal_eval_iterator_from_tf_records(
                records, cfg, args.preprocessing_type, image_format=image_format
            )
        else:
            iterator, image_ids = pascal_eval_iterator(
                args.root_path, args.mode, cfg, args.preprocessing_type,
                image_format=image_format,
            )
        get_prediction_files(
            detector,
            params,
            iterator,
            image_ids,
            result_fmt,
            score_threshold=cfg["prediction_score_threshold"],
            nms_iou_threshold=cfg["prediction_nms_iou_threshold"],
            max_objects_per_class=cfg["max_objects_per_class_per_image"],
            max_objects_per_image=cfg["max_objects_per_image"],
            batch_size=args.batch_size,
            data_parallel=args.data_parallel,
            spatial_partition=args.spatial_partition,
        )

    annopath = os.path.join(args.root_path, "Annotations", "{:s}.xml")
    imageset = os.path.join(args.root_path, "ImageSets", "Main", f"{args.mode}.txt")
    cachedir = os.path.join(args.result_dir, "annotations_cache")
    aps = []
    for cls in PASCAL_CLASSES:
        _, _, ap = voc_eval(
            result_fmt, annopath, imageset, cls, cachedir,
            ovthresh=cfg["evaluate_iou_threshold"],
            use_07_metric=args.use_07_metric,
        )
        aps.append(ap)
        print(f"{cls:>15s} AP = {ap:.4f}")
    print(f"{'mAP':>15s} = {sum(aps) / len(aps):.4f}")


if __name__ == "__main__":
    main()
