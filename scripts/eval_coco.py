#!/usr/bin/env python
"""COCO evaluation CLI (reference: scripts/eval_coco.py:181-251).

Runs im_detect over the COCO val/minival set, writes a results JSON
([{image_id, category_id, bbox xywh, score}], eval_coco.py:157-164), and
evaluates with the built-in COCO bbox evaluator.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="checkpoint dir (orbax) or params .npz")
    p.add_argument("--annotation_file", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--model_type", default="faster_rcnn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50",
                   choices=["vgg16", "resnet50", "resnet101", "resnet152"])
    p.add_argument("--results_json", default="./coco_results.json")
    p.add_argument("--preprocessing_type", default="caffe", choices=["caffe", "tf"])
    p.add_argument("--batch_size", type=int, default=8,
                   help="bucket-grouped im_detect_batch size (the measured "
                        "batched-serving win; 1 = reference-style per-image)")
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
    import numpy as np

    from tf_eager_object_detection_tpu.config.config_factory import (
        apply_config_overrides,
        config_factory,
    )
    from tf_eager_object_detection_tpu.data.coco import coco_eval_iterator
    from tf_eager_object_detection_tpu.evaluation.batched_inference import (
        batched_im_detect,
    )
    from tf_eager_object_detection_tpu.evaluation.coco_eval import (
        coco_results_for_image,
        evaluate_coco_detections,
    )
    from tf_eager_object_detection_tpu.evaluation.pascal_eval_files import (
        eval_post_process,
    )
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.ref_import.cli import load_checkpoint_params

    cfg = apply_config_overrides(
        dict(config_factory("coco", args.model_type)), args.config_override
    )
    detector = model_factory(args.model_type, args.backbone, cfg)
    params, image_format = load_checkpoint_params(detector, args.ckpt, args)

    iterator, ds = coco_eval_iterator(
        args.annotation_file, args.image_dir, cfg, args.preprocessing_type,
        image_format=image_format,
    )
    # keyed by stream index: batches complete out of stream order, but the
    # results JSON stays byte-identical to the per-image (batch_size=1) path
    per_index = {}
    for idx, item, (sm, deltas, rois, roi_valid) in batched_im_detect(
        detector, params, iterator, args.batch_size,
        data_parallel=args.data_parallel,
    ):
        raw_h, raw_w, img_id = item[3], item[4], item[5]
        boxes_c, scores_c, valid_c = eval_post_process(
            sm, deltas, rois, roi_valid, float(raw_h), float(raw_w),
            num_classes=detector.num_classes,
            max_per_class=cfg["max_objects_per_class_per_image"],
            score_threshold=cfg["prediction_score_threshold"],
            nms_iou_threshold=cfg["prediction_nms_iou_threshold"],
            min_size=10.0,
            target_means=tuple(cfg["roi_proposal_means"]),
            target_stds=tuple(cfg["roi_proposal_stds"]),
            clip_deltas=not cfg.get("strict_reference_parity", False),
        )
        per_index[idx] = coco_results_for_image(
            np.asarray(boxes_c),
            np.asarray(scores_c),
            np.asarray(valid_c),
            img_id,
            ds.label_to_cat_id,
            cfg["max_objects_per_image"],
        )
    results = [r for idx in sorted(per_index) for r in per_index[idx]]
    with open(args.results_json, "w") as f:
        json.dump(results, f)
    evaluate_coco_detections(args.annotation_file, results)


if __name__ == "__main__":
    main()
