"""VOC-format detection file writer (the reference's E1,
`object_detection/evaluation/pascal_eval_files_utils.py:19-122`).

Per eval image: `detector.im_detect` -> per-class decode / clip(min_size=10
against the *raw* image) / per-class NMS (on device, batched over classes)
-> per-image score cap -> per-class `{cls}.txt` in VOC devkit format
(1-based coords).
"""

from __future__ import annotations

import functools
from typing import Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tf_eager_object_detection_tpu.core.boxes import clip_boxes, min_edge_mask
from tf_eager_object_detection_tpu.core.transforms import decode_boxes
from tf_eager_object_detection_tpu.data.label_map import PASCAL_CLASSES
from tf_eager_object_detection_tpu.ops.nms import non_max_suppression

__all__ = ["eval_post_process", "write_voc_detection_files", "get_prediction_files"]


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "max_per_class", "clip_deltas"),
)
def eval_post_process(
    scores,
    deltas,
    rois,
    roi_valid,
    raw_h,
    raw_w,
    num_classes: int,
    max_per_class: int,
    score_threshold=0.0,
    nms_iou_threshold=0.3,
    min_size=10.0,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    clip_deltas: bool = True,
):
    """Batched-over-classes eval post-processing.

    scores: [R, C] softmax; deltas: [R, C, 4]; rois: [R, 4] (already divided
    by scale -> raw-image coords). Returns per-class padded
    (boxes [C-1, K, 4], scores [C-1, K], valid [C-1, K]).
    """

    def per_class(cls_scores, cls_deltas):
        keep = roi_valid & (cls_scores > score_threshold)
        boxes = decode_boxes(
            rois, cls_deltas, target_means, target_stds, clip_deltas=clip_deltas
        )
        boxes = clip_boxes(boxes, raw_h, raw_w)
        keep = keep & min_edge_mask(boxes, min_size)
        idx, ok = non_max_suppression(
            boxes, cls_scores, keep, max_per_class, nms_iou_threshold
        )
        return boxes[idx], cls_scores[idx], ok

    fg_scores = jnp.swapaxes(scores[:, 1:], 0, 1)
    fg_deltas = jnp.swapaxes(deltas[:, 1:, :], 0, 1)
    return jax.vmap(per_class)(fg_scores, fg_deltas)


def _cap_per_image(per_class_dets: List[np.ndarray], max_per_image: int):
    """Keep only detections above the max_per_image-th score (reference
    pascal_eval_files_utils.py:99-106: threshold, not exact top-k)."""
    if max_per_image <= 0:
        return per_class_dets
    all_scores = np.concatenate([d[:, 4] for d in per_class_dets]) if per_class_dets else np.zeros(0)
    if len(all_scores) <= max_per_image:
        return per_class_dets
    thresh = np.sort(all_scores)[-max_per_image]
    return [d[d[:, 4] >= thresh] for d in per_class_dets]


def get_prediction_files(
    detector,
    params,
    eval_iterator: Iterable,
    image_ids: Sequence[str],
    result_file_format: str,
    class_names: Sequence[str] = PASCAL_CLASSES,
    score_threshold: float = 0.0,
    nms_iou_threshold: float = 0.3,
    max_objects_per_class: int = 50,
    max_objects_per_image: int = 50,
    min_size: float = 10.0,
    batch_size: int = 8,
    data_parallel: int = 0,
    spatial_partition: int = 0,
):
    """Runs eval inference and writes per-class VOC result files.

    eval_iterator yields (image [Hp, Wp, 3], image_hw [2], scale, raw_h,
    raw_w) host-side tuples aligned with image_ids. data_parallel > 0
    shards each batch over the first N devices; spatial_partition > 0
    shards image rows instead (see batched_im_detect).
    """
    from tf_eager_object_detection_tpu.evaluation.batched_inference import (
        batched_im_detect,
    )

    cfg = detector.cfg
    num_classes = detector.num_classes
    per_image: List[np.ndarray | None] = [None] * len(image_ids)

    for img_idx, item, (sm, deltas, rois, roi_valid) in batched_im_detect(
        detector, params, eval_iterator, batch_size,
        data_parallel=data_parallel, spatial_partition=spatial_partition,
    ):
        raw_h, raw_w = item[3], item[4]
        boxes_c, scores_c, valid_c = eval_post_process(
            sm,
            deltas,
            rois,
            roi_valid,
            float(raw_h),
            float(raw_w),
            num_classes=num_classes,
            max_per_class=max_objects_per_class,
            score_threshold=score_threshold,
            nms_iou_threshold=nms_iou_threshold,
            min_size=min_size,
            target_means=tuple(cfg["roi_proposal_means"]),
            target_stds=tuple(cfg["roi_proposal_stds"]),
            clip_deltas=not cfg.get("strict_reference_parity", False),
        )
        boxes_c = np.asarray(boxes_c)
        scores_c = np.asarray(scores_c)
        valid_c = np.asarray(valid_c)
        dets = [
            np.concatenate(
                [boxes_c[j][valid_c[j]], scores_c[j][valid_c[j], None]], axis=1
            )
            for j in range(num_classes - 1)
        ]
        per_image[img_idx] = _cap_per_image(dets, max_objects_per_image)

    return write_voc_detection_files(
        per_image, image_ids, class_names, result_file_format
    )


def write_voc_detection_files(
    per_image: List[List[np.ndarray]],
    image_ids: Sequence[str],
    class_names: Sequence[str],
    result_file_format: str,
) -> List[str]:
    """per_image[i][c] = [N, 5] (x1, y1, x2, y2, score) raw-image coords."""
    paths = []
    for c, cls in enumerate(class_names):
        path = result_file_format.format(cls)
        paths.append(path)
        with open(path, "w") as f:
            for img_idx, image_id in enumerate(image_ids):
                if img_idx >= len(per_image) or per_image[img_idx] is None:
                    continue
                dets = per_image[img_idx][c]
                for k in range(dets.shape[0]):
                    # VOC devkit expects 1-based coords
                    f.write(
                        "{:s} {:.3f} {:.1f} {:.1f} {:.1f} {:.1f}\n".format(
                            image_id,
                            dets[k, 4],
                            dets[k, 0] + 1,
                            dets[k, 1] + 1,
                            dets[k, 2] + 1,
                            dets[k, 3] + 1,
                        )
                    )
    return paths
