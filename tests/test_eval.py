"""Evaluation tests: VOC AP matcher + COCO bbox evaluator semantics."""

import numpy as np

from tf_eager_object_detection_tpu.evaluation.coco_eval import CocoBboxEval
from tf_eager_object_detection_tpu.evaluation.voc_eval import (
    eval_detection_voc,
    voc_ap,
    voc_eval_class,
)


def test_voc_ap_area_method():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 0.5])
    # area: 0.5*1.0 + 0.5*0.5
    assert abs(voc_ap(rec, prec) - 0.75) < 1e-9


def test_voc_ap_11point():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 0.5])
    # recalls 0,.1..,.5 -> max prec 1.0 (6 pts); .6..1.0 -> 0.5 (5 pts)
    want = (6 * 1.0 + 5 * 0.5) / 11
    assert abs(voc_ap(rec, prec, use_07_metric=True) - want) < 1e-9


def test_voc_eval_class_greedy_matching():
    gt = {
        "img1": {
            "bbox": np.asarray([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 70.0, 70.0]]),
            "difficult": np.asarray([False, False]),
        }
    }
    # det1 matches gt0 (TP); det2 duplicates gt0 (FP); det3 matches gt1 (TP)
    ids = ["img1", "img1", "img1"]
    scores = np.asarray([0.9, 0.8, 0.7])
    boxes = np.asarray(
        [[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0], [50.0, 50.0, 70.0, 70.0]]
    )
    rec, prec, ap = voc_eval_class(ids, scores, boxes, gt)
    np.testing.assert_allclose(rec, [0.5, 0.5, 1.0])
    np.testing.assert_allclose(prec, [1.0, 0.5, 2.0 / 3.0])


def test_voc_eval_difficult_ignored():
    gt = {
        "img1": {
            "bbox": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
            "difficult": np.asarray([True]),
        },
        "img2": {
            "bbox": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
            "difficult": np.asarray([False]),
        },
    }
    ids = ["img1", "img2"]
    scores = np.asarray([0.9, 0.8])
    boxes = np.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    rec, prec, ap = voc_eval_class(ids, scores, boxes, gt)
    # difficult gt: det neither TP nor FP; npos counts only img2
    assert rec[-1] == 1.0 and ap == 1.0


def test_eval_detection_voc_inmemory():
    pred_boxes = [np.asarray([[0.0, 0.0, 10.0, 10.0]])]
    pred_labels = [np.asarray([1])]
    pred_scores = [np.asarray([0.9])]
    gt_boxes = [np.asarray([[0.0, 0.0, 10.0, 10.0]])]
    gt_labels = [np.asarray([1])]
    res = eval_detection_voc(pred_boxes, pred_labels, pred_scores, gt_boxes, gt_labels)
    assert res["map"] == 1.0


def _gt(images, anns, cats=(1,)):
    return {
        "images": [{"id": i, "height": 100, "width": 100} for i in images],
        "annotations": anns,
        "categories": [{"id": c, "name": str(c)} for c in cats],
    }


def test_coco_perfect_detection():
    gt = _gt(
        [1],
        [{"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "area": 2500, "iscrowd": 0}],
    )
    results = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "score": 0.9}]
    stats = CocoBboxEval(gt, results).evaluate()
    assert stats[0] == 1.0  # AP
    assert stats[1] == 1.0  # AP50
    assert stats[8] == 1.0  # AR@100


def test_coco_half_recall():
    gt = _gt(
        [1],
        [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 0},
        ],
    )
    results = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9}]
    stats = CocoBboxEval(gt, results).evaluate()
    # precision 1.0 up to recall 0.5 -> 51 of 101 interpolation points
    np.testing.assert_allclose(stats[0], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(stats[8], 0.5, atol=1e-6)


def test_coco_crowd_ignored():
    gt = _gt(
        [1],
        [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100], "area": 10000, "iscrowd": 1},
        ],
    )
    # det inside the crowd region: matched to crowd -> ignored, not FP
    results = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9}]
    stats = CocoBboxEval(gt, results).evaluate()
    # no non-ignored gt at all -> all metrics undefined (-1)
    assert stats[0] == -1.0


def test_coco_area_ranges():
    gt = _gt(
        [1],
        [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0},   # small
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [0, 0, 99, 99], "area": 9801, "iscrowd": 0},  # large
        ],
    )
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 99, 99], "score": 0.8},
    ]
    stats = CocoBboxEval(gt, results).evaluate()
    assert stats[0] == 1.0
    assert stats[3] == 1.0  # AP small
    assert stats[5] == 1.0  # AP large
    assert stats[4] == -1.0  # no medium gt
