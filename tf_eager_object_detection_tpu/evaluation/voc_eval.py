"""Pascal VOC mAP evaluation (numpy).

Covers both reference evaluators, each oracle-pinned against the
reference's own executing code (tests/test_reference_oracle_eval.py):
- the Detectron-style file-based `voc_eval`
  (`object_detection/evaluation/detectron_pascal_evaluation_utils.py:86-222`):
  per-class detection txt files + gt XMLs + pickle annotation cache.
  Matching: global confidence order; each detection goes to its argmax-IoU
  gt; IoU uses the +1 pixel convention; a match needs IoU > threshold
  (strict); difficult gts are ignored (neither TP nor FP); duplicates FP.
- the chainercv-style in-memory `eval_detection_voc`
  (`object_detection/evaluation/pascal_voc_map_utils.py:11-80`). Two
  deliberate quirks differ from Detectron and are reproduced exactly:
  the reference shifts `bbox[:, 2:] += 1` BEFORE an IoU that itself uses
  the +1 convention (pascal_voc_map_utils.py:190-195 — effectively +2),
  and a match needs IoU >= threshold (`max < thresh -> unmatched`,
  line 197-198). Detections matched to difficult gts occupy a curve
  position with neither TP nor FP (match == -1), which can make leading
  precision entries 0/0 = nan; AP nan_to_num's them like the reference.

AP is 11-point interpolated (`use_07_metric`) or area-under-monotone-PR.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Sequence

import numpy as np

from tf_eager_object_detection_tpu.data.voc import parse_voc_xml

__all__ = ["voc_ap", "voc_eval_class", "voc_eval", "eval_detection_voc"]


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.any(rec >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_one_to_many(box: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """IoU of one box vs [G, 4] gts, +1 convention (VOC devkit style)."""
    ixmin = np.maximum(gts[:, 0], box[0])
    iymin = np.maximum(gts[:, 1], box[1])
    ixmax = np.minimum(gts[:, 2], box[2])
    iymax = np.minimum(gts[:, 3], box[3])
    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
    ih = np.maximum(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    union = (
        (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
        + (gts[:, 2] - gts[:, 0] + 1.0) * (gts[:, 3] - gts[:, 1] + 1.0)
        - inter
    )
    return inter / np.maximum(union, 1e-12)


def voc_eval_class(
    det_image_ids: Sequence,
    det_scores: np.ndarray,
    det_boxes: np.ndarray,
    gt_by_image: Dict,
    iou_thresh: float = 0.5,
    use_07_metric: bool = False,
):
    """Core greedy matcher for one class.

    gt_by_image: image_id -> {'bbox': [G,4], 'difficult': [G] bool}.
    Returns (recall array, precision array, ap).
    """
    npos = sum(int((~np.asarray(g["difficult"], bool)).sum()) for g in gt_by_image.values())
    matched = {k: np.zeros(len(g["bbox"]), bool) for k, g in gt_by_image.items()}

    order = np.argsort(-np.asarray(det_scores))
    nd = len(order)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for rank, d in enumerate(order):
        img = det_image_ids[d]
        g = gt_by_image.get(img)
        if g is None or len(g["bbox"]) == 0:
            fp[rank] = 1.0
            continue
        gts = np.asarray(g["bbox"], np.float64)
        overlaps = _iou_one_to_many(np.asarray(det_boxes[d], np.float64), gts)
        jmax = int(np.argmax(overlaps))
        if overlaps[jmax] > iou_thresh:
            if not g["difficult"][jmax]:
                if not matched[img][jmax]:
                    matched[img][jmax] = True
                    tp[rank] = 1.0
                else:
                    fp[rank] = 1.0
            # difficult gt: ignore the detection entirely
        else:
            fp[rank] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / np.maximum(float(npos), np.finfo(np.float64).eps)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)


def voc_eval(
    detpath: str,
    annopath: str,
    imagesetfile: str,
    classname: str,
    cachedir: str,
    ovthresh: float = 0.5,
    use_07_metric: bool = False,
):
    """File-based API matching the reference signature
    (detectron_pascal_evaluation_utils.py:86-117): detpath/annopath are
    format strings; gt annotations are cached in a pickle under cachedir.
    """
    os.makedirs(cachedir, exist_ok=True)
    imageset = os.path.splitext(os.path.basename(imagesetfile))[0]
    cachefile = os.path.join(cachedir, f"{imageset}_annots.pkl")
    with open(imagesetfile) as f:
        imagenames = [line.strip() for line in f if line.strip()]

    if os.path.isfile(cachefile):
        with open(cachefile, "rb") as f:
            recs = pickle.load(f)
    else:
        recs = {}
        for name in imagenames:
            ann = parse_voc_xml(annopath.format(name))
            recs[name] = ann["objects"]
        with open(cachefile, "wb") as f:
            pickle.dump(recs, f)

    gt_by_image = {}
    for name in imagenames:
        objs = [o for o in recs[name] if o["name"] == classname]
        gt_by_image[name] = {
            "bbox": np.asarray([o["bbox"] for o in objs]).reshape(-1, 4),
            "difficult": np.asarray([bool(o["difficult"]) for o in objs], bool),
        }

    with open(detpath.format(classname)) as f:
        lines = [line.strip().split(" ") for line in f if line.strip()]
    if not lines:
        return np.zeros(0), np.zeros(0), 0.0
    image_ids = [x[0] for x in lines]
    scores = np.asarray([float(x[1]) for x in lines])
    boxes = np.asarray([[float(v) for v in x[2:6]] for x in lines])
    return voc_eval_class(
        image_ids, scores, boxes, gt_by_image, ovthresh, use_07_metric
    )


def eval_detection_voc(
    pred_bboxes: List[np.ndarray],
    pred_labels: List[np.ndarray],
    pred_scores: List[np.ndarray],
    gt_bboxes: List[np.ndarray],
    gt_labels: List[np.ndarray],
    gt_difficults: List[np.ndarray] | None = None,
    iou_thresh: float = 0.5,
    use_07_metric: bool = False,
):
    """In-memory variant (pascal_voc_map_utils.py:11-80, exact semantics —
    see module docstring for the two quirks vs the Detectron matcher).

    Per-image arrays; boxes are xyxy. Returns {'ap': [C], 'map': float} over
    the union of gt/pred class labels ('classes'; the reference indexes the
    same values by raw class id).
    """
    n = len(pred_bboxes)
    if gt_difficults is None:
        gt_difficults = [np.zeros(len(np.asarray(b)), bool) for b in gt_bboxes]
    classes = set()
    for lbl in list(pred_labels) + list(gt_labels):
        classes.update(np.unique(np.asarray(lbl)).tolist())
    classes = sorted(int(c) for c in classes)

    aps = []
    for cls in classes:
        n_pos = 0
        scores: list = []
        match: list = []
        for i in range(n):
            pm = np.asarray(pred_labels[i]) == cls
            boxes_i = np.asarray(pred_bboxes[i], np.float64)[pm]
            scores_i = np.asarray(pred_scores[i], np.float64)[pm]
            order = scores_i.argsort()[::-1]
            boxes_i, scores_i = boxes_i[order], scores_i[order]
            gm = np.asarray(gt_labels[i]) == cls
            gts_i = np.asarray(gt_bboxes[i], np.float64).reshape(-1, 4)[gm]
            diff_i = np.asarray(gt_difficults[i], bool)[gm]
            n_pos += int((~diff_i).sum())
            scores.extend(scores_i.tolist())
            if len(boxes_i) == 0:
                continue
            if len(gts_i) == 0:
                match.extend([0] * len(boxes_i))
                continue
            # the reference's double-+1: shift maxes, then +1-convention IoU
            boxes_i = boxes_i.copy()
            boxes_i[:, 2:] += 1
            gts_i = gts_i.copy()
            gts_i[:, 2:] += 1
            selec = np.zeros(len(gts_i), bool)
            for bb in boxes_i:
                overlaps = _iou_one_to_many(bb, gts_i)
                jmax = int(np.argmax(overlaps))
                if overlaps[jmax] < iou_thresh:
                    match.append(0)
                    continue
                if diff_i[jmax]:
                    match.append(-1)
                elif not selec[jmax]:
                    match.append(1)
                else:
                    match.append(0)
                selec[jmax] = True
        # zero detections with gt present yields empty curves -> ap 0.0,
        # matching the reference (only n_pos == 0 gives nan)
        order = np.asarray(scores).argsort()[::-1]
        match_arr = np.asarray(match, np.int8)[order]
        tp = np.cumsum(match_arr == 1)
        fp = np.cumsum(match_arr == 0)
        with np.errstate(invalid="ignore"):
            prec = tp / (fp + tp)  # 0/0 -> nan at leading ignored positions
        if n_pos == 0:
            aps.append(np.nan)
            continue
        rec = tp / n_pos
        aps.append(voc_ap(rec, np.nan_to_num(prec), use_07_metric))
    aps = np.asarray(aps)
    return {"ap": aps, "map": float(np.nanmean(aps)), "classes": classes}
