"""Differential check of evaluation/coco_eval.py against an INDEPENDENT
second implementation transcribed from the published pycocotools algorithm.

VERDICT r4 item 10: the 20 adversarial fixtures' expectations were hand
derived by the same author as the implementation under test — correlated
error was possible. pycocotools itself is not installable here (egress is
dead), so this file carries the strongest available substitute: a
control-flow-level transcription of the PUBLIC cocoeval.py bbox algorithm
(COCO API, https://github.com/cocodataset/cocoapi, BSD-2 — the exact code
the reference drives at scripts/eval_coco.py:65-73), written to mirror
that source's structure (greedy per-detection matcher with the
ignored-gt break rule, T x D x G loops, crowd gts matchable by already
matched dets, unmatched-det area-range ignores, per-image maxDet
truncation at accumulate, backward precision-monotonization, searchsorted
onto the 101-point recall grid) rather than the repo implementation's
dict/vectorized structure. Agreement between two structurally different
derivations on randomized scenario sweeps is the anti-correlation
evidence; divergence on ANY seed is a real finding against one of them.

This is a transcription of the published algorithm's semantics as data /
independent code, not a copy of pycocotools source text.
"""

import numpy as np
import pytest

from tf_eager_object_detection_tpu.evaluation.coco_eval import CocoBboxEval

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [
    (0.0, 1e10),
    (0.0, 32.0**2),
    (32.0**2, 96.0**2),
    (96.0**2, 1e10),
]
MAX_DETS = (1, 10, 100)


def _iou_xywh(dt, gt, iscrowd):
    """bbox IoU exactly as maskUtils.iou: crowd gt -> inter / det area."""
    D, G = len(dt), len(gt)
    out = np.zeros((D, G), np.float64)
    for d in range(D):
        dx, dy, dw, dh = dt[d]
        for g in range(G):
            gx, gy, gw, gh = gt[g]
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[g] else dw * dh + gw * gh - inter
            if union > 0:
                out[d, g] = inter / union
    return out


def transcribed_cocoeval_stats(gt_json, results):
    """The 12 COCO bbox summary stats, computed with pycocotools' published
    control flow (evaluate -> evaluateImg -> accumulate -> summarize)."""
    cat_ids = sorted(c["id"] for c in gt_json["categories"])
    img_ids = sorted(im["id"] for im in gt_json["images"])

    # _prepare
    gts = {}
    next_id = [1]
    for ann in gt_json["annotations"]:
        a = dict(ann)
        a.setdefault("iscrowd", 0)
        a.setdefault("area", a["bbox"][2] * a["bbox"][3])
        a.setdefault("id", next_id[0])
        next_id[0] += 1
        a["ignore"] = 1 if a["iscrowd"] else 0
        gts.setdefault((a["image_id"], a["category_id"]), []).append(a)
    dts = {}
    for i, det in enumerate(results):
        d = dict(det)
        d["id"] = i + 1
        d["area"] = d["bbox"][2] * d["bbox"][3]
        dts.setdefault((d["image_id"], d["category_id"]), []).append(d)

    # computeIoU: score-desc (mergesort), truncated to maxDets[-1]
    ious = {}
    for img_id in img_ids:
        for cat_id in cat_ids:
            gt = gts.get((img_id, cat_id), [])
            dt = dts.get((img_id, cat_id), [])
            inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
            dt = [dt[i] for i in inds][: MAX_DETS[-1]]
            ious[img_id, cat_id] = _iou_xywh(
                np.asarray([d["bbox"] for d in dt], np.float64).reshape(-1, 4),
                np.asarray([g["bbox"] for g in gt], np.float64).reshape(-1, 4),
                [g["iscrowd"] for g in gt],
            )

    T = len(IOU_THRS)

    def evaluate_img(img_id, cat_id, a_rng, max_det):
        gt = gts.get((img_id, cat_id), [])
        dt = dts.get((img_id, cat_id), [])
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = (
                1
                if (g["ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1])
                else 0
            )
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:max_det]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        iou_m = (
            ious[img_id, cat_id][:, gtind]
            if len(ious[img_id, cat_id]) > 0
            else ious[img_id, cat_id]
        )
        G, D = len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.asarray([g["_ignore"] for g in gt], np.float64)
        dt_ig = np.zeros((T, D))
        if len(iou_m) != 0:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind in range(G):
                        # already matched (to a non-crowd gt): skip
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        # best match so far is a real gt and this one (and
                        # all after, since ignored sort last) is ignored:
                        # stop looking
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if iou_m[dind, gind] < iou:
                            continue
                        iou = iou_m[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        # unmatched dets outside the area range are ignored
        a = np.asarray(
            [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]
        ).reshape(1, D)
        dt_ig = np.logical_or(
            dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0))
        )
        return {
            "dtIds": [d["id"] for d in dt],
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    # accumulate
    K, A, M, R = len(cat_ids), len(AREA_RNG), len(MAX_DETS), len(REC_THRS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat_id in enumerate(cat_ids):
        for a, a_rng in enumerate(AREA_RNG):
            for m, max_det in enumerate(MAX_DETS):
                E = [
                    evaluate_img(img_id, cat_id, a_rng, max_det)
                    for img_id in img_ids
                ]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate(
                    [np.asarray(e["dtScores"])[:max_det] for e in E]
                )
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, :max_det] for e in E], axis=1
                )[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :max_det] for e in E], axis=1
                )[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig)
                )
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = [0.0] * R
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds_r):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[t, :, k, a, m] = np.asarray(q)

    # summarize
    def _s(ap, iou=None, area_idx=0, max_det_idx=2):
        if ap:
            s = precision[:, :, :, area_idx, max_det_idx]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
        else:
            s = recall[:, :, area_idx, max_det_idx]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
        valid = s[s > -1]
        return -1.0 if valid.size == 0 else float(np.mean(valid))

    return np.asarray(
        [
            _s(True),
            _s(True, iou=0.5),
            _s(True, iou=0.75),
            _s(True, area_idx=1),
            _s(True, area_idx=2),
            _s(True, area_idx=3),
            _s(False, max_det_idx=0),
            _s(False, max_det_idx=1),
            _s(False, max_det_idx=2),
            _s(False, area_idx=1),
            _s(False, area_idx=2),
            _s(False, area_idx=3),
        ]
    )


def _random_scenario(rng, n_imgs, n_cats, crowd_p=0.15, tie_scores=False):
    """Random gt JSON + detection results with the failure-prone features:
    crowd gts, areas spanning the S/M/L boundaries (incl. area fields that
    differ from w*h, as segmentation areas do), empty images, images with
    dets but no gts (and vice versa), duplicate detections, score ties."""
    images = [{"id": i + 1, "height": 480, "width": 640} for i in range(n_imgs)]
    cats = [{"id": 10 * (c + 1), "name": f"c{c}"} for c in range(n_cats)]
    annotations, results = [], []
    for img in images:
        if rng.rand() < 0.15:
            continue  # empty image
        for _ in range(rng.randint(0, 6)):
            w = float(rng.choice([8, 20, 31, 33, 60, 95, 97, 200]))
            h = float(rng.choice([8, 20, 31, 33, 60, 95, 97, 200]))
            x = float(rng.uniform(0, 640 - w))
            y = float(rng.uniform(0, 480 - h))
            area = w * h
            if rng.rand() < 0.3:
                area *= rng.uniform(0.5, 1.0)  # segmentation-style area
            annotations.append(
                {
                    "id": len(annotations) + 1,
                    "image_id": img["id"],
                    "category_id": int(rng.choice([c["id"] for c in cats])),
                    "bbox": [x, y, w, h],
                    "area": float(area),
                    "iscrowd": int(rng.rand() < crowd_p),
                }
            )
    for img in images:
        for _ in range(rng.randint(0, 10)):
            if annotations and rng.rand() < 0.6:
                a = annotations[rng.randint(0, len(annotations))]
                x, y, w, h = a["bbox"]
                cat = (
                    a["category_id"]
                    if rng.rand() < 0.8
                    else int(rng.choice([c["id"] for c in cats]))
                )
                jitter = rng.uniform(-10, 10, 4)
                bbox = [x + jitter[0], y + jitter[1], max(2.0, w + jitter[2]),
                        max(2.0, h + jitter[3])]
                results.append(
                    {
                        "image_id": img["id"],
                        "category_id": cat,
                        "bbox": [float(v) for v in bbox],
                        "score": float(rng.uniform(0.05, 1.0)),
                    }
                )
            else:
                w, h = float(rng.uniform(5, 200)), float(rng.uniform(5, 200))
                results.append(
                    {
                        "image_id": img["id"],
                        "category_id": int(rng.choice([c["id"] for c in cats])),
                        "bbox": [
                            float(rng.uniform(0, 640 - w)),
                            float(rng.uniform(0, 480 - h)),
                            w,
                            h,
                        ],
                        "score": float(rng.uniform(0.05, 1.0)),
                    }
                )
    if tie_scores:
        for r in results:
            r["score"] = round(r["score"], 1)  # mass ties
    gt_json = {"images": images, "annotations": annotations, "categories": cats}
    return gt_json, results


@pytest.mark.parametrize("seed", range(12))
def test_differential_random_scenarios(seed):
    rng = np.random.RandomState(seed)
    gt_json, results = _random_scenario(
        rng,
        n_imgs=rng.randint(2, 7),
        n_cats=rng.randint(1, 5),
        crowd_p=[0.0, 0.15, 0.5][seed % 3],
        tie_scores=seed % 2 == 0,
    )
    ev = CocoBboxEval(gt_json, results)
    got = ev.evaluate()
    want = transcribed_cocoeval_stats(gt_json, results)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                               err_msg=f"seed={seed}")


def test_differential_heavy_duplicates_and_overflow():
    """>100 dets for one (image, category): both implementations must
    truncate at maxDets[-1] identically; plus exact-duplicate detections
    (same bbox, same score) exercising stable-sort tie order."""
    rng = np.random.RandomState(99)
    gt_json, results = _random_scenario(rng, n_imgs=2, n_cats=1)
    img_id = 1
    cat_id = gt_json["categories"][0]["id"]
    base = {"image_id": img_id, "category_id": cat_id,
            "bbox": [50.0, 50.0, 40.0, 40.0], "score": 0.5}
    results.extend(dict(base) for _ in range(130))
    ev = CocoBboxEval(gt_json, results)
    np.testing.assert_allclose(
        ev.evaluate(),
        transcribed_cocoeval_stats(gt_json, results),
        rtol=0,
        atol=1e-12,
    )
