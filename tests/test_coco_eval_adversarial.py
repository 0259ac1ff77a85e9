"""Adversarial fixture battery for CocoBboxEval (VERDICT r3 task 3).

pycocotools is not installable in this environment (no egress; only
typeshed stubs exist), so a live A/B is impossible. Instead every known
pycocotools COCOeval subtlety is pinned by a hand-derived fixture: the
expected values below are computed by hand-executing the COCOeval bbox
algorithm (pycocotools/cocoeval.py evaluateImg/accumulate/summarize) and
each derivation is documented inline.

Algorithm facts these fixtures pin (cocoeval.py references by behavior):
- greedy matcher: dets score-descending, each scans gts; matched
  non-crowd gts are skipped; crowd gts can be matched repeatedly;
  EQUAL IoU replaces the best match (strict `< iou` continue), so ties
  go to the LATER eligible gt;
- ignore preference: once a det holds a non-ignored match, the scan
  BREAKS at the first ignored gt (ignored gts are sorted last), so a
  non-ignored gt wins even at lower IoU;
- gt ignore = iscrowd OR area outside the range (strict < / >, so a
  boundary area belongs to BOTH adjacent ranges);
- dets matched to an ignored gt are ignored; unmatched dets with area
  outside the range are ignored; ignored dets are neither TP nor FP;
- crowd IoU = intersection / det area;
- maxDets truncation happens per (image, category) BEFORE matching;
- global det ordering is score-descending with mergesort stability
  (image order = sorted image ids);
- precision is monotonized from the right, then sampled at the 101
  recall knots via searchsorted(..., side='left');
- (image, category) pairs with no gt and no dt contribute nothing;
- categories with zero non-ignored gt stay -1 and are excluded from the
  mean.
"""

import numpy as np
import pytest

from tf_eager_object_detection_tpu.evaluation.coco_eval import CocoBboxEval


def make_gt(anns, n_images=None, cats=(1,)):
    """anns: list of (img_id, cat_id, xywh, iscrowd) tuples."""
    img_ids = sorted({a[0] for a in anns}) or [1]
    if n_images is not None:
        img_ids = list(range(1, n_images + 1))
    return {
        "images": [{"id": i} for i in img_ids],
        "categories": [{"id": c} for c in cats],
        "annotations": [
            {
                "id": k + 1,
                "image_id": a[0],
                "category_id": a[1],
                "bbox": list(map(float, a[2])),
                "area": float(a[2][2] * a[2][3]),
                "iscrowd": int(a[3]) if len(a) > 3 else 0,
            }
            for k, a in enumerate(anns)
        ],
    }


def det(img_id, cat_id, bbox, score):
    return {
        "image_id": img_id,
        "category_id": cat_id,
        "bbox": list(map(float, bbox)),
        "score": float(score),
    }


def stats_of(gt, dets):
    return CocoBboxEval(gt, dets).evaluate()


# ---------------------------------------------------------------- basics


def test_f1_single_perfect_match():
    """1 gt, 1 det at IoU=1: P=R=1 at every threshold -> all AP/AR = 1."""
    gt = make_gt([(1, 1, (10, 10, 50, 40))])
    s = stats_of(gt, [det(1, 1, (10, 10, 50, 40), 0.9)])
    assert s[0] == 1.0 and s[1] == 1.0 and s[2] == 1.0
    assert s[6] == 1.0 and s[8] == 1.0


def test_f2_duplicate_detection_is_fp_but_recall_saturates_first():
    """dup det on a matched gt is an FP, but rc=[1,1] means every recall
    knot samples the monotonized precision at index 0 (=1.0) -> AP=1."""
    gt = make_gt([(1, 1, (10, 10, 50, 40))])
    dets = [
        det(1, 1, (10, 10, 50, 40), 0.9),
        det(1, 1, (10, 10, 50, 40), 0.8),  # same box again -> FP
    ]
    s = stats_of(gt, dets)
    assert s[0] == 1.0 and s[8] == 1.0


def test_f3_fp_on_unannotated_image():
    """img2 has no annotations; its det is a pure FP ranked above the TP.
    rc=[0,1], pr=[0,.5] -> monotone [.5,.5]; all 101 knots sample .5.
    AP = 0.5 at every threshold; recall still reaches 1."""
    gt = make_gt([(1, 1, (10, 10, 50, 40))], n_images=2)
    dets = [
        det(2, 1, (100, 100, 30, 30), 0.95),  # FP (no gt in img2)
        det(1, 1, (10, 10, 50, 40), 0.9),  # TP
    ]
    s = stats_of(gt, dets)
    np.testing.assert_allclose(s[0], 0.5)
    np.testing.assert_allclose(s[1], 0.5)
    assert s[8] == 1.0


def test_f4_crowd_gt_absorbs_multiple_dets_without_fp():
    """crowd gt is ignored; BOTH dets inside it match it (crowd gts are
    re-matchable) and are ignored -> no FPs; the normal gt's TP gives
    AP=1 even though the ignored dets outrank it."""
    gt = make_gt(
        [
            (1, 1, (0, 0, 200, 200), 1),  # crowd
            (1, 1, (300, 300, 40, 40), 0),
        ]
    )
    dets = [
        det(1, 1, (10, 10, 30, 30), 0.99),  # inside crowd: inter/darea=1
        det(1, 1, (50, 50, 40, 40), 0.98),  # inside crowd too
        det(1, 1, (300, 300, 40, 40), 0.5),  # TP on the normal gt
    ]
    s = stats_of(gt, dets)
    assert s[0] == 1.0 and s[8] == 1.0


def test_f4b_crowd_only_dets_are_ignored_not_fp():
    """dets matching only the crowd produce neither TPs nor FPs; the
    unmatched normal gt -> recall 0, precision 0 -> AP=0 (not -1: npig=1)."""
    gt = make_gt(
        [
            (1, 1, (0, 0, 200, 200), 1),  # crowd
            (1, 1, (300, 300, 40, 40), 0),  # never detected
        ]
    )
    dets = [
        det(1, 1, (10, 10, 30, 30), 0.99),
        det(1, 1, (50, 50, 40, 40), 0.98),
    ]
    s = stats_of(gt, dets)
    assert s[0] == 0.0 and s[8] == 0.0


def test_f5_nonignored_gt_preferred_over_higher_iou_crowd():
    """det overlaps normal gt at IoU=2/3 and a crowd at crowd-IoU=1.0.
    For t <= .65 the normal gt must win (ignored gts sort last and the
    scan breaks once a non-ignored match is held): TP -> AP(t)=1 for
    t in {.50,.55,.60,.65}. For t >= .70 the normal gt is out of reach
    (2/3 < t) and the det matches the crowd -> ignored; unmatched gt ->
    AP(t)=0. AP@[.5:.95] = 4/10, AP50=1, AP75=0, AR100=0.4."""
    gt = make_gt(
        [
            (1, 1, (0, 0, 10, 10), 0),  # normal
            (1, 1, (0, 0, 30, 30), 1),  # crowd containing the det
        ]
    )
    # det [0,2,10,10]: inter with normal = 10*8=80, union=120 -> 2/3
    dets = [det(1, 1, (0, 2, 10, 10), 0.9)]
    s = stats_of(gt, dets)
    np.testing.assert_allclose(s[0], 0.4)
    assert s[1] == 1.0 and s[2] == 0.0
    np.testing.assert_allclose(s[8], 0.4)


# ------------------------------------------------------------ area ranges


def test_f6_boundary_area_counts_in_both_ranges():
    """gt/det area exactly 32^2=1024: the strict </> ignore test keeps it
    valid in BOTH 'small' [0,1024] and 'medium' [1024,9216]."""
    gt = make_gt([(1, 1, (0, 0, 32, 32))])
    s = stats_of(gt, [det(1, 1, (0, 0, 32, 32), 0.9)])
    assert s[3] == 1.0  # AP small
    assert s[4] == 1.0  # AP medium
    assert s[5] == -1.0  # AP large: no valid gt anywhere


def test_f7_unmatched_out_of_range_det_ignored_in_range_metric():
    """a large unmatched det outranking a small TP hurts AP@all (FP) but
    NOT AP_small (unmatched + out-of-range -> ignored)."""
    gt = make_gt([(1, 1, (0, 0, 20, 20))])  # area 400: small
    dets = [
        det(1, 1, (200, 200, 100, 100), 0.95),  # large FP, unmatched
        det(1, 1, (0, 0, 20, 20), 0.9),  # small TP
    ]
    s = stats_of(gt, dets)
    assert s[3] == 1.0  # AP small unaffected
    np.testing.assert_allclose(s[0], 0.5)  # AP all: FP then TP (F3 math)


def test_f15_area_ignored_gt_loses_to_nonignored_despite_higher_iou():
    """'small' range: det IoU vs small gt = 1024/1764 = .5805, vs the
    LARGE (area-ignored) gt = 1764/3025 = .5831 (higher). The break rule
    keeps the small gt's match at t=.50/.55; at t >= .60 neither reaches
    t and the det (area 1764, out of small range) is ignored unmatched.
    AP_small = AR_small = 2/10."""
    gt = make_gt(
        [
            (1, 1, (0, 0, 32, 32), 0),  # small: area 1024
            (1, 1, (0, 0, 55, 55), 0),  # area 3025: ignored in 'small'
        ]
    )
    dets = [det(1, 1, (0, 0, 42, 42), 0.9)]
    s = stats_of(gt, dets)
    np.testing.assert_allclose(s[3], 0.2)  # AP small
    np.testing.assert_allclose(s[9], 0.2)  # AR small


# ---------------------------------------------------------------- maxDets


def test_f8_maxdets1_truncates_to_top_scoring_miss():
    """top det misses, second hits: AR@1 sees only the miss (truncation
    happens before matching) -> 0; AR@10/100 recover the hit -> 1."""
    gt = make_gt([(1, 1, (0, 0, 40, 40))])
    dets = [
        det(1, 1, (500, 500, 40, 40), 0.95),  # miss
        det(1, 1, (0, 0, 40, 40), 0.9),  # hit
    ]
    s = stats_of(gt, dets)
    assert s[6] == 0.0  # AR maxDets=1
    assert s[7] == 1.0  # AR maxDets=10
    assert s[8] == 1.0  # AR maxDets=100
    np.testing.assert_allclose(s[0], 0.5)  # FP-then-TP precision math


def test_f9_det_ranked_beyond_100_is_dropped():
    """105 dets in one image-category; the only TP is ranked 103rd by
    score -> truncated by maxDets=100 -> AP=0, AR100=0."""
    gt = make_gt([(1, 1, (0, 0, 40, 40))])
    dets = [
        det(1, 1, (500 + 3 * i, 500, 2, 2), 0.9 - i * 1e-4)
        for i in range(102)
    ] + [det(1, 1, (0, 0, 40, 40), 0.5)]
    s = stats_of(gt, dets)
    assert s[0] == 0.0 and s[8] == 0.0


def test_f17_maxdets10_truncation_before_matching():
    """10 misses outrank the hit: AR@10=0 (hit truncated), AR@100=1."""
    gt = make_gt([(1, 1, (0, 0, 40, 40))])
    dets = [
        det(1, 1, (500 + 3 * i, 500, 2, 2), 0.9 - i * 1e-4) for i in range(10)
    ] + [det(1, 1, (0, 0, 40, 40), 0.5)]
    s = stats_of(gt, dets)
    assert s[7] == 0.0 and s[8] == 1.0


# --------------------------------------------------- interpolation details


def test_f10_searchsorted_left_at_exact_recall_knot():
    """2 gts; TP(.9), FP(.8), TP(.7): rc=[.5,.5,1], pr=[1,.5,2/3] ->
    monotone [1,2/3,2/3]. searchsorted(side='left') maps knot r=0.50 to
    index 0 (pr=1.0) — the tie at the knot takes the EARLIER precision —
    and r in (0.5,1] to 2/3. AP = (51*1 + 50*2/3)/101."""
    gt = make_gt([(1, 1, (0, 0, 40, 40)), (1, 1, (200, 0, 40, 40))])
    dets = [
        det(1, 1, (0, 0, 40, 40), 0.9),  # TP
        det(1, 1, (500, 500, 40, 40), 0.8),  # FP
        det(1, 1, (200, 0, 40, 40), 0.7),  # TP
    ]
    s = stats_of(gt, dets)
    np.testing.assert_allclose(s[0], (51 * 1.0 + 50 * (2 / 3)) / 101)


def test_f12_category_without_gt_stays_excluded():
    """cat 2 has dets but zero gt: its precision stays -1 and is excluded
    from the mean (NOT averaged as 0), so stats equal the cat-1-only F1."""
    gt = make_gt([(1, 1, (10, 10, 50, 40))], cats=(1, 2))
    dets = [
        det(1, 1, (10, 10, 50, 40), 0.9),
        det(1, 2, (100, 100, 30, 30), 0.99),  # FPs of a gt-less category
        det(1, 2, (300, 100, 30, 30), 0.98),
    ]
    s = stats_of(gt, dets)
    assert s[0] == 1.0 and s[1] == 1.0 and s[8] == 1.0


def test_f13_equal_scores_keep_sorted_image_order():
    """score tie between a TP (img1) and an FP (img2): stable mergesort
    keeps sorted-image-id order -> TP first -> pr=[1,.5] monotone [1,.5];
    knots r<=0.5 sample 1.0, r>0.5 sample 0 (index 2, out of range).
    AP = 51/101. A flipped (unstable) order would give 0.2525."""
    gt = make_gt(
        [(1, 1, (0, 0, 40, 40)), (2, 1, (0, 0, 40, 40))], n_images=2
    )
    dets = [
        det(1, 1, (0, 0, 40, 40), 0.5),  # TP, img 1
        det(2, 1, (500, 500, 40, 40), 0.5),  # FP, img 2, equal score
    ]
    s = stats_of(gt, dets)
    np.testing.assert_allclose(s[0], 51 / 101)


def test_f11_equal_iou_tie_matches_later_gt():
    """det1 has EXACTLY equal IoU (110/130) to gt0 and gt1; the strict
    `< best` continue means the tie goes to the LATER gt (gt1), leaving
    gt0 free for det2 (IoU 1.0) -> 2 TPs for t <= .80. For t in
    {.85,.90,.95}: det1 FP, det2 TP -> AP(t) = 51*.5/101 = .2525.
    AP@[.5:.95] = (7*1 + 3*.2525)/10 = .77575. A tie-to-earlier matcher
    would instead leave det2 matchable only to gt1 (IoU 5/7), dropping
    recall at t >= .75."""
    gt = make_gt([(1, 1, (0, 0, 12, 10)), (1, 1, (2, 0, 12, 10))])
    dets = [
        det(1, 1, (1, 0, 12, 10), 0.9),  # IoU .84615 to BOTH gts
        det(1, 1, (0, 0, 12, 10), 0.8),  # gt0 exactly; IoU 5/7 to gt1
    ]
    s = stats_of(gt, dets)
    np.testing.assert_allclose(s[0], (7 * 1.0 + 3 * (51 * 0.5 / 101)) / 10)
    assert s[1] == 1.0  # AP50
    assert s[2] == 1.0  # AP75 (.846 and 1.0 both >= .75)


def test_f16_empty_images_change_nothing():
    """(image, category) pairs with neither gt nor dt return None and are
    skipped: padding the images list leaves every stat identical."""
    anns = [(1, 1, (10, 10, 50, 40))]
    dets = [
        det(1, 1, (10, 12, 50, 40), 0.9),
        det(1, 1, (400, 300, 60, 60), 0.4),
    ]
    s1 = stats_of(make_gt(anns), dets)
    s2 = stats_of(make_gt(anns, n_images=50), dets)
    np.testing.assert_array_equal(s1, s2)


def test_f18_crowd_area_ignore_interaction():
    """a crowd gt is ignored regardless of range; its area ignore and
    crowd ignore must not cancel: det on the crowd is ignored in every
    range; the normal small gt drives AP_small=1 and AP@all=1."""
    gt = make_gt(
        [
            (1, 1, (0, 0, 100, 100), 1),  # crowd, large area
            (1, 1, (300, 300, 20, 20), 0),  # small normal
        ]
    )
    dets = [
        det(1, 1, (10, 10, 50, 50), 0.99),  # inside crowd
        det(1, 1, (300, 300, 20, 20), 0.9),  # TP
    ]
    s = stats_of(gt, dets)
    assert s[0] == 1.0 and s[3] == 1.0
    assert s[5] == -1.0  # no valid large gt: crowd doesn't count


def test_f19_precision_monotonization_from_right():
    """3 gts; TP FP TP TP: pr=[1,.5,2/3,.75] -> monotone [1,.75,.75,.75].
    rc=[1/3,1/3,2/3,1]. knots r<=1/3 -> index 0 (1.0); this includes
    r=.33 but NOT r=.34. AP = (34*1 + 67*.75)/101."""
    gt = make_gt(
        [
            (1, 1, (0, 0, 40, 40)),
            (1, 1, (200, 0, 40, 40)),
            (1, 1, (400, 0, 40, 40)),
        ]
    )
    dets = [
        det(1, 1, (0, 0, 40, 40), 0.9),
        det(1, 1, (600, 600, 40, 40), 0.8),  # FP
        det(1, 1, (200, 0, 40, 40), 0.7),
        det(1, 1, (400, 0, 40, 40), 0.6),
    ]
    s = stats_of(gt, dets)
    # searchsorted(rc, r, 'left'): r in [0, 1/3] -> idx 0; 1/3 is not a
    # representable knot (0.33 < 1/3 < 0.34), so knots 0.00..0.33 (34 of
    # them) sample pr[0]=1, the remaining 67 sample .75
    np.testing.assert_allclose(s[0], (34 * 1.0 + 67 * 0.75) / 101)


def test_f20_self_consistency_per_category_ap():
    """per_category_ap(iou_index=0) agrees with stats[1] when averaged
    over populated categories."""
    gt = make_gt(
        [(1, 1, (0, 0, 40, 40)), (1, 2, (200, 0, 40, 40))], cats=(1, 2)
    )
    dets = [
        det(1, 1, (0, 0, 40, 40), 0.9),
        det(1, 2, (600, 600, 40, 40), 0.8),  # cat2 FP only
    ]
    ev = CocoBboxEval(gt, dets)
    s = ev.evaluate()
    per_cat = ev.per_category_ap()
    vals = [v for v in per_cat.values() if v > -1]
    np.testing.assert_allclose(np.mean(vals), s[1])
    assert per_cat[1] == 1.0 and per_cat[2] == 0.0
