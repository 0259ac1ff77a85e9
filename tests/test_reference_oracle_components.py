"""Reference-as-oracle tests for the L2 COMPONENT layer (SURVEY C1/C2/C3/C5).

Executes the reference's own eager component classes — RegionProposal,
AnchorTarget, ProposalTarget, post_ops_prediction — under TF2 via
tf.compat.v1 (scatter_update on eager Variables, .numpy() mid-flow, and
Python-if-on-tensor all work eagerly) and asserts the fixed-shape JAX
ports produce the same numbers.

Randomized subsampling makes two of the components stochastic, so their
fixtures are engineered to stay on the DETERMINISTIC path:
- AnchorTarget: fg <= max_pos_samples and bg <= remaining quota, so both
  `tf.random_shuffle` branches are skipped (anchor_target.py:73-84).
- ProposalTarget: exactly max-pos-or-fewer fg and bg count EXACTLY equal
  to the remaining quota (the `elif ==: pass` branch,
  proposal_target.py:72-73), with fg rois FIRST in the roi array so the
  reference's `labels[idx]` class-column indexing (its documented bug,
  proposal_target.py:97-99 — deliberately not reproduced by the port,
  ops/sampling.py docstring) coincides with the correct `labels[fg_ind]`.

RegionProposal and post_ops_prediction are deterministic outright (the
reference's pre-NMS top-k is commented out, region_proposal.py:65-69, so
the port is driven with num_pre_nms >= A to match).
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_oracle import _load_ref  # noqa: E402


@pytest.fixture(scope="module")
def ref_utils():
    bbox_tf = _load_ref("object_detection/utils/bbox_tf.py")
    bbox_transform = _load_ref("object_detection/utils/bbox_transform.py")
    return {
        "pairwise_iou": bbox_tf["pairwise_iou"],
        "bboxes_clip_filter": bbox_tf["bboxes_clip_filter"],
        "bboxes_clip_filter_tf": bbox_tf["bboxes_clip_filter"],
        "bboxes_range_filter": bbox_tf["bboxes_range_filter"],
        "decode_bbox_with_mean_and_std": bbox_transform[
            "decode_bbox_with_mean_and_std"
        ],
        "encode_bbox_with_mean_and_std": bbox_transform[
            "encode_bbox_with_mean_and_std"
        ],
    }


def _grid_anchors(gh, gw, stride=16):
    from tf_eager_object_detection_tpu.core.anchors import (
        generate_anchor_base,
        shift_anchor_base,
    )

    base = generate_anchor_base(stride, (0.5, 1.0, 2.0), (2, 4))
    return shift_anchor_base(base, stride, gh, gw).astype(np.float32)


# ------------------------------------------------------------ C1 proposals


def test_region_proposal_matches_reference(ref_utils):
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.region_proposal import (
        region_proposal,
    )

    ref = _load_ref(
        "object_detection/model/region_proposal.py", inject=ref_utils
    )
    rng = np.random.RandomState(0)
    anchors = _grid_anchors(6, 8)  # 288 anchors on a 96x128 grid
    a = anchors.shape[0]
    deltas = (rng.randn(a, 4) * 0.4).astype(np.float32)
    scores = rng.uniform(0, 1, a).astype(np.float32)
    h, w = 90.0, 120.0

    rp = ref["RegionProposal"](
        num_anchors=6, num_post_nms_test=30, nms_iou_threshold=0.7
    )
    want = rp(
        (
            tf.constant(deltas),
            tf.constant(anchors),
            tf.constant(scores),
            tf.constant([h, w]),
        ),
        training=False,
    ).numpy()

    rois, valid = region_proposal(
        jnp.asarray(deltas),
        jnp.asarray(anchors),
        jnp.asarray(scores),
        jnp.ones((a,), bool),
        h,
        w,
        num_post_nms=30,
        nms_iou_threshold=0.7,
        num_pre_nms=None,  # the reference's pre-NMS top-k is commented out
    )
    got = np.asarray(rois)[np.asarray(valid)]
    assert got.shape == want.shape and len(got) > 0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


# ------------------------------------------------------- C5 post-prediction


def test_post_ops_prediction_matches_reference(ref_utils):
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.prediction import (
        post_ops_prediction,
    )

    ref = _load_ref("object_detection/model/prediction.py", inject=ref_utils)
    rng = np.random.RandomState(1)
    n, c = 40, 6
    h, w = 300.0, 400.0
    # rois with decent extents so the min-edge(=stride) filter passes often
    x1 = rng.uniform(0, 250, n)
    y1 = rng.uniform(0, 180, n)
    rois = np.stack(
        [x1, y1, x1 + rng.uniform(40, 140, n), y1 + rng.uniform(40, 120, n)], 1
    ).astype(np.float32)
    logits = rng.randn(n, c).astype(np.float32) * 2
    softmax = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    deltas = (rng.randn(n, c, 4) * 0.2).astype(np.float32)
    means, stds = [0.0, 0.0, 0.0, 0.0], [0.1, 0.1, 0.2, 0.2]

    rb, rc, rs = ref["post_ops_prediction"](
        tf.constant(softmax),
        tf.constant(deltas),
        tf.constant(rois),
        tf.constant([h, w]),
        means,
        stds,
        max_num_per_class=8,
        max_num_per_image=15,
        nms_iou_threshold=0.3,
        score_threshold=0.05,
        extractor_stride=16,
        num_classes=c,
    )
    assert rb is not None
    want = sorted(
        zip(
            rc.numpy().tolist(),
            (-rs.numpy()).tolist(),
            rb.numpy().tolist(),
        )
    )

    det = post_ops_prediction(
        jnp.asarray(softmax),
        jnp.asarray(deltas),
        jnp.asarray(rois),
        jnp.ones((n,), bool),
        h,
        w,
        target_means=tuple(means),
        target_stds=tuple(stds),
        max_num_per_class=8,
        max_num_per_image=15,
        nms_iou_threshold=0.3,
        score_threshold=0.05,
        min_edge=16.0,
        num_classes=c,
    )
    keep = np.asarray(det.valid)
    got = sorted(
        zip(
            np.asarray(det.labels)[keep].tolist(),
            (-np.asarray(det.scores)[keep]).tolist(),
            np.asarray(det.boxes)[keep].tolist(),
        )
    )
    assert len(got) == len(want) and len(got) > 0
    for (gl, gs, gb), (wl, ws, wb) in zip(got, want):
        assert gl == wl
        np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gb, wb, rtol=1e-4, atol=1e-3)


# -------------------------------------------------------- C2 anchor target


def test_anchor_target_matches_reference(ref_utils):
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.sampling import anchor_target

    ref = _load_ref(
        "object_detection/model/anchor_target.py", inject=ref_utils
    )
    rng = np.random.RandomState(2)
    anchors = _grid_anchors(6, 8)
    h, w = 90.0, 120.0
    gt = np.array(
        [
            [10.0, 12.0, 70.0, 60.0],
            [40.0, 30.0, 110.0, 85.0],
            [5.0, 50.0, 45.0, 88.0],
        ],
        np.float32,
    )
    at_ref = ref["AnchorTarget"](
        pos_iou_threshold=0.7,
        neg_iou_threshold=0.3,
        total_num_samples=256,  # quotas never bind -> deterministic
        max_pos_samples=128,
    )
    wl, wt, wi, wo = at_ref((tf.constant(gt), tf.constant([h, w]),
                             tf.constant(anchors)))

    got = anchor_target(
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.ones((len(gt),), bool),
        h,
        w,
        jax.random.PRNGKey(0),
        pos_iou_threshold=0.7,
        neg_iou_threshold=0.3,
        total_num_samples=256,
        max_pos_samples=128,
        target_means=(0.0, 0.0, 0.0, 0.0),
        target_stds=(1.0, 1.0, 1.0, 1.0),
    )
    labels = np.asarray(got.labels)
    # sanity: the deterministic path actually has work on both sides
    assert (labels == 1).sum() > 0 and (labels == 0).sum() > 0
    np.testing.assert_array_equal(labels, wl.numpy().astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(got.bbox_targets), wt.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(got.in_weights), wi.numpy())
    np.testing.assert_allclose(
        np.asarray(got.out_weights), wo.numpy(), rtol=1e-6, atol=1e-8
    )


# ------------------------------------------------------ C3 proposal target


def test_proposal_target_matches_reference(ref_utils):
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.sampling import proposal_target

    ref = _load_ref(
        "object_detection/model/proposal_target.py", inject=ref_utils
    )
    gt = np.array(
        [[20.0, 20.0, 120.0, 120.0], [200.0, 50.0, 330.0, 170.0]], np.float32
    )
    gt_labels = np.array([3, 7], np.int32)
    # 3 fg rois FIRST (IoU >= 0.5), then exactly 5 bg (0.1 <= IoU < 0.5),
    # then 2 ignored (IoU < 0.1): with total=8, max_pos=4 the reference hits
    # the deterministic `bg == quota` branch and its labels[idx] indexing
    # coincides with labels[fg_ind]
    rois = np.array(
        [
            [22.0, 18.0, 118.0, 118.0],   # fg gt0
            [205.0, 55.0, 335.0, 165.0],  # fg gt1
            [30.0, 30.0, 125.0, 128.0],   # fg gt0
            [60.0, 60.0, 180.0, 180.0],   # bg
            [150.0, 40.0, 260.0, 140.0],  # bg
            [0.0, 80.0, 90.0, 200.0],     # bg
            [250.0, 120.0, 400.0, 260.0], # bg
            [90.0, 0.0, 210.0, 90.0],     # bg
            [400.0, 300.0, 460.0, 360.0], # ignored
            [0.0, 300.0, 40.0, 340.0],    # ignored
        ],
        np.float32,
    )
    num_classes = 9
    pt_ref = ref["ProposalTarget"](
        num_classes=num_classes,
        pos_iou_threshold=0.5,
        neg_iou_threshold=0.1,
        total_num_samples=8,
        max_pos_samples=4,
    )
    w_rois, w_labels, w_targets, w_in, w_out = pt_ref(
        (tf.constant(rois), tf.constant(gt), tf.constant(gt_labels))
    )
    w_labels = w_labels.numpy()
    assert (w_labels > 0).sum() == 3  # the fixture hit the intended branch

    got = proposal_target(
        jnp.asarray(rois),
        jnp.ones((len(rois),), bool),
        jnp.asarray(gt),
        jnp.ones((len(gt),), bool),
        jnp.asarray(gt_labels),
        jax.random.PRNGKey(0),
        num_classes=num_classes,
        pos_iou_threshold=0.5,
        neg_iou_threshold=0.1,
        total_num_samples=8,
        max_pos_samples=4,
        target_means=(0.0, 0.0, 0.0, 0.0),
        target_stds=(0.1, 0.1, 0.2, 0.2),
    )
    # NOTE the reference defaults to stds (1,1,1,1); re-run it with the RoI
    # stds by re-instantiating (ctor arg) for the target comparison
    pt_ref2 = ref["ProposalTarget"](
        num_classes=num_classes,
        pos_iou_threshold=0.5,
        neg_iou_threshold=0.1,
        total_num_samples=8,
        max_pos_samples=4,
        target_means=[0.0, 0.0, 0.0, 0.0],
        target_stds=[0.1, 0.1, 0.2, 0.2],
    )
    w_rois, w_labels, w_targets, w_in, w_out = pt_ref2(
        (tf.constant(rois), tf.constant(gt), tf.constant(gt_labels))
    )

    def rowset(rois_, labels_, targets_, inw_):
        return sorted(
            zip(
                np.round(np.asarray(rois_), 3).tolist(),
                np.asarray(labels_).astype(int).tolist(),
                np.round(np.asarray(targets_), 3).tolist(),
                np.round(np.asarray(inw_), 3).tolist(),
            ),
            key=lambda t: (t[1], t[0]),
        )

    got_set = rowset(got.rois, got.labels, got.bbox_targets, got.in_weights)
    want_set = rowset(w_rois.numpy(), w_labels.numpy(), w_targets.numpy(),
                      w_in.numpy())
    assert got_set == want_set
    np.testing.assert_allclose(
        np.asarray(got.out_weights), w_out.numpy()
    )  # all ones in both


def test_proposal_target_strict_parity_reproduces_column_bug(ref_utils):
    """strict_class_column=True matches the reference's labels[idx]
    class-column indexing (proposal_target.py:97-99,114-117) ELEMENTWISE on a
    fixture where the bug is visible: fg rois are NOT first in the roi array,
    so labels[idx] (the idx-th roi's label in ORIGINAL order) differs from
    the selected fg roi's own label. Deterministic branches: fg count (2) <=
    max_pos (4), bg count (4) == quota (reference keeps tf.where ascending
    order in both)."""
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.sampling import proposal_target

    ref = _load_ref(
        "object_detection/model/proposal_target.py", inject=ref_utils
    )
    gt = np.array(
        [[20.0, 20.0, 120.0, 120.0], [200.0, 50.0, 330.0, 170.0]], np.float32
    )
    gt_labels = np.array([3, 7], np.int32)
    # original order: bg(->gt1), fg(gt0), bg(->gt0), fg(gt1), bg, bg
    # => reference writes fg slot 0's target at column labels[0] = 7 (roi 0's
    # argmax label) although the selected fg roi's own label is 3, and slot
    # 1's at labels[1] = 3 although its roi's label is 7 — columns swapped
    rois = np.array(
        [
            [240.0, 90.0, 370.0, 210.0],  # bg, argmax gt1 (label 7)
            [22.0, 18.0, 118.0, 118.0],   # fg gt0 (label 3)
            [60.0, 60.0, 180.0, 180.0],   # bg, argmax gt0 (label 3)
            [205.0, 55.0, 335.0, 165.0],  # fg gt1 (label 7)
            [90.0, 0.0, 210.0, 90.0],     # bg
            [150.0, 40.0, 260.0, 140.0],  # bg
        ],
        np.float32,
    )
    num_classes = 9
    kw = dict(
        num_classes=num_classes,
        pos_iou_threshold=0.5,
        neg_iou_threshold=0.1,
        total_num_samples=6,
        max_pos_samples=4,
    )
    pt_ref = ref["ProposalTarget"](
        target_means=[0.0, 0.0, 0.0, 0.0],
        target_stds=[0.1, 0.1, 0.2, 0.2],
        **kw,
    )
    w_rois, w_labels, w_targets, w_in, w_out = pt_ref(
        (tf.constant(rois), tf.constant(gt), tf.constant(gt_labels))
    )
    w_labels = w_labels.numpy()
    assert (w_labels > 0).sum() == 2  # deterministic-branch fixture
    # the bug IS visible here: fg slot 0 (roi 1, own label 3) has its
    # in-weights at class column 7
    w_in_c = w_in.numpy().reshape(-1, num_classes, 4)
    assert w_in_c[0, 7].sum() == 4.0 and w_in_c[0, 3].sum() == 0.0
    assert w_in_c[1, 3].sum() == 4.0 and w_in_c[1, 7].sum() == 0.0

    def run(strict):
        return proposal_target(
            jnp.asarray(rois),
            jnp.ones((len(rois),), bool),
            jnp.asarray(gt),
            jnp.ones((len(gt),), bool),
            jnp.asarray(gt_labels),
            jax.random.PRNGKey(0),
            target_means=(0.0, 0.0, 0.0, 0.0),
            target_stds=(0.1, 0.1, 0.2, 0.2),
            strict_class_column=strict,
            **kw,
        )

    got = run(strict=True)
    # strict mode matches the reference ELEMENTWISE (same slot order: fg
    # ascending then bg ascending) including the buggy columns
    np.testing.assert_allclose(np.asarray(got.rois), w_rois.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.labels), w_labels)
    np.testing.assert_allclose(
        np.asarray(got.bbox_targets), w_targets.numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got.in_weights), w_in.numpy())
    np.testing.assert_allclose(np.asarray(got.out_weights), w_out.numpy())

    # default mode uses the selected roi's own label: the fg in-weight
    # columns are 3 and 7 on the rois' OWN labels, i.e. different from the
    # reference's buggy placement
    got_def = run(strict=False)
    d_in = np.asarray(got_def.in_weights).reshape(-1, num_classes, 4)
    d_labels = np.asarray(got_def.labels)
    for i in range(len(d_labels)):
        if d_labels[i] > 0:
            assert d_in[i, d_labels[i]].sum() == 4.0
    # the (class column, target vector) PAIRING differs between the modes:
    # the reference places roi-with-label-3's encoding at column 7 (and vice
    # versa), the default places each fg roi's encoding at its own column
    def col_target_pairs(targets):
        t = np.asarray(targets).reshape(-1, num_classes, 4)
        return {
            (c, tuple(np.round(t[i, c], 3)))
            for i in range(t.shape[0])
            for c in np.nonzero(np.abs(t[i]).sum(1))[0]
        }

    strict_pairs = col_target_pairs(got.bbox_targets)
    default_pairs = col_target_pairs(got_def.bbox_targets)
    assert strict_pairs == col_target_pairs(w_targets.numpy())
    assert {c for c, _ in strict_pairs} == {c for c, _ in default_pairs} == {3, 7}
    assert strict_pairs != default_pairs
