"""GRADIENT-level reference-as-oracle tests for the FPN model.

Complements test_reference_oracle_grad.py (Faster R-CNN): the reference's
own `ResnetV1Fpn` under tf.GradientTape is the ground truth for backward
passes through the FPN-specific surface — the 5-level RPN head flatten,
the 0.5/0.5 neck fusion with TF1 bilinear upsample (matmul form on our
side), and the level-assigned multi-level RoIAlign.

Both samplers are stochastic at model scale (tf.random_shuffle /
np.random.choice cannot be matched cross-framework), so the targets are
FIXED index-aligned arrays — which makes these tests also pin the
per-index anchor/score enumeration across the level concat
(base_fpn_model.py:189-200 vs FPNDetector._flatten_levels): a permuted
enumeration would pass the set-based im_detect oracle but fail here.

The reference source is treated as data: executed, never followed.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_oracle_model import (  # noqa: E402,F401
    FPN_IMAGE_HW,
    _fpn_image,
    fpn_pair,
    ref_ns,
)


def _check_grads(layers, ref_grads, our_grads, rel_l2_tol, rel_linf_tol):
    for li, (module, name) in enumerate(layers):
        for wi, wname in enumerate(("kernel", "bias")):
            want = ref_grads[2 * li + wi].numpy()
            got = np.asarray(our_grads[module][name][wname])
            assert got.shape == want.shape, (module, name, wname)
            denom = max(1e-12, float(np.linalg.norm(want)))
            rel_l2 = float(np.linalg.norm(got - want)) / denom
            scale = max(1e-12, float(np.abs(want).max()))
            rel_linf = float(np.abs(got - want).max()) / scale
            assert rel_l2 < rel_l2_tol and rel_linf < rel_linf_tol, (
                f"{module}/{name}/{wname}: relL2={rel_l2:.2e} "
                f"relLinf={rel_linf:.2e}"
            )


_NECK_LAYERS = [
    ("neck", n)
    for n in (
        "build_p5",
        "build_p4_reduce_dims",
        "build_p3_reduce_dims",
        "build_p2_reduce_dims",
        "build_p4",
        "build_p3",
        "build_p2",
    )
]
_EXTRACTOR_LAYERS = [
    ("extractor", n)
    for n in ("conv1_conv", "conv3_block1_1_conv", "conv5_block3_3_conv")
]


def _ref_layer(ref, module, name):
    if module == "extractor":
        return ref._extractor.get_layer(name)
    if module == "neck":
        return ref._neck.get_layer(name)
    if module == "rpn_head":
        return {
            "rpn_first_conv": ref._rpn_head._rpn_conv,
            "rpn_score_conv": ref._rpn_head._rpn_score_conv,
            "rpn_bbox_conv": ref._rpn_head._rpn_bbox_conv,
        }[name]
    return ref._roi_head.get_layer(name)


def _ref_vars(ref, layers):
    out = []
    for module, name in layers:
        lyr = _ref_layer(ref, module, name)
        out += [lyr.kernel, lyr.bias]
    return out


def test_fpn_rpn_gradients_match(fpn_pair):
    """d(rpn_cls + rpn_reg)/dW with FIXED anchor targets, through all 5
    pyramid levels of the RPN head, the neck, and the extractor
    (base_fpn_model.py:227-235 with the sampler's outputs pinned)."""
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.losses import (
        cls_loss,
        smooth_l1_loss,
    )

    ref, det, params = fpn_pair
    img = _fpn_image()

    # index-aligned fixed anchor targets over the full level concat
    a_total = det.anchors_for_grids(
        tuple(
            (FPN_IMAGE_HW[0] // s, FPN_IMAGE_HW[1] // s)
            for s in (4, 8, 16, 32, 64)
        )
    ).shape[0]
    rs = np.random.RandomState(31)
    labels = np.full(a_total, -1, np.int32)
    picks = rs.choice(a_total, 200, replace=False)
    labels[picks[:100]] = 1
    labels[picks[100:]] = 0
    tgts = np.zeros((a_total, 4), np.float32)
    inw = np.zeros((a_total, 4), np.float32)
    outw = np.zeros((a_total, 4), np.float32)
    tgts[picks[:100]] = rs.randn(100, 4)
    inw[picks[:100]] = 1.0
    outw[picks] = 1.0 / 200.0

    layers = (
        _EXTRACTOR_LAYERS
        + _NECK_LAYERS
        + [
            ("rpn_head", "rpn_first_conv"),
            ("rpn_head", "rpn_score_conv"),
            ("rpn_head", "rpn_bbox_conv"),
        ]
    )

    with tf.GradientTape() as tape:
        c_list = ref._extractor(tf.constant(img), training=False)
        p_list = ref._neck(c_list, training=False)
        all_scores, all_bbox = ref._get_fpn_head_results(p_list)
        assert int(all_scores.shape[0]) == a_total
        rcl, rrl = ref._get_rpn_loss(
            all_scores, all_bbox, tf.constant(labels), tf.constant(tgts),
            tf.constant(inw), tf.constant(outw),
        )
        loss = rcl + rrl
    ref_grads = tape.gradient(loss, _ref_vars(ref, layers))

    def f(p):
        _, score_list, bbox_list = det._backbone_neck_rpn(p, jnp.asarray(img))
        scores2, deltas = det._flatten_levels(
            tuple(s[0] for s in score_list), tuple(b[0] for b in bbox_list)
        )
        out = cls_loss(
            scores2, jnp.asarray(labels), jnp.asarray(labels) >= 0
        ) + smooth_l1_loss(
            deltas, jnp.asarray(tgts), jnp.asarray(inw), jnp.asarray(outw),
            sigma=det.cfg["rpn_sigma"], dim=(0, 1),
        )
        return out

    our_loss, our_grads = jax.value_and_grad(f)(params)
    np.testing.assert_allclose(
        float(our_loss), float(loss), rtol=5e-4, atol=1e-5
    )
    # conditioned O(10) pyramid features; resnet50 + neck backward depth
    _check_grads(layers, ref_grads, our_grads, 2e-3, 5e-3)


def test_fpn_roi_branch_gradients_match(fpn_pair):
    """d(roi_cls + roi_reg)/dW with FIXED rois + targets through the
    level-assigned multi-level RoIAlign (base_fpn_model.py:244-255,
    303-326) — the backward of our einsum crop vs the reference's
    per-level crop_and_resize, plus the 1024-wide fc head. Roi sizes are
    spread so levels 2-4 are all populated (level 5 needs sqrt(wh) >= 448,
    larger than the 256x320 fixture image; the reference skips empty
    levels). The reference level-groups rois and gathers the targets by
    selected_idx; both losses are permutation-invariant so ours keeps
    input order."""
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.losses import (
        cls_loss,
        smooth_l1_loss,
    )

    ref, det, params = fpn_pair
    img = _fpn_image()
    num_classes = det.num_classes
    H, W = FPN_IMAGE_HW

    rs = np.random.RandomState(13)
    rois = []
    # level = floor(4 + log2(sqrt(wh)/224)) clamped to [2, 5]: sizes 30-90
    # -> level 2, 120-200 -> level 3, 228-250 -> level 4 (fits 256x320)
    for size_lo, size_hi in ((30, 90), (120, 200), (228, 250)):
        for _ in range(20):
            w = rs.uniform(size_lo, size_hi)
            h = rs.uniform(size_lo, size_hi)
            x1 = rs.uniform(0, max(1.0, W - 1 - w))
            y1 = rs.uniform(0, max(1.0, H - 1 - h))
            rois.append([x1, y1, min(x1 + w, W - 1.0), min(y1 + h, H - 1.0)])
    rois = np.asarray(rois, np.float32)
    R = len(rois)
    labels = rs.randint(0, num_classes, R).astype(np.int32)
    tgt = np.zeros((R, num_classes, 4), np.float32)
    inw = np.zeros((R, num_classes, 4), np.float32)
    for i, lbl in enumerate(labels):
        if lbl > 0:
            tgt[i, lbl] = rs.randn(4)
            inw[i, lbl] = 1.0
    outw = inw / R
    tgt, inw, outw = (a.reshape(R, -1) for a in (tgt, inw, outw))

    layers = _EXTRACTOR_LAYERS + _NECK_LAYERS + [
        ("roi_head", n)
        for n in ("fc1", "fc2", "roi_head_score", "roi_head_bboxes")
    ]

    image_shape = tf.constant([float(H), float(W)])
    with tf.GradientTape() as tape:
        c_list = ref._extractor(tf.constant(img), training=False)
        p_list = ref._neck(c_list, training=False)
        rois_list, selected_idx = ref._assign_levels(tf.constant(rois))
        roi_features = ref._get_roi_features(rois_list, p_list, image_shape)
        roi_score, roi_deltas = ref._roi_head(roi_features, training=False)
        sel = selected_idx.numpy().astype(np.int64)
        assert len(sel) == R
        rcl, rrl = ref._get_roi_loss(
            roi_score, roi_deltas, tf.constant(labels[sel]),
            tf.constant(tgt[sel]), tf.constant(inw[sel]),
            tf.constant(outw[sel]),
        )
        loss = rcl + rrl
    ref_grads = tape.gradient(loss, _ref_vars(ref, layers))

    def f(p):
        p_list, _, _ = det._backbone_neck_rpn(p, jnp.asarray(img))
        n_lvl = det.max_level - det.min_level + 1
        feats = det._roi_features(
            tuple(pl[0] for pl in p_list[:n_lvl]),
            jnp.asarray(rois),
            jnp.asarray([H, W], jnp.int32),
            training=True,
        )
        scores, deltas = det.roi_head.apply(
            {"params": p["roi_head"]}, feats, train=False
        )
        out = cls_loss(scores, jnp.asarray(labels)) + smooth_l1_loss(
            deltas, jnp.asarray(tgt), jnp.asarray(inw), jnp.asarray(outw),
            sigma=det.cfg["roi_sigma"], dim=(1,),
        )
        return out

    our_loss, our_grads = jax.value_and_grad(f)(params)
    np.testing.assert_allclose(
        float(our_loss), float(loss), rtol=5e-4, atol=1e-5
    )
    # measured noise profile (no systematic error): biases/near-loss layers
    # match to 1e-6; relL2 grows with backward depth to 2.4e-3 at conv1
    # (the crop gather sparsifies gradients vs the RPN path's dense maps)
    _check_grads(layers, ref_grads, our_grads, 4e-3, 6e-3)
