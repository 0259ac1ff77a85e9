"""Rule tests for anchor_target / proposal_target (reference semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.core.boxes import pairwise_iou
from tf_eager_object_detection_tpu.ops.sampling import anchor_target, proposal_target


def _grid_anchors(n=20, size=400.0, box=32.0):
    xs = np.linspace(0, size - box, n)
    ys = np.linspace(0, size - box, n)
    out = []
    for y in ys:
        for x in xs:
            out.append([x, y, x + box, y + box])
    return np.asarray(out, np.float32)


def test_anchor_target_label_rules():
    anchors = jnp.asarray(_grid_anchors())
    gt = jnp.asarray([[100.0, 100.0, 140.0, 140.0], [0, 0, 0, 0]], jnp.float32)
    gt_mask = jnp.asarray([True, False])
    out = anchor_target(
        anchors, gt, gt_mask, 400, 400, jax.random.PRNGKey(0),
        total_num_samples=256, max_pos_samples=128,
    )
    labels = np.asarray(out.labels)
    iou = np.asarray(pairwise_iou(anchors, gt[:1]))[:, 0]
    # anchors with IoU >= 0.7 are fg
    assert (labels[iou >= 0.7] == 1).all()
    # the gt-argmax anchor is fg even if below 0.7
    assert labels[np.argmax(iou)] == 1
    # sampled bg anchors all have IoU < 0.3
    assert (iou[labels == 0] < 0.3).all()
    # counts: <= 256 participating
    assert ((labels >= 0).sum()) <= 256
    # outside-image anchors would be -1 (here all are inside)
    # out weights = 1/num_examples on participants
    n_ex = (labels >= 0).sum()
    ow = np.asarray(out.out_weights)
    np.testing.assert_allclose(ow[labels >= 0], 1.0 / n_ex, rtol=1e-6)
    assert (ow[labels < 0] == 0).all()
    # in weights only on positives
    iw = np.asarray(out.in_weights)
    assert (iw[labels == 1] == 1).all() and (iw[labels != 1] == 0).all()


def test_anchor_target_outside_anchors_ignored():
    anchors = jnp.asarray(
        [[-10.0, 0.0, 30.0, 30.0], [0.0, 0.0, 30.0, 30.0], [380.0, 380.0, 420.0, 400.0]]
    )
    gt = jnp.asarray([[0.0, 0.0, 30.0, 30.0]])
    out = anchor_target(
        anchors, gt, jnp.asarray([True]), 400, 400, jax.random.PRNGKey(0)
    )
    labels = np.asarray(out.labels)
    assert labels[0] == -1 and labels[2] == -1  # outside image
    assert labels[1] == 1  # exact match


def test_anchor_target_fg_cap():
    # 300 anchors all overlapping the gt heavily -> fg capped at max_pos
    base = np.asarray([[100, 100, 160, 160]], np.float32)
    jitter = np.random.RandomState(0).uniform(-2, 2, (300, 4)).astype(np.float32)
    anchors = jnp.asarray(base + jitter)
    gt = jnp.asarray([[100.0, 100.0, 160.0, 160.0]])
    out = anchor_target(
        anchors, gt, jnp.asarray([True]), 400, 400, jax.random.PRNGKey(1),
        total_num_samples=64, max_pos_samples=16,
    )
    labels = np.asarray(out.labels)
    assert (labels == 1).sum() == 16
    assert (labels >= 0).sum() <= 64


def test_proposal_target_composition():
    rng = np.random.RandomState(0)
    # 40 fg rois near gt, 200 bg rois far away
    fg = np.asarray([[100, 100, 160, 160]], np.float32) + rng.uniform(-5, 5, (40, 4)).astype(np.float32)
    bg = rng.uniform(200, 380, (200, 2)).astype(np.float32)
    bg = np.concatenate([bg, bg + 30], axis=1)
    rois = jnp.asarray(np.concatenate([fg, bg]))
    roi_mask = jnp.ones((240,), bool)
    gt = jnp.asarray([[100.0, 100.0, 160.0, 160.0]])
    gt_mask = jnp.asarray([True])
    gt_labels = jnp.asarray([7], jnp.int32)
    out = proposal_target(
        rois, roi_mask, gt, gt_mask, gt_labels, jax.random.PRNGKey(0),
        num_classes=21, total_num_samples=128, max_pos_samples=32,
    )
    labels = np.asarray(out.labels)
    assert labels.shape == (128,)
    n_fg = (labels > 0).sum()
    assert n_fg == 32  # capped
    assert (labels[:n_fg] == 7).all()  # fg slots first, with the gt's class
    assert (labels[n_fg:] == 0).all()  # bg after
    # class-specific targets: only fg rows, only class-7 columns
    bt = np.asarray(out.bbox_targets).reshape(128, 21, 4)
    iw = np.asarray(out.in_weights).reshape(128, 21, 4)
    assert (iw[:n_fg, 7] == 1).all()
    assert iw[:n_fg].sum() == n_fg * 4
    assert iw[n_fg:].sum() == 0
    assert np.abs(bt[:n_fg, 7]).sum() > 0
    mask7 = np.ones(21, bool)
    mask7[7] = False
    assert np.abs(bt[:, mask7]).sum() == 0
    assert (np.asarray(out.out_weights) == 1).all()


def test_proposal_target_bg_refill_with_replacement():
    # only 3 bg candidates, no fg -> 128 slots must be filled by resampling
    bg = jnp.asarray(
        [[200.0, 200.0, 240.0, 240.0], [300.0, 300.0, 340.0, 340.0], [10.0, 10.0, 50.0, 50.0]]
    )
    roi_mask = jnp.ones((3,), bool)
    gt = jnp.asarray([[100.0, 100.0, 160.0, 160.0]])
    out = proposal_target(
        bg, roi_mask, gt, jnp.asarray([True]), jnp.asarray([5], jnp.int32),
        jax.random.PRNGKey(0), num_classes=21,
    )
    labels = np.asarray(out.labels)
    assert (labels == 0).all()
    rois_out = np.asarray(out.rois)
    # every output roi is one of the three candidates
    dists = np.abs(rois_out[:, None, :] - np.asarray(bg)[None]).sum(-1)
    assert (dists.min(1) < 1e-5).all()
    # all three candidates appear (with-replacement resample over 128 slots)
    assert (dists.min(0) < 1e-5).all()


def test_proposal_target_reproducible():
    rng = np.random.RandomState(1)
    rois = jnp.asarray(rng.uniform(0, 350, (100, 2)))
    rois = jnp.concatenate([rois, rois + 40], axis=1).astype(jnp.float32)
    gt = jnp.asarray([[50.0, 50.0, 120.0, 120.0]])
    args = (rois, jnp.ones((100,), bool), gt, jnp.asarray([True]),
            jnp.asarray([3], jnp.int32))
    a = proposal_target(*args, jax.random.PRNGKey(42), num_classes=21)
    b = proposal_target(*args, jax.random.PRNGKey(42), num_classes=21)
    np.testing.assert_array_equal(np.asarray(a.rois), np.asarray(b.rois))
    c = proposal_target(*args, jax.random.PRNGKey(43), num_classes=21)
    assert not np.array_equal(np.asarray(a.rois), np.asarray(c.rois))
