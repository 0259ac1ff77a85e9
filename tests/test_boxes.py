"""Golden tests for core box ops vs numpy twins of the reference semantics."""

import numpy as np
import jax.numpy as jnp

from tf_eager_object_detection_tpu.core import boxes as B
from tf_eager_object_detection_tpu.core import transforms as T
from tf_eager_object_detection_tpu.core import anchors as A


def _rand_boxes(rng, n, size=500.0):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, 200, n)
    h = rng.uniform(1, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def np_pairwise_iou(b1, b2):
    """Numpy twin of reference bbox_tf.pairwise_iou (+1 convention)."""
    n, m = b1.shape[0], b2.shape[0]
    out = np.zeros((n, m), np.float32)
    for i in range(n):
        for j in range(m):
            iw = min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0]) + 1
            ih = min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1]) + 1
            inter = max(0.0, iw) * max(0.0, ih)
            a1 = (b1[i, 2] - b1[i, 0] + 1) * (b1[i, 3] - b1[i, 1] + 1)
            a2 = (b2[j, 2] - b2[j, 0] + 1) * (b2[j, 3] - b2[j, 1] + 1)
            out[i, j] = inter / (a1 + a2 - inter) if inter > 0 else 0.0
    return out


def test_pairwise_iou_matches_reference_convention():
    rng = np.random.RandomState(0)
    b1 = _rand_boxes(rng, 13)
    b2 = _rand_boxes(rng, 7)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = np_pairwise_iou(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_gt_mask_zeroes_columns():
    rng = np.random.RandomState(1)
    b1 = _rand_boxes(rng, 5)
    b2 = _rand_boxes(rng, 4)
    mask = jnp.asarray([True, False, True, False])
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2), mask))
    assert np.all(got[:, 1] == 0) and np.all(got[:, 3] == 0)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(2)
    anchors = _rand_boxes(rng, 50)
    gts = _rand_boxes(rng, 50)
    means = (0.0, 0.0, 0.0, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    enc = T.encode_boxes(jnp.asarray(anchors), jnp.asarray(gts), means, stds)
    dec = np.asarray(T.decode_boxes(jnp.asarray(anchors), enc, means, stds))
    # decode uses x2 = x1 + w (reference convention) so x2/y2 come back +1.
    np.testing.assert_allclose(dec[:, :2], gts[:, :2], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(dec[:, 2:], gts[:, 2:] + 1.0, rtol=1e-4, atol=1e-2)


def test_decode_matches_manual():
    anchors = jnp.asarray([[0.0, 0.0, 15.0, 15.0]])
    deltas = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    dec = np.asarray(T.decode_boxes(anchors, deltas))
    # w = 16, cx = 8 -> x1 = 0, x2 = 16
    np.testing.assert_allclose(dec, [[0.0, 0.0, 16.0, 16.0]], atol=1e-5)


def test_clip_and_min_edge():
    boxes = jnp.asarray(
        [[-10.0, -5.0, 700.0, 400.0], [10.0, 10.0, 12.0, 300.0]]
    )
    clipped = np.asarray(B.clip_boxes(boxes, 375, 500))
    np.testing.assert_allclose(
        clipped, [[0.0, 0.0, 499.0, 374.0], [10.0, 10.0, 12.0, 300.0]]
    )
    m = np.asarray(B.min_edge_mask(jnp.asarray(clipped), 16.0))
    assert m.tolist() == [True, False]


def test_inside_image_mask():
    anchors = jnp.asarray(
        [[0.0, 0.0, 99.0, 99.0], [-1.0, 0.0, 50.0, 50.0], [0.0, 0.0, 100.0, 99.0]]
    )
    m = np.asarray(B.inside_image_mask(anchors, 100, 100))
    assert m.tolist() == [True, False, False]


def test_anchor_base_matches_py_faster_rcnn_table():
    # Known output of py-faster-rcnn generate_anchors() defaults.
    got = A.generate_anchor_base(16, (0.5, 1, 2), (8, 16, 32))
    want = np.array(
        [
            [-84.0, -40.0, 99.0, 55.0],
            [-176.0, -88.0, 191.0, 103.0],
            [-360.0, -184.0, 375.0, 199.0],
            [-56.0, -56.0, 71.0, 71.0],
            [-120.0, -120.0, 135.0, 135.0],
            [-248.0, -248.0, 263.0, 263.0],
            [-36.0, -80.0, 51.0, 95.0],
            [-80.0, -168.0, 95.0, 183.0],
            [-168.0, -344.0, 183.0, 359.0],
        ]
    )
    np.testing.assert_allclose(got, want)


def test_shift_anchor_base_layout():
    base = A.generate_anchor_base(16, (0.5, 1, 2), (8, 16, 32))
    anchors = A.shift_anchor_base(base, 16, 3, 4)
    assert anchors.shape == (3 * 4 * 9, 4)
    # cell (y=0, x=1) anchor 0 == base anchor 0 shifted by x += 16
    np.testing.assert_allclose(anchors[9], base[0] + [16, 0, 16, 0])
    # cell (y=1, x=0) anchor 2 == base anchor 2 shifted by y += 16
    np.testing.assert_allclose(anchors[4 * 9 + 2], base[2] + [0, 16, 0, 16])


def test_make_level_anchors():
    anchors = A.make_level_anchors(32, (1.0,), (0.5, 1.0, 2.0), 2, 2, 4)
    assert anchors.shape == (2 * 2 * 3, 4)
    # ratio=1 anchor at cell (0,0): centered at 0 with w = h = 32.
    np.testing.assert_allclose(anchors[1], [-16, -16, 16, 16])
    # ratio=0.5: w = 32*sqrt(.5), h = 32/sqrt(.5) — the reference's
    # enum_ratios return-swap quirk (anchor_generator.py:178), proven by the
    # executing-oracle test in test_reference_oracle.py
    w, h = 32 * np.sqrt(0.5), 32 / np.sqrt(0.5)
    np.testing.assert_allclose(
        anchors[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-6
    )
    # cell (y=0, x=1) centered at x=4
    np.testing.assert_allclose(anchors[3 + 1], [4 - 16, -16, 4 + 16, 16])


def test_valid_anchor_mask():
    m = np.asarray(A.valid_anchor_mask(3, 4, 2, 2, 3))
    m = m.reshape(3, 4, 2)
    assert m[:2, :3].all() and not m[2].any() and not m[:, 3].any()
