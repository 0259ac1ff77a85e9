"""crop_and_resize golden tests against TF's fused kernel (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.ops.roi_align import (
    crop_and_resize,
    max_pool_2x2_same,
    roi_crop_faster_rcnn,
    roi_crop_fpn,
)

tf = pytest.importorskip("tensorflow")


def _tf_crop(features, boxes, size):
    out = tf.image.crop_and_resize(
        tf.constant(features[None]),
        tf.constant(boxes),
        box_indices=tf.zeros([len(boxes)], tf.int32),
        crop_size=[size, size],
    )
    return out.numpy()


def test_crop_and_resize_matches_tf():
    rng = np.random.RandomState(0)
    feat = rng.randn(38, 50, 8).astype(np.float32)
    # normalized (y1, x1, y2, x2) incl. boxes partially outside [0, 1]
    boxes = np.array(
        [
            [0.1, 0.2, 0.5, 0.8],
            [0.0, 0.0, 1.0, 1.0],
            [-0.1, 0.3, 0.4, 1.2],
            [0.5, 0.5, 0.5, 0.5],
            [0.9, 0.9, 0.2, 0.3],  # inverted box
        ],
        np.float32,
    )
    for size in (7, 14):
        want = _tf_crop(feat, boxes, size)
        got = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), size))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_crop_size_one_matches_tf():
    rng = np.random.RandomState(1)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    boxes = np.array([[0.2, 0.2, 0.6, 0.6]], np.float32)
    want = _tf_crop(feat, boxes, 1)
    got = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_crop_faster_rcnn_matches_tf_pipeline():
    """Full RoiPoolingCropAndResize path vs TF ops composed the same way."""
    rng = np.random.RandomState(2)
    feat = rng.randn(38, 57, 16).astype(np.float32)
    h, w = feat.shape[:2]
    rois = np.array(
        [[10.0, 20.0, 300.0, 400.0], [0.0, 0.0, 911.0, 607.0], [100.0, 50.0, 180.0, 90.0]],
        np.float32,
    )
    stride = 16
    r = rois / stride
    boxes = np.stack(
        [r[:, 1] / (h - 1), r[:, 0] / (w - 1), r[:, 3] / (h - 1), r[:, 2] / (w - 1)],
        axis=1,
    )
    crops = _tf_crop(feat, boxes, 14)
    want = tf.nn.max_pool2d(tf.constant(crops), 2, 2, padding="SAME").numpy()
    got = np.asarray(
        roi_crop_faster_rcnn(jnp.asarray(feat), jnp.asarray(rois), stride, 7, True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # no-maxpool variant (resnet path): direct 7x7 crop
    want2 = _tf_crop(feat, boxes, 7)
    got2 = np.asarray(
        roi_crop_faster_rcnn(jnp.asarray(feat), jnp.asarray(rois), stride, 7, False)
    )
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-4)


def test_roi_crop_fpn_matches_tf_pipeline():
    rng = np.random.RandomState(3)
    feat = rng.randn(25, 25, 8).astype(np.float32)
    rois = np.array([[8.0, 16.0, 200.0, 150.0]], np.float32)
    img_h, img_w = 600.0, 800.0
    boxes = np.stack(
        [rois[:, 1] / img_h, rois[:, 0] / img_w, rois[:, 3] / img_h, rois[:, 2] / img_w],
        axis=1,
    )
    crops = _tf_crop(feat, boxes, 14)
    want = tf.nn.max_pool2d(tf.constant(crops), 2, 2, padding="SAME").numpy()
    got = np.asarray(roi_crop_fpn(jnp.asarray(feat), jnp.asarray(rois), img_h, img_w, 7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_crop_fpn_padded_bucket_matches_tf_unpadded():
    """ADVICE r1 (high): bucket padding must not stretch FPN sample coords.

    Golden: the reference (RoiPoolingCropAndResize2) crops from the UNPADDED
    map of valid extent ceil(image_dim/stride). Our map is the padded bucket
    grid; with level_stride passed, roi_crop_fpn must reproduce the unpadded
    result exactly even when the image fills only part of the bucket.
    """
    rng = np.random.RandomState(5)
    stride = 16
    img_h, img_w = 600.0, 800.0  # valid grid 38 x 50
    vh, vw = 38, 50
    ph, pw = 40, 64  # 640 x 1024 bucket at stride 16
    feat_valid = rng.randn(vh, vw, 8).astype(np.float32)
    feat_padded = np.zeros((ph, pw, 8), np.float32)
    feat_padded[:vh, :vw] = feat_valid
    rois = np.array(
        [
            [8.0, 16.0, 200.0, 150.0],
            [0.0, 0.0, 799.0, 599.0],  # whole image
            [500.0, 300.0, 790.0, 590.0],  # reaches the valid bottom-right
        ],
        np.float32,
    )
    boxes = np.stack(
        [rois[:, 1] / img_h, rois[:, 0] / img_w, rois[:, 3] / img_h, rois[:, 2] / img_w],
        axis=1,
    )
    crops = _tf_crop(feat_valid, boxes, 14)
    want = tf.nn.max_pool2d(tf.constant(crops), 2, 2, padding="SAME").numpy()
    got = np.asarray(
        roi_crop_fpn(
            jnp.asarray(feat_padded), jnp.asarray(rois), img_h, img_w, 7,
            level_stride=stride,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # sanity: when the image exactly fills the bucket, level_stride is a no-op
    full = np.asarray(
        roi_crop_fpn(
            jnp.asarray(feat_valid), jnp.asarray(rois), vh * 16.0, vw * 16.0, 7,
            level_stride=stride,
        )
    )
    base = np.asarray(
        roi_crop_fpn(jnp.asarray(feat_valid), jnp.asarray(rois), vh * 16.0, vw * 16.0, 7)
    )
    np.testing.assert_allclose(full, base, rtol=1e-5, atol=1e-5)


def test_max_pool_same_odd():
    x = jnp.arange(25.0).reshape(1, 5, 5, 1)
    got = np.asarray(max_pool_2x2_same(x))
    want = tf.nn.max_pool2d(tf.constant(np.asarray(x)), 2, 2, "SAME").numpy()
    np.testing.assert_allclose(got, want)


def test_gradient_flows_to_features_not_boxes():
    import jax

    feat = jnp.ones((8, 8, 2))
    rois = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])

    def loss(f):
        return roi_crop_faster_rcnn(f, rois, 16, 4, False).sum()

    g = jax.grad(loss)(feat)
    assert np.asarray(g).sum() > 0


def test_crop_and_resize_gather_path_matches_tf():
    """Large feature maps take the gather path; semantics must not change."""
    rng = np.random.RandomState(4)
    feat = rng.randn(96, 128, 8).astype(np.float32)  # 12288 cells > threshold
    boxes = np.array(
        [
            [0.05, 0.1, 0.6, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [-0.2, 0.4, 0.5, 1.3],
            [0.7, 0.7, 0.2, 0.2],
        ],
        np.float32,
    )
    for size in (7, 14):
        want = _tf_crop(feat, boxes, size)
        got = np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), size))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
