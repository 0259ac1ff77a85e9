"""fpcoor RoIAlign golden test vs a TF composition of the reference ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.ops.roi_align import roi_align_fpcoor

tf = pytest.importorskip("tensorflow")


def _tf_roi_align_fpcoor(feat, rois, stride, resolution):
    """Reference semantics (roi_pooling.py:93-177) rebuilt with TF2 ops."""
    boxes = tf.constant(rois / stride, tf.float32)
    image = tf.constant(feat[None])
    image = tf.pad(image, [[0, 0], [1, 1], [1, 1], [0, 0]], mode="SYMMETRIC")
    boxes = boxes + 1.0
    x0, y0, x1, y1 = tf.split(boxes, 4, axis=1)
    crop = resolution * 2
    spacing_w = (x1 - x0) / crop
    spacing_h = (y1 - y0) / crop
    h = tf.cast(tf.shape(image)[1] - 1, tf.float32)
    w = tf.cast(tf.shape(image)[2] - 1, tf.float32)
    nx0 = (x0 + spacing_w / 2 - 0.5) / w
    ny0 = (y0 + spacing_h / 2 - 0.5) / h
    nw = spacing_w * (crop - 1.0) / w
    nh = spacing_h * (crop - 1.0) / h
    tf_boxes = tf.concat([ny0, nx0, ny0 + nh, nx0 + nw], axis=1)
    crops = tf.image.crop_and_resize(
        image, tf_boxes, tf.zeros([len(rois)], tf.int32), [crop, crop]
    )
    return tf.nn.avg_pool2d(crops, 2, 2, "SAME").numpy()


def test_roi_align_fpcoor_matches_reference_composition():
    rng = np.random.RandomState(0)
    feat = rng.randn(25, 38, 8).astype(np.float32)
    rois = np.array(
        [[16.0, 32.0, 320.0, 240.0], [0.0, 0.0, 600.0, 399.0], [100.0, 50.0, 164.0, 114.0]],
        np.float32,
    )
    want = _tf_roi_align_fpcoor(feat, rois, 16, 7)
    got = np.asarray(roi_align_fpcoor(jnp.asarray(feat), jnp.asarray(rois), 16, 7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
