"""Direct unit tests for ops/losses.py and utils/visual.py.

Losses golden-checked against hand-computed values of the reference's
formulas (object_detection/model/losses.py:4-28); the visualization
helpers are checked for shape/dtype/pixel effects with the pure-numpy
path (no cv2 dependency assumed).
"""

import numpy as np
import jax.numpy as jnp

from tf_eager_object_detection_tpu.ops.losses import cls_loss, smooth_l1_loss
from tf_eager_object_detection_tpu.utils.visual import (
    draw_bboxes_with_labels,
    show_one_image,
    unpreprocess_image,
)


def test_cls_loss_matches_manual_softmax_ce():
    logits = jnp.asarray([[2.0, 1.0, 0.1], [0.5, 2.5, 0.0]])
    labels = jnp.asarray([0, 1])
    got = float(cls_loss(logits, labels))
    p = np.exp(np.asarray(logits))
    p /= p.sum(axis=1, keepdims=True)
    want = -np.mean([np.log(p[0, 0]), np.log(p[1, 1])])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # masked variant: the masked-out row must not contribute
    got_masked = float(cls_loss(logits, labels, jnp.asarray([True, False])))
    np.testing.assert_allclose(got_masked, -np.log(p[0, 0]), rtol=1e-6)


def test_smooth_l1_loss_reference_formula():
    """sigma-weighted smooth-L1 (losses.py:16-28): 0.5*(sigma*x)^2 for
    |x| < 1/sigma^2, |x| - 0.5/sigma^2 otherwise; inside weights gate the
    diff, outside weights gate the per-element loss; sum over dims then
    mean."""
    pred = jnp.asarray([[0.1, 2.0, -0.05, 0.0]])
    target = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    inw = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    outw = jnp.asarray([[1.0, 0.5, 1.0, 1.0]])
    sigma = 2.0
    got = float(smooth_l1_loss(pred, target, inw, outw, sigma=sigma, dim=(1,)))
    s2 = sigma * sigma

    def elem(x):
        return 0.5 * s2 * x * x if abs(x) < 1.0 / s2 else abs(x) - 0.5 / s2

    want = 1.0 * elem(0.1) + 0.5 * elem(2.0) + 1.0 * elem(-0.05) + 1.0 * 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_draw_and_unpreprocess_roundtrip():
    img = np.full((32, 48, 3), 60, np.uint8)
    out = draw_bboxes_with_labels(img, np.asarray([[5.0, 5.0, 20.0, 25.0]]), ["car"])
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # the rectangle drew something
    assert np.array_equal(img, np.full((32, 48, 3), 60, np.uint8))  # input untouched

    # caffe unpreprocess: BGR-mean-subtracted float -> uint8 RGB
    means = (103.939, 116.779, 123.68)
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[..., 0] = 200.0  # R
    rgb[..., 2] = 50.0  # B
    bgr = rgb[..., ::-1] - np.asarray(means, np.float32)
    back = unpreprocess_image(bgr, "caffe", means)
    assert back.dtype == np.uint8
    np.testing.assert_allclose(back[..., 0], 200, atol=1)
    np.testing.assert_allclose(back[..., 2], 50, atol=1)

    overlay = show_one_image(bgr, np.asarray([[1.0, 1.0, 3.0, 3.0]]), [7])
    assert overlay.shape == (4, 4, 3) and overlay.dtype == np.uint8
