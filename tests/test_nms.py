"""NMS golden tests against TF's fused `tf.image.non_max_suppression` (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.ops.nms import non_max_suppression

tf = pytest.importorskip("tensorflow")


def _rand(rng, n, size=500.0):
    x1 = rng.uniform(0, size - 1, n)
    y1 = rng.uniform(0, size - 1, n)
    w = rng.uniform(1, 150, n)
    h = rng.uniform(1, 150, n)
    b = np.stack([x1, y1, np.minimum(x1 + w, size), np.minimum(y1 + h, size)], 1)
    return b.astype(np.float32)


def _tf_nms(boxes, scores, max_out, thr):
    # TF NMS expects [y1, x1, y2, x2]-agnostic boxes (it only needs a
    # consistent order); reference passes xyxy directly.
    idx = tf.image.non_max_suppression(
        tf.constant(boxes), tf.constant(scores), max_out, iou_threshold=thr
    )
    return idx.numpy()


@pytest.mark.parametrize("n,max_out,thr", [(60, 20, 0.7), (400, 100, 0.5), (1000, 300, 0.7)])
def test_nms_matches_tf(n, max_out, thr):
    rng = np.random.RandomState(n)
    boxes = _rand(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    want = _tf_nms(boxes, scores, max_out, thr)
    idx, valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), None, max_out, thr
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_nms_clustered_boxes():
    # heavy overlap: many near-duplicate boxes around few centers
    rng = np.random.RandomState(7)
    centers = _rand(rng, 12)
    boxes = np.concatenate(
        [centers + rng.uniform(-4, 4, (12, 4)).astype(np.float32) for _ in range(40)]
    )
    scores = rng.uniform(0, 1, len(boxes)).astype(np.float32)
    want = _tf_nms(boxes, scores, 50, 0.6)
    idx, valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), None, 50, 0.6
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_nms_respects_validity_mask():
    rng = np.random.RandomState(3)
    boxes = _rand(rng, 100)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:40] = True
    want = _tf_nms(boxes[:40], scores[:40], 20, 0.7)
    idx, valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 20, 0.7
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_nms_all_invalid():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    idx, valid = non_max_suppression(
        boxes, scores, jnp.zeros((16,), bool), 8, 0.5
    )
    assert not np.asarray(valid).any()


def test_nms_block_boundary():
    # exercise multiple blocks with block smaller than K
    rng = np.random.RandomState(11)
    boxes = _rand(rng, 700)
    scores = rng.uniform(0, 1, 700).astype(np.float32)
    want = _tf_nms(boxes, scores, 700, 0.4)
    idx, valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), None, 700, 0.4, block=128
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_nms_alive_sorted_matches_unsorted_path():
    from tf_eager_object_detection_tpu.ops.nms import nms_alive_sorted

    rng = np.random.RandomState(5)
    boxes = _rand(rng, 200)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    alive = np.asarray(
        nms_alive_sorted(jnp.asarray(boxes[order]), jnp.ones(200, bool), 0.5, 80)
    )
    got = sorted(order[alive].tolist())
    want = sorted(_tf_nms(boxes, scores, 80, 0.5).tolist())
    assert got == want


def test_nms_training_scale_matches_tf():
    """12k boxes / 2000 kept — the exact training-path NMS size."""
    rng = np.random.RandomState(12)
    boxes = _rand(rng, 12000, size=1000.0)
    scores = rng.uniform(0, 1, 12000).astype(np.float32)
    want = _tf_nms(boxes, scores, 2000, 0.7)
    idx, valid = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), None, 2000, 0.7
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)
