"""Pallas NMS kernel (interpret mode on CPU) vs the XLA path and TF."""

import numpy as np
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.ops.nms import nms_keep_mask
from tf_eager_object_detection_tpu.ops.pallas.nms_pallas import pallas_nms_alive


def _rand(rng, n, size=500.0):
    x1 = rng.uniform(0, size - 1, n)
    y1 = rng.uniform(0, size - 1, n)
    w = rng.uniform(1, 150, n)
    h = rng.uniform(1, 150, n)
    return np.stack([x1, y1, np.minimum(x1 + w, size), np.minimum(y1 + h, size)], 1).astype(np.float32)


@pytest.mark.parametrize(
    "n,max_out,thr",
    # 3000 crosses the 2048-lane tail-chunk boundary (exercises the
    # chunked triangular tail's dynamic start + straddling first chunk)
    [(100, 40, 0.5), (300, 100, 0.7), (513, 513, 0.4), (3000, 800, 0.6)],
)
def test_pallas_matches_xla(n, max_out, thr):
    rng = np.random.RandomState(n)
    boxes = _rand(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sboxes = jnp.asarray(boxes[order])
    valid = jnp.ones((n,), bool)

    alive_p = np.asarray(
        pallas_nms_alive(sboxes, valid, thr, max_out, interpret=True)
    )
    alive_x, order_x = nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), valid, thr, max_out
    )
    # map XLA's (alive over its own sorted order) onto the same order
    alive_x = np.asarray(alive_x)
    order_x = np.asarray(order_x)
    ref = np.zeros(n, bool)
    ref[order_x[alive_x]] = True
    got = np.zeros(n, bool)
    got[order[alive_p]] = True
    np.testing.assert_array_equal(got, ref)


def test_pallas_respects_validity_and_clusters():
    rng = np.random.RandomState(1)
    centers = _rand(rng, 8)
    boxes = np.concatenate(
        [centers + rng.uniform(-3, 3, (8, 4)).astype(np.float32) for _ in range(30)]
    )
    scores = rng.uniform(0, 1, len(boxes)).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    valid = np.zeros(len(boxes), bool)
    valid[:150] = True  # only first 150 by original index are valid
    sboxes = jnp.asarray(boxes[order])
    svalid = jnp.asarray(valid[order])

    alive_p = np.asarray(pallas_nms_alive(sboxes, svalid, 0.5, 60, interpret=True))
    alive_x, order_x = nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 60
    )
    ref = np.zeros(len(boxes), bool)
    ref[np.asarray(order_x)[np.asarray(alive_x)]] = True
    got = np.zeros(len(boxes), bool)
    got[order[alive_p]] = True
    np.testing.assert_array_equal(got, ref)
    assert not got[~valid].any()


@pytest.mark.slow
@pytest.mark.parametrize(
    "n,max_out,thr",
    # engagement-size regressions (VERDICT r4 item 6): 12000 is the size at
    # which ops/nms.py auto-engages the kernel on TPU (the Faster R-CNN/FPN
    # train pre-NMS path); 6000 is the test/eval pre-NMS size (below the
    # engage threshold but the first size a user forcing impl='pallas' at
    # eval hits). Both cross many chunked-tail boundaries above the 3000-box
    # coverage of the fast tests — a Mosaic regression in the tail chunking
    # would land here, not at 3000.
    [(12000, 2000, 0.7), (6000, 1000, 0.7)],
)
def test_pallas_matches_xla_engagement_sizes(n, max_out, thr):
    rng = np.random.RandomState(n)
    # dense cluster mix: ~40% of boxes are jittered copies of 64 centers so
    # suppression chains actually propagate across chunk boundaries
    base = _rand(rng, n)
    centers = _rand(rng, 64)
    idx = rng.choice(n, n * 2 // 5, replace=False)
    base[idx] = centers[rng.randint(0, 64, len(idx))] + rng.uniform(
        -4, 4, (len(idx), 4)
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sboxes = jnp.asarray(base[order])
    valid = np.ones(n, bool)
    valid[rng.choice(n, n // 10, replace=False)] = False  # padded slots
    svalid = jnp.asarray(valid[order])

    alive_p = np.asarray(
        pallas_nms_alive(sboxes, svalid, thr, max_out, interpret=True)
    )
    alive_x, order_x = nms_keep_mask(
        jnp.asarray(base), jnp.asarray(scores), jnp.asarray(valid), thr, max_out
    )
    ref = np.zeros(n, bool)
    ref[np.asarray(order_x)[np.asarray(alive_x)]] = True
    got = np.zeros(n, bool)
    got[order[alive_p]] = True
    np.testing.assert_array_equal(got, ref)
