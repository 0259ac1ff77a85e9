"""FPN smoke tests + TF1-bilinear-upsample golden check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.config.config_factory import config_factory
from tf_eager_object_detection_tpu.models.model_factory import model_factory


def _small_cfg():
    cfg = dict(config_factory("pascal", "fpn"))
    cfg.update(
        {
            "rpn_proposal_train_pre_nms_sample_number": 512,
            "rpn_proposal_train_after_nms_sample_number": 128,
            "rpn_proposal_test_pre_nms_sample_number": 512,
            "rpn_proposal_test_after_nms_sample_number": 64,
            "roi_total_sample_number": 32,
            "roi_pos_sample_max_number": 8,
            "rpn_total_sample_number": 64,
            "rpn_pos_sample_max_number": 32,
            "max_objects_per_image": 10,
            "max_objects_per_class_per_image": 10,
            "tpu_image_buckets": [[128, 128]],
        }
    )
    return cfg


def test_resize_bilinear_tf1_matches_tf():
    tf = pytest.importorskip("tensorflow")
    from tf_eager_object_detection_tpu.models.fpn import resize_bilinear_tf1

    rng = np.random.RandomState(0)
    x = rng.randn(1, 5, 7, 3).astype(np.float32)
    for oh, ow in [(10, 14), (9, 13), (5, 7)]:
        # TF2 equivalent of tf.image.resize_bilinear(align_corners=False):
        want = tf.compat.v1.image.resize_bilinear(tf.constant(x), (oh, ow)).numpy()
        got = np.asarray(resize_bilinear_tf1(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fpn_predict_and_train():
    cfg = _small_cfg()
    det = model_factory("fpn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(128, 128, 3).astype(np.float32))
    out = det.predict(params, image, jnp.asarray([128, 128], jnp.int32))
    assert out.boxes.shape == (10, 4)
    assert np.isfinite(np.asarray(out.boxes)).all()

    images = image[None]
    hw = jnp.asarray([[128, 128]], jnp.int32)
    gt = jnp.asarray([[[10.0, 10.0, 60.0, 70.0], [30.0, 20.0, 110.0, 100.0]]])
    total, metrics = jax.jit(det.loss_fn)(
        params, images, hw, gt, jnp.asarray([[True, True]]),
        jnp.asarray([[4, 9]], jnp.int32), jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(total))
    for k in ("rpn_cls_loss", "rpn_reg_loss", "roi_cls_loss", "roi_reg_loss"):
        assert np.isfinite(float(metrics[k]))

    # gradients flow to neck + conv1 (trainable in FPN) but not to BN
    grads = jax.grad(lambda p: det.loss_fn(p, images, hw, gt,
        jnp.asarray([[True, True]]), jnp.asarray([[4, 9]], jnp.int32),
        jax.random.PRNGKey(1))[0])(params)
    assert np.abs(np.asarray(grads["neck"]["build_p5"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(grads["extractor"]["conv1_conv"]["kernel"])).sum() > 0


def test_fpn_im_detect():
    cfg = _small_cfg()
    det = model_factory("fpn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.randn(128, 128, 3).astype(np.float32))
    sm, deltas, rois, valid = det.im_detect(
        params, image, jnp.asarray([128, 128], jnp.int32), 1.5
    )
    assert sm.shape == (64, 21) and deltas.shape == (64, 21, 4)
    assert rois.shape == (64, 4)


def test_fpn_slim_backbone_variant():
    cfg = _small_cfg()
    cfg["tpu_fpn_backbone_style"] = "slim"
    det = model_factory("fpn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    layers = params["extractor"]
    # slim stack: conv2_block1 has a projection shortcut, later blocks don't
    assert "conv2_block1_0_conv" in layers
    assert "conv2_block2_0_conv" not in layers
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(128, 128, 3).astype(np.float32))
    out = det.predict(params, image, jnp.asarray([128, 128], jnp.int32))
    assert np.isfinite(np.asarray(out.boxes)).all()


def test_fpn_debug_apis():
    """predict_rpns / predict_rois (reference base_fpn_model.py:326-362)."""
    cfg = _small_cfg()
    det = model_factory("fpn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    h, w = cfg["tpu_image_buckets"][0]
    image = jnp.asarray(np.random.RandomState(0).randn(h, w, 3), jnp.float32)
    hw = jnp.asarray([h, w], jnp.int32)
    g = cfg["tpu_max_gt_boxes"]
    gt = np.zeros((g, 4), np.float32)
    gt[0] = [8.0, 8.0, 60.0, 70.0]
    gt[1] = [30.0, 40.0, 100.0, 110.0]
    mask = np.zeros((g,), bool); mask[:2] = True
    labels = np.zeros((g,), np.int32); labels[0] = 3; labels[1] = 9

    anchors, pos = det.predict_rpns(
        params, image, hw, jnp.asarray(gt), jnp.asarray(mask),
        jax.random.PRNGKey(1),
    )
    assert anchors.shape[0] == pos.shape[0]
    assert int(jnp.sum(pos)) > 0  # the gt boxes must match some anchors

    pt = det.predict_rois(
        params, image, hw, jnp.asarray(gt), jnp.asarray(mask),
        jnp.asarray(labels), jax.random.PRNGKey(2),
    )
    assert pt.rois.shape == (cfg["roi_total_sample_number"], 4)
    assert np.isfinite(np.asarray(pt.rois)).all()
    assert set(np.unique(np.asarray(pt.labels))) <= {0, 3, 9}


def test_per_level_prenms_prefilter_exact():
    """The per-level pre-NMS top-k prefilter (tpu_fpn_per_level_prenms)
    must produce EXACTLY the proposals of the unfiltered path — same
    boxes, same validity, bit-equal — including under score ties across
    and within levels (the global top-pre set is a subset of the union of
    per-level top-pre sets; tie order is level-major = original concat
    order)."""
    cfg = _small_cfg()
    det = model_factory("fpn", "resnet50", cfg)
    grids = tuple(
        (128 // s, 128 // s) for s in det.strides
    )
    anchors = det.anchors_for_grids(grids)
    a_total = anchors.shape[0]
    assert cfg["rpn_proposal_train_pre_nms_sample_number"] < a_total

    rng = np.random.RandomState(0)
    scores2 = rng.randn(a_total, 2).astype(np.float32)
    # inject ~300 score ties spread across the whole anchor range (and so
    # across levels): duplicate random rows onto other random rows
    src = rng.randint(0, a_total, 300)
    dst = rng.randint(0, a_total, 300)
    scores2[dst] = scores2[src]
    deltas = (rng.randn(a_total, 4) * 0.1).astype(np.float32)
    avalid = np.ones(a_total, bool)
    avalid[rng.randint(0, a_total, a_total // 7)] = False
    hw = jnp.asarray([128, 128], jnp.int32)

    args = (
        jnp.asarray(scores2), jnp.asarray(deltas), anchors,
        jnp.asarray(avalid), hw,
    )
    for training in (True, False):
        det.cfg["tpu_fpn_per_level_prenms"] = True
        rois_f, valid_f = det._proposals(*args, training=training, grids=grids)
        det.cfg["tpu_fpn_per_level_prenms"] = False
        rois_o, valid_o = det._proposals(*args, training=training, grids=grids)
        np.testing.assert_array_equal(
            np.asarray(valid_f), np.asarray(valid_o), err_msg=str(training)
        )
        np.testing.assert_array_equal(
            np.asarray(rois_f), np.asarray(rois_o), err_msg=str(training)
        )
