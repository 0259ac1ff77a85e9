"""bfloat16 compute-path smoke: outputs close to the f32 path."""

import numpy as np
import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.config.config_factory import config_factory
from tf_eager_object_detection_tpu.models.model_factory import model_factory


def _cfg(dtype):
    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg.update(
        {
            "tpu_compute_dtype": dtype,
            "tpu_image_buckets": [[128, 128]],
            "rpn_proposal_train_pre_nms_sample_number": 256,
            "rpn_proposal_train_after_nms_sample_number": 64,
            "rpn_proposal_test_pre_nms_sample_number": 256,
            "rpn_proposal_test_after_nms_sample_number": 32,
            "roi_total_sample_number": 16,
            "rpn_total_sample_number": 32,
            "max_objects_per_image": 8,
            "max_objects_per_class_per_image": 8,
        }
    )
    return cfg


def test_bf16_forward_close_to_f32():
    det32 = model_factory("faster_rcnn", "resnet50", _cfg("float32"))
    det16 = model_factory("faster_rcnn", "resnet50", _cfg("bfloat16"))
    params = det32.init_params(jax.random.PRNGKey(0))  # same params both ways
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(128, 128, 3).astype(np.float32) * 40)
    hw = jnp.asarray([128, 128], jnp.int32)
    f32, _, _ = det32._backbone_rpn(params, img[None])
    f16, _, _ = det16._backbone_rpn(params, img[None])
    assert f16.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(f16, np.float32) - np.asarray(f32)) / (
        np.abs(np.asarray(f32)) + 1.0
    )
    assert rel.mean() < 0.05  # bf16 noise, not garbage

    out16 = det16.predict(params, img, hw)
    assert np.isfinite(np.asarray(out16.boxes)).all()
    assert np.asarray(out16.scores).dtype == np.float32


def test_bf16_train_step_finite():
    from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
    from tf_eager_object_detection_tpu.training.train_step import (
        TrainState,
        make_train_step,
    )

    cfg = _cfg("bfloat16")
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, params, "vgg16")
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(det, opt)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32) * 40)
    batch = (
        img,
        jnp.asarray([[128, 128]], jnp.int32),
        jnp.asarray([[[10.0, 10.0, 80.0, 90.0], [30.0, 40.0, 100.0, 120.0]]]),
        jnp.asarray([[True, True]]),
        jnp.asarray([[3, 7]], jnp.int32),
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay f32 (bf16 is compute-only)
    assert jax.tree_util.tree_leaves(state.params)[0].dtype == jnp.float32
