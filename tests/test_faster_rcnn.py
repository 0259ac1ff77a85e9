"""End-to-end smoke tests: Faster R-CNN predict + train step on tiny images."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.config.config_factory import config_factory
from tf_eager_object_detection_tpu.models.model_factory import model_factory
from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
from tf_eager_object_detection_tpu.training.train_step import (
    TrainState,
    make_train_step,
)


def _small_config():
    cfg = dict(config_factory("pascal", "faster_rcnn"))
    # shrink proposal counts so CPU tests stay fast
    cfg["rpn_proposal_train_pre_nms_sample_number"] = 600
    cfg["rpn_proposal_train_after_nms_sample_number"] = 200
    cfg["rpn_proposal_test_pre_nms_sample_number"] = 300
    cfg["rpn_proposal_test_after_nms_sample_number"] = 50
    cfg["roi_total_sample_number"] = 32
    cfg["roi_pos_sample_max_number"] = 8
    cfg["rpn_total_sample_number"] = 64
    cfg["rpn_pos_sample_max_number"] = 32
    cfg["max_objects_per_image"] = 10
    cfg["max_objects_per_class_per_image"] = 10
    return cfg


def _batch(rng, b=1, h=160, w=160, g=5):
    images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    image_hw = jnp.asarray([[h - 16, w - 32]] * b, jnp.int32)
    x1 = rng.uniform(0, 80, (b, g)).astype(np.float32)
    y1 = rng.uniform(0, 80, (b, g)).astype(np.float32)
    gt = np.stack(
        [x1, y1, x1 + rng.uniform(10, 60, (b, g)), y1 + rng.uniform(10, 60, (b, g))],
        axis=-1,
    ).astype(np.float32)
    gt_mask = np.zeros((b, g), bool)
    gt_mask[:, :3] = True
    gt_labels = rng.randint(1, 21, (b, g)).astype(np.int32)
    return images, image_hw, jnp.asarray(gt), jnp.asarray(gt_mask), jnp.asarray(gt_labels)


@pytest.mark.parametrize("backbone", ["vgg16", "resnet50"])
def test_predict_shapes(backbone):
    cfg = _small_config()
    det = model_factory("faster_rcnn", backbone, cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(160, 160, 3).astype(np.float32))
    out = det.predict(params, image, jnp.asarray([144, 128], jnp.int32))
    assert out.boxes.shape == (10, 4)
    assert out.labels.shape == (10,)
    assert out.scores.shape == (10,)
    v = np.asarray(out.valid)
    b = np.asarray(out.boxes)
    assert np.isfinite(b).all()
    # valid detections stay inside the valid image region
    if v.any():
        assert b[v, 2].max() <= 127.0 + 1e-3
        assert b[v, 3].max() <= 143.0 + 1e-3


def test_train_step_decreases_loss_and_freezes():
    cfg = _small_config()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, params, "vgg16")
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(det, opt)
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    frozen_before = np.asarray(
        state.params["extractor"]["block1_conv1"]["kernel"]
    ).copy()
    trainable_before = np.asarray(
        state.params["extractor"]["block3_conv1"]["kernel"]
    ).copy()

    metrics = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    for k in ("rpn_cls_loss", "rpn_reg_loss", "roi_cls_loss", "roi_reg_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 3

    frozen_after = np.asarray(state.params["extractor"]["block1_conv1"]["kernel"])
    trainable_after = np.asarray(state.params["extractor"]["block3_conv1"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)
    assert np.abs(trainable_after - trainable_before).max() > 0


def test_im_detect_api():
    cfg = _small_config()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(160, 160, 3).astype(np.float32))
    sm, deltas, rois, valid = det.im_detect(
        params, image, jnp.asarray([160, 160], jnp.int32), 2.0
    )
    assert sm.shape == (50, 21)
    assert deltas.shape == (50, 21, 4)
    assert rois.shape == (50, 4)
    # rois are divided by scale
    assert float(np.asarray(rois).max()) <= 160.0 / 2.0 + 1.0


def test_adam_optimizer_option():
    """Reference trainer offers Momentum or Adam (train.py:43-50); the adam
    path must step, keep frozen params frozen, and reject unknown names."""
    cfg = _small_config()
    cfg["tpu_image_buckets"] = [[64, 64]]
    cfg["tpu_max_gt_boxes"] = 4
    cfg["optimizer_type"] = "adam"
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    frozen_before = np.array(params["extractor"]["block1_conv1"]["kernel"])
    opt = make_optimizer(cfg, params, "vgg16")
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(det, opt)
    rng = np.random.RandomState(0)
    batch = _batch(rng, h=64, w=64, g=4)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))
    got = np.asarray(state.params["extractor"]["block1_conv1"]["kernel"])
    np.testing.assert_array_equal(got, frozen_before)

    cfg_bad = dict(cfg)
    cfg_bad["optimizer_type"] = "bogus"
    with pytest.raises(ValueError, match="optimizer_type"):
        make_optimizer(cfg_bad, params, "vgg16")


def test_fused_optimizer_equivalence():
    """The fused single-pass momentum (tpu_fused_optimizer=True, the default)
    must be bit-identical to the optax chain it replaces, across an LR
    boundary, on frozen / bias-doubled / weight-decayed leaves alike."""
    cfg = _small_config()
    cfg["learning_rate_multi_decay_steps"] = [3]
    cfg["learning_rate_multi_lrs"] = [1e-3, 1e-4]
    assert cfg.get("learning_rate_bias_double", True)

    # Synthetic tree shaped like the real layout: frozen block1 kernel,
    # trainable block3 kernel+bias, a BN gamma, and head leaves.
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params = {
        "extractor": {
            "block1_conv1": {"kernel": jax.random.normal(ks[0], (3, 3, 3, 8))},
            "block3_conv1": {
                "kernel": jax.random.normal(ks[1], (3, 3, 8, 16)),
                "bias": jax.random.normal(ks[2], (16,)),
            },
            "block3_bn": {"gamma": jax.random.normal(ks[3], (16,))},
        },
        "rpn_head": {
            "conv": {
                "kernel": jax.random.normal(ks[4], (3, 3, 16, 16)),
                "bias": jax.random.normal(ks[5], (16,)),
            }
        },
    }

    cfg_chain = dict(cfg)
    cfg_chain["tpu_fused_optimizer"] = False
    opt_f = make_optimizer(cfg, params, "vgg16")
    opt_c = make_optimizer(cfg_chain, params, "vgg16")
    from tf_eager_object_detection_tpu.training.optimizer import FusedMomentumState

    assert isinstance(opt_f.init(params), FusedMomentumState)

    state_f, state_c = opt_f.init(params), opt_c.init(params)
    params_f = params_c = params
    up_f = jax.jit(opt_f.update)
    up_c = jax.jit(opt_c.update)
    for i in range(6):  # crosses the step-3 LR boundary
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.fold_in(ks[6], i), p.shape),
            params,
        )
        # frozen leaves get zero grads in the real step (stop_frozen_gradients)
        grads["extractor"]["block1_conv1"]["kernel"] = jnp.zeros((3, 3, 3, 8))
        grads["extractor"]["block3_bn"]["gamma"] = jnp.zeros((16,))
        u_f, state_f = up_f(grads, state_f, params_f)
        u_c, state_c = up_c(grads, state_c, params_c)
        import optax

        params_f = optax.apply_updates(params_f, u_f)
        params_c = optax.apply_updates(params_c, u_c)
        for (pf_path, pf), (_, pc) in zip(
            jax.tree_util.tree_flatten_with_path(params_f)[0],
            jax.tree_util.tree_flatten_with_path(params_c)[0],
        ):
            np.testing.assert_array_equal(
                np.asarray(pf), np.asarray(pc), err_msg=f"step {i}: {pf_path}"
            )
    # frozen leaves never moved
    np.testing.assert_array_equal(
        np.asarray(params_f["extractor"]["block1_conv1"]["kernel"]),
        np.asarray(params["extractor"]["block1_conv1"]["kernel"]),
    )


def test_im_detect_batch_under_outer_jit_matches_host_path():
    """Composition safety (VERDICT r3 task 2): tracing im_detect_batch
    inside an OUTER jit must (a) not warn, (b) switch to the lax.map RoI
    stage (the b8-bf16 crash-free single program, BENCHLOG round 4), and
    (c) agree with the host-called two-jit path."""
    import warnings

    cfg = _small_config()
    cfg["tpu_image_buckets"] = [[96, 96]]
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    images, image_hw, *_ = _batch(rng, b=2, h=96, w=96)
    scales = jnp.asarray([1.0, 1.25], jnp.float32)

    host = det.im_detect_batch(params, images, image_hw, scales)

    outer = jax.jit(
        lambda p, im, hw, s: det.im_detect_batch(p, im, hw, s)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        traced = outer(params, images, image_hw, scales)

    # roi_valid exactly; floats to conv-batch-shape tolerance (the scan
    # body runs per-image convs where the host RoI stage runs them
    # batch-vmapped)
    np.testing.assert_array_equal(np.asarray(traced[3]), np.asarray(host[3]))
    for t, h in zip(traced[:3], host[:3]):
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(h), rtol=1e-4, atol=1e-4
        )


def test_im_detect_batch_dispatch_fails_safe():
    """VERDICT r4 item 9: the host/traced dispatch must POSITIVELY identify
    a concrete array to take the two-jit host path; any unknown duck-typed
    array object falls through to the lax.map path (crash-free by
    construction) instead of relying on Tracer-name matching."""
    from tf_eager_object_detection_tpu.models.faster_rcnn import (
        _is_concrete_array,
    )

    # positive identifications
    assert _is_concrete_array(np.zeros((2, 2), np.float32))
    assert _is_concrete_array(jnp.zeros((2, 2), jnp.float32))
    # tracers are never concrete
    seen = []

    def record(x):
        seen.append(_is_concrete_array(x))
        return x

    jax.jit(record)(jnp.zeros(2))
    assert seen == [False]

    class DuckArray:
        """Not a numpy array, not a jax.Array, no Tracer in the MRO —
        convertible via __array__ only."""

        def __init__(self, a):
            self._a = np.asarray(a)

        def __array__(self, dtype=None):
            return self._a if dtype is None else self._a.astype(dtype)

        @property
        def shape(self):
            return self._a.shape

        @property
        def dtype(self):
            return self._a.dtype

        @property
        def ndim(self):
            return self._a.ndim

    assert not _is_concrete_array(DuckArray(np.zeros(2)))

    # integration: a duck-typed image batch still gets a working (safe)
    # path through im_detect_batch and agrees with the host path
    cfg = _small_config()
    cfg["tpu_image_buckets"] = [[96, 96]]
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    images, image_hw, *_ = _batch(rng, b=2, h=96, w=96)
    scales = jnp.asarray([1.0, 1.25], jnp.float32)

    host = det.im_detect_batch(params, images, image_hw, scales)
    duck = det.im_detect_batch(
        params, DuckArray(np.asarray(images)), image_hw, scales
    )
    np.testing.assert_array_equal(np.asarray(duck[3]), np.asarray(host[3]))
    for d, h in zip(duck[:3], host[:3]):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(h), rtol=1e-4, atol=1e-4
        )


def test_im_detect_batch_matches_single():
    """im_detect_batch (two jitted stages — split to dodge an XLA:TPU fused
    kernel fault at b8 bf16, see BENCHLOG round 2) must equal per-image
    im_detect."""
    cfg = _small_config()
    cfg["tpu_image_buckets"] = [[96, 96]]
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    images, image_hw, *_ = _batch(rng, b=2, h=96, w=96)
    scales = jnp.asarray([1.0, 1.25], jnp.float32)

    sm_b, d_b, r_b, v_b = det.im_detect_batch(params, images, image_hw, scales)
    for i in range(2):
        sm, d, r, v = det.im_detect(params, images[i], image_hw[i], scales[i])
        np.testing.assert_allclose(np.asarray(sm_b[i]), np.asarray(sm), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_b[i]), np.asarray(d), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r_b[i]), np.asarray(r), rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(v_b[i]), np.asarray(v))
