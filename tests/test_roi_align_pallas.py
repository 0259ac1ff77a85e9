"""Windowed Pallas RoIAlign: golden vs the einsum path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.ops.roi_align import crop_and_resize
from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import (
    pallas_roi_align_window,
)


def _ref_crops(feat, rois, ih, iw, size):
    boxes = np.stack(
        [rois[:, 1] / ih, rois[:, 0] / iw, rois[:, 3] / ih, rois[:, 2] / iw],
        axis=1,
    )
    return np.asarray(crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), size))


def test_pallas_roi_align_matches_einsum():
    rng = np.random.RandomState(0)
    h, w, c = 100, 160, 16
    ih, iw = 400.0, 640.0
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array(
        [
            [10.0, 20.0, 90.0, 100.0],
            [300.0, 200.0, 340.0, 260.0],
            [600.0, 380.0, 639.0, 399.0],  # bottom-right corner
            [5.0, 5.0, 5.0, 5.0],  # degenerate point
            [-20.0, -10.0, 50.0, 60.0],  # partially outside the image
            [500.0, 300.0, 560.0, 370.0],
        ],
        np.float32,
    )
    active = np.ones(len(rois), np.int32)
    got = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(active),
            ih, iw, 14, interpret=True,
        )
    )
    want = _ref_crops(feat, rois, ih, iw, 14)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_inactive_rois_are_zero():
    rng = np.random.RandomState(1)
    feat = rng.randn(80, 80, 8).astype(np.float32)
    rois = np.array([[10.0, 10.0, 60.0, 60.0], [20.0, 20.0, 70.0, 70.0]], np.float32)
    got = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat), jnp.asarray(rois),
            jnp.asarray([0, 1], np.int32), 320.0, 320.0, 14, interpret=True,
        )
    )
    assert np.abs(got[0]).max() == 0.0
    assert np.abs(got[1]).max() > 0.0


def test_pallas_roi_align_batched_row_folding():
    """Batched form must equal per-image single calls (window origins must
    stay inside each image's folded row span)."""
    rng = np.random.RandomState(2)
    b, h, w, c = 3, 70, 90, 8
    ih = np.array([280.0, 260.0, 275.0], np.float32)
    iw = np.array([360.0, 340.0, 355.0], np.float32)
    feat = rng.randn(b, h, w, c).astype(np.float32)
    rois = rng.uniform(0, 250, size=(b, 5, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + np.abs(rois[..., 2:] - rois[..., :2])
    active = (rng.rand(b, 5) > 0.3).astype(np.int32)
    got = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(active),
            jnp.asarray(ih), jnp.asarray(iw), 14, interpret=True,
        )
    )
    for i in range(b):
        want = np.asarray(
            pallas_roi_align_window(
                jnp.asarray(feat[i]), jnp.asarray(rois[i]), jnp.asarray(active[i]),
                ih[i], iw[i], 14, interpret=True,
            )
        )
        # coords carry a +row_base offset in the batched form, so weights
        # differ by a few f32 ULPs from the single-image call
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_padded_bucket_matches_unpadded():
    """level_stride must map sample coords onto each image's valid extent of
    a padded bucket map (ADVICE r1 high) — golden is the einsum crop on the
    UNPADDED map."""
    rng = np.random.RandomState(6)
    stride, c = 8, 8
    ih, iw = 300.0, 420.0  # valid grid 38 x 53
    vh, vw = 38, 53
    ph, pw = 48, 64  # padded bucket grid
    feat_valid = rng.randn(vh, vw, c).astype(np.float32)
    feat_padded = np.zeros((ph, pw, c), np.float32)
    feat_padded[:vh, :vw] = feat_valid
    rois = np.array(
        [
            [10.0, 20.0, 120.0, 100.0],
            [0.0, 0.0, 419.0, 299.0],
            [250.0, 150.0, 410.0, 290.0],
        ],
        np.float32,
    )
    active = np.ones(len(rois), np.int32)
    got = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat_padded), jnp.asarray(rois), jnp.asarray(active),
            ih, iw, 14, interpret=True, level_stride=stride,
        )
    )
    want = _ref_crops(feat_valid, rois, ih, iw, 14)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_padded_bucket_gradients_consistent():
    """custom_vjp backward must use the same valid-extent coordinate map."""
    rng = np.random.RandomState(8)
    stride, c = 8, 8
    ih, iw = 300.0, 420.0
    ph, pw = 48, 64
    feat = jnp.asarray(rng.randn(ph, pw, c).astype(np.float32))
    rois = jnp.asarray(
        np.array([[10.0, 20.0, 120.0, 100.0], [250.0, 150.0, 410.0, 290.0]], np.float32)
    )
    active = jnp.asarray([1, 1])

    def loss_pallas(f):
        o = pallas_roi_align_window(
            f, rois, active, ih, iw, 14, interpret=True, level_stride=stride
        )
        return jnp.sum(o * o)

    def loss_einsum(f):
        vh, vw = float(np.ceil(ih / stride)), float(np.ceil(iw / stride))
        boxes = jnp.stack(
            [
                rois[:, 1] / ih * (vh - 1) / (ph - 1),
                rois[:, 0] / iw * (vw - 1) / (pw - 1),
                rois[:, 3] / ih * (vh - 1) / (ph - 1),
                rois[:, 2] / iw * (vw - 1) / (pw - 1),
            ],
            axis=1,
        )
        o = crop_and_resize(f, boxes, 14)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_pallas)(feat)
    g2 = jax.grad(loss_einsum)(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_roi_features_batched_chunked_matches_vmap():
    """b >= 4 takes the sequential lax.map path (OOM guard); results must
    equal the vmapped einsum path exactly."""
    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "fpn"))
    det = model_factory("fpn", "resnet50", cfg)
    rng = np.random.RandomState(7)
    b, c = 4, 8
    p_list = tuple(
        jnp.asarray(rng.randn(b, s, s, c).astype(np.float32)) for s in (32, 16, 8, 4)
    )
    rois = jnp.asarray(rng.uniform(5, 100, size=(b, 6, 4)).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + jnp.abs(rois[..., 2:]))
    hw = jnp.asarray([[128, 128]] * b, jnp.int32)
    got = det._roi_features_batched(p_list, rois, hw)
    want = jax.vmap(det._roi_features)(p_list, rois, hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_unknown_roi_align_impl_rejected():
    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "fpn"))
    cfg["tpu_roi_align_impl"] = "bogus"
    try:
        model_factory("fpn", "resnet50", cfg)
    except ValueError as e:
        assert "tpu_roi_align_impl" in str(e)
    else:
        raise AssertionError("bogus impl name was silently accepted")


def test_pallas_roi_align_feature_gradients_match_einsum():
    """custom_vjp backward (einsum transpose) == autodiff of the einsum path."""
    from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import _norm_boxes

    rng = np.random.RandomState(5)
    h, w, c = 60, 80, 8
    ih, iw = 240.0, 320.0
    feat = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    rois = jnp.asarray(
        np.array([[10.0, 20.0, 90.0, 100.0], [150.0, 60.0, 260.0, 200.0]], np.float32)
    )
    active = jnp.asarray([1, 1])

    def loss_pallas(f):
        o = pallas_roi_align_window(f, rois, active, ih, iw, 14, interpret=True)
        return jnp.sum(o * o)

    def loss_einsum(f):
        o = crop_and_resize(f, _norm_boxes(rois, ih, iw), 14)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_pallas)(feat)
    g2 = jax.grad(loss_einsum)(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_fpn_predict_pallas_matches_einsum():
    """End-to-end FPN predict: pallas RoIAlign == einsum RoIAlign.

    At the test's 128x128 image every pyramid map is <= 64 cells so the
    window covers the whole (padded) map — no truncation, exact match.
    """
    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "fpn"))
    cfg.update(
        {
            "rpn_proposal_test_pre_nms_sample_number": 256,
            "rpn_proposal_test_after_nms_sample_number": 32,
            "roi_total_sample_number": 32,
            "max_objects_per_image": 10,
            "max_objects_per_class_per_image": 10,
            "tpu_image_buckets": [[128, 128]],
        }
    )
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.randn(128, 128, 3).astype(np.float32))
    hw = jnp.asarray([128, 128], jnp.int32)

    det = model_factory("fpn", "resnet50", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    out_einsum = det.predict(params, image, hw)

    cfg2 = dict(cfg)
    cfg2["tpu_roi_align_impl"] = "pallas_interpret"
    det2 = model_factory("fpn", "resnet50", cfg2)
    out_pallas = det2.predict(params, image, hw)

    np.testing.assert_allclose(
        np.asarray(out_pallas.scores), np.asarray(out_einsum.scores),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_pallas.boxes), np.asarray(out_einsum.boxes),
        rtol=1e-4, atol=1e-3,
    )

    # batched detection path (uses _roi_features_batched)
    sm1, d1, r1, v1 = det.im_detect_batch(
        params, image[None], hw[None], jnp.asarray([1.0])
    )
    sm2, d2, r2, v2 = det2.im_detect_batch(
        params, image[None], hw[None], jnp.asarray([1.0])
    )
    np.testing.assert_allclose(np.asarray(sm2), np.asarray(sm1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))


def test_pallas_roi_align_bf16_windows_close_to_f32():
    """bf16 window DMA (tpu_roi_align_window_dtype): same sampling, feature
    values quantized to bf16 — error bounded by ~2^-8 relative."""
    rng = np.random.RandomState(5)
    h, w, c = 64, 96, 8
    ih, iw = 256.0, 384.0
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array(
        [
            [10.0, 20.0, 120.0, 100.0],
            [200.0, 100.0, 340.0, 240.0],
            [5.0, 5.0, 60.0, 48.0],
        ],
        np.float32,
    )
    active = np.ones(len(rois), np.int32)
    kw = dict(interpret=True)
    f32 = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(active),
            ih, iw, 14, **kw,
        )
    )
    bf16 = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(active),
            ih, iw, 14, window_dtype=jnp.bfloat16, **kw,
        )
    )
    # bilinear weights are convex: error <= max feature quantization error
    scale = np.abs(feat).max()
    assert np.abs(bf16 - f32).max() <= scale * 2.0**-7
    # and the f32 path itself stays exact vs the reference einsum
    want = _ref_crops(feat, rois, ih, iw, 14)
    np.testing.assert_allclose(f32, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_many_rois_mixed_active():
    """Double-buffered DMA pipeline: a longer roi stream with interleaved
    inactive rois (buffer pairing must survive skipped copies)."""
    rng = np.random.RandomState(6)
    h, w, c = 72, 80, 8
    ih, iw = 288.0, 320.0
    feat = rng.randn(h, w, c).astype(np.float32)
    n = 33  # odd length: last roi exercises the no-next-copy epilogue
    x1 = rng.uniform(0, iw - 40, n)
    y1 = rng.uniform(0, ih - 40, n)
    rois = np.stack(
        [x1, y1, x1 + rng.uniform(5, 39, n), y1 + rng.uniform(5, 39, n)], 1
    ).astype(np.float32)
    active = (rng.rand(n) < 0.6).astype(np.int32)
    active[0] = 0  # prologue skip
    active[1] = 0  # consecutive skips
    got = np.asarray(
        pallas_roi_align_window(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(active),
            ih, iw, 14, interpret=True,
        )
    )
    want = _ref_crops(feat, rois, ih, iw, 14) * active[:, None, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_windowed_backward_overlapping_rois_matches_einsum_vjp():
    """The windowed scatter-add backward (read-modify-write per roi) must
    accumulate correctly for heavily overlapping windows, skip inactive
    rois, and agree with the einsum-transpose backward."""
    rng = np.random.RandomState(9)
    h, w, c = 64, 96, 8
    ih, iw = 256.0, 384.0
    feat = rng.randn(h, w, c).astype(np.float32)
    # rois piled on the same region -> every window overlaps
    n = 9
    x1 = rng.uniform(40, 80, n); y1 = rng.uniform(30, 60, n)
    rois = np.stack([x1, y1, x1 + rng.uniform(20, 60, n),
                     y1 + rng.uniform(20, 60, n)], 1).astype(np.float32)
    active = np.ones(n, np.int32); active[3] = 0
    cot = rng.randn(n, 14, 14, c).astype(np.float32)

    def loss(f, backward):
        out = pallas_roi_align_window(
            f, jnp.asarray(rois), jnp.asarray(active), ih, iw, 14,
            interpret=True, backward=backward,
        )
        return jnp.sum(out * jnp.asarray(cot))

    g_window = np.asarray(jax.grad(lambda f: loss(f, "window"))(jnp.asarray(feat)))
    g_einsum = np.asarray(jax.grad(lambda f: loss(f, "einsum"))(jnp.asarray(feat)))
    np.testing.assert_allclose(g_window, g_einsum, rtol=1e-4, atol=1e-4)
    assert np.abs(g_window).max() > 0.0


def test_pallas_roi_align_small_window_exact_when_span_fits():
    """window=48 / 32 are exact for rois whose cell span fits (the FPN
    level-assignment bound); forward AND backward agree with window=64."""
    rng = np.random.RandomState(5)
    h, w, c = 100, 160, 16
    ih, iw = 400.0, 640.0
    feat = rng.randn(h, w, c).astype(np.float32)
    # spans of ~10-25 cells on the 100x160 grid (ih/h = 4 px per cell)
    rois = np.array(
        [
            [10.0, 20.0, 90.0, 100.0],
            [300.0, 200.0, 380.0, 280.0],
            [500.0, 300.0, 560.0, 370.0],
        ],
        np.float32,
    )
    active = np.ones(len(rois), np.int32)

    outs = {}
    grads = {}
    for window in (64, 48, 32):
        def f(feats):
            return pallas_roi_align_window(
                feats, jnp.asarray(rois), jnp.asarray(active),
                ih, iw, 14, interpret=True, window=window,
            ).sum()

        outs[window] = np.asarray(
            pallas_roi_align_window(
                jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(active),
                ih, iw, 14, interpret=True, window=window,
            )
        )
        grads[window] = np.asarray(jax.grad(f)(jnp.asarray(feat)))

    for window in (48, 32):
        np.testing.assert_allclose(outs[window], outs[64], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(grads[window], grads[64], rtol=1e-5, atol=1e-5)
    # and the 64 output still matches the einsum oracle
    np.testing.assert_allclose(
        outs[64], _ref_crops(feat, rois, ih, iw, 14), rtol=1e-4, atol=1e-4
    )


def test_pallas_roi_align_window_must_be_multiple_of_16():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 16"):
        pallas_roi_align_window(
            jnp.zeros((8, 8, 8)), jnp.zeros((1, 4)), jnp.ones((1,)),
            32.0, 32.0, 14, interpret=True, window=40 + 1,
        )


def test_pallas_multilevel_matches_per_level_sum():
    """Fused-pyramid kernel == the sum of per-level windowed calls (forward
    AND feature gradients), including padded planes and invalid rois."""
    from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import (
        pallas_roi_align_multilevel,
    )

    rng = np.random.RandomState(7)
    b, n, c = 2, 6, 16
    strides = (4, 8)
    shapes = [(48, 64), (24, 32)]
    p_list = [rng.randn(b, h, w, c).astype(np.float32) for h, w in shapes]
    ih = np.asarray([180.0, 150.0], np.float32)  # valid extent < padded grid
    iw = np.asarray([250.0, 200.0], np.float32)
    rois = rng.uniform(0, 140, (b, n, 4)).astype(np.float32)
    rois = np.concatenate(
        [np.minimum(rois[..., :2], rois[..., 2:]),
         np.maximum(rois[..., :2], rois[..., 2:]) + 4.0], axis=-1,
    )
    levels = rng.randint(0, 2, (b, n))
    valid = np.ones((b, n), np.int32)
    valid[1, -1] = 0

    def fused(planes):
        return pallas_roi_align_multilevel(
            planes, jnp.asarray(rois), jnp.asarray(levels),
            jnp.asarray(ih), jnp.asarray(iw), 14, strides=strides,
            valid=jnp.asarray(valid), interpret=True,
        )

    def per_level(planes):
        total = 0.0
        for k in range(2):
            total = total + pallas_roi_align_window(
                planes[k], jnp.asarray(rois),
                jnp.asarray((levels == k) & (valid != 0)),
                jnp.asarray(ih), jnp.asarray(iw), 14, interpret=True,
                level_stride=strides[k],
            )
        return total

    planes = tuple(jnp.asarray(f) for f in p_list)
    got = np.asarray(fused(planes))
    want = np.asarray(per_level(planes))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert not np.asarray(got[1, -1]).any()  # invalid roi -> zeros

    g_fused = jax.grad(lambda ps: fused(ps).sum())(planes)
    g_ref = jax.grad(lambda ps: per_level(ps).sum())(planes)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )
    assert any(float(jnp.abs(a).sum()) > 0 for a in g_fused)


def test_fpn_fused_levels_matches_per_level_model_path():
    """FPN predict with tpu_roi_align_fused_levels on == off (interpret)."""
    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    def small_cfg(fused):
        cfg = dict(config_factory("pascal", "fpn"))
        cfg.update(
            {
                "tpu_image_buckets": [[128, 128]],
                "image_min_size": 128,
                "image_max_size": 128,
                "rpn_proposal_test_pre_nms_sample_number": 256,
                "rpn_proposal_test_after_nms_sample_number": 16,
                "roi_total_sample_number": 16,
                "tpu_max_gt_boxes": 4,
                "tpu_roi_align_impl": "pallas_interpret",
                "tpu_roi_align_fused_levels": fused,
            }
        )
        return cfg

    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.randn(128, 128, 3).astype(np.float32))
    hw = jnp.asarray([120, 124], jnp.int32)

    outs = {}
    for fused in (True, False):
        det = model_factory("fpn", "resnet50", small_cfg(fused))
        params = det.init_params(jax.random.PRNGKey(0))
        outs[fused] = det.predict(params, image, hw)
    np.testing.assert_allclose(
        np.asarray(outs[True].boxes), np.asarray(outs[False].boxes),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(outs[True].valid), np.asarray(outs[False].valid)
    )


def test_fpn_pallas_train_grad_bf16_cotangent_dtype():
    """bf16 FPN train gradients through the pallas RoIAlign (fused and
    per-level kernels): the custom_vjp backward accumulates in f32 for
    precision but must hand cotangents back in the PRIMAL dtype — an f32
    cotangent for a bf16 pyramid level crashes grad accumulation where the
    RPN head convs consume the same feature map (found by the on-chip
    b8-bf16 pallas-train A/B: AssertionError f32[8,20,32,256] vs
    bf16[8,20,32,256])."""
    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    hw = jnp.asarray([[120, 124]], jnp.int32)
    gt = jnp.asarray(
        np.array([[[10.0, 12.0, 70.0, 60.0], [40.0, 50.0, 100.0, 110.0]]], np.float32)
    )
    gtm = jnp.asarray([[True, True]])
    gtl = jnp.asarray([[1, 2]], jnp.int32)

    # (fused, window_dtype): both kernels at the default f32 window, plus
    # the all-bf16 combination (bf16 compute + bf16 window DMA)
    for fused, window_dtype in (
        (True, "float32"),
        (False, "float32"),
        (True, "bfloat16"),
    ):
        cfg = dict(config_factory("pascal", "fpn"))
        cfg.update(
            {
                "tpu_image_buckets": [[128, 128]],
                "image_min_size": 128,
                "image_max_size": 128,
                "rpn_proposal_train_pre_nms_sample_number": 256,
                "rpn_proposal_train_after_nms_sample_number": 16,
                "rpn_total_sample_number": 32,
                "rpn_pos_sample_max_number": 16,
                "roi_total_sample_number": 16,
                "roi_pos_sample_max_number": 4,
                "tpu_max_gt_boxes": 2,
                "tpu_compute_dtype": "bfloat16",
                "tpu_roi_align_impl": "pallas_interpret",
                "tpu_roi_align_fused_levels": fused,
                "tpu_roi_align_window_dtype": window_dtype,
            }
        )
        det = model_factory("fpn", "resnet50", cfg)
        params = det.init_params(jax.random.PRNGKey(0))

        def total_loss(p):
            total, _ = det.loss_fn(
                p, images, hw, gt, gtm, gtl, jax.random.PRNGKey(1)
            )
            return total

        grads = jax.grad(total_loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(l.astype(jnp.float32)))) for l in leaves)
        assert any(float(jnp.abs(l.astype(jnp.float32)).sum()) > 0 for l in leaves)
