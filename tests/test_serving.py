"""Serving export: jax.export round-trip equals direct predict."""

import numpy as np
import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.config.config_factory import config_factory
from tf_eager_object_detection_tpu.models.model_factory import model_factory
from tf_eager_object_detection_tpu.serving.export import (
    export_predict,
    load_predict,
)


def _small_cfg():
    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg.update(
        {
            "rpn_proposal_train_pre_nms_sample_number": 256,
            "rpn_proposal_train_after_nms_sample_number": 64,
            "rpn_proposal_test_pre_nms_sample_number": 256,
            "rpn_proposal_test_after_nms_sample_number": 32,
            "roi_total_sample_number": 32,
            "roi_pos_sample_max_number": 8,
            "rpn_total_sample_number": 64,
            "rpn_pos_sample_max_number": 32,
            "tpu_image_buckets": [[64, 64], [96, 64]],
        }
    )
    return cfg


def test_export_roundtrip_matches_direct_predict(tmp_path):
    cfg = _small_cfg()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))

    out_dir = export_predict(det, params, str(tmp_path / "export"))
    predict, meta = load_predict(out_dir)
    assert meta["model_type"] == "faster_rcnn"
    assert meta["backbone"] == "vgg16"
    assert sorted(map(tuple, meta["buckets"])) == [(64, 64), (96, 64)]

    rng = np.random.RandomState(0)
    for h, w in [(64, 64), (96, 64)]:
        image = rng.randn(h, w, 3).astype(np.float32)
        hw = np.asarray([h - 4, w - 2], np.int32)
        want = det.predict(params, jnp.asarray(image), jnp.asarray(hw))
        got = predict(image, hw)
        np.testing.assert_allclose(
            np.asarray(got.boxes), np.asarray(want.boxes), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(got.labels), np.asarray(want.labels))
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))

    # non-bucket shape is rejected loudly
    try:
        predict(np.zeros((60, 60, 3), np.float32), np.asarray([60, 60], np.int32))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not an exported bucket" in str(e)


def test_export_params_as_arguments_roundtrip(tmp_path):
    """bake_params=False: tiny StableHLO (program only) + params.npz; reload
    equals direct predict and the baked variant (VERDICT r2 #5). The size
    assertion pins the point of the variant: artifacts small enough for
    transports that reject baked-weights blobs (tunnel HTTP 413, BENCHLOG)."""
    import os

    cfg = _small_cfg()
    cfg["tpu_image_buckets"] = [[64, 64]]
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))

    baked_dir = export_predict(det, params, str(tmp_path / "baked"))
    slim_dir = export_predict(
        det, params, str(tmp_path / "slim"), bake_params=False
    )
    baked_size = os.path.getsize(os.path.join(baked_dir, "predict_64x64.stablehlo"))
    slim_size = os.path.getsize(os.path.join(slim_dir, "predict_64x64.stablehlo"))
    assert slim_size < baked_size / 20, (slim_size, baked_size)
    assert os.path.exists(os.path.join(slim_dir, "params.npz"))

    predict, meta = load_predict(slim_dir)
    assert meta["params_baked"] is False
    rng = np.random.RandomState(1)
    image = rng.randn(64, 64, 3).astype(np.float32)
    hw = np.asarray([60, 62], np.int32)
    want = det.predict(params, jnp.asarray(image), jnp.asarray(hw))
    got = predict(image, hw)
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(want.boxes), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.labels), np.asarray(want.labels))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
