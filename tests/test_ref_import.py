"""Checkpoint-importer tests with synthetic checkpoints."""

import numpy as np
import pytest

from tf_eager_object_detection_tpu.ref_import.importers import (
    apply_name_map,
    load_keras_h5,
)
from tf_eager_object_detection_tpu.ref_import.name_maps import (
    fpn_tensorflow_map,
    resnet_tf_faster_rcnn_map,
    vgg16_tf_faster_rcnn_map,
)
from tf_eager_object_detection_tpu.ref_import.pytorch_convert import pytorch_to_jax_np


def _leaf_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v).shape
    return out


def _init_vgg16_params():
    import jax

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    det = model_factory("faster_rcnn", "vgg16", cfg)
    return det, jax.device_get(det.init_params(jax.random.PRNGKey(0)))


def _fake_tensors_for_map(params, name_map, rng):
    """Random ckpt tensors shaped to match the target params."""
    tensors = {}
    for prefix, (module, layer) in name_map.items():
        tree = params[module][layer]
        if "gamma" in tree:
            for suffix in ("gamma", "beta", "moving_mean", "moving_variance"):
                tensors[prefix + suffix] = rng.randn(
                    *np.asarray(tree[suffix]).shape
                ).astype(np.float32)
        else:
            tensors[prefix + "weights"] = rng.randn(
                *np.asarray(tree["kernel"]).shape
            ).astype(np.float32)
            # only some ckpt layers carry biases (slim convs don't)
            if "fc" in prefix or "score" in prefix or "pred" in prefix or "rpn" in prefix:
                tensors[prefix + "biases"] = rng.randn(
                    *np.asarray(tree["bias"]).shape
                ).astype(np.float32)
    return tensors


def test_vgg16_tf_faster_rcnn_import():
    det, params = _init_vgg16_params()
    name_map = vgg16_tf_faster_rcnn_map()
    rng = np.random.RandomState(0)
    tensors = _fake_tensors_for_map(params, name_map, rng)
    new = apply_name_map(params, tensors, name_map)
    # a backbone conv got the ckpt weights, biases zero-filled (slim convs)
    np.testing.assert_array_equal(
        new["extractor"]["block3_conv2"]["kernel"],
        tensors["vgg_16/conv3/conv3_2/weights"],
    )
    np.testing.assert_array_equal(
        new["extractor"]["block3_conv2"]["bias"],
        np.zeros_like(new["extractor"]["block3_conv2"]["bias"]),
    )
    # rpn + roi heads got weights AND biases
    np.testing.assert_array_equal(
        new["rpn_head"]["rpn_score_conv"]["bias"],
        tensors["vgg_16/rpn_cls_score/biases"],
    )
    np.testing.assert_array_equal(
        new["roi_head"]["fc1"]["kernel"], tensors["vgg_16/fc6/weights"]
    )
    # untouched params stay identical (e.g. nothing else changed shape)
    assert _leaf_shapes(new) == _leaf_shapes(params)


def test_vgg16_bgr_flip():
    det, params = _init_vgg16_params()
    name_map = {"vgg_16/conv1/conv1_1/": ("extractor", "block1_conv1")}
    rng = np.random.RandomState(1)
    k = rng.randn(3, 3, 3, 64).astype(np.float32)
    new = apply_name_map(
        params,
        {"vgg_16/conv1/conv1_1/weights": k},
        name_map,
        bgr_flip_layers=(("extractor", "block1_conv1"),),
    )
    np.testing.assert_array_equal(
        new["extractor"]["block1_conv1"]["kernel"], k[:, :, ::-1, :]
    )


def test_resnet_map_covers_all_stacks():
    import jax

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    det = model_factory("faster_rcnn", "resnet50", cfg)
    params = jax.device_get(det.init_params(jax.random.PRNGKey(0)))
    name_map = resnet_tf_faster_rcnn_map(50)
    # every extractor/roi-head conv+bn layer must be covered by the map
    mapped_layers = {(m, l) for m, l in name_map.values()}
    for module in ("extractor",):
        for layer in params[module]:
            assert (module, layer) in mapped_layers, f"unmapped {module}/{layer}"
    rng = np.random.RandomState(2)
    tensors = _fake_tensors_for_map(params, name_map, rng)
    new = apply_name_map(params, tensors, name_map)
    np.testing.assert_array_equal(
        new["extractor"]["conv4_block6_3_bn"]["moving_variance"],
        tensors["resnet_v1_50/block3/unit_6/bottleneck_v1/conv3/BatchNorm/moving_variance"],
    )
    np.testing.assert_array_equal(
        new["roi_head"]["conv5_block1_0_conv"]["kernel"],
        tensors["resnet_v1_50/block4/unit_1/bottleneck_v1/shortcut/weights"],
    )


def test_fpn_map_structure():
    name_map = fpn_tensorflow_map(50)
    assert name_map["build_pyramid/build_P5/"] == ("neck", "build_p5")
    assert name_map["Fast-RCNN/build_fc_layers/fc1/"] == ("roi_head", "fc1")
    # conv5 lives in the extractor for FPN (vs roi_head for faster r-cnn)
    assert name_map[
        "resnet_v1_50/block4/unit_1/bottleneck_v1/conv1/"
    ] == ("extractor", "conv5_block1_1_conv")


def test_keras_h5_import(tmp_path):
    h5py = pytest.importorskip("h5py")
    det, params = _init_vgg16_params()
    path = str(tmp_path / "weights.h5")
    rng = np.random.RandomState(3)
    k = rng.randn(3, 3, 3, 64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    with h5py.File(path, "w") as f:
        g = f.create_group("block1_conv1").create_group("block1_conv1")
        g.create_dataset("kernel:0", data=k)
        g.create_dataset("bias:0", data=b)
    new = load_keras_h5(params, path, ("extractor",))
    np.testing.assert_array_equal(new["extractor"]["block1_conv1"]["kernel"], k)
    np.testing.assert_array_equal(new["extractor"]["block1_conv1"]["bias"], b)
    # other layers untouched
    np.testing.assert_array_equal(
        new["extractor"]["block2_conv1"]["kernel"],
        params["extractor"]["block2_conv1"]["kernel"],
    )


def test_pytorch_transpose():
    x = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)  # OIHW
    y = pytorch_to_jax_np(x)
    assert y.shape == (4, 5, 3, 2)  # HWIO
    fc = np.arange(6).reshape(2, 3)
    assert pytorch_to_jax_np(fc).shape == (3, 2)
