"""Real-format checkpoint fixtures for the import paths (VERDICT r1 #2).

Round-1 importer tests exercised only plumbing (synthetic dicts shaped from
our own params). These tests write artifacts in the ACTUAL third-party
formats — keras-applications `.h5` layouts (old `W_1:0` style for vgg16, new
nested `kernel:0` style for resnet) and a genuine TF v1 checkpoint (.index /
.data written by tf.compat.v1.train.Saver) — with layer/variable names
generated INDEPENDENTLY from the published naming schemes, then assert every
backbone layer of our params receives them. A wrong group path, suffix rule,
or name-map entry fails here, not on parity day.
"""

import numpy as np
import pytest

from tf_eager_object_detection_tpu.ref_import.importers import (
    apply_name_map,
    load_keras_h5,
)
from tf_eager_object_detection_tpu.ref_import.name_maps import (
    resnet_tf_faster_rcnn_map,
    vgg16_slim_backbone_map,
)

# ---------------------------------------------------------------------------
# independent name generators, written from the published naming schemes
# (keras-applications resnet common.py / vgg16.py; slim resnet_v1 arg scopes)
# ---------------------------------------------------------------------------

RESNET50_BLOCKS = {"conv2": 3, "conv3": 4, "conv4": 6, "conv5": 3}
VGG16_BLOCKS = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}


def keras_resnet_layer_names():
    """Layer names in resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5
    (keras.applications.resnet 'new' naming, which the reference's
    block1/stack1 builders replicate, resnet_faster_rcnn.py:31-99)."""
    names = ["conv1_conv", "conv1_bn"]
    for stack, nblocks in RESNET50_BLOCKS.items():
        for b in range(1, nblocks + 1):
            if b == 1:
                names += [f"{stack}_block1_0_conv", f"{stack}_block1_0_bn"]
            for u in (1, 2, 3):
                names += [f"{stack}_block{b}_{u}_conv", f"{stack}_block{b}_{u}_bn"]
    return names


def keras_vgg16_layer_names():
    return [
        f"block{b}_conv{i}"
        for b, n in VGG16_BLOCKS.items()
        for i in range(1, n + 1)
    ]


def slim_vgg16_var_names():
    """vgg_16 slim checkpoint variable names (the reference's own literal
    table, vgg16_faster_rcnn.py:359-377)."""
    out = []
    for b, n in VGG16_BLOCKS.items():
        for i in range(1, n + 1):
            out.append(f"vgg_16/conv{b}/conv{b}_{i}/weights")
            out.append(f"vgg_16/conv{b}/conv{b}_{i}/biases")
    return out


def _leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaves(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def _fill_for(name, shape):
    """Deterministic distinctive values per dataset name."""
    seed = abs(hash(name)) % (2**31)
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.fixture(scope="module")
def resnet50_det_params():
    import jax

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    det = model_factory("faster_rcnn", "resnet50", cfg)
    return det, jax.device_get(det.init_params(jax.random.PRNGKey(0)))


@pytest.fixture(scope="module")
def vgg16_det_params():
    import jax

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    det = model_factory("faster_rcnn", "vgg16", cfg)
    return det, jax.device_get(det.init_params(jax.random.PRNGKey(0)))


def _param_shape(params, modules, layer, pname):
    for m in modules:
        tree = params[m].get(layer)
        if tree is not None and pname in tree:
            return np.asarray(tree[pname]).shape
    return None


def test_keras_resnet50_h5_real_layout(tmp_path, resnet50_det_params):
    """New-style keras-applications file: per-layer group -> same-name
    subgroup -> kernel:0 / bias-less convs... exactly as save_weights wrote
    the 2019 resnet release files (incl. layer_names/weight_names attrs)."""
    h5py = pytest.importorskip("h5py")
    det, params = resnet50_det_params
    modules = ("extractor", "roi_head")
    layer_names = keras_resnet_layer_names()

    path = str(tmp_path / "resnet50_notop.h5")
    written = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n in layer_names], dtype="S"
        )
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.2.4"
        for name in layer_names:
            g = f.create_group(name)
            sub = g.create_group(name)
            if name.endswith("_bn"):
                wnames = ["gamma:0", "beta:0", "moving_mean:0", "moving_variance:0"]
                pnames = ["gamma", "beta", "moving_mean", "moving_variance"]
            else:
                wnames = ["kernel:0", "bias:0"]
                pnames = ["kernel", "bias"]
            weight_names = []
            for wn, pn in zip(wnames, pnames):
                shape = _param_shape(params, modules, name, pn)
                assert shape is not None, (
                    f"keras layer {name!r} has no counterpart in our params — "
                    "flax layer naming diverged from keras-applications"
                )
                data = _fill_for(f"{name}/{wn}", shape)
                sub.create_dataset(wn, data=data)
                written[f"{name}/{pn}"] = data
                weight_names.append(f"{name}/{wn}".encode())
            g.attrs["weight_names"] = np.array(weight_names, dtype="S")

    new = load_keras_h5(params, path, modules)
    loaded = {**_leaves(new["extractor"], ""), **_leaves(new["roi_head"], "")}
    for key, data in written.items():
        np.testing.assert_array_equal(loaded[key], data, err_msg=key)
    # detection heads untouched
    np.testing.assert_array_equal(
        new["rpn_head"]["rpn_first_conv"]["kernel"],
        params["rpn_head"]["rpn_first_conv"]["kernel"],
    )


def test_keras_vgg16_h5_old_layout(tmp_path, vgg16_det_params):
    """Old-style keras file (vgg16_weights_tf_dim_ordering_tf_kernels.h5):
    datasets named {layer}_W_1:0 / {layer}_b_1:0 directly in the layer group."""
    h5py = pytest.importorskip("h5py")
    det, params = vgg16_det_params
    layer_names = keras_vgg16_layer_names()

    path = str(tmp_path / "vgg16.h5")
    written = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n in layer_names], dtype="S"
        )
        for name in layer_names:
            g = f.create_group(name)
            kshape = _param_shape(params, ("extractor",), name, "kernel")
            bshape = _param_shape(params, ("extractor",), name, "bias")
            assert kshape is not None, name
            k = _fill_for(name + "/W", kshape)
            b = _fill_for(name + "/b", bshape)
            g.create_dataset(f"{name}_W_1:0", data=k)
            g.create_dataset(f"{name}_b_1:0", data=b)
            g.attrs["weight_names"] = np.array(
                [f"{name}_W_1:0".encode(), f"{name}_b_1:0".encode()], dtype="S"
            )
            written[name] = (k, b)

    new = load_keras_h5(params, path, ("extractor",))
    for name, (k, b) in written.items():
        np.testing.assert_array_equal(new["extractor"][name]["kernel"], k, err_msg=name)
        np.testing.assert_array_equal(new["extractor"][name]["bias"], b, err_msg=name)


def test_real_tf_checkpoint_roundtrip(tmp_path, vgg16_det_params):
    """A genuine TF checkpoint (Saver-written .index/.data) read by
    load_tf_checkpoint_dict and applied through the vgg16 slim map,
    including the conv1_1 BGR kernel flip (vgg16_faster_rcnn.py:378-383)."""
    tf = pytest.importorskip("tensorflow")
    det, params = vgg16_det_params

    var_names = slim_vgg16_var_names()
    values = {}
    g = tf.Graph()
    with g.as_default():
        tf_vars = []
        for vn in var_names:
            layer = vn.split("/")[2]  # convB_i
            block = int(layer[4])
            idx = int(layer[6])
            pname = "kernel" if vn.endswith("weights") else "bias"
            shape = _param_shape(
                params, ("extractor",), f"block{block}_conv{idx}", pname
            )
            assert shape is not None, vn
            values[vn] = _fill_for(vn, shape)
            tf_vars.append(
                tf.Variable(values[vn], name=vn, dtype=tf.float32)
            )
        saver = tf.compat.v1.train.Saver(
            {vn: v for vn, v in zip(var_names, tf_vars)}
        )
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt_path = saver.save(sess, str(tmp_path / "vgg_16.ckpt"))

    from tf_eager_object_detection_tpu.ref_import.importers import (
        load_tf_checkpoint_dict,
    )

    tensors = load_tf_checkpoint_dict(ckpt_path)
    for vn in var_names:
        assert vn in tensors, f"checkpoint reader lost {vn}"
        np.testing.assert_array_equal(tensors[vn], values[vn])

    name_map = vgg16_slim_backbone_map()
    new = apply_name_map(
        params,
        tensors,
        name_map,
        bgr_flip_layers=(("extractor", "block1_conv1"),),
    )
    np.testing.assert_array_equal(
        new["extractor"]["block1_conv1"]["kernel"],
        values["vgg_16/conv1/conv1_1/weights"][:, :, ::-1, :],
    )
    np.testing.assert_array_equal(
        new["extractor"]["block5_conv3"]["kernel"],
        values["vgg_16/conv5/conv5_3/weights"],
    )
    np.testing.assert_array_equal(
        new["extractor"]["block2_conv2"]["bias"],
        values["vgg_16/conv2/conv2_2/biases"],
    )


def test_resnet_slim_ckpt_name_generation_matches_published_scheme():
    """Literal slim resnet_v1 variable names (hard-coded from the reference's
    import table, resnet_faster_rcnn.py:295-446) must appear in our
    programmatically generated map."""
    name_map = resnet_tf_faster_rcnn_map(101)
    for literal in [
        "resnet_v1_101/conv1/",
        "resnet_v1_101/conv1/BatchNorm/",
        "resnet_v1_101/block1/unit_1/bottleneck_v1/shortcut/",
        "resnet_v1_101/block1/unit_1/bottleneck_v1/shortcut/BatchNorm/",
        "resnet_v1_101/block2/unit_4/bottleneck_v1/conv3/",
        "resnet_v1_101/block3/unit_23/bottleneck_v1/conv2/BatchNorm/",
        "resnet_v1_101/block4/unit_3/bottleneck_v1/conv1/",
        "resnet_v1_101/rpn_conv/3x3/",
        "resnet_v1_101/cls_score/",
        "resnet_v1_101/bbox_pred/",
    ]:
        assert literal in name_map, literal
    # block3 of resnet101 has exactly 23 units; unit_24 must not exist
    assert "resnet_v1_101/block3/unit_24/bottleneck_v1/conv1/" not in name_map


def test_eval_cli_import_flag_dispatch(tmp_path, vgg16_det_params):
    """The eval CLIs' flag surface routes to the right importer and image
    format (reference eval_pascal.py:194-200, eval_coco.py:224-238)."""
    import argparse

    from tf_eager_object_detection_tpu.ref_import.cli import (
        add_import_flags,
        load_checkpoint_params,
    )

    det, params = vgg16_det_params
    parser = argparse.ArgumentParser()
    add_import_flags(parser)

    # keras_h5 path: loads backbone, returns None (= preprocessing-native
    # channel order; caffe -> BGR)
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "w.h5")
    kshape = np.asarray(params["extractor"]["block1_conv1"]["kernel"]).shape
    k = _fill_for("x", kshape)
    with h5py.File(path, "w") as f:
        g = f.create_group("block1_conv1")
        g.create_dataset("block1_conv1_W_1:0", data=k)
    args = parser.parse_args(["--keras_h5"])
    new, fmt = load_checkpoint_params(det, path, args)
    assert fmt is None
    np.testing.assert_array_equal(new["extractor"]["block1_conv1"]["kernel"], k)

    # conflicting flags rejected
    args = parser.parse_args(["--keras_h5", "--use_tf_faster_rcnn_model"])
    with pytest.raises(ValueError, match="at most one"):
        load_checkpoint_params(det, path, args)

    # fpn flag on a faster_rcnn detector rejected
    args = parser.parse_args(["--use_fpn_tensorflow_model"])
    with pytest.raises(ValueError, match="model_type fpn"):
        load_checkpoint_params(det, path, args)


def test_backbone_weights_accepts_slim_checkpoint(tmp_path, vgg16_det_params):
    """--backbone_weights with a slim vgg TF-checkpoint prefix: format is
    auto-detected (.index/.data family) and routed through
    vgg16_slim_backbone_map with the BGR conv1_1 flip — the reference's
    slim fresh-training init (vgg16_faster_rcnn.py:357-390), now
    CLI-reachable (VERDICT r2 #7)."""
    tf = pytest.importorskip("tensorflow")
    det, params = vgg16_det_params

    var_names = slim_vgg16_var_names()
    values = {}
    g = tf.Graph()
    with g.as_default():
        tf_vars = []
        for vn in var_names:
            layer = vn.split("/")[2]
            block, idx = int(layer[4]), int(layer[6])
            pname = "kernel" if vn.endswith("weights") else "bias"
            shape = _param_shape(
                params, ("extractor",), f"block{block}_conv{idx}", pname
            )
            values[vn] = _fill_for(vn, shape)
            tf_vars.append(tf.Variable(values[vn], name=vn, dtype=tf.float32))
        saver = tf.compat.v1.train.Saver(
            {vn: v for vn, v in zip(var_names, tf_vars)}
        )
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt_path = saver.save(sess, str(tmp_path / "vgg_16.ckpt"))

    from tf_eager_object_detection_tpu.ref_import.cli import (
        _is_tf_checkpoint,
        load_backbone_weights,
    )

    assert _is_tf_checkpoint(ckpt_path)
    assert not _is_tf_checkpoint(str(tmp_path / "nope.h5"))

    new = load_backbone_weights(det, params, ckpt_path)
    # conv1_1 kernel lands with input channels reversed (RGB->BGR)
    np.testing.assert_array_equal(
        new["extractor"]["block1_conv1"]["kernel"],
        values["vgg_16/conv1/conv1_1/weights"][:, :, ::-1, :],
    )
    # a deeper conv lands unflipped
    np.testing.assert_array_equal(
        new["extractor"]["block5_conv3"]["kernel"],
        values["vgg_16/conv5/conv5_3/weights"],
    )

    # non-vgg backbones reject the slim path loudly
    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    rdet = model_factory(
        "faster_rcnn", "resnet50", dict(config_factory("pascal", "faster_rcnn"))
    )
    with pytest.raises(ValueError, match="vgg16"):
        load_backbone_weights(rdet, params, ckpt_path)


# ---------------------------------------------------------------------------
# Genuine Saver-checkpoint roundtrips for the two RESNET import paths
# (tf-faster-rcnn and FPN_Tensorflow). The vgg16 paths above already have
# real .index/.data fixtures; these close the remaining two importers.
# ---------------------------------------------------------------------------

RESNET50_UNITS = (3, 4, 6, 3)  # slim block1..block4 == keras conv2..conv5


def _slim_resnet_conv_entries(depth=50):
    """(ckpt_conv_prefix, keras_conv_layer) pairs for a slim resnet_v1
    backbone, written from the published slim naming scheme
    (resnet_v1_{d}/block{i}/unit_{u}/bottleneck_v1/{shortcut,conv1-3}) and
    the keras-applications correspondence the reference hard-codes in its
    own import tables (resnet_faster_rcnn.py:295-446, resnet_fpn.py:553-640).
    Every conv also has a BatchNorm at prefix + 'BatchNorm/'."""
    pairs = [(f"resnet_v1_{depth}/conv1/", "conv1_conv")]
    for si, n_units in enumerate(RESNET50_UNITS, start=1):
        ks = f"conv{si + 1}"
        pairs.append(
            (
                f"resnet_v1_{depth}/block{si}/unit_1/bottleneck_v1/shortcut/",
                f"{ks}_block1_0_conv",
            )
        )
        for u in range(1, n_units + 1):
            for c in (1, 2, 3):
                pairs.append(
                    (
                        f"resnet_v1_{depth}/block{si}/unit_{u}/bottleneck_v1/conv{c}/",
                        f"{ks}_block{u}_{c}_conv",
                    )
                )
    return pairs


def _module_of(params, layer):
    for m, tree in params.items():
        if layer in tree:
            return m
    raise AssertionError(f"no module holds layer {layer!r}")


def _write_saver_ckpt(tf, tmp_path, values, name):
    g = tf.Graph()
    with g.as_default():
        tf_vars = {
            vn: tf.Variable(v, name=vn, dtype=tf.float32)
            for vn, v in values.items()
        }
        saver = tf.compat.v1.train.Saver(tf_vars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, str(tmp_path / name))


def _perturb(params):
    """Copy params with every leaf shifted so 'left untouched' is
    distinguishable from 'zero-filled' and from any written value."""
    import copy as _copy

    out = _copy.deepcopy(params)

    def rec(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                rec(v)
            else:
                tree[k] = np.asarray(v) + 7.5
    rec(out)
    return out


def _build_slim_resnet_ckpt_values(params, conv_entries, head_entries):
    """values dict for a genuine slim-style checkpoint: conv weights (NO
    biases — slim convs under BN have none) + BN 4-tuples, plus
    weights+biases for head/neck entries."""
    values = {}
    for prefix, layer in conv_entries:
        m = _module_of(params, layer)
        values[prefix + "weights"] = _fill_for(
            prefix + "weights", np.asarray(params[m][layer]["kernel"]).shape
        )
        bn_layer = layer[: -len("_conv")] + "_bn"
        mb = _module_of(params, bn_layer)
        for suffix in ("gamma", "beta", "moving_mean", "moving_variance"):
            name = prefix + "BatchNorm/" + suffix
            values[name] = _fill_for(
                name, np.asarray(params[mb][bn_layer][suffix]).shape
            )
    for prefix, layer in head_entries:
        m = _module_of(params, layer)
        values[prefix + "weights"] = _fill_for(
            prefix + "weights", np.asarray(params[m][layer]["kernel"]).shape
        )
        values[prefix + "biases"] = _fill_for(
            prefix + "biases", np.asarray(params[m][layer]["bias"]).shape
        )
    return values


def _assert_import_complete(new, values, conv_entries, head_entries):
    """Every mapped layer must land: conv kernels == ckpt weights, conv
    biases ZERO-FILLED (not the perturbed sentinel), BN 4-tuples == ckpt,
    head weights+biases == ckpt."""
    for prefix, layer in conv_entries:
        m = _module_of(new, layer)
        np.testing.assert_array_equal(
            new[m][layer]["kernel"], values[prefix + "weights"], err_msg=layer
        )
        if "bias" in new[m][layer]:
            np.testing.assert_array_equal(
                new[m][layer]["bias"],
                np.zeros_like(np.asarray(new[m][layer]["bias"])),
                err_msg=f"{layer} bias must be zero-filled (slim convs have "
                "no biases; reference zero-fills, resnet_faster_rcnn.py:385-388)",
            )
        bn_layer = layer[: -len("_conv")] + "_bn"
        mb = _module_of(new, bn_layer)
        for suffix in ("gamma", "beta", "moving_mean", "moving_variance"):
            np.testing.assert_array_equal(
                new[mb][bn_layer][suffix],
                values[prefix + "BatchNorm/" + suffix],
                err_msg=f"{bn_layer}/{suffix}",
            )
    for prefix, layer in head_entries:
        m = _module_of(new, layer)
        np.testing.assert_array_equal(
            new[m][layer]["kernel"], values[prefix + "weights"], err_msg=layer
        )
        np.testing.assert_array_equal(
            new[m][layer]["bias"], values[prefix + "biases"], err_msg=layer
        )


def test_real_resnet_tf_faster_rcnn_checkpoint_roundtrip(
    tmp_path, resnet50_det_params
):
    """Genuine Saver-written tf-faster-rcnn resnet50 checkpoint through
    apply_name_map + the eval-CLI flag path: extractor conv1-conv4, conv5 in
    the RoI head, rpn head, dense heads — the reference's import table
    (resnet_faster_rcnn.py:295-446) replayed against a real .index/.data
    family with independently generated names."""
    import argparse

    tf = pytest.importorskip("tensorflow")
    det, params = resnet50_det_params

    conv_entries = _slim_resnet_conv_entries(50)
    head_entries = [
        ("resnet_v1_50/rpn_conv/3x3/", "rpn_first_conv"),
        ("resnet_v1_50/rpn_cls_score/", "rpn_score_conv"),
        ("resnet_v1_50/rpn_bbox_pred/", "rpn_bbox_conv"),
        ("resnet_v1_50/cls_score/", "roi_head_score"),
        ("resnet_v1_50/bbox_pred/", "roi_head_bboxes"),
    ]
    # conv5 lives in the RoI head for the C4-style model
    assert _module_of(params, "conv5_block1_1_conv") == "roi_head"
    assert _module_of(params, "conv4_block1_1_conv") == "extractor"

    values = _build_slim_resnet_ckpt_values(params, conv_entries, head_entries)
    ckpt_path = _write_saver_ckpt(tf, tmp_path, values, "res50_faster_rcnn.ckpt")

    # importer level, from sentinel-perturbed params: proves every mapped
    # leaf is overwritten (zero-fill included), not left at init
    from tf_eager_object_detection_tpu.ref_import.importers import (
        load_tf_checkpoint_dict,
    )
    from tf_eager_object_detection_tpu.ref_import.name_maps import (
        resnet_tf_faster_rcnn_map,
    )

    tensors = load_tf_checkpoint_dict(ckpt_path)
    new = apply_name_map(_perturb(params), tensors, resnet_tf_faster_rcnn_map(50))
    _assert_import_complete(new, values, conv_entries, head_entries)

    # CLI flag path returns BGR eval format (reference feeds these imports
    # caffe/BGR images, eval_pascal.py:194-200)
    from tf_eager_object_detection_tpu.ref_import.cli import (
        add_import_flags,
        load_checkpoint_params,
    )

    parser = argparse.ArgumentParser()
    add_import_flags(parser)
    args = parser.parse_args(["--use_tf_faster_rcnn_model"])
    new_cli, fmt = load_checkpoint_params(det, ckpt_path, args)
    assert fmt == "bgr"
    np.testing.assert_array_equal(
        new_cli["roi_head"]["conv5_block3_3_conv"]["kernel"],
        values["resnet_v1_50/block4/unit_3/bottleneck_v1/conv3/weights"],
    )
    np.testing.assert_array_equal(
        new_cli["rpn_head"]["rpn_bbox_conv"]["bias"],
        values["resnet_v1_50/rpn_bbox_pred/biases"],
    )


@pytest.fixture(scope="module")
def fpn50_det_params():
    import jax

    from tf_eager_object_detection_tpu.config.config_factory import config_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    cfg = dict(config_factory("pascal", "fpn"))
    det = model_factory("fpn", "resnet50", cfg)
    return det, jax.device_get(det.init_params(jax.random.PRNGKey(0)))


def test_real_fpn_tensorflow_checkpoint_roundtrip(tmp_path, fpn50_det_params):
    """Genuine Saver-written FPN_Tensorflow checkpoint through the
    --use_fpn_tensorflow_model path: full resnet50 extractor (conv1-conv5),
    neck (build_P* / fuse_P* / reduce_dim_P*), shared rpn head, fc RoI head
    (reference import table: resnet_fpn.py:544-700)."""
    import argparse

    tf = pytest.importorskip("tensorflow")
    det, params = fpn50_det_params

    conv_entries = _slim_resnet_conv_entries(50)
    head_entries = [
        ("build_rpn/rpn_conv/3x3/", "rpn_first_conv"),
        ("build_rpn/rpn_cls_score/", "rpn_score_conv"),
        ("build_rpn/rpn_bbox_pred/", "rpn_bbox_conv"),
        ("Fast-RCNN/build_fc_layers/fc1/", "fc1"),
        ("Fast-RCNN/build_fc_layers/fc2/", "fc2"),
        ("Fast-RCNN/cls_fc/", "roi_head_score"),
        ("Fast-RCNN/reg_fc/", "roi_head_bboxes"),
        ("build_pyramid/build_P5/", "build_p5"),
        ("build_pyramid/build_P4/reduce_dim_P4/", "build_p4_reduce_dims"),
        ("build_pyramid/fuse_P4/", "build_p4"),
        ("build_pyramid/build_P3/reduce_dim_P3/", "build_p3_reduce_dims"),
        ("build_pyramid/fuse_P3/", "build_p3"),
        ("build_pyramid/build_P2/reduce_dim_P2/", "build_p2_reduce_dims"),
        ("build_pyramid/fuse_P2/", "build_p2"),
    ]
    # FPN keeps conv5 in the extractor (C5 feeds the neck, not the RoI head)
    assert _module_of(params, "conv5_block1_1_conv") == "extractor"

    values = _build_slim_resnet_ckpt_values(params, conv_entries, head_entries)
    ckpt_path = _write_saver_ckpt(tf, tmp_path, values, "fpn_tensorflow.ckpt")

    from tf_eager_object_detection_tpu.ref_import.importers import (
        load_tf_checkpoint_dict,
    )
    from tf_eager_object_detection_tpu.ref_import.name_maps import (
        fpn_tensorflow_map,
    )

    tensors = load_tf_checkpoint_dict(ckpt_path)
    new = apply_name_map(_perturb(params), tensors, fpn_tensorflow_map(50))
    _assert_import_complete(new, values, conv_entries, head_entries)

    from tf_eager_object_detection_tpu.ref_import.cli import (
        add_import_flags,
        load_checkpoint_params,
    )

    parser = argparse.ArgumentParser()
    add_import_flags(parser)
    args = parser.parse_args(["--use_fpn_tensorflow_model"])
    new_cli, fmt = load_checkpoint_params(det, ckpt_path, args)
    # FPN_Tensorflow trains on RGB images (reference wires these imports to
    # the rgb eval path, eval_pascal.py:196-200)
    assert fmt == "rgb"
    np.testing.assert_array_equal(
        new_cli["neck"]["build_p3"]["kernel"],
        values["build_pyramid/fuse_P3/weights"],
    )
    np.testing.assert_array_equal(
        new_cli["roi_head"]["fc1"]["kernel"],
        values["Fast-RCNN/build_fc_layers/fc1/weights"],
    )
