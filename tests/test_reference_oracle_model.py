"""FULL-MODEL reference-as-oracle parity test.

Builds the reference's own `Vgg16FasterRcnn` keras model
(`/root/reference/object_detection/model/faster_rcnn/vgg16_faster_rcnn.py`,
random init — the pretrained-h5 download is patched out: zero egress),
copies its weights into the JAX detector THROUGH THE REAL IMPORTER
(`vgg16_tf_faster_rcnn_map` + `apply_name_map`, the same path third-party
checkpoints take), and asserts staged forward equality on a fixed image:

  1. extractor features (vgg16_faster_rcnn.py:260-343),
  2. RPN head outputs on identical features
     (base_faster_rcnn_model.py:309-351),
  3. the full `im_detect` pipeline — proposals + RoI pooling + RoI head
     (base_faster_rcnn_model.py:279-306) — row-for-row,
  4. our RoI stage re-driven on the REFERENCE's rois (isolates the RoI
     head from proposal ordering if stage 3 ever diverges).

Together with the util- and component-layer oracle tests this closes the
semantic-parity chain end-to-end: the reference's executing model and the
TPU port produce the same numbers from the same weights. The reference
source is treated as data; nothing from it is followed, only executed.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_oracle import _load_ref  # noqa: E402

IMAGE_HW = (224, 320)  # multiple of the stride; equals the bucket -> no padding


def _seed_all(seed):
    """Deterministic reference-model init regardless of test order: keras 3
    initializers draw from keras's own RNG, which tf.random.set_seed does
    NOT reset."""
    import keras

    keras.utils.set_random_seed(seed)
    tf.random.set_seed(seed)


@pytest.fixture(scope="module")
def ref_ns():
    bbox_tf = _load_ref("object_detection/utils/bbox_tf.py")
    bbox_transform = _load_ref("object_detection/utils/bbox_transform.py")
    anchors = _load_ref("object_detection/utils/anchor_generator.py")
    losses = _load_ref("object_detection/model/losses.py")
    utils = {
        "pairwise_iou": bbox_tf["pairwise_iou"],
        "bboxes_clip_filter": bbox_tf["bboxes_clip_filter"],
        "bboxes_clip_filter_tf": bbox_tf["bboxes_clip_filter"],
        "bboxes_range_filter": bbox_tf["bboxes_range_filter"],
        "decode_bbox_with_mean_and_std": bbox_transform[
            "decode_bbox_with_mean_and_std"
        ],
        "encode_bbox_with_mean_and_std": bbox_transform[
            "encode_bbox_with_mean_and_std"
        ],
    }
    region_proposal = _load_ref(
        "object_detection/model/region_proposal.py", inject=utils
    )
    anchor_target = _load_ref(
        "object_detection/model/anchor_target.py", inject=utils
    )
    proposal_target = _load_ref(
        "object_detection/model/proposal_target.py", inject=utils
    )
    prediction = _load_ref("object_detection/model/prediction.py", inject=utils)
    roi_pooling = _load_ref("object_detection/model/roi_pooling.py")
    base = _load_ref(
        "object_detection/model/faster_rcnn/base_faster_rcnn_model.py",
        src_replace={
            # keras 3 rejects non-tensor entries in a functional-call input
            # tuple; tensor-ify the python scalars (behavior-preserving)
            "image_shape = preprocessed_image.get_shape().as_list()[1:3]":
                "image_shape = tf.cast("
                "tf.shape(preprocessed_image)[1:3], tf.float32)",
            "(shared_features, rois, self._extractor_stride)":
                "(shared_features, rois, "
                "tf.constant(self._extractor_stride, tf.float32))",
            # --- training branch of call() (base_faster_rcnn_model.py:
            # 126-180), exercised by the gradient-oracle tests ---
            "image_shape = image.get_shape().as_list()[1:3]":
                "image_shape = tf.cast("
                "tf.shape(image)[1:3], tf.float32)",
            "(shared_features, final_rois, self._extractor_stride)":
                "(shared_features, final_rois, "
                "tf.constant(self._extractor_stride, tf.float32))",
            # keras 3 rejects a positional `training`; the two distinct
            # indentations pick out the anchor_target / proposal_target
            # call sites uniquely
            # (longer indent first: the shorter pattern is a substring)
            "\n" + " " * 109 + "training)":
                "\n" + " " * 109 + "training=training)",
            "\n" + " " * 96 + "training)":
                "\n" + " " * 96 + "training=training)",
        },
        inject={
            "RegionProposal": region_proposal["RegionProposal"],
            "AnchorTarget": anchor_target["AnchorTarget"],
            "ProposalTarget": proposal_target["ProposalTarget"],
            "RoiPoolingCropAndResize": roi_pooling["RoiPoolingCropAndResize"],
            "smooth_l1_loss": losses["smooth_l1_loss"],
            "cls_loss": losses["cls_loss"],
            "generate_by_anchor_base_tf": anchors["generate_by_anchor_base_tf"],
            "generate_anchor_base": anchors["generate_anchor_base"],
            "post_ops_prediction": prediction["post_ops_prediction"],
        },
    )
    vgg = _load_ref(
        "object_detection/model/faster_rcnn/vgg16_faster_rcnn.py",
        inject={"BaseFasterRcnn": base["BaseFasterRcnn"]},
        src_replace={
            # keras 3 rejects a positional `training` on Dropout.__call__;
            # keyword-ifying it is behavior-preserving
            "self._dropout1(x, training)": "self._dropout1(x, training=training)",
            "self._dropout2(x, training)": "self._dropout2(x, training=training)",
        },
    )
    # random init only — no imagenet download in this container
    vgg["Vgg16Extractor"]._load_keras_weights = lambda self: None
    vgg["Vgg16RoiHead"]._load_keras_weights = lambda self: None
    vgg["__base_ns__"] = base  # reused by the resnet/fpn fixtures
    vgg["__anchors_ns__"] = anchors
    vgg["__roi_pooling_ns__"] = roi_pooling
    return vgg


@pytest.fixture(scope="module")
def pair(ref_ns):
    """(reference model, our detector, our params) with identical weights."""
    import jax

    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory,
    )
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.ref_import.importers import (
        apply_name_map,
    )
    from tf_eager_object_detection_tpu.ref_import.name_maps import (
        vgg16_tf_faster_rcnn_map,
    )

    _seed_all(7)
    ref = ref_ns["Vgg16FasterRcnn"]()
    # build the lazily-built submodels once
    img = _fixed_image()
    ref.im_detect(tf.constant(img), 1.0)

    # serialize the reference keras layers under tf-faster-rcnn ckpt names
    # so the transfer exercises the real importer name map
    tensors = {}

    def put(prefix, layer):
        k, b = layer.get_weights()
        tensors[prefix + "weights"] = k
        tensors[prefix + "biases"] = b

    ext = ref._extractor
    for block, n in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3)):
        for i in range(1, n + 1):
            name = f"block{block}_conv{i}"
            put(f"vgg_16/conv{block}/conv{block}_{i}/", ext.get_layer(name))
    put("vgg_16/rpn_conv/3x3/", ref._rpn_head._rpn_conv)
    put("vgg_16/rpn_cls_score/", ref._rpn_head._rpn_score_conv)
    put("vgg_16/rpn_bbox_pred/", ref._rpn_head._rpn_bbox_conv)
    put("vgg_16/fc6/", ref._roi_head._fc1)
    put("vgg_16/fc7/", ref._roi_head._fc2)
    put("vgg_16/cls_score/", ref._roi_head._score_layer)
    put("vgg_16/bbox_pred/", ref._roi_head._roi_bboxes_layer)

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg["tpu_image_buckets"] = [list(IMAGE_HW)]
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    params = apply_name_map(params, tensors, vgg16_tf_faster_rcnn_map())
    return ref, det, params


def _fixed_image():
    rng = np.random.RandomState(42)
    # caffe-preprocessed value range (mean-subtracted BGR)
    return rng.uniform(-110.0, 110.0, (1, *IMAGE_HW, 3)).astype(np.float32)


# --------------------------------------------------------------- resnet50


def _randomize_batchnorms(keras_model, seed):
    """Give every BN layer non-trivial stats so the FrozenBatchNorm folding
    (gamma/beta/moving_mean/moving_variance -> scale/shift) is actually
    exercised — fresh-init BN (mean 0, var 1) would pass vacuously."""
    rng = np.random.RandomState(seed)
    for layer in keras_model.layers:
        ws = layer.get_weights()
        if len(ws) == 4 and "bn" in layer.name:
            c = ws[0].shape[0]
            layer.set_weights(
                [
                    rng.uniform(0.5, 1.5, c).astype(np.float32),
                    rng.normal(0, 0.1, c).astype(np.float32),
                    rng.normal(0, 0.5, c).astype(np.float32),
                    rng.uniform(0.5, 1.5, c).astype(np.float32),
                ]
            )


def _copy_keras_layers(params_module, keras_model):
    """Copy conv/dense/BN weights from a (built) keras model into one module
    of the params pytree, matching by layer name (our param names follow the
    keras-applications naming, models/backbones/resnet.py:11)."""
    copied = 0
    for layer in keras_model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        tgt = params_module.get(layer.name)
        assert tgt is not None, f"no target params for layer {layer.name}"
        if len(ws) == 4:
            for key, val in zip(
                ("gamma", "beta", "moving_mean", "moving_variance"), ws
            ):
                assert tgt[key].shape == val.shape
                tgt[key] = val.astype(np.float32)
        else:
            assert tgt["kernel"].shape == ws[0].shape
            tgt["kernel"] = ws[0]
            if len(ws) > 1:
                tgt["bias"] = ws[1]
        copied += 1
    assert copied > 0
    return copied


@pytest.fixture(scope="module")
def resnet_pair(ref_ns):
    import copy as _copy

    import jax

    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory,
    )
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    base_ns = ref_ns["__base_ns__"]
    resnet = _load_ref(
        "object_detection/model/faster_rcnn/resnet_faster_rcnn.py",
        inject={"BaseFasterRcnn": base_ns["BaseFasterRcnn"]},
    )
    resnet["WEIGHTS_HASHES"] = {}  # no pretrained download (zero egress)
    _seed_all(11)
    # the reference factory passes resnet_roi_pooling_max_pooling_flag=False
    # from its config (model_factory.py:117, config/faster_rcnn_config.py:10)
    # — the CLASS default True is never used
    ref = resnet["ResNetFasterRcnn"](
        depth=50, roi_pooling_max_pooling_flag=False
    )
    _randomize_batchnorms(ref._extractor, 3)
    _randomize_batchnorms(ref._roi_head, 4)
    img = _fixed_image()
    ref.im_detect(tf.constant(img), 1.0)  # build lazy submodels
    # De-degenerate the fixture: the randomized-BN features are O(100), so
    # fresh 0.01-std RPN bbox weights emit deltas of O(10) whose exp()
    # decodes every proposal to a border-clipped (often zero-area) box —
    # an all-duplicate NMS input whose survivor multiset is tie-order chaos
    # in ANY implementation. Scale the bbox conv down so deltas are O(0.2)
    # and boxes stay distinct; the transfer below copies the scaled
    # weights, so both models remain identical.
    k, b = ref._rpn_head._rpn_bbox_conv.get_weights()
    ref._rpn_head._rpn_bbox_conv.set_weights([k * 0.02, b])

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg["tpu_image_buckets"] = [list(IMAGE_HW)]
    det = model_factory("faster_rcnn", "resnet50", cfg)
    params = _copy.deepcopy(det.init_params(jax.random.PRNGKey(0)))
    _copy_keras_layers(params["extractor"], ref._extractor)
    _copy_keras_layers(params["roi_head"], ref._roi_head)
    _copy_keras_layers(
        params["rpn_head"],
        ref._rpn_head,
    )
    return ref, det, params


def test_resnet_extractor_features_match(resnet_pair):
    ref, det, params = resnet_pair
    img = _fixed_image()
    want = ref._extractor(tf.constant(img), training=False).numpy()
    got = np.asarray(
        det.extractor.apply({"params": params["extractor"]}, img)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_resnet_im_detect_matches_reference(resnet_pair):
    import jax.numpy as jnp

    ref, det, params = resnet_pair
    img = _fixed_image()
    ref_softmax, ref_deltas, ref_rois = (
        t.numpy() for t in ref.im_detect(tf.constant(img), 1.0)
    )
    hw = jnp.asarray(IMAGE_HW, jnp.int32)
    softmax, deltas, rois, valid = det.im_detect(
        params, jnp.asarray(img[0]), hw, 1.0
    )
    softmax, deltas, rois, valid = (
        np.asarray(softmax),
        np.asarray(deltas).reshape(softmax.shape[0], -1),
        np.asarray(rois),
        np.asarray(valid),
    )
    m = int(valid.sum())
    assert m == ref_rois.shape[0]
    # random weights yield many IDENTICAL border-clipped proposals whose
    # scores tie at float precision, so NMS selection order is not stable
    # across implementations — compare canonically ordered rows instead
    # (identical boxes carry identical head outputs, so sorting is safe)
    ours = _canonical(rois[:m])
    ref_order = _canonical(ref_rois)
    np.testing.assert_allclose(
        rois[:m][ours], ref_rois[ref_order], rtol=1e-3, atol=0.1
    )
    np.testing.assert_allclose(
        softmax[:m][ours], ref_softmax[ref_order], rtol=5e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        deltas[:m][ours], ref_deltas[ref_order], rtol=5e-3, atol=5e-3
    )


def _canonical(rois):
    key = np.round(rois, 2)
    return np.lexsort((key[:, 3], key[:, 2], key[:, 1], key[:, 0]))


# ------------------------------------------------------------------- FPN


FPN_IMAGE_HW = (256, 320)  # multiple of the p6 stride (64) -> no padding


@pytest.fixture(scope="module")
def fpn_pair(ref_ns):
    """Reference ResnetV1Fpn + our FPNDetector with identical weights.

    Covers the whole FPN-specific surface against the reference's
    executing code: the c2-c5 extractor split, the 0.5/0.5 neck fusion
    with TF1 resize_bilinear, the p6 subsample, `make_anchors` per level
    (the r3-fixed w/h order), the single NMS over concatenated levels,
    the log2 level assignment, per-level crop_and_resize at image-shape
    normalization, and the 1024-wide fc RoI head
    (base_fpn_model.py:202-434, resnet_fpn.py:292-560).
    """
    import copy as _copy

    import jax

    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory,
    )
    from tf_eager_object_detection_tpu.models.model_factory import model_factory

    base_ns = ref_ns["__base_ns__"]
    fpn_base = _load_ref(
        "object_detection/model/fpn/base_fpn_model.py",
        src_replace={
            # keras 3: tensor-ify the python scalars in keras-call tuples
            "image_shape = preprocessed_img.get_shape().as_list()[1:3]":
                "image_shape = tf.cast("
                "tf.shape(preprocessed_img)[1:3], tf.float32)",
        },
        inject={
            "RegionProposal": base_ns["RegionProposal"],
            "AnchorTarget": base_ns["AnchorTarget"],
            "ProposalTarget": base_ns["ProposalTarget"],
            "RoiPoolingCropAndResize": base_ns["RoiPoolingCropAndResize"],
            "RoiPoolingCropAndResize2": ref_ns["__roi_pooling_ns__"][
                "RoiPoolingCropAndResize2"
            ],
            "smooth_l1_loss": base_ns["smooth_l1_loss"],
            "cls_loss": base_ns["cls_loss"],
            "generate_by_anchor_base_tf": base_ns["generate_by_anchor_base_tf"],
            "generate_anchor_base": base_ns["generate_anchor_base"],
            "make_anchors": ref_ns["__anchors_ns__"]["make_anchors"],
            "post_ops_prediction": base_ns["post_ops_prediction"],
        },
    )
    fpn = _load_ref(
        "object_detection/model/fpn/resnet_fpn.py",
        inject={"BaseFPN": fpn_base["BaseFPN"]},
    )
    fpn["WEIGHTS_HASHES"] = {}  # no pretrained download (zero egress)
    _seed_all(23)
    ref = fpn["ResnetV1Fpn"](depth=50)
    _randomize_batchnorms(ref._extractor, 5)
    img = _fpn_image()
    ref.im_detect(tf.constant(img), 1.0)  # build lazy submodels
    # Condition the random-init fixture (see resnet_pair), adaptively and
    # identically in both models (the transfer below copies the rescaled
    # weights). Two knobs:
    # 1. The randomized-BN extractor makes the pyramid O(1e4); at that
    #    magnitude the 12.5k-term fc sums carry ~0.1 absolute float noise,
    #    which shows up as softmax diffs of 1e-2 — pure conditioning, not
    #    semantics. The neck is linear in its input convs, so scaling
    #    build_p5 + the lateral reduce_dims convs scales every level
    #    uniformly to O(10).
    p_all = ref._neck(
        ref._extractor(tf.constant(img), training=False), training=False
    )
    f = 10.0 / max(float(np.abs(p.numpy()).max()) for p in p_all)
    for lyr in (
        ref._neck._build_p5_conv,
        ref._neck._build_p4_reduce_dims,
        ref._neck._build_p3_reduce_dims,
        ref._neck._build_p2_reduce_dims,
    ):
        lyr.set_weights([w * f for w in lyr.get_weights()])
    # 2. Rescale the RPN convs so deltas are O(0.2) — beyond exp() range
    #    every box degenerates and the clamp-vs-no-clamp deviation changes
    #    proposal COUNTS — and logits O(4) (saturated softmax = exact-tie
    #    NMS chaos).
    p0 = ref._neck(
        ref._extractor(tf.constant(img), training=False), training=False
    )[0]
    s0, b0 = ref._rpn_head(p0)
    for conv, out, target in (
        (ref._rpn_head._rpn_score_conv, s0, 4.0),
        (ref._rpn_head._rpn_bbox_conv, b0, 0.2),
    ):
        f = target / max(1e-6, float(np.abs(out.numpy()).max()))
        k, b = conv.get_weights()
        conv.set_weights([k * f, b])

    cfg = dict(config_factory("pascal", "fpn"))
    cfg["tpu_image_buckets"] = [list(FPN_IMAGE_HW)]
    det = model_factory("fpn", "resnet50", cfg)
    params = _copy.deepcopy(det.init_params(jax.random.PRNGKey(0)))
    _copy_keras_layers(params["extractor"], ref._extractor)
    _copy_keras_layers(params["neck"], ref._neck)
    _copy_keras_layers(params["rpn_head"], ref._rpn_head)
    _copy_keras_layers(params["roi_head"], ref._roi_head)
    return ref, det, params


def _fpn_image():
    rng = np.random.RandomState(77)
    return rng.uniform(-110.0, 110.0, (1, *FPN_IMAGE_HW, 3)).astype(np.float32)


def test_fpn_pyramid_features_match(fpn_pair):
    ref, det, params = fpn_pair
    img = _fpn_image()
    c_ref = [t.numpy() for t in ref._extractor(tf.constant(img), training=False)]
    p_ref = [t.numpy() for t in ref._neck(c_ref, training=False)]
    import jax.numpy as jnp

    c_our = det.extractor.apply({"params": params["extractor"]}, img)
    p_our = det.neck.apply({"params": params["neck"]}, c_our)
    assert len(p_our) == len(p_ref) == 5
    for lvl, (a, b) in enumerate(zip(p_our, p_ref)):
        a = np.asarray(a)
        assert a.shape == b.shape, (lvl, a.shape, b.shape)
        # the randomized-BN extractor amplifies activations to O(1e5), so
        # absolute tolerance must scale with the feature magnitude
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * max(1.0, float(np.abs(b).max())),
            err_msg=f"p{lvl + 2}",
        )


def test_fpn_im_detect_matches_reference(fpn_pair):
    import jax.numpy as jnp

    ref, det, params = fpn_pair
    img = _fpn_image()
    ref_softmax, ref_deltas, ref_rois = (
        t.numpy() for t in ref.im_detect(tf.constant(img), 1.0)
    )
    hw = jnp.asarray(FPN_IMAGE_HW, jnp.int32)
    softmax, deltas, rois, valid = det.im_detect(
        params, jnp.asarray(img[0]), hw, 1.0
    )
    softmax, deltas, rois, valid = (
        np.asarray(softmax),
        np.asarray(deltas).reshape(np.asarray(softmax).shape[0], -1),
        np.asarray(rois),
        np.asarray(valid),
    )
    m = int(valid.sum())
    assert m == ref_rois.shape[0]
    # the reference reorders outputs level-grouped (_assign_levels); ours
    # keep NMS order — compare canonically ordered rows
    a = _canonical(rois[:m])
    b = _canonical(ref_rois)
    np.testing.assert_allclose(rois[:m][a], ref_rois[b], rtol=1e-3, atol=0.1)
    # O(1e4) randomized-BN crops -> fc logit noise -> softmax diffs of a
    # few 1e-3 are pure float accumulation, not semantics
    np.testing.assert_allclose(
        softmax[:m][a], ref_softmax[b], rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        deltas[:m][a], ref_deltas[b], rtol=5e-3, atol=5e-3
    )


def test_extractor_features_match(pair):
    ref, det, params = pair
    img = _fixed_image()
    want = ref._extractor(tf.constant(img), training=False).numpy()
    got = np.asarray(
        det.extractor.apply({"params": params["extractor"]}, img)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rpn_head_matches_on_identical_features(pair):
    ref, det, params = pair
    img = _fixed_image()
    feats = ref._extractor(tf.constant(img), training=False).numpy()
    ref_score, ref_bbox = ref._rpn_head(tf.constant(feats), training=False)
    score_map, bbox_map = det.rpn_head.apply(
        {"params": params["rpn_head"]}, feats
    )
    np.testing.assert_allclose(
        np.asarray(score_map).reshape(-1, 2 * det.num_anchors),
        ref_score.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(bbox_map).reshape(-1, 4),
        ref_bbox.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_im_detect_matches_reference(pair):
    """Full pipeline: proposals + RoI pooling + RoI head, same rows."""
    import jax.numpy as jnp

    ref, det, params = pair
    img = _fixed_image()
    ref_softmax, ref_deltas, ref_rois = (
        t.numpy() for t in ref.im_detect(tf.constant(img), 1.0)
    )

    hw = jnp.asarray(IMAGE_HW, jnp.int32)
    softmax, deltas, rois, valid = det.im_detect(
        params, jnp.asarray(img[0]), hw, 1.0
    )
    softmax, deltas, rois, valid = (
        np.asarray(softmax),
        np.asarray(deltas).reshape(softmax.shape[0], -1),
        np.asarray(rois),
        np.asarray(valid),
    )
    m = int(valid.sum())
    # identical proposal count out of NMS
    assert m == ref_rois.shape[0]
    # valid rows lead (region_proposal compacts), in NMS selection order
    np.testing.assert_allclose(rois[:m], ref_rois, rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(softmax[:m], ref_softmax, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(deltas[:m], ref_deltas, rtol=1e-3, atol=1e-3)


def test_roi_stage_on_reference_rois(pair):
    """Drive OUR RoI pooling + head on the REFERENCE's proposals."""
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.roi_align import (
        roi_crop_faster_rcnn,
    )

    ref, det, params = pair
    img = _fixed_image()
    ref_softmax, ref_deltas, ref_rois = (
        t.numpy() for t in ref.im_detect(tf.constant(img), 1.0)
    )
    feats = det.extractor.apply(
        {"params": params["extractor"]}, jnp.asarray(img)
    )[0]
    roi_feats = roi_crop_faster_rcnn(
        feats,
        jnp.asarray(ref_rois),
        det.stride,
        det.cfg["roi_pooling_size"],
        det.roi_max_pooling,
    )
    scores, deltas = det.roi_head.apply(
        {"params": params["roi_head"]}, roi_feats, train=False
    )
    softmax = np.asarray(jax.nn.softmax(scores, axis=-1))
    np.testing.assert_allclose(softmax, ref_softmax, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(deltas), ref_deltas, rtol=1e-3, atol=1e-3
    )
