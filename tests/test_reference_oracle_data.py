"""Reference-as-oracle tests for the DATA layer (SURVEY D2/D4).

Executes the reference's own preprocessing code — `tf_dataset_utils.py`
(_caffe_preprocessing, _tf_preprocessing, preprocessing_training_func) and
the cv2 eval pipeline `eval_pascal_tf_dataset.get_dataset_by_local_file`
(driven end-to-end over a synthetic VOC tree) — and asserts
`data/preprocessing.py` produces the same numbers.

Resize-convention note: the reference uses TWO different bilinear resizes —
cv2.resize (half-pixel sampling) on the EVAL path that produced every
published mAP (eval_pascal_tf_dataset.py:49), but TF1's legacy
`tf.image.resize_bilinear` (corner-origin sampling, align_corners=False) on
the TRAIN path (tf_dataset_utils.py:116). Our single implementation is
cv2/half-pixel, i.e. exactly the eval path. The train-path delta is a
bounded sub-pixel sampling shift (each output pixel of a C1 image moves by
at most the image gradient x 0.5px); the train test below pins everything
around the resize exactly (normalization, new-size rule, box
denormalization) and bounds the pixel delta on a smooth fixture.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_oracle import _load_ref  # noqa: E402

from tf_eager_object_detection_tpu.data.preprocessing import (  # noqa: E402
    caffe_normalize,
    preprocess_eval_image,
    preprocess_train_image,
    tf_normalize,
)

MEANS = [102.9801, 115.9465, 122.7717]


@pytest.fixture(scope="module")
def ref_prep():
    # imgaug is not installed here; only image_argument_with_imgaug needs it
    # and these tests never call that function
    return _load_ref(
        "object_detection/dataset/utils/tf_dataset_utils.py",
        src_replace={
            "import imgaug as ia": "ia = None",
            "from imgaug import augmenters as iaa": "iaa = None",
        },
    )


@pytest.fixture(scope="module")
def ref_eval_ds():
    return _load_ref("object_detection/dataset/eval_pascal_tf_dataset.py")


def _cfg(**over):
    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory,
    )

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg["bgr_pixel_means"] = MEANS
    cfg.update(over)
    return cfg


# ------------------------------------------------------------- normalization


def test_caffe_preprocessing_matches_reference(ref_prep):
    """RGB -> BGR minus pixel means (tf_dataset_utils.py:55-71)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3)).astype(np.uint8)
    want = ref_prep["_caffe_preprocessing"](
        tf.constant(img), pixel_means=MEANS
    ).numpy()
    got = caffe_normalize(img, MEANS)
    np.testing.assert_array_equal(got, want)


def test_tf_preprocessing_matches_reference(ref_prep):
    """uint8 -> [-1, 1] (tf_dataset_utils.py:74-80)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (21, 33, 3)).astype(np.uint8)
    want = ref_prep["_tf_preprocessing"](tf.constant(img)).numpy()
    got = tf_normalize(img)
    np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------- train path


def test_training_func_matches_reference(ref_prep):
    """preprocessing_training_func (tf_dataset_utils.py:83-126) vs
    preprocess_train_image(augment=False): new-size rule, box
    denormalization by (new_dim - 1), yxyx ordering, normalization; pixel
    values bounded by the documented resize-sampling delta (module
    docstring) on a smooth fixture."""
    h, w = 43, 67
    # smooth low-frequency image: bounds the train-resize convention delta
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            80 + 60 * np.sin(yy / 17) ,
            90 + 50 * np.cos(xx / 23),
            100 + 40 * np.sin((xx + yy) / 29),
        ],
        -1,
    ).astype(np.uint8)
    rng = np.random.RandomState(2)
    boxes01 = np.asarray(
        [[0.1, 0.2, 0.6, 0.7], [0.3, 0.05, 0.95, 0.5]], np.float32
    )  # yxyx in [0, 1]
    labels = np.asarray([3, 11], np.int32)
    min_size, max_size = 96, 160

    ref_img, ref_boxes, ref_labels = ref_prep["preprocessing_training_func"](
        tf.constant(img[None]),
        tf.constant(boxes01),
        tf.constant([h], tf.int64),
        tf.constant([w], tf.int64),
        tf.constant(labels),
        min_size,
        max_size,
        "caffe",
        caffe_pixel_means=MEANS,
    )
    ref_img = ref_img.numpy()[0]
    ref_boxes = ref_boxes.numpy()

    cfg = _cfg(
        image_min_size=min_size,
        image_max_size=max_size,
        tpu_image_buckets=[[160, 256]],
        tpu_max_gt_boxes=4,
    )
    got_img, got_hw, got_boxes, got_mask, got_labels = preprocess_train_image(
        img, boxes01, labels, cfg, rng, augment=False,
        preprocessing_type="caffe",
    )

    # the new-size rule int(scale * dim) must agree exactly
    assert tuple(got_hw) == ref_img.shape[:2]
    # boxes: ours pixel xyxy, reference pixel yxyx
    want_xyxy = ref_boxes[:, [1, 0, 3, 2]]
    np.testing.assert_allclose(got_boxes[:2], want_xyxy, rtol=1e-6, atol=1e-4)
    assert got_mask[:2].all() and not got_mask[2:].any()
    np.testing.assert_array_equal(got_labels[:2], ref_labels.numpy())
    # pixels: cv2 half-pixel vs TF1 legacy sampling differ by <= grad * ~1px;
    # the fixture's max per-pixel gradient is ~60/17 * pi/2 ~ 6 levels
    nh, nw = ref_img.shape[:2]
    diff = np.abs(got_img[:nh, :nw] - ref_img)
    assert diff.mean() < 2.0 and diff.max() < 20.0, (
        diff.mean(), diff.max()
    )


# ------------------------------------------------------------- eval path


def _fake_voc(tmp_path, names_images):
    root = tmp_path / "VOC2007"
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "JPEGImages").mkdir(parents=True)
    with open(root / "ImageSets" / "Main" / "test.txt", "w") as f:
        for name, img in names_images:
            f.write(name + "\n")
            cv2.imwrite(str(root / "JPEGImages" / (name + ".jpg")), img)
    return str(root)


@pytest.mark.parametrize("image_format", ["bgr", "rgb"])
def test_eval_pipeline_matches_reference_exactly(
    ref_eval_ds, tmp_path, image_format
):
    """The mAP-bearing path: the reference's cv2 eval dataset
    (eval_pascal_tf_dataset.py:11-62, driven end-to-end over a synthetic VOC
    tree) vs preprocess_eval_image — bit-exact, both image formats
    ('rgb' is the FPN_Tensorflow import configuration)."""
    rng = np.random.RandomState(3)
    imgs = [
        ("000001", rng.randint(0, 256, (48, 71, 3)).astype(np.uint8)),
        ("000002", rng.randint(0, 256, (81, 47, 3)).astype(np.uint8)),
    ]
    root = _fake_voc(tmp_path, imgs)
    min_edge, max_edge = 96, 160

    ds, examples = ref_eval_ds["get_dataset_by_local_file"](
        "test", root, image_format=image_format,
        preprocessing_type="caffe", caffe_pixel_means=MEANS,
        min_edge=min_edge, max_edge=max_edge,
    )
    assert examples == [n for n, _ in imgs]

    cfg = _cfg(
        image_min_size=min_edge,
        image_max_size=max_edge,
        tpu_image_buckets=[[160, 256], [256, 160]],
    )
    for (name, _), batch in zip(imgs, ds):
        ref_img, ref_scale, ref_h, ref_w = (t.numpy() for t in batch)
        ref_img = ref_img[0]

        bgr = cv2.imread(os.path.join(root, "JPEGImages", name + ".jpg"))
        got_img, got_hw, got_scale, got_h, got_w = preprocess_eval_image(
            bgr[..., ::-1].copy(), cfg, preprocessing_type="caffe",
            image_format=image_format,
        )
        assert (got_h, got_w) == (int(ref_h[0]), int(ref_w[0]))
        np.testing.assert_allclose(got_scale, float(ref_scale[0]), rtol=1e-9)
        nh, nw = ref_img.shape[:2]
        assert tuple(got_hw) == (nh, nw)
        np.testing.assert_array_equal(got_img[:nh, :nw], ref_img)
        # padding beyond the valid extent is zeros
        assert not got_img[nh:].any() and not got_img[:, nw:].any()
