"""Native fused image pipeline (native/image_decode.cc via
data/native_image.py) vs the bit-pinned python path
(data/preprocessing.py).

The python path is the reference twin (tf_dataset_utils.py /
eval_pascal_tf_dataset.py semantics, oracle-pinned in
tests/test_reference_oracle_data.py); these tests pin the native path to
the python path: metadata (resized hw, scale, buckets, boxes, masks,
labels, flip decisions) must be EXACT, pixels must agree to bilinear
rounding when the two JPEG decoders agree bit-for-bit (they do on this
image: same libjpeg) and to +/- a couple of uint8 counts otherwise.
"""

import numpy as np
import pytest

from tf_eager_object_detection_tpu.data import native_image as ni
from tf_eager_object_detection_tpu.data import preprocessing as pp

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not ni.available(), reason="libimage_decode.so not built"
)

CFG = {
    "image_min_size": 600,
    "image_max_size": 1000,
    "bgr_pixel_means": [103.939, 116.779, 123.68],
    "tpu_image_buckets": [[608, 1008], [1008, 608]],
    "tpu_max_gt_boxes": 8,
}


def _photo(h, w, seed=0):
    """Smooth photo-like uint8 image (JPEG-friendly gradients)."""
    rng = np.random.RandomState(seed)
    img = np.cumsum(rng.randn(h, w, 3), axis=1) * 8 + 128
    return np.clip(img, 0, 255).astype(np.uint8)


def _jpeg(img_rgb, quality=92):
    ok, enc = cv2.imencode(
        ".jpg", img_rgb[:, :, ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), quality]
    )
    assert ok
    return enc.tobytes()


def _pixel_tolerances(jpeg):
    """(atol, q999) for f32 comparisons, by decoder agreement."""
    d_cv = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)[
        ..., ::-1
    ]
    d_na = ni.decode_jpeg_rgb(jpeg)
    decode_diff = int(np.abs(d_cv.astype(int) - d_na.astype(int)).max())
    if decode_diff == 0:
        return 1e-3, 1e-4  # pure bilinear f32 rounding
    assert decode_diff <= 2, "JPEG decoders disagree by more than 2 counts"
    return 3.0, 1.5


def test_decode_matches_cv2():
    jpeg = _jpeg(_photo(120, 170))
    d_cv = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)[
        ..., ::-1
    ]
    d_na = ni.decode_jpeg_rgb(jpeg)
    assert d_na.shape == d_cv.shape
    diff = np.abs(d_cv.astype(int) - d_na.astype(int))
    # same underlying libjpeg -> bit-exact here; allow +/-1 on a few
    # pixels for foreign builds
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_jpeg_dims_and_errors():
    jpeg = _jpeg(_photo(77, 130))
    assert ni.jpeg_dims(jpeg) == (77, 130)
    with pytest.raises(ValueError):
        ni.jpeg_dims(b"not a jpeg at all")
    with pytest.raises(ValueError):
        ni.decode_preprocess(
            b"junk", 10, 10, (16, 16), 0, CFG["bgr_pixel_means"]
        )


@pytest.mark.parametrize("hw", [(375, 500), (500, 375), (900, 1200)])
def test_eval_parity(hw):
    jpeg = _jpeg(_photo(*hw))
    atol, q999 = _pixel_tolerances(jpeg)
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)[
        ..., ::-1
    ]
    p = pp.preprocess_eval_image(img, CFG)
    n = ni.preprocess_eval_bytes(jpeg, CFG)
    assert p[0].shape == n[0].shape  # same bucket
    np.testing.assert_array_equal(p[1], n[1])  # resized hw
    assert p[2] == n[2] and p[3] == n[3] and p[4] == n[4]
    d = np.abs(p[0] - n[0])
    assert d.max() <= atol
    assert np.percentile(d, 99.9) <= q999
    # pad region stays zero
    nh, nw = n[1]
    assert not n[0][nh:].any() and not n[0][:, nw:].any()


@pytest.mark.parametrize("image_format", [None, "rgb", "bgr"])
@pytest.mark.parametrize("ptype", ["caffe", "tf"])
def test_eval_parity_formats(ptype, image_format):
    jpeg = _jpeg(_photo(200, 300, seed=3))
    atol, _ = _pixel_tolerances(jpeg)
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)[
        ..., ::-1
    ]
    cfg = dict(CFG, image_min_size=150, image_max_size=320,
               tpu_image_buckets=[[160, 256], [256, 160]])
    p = pp.preprocess_eval_image(img, cfg, ptype, image_format=image_format)
    n = ni.preprocess_eval_bytes(jpeg, cfg, ptype, image_format=image_format)
    np.testing.assert_array_equal(p[1], n[1])
    assert np.abs(p[0] - n[0]).max() <= atol


def test_train_parity_and_flip_rng_stream():
    jpeg = _jpeg(_photo(375, 500, seed=7))
    atol, _ = _pixel_tolerances(jpeg)
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)[
        ..., ::-1
    ]
    boxes01 = np.asarray(
        [[0.1, 0.2, 0.5, 0.6], [0.0, 0.0, 1.0, 1.0]], np.float32
    )
    labels = np.asarray([3, 17], np.int32)
    flips = []
    for seed in range(8):
        r_py = np.random.RandomState(seed)
        r_na = np.random.RandomState(seed)
        p = pp.preprocess_train_image(img, boxes01, labels, CFG, r_py)
        n = ni.preprocess_train_bytes(jpeg, boxes01, labels, CFG, r_na)
        np.testing.assert_array_equal(p[1], n[1])
        np.testing.assert_array_equal(p[2], n[2])  # boxes: exact
        np.testing.assert_array_equal(p[3], n[3])
        np.testing.assert_array_equal(p[4], n[4])
        assert np.abs(p[0] - n[0]).max() <= atol
        # both consumed one rand() -> identical continuation stream
        assert r_py.rand() == r_na.rand()
        flips.append(bool(np.random.RandomState(seed).rand() < 0.5))
    assert any(flips) and not all(flips)  # both branches exercised


def test_train_batches_native_flag(tmp_path):
    """pascal_train_batches with tpu_native_decode=True matches the
    python-path batches (same seeds -> same flips/buckets/boxes)."""
    from tf_eager_object_detection_tpu.data.pascal import (
        pascal_train_batches,
    )
    from tf_eager_object_detection_tpu.data.tfrecord import TFRecordWriter
    from tf_eager_object_detection_tpu.data.voc import voc_example

    jpeg = _jpeg(_photo(100, 150, seed=1))
    atol, _ = _pixel_tolerances(jpeg)
    ann = {
        "filename": "a.jpg", "height": 100, "width": 150,
        "objects": [{"name": "dog", "difficult": 0, "bbox": [10, 20, 60, 80]}],
    }
    path = str(tmp_path / "t.tfrecords")
    with TFRecordWriter(path) as w:
        for _ in range(3):
            w.write(voc_example(ann, jpeg))
    cfg = {
        "image_min_size": 60, "image_max_size": 100,
        "bgr_pixel_means": [103.939, 116.779, 123.68],
        "tpu_max_gt_boxes": 5, "tpu_image_buckets": [[64, 104]],
        "tpu_native_decode": False,
    }
    b_py = next(pascal_train_batches([path], cfg, batch_size=3, seed=5,
                                     shuffle=False, repeat=False))
    cfg["tpu_native_decode"] = True
    b_na = next(pascal_train_batches([path], cfg, batch_size=3, seed=5,
                                     shuffle=False, repeat=False))
    assert b_py["images"].shape == b_na["images"].shape
    np.testing.assert_array_equal(b_py["image_hw"], b_na["image_hw"])
    np.testing.assert_array_equal(b_py["gt_boxes"], b_na["gt_boxes"])
    np.testing.assert_array_equal(b_py["gt_mask"], b_na["gt_mask"])
    np.testing.assert_array_equal(b_py["gt_labels"], b_na["gt_labels"])
    assert np.abs(b_py["images"] - b_na["images"]).max() <= atol
