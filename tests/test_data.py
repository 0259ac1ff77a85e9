"""Data pipeline tests: tfrecord codec round-trip (validated against TF),
VOC XML/example generation, preprocessing semantics."""

import io
import os

import numpy as np
import pytest

from tf_eager_object_detection_tpu.data import preprocessing as P
from tf_eager_object_detection_tpu.data.label_map import (
    get_label_map_dict,
    pascal_label_map_dict,
)
from tf_eager_object_detection_tpu.data.pascal import (
    parse_pascal_example,
    pascal_train_batches,
)
from tf_eager_object_detection_tpu.data.tfrecord import (
    TFRecordWriter,
    decode_example,
    encode_example,
    read_tfrecords,
)
from tf_eager_object_detection_tpu.data.voc import parse_voc_xml, voc_example


def _jpeg_bytes(h=37, w=53):
    from PIL import Image

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    return buf.getvalue()


def test_example_roundtrip():
    feats = {
        "image/height": ("int64", [375]),
        "image/encoded": ("bytes", [b"\x00\x01binary\xff"]),
        "image/object/bbox/xmin": ("float", [0.125, 0.5, 0.75]),
        "image/object/class/label": ("int64", [3, 17, -2]),
    }
    buf = encode_example(feats)
    out = decode_example(buf)
    assert out["image/height"] == ("int64", [375])
    assert out["image/encoded"][1] == [b"\x00\x01binary\xff"]
    np.testing.assert_allclose(out["image/object/bbox/xmin"][1], [0.125, 0.5, 0.75])
    assert out["image/object/class/label"][1] == [3, 17, -2]


def test_example_readable_by_tensorflow():
    tf = pytest.importorskip("tensorflow")
    feats = {
        "image/width": ("int64", [500]),
        "image/object/bbox/ymin": ("float", [0.25, 0.75]),
        "image/filename": ("bytes", [b"000001.jpg"]),
    }
    buf = encode_example(feats)
    ex = tf.train.Example()
    ex.ParseFromString(buf)
    assert ex.features.feature["image/width"].int64_list.value[0] == 500
    np.testing.assert_allclose(
        list(ex.features.feature["image/object/bbox/ymin"].float_list.value),
        [0.25, 0.75],
    )
    assert ex.features.feature["image/filename"].bytes_list.value[0] == b"000001.jpg"


def test_tfrecord_framing_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "test.tfrecords")
    with TFRecordWriter(path) as w:
        w.write(b"hello")
        w.write(b"world" * 100)
    got = [r.numpy() for r in tf.data.TFRecordDataset([path])]
    assert got == [b"hello", b"world" * 100]
    # and our reader agrees (with CRC check on)
    assert list(read_tfrecords(path, check_crc=True)) == [b"hello", b"world" * 100]


VOC_XML = """<annotation>
  <filename>000001.jpg</filename>
  <size><width>353</width><height>500</height><depth>3</depth></size>
  <object>
    <name>dog</name><pose>Left</pose><truncated>1</truncated><difficult>0</difficult>
    <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
  </object>
  <object>
    <name>person</name><difficult>1</difficult>
    <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
  </object>
</annotation>"""


def test_voc_xml_and_example(tmp_path):
    xml = tmp_path / "000001.xml"
    xml.write_text(VOC_XML)
    ann = parse_voc_xml(str(xml))
    assert ann["height"] == 500 and ann["width"] == 353
    assert [o["name"] for o in ann["objects"]] == ["dog", "person"]
    assert [o["difficult"] for o in ann["objects"]] == [0, 1]

    jpeg = _jpeg_bytes()
    rec = voc_example(ann, jpeg)
    image, boxes, labels = parse_pascal_example(rec)
    assert image.ndim == 3
    # normalized by (dim-1), -1 for 1-based coords
    np.testing.assert_allclose(boxes[0, 1], (48 - 1) / (353 - 1), rtol=1e-6)
    np.testing.assert_allclose(boxes[0, 0], (240 - 1) / (500 - 1), rtol=1e-6)
    assert labels.tolist() == [
        pascal_label_map_dict()["dog"],
        pascal_label_map_dict()["person"],
    ]


def test_label_map_parsing():
    text = """
item {
  id: 1
  name: 'aeroplane'
}
item {
  id: 2
  name: "bicycle"
}
"""
    d = get_label_map_dict(text)
    assert d == {"aeroplane": 1, "bicycle": 2}


def test_scale_rule():
    # min-side rule
    assert P.compute_scale(375, 500, 600, 1000) == 600 / 375
    # max-side clamps
    assert P.compute_scale(300, 900, 600, 1000) == pytest.approx(1000 / 900)


def test_preprocess_train_image():
    cfg = {
        "image_min_size": 600,
        "image_max_size": 1000,
        "bgr_pixel_means": [103.939, 116.779, 123.68],
        "tpu_max_gt_boxes": 10,
        "tpu_image_buckets": [[608, 1008], [1008, 608]],
    }
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (375, 500, 3), np.uint8)
    boxes01 = np.asarray([[0.1, 0.2, 0.5, 0.8]], np.float32)  # yxyx
    labels = np.asarray([7], np.int32)
    out_img, hw, boxes, mask, out_labels = P.preprocess_train_image(
        img, boxes01, labels, cfg, rng, augment=False
    )
    assert out_img.shape == (608, 1008, 3)
    assert hw.tolist() == [600, 800]
    assert mask.tolist() == [True] + [False] * 9
    # xyxy pixel coords on resized image: x1 = 0.2*(800-1)
    np.testing.assert_allclose(boxes[0], [0.2 * 799, 0.1 * 599, 0.8 * 799, 0.5 * 599], rtol=1e-5)
    assert out_labels[0] == 7
    # padding area is zeros == pixel mean after caffe normalization
    assert np.all(out_img[601:, :, :] == 0)


def test_hflip_boxes():
    rng = np.random.RandomState(3)  # first rand() < 0.5 -> flips
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    boxes = np.asarray([[0.0, 0.1, 0.5, 0.6]], np.float32)
    fimg, fboxes = P.random_hflip(img, boxes, np.random.RandomState(3))
    flipped = not np.array_equal(fimg, img)
    if flipped:
        np.testing.assert_allclose(fboxes[0], [0.0, 0.4, 0.5, 0.9], rtol=1e-6)
    else:
        np.testing.assert_allclose(fboxes, boxes)


def test_train_batches_end_to_end(tmp_path):
    # two tiny images through the full tfrecord -> batch pipeline
    jpeg = _jpeg_bytes(100, 150)
    ann = {
        "filename": "a.jpg",
        "height": 100,
        "width": 150,
        "objects": [
            {"name": "dog", "difficult": 0, "bbox": [10, 20, 60, 80]},
        ],
    }
    path = str(tmp_path / "t.tfrecords")
    with TFRecordWriter(path) as w:
        w.write(voc_example(ann, jpeg))
        w.write(voc_example(ann, jpeg))
    cfg = {
        "image_min_size": 60,
        "image_max_size": 100,
        "bgr_pixel_means": [103.939, 116.779, 123.68],
        "tpu_max_gt_boxes": 5,
        "tpu_image_buckets": [[64, 104]],
    }
    it = pascal_train_batches([path], cfg, batch_size=2, shuffle=False, repeat=False)
    batch = next(it)
    assert batch["images"].shape == (2, 64, 104, 3)
    assert batch["gt_boxes"].shape == (2, 5, 4)
    assert batch["gt_mask"][:, 0].all() and not batch["gt_mask"][:, 1:].any()
    assert batch["gt_labels"][0, 0] == pascal_label_map_dict()["dog"]


def test_pad_to_bucket_rejects_oversized_image():
    # A resized image bigger than every bucket must fail loudly instead of
    # silently cropping content that image_hw / gt boxes still reference
    # (ADVICE r1: preprocessing.py pad_to_bucket silent-crop hazard).
    img = np.zeros((64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="exceeds bucket"):
        P.pad_to_bucket(img, (32, 128))
    # exact fit still fine
    out = P.pad_to_bucket(img, (64, 64))
    assert out.shape == (64, 64, 3)
