"""Pascal VOC annotation parsing + tfrecord generation.

Replaces `scripts/generate_pascal_tf_records.py` + `tf_record_utils.py` with
a TF-free implementation writing the *same* Example schema the reference
parses (`pascal_tf_dataset_generator.py:9-33`):

    image/height, image/width       int64[1]
    image/filename, image/encoded   bytes[1]
    image/object/bbox/{xmin,xmax,ymin,ymax}  float (normalized by (dim-1),
        VOC 1-based coords -1: generate_pascal_tf_records.py:25-28)
    image/object/class/label        int64
    image/object/class/text         bytes

Sharding matches the reference: round-robin over N writers
(generate_pascal_tf_records.py:84), filenames `pascal_{year}_{mode}_%02d.tfrecords`.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

from tf_eager_object_detection_tpu.data.label_map import pascal_label_map_dict
from tf_eager_object_detection_tpu.data.tfrecord import TFRecordWriter, encode_example

__all__ = ["parse_voc_xml", "voc_example", "create_pascal_tf_records"]


def parse_voc_xml(xml_path: str) -> dict:
    """VOC annotation XML -> {filename, size, objects:[{name, bbox, difficult}]}."""
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    objects = []
    for obj in root.findall("object"):
        bb = obj.find("bndbox")
        objects.append(
            {
                "name": obj.find("name").text,
                "difficult": int((obj.find("difficult").text or 0) if obj.find("difficult") is not None else 0),
                "pose": obj.find("pose").text if obj.find("pose") is not None else "",
                "truncated": int(obj.find("truncated").text) if obj.find("truncated") is not None else 0,
                "bbox": [
                    float(bb.find("xmin").text),
                    float(bb.find("ymin").text),
                    float(bb.find("xmax").text),
                    float(bb.find("ymax").text),
                ],
            }
        )
    return {
        "filename": root.find("filename").text,
        "height": int(size.find("height").text),
        "width": int(size.find("width").text),
        "objects": objects,
    }


def voc_example(
    ann: dict, jpeg_bytes: bytes, label_map: Optional[Dict[str, int]] = None
) -> bytes:
    """One annotation + encoded jpeg -> serialized Example (reference schema)."""
    label_map = label_map or pascal_label_map_dict()
    h, w = ann["height"], ann["width"]
    xmin, xmax, ymin, ymax, labels, texts = [], [], [], [], [], []
    for obj in ann["objects"]:
        x1, y1, x2, y2 = obj["bbox"]
        # VOC coords are 1-based; normalize by (dim - 1) like the reference.
        xmin.append((x1 - 1.0) / (w - 1.0))
        xmax.append((x2 - 1.0) / (w - 1.0))
        ymin.append((y1 - 1.0) / (h - 1.0))
        ymax.append((y2 - 1.0) / (h - 1.0))
        labels.append(label_map[obj["name"]])
        texts.append(obj["name"].encode())
    return encode_example(
        {
            "image/height": ("int64", [h]),
            "image/width": ("int64", [w]),
            "image/filename": ("bytes", [ann["filename"].encode()]),
            "image/encoded": ("bytes", [jpeg_bytes]),
            "image/object/bbox/xmin": ("float", xmin),
            "image/object/bbox/xmax": ("float", xmax),
            "image/object/bbox/ymin": ("float", ymin),
            "image/object/bbox/ymax": ("float", ymax),
            "image/object/class/label": ("int64", labels),
            "image/object/class/text": ("bytes", texts),
        }
    )


def create_pascal_tf_records(
    voc_root: str,
    year: str,
    mode: str,
    output_dir: str,
    num_shards: int = 5,
    label_map: Optional[Dict[str, int]] = None,
) -> List[str]:
    """VOC{year} tree -> sharded tfrecords; returns written paths."""
    base = os.path.join(voc_root, f"VOC{year}")
    with open(os.path.join(base, "ImageSets", "Main", f"{mode}.txt")) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    os.makedirs(output_dir, exist_ok=True)
    paths = [
        os.path.join(output_dir, f"pascal_{year}_{mode}_{i:02d}.tfrecords")
        for i in range(num_shards)
    ]
    writers = [TFRecordWriter(p) for p in paths]
    for idx, image_id in enumerate(ids):
        ann = parse_voc_xml(os.path.join(base, "Annotations", f"{image_id}.xml"))
        with open(os.path.join(base, "JPEGImages", f"{image_id}.jpg"), "rb") as f:
            jpeg = f.read()
        writers[idx % num_shards].write(voc_example(ann, jpeg, label_map))
    for w in writers:
        w.close()
    return paths
