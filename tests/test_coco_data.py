"""COCO dataset + dataset_factory tests with a synthetic COCO tree."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        h, w = 96, 128
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": 100 + i, "file_name": name, "height": h, "width": w})
        for _ in range(2):
            x, y = int(rng.randint(0, 60)), int(rng.randint(0, 40))
            bw, bh = int(rng.randint(10, 40)), int(rng.randint(10, 40))
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": 100 + i,
                    "category_id": int(rng.choice([1, 18, 90])),
                    "bbox": [x, y, bw, bh],
                    "area": bw * bh,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    # one tiny image that must be filtered (min edge < 32)
    arr = rng.randint(0, 255, (16, 100, 3), np.uint8)
    Image.fromarray(arr).save(img_dir / "tiny.jpg")
    images.append({"id": 999, "file_name": "tiny.jpg", "height": 16, "width": 100})
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 18, "name": "dog"},
            {"id": 90, "name": "toothbrush"},
        ],
    }
    ann_path = root / "instances.json"
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(img_dir)


def _cfg():
    return {
        "image_min_size": 60,
        "image_max_size": 100,
        "bgr_pixel_means": [102.9801, 115.9465, 122.7717],
        "tpu_max_gt_boxes": 6,
        "tpu_image_buckets": [[64, 104]],
    }


def test_coco_dataset_index(coco_tree):
    from tf_eager_object_detection_tpu.data.coco import CocoDataset

    ann, img_dir = coco_tree
    ds = CocoDataset(ann, img_dir)
    assert len(ds) == 4  # tiny image filtered out
    # contiguous remap in sorted cat-id order: 1->1, 18->2, 90->3
    assert ds.cat_id_to_label == {1: 1, 18: 2, 90: 3}
    assert ds.label_to_cat_id[3] == 90
    path, boxes, labels, h, w, img_id = ds.item(0)
    assert boxes.shape[1] == 4 and (boxes >= 0).all() and (boxes <= 1).all()
    assert labels.min() >= 1 and labels.max() <= 3


def test_coco_train_batches_and_factory(coco_tree):
    from tf_eager_object_detection_tpu.data.dataset_factory import dataset_factory

    ann, img_dir = coco_tree
    cfg = _cfg()
    it = dataset_factory(
        "coco",
        "train",
        {
            "model_config": cfg,
            "annotation_file": ann,
            "image_dir": img_dir,
            "batch_size": 2,
            "shuffle": False,
            "repeat": False,
        },
    )
    batch = next(it)
    assert batch["images"].shape == (2, 64, 104, 3)
    assert batch["gt_boxes"].shape == (2, 6, 4)
    assert batch["gt_mask"][:, :2].all()
    assert batch["gt_labels"][batch["gt_mask"]].min() >= 1


def test_coco_eval_iterator(coco_tree):
    from tf_eager_object_detection_tpu.data.dataset_factory import dataset_factory

    ann, img_dir = coco_tree
    it, ds = dataset_factory(
        "coco",
        "val",
        {"model_config": _cfg(), "annotation_file": ann, "image_dir": img_dir},
    )
    items = list(it)
    assert len(items) == 4
    img, hw, scale, raw_h, raw_w, img_id = items[0]
    assert img.shape == (64, 104, 3)
    assert raw_h == 96 and raw_w == 128
    assert img_id in (100, 101, 102, 103)


def test_coco80_rehearsal_generator(tmp_path):
    """The 80-class COCO twin generator (scripts/coco_rehearsal.py) must
    emit valid COCO JSON with the REAL gapped category-id space, and its
    crowd annotations must be excluded from training by CocoDataset while
    remaining visible to the evaluator."""
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"),
    )
    from coco_rehearsal import COCO_CAT_IDS, generate

    from tf_eager_object_detection_tpu.data.coco import CocoDataset

    assert len(COCO_CAT_IDS) == 80
    assert COCO_CAT_IDS[0] == 1 and COCO_CAT_IDS[-1] == 90
    missing = sorted(set(range(1, 91)) - set(COCO_CAT_IDS))
    assert missing == [12, 26, 29, 30, 45, 66, 68, 69, 71, 83]

    root = str(tmp_path)
    generate(root, n_train=5, n_val=3, seed=1)
    for split, n in (("train", 5), ("val", 3)):
        with open(os.path.join(root, f"instances_{split}.json")) as f:
            data = json.load(f)
        assert len(data["images"]) == n
        assert [c["id"] for c in data["categories"]] == COCO_CAT_IDS
        for a in data["annotations"]:
            assert a["category_id"] in COCO_CAT_IDS
            x, y, w, h = a["bbox"]
            assert w > 0 and h > 0 and x >= 0 and y >= 0

    ds = CocoDataset(
        os.path.join(root, "instances_train.json"),
        os.path.join(root, "images"),
    )
    with open(os.path.join(root, "instances_train.json")) as f:
        train = json.load(f)
    n_crowd = sum(a["iscrowd"] for a in train["annotations"])
    n_loaded = sum(
        len(ds.item(i)[1]) for i in range(len(ds))
    )
    assert n_loaded == len(train["annotations"]) - n_crowd
    # the contiguous remap must cover the gapped id space in sorted order
    assert ds.cat_id_to_label == {c: i + 1 for i, c in enumerate(COCO_CAT_IDS)}
