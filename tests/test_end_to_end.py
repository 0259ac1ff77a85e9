"""Full-pipeline integration test on a synthetic VOC dataset.

Builds a miniature VOC tree (solid rectangles on noise), generates tfrecords
with the framework's own writer, trains a small vgg16 Faster R-CNN for a few
dozen steps, then runs the eval path (im_detect -> VOC file writer ->
voc_eval) and the checkpoint round-trip. Asserts the plumbing: losses drop,
files appear, mAP computes, restore reproduces params.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("voc") / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(root / sub, exist_ok=True)
    rng = np.random.RandomState(0)
    ids = []
    for i in range(6):
        image_id = f"{i:06d}"
        ids.append(image_id)
        h, w = 96, 128
        img = rng.randint(0, 60, (h, w, 3), np.uint8)
        x1, y1 = rng.randint(5, 40), rng.randint(5, 30)
        x2, y2 = x1 + rng.randint(30, 60), y1 + rng.randint(30, 50)
        img[y1:y2, x1:x2] = [220, 30, 30]  # bright red box -> easy to learn
        Image.fromarray(img).save(root / "JPEGImages" / f"{image_id}.jpg")
        xml = f"""<annotation>
  <filename>{image_id}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  <object>
    <name>car</name><difficult>0</difficult>
    <bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
</annotation>"""
        (root / "Annotations" / f"{image_id}.xml").write_text(xml)
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids) + "\n")
    (root / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids) + "\n")
    return root


def _tiny_cfg():
    from tf_eager_object_detection_tpu.config.config_factory import config_factory

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg.update(
        {
            "image_min_size": 96,
            "image_max_size": 128,
            "tpu_image_buckets": [[96, 128], [128, 96]],
            "tpu_max_gt_boxes": 5,
            "rpn_proposal_train_pre_nms_sample_number": 512,
            "rpn_proposal_train_after_nms_sample_number": 128,
            "rpn_proposal_test_pre_nms_sample_number": 512,
            "rpn_proposal_test_after_nms_sample_number": 64,
            "roi_total_sample_number": 32,
            "roi_pos_sample_max_number": 8,
            "rpn_total_sample_number": 64,
            "rpn_pos_sample_max_number": 16,
            "max_objects_per_image": 5,
            "max_objects_per_class_per_image": 5,
            "learning_rate_multi_lrs": [1e-4, 1e-5],
            "learning_rate_multi_decay_steps": [10000],
        }
    )
    return cfg


def test_full_pipeline(voc_tree, tmp_path):
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.data.voc import create_pascal_tf_records
    from tf_eager_object_detection_tpu.data.pascal import (
        pascal_eval_iterator,
        pascal_train_batches,
    )
    from tf_eager_object_detection_tpu.evaluation.pascal_eval_files import (
        get_prediction_files,
    )
    from tf_eager_object_detection_tpu.evaluation.voc_eval import voc_eval
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
    from tf_eager_object_detection_tpu.training.train_step import (
        TrainState,
        make_train_step,
    )
    from tf_eager_object_detection_tpu.training.checkpoints import (
        CheckpointManager,
        load_params,
        save_params,
    )

    # 1) tfrecord generation from the VOC tree
    records = create_pascal_tf_records(
        str(voc_tree.parent), "2007", "trainval", str(tmp_path / "records"), 2
    )
    assert len(records) == 2 and all(os.path.exists(p) for p in records)

    cfg = _tiny_cfg()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, params, "vgg16")
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(det, opt)

    # 2) train a few dozen steps on the tfrecord pipeline
    batches = pascal_train_batches(
        records, cfg, batch_size=1, shuffle=True, repeat=True, seed=0
    )
    losses = []
    rng = jax.random.PRNGKey(1)
    for i, batch in zip(range(30), batches):
        rng, r = jax.random.split(rng)
        bt = tuple(
            jnp.asarray(batch[k])
            for k in ("images", "image_hw", "gt_boxes", "gt_mask", "gt_labels")
        )
        state, metrics = step(state, bt, r)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # optimization moves the loss (30 random-init CPU steps are too few to
    # demand monotone descent; real overfit runs live in scripts/)
    assert min(losses) < losses[0]

    # 3) checkpoint round-trip (orbax manager + npz params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state)
    state2 = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state2 = mgr.restore(state2)
    assert int(state2.step) == int(state.step)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    leaf2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf2))

    npz = str(tmp_path / "params.npz")
    save_params(npz, jax.device_get(state.params))
    p3 = load_params(npz)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(p3)[0]), np.asarray(leaf)
    )

    # 4) eval path: im_detect -> VOC detection files -> voc_eval
    iterator, image_ids = pascal_eval_iterator(str(voc_tree), "test", cfg)
    result_dir = tmp_path / "results"
    os.makedirs(result_dir)
    fmt = str(result_dir / "{:s}.txt")
    get_prediction_files(
        det, state.params, iterator, image_ids, fmt,
        max_objects_per_class=5, max_objects_per_image=5,
        min_size=4.0,
    )
    assert os.path.exists(fmt.format("car"))
    annopath = str(voc_tree / "Annotations" / "{:s}.xml")
    imageset = str(voc_tree / "ImageSets" / "Main" / "test.txt")
    rec, prec, ap = voc_eval(
        fmt, annopath, imageset, "car", str(tmp_path / "cache")
    )
    assert 0.0 <= ap <= 1.0  # plumbing works; quality needs real training
