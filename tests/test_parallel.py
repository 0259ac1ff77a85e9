"""Data-parallel train step == single-device train step (8 virtual devices).

The reference is single-GPU batch-1; our scale-out axis is SPMD DP over a
mesh (parallel/mesh.py). This checks the sharded step is numerically the
same program: same loss, same updated params, with XLA inserting the
gradient all-reduce.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_eager_object_detection_tpu.config.config_factory import config_factory
from tf_eager_object_detection_tpu.models.model_factory import model_factory
from tf_eager_object_detection_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
from tf_eager_object_detection_tpu.training.train_step import (
    TrainState,
    make_train_step,
)


def _small_cfg():
    cfg = dict(config_factory("pascal", "faster_rcnn"))
    cfg.update(
        {
            "rpn_proposal_train_pre_nms_sample_number": 256,
            "rpn_proposal_train_after_nms_sample_number": 64,
            "roi_total_sample_number": 32,
            "roi_pos_sample_max_number": 8,
            "rpn_total_sample_number": 64,
            "rpn_pos_sample_max_number": 32,
            "tpu_image_buckets": [[64, 64]],
            "tpu_max_gt_boxes": 4,
        }
    )
    return cfg


def _batch(cfg, b):
    rng = np.random.RandomState(0)
    h, w = cfg["tpu_image_buckets"][0]
    images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    hw = jnp.asarray([[h, w]] * b, jnp.int32)
    g = cfg["tpu_max_gt_boxes"]
    gt = np.zeros((b, g, 4), np.float32)
    gt[:, 0] = [8.0, 8.0, 40.0, 44.0]
    gt[:, 1] = [20.0, 28.0, 60.0, 60.0]
    mask = np.zeros((b, g), bool)
    mask[:, :2] = True
    labels = np.zeros((b, g), np.int32)
    labels[:, 0] = 3
    labels[:, 1] = 11
    return (images, hw, jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(labels))


def test_dp_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = _small_cfg()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, params, "vgg16")
    batch = _batch(cfg, 8)
    rng = jax.random.PRNGKey(7)

    # the train steps donate their input state, so each state gets its own
    # deep copy of params/opt_state (donation would otherwise delete buffers
    # shared between them)
    def fresh_state():
        p = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    mesh = make_mesh(8)
    state8 = replicate(fresh_state(), mesh)
    sharded = shard_batch(batch, mesh)

    step1 = make_train_step(det, opt)
    state1, m1 = step1(fresh_state(), batch, rng)

    step8 = make_parallel_train_step(det, opt, mesh)
    state8, m8 = step8(state8, sharded, jax.device_put(rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))

    np.testing.assert_allclose(
        float(m8["total_loss"]), float(m1["total_loss"]), rtol=1e-5
    )
    # updated params identical (gradient all-reduce == unsharded sum)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    worst = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(l1, l8)
    )
    assert worst < 1e-5, f"param divergence {worst}"


def test_trainer_data_parallel(tmp_path):
    """--data_parallel wiring (ADVICE r1): Trainer builds the mesh step,
    shards the global batch, and trains with finite losses."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from tf_eager_object_detection_tpu.training.trainer import Trainer

    cfg = _small_cfg()
    det = model_factory("faster_rcnn", "vgg16", cfg)
    trainer = Trainer(det, str(tmp_path), data_parallel=True,
                      logging_every_n_steps=1000, summary_every_n_steps=1000,
                      saving_every_n_steps=1000)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8

    images, hw, gt, mask, labels = _batch(cfg, 8)
    batch = {
        "images": np.asarray(images), "image_hw": np.asarray(hw),
        "gt_boxes": np.asarray(gt), "gt_mask": np.asarray(mask),
        "gt_labels": np.asarray(labels),
    }
    state = trainer.train_one_epoch(iter([batch, batch]), steps=2)
    assert int(state.step) == 2
    # indivisible global batch fails loudly
    bad = {k: v[:3] for k, v in batch.items()}
    with pytest.raises(ValueError, match="not divisible"):
        trainer.train_one_epoch(iter([bad]), steps=1)
    trainer.close()
