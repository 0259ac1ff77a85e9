#!/usr/bin/env python
"""Training CLI (reference: scripts/train.py:205-298 arg surface).

Example:
    python scripts/train.py --model_type faster_rcnn --backbone resnet50 \
        --data_type pascal --tf_records_dir /data/tfrecords \
        --logs_dir /tmp/logs --epochs 14
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="faster_rcnn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50",
                   choices=["vgg16", "resnet50", "resnet101", "resnet152"])
    p.add_argument("--data_type", default="pascal", choices=["pascal", "coco"])
    p.add_argument("--tf_records_dir", default=None,
                   help="dir containing pascal_*_train*.tfrecords")
    p.add_argument("--coco_annotation_file", default=None)
    p.add_argument("--coco_image_dir", default=None)
    p.add_argument("--logs_dir", default="./logs")
    p.add_argument("--restore_ckpt_path", default=None)
    p.add_argument("--backbone_weights", default=None,
                   help="pretrained backbone init: keras-applications .h5 "
                        "path, URL, or the literal 'keras' (download the "
                        "reference's file for --backbone by URL+md5)")
    p.add_argument("--batch_size", type=int, default=None,
                   help="per-device batch (default: config)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=5000)
    p.add_argument("--logging_every_n_steps", type=int, default=100)
    p.add_argument("--summary_every_n_steps", type=int, default=100)
    p.add_argument("--saving_every_n_steps", type=int, default=5000)
    p.add_argument("--preprocessing_type", default="caffe", choices=["caffe", "tf"])
    p.add_argument("--spatial_partition", type=int, default=1,
                   help="shard each image's rows over this many devices "
                        "(2-D batch x space mesh; remaining devices form the "
                        "data-parallel axis). For high-resolution inputs or "
                        "more chips than images; 1 = off")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch across all local devices")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host data parallelism over jax.distributed "
                        "(every process runs this CLI with the same flags; "
                        "the global batch spans all processes' devices)")
    p.add_argument("--coordinator_address", default=None,
                   help="with --multihost on non-TPU clusters: host:port of "
                        "process 0 (TPU pods auto-detect)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="with --multihost on non-TPU clusters: process count")
    p.add_argument("--process_id", type=int, default=None,
                   help="with --multihost on non-TPU clusters: this rank")
    p.add_argument("--compute_dtype", default=None, choices=["float32", "bfloat16"],
                   help="override config tpu_compute_dtype")
    p.add_argument("--learning_rate", type=float, default=None,
                   help="override the initial LR (later LRs scale accordingly)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--config_override", action="append", default=[],
                   metavar="KEY=JSON",
                   help="override a single config key (value parsed as JSON; "
                        "repeatable), e.g. --config_override image_min_size=96")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.multihost:
        # join the distributed runtime before any other jax activity
        from tf_eager_object_detection_tpu.parallel.multihost import initialize

        initialize(args.coordinator_address, args.num_processes, args.process_id)

    # JAX_COMPILATION_CACHE_DIR overrides so CPU test runs don't share the
    # TPU cache dir (stale mismatched-machine-feature CPU AOT entries there
    # make every load fail + recompile, widening multi-process compile skew)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from tf_eager_object_detection_tpu.config.config_factory import (
        apply_config_overrides,
        config_factory,
    )
    from tf_eager_object_detection_tpu.data.dataset_factory import dataset_factory
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.training.trainer import Trainer

    cfg = apply_config_overrides(
        dict(config_factory(args.data_type, args.model_type)), args.config_override
    )
    if args.batch_size:
        cfg["tpu_train_batch_size_per_device"] = args.batch_size
    if args.compute_dtype:
        cfg["tpu_compute_dtype"] = args.compute_dtype
    if args.learning_rate:
        lrs = cfg["learning_rate_multi_lrs"]
        scale = args.learning_rate / lrs[0]
        cfg["learning_rate_multi_lrs"] = [lr * scale for lr in lrs]
    detector = model_factory(args.model_type, args.backbone, cfg)

    # Under DP the dataset yields the GLOBAL batch (per-device x n_devices);
    # the Trainer shards it over the mesh (parallel/mesh.py). Under
    # --multihost every process builds the same global stream (same seed)
    # and the Trainer slices out its local rows (parallel/multihost.py).
    global_batch = cfg["tpu_train_batch_size_per_device"]
    if args.multihost:
        global_batch *= jax.device_count()
    elif args.spatial_partition > 1:
        # same device source as make_spatial_mesh: the mesh's batch axis is
        # len(jax.devices()) // sp
        dp = len(jax.devices()) // args.spatial_partition
        if dp < 1:
            raise SystemExit(
                f"--spatial_partition {args.spatial_partition} needs at "
                f"least that many devices, have {len(jax.devices())}"
            )
        global_batch *= dp
    elif args.data_parallel:
        global_batch *= len(jax.local_devices())

    if args.data_type == "pascal":
        records = sorted(glob.glob(os.path.join(args.tf_records_dir, "*train*.tfrecords")))
        if not records:
            raise FileNotFoundError(
                f"no *train*.tfrecords under {args.tf_records_dir}"
            )
        data_cfg = {
            "model_config": cfg,
            "tf_records_list": records,
            "batch_size": global_batch,
            "preprocessing_type": args.preprocessing_type,
            "seed": args.seed,
        }
        batches = dataset_factory("pascal", "train", data_cfg)
    else:
        data_cfg = {
            "model_config": cfg,
            "annotation_file": args.coco_annotation_file,
            "image_dir": args.coco_image_dir,
            "batch_size": global_batch,
            "preprocessing_type": args.preprocessing_type,
            "seed": args.seed,
        }
        batches = dataset_factory("coco", "train", data_cfg)

    trainer = Trainer(
        detector,
        train_dir=args.logs_dir,
        logging_every_n_steps=args.logging_every_n_steps,
        summary_every_n_steps=args.summary_every_n_steps,
        saving_every_n_steps=args.saving_every_n_steps,
        restore_ckpt_path=args.restore_ckpt_path,
        seed=args.seed,
        data_parallel=args.data_parallel,
        backbone_weights=args.backbone_weights,
        multihost=args.multihost,
        spatial_partition=args.spatial_partition,
    )
    epochs = args.epochs or cfg["epochs"]
    trainer.train(batches, epochs, args.steps_per_epoch)


if __name__ == "__main__":
    main()
