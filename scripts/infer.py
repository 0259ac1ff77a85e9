#!/usr/bin/env python
"""Single-image inference CLI (the reference's `test_one_image` flow,
base_faster_rcnn_model.py:267-277): load -> preprocess -> predict -> draw.

    python scripts/infer.py CKPT image.jpg --out detections.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="checkpoint dir (orbax) or params .npz")
    p.add_argument("image")
    p.add_argument("--model_type", default="faster_rcnn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50",
                   choices=["vgg16", "resnet50", "resnet101", "resnet152"])
    p.add_argument("--data_type", default="pascal", choices=["pascal", "coco"])
    p.add_argument("--out", default=None, help="write box-overlay image here")
    p.add_argument("--score_threshold", type=float, default=0.3)
    p.add_argument("--spatial_partition", type=int, default=1,
                   help="shard the image's rows over this many devices "
                        "(parallel/spatial.py) — latency path when devices "
                        "outnumber in-flight images; 1 = off")
    p.add_argument("--config_override", action="append", default=[],
                   metavar="KEY=JSON",
                   help="override a single config key (JSON value; repeatable)")
    from tf_eager_object_detection_tpu.ref_import.cli import add_import_flags

    add_import_flags(p)
    args = p.parse_args()

    from tf_eager_object_detection_tpu.config.config_factory import (
        apply_config_overrides,
        config_factory,
    )
    from tf_eager_object_detection_tpu.data.label_map import PASCAL_CLASSES
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.ref_import.cli import load_checkpoint_params

    cfg = apply_config_overrides(
        dict(config_factory(args.data_type, args.model_type)), args.config_override
    )
    det = model_factory(args.model_type, args.backbone, cfg)
    params, image_format = load_checkpoint_params(det, args.ckpt, args)

    predict_fn = None
    if args.spatial_partition > 1:
        # one image sharded row-wise over sp devices (see docs/SERVING.md
        # "More chips than requests"); outputs equal det.predict
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tf_eager_object_detection_tpu.parallel.spatial import (
            make_spatial_mesh,
            make_spatial_predict,
        )

        mesh = make_spatial_mesh(dp=1, sp=args.spatial_partition)
        batched = make_spatial_predict(det, mesh)
        params_repl = jax.device_put(params, NamedSharding(mesh, P()))

        def predict_fn(_params, image, image_hw):
            d = batched(
                params_repl,
                jax.device_put(
                    image[None], NamedSharding(mesh, P("batch", "space"))
                ),
                jax.device_put(
                    image_hw[None], NamedSharding(mesh, P("batch"))
                ),
            )
            return jax.tree_util.tree_map(lambda x: x[0], d)

    boxes, labels, scores = det.test_one_image(
        params, args.image, image_format=image_format, predict_fn=predict_fn
    )
    keep = scores >= args.score_threshold
    boxes, labels, scores = boxes[keep], labels[keep], scores[keep]
    names = (
        {i + 1: n for i, n in enumerate(PASCAL_CLASSES)}
        if args.data_type == "pascal"
        else {}
    )
    for b, l, s in zip(boxes, labels, scores):
        name = names.get(int(l), str(int(l)))
        print(f"{name:>15s} {s:.3f}  [{b[0]:.1f}, {b[1]:.1f}, {b[2]:.1f}, {b[3]:.1f}]")
    if args.out:
        import numpy as np
        from PIL import Image

        from tf_eager_object_detection_tpu.utils.visual import draw_bboxes_with_labels

        img = np.asarray(Image.open(args.image).convert("RGB"))
        tags = [f"{names.get(int(l), int(l))}:{s:.2f}" for l, s in zip(labels, scores)]
        Image.fromarray(draw_bboxes_with_labels(img, boxes, tags)).save(args.out)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
