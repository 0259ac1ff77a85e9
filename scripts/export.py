#!/usr/bin/env python
"""Export a trained model to portable AOT serving artifacts (StableHLO).

    python scripts/export.py CKPT --backbone resnet50 --out_dir ./export \
        --platforms tpu

Accepts the same checkpoint sources as the eval CLIs (orbax dir, .npz, or
the third-party import flags). `--check` reloads the artifact and runs a
zero-image smoke inference.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="checkpoint dir (orbax) or params .npz")
    p.add_argument("--model_type", default="faster_rcnn", choices=["faster_rcnn", "fpn"])
    p.add_argument("--backbone", default="resnet50",
                   choices=["vgg16", "resnet50", "resnet101", "resnet152"])
    p.add_argument("--data_type", default="pascal", choices=["pascal", "coco"])
    p.add_argument("--out_dir", default="./export")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu' or 'cpu,tpu' (default: current backend)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and run a smoke inference")
    p.add_argument("--no_bake_params", action="store_true",
                   help="export predict(params, image, hw) with params as "
                        "call inputs: ~1000x smaller StableHLO + one "
                        "params.npz, instead of baking weights per bucket")
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
    from tf_eager_object_detection_tpu.models.model_factory import model_factory
    from tf_eager_object_detection_tpu.ref_import.cli import load_checkpoint_params
    from tf_eager_object_detection_tpu.serving.export import (
        export_predict,
        load_predict,
    )

    cfg = apply_config_overrides(
        dict(config_factory(args.data_type, args.model_type)),
        args.config_override,
    )
    detector = model_factory(args.model_type, args.backbone, cfg)
    params, _ = load_checkpoint_params(detector, args.ckpt, args)
    platforms = args.platforms.split(",") if args.platforms else None
    out = export_predict(
        detector, params, args.out_dir, platforms,
        bake_params=not args.no_bake_params,
    )
    print("exported to", out)

    if args.check:
        import numpy as np

        predict, meta = load_predict(out)
        h, w = meta["buckets"][0]
        det = predict(
            np.zeros((h, w, 3), np.float32), np.asarray([h, w], np.int32)
        )
        n = int(np.asarray(det.valid).sum())
        print(f"smoke inference ok: {n} detections on a zero image "
              f"(bucket {h}x{w})")


if __name__ == "__main__":
    main()
