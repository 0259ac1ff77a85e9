#!/usr/bin/env python
"""Host input-pipeline throughput: tfrecord -> decode -> augment ->
normalize/resize -> bucket-pad -> batch, python vs native fused path
(VERDICT r3 task 6).

Measures `pascal_train_batches` end-to-end on real tfrecords (default:
the VOC rehearsal set from scripts/voc_rehearsal.py gen) and prints one
JSON line per configuration. Run CPU-only:

  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/bench_input_pipeline.py \
      --tf_records_dir /tmp/voc_rehearsal/tfrecords

The figure to compare against: the chip's b8-bf16 train rate
(BENCHLOG: ~125 img/s). rate(end-to-end) = min(chip, cores x host_rate).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(paths, cfg, n_images, num_workers):
    from tf_eager_object_detection_tpu.data.pascal import pascal_train_batches

    it = pascal_train_batches(
        paths, cfg, batch_size=1, shuffle=True, repeat=True, seed=0,
        num_workers=num_workers,
    )
    next(it)  # warm the pool / first-touch caches
    t0 = time.perf_counter()
    seen = 0
    while seen < n_images:
        seen += next(it)["images"].shape[0]
    dt = time.perf_counter() - t0
    it.close()
    return seen / dt


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tf_records_dir", default="/tmp/voc_rehearsal/tfrecords")
    p.add_argument("--n_images", type=int, default=300)
    p.add_argument("--num_workers", type=int, default=1,
                   help="1 isolates the per-core rate; the pool is the "
                        "scaling axis on multi-core hosts")
    args = p.parse_args()

    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory,
    )
    from tf_eager_object_detection_tpu.data import native_image

    paths = sorted(glob.glob(os.path.join(args.tf_records_dir, "*.tfrecord*")))
    if not paths:
        print(json.dumps({"error": f"no tfrecords in {args.tf_records_dir} "
                          "(run scripts/voc_rehearsal.py gen)"}))
        sys.exit(1)

    cfg = dict(config_factory("pascal", "faster_rcnn"))
    for native in (False, True):
        if native and not native_image.available():
            print(json.dumps({"variant": "native", "error":
                              "libimage_decode.so not built (native/build.sh)"}))
            continue
        cfg["tpu_native_decode"] = native
        rate = measure(paths, cfg, args.n_images, args.num_workers)
        print(json.dumps({
            "metric": "host_input_pipeline",
            "variant": "native" if native else "python",
            "img_per_sec_per_worker": round(rate, 1),
            "num_workers": args.num_workers,
            "n_images": args.n_images,
        }), flush=True)


if __name__ == "__main__":
    main()
