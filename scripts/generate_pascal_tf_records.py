#!/usr/bin/env python
"""VOC XML -> sharded tfrecords (reference: scripts/generate_pascal_tf_records.py).

    python scripts/generate_pascal_tf_records.py --voc_root /data/VOCdevkit \
        --year 2007 --mode trainval --output_dir /data/tfrecords
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voc_root", required=True, help=".../VOCdevkit")
    p.add_argument("--year", default="2007")
    p.add_argument("--mode", default="trainval")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_shards", type=int, default=5)
    args = p.parse_args()

    from tf_eager_object_detection_tpu.data.voc import create_pascal_tf_records

    paths = create_pascal_tf_records(
        args.voc_root, args.year, args.mode, args.output_dir, args.num_shards
    )
    for path in paths:
        print("wrote", path)


if __name__ == "__main__":
    main()
