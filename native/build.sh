#!/bin/sh
# Build the native libraries. Usage: native/build.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
g++ -O3 -march=native -shared -fPIC -o "$OUT/libtfrecord_io.so" tfrecord_io.cc
echo "built $OUT/libtfrecord_io.so"
# image pipeline needs the system libjpeg; skip (with a note) if absent
if g++ -O3 -march=native -shared -fPIC -o "$OUT/libimage_decode.so" \
      image_decode.cc -ljpeg 2>/tmp/image_decode_build.err; then
  echo "built $OUT/libimage_decode.so"
else
  echo "libimage_decode.so skipped (libjpeg unavailable?):"
  cat /tmp/image_decode_build.err
fi
