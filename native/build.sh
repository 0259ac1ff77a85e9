#!/bin/sh
# Build the native IO library. Usage: native/build.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
g++ -O3 -march=native -shared -fPIC -o "$OUT/libtfrecord_io.so" tfrecord_io.cc
echo "built $OUT/libtfrecord_io.so"
