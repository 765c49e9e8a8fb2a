#!/bin/bash
# Build the reference iS3D2 C++ binary (read-only sources at /root/reference)
# against the local GSL shim, to produce golden outputs for validation tests.
# The reference code is compiled in place — nothing is copied into this repo.
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-$HERE/build}
mkdir -p "$OUT"

SRCS=$(ls "$REF"/src/cpp/*.cpp)

g++ -O2 -std=c++11 -I "$HERE/gslshim" -I "$REF/src/cpp" \
    $SRCS -o "$OUT/iS3D_oracle" -lm

echo "built $OUT/iS3D_oracle"
