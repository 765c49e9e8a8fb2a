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

# rate probe: reference sources minus Main.cpp + our probe main, to call
# max_particle_number (ParticleSampler.cpp:164-239) directly
PROBE_SRCS=$(ls "$REF"/src/cpp/*.cpp | grep -v Main.cpp)
g++ -O2 -std=c++11 -I "$HERE/gslshim" -I "$REF/src/cpp" \
    $PROBE_SRCS "$HERE/probe_rates.cpp" -o "$OUT/probe_rates" -lm

echo "built $OUT/iS3D_oracle + $OUT/probe_rates"
