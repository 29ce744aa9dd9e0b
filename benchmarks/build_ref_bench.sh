#!/bin/bash
# Build the reference-core baseline benchmark against the unmodified
# EpsillaDB sources at /root/reference/engine, using the header shims in
# benchmarks/refshim (no Boost/oatpp in this image). Output: /tmp/refbench/
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference/engine
OUT=${1:-/tmp/refbench}
mkdir -p "$OUT"

CXXFLAGS="-O3 -march=native -std=c++17 -fopenmp -w \
  -I$REPO/benchmarks/refshim -I$REF"

SRCS=(
  "$REPO/benchmarks/ref_core_bench.cpp"
  "$REF/db/index/nsg/nsg.cpp"
  "$REF/db/index/nsg/nsg_helper.cpp"
  "$REF/db/index/nsg/distance.cpp"
  "$REF/db/index/index.cpp"
  "$REF/db/index/distance_simd.cpp"
  "$REF/db/vector.cpp"
  "$REF/utils/builder_suspend.cpp"
  "$REF/utils/concurrent_bitset.cpp"
  "$REF/utils/status.cpp"
  "$REF/utils/json.cpp"
  "$REF/logger/logger.cpp"
)

OBJS=()
for src in "${SRCS[@]}"; do
  obj="$OUT/$(basename "$src" .cpp).o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    g++ $CXXFLAGS -c "$src" -o "$obj" &
  fi
  OBJS+=("$obj")
done
wait
g++ $CXXFLAGS "${OBJS[@]}" -o "$OUT/ref_core_bench"
echo "built $OUT/ref_core_bench"
