#!/bin/bash
# Build the reference-reader smoke binary against the UNMODIFIED EpsillaDB
# sources at /root/reference/engine (readers: table_segment_mvp.cpp,
# ann_graph_segment.cpp), using the header shims in benchmarks/refshim for
# the two deps absent from this image (boost::geometry R-tree, oatpp-curl
# embedding client). Objects are cached in the output dir so the pytest
# wrapper pays the compile once per machine. Output: $OUT/ref_reader_smoke.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference/engine
OUT=${1:-/tmp/refreader}
mkdir -p "$OUT"

CXXFLAGS="-O1 -march=native -std=c++17 -fopenmp -w \
  -I$REPO/benchmarks/refshim -I$REF"

SRCS=(
  "$REF/query/expr/expr.cpp"
  "$REF/utils/atomic_counter.cpp"
  "$REF/db/table_segment_mvp.cpp"
  "$REF/db/ann_graph_segment.cpp"
  "$REF/query/expr/expr_evaluator.cpp"
  "$REF/db/index/nsg/nsg.cpp"
  "$REF/db/index/nsg/nsg_helper.cpp"
  "$REF/db/index/nsg/distance.cpp"
  "$REF/db/index/index.cpp"
  "$REF/db/index/distance_simd.cpp"
  "$REF/db/vector.cpp"
  "$REF/utils/builder_suspend.cpp"
  "$REF/utils/concurrent_bitset.cpp"
  "$REF/utils/common_util.cpp"
  "$REF/utils/status.cpp"
  "$REF/utils/json.cpp"
  "$REF/logger/logger.cpp"
)

OBJS=()
for src in "${SRCS[@]}" "$REPO/benchmarks/ref_reader_smoke.cpp" \
           "$REPO/benchmarks/ref_wal_smoke.cpp"; do
  obj="$OUT/$(basename "$src" .cpp).o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    g++ $CXXFLAGS -c "$src" -o "$obj" &
  fi
  OBJS+=("$obj")
done
wait
# Last two objects are the two smoke mains; shared reference objects first.
N=${#OBJS[@]}
LIBOBJS=("${OBJS[@]:0:N-2}")
g++ $CXXFLAGS "${LIBOBJS[@]}" "$OUT/ref_reader_smoke.o" \
  -o "$OUT/ref_reader_smoke"
g++ $CXXFLAGS "${LIBOBJS[@]}" "$OUT/ref_wal_smoke.o" \
  -o "$OUT/ref_wal_smoke"
echo "built $OUT/ref_reader_smoke + $OUT/ref_wal_smoke"
