#!/bin/bash
# Build the reference zvec *core* engine + tools head-to-head binaries.
#
# The reference repo vendors its third-party deps as git submodules that are
# EMPTY in this container (no network egress), so the stock CMake build cannot
# run. The core engine (src/ailego + src/core) only needs five small deps —
# sparsehash / magic_enum / yaml-cpp / roaring / gflags — which are shimmed in
# ./include (see each header). Everything that genuinely needs RocksDB/Arrow/
# ANTLR (the src/db layer) is NOT built; tools/core's bench/recall/
# local_builder binaries depend only on the core.
#
# Usage: bash benchmarks/refshim/build_ref.sh [jobs]
# Output: /tmp/refbuild/bin/{local_builder,recall,bench,txt2vecs,...}
set -e
REF=/root/reference
SHIM=$(cd "$(dirname "$0")" && pwd)
OUT=${REFBUILD_DIR:-/tmp/refbuild}
JOBS=${1:-1}
mkdir -p "$OUT/obj" "$OUT/bin"

CXX=${CXX:-g++}
FLAGS="-std=c++17 -O3 -march=native -DNDEBUG -pthread -fPIC -w
  -I$SHIM/include -I$REF/src/include -I$REF/src -I$REF/src/core"

# ---- source set: ailego + core (minus the Arrow-backed buffer pool) ----
SRCS=$(find "$REF/src/ailego" \( -name '*.cc' -o -name '*.c' \) \
         ! -path '*/buffer/*' ;
       find "$REF/src/core" -name '*.cc' \
         ! -name 'buffer_storage.cc' ! -path '*/mixed_reducer/*')

compile_one() {
  local src=$1
  local obj="$OUT/obj/$(echo "${src#$REF/}" | tr '/' '_').o"
  if [ "$obj" -nt "$src" ]; then return 0; fi
  case "$src" in
    *.c) gcc -O3 -march=native -DNDEBUG -fPIC -w -c "$src" -o "$obj" \
           -I"$REF/src/include" -I"$REF/src" ;;
    *) $CXX $FLAGS -c "$src" -o "$obj" ;;
  esac
  echo "CC $(basename "$src")"
}

export -f compile_one 2>/dev/null || true

n=0
for s in $SRCS; do
  compile_one "$s" &
  n=$((n+1))
  if [ $((n % JOBS)) -eq 0 ]; then wait; fi
done
wait

if [ ! -f "$OUT/obj/buffer_handle_stub.o" ] || \
   [ "$SHIM/buffer_handle_stub.cc" -nt "$OUT/obj/buffer_handle_stub.o" ]; then
  $CXX $FLAGS -c "$SHIM/buffer_handle_stub.cc" -o "$OUT/obj/buffer_handle_stub.o"
fi

ar rcs "$OUT/libzvecref.a" "$OUT"/obj/*.o

build_tool() {
  local name=$1; shift
  local srcs=""
  for f in "$@"; do srcs="$srcs $REF/tools/core/$f"; done
  if [ -x "$OUT/bin/$name" ] && [ "$OUT/bin/$name" -nt "$OUT/libzvecref.a" ]; then
    return 0
  fi
  echo "LINK $name"
  # --whole-archive keeps the INDEX_FACTORY_REGISTER_* static registrars
  # that nothing references explicitly.
  $CXX $FLAGS $srcs -Wl,--whole-archive "$OUT/libzvecref.a" \
    -Wl,--no-whole-archive -o "$OUT/bin/$name" -ldl
}

build_tool txt2vecs txt2vecs.cc
build_tool local_builder local_builder.cc
build_tool recall recall.cc
build_tool bench bench.cc
build_tool local_builder_original local_builder_original.cc
build_tool recall_original recall_original.cc
build_tool bench_original bench_original.cc

echo "done: $OUT/bin"
