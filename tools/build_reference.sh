#!/usr/bin/env bash
# Build the reference `srasearch` binary WITHOUT cmake.
#
# The sandbox has g++/make/cargo/xxd but no cmake and no network, so this
# script replays what the reference's CMake would do (flags read from
# /root/reference/CMakeLists.txt, lib/mmseqs/CMakeLists.txt and
# lib/mmseqs/src/CMakeLists.txt):
#   1. xxd -i resource headers (MMseqsResourceCompiler.cmake equivalent)
#   2. cargo-build block-aligner-c (staticlib, zero external deps)
#   3. make-build bundled zstd's libzstd.a
#   4. g++-compile mmseqs-framework + reference src, link srasearch
#
# Usage: tools/build_reference.sh   ->  /tmp/srasearch_build/srasearch
set -euo pipefail

REF=${REF:-/root/reference}
# ASAN=1 builds an AddressSanitizer binary into its own build dir — the
# sandbox has no gdb, so ASan reports are the debugging story.
if [ "${ASAN:-0}" = 1 ]; then
  BUILD=${BUILD:-/tmp/srasearch_asan}
  EXTRA_FLAGS=(-fsanitize=address -g -O1)
else
  BUILD=${BUILD:-/tmp/srasearch_build}
  EXTRA_FLAGS=()
fi
JOBS=${JOBS:-$(nproc)}
GEN=$BUILD/generated
OBJ=$BUILD/obj
mkdir -p "$GEN" "$OBJ"

log() { echo "[build_reference] $*"; }

# ---------------------------------------------------------------- 1. resources
gen_header() {
  local f=$1 name out
  name=$(basename "$f")
  out="$GEN/$name.h"
  [ -f "$out" ] && [ "$out" -nt "$f" ] && return 0
  (cd "$(dirname "$f")" && xxd -i "$name") \
    | sed 's!unsigned char!static const unsigned char!' > "$out"
}
log "generating resource headers"
for f in "$REF"/data/*.sh; do gen_header "$f"; done
for f in "$REF"/lib/mmseqs/data/* \
         "$REF"/lib/mmseqs/data/resources/* \
         "$REF"/lib/mmseqs/data/workflow/*; do
  case "$f" in */CMakeLists.txt) continue ;; esac
  [ -f "$f" ] && gen_header "$f"
done
# K4000.crf (context-library for CSProfile) is referenced by the vendored
# CMake but absent from the vendored tree; the sra tools never call
# CSProfile, so an empty payload satisfies the compile. A runtime use would
# fail loudly at parse, not silently.
if [ ! -f "$GEN/K4000.crf.h" ]; then
  printf 'static const unsigned char K4000_crf[] = {0};\nstatic const unsigned int K4000_crf_len = 0;\n' \
    > "$GEN/K4000.crf.h"
fi

# ------------------------------------------------------------ 2. block-aligner
if [ ! -f "$BUILD/libblock_aligner_c.a" ]; then
  log "building block-aligner-c (cargo, offline)"
  rm -rf "$BUILD/block-aligner"
  cp -r "$REF/lib/block-aligner" "$BUILD/block-aligner"
  (cd "$BUILD/block-aligner/c" &&
    cargo build --release --offline --features simd_avx2 >/dev/null 2>&1)
  cp "$BUILD/block-aligner/c/target/release/libblock_aligner_c.a" "$BUILD/"
fi

# --------------------------------------------------------------------- 3. zstd
if [ ! -f "$BUILD/libzstd.a" ]; then
  log "building bundled zstd"
  rm -rf "$BUILD/zstd"
  cp -r "$REF/lib/mmseqs/lib/zstd" "$BUILD/zstd"
  make -C "$BUILD/zstd/lib" libzstd.a -j"$JOBS" >/dev/null
  cp "$BUILD/zstd/lib/libzstd.a" "$BUILD/"
fi

# ------------------------------------------------------------------ 4. compile
MM=$REF/lib/mmseqs
INCS=(
  -I"$GEN"
  -I"$REF/src" -I"$REF/src/commons" -I"$REF/src/sra"
  -I"$REF/lib/block-aligner/c"
  -I"$MM/src" -I"$MM/src/alignment" -I"$MM/src/clustering"
  -I"$MM/src/commons" -I"$MM/src/linclust" -I"$MM/src/multihit"
  -I"$MM/src/prefiltering" -I"$MM/src/taxonomy" -I"$MM/src/util"
  -I"$MM/src/workflow"
  -I"$MM/lib" -I"$MM/lib/simd" -I"$MM/lib/alp" -I"$MM/lib/cacode"
  -I"$MM/lib/ksw2" -I"$MM/lib/microtar" -I"$MM/lib/tinyexpr"
  # NOTE: lib/omptl must NOT be an include dir — it contains a file named
  # `algorithm` that would shadow the standard <algorithm> header; sources
  # reach it as <omptl/...> through the -I lib root instead
  -I"$MM/lib/gzstream" -I"$MM/lib/base64"
  -I"$MM/lib/xxhash" -I"$MM/lib/ips4o" -I"$MM/lib/simde"
  -I"$BUILD/zstd/lib"
)
DEFS=(
  -D_GNU_SOURCE=1 -DOPENMP=1 -DENABLE_IPS4O=1
  -DHAVE_POSIX_FADVISE=1 -DHAVE_POSIX_MADVISE=1
  -DHAVE_ZLIB=1 -DHAVE_BZLIB=1
  -DZSTD_STATIC_LINKING_ONLY=1
  -DGIT_SHA1=hand-built
)
CXXFLAGS=(-O2 -march=native -fsigned-char -fopenmp -fno-exceptions
  -std=c++14 -w "${DEFS[@]}" "${INCS[@]}" "${EXTRA_FLAGS[@]}")
# alp/cacode/ksw2 are separate CMake object libs: they do NOT inherit the
# framework's -fno-exceptions (alp throws)
CXXFLAGS_EXC=(-O2 -march=native -fsigned-char -fopenmp
  -std=c++14 -w "${DEFS[@]}" "${INCS[@]}" "${EXTRA_FLAGS[@]}")
CFLAGS=(-O2 -march=native -fsigned-char -fopenmp -w "${DEFS[@]}" "${INCS[@]}"
  "${EXTRA_FLAGS[@]}")

SRCS_CPP=()
# mmseqs framework (everything CMake's per-dir lists collect, minus mains/tests)
while IFS= read -r f; do SRCS_CPP+=("$f"); done < <(
  find "$MM/src/alignment" "$MM/src/clustering" "$MM/src/commons" \
       "$MM/src/linclust" "$MM/src/multihit" "$MM/src/prefiltering" \
       "$MM/src/taxonomy" "$MM/src/util" "$MM/src/workflow" \
       -name '*.cpp' | sort)
# NOT mmseqs's src/version/Version.cpp: srasearch links its own version
# object (reference src/version) and the two define the same symbol
SRCS_CPP+=("$MM/src/MMseqsBase.cpp")
# bundled object libs compiled into the framework. cacode's
# lambda_calculator.cpp textually #includes its siblings (nrutil.cpp etc.),
# so compile ONLY that TU or symbols double up at link time.
while IFS= read -r f; do SRCS_CPP+=("$f"); done < <(
  find "$MM/lib/alp" "$MM/lib/ksw2" -name '*.cpp' | sort)
SRCS_CPP+=("$MM/lib/cacode/lambda_calculator.cpp")
# reference sources
while IFS= read -r f; do SRCS_CPP+=("$f"); done < <(
  find "$REF/src/commons" "$REF/src/sra" "$REF/src/workflow" \
       -name '*.cpp' | sort)
SRCS_CPP+=("$REF/src/version/Version.cpp" "$REF/src/srasearch.cpp")

SRCS_C=("$MM/lib/microtar/microtar.c" "$MM/lib/tinyexpr/tinyexpr.c")

log "compiling ${#SRCS_CPP[@]} C++ + ${#SRCS_C[@]} C files with $JOBS jobs"
compile_one() {
  local src=$1 obj
  obj="$OBJ/$(echo "$src" | sed 's![/.]!_!g').o"
  [ -f "$obj" ] && [ "$obj" -nt "$src" ] && return 0
  case "$src" in
    *.cpp) g++ "${CXXFLAGS[@]}" -c "$src" -o "$obj" ;;
    *.c) gcc "${CFLAGS[@]}" -c "$src" -o "$obj" ;;
  esac
}
export -f compile_one
export OBJ GEN
export CXXFLAGS_STR="${CXXFLAGS[*]}" CFLAGS_STR="${CFLAGS[*]}"
export CXXFLAGS_EXC_STR="${CXXFLAGS_EXC[*]}"
# xargs can't inherit arrays: re-expand via env strings
compile_one_sh() {
  local src=$1 obj
  obj="$OBJ/$(echo "$src" | sed 's![/.]!_!g').o"
  [ -f "$obj" ] && [ "$obj" -nt "$src" ] && return 0
  case "$src" in
    */lib/alp/*.cpp|*/lib/cacode/*.cpp|*/lib/ksw2/*.cpp)
      g++ $CXXFLAGS_EXC_STR -c "$src" -o "$obj" ;;
    *.cpp) g++ $CXXFLAGS_STR -c "$src" -o "$obj" ;;
    *.c) gcc $CFLAGS_STR -c "$src" -o "$obj" ;;
  esac
}
export -f compile_one_sh
printf '%s\n' "${SRCS_CPP[@]}" "${SRCS_C[@]}" \
  | xargs -P "$JOBS" -I{} bash -c 'compile_one_sh "$@"' _ {}

# --------------------------------------------------------------------- 5. link
# Link order matters: srasearch.cpp's static init (LocalParameters) MUST run
# before MMseqsBase.cpp's `Parameters::getInstance()` or the singleton comes
# up as the BASE class and every LocalParameters member is garbage (CMake
# gets this for free: executable objects precede the framework archive).
log "linking srasearch"
REF_OBJS=("$OBJ"/_root_reference_src_*.o)
MM_OBJS=()
for o in "$OBJ"/*.o; do
  case "$o" in "$OBJ"/_root_reference_src_*) ;; *) MM_OBJS+=("$o") ;; esac
done
g++ -O2 -fopenmp "${EXTRA_FLAGS[@]}" -o "$BUILD/srasearch" \
  "${REF_OBJS[@]}" "${MM_OBJS[@]}" \
  "$BUILD/libblock_aligner_c.a" "$BUILD/libzstd.a" \
  -lz -lbz2 -latomic -lpthread -ldl -lm
log "OK: $BUILD/srasearch"
"$BUILD/srasearch" version || true
