#!/usr/bin/env bash
# Differential m8 regression: our engine vs the reference srasearch binary
# on the bundled Cas7-11 fixture (the reference's own regression style:
# end-to-end m8 compare, cf. /root/reference/.github/workflows/build.yml).
#
# Usage: tools/ref_regression.sh [workdir]
#   1. builds the reference binary if missing (tools/build_reference.sh)
#   2. runs the reference pipeline: createdb (query) + convert2sradb (target)
#      -> createkmertable -> comparekmertables -> blockalign -> convertsraalis
#   3. runs our engine: graft.tools.EasyPetasearch on the same FASTA
#   4. tools/ref_regression.py writes the per-line diff report
set -euo pipefail
cd "$(dirname "$0")/.."

W=${1:-/tmp/ref_regression}
S=${SRASEARCH_BIN:-/tmp/srasearch_build/srasearch}
mkdir -p "$W"

if [ ! -x "$S" ]; then
  echo "[ref_regression] building reference binary"
  bash tools/build_reference.sh
fi

# fixture: the bundled Cas7-11 MSA, degapped (same recipe as bio_selfsearch_m8)
FA="$W/cas711.fa"
awk '/^>/{print; next} {gsub(/[-.]/, ""); print}' \
  src/main/resources/MSA_Cas7-11_multiline.fa > "$FA"

echo "[ref_regression] running reference pipeline"
R="$W/ref"; rm -rf "$R"; mkdir -p "$R"
# query side is a standard mmseqs DB; target side the SRA-DB + k-mer table
"$S" createdb "$FA" "$R/qdb" -v 1 >/dev/null 2>&1
echo "$FA" > "$R/tlist"
"$S" convert2sradb "$R/tlist" "$R/tdb" -v 1 >/dev/null 2>&1
"$S" createkmertable "$R/tdb" "$R/ttable" -k 9 --spaced-kmer-mode 0 -v 1 >/dev/null 2>&1
printf '%s\t%s\n' "$R/ttable" "$R/tdb" > "$R/targets.tsv"
printf '%s\n' "$R/cmp0" > "$R/results.tsv"
"$S" comparekmertables "$R/qdb" "$R/targets.tsv" "$R/results.tsv" \
  -k 9 --spaced-kmer-mode 0 -v 1 >/dev/null 2>&1
"$S" blockalign "$R/qdb" "$R/tdb" "$R/cmp0" "$R/alis" -e 1000 -v 1 >/dev/null 2>&1
"$S" convertsraalis "$R/qdb" "$R/tdb" "$R/alis" "$R/out.m8" -v 1 >/dev/null 2>&1
echo "[ref_regression] reference: $(wc -l < "$R/out.m8") m8 lines"

echo "[ref_regression] running our engine"
rm -rf "$W/ours_out"
sbt -batch "runMain graft.tools.EasyPetasearch $FA $FA $W/ours_out" >/dev/null 2>&1
OURS=$(find "$W/ours_out" -name 'part*.csv' | head -1)
echo "[ref_regression] ours: $(wc -l < "$OURS") m8 lines"

python3 tools/ref_regression.py "$OURS" "$R/out.m8" "$W/report.md"
echo "[ref_regression] report (defaults): $W/report.md"

# ---- matched-sensitivity leg: the reference at its most sensitive
# supported settings (block matrix 1024, xdrop 100) vs ours at xdrop 100 —
# REFDIFF.md's headline numbers (89/97 bits exact) come from this compare.
echo "[ref_regression] matched-sensitivity pass (range-max 1024, xdrop 100)"
"$S" blockalign "$R/qdb" "$R/tdb" "$R/cmp0" "$R/alis_hi" \
  -e 1000 --range-min 32 --range-max 1024 --xdrop 100 -v 1 >/dev/null 2>&1
"$S" convertsraalis "$R/qdb" "$R/tdb" "$R/alis_hi" "$R/out_hi.m8" -v 1 >/dev/null 2>&1
rm -rf "$W/ours_hi"
sbt -batch "runMain graft.tools.EasyPetasearch $FA $FA $W/ours_hi --xdrop 100" >/dev/null 2>&1
OURS_HI=$(find "$W/ours_hi" -name 'part*.csv' | head -1)
python3 tools/ref_regression.py "$OURS_HI" "$R/out_hi.m8" "$W/report_sensitive.md" \
  | grep -E "bits exact|exclusive-end|MISS"
echo "[ref_regression] report (matched): $W/report_sensitive.md"

# ---- profile leg: reference msa2profile + profile search vs our
# --profile-search on the same MSA (REFDIFF.md profile section).
echo "[ref_regression] profile-search pass"
P="$W/prof"; rm -rf "$P"; mkdir -p "$P"
cp src/main/resources/MSA_Cas7-11_multiline.fa "$P/msa.fa"
python3 - "$P" <<'EOF'
import sys
p = sys.argv[1]
data = open(f'{p}/msa.fa', 'rb').read() + b'\0'
open(f'{p}/msadb', 'wb').write(data)
open(f'{p}/msadb.index', 'w').write(f"0\t0\t{len(data)}\n")
open(f'{p}/msadb.dbtype', 'wb').write((11).to_bytes(4, 'little'))  # DBTYPE_MSA_DB
EOF
"$S" msa2profile "$P/msadb" "$P/profdb" --match-mode 0 -v 1 >/dev/null 2>&1
printf '%s\n' "$P/pcmp0" > "$P/results.tsv"
"$S" comparekmertables "$P/profdb" "$R/targets.tsv" "$P/results.tsv" \
  -k 9 --spaced-kmer-mode 0 -v 1 >/dev/null 2>&1
"$S" blockalign "$P/profdb" "$R/tdb" "$P/pcmp0" "$P/palis" \
  -e 1000 --range-max 1024 --xdrop 100 -v 1 >/dev/null 2>&1
"$S" convertsraalis "$P/profdb" "$R/tdb" "$P/palis" "$P/ref_prof.m8" -v 1 >/dev/null 2>&1
rm -rf "$W/ours_prof"
sbt -batch "runMain graft.tools.EasyPetasearch $P/msa.fa $FA $W/ours_prof --profile-search --xdrop 100" >/dev/null 2>&1
OURS_PROF=$(find "$W/ours_prof" -name 'part*.csv' | head -1)
python3 tools/ref_regression.py "$OURS_PROF" "$P/ref_prof.m8" "$W/report_profile.md" \
  | grep -E "common pairs|MISS"
echo "[ref_regression] report (profile): $W/report_profile.md"

# ---- interop leg: the REFERENCE binary consumes OUR native-format exports,
# validating SraInterop.writeSraDb/writeKmerTable against the real reader
# instead of our own frozen byte goldens.
echo "[ref_regression] exporting native formats from our engine"
rm -rf "$W/native"; mkdir -p "$W/native"
sbt -batch "runMain graft.tools.ExportNative $FA $W/native/tdb" >/dev/null 2>&1

if cmp -s "$R/ttable" "$W/native/tdb_ktable" &&
   cmp -s "$R/ttable_ids" "$W/native/tdb_ktable_ids"; then
  echo "[ref_regression] k-mer table: byte-identical to the reference's own"
else
  echo "[ref_regression] k-mer table: DIFFERS from the reference's own"
fi

printf '%s\t%s\n' "$W/native/tdb_ktable" "$W/native/tdb" > "$R/interop_targets.tsv"
printf '%s\n' "$R/icmp0" > "$R/interop_results.tsv"
"$S" comparekmertables "$R/qdb" "$R/interop_targets.tsv" "$R/interop_results.tsv" \
  -k 9 --spaced-kmer-mode 0 -v 1 >/dev/null 2>&1
"$S" blockalign "$R/qdb" "$W/native/tdb" "$R/icmp0" "$R/ialis" -e 1000 -v 1 >/dev/null 2>&1
"$S" convertsraalis "$R/qdb" "$W/native/tdb" "$R/ialis" "$R/interop.m8" -v 1 >/dev/null 2>&1
if diff -q <(sort "$R/out.m8") <(sort "$R/interop.m8") >/dev/null; then
  echo "[ref_regression] interop m8: IDENTICAL ($(wc -l < "$R/interop.m8") lines) — reference pipeline on our exported DB reproduces its own output"
else
  echo "[ref_regression] interop m8: differs ($(wc -l < "$R/interop.m8") vs $(wc -l < "$R/out.m8") lines)"
fi

# ---- masking leg: our tantan model vs the reference's tantan::maskSequences
# (the exact call comparekmertables makes: VTML80 8.0/-0.2 probability
# matrix, maxCycleLength 50, repeatProb 0.005, endProb 0.05, decay 0.5,
# minMaskProb 0.9, hard-mask to X).
echo "[ref_regression] masking pass"
MM=/root/reference/lib/mmseqs; B=${SRASEARCH_BUILD:-/tmp/srasearch_build}; O=$B/obj
g++ -O1 -march=native -fsigned-char -fopenmp -std=c++14 -w -D_GNU_SOURCE=1 -DOPENMP=1 \
  -I"$B/generated" -I$MM/src/commons -I$MM/src -I$MM/lib -I$MM/lib/simd \
  -I$MM/lib/simde -I$MM/lib/xxhash -I$MM/lib/ips4o -DENABLE_IPS4O=1 \
  -I"$B/zstd/lib" -DZSTD_STATIC_LINKING_ONLY=1 \
  tools/probe_tantan.cpp \
  $O/_root_reference_lib_mmseqs_src_commons_{SubstitutionMatrix,BaseMatrix,Util,Debug,ProfileStates,MemoryTracker,LibraryReader,MemoryMapped,tantan}_cpp.o \
  $O/_root_reference_lib_mmseqs_lib_cacode_lambda_calculator_cpp.o \
  "$B/libzstd.a" -lz -lbz2 -lm -o "$W/probe_tantan"
(cd $MM/data && "$W/probe_tantan" "$FA") > "$W/ref_mask.txt"
sbt -batch "runMain graft.tools.TantanDump $FA" 2>/dev/null \
  | sed -n 's/^\[info\] \([A-Za-z].* [01]*\)$/\1/p' > "$W/ours_mask.txt"
python3 - "$W" <<'PYEOF'
import sys
w = sys.argv[1]
ref = dict(l.split() for l in open(f'{w}/ref_mask.txt') if ' ' in l)
ours = dict(l.split() for l in open(f'{w}/ours_mask.txt') if ' ' in l)
agree = total = 0
for k in ref:
    r, o = ref[k], ours.get(k, '')
    total += len(r)
    agree += sum(1 for a, b in zip(r, o) if a == b) if len(r) == len(o) else 0
print(f"[ref_regression] masking: {agree}/{total} positions agree "
      f"({'IDENTICAL' if agree == total else 'DIFFERS'})")
PYEOF
