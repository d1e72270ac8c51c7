#!/usr/bin/env bash
# Nucleotide differential vs the reference srasearch binary (the REFDIFF
# §nucleotide leg — round-8 verdict item #5). Two compares:
#
#   1. PLUS STRAND: reference nucleotide pipeline (createdb auto-detects
#      DNA -> convert2sradb -> createkmertable -> comparekmertables ->
#      blockalign -> convertsraalis) vs our `--mode nucleotide` on the
#      same deterministic DNA fixture. Expectation: missed-pairs = 0.
#   2. BOTH STRANDS: our `--both-strands` output split by strand. The
#      reference's search pipeline never GENERATES minus-strand records
#      (convertsraalignments.cpp:59-87 can only PRINT them), so the plus
#      subset must reproduce compare 1 exactly and every minus row is our
#      documented extra sensitivity (verified tstart > tend, and each
#      minus pair's reverse-complement homology is real by construction).
#
# Usage: tools/ref_regression_nuc.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."

W=${1:-/tmp/ref_regression_nuc}
S=${SRASEARCH_BIN:-/tmp/srasearch_build/srasearch}
mkdir -p "$W"

if [ ! -x "$S" ]; then
  echo "[ref_nuc] building reference binary"
  bash tools/build_reference.sh
fi

# Deterministic DNA fixture: one 600 bp seed, 5 forward mutants (3% point
# mutations), 3 REVERSE-COMPLEMENT mutants (invisible to the reference's
# plus-only search, visible to --both-strands), 3 unrelated uniform seqs.
FA="$W/dna.fa"
python3 - "$FA" <<'EOF'
import random
import sys

rng = random.Random(42)
bases = "ACGT"
comp = str.maketrans("ACGT", "TGCA")
seed = "".join(rng.choice(bases) for _ in range(600))

def mutate(s, rate):
    return "".join(
        rng.choice([b for b in bases if b != c]) if rng.random() < rate else c
        for c in s)

recs = [("seed0", seed)]
recs += [(f"fwd{i}", mutate(seed, 0.03)) for i in range(1, 6)]
recs += [(f"rev{i}", mutate(seed, 0.03).translate(comp)[::-1])
         for i in range(1, 4)]
recs += [(f"rand{i}", "".join(rng.choice(bases) for _ in range(600)))
         for i in range(1, 4)]
with open(sys.argv[1], "w") as f:
    for name, s in recs:
        f.write(f">{name}\n{s}\n")
EOF
echo "[ref_nuc] fixture: $(grep -c '^>' "$FA") sequences"

echo "[ref_nuc] running reference nucleotide pipeline"
R="$W/ref"; rm -rf "$R"; mkdir -p "$R"
"$S" createdb "$FA" "$R/qdb" -v 1 >/dev/null 2>&1
echo "$FA" > "$R/tlist"
"$S" convert2sradb "$R/tlist" "$R/tdb" -v 1 >/dev/null 2>&1
# REFERENCE BUG (harness fix, not a semantic change): convert2sradb
# ALWAYS stamps DBTYPE_AMINO_ACIDS (convert2sradb.cpp:37,173 — never
# reassigned), so a nucleotide query DB probes a protein-typed k-mer
# table (mismatched alphabets) and gets 0 candidates end-to-end — the
# "this is bad for nucleotide petasearch" comment (blockalign.cpp:102)
# corroborates the mode was never finished. Stamping the dbtype the
# converter forgot lets every downstream nucleotide code path
# (NucleotideMatrix seeds, nucleotide gap costs) compose as written.
printf '\x01\x00\x00\x00' > "$R/tdb.dbtype"
"$S" createkmertable "$R/tdb" "$R/ttable" -k 9 --spaced-kmer-mode 0 -v 1 >/dev/null 2>&1
printf '%s\t%s\n' "$R/ttable" "$R/tdb" > "$R/targets.tsv"
printf '%s\n' "$R/cmp0" > "$R/results.tsv"
"$S" comparekmertables "$R/qdb" "$R/targets.tsv" "$R/results.tsv" \
  -k 9 --spaced-kmer-mode 0 -v 1 >/dev/null 2>&1
"$S" blockalign "$R/qdb" "$R/tdb" "$R/cmp0" "$R/alis" \
  -e 1000 --range-max 1024 --xdrop 100 -v 1 >/dev/null 2>&1
"$S" convertsraalis "$R/qdb" "$R/tdb" "$R/alis" "$R/out.m8" -v 1 >/dev/null 2>&1
echo "[ref_nuc] reference: $(wc -l < "$R/out.m8") m8 lines"

echo "[ref_nuc] running our engine (--mode nucleotide, plus strand)"
rm -rf "$W/ours_plus"
sbt -batch "runMain graft.tools.EasyPetasearch $FA $FA $W/ours_plus --mode nucleotide --xdrop 100" >/dev/null 2>&1
OURS_PLUS=$(find "$W/ours_plus" -name 'part*.csv' | head -1)
echo "[ref_nuc] ours plus-strand: $(wc -l < "$OURS_PLUS") m8 lines"
python3 tools/ref_regression.py "$OURS_PLUS" "$R/out.m8" "$W/report_nuc.md"
echo "[ref_nuc] report: $W/report_nuc.md"

echo "[ref_nuc] running our engine (--both-strands)"
rm -rf "$W/ours_both"
sbt -batch "runMain graft.tools.EasyPetasearch $FA $FA $W/ours_both --both-strands --xdrop 100" >/dev/null 2>&1
OURS_BOTH=$(find "$W/ours_both" -name 'part*.csv' | head -1)

python3 - "$OURS_PLUS" "$OURS_BOTH" <<'EOF'
import sys

def rows(path):
    out = []
    for line in open(path):
        p = line.rstrip("\n").split("\t")
        if len(p) >= 12:
            out.append(p)
    return out

plus_only = rows(sys.argv[1])
both = rows(sys.argv[2])
# m8 minus convention: tstart > tend marks a minus-strand hit
minus = [p for p in both if int(p[8]) > int(p[9])]
plus_sub = [p for p in both if int(p[8]) <= int(p[9])]
key = lambda p: tuple(p[:12])
a, b = sorted(map(key, plus_only)), sorted(map(key, plus_sub))
print(f"[ref_nuc] both-strands: {len(both)} rows = "
      f"{len(plus_sub)} plus + {len(minus)} minus")
print("[ref_nuc] plus subset vs plus-only run: "
      + ("IDENTICAL" if a == b else
         f"DIFFERS ({len(set(a) ^ set(b))} rows)"))
rev_pairs = sorted({(p[0], p[1]) for p in minus
                    if p[0].startswith("rev") != p[1].startswith("rev")})
print(f"[ref_nuc] minus pairs crossing the rev-family boundary: "
      f"{len(rev_pairs)} (expected > 0: the planted revcomp homology)")
bad = [p for p in minus if not (int(p[6]) <= int(p[7]))]
print("[ref_nuc] minus rows keep query coords forward-ascending: "
      + ("YES" if not bad else f"NO ({len(bad)} bad)"))
EOF
