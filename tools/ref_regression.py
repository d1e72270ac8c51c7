#!/usr/bin/env python3
"""Per-line m8 diff between our engine and the reference srasearch binary.

Usage: ref_regression.py <ours.m8> <ref.m8> <report.md>

Both files are BLAST m8: query target fident alnlen mismatch gapopen
qstart qend tstart tend evalue bits.

The compare is divergence-aware:
  - pair-set analysis: common / ours-only / ref-only, with ours-only rows
    classified as swap-mirrors (reverse direction present in the reference)
    vs extra-sensitivity pairs;
  - per-field diffs on the best-by-bits hit of each common pair. fident and
    mismatch are reported but not scored: the reference estimates them
    without a backtrace (convertsraalignments.cpp), so its self-hits report
    fident < 1 by design.
"""
import math
import sys


def read_m8(path):
    best = {}
    with open(path) as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if len(p) < 12:
                continue
            key = (p[0], p[1])
            row = {
                "fident": float(p[2]), "alnlen": int(p[3]),
                "mismatch": int(p[4]), "gapopen": int(p[5]),
                "qstart": int(p[6]), "qend": int(p[7]),
                "tstart": int(p[8]), "tend": int(p[9]),
                "evalue": float(p[10]), "bits": float(p[11]),
            }
            if key not in best or row["bits"] > best[key]["bits"]:
                best[key] = row
    return best


def main():
    ours_path, ref_path, report_path = sys.argv[1:4]
    ours = read_m8(ours_path)
    ref = read_m8(ref_path)

    common = sorted(set(ours) & set(ref))
    ours_only = sorted(set(ours) - set(ref))
    ref_only = sorted(set(ref) - set(ours))
    swap_mirrors = [(q, t) for q, t in ours_only if (t, q) in ref]
    extra = [(q, t) for q, t in ours_only if (t, q) not in ref]

    def close(a, b, tol):
        return abs(a - b) <= tol

    exact_coords = conv_coords = coords_close = 0
    bits_exact = bits_close = ev_close = 0
    coord_diffs = []
    for key in common:
        o, r = ours[key], ref[key]
        same = all(o[k] == r[k] for k in ("qstart", "qend", "tstart", "tend"))
        # the reference emits EXCLUSIVE end coordinates (self-hit of an
        # L-residue sequence reports qend = L+1, alnlen = L+1); BLAST m8 —
        # and our output — use inclusive ends
        conv = (o["qstart"] == r["qstart"] and o["tstart"] == r["tstart"]
                and o["qend"] + 1 == r["qend"] and o["tend"] + 1 == r["tend"])
        near = all(abs(o[k] - r[k]) <= 5
                   for k in ("qstart", "qend", "tstart", "tend"))
        exact_coords += same
        conv_coords += same or conv
        coords_close += near
        bits_exact += o["bits"] == r["bits"]
        bits_close += close(o["bits"], r["bits"], max(2.0, 0.05 * r["bits"]))
        loe = math.log10(o["evalue"]) if o["evalue"] > 0 else -400
        lre = math.log10(r["evalue"]) if r["evalue"] > 0 else -400
        ev_close += abs(loe - lre) <= 2
        if not near:
            coord_diffs.append((key, o, r))

    n = len(common)
    lines = []
    lines.append("# Differential m8 regression: graft vs reference srasearch")
    lines.append("")
    lines.append(f"ours: {len(ours)} best-by-pair hits ({ours_path})")
    lines.append(f"ref:  {len(ref)} best-by-pair hits ({ref_path})")
    lines.append("")
    lines.append("## Pair sets")
    lines.append(f"- common pairs: {n}")
    lines.append(f"- ref-only pairs (sensitivity we MISS): {len(ref_only)}")
    lines.append(f"- ours-only swap mirrors (reference ships with swapresult "
                 f"disabled in petasearch.sh): {len(swap_mirrors)}")
    lines.append(f"- ours-only extra-sensitivity pairs: {len(extra)}")
    lines.append("")
    lines.append("## Field agreement on common pairs (best hit by bits)")
    lines.append(f"- coordinates exact: {exact_coords}/{n}")
    lines.append(f"- coordinates exact modulo the reference's exclusive-end "
                 f"convention: {conv_coords}/{n}")
    lines.append(f"- coordinates within +-5: {coords_close}/{n}")
    lines.append(f"- bits exact: {bits_exact}/{n}")
    lines.append(f"- bits within max(2, 5%): {bits_close}/{n}")
    lines.append(f"- evalue within 2 orders of magnitude: {ev_close}/{n}")
    lines.append("")
    if ref_only:
        lines.append("## Reference-only pairs (MISSED — investigate)")
        for q, t in ref_only[:50]:
            lines.append(f"- {q} -> {t} (ref bits {ref[(q, t)]['bits']})")
        lines.append("")
    if coord_diffs:
        lines.append("## Largest coordinate divergences (ours vs ref)")
        coord_diffs.sort(key=lambda x: -abs(x[1]["alnlen"] - x[2]["alnlen"]))
        for (q, t), o, r in coord_diffs[:15]:
            lines.append(
                f"- {q} -> {t}: ours q[{o['qstart']},{o['qend']}] "
                f"t[{o['tstart']},{o['tend']}] len={o['alnlen']} "
                f"bits={o['bits']} | ref q[{r['qstart']},{r['qend']}] "
                f"t[{r['tstart']},{r['tend']}] len={r['alnlen']} "
                f"bits={r['bits']}")
        lines.append("")

    report = "\n".join(lines)
    with open(report_path, "w") as f:
        f.write(report + "\n")
    print(report)
    # exit 0 always: divergences are reported, not gated — documented
    # kernel differences (tantan model, X-drop block granularity) make full
    # bit-parity a non-goal; MISSED pairs are the actionable signal.


if __name__ == "__main__":
    main()
