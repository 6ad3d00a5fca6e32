#!/usr/bin/env python
"""Golden fixtures for the VCF QC suite, from the reference binaries.

Compiles all ten self_vcftools programs out-of-tree in /tmp, runs them
on synthetic trio/hap VCFs, stores inputs + stdout goldens under
tests/golden/vcfqc/.
"""

import pathlib
import random
import subprocess
import sys

REF = pathlib.Path("/root/reference/tools/self_vcftools")
BUILD = pathlib.Path("/tmp/ref_build_vcfqc")
GOLD = pathlib.Path(__file__).resolve().parents[1] / "tests/golden/vcfqc"

TOOLS = ["GetSNPOnly", "GetSNPInfo", "PhasedSNP", "GetHapSNP_fromDipcall",
         "MergeHapSNP", "HapInherit", "Inherit3Aa", "InheritSolidSNP",
         "PhaseInheritSolidSNP", "CalcHD"]


def build():
    BUILD.mkdir(parents=True, exist_ok=True)
    for t in TOOLS:
        exe = BUILD / t
        if exe.exists():
            continue
        src = BUILD / f"{t}.cpp"
        src.write_bytes((REF / f"{t}.cpp").read_bytes())
        if t == "GetHapSNP_fromDipcall":
            # the shipped source is truncated mid-for-loop (line 134)
            # and is NOT built by the reference Makefile; restore the
            # evident intent (PhasedSNP.cpp:138-140's '.'->'0' loop)
            subprocess.run(
                ["sed", "-i",
                 "s|for( int i = 0 ; i<gt_str.size() *$|for( int i = 0 ; "
                 "i<(int)gt_str.size() ; i++ ) { if( gt_str[i]=='.' ) "
                 "gt_str[i]='0'; }|", str(src)], check=True)
        subprocess.run(["g++", "-O2", "-std=c++11", str(src),
                        "-o", str(exe)], check=True)


BASES = "ACGT"


def rand_vcf(path, rng, n=400, with_ps=True, homo_only=False,
             chroms=("chr1", "chr2", "chr21", "chrX", "scaffold_9")):
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE"]
    used = set()
    for _ in range(n):
        chrom = rng.choice(chroms)
        pos = rng.randrange(100, 100000)
        if (chrom, pos) in used:
            continue
        used.add((chrom, pos))
        ref = rng.choice(BASES)
        kind = rng.random()
        if kind < 0.70:  # SNP
            alts = [rng.choice([b for b in BASES if b != ref])]
            if rng.random() < 0.15:
                alts.append(rng.choice(
                    [b for b in BASES if b != ref and b != alts[0]]))
        elif kind < 0.9:  # indel
            alts = [ref + "".join(rng.choice(BASES)
                                  for _ in range(rng.randrange(1, 5)))]
        else:  # SV
            alts = [ref + "".join(rng.choice(BASES) for _ in range(60))]
        if homo_only:
            gt = "1/1"
            alts = alts[:1]
        elif len(alts) == 2:
            gt = rng.choice(["1/2", "1|2", "2|1", "2/1"])
        else:
            gt = rng.choice(["0/1", "0|1", "1|0", "1/0", "1/1", "1|1"])
        filt = rng.choice(["PASS", ".", "q10", "LowQual"])
        ps = rng.choice(["100", "2000", "355"])
        if with_ps and rng.random() < 0.8:
            fmt, data = "GT:PS", f"{gt}:{ps}"
        else:
            fmt, data = "GT:DP", f"{gt}:30"
        lines.append(f"{chrom}\t{pos}\t.\t{ref}\t{','.join(alts)}\t50\t"
                     f"{filt}\t.\t{fmt}\t{data}")
    path.write_text("\n".join(lines) + "\n")


def run(tool, args, out_name):
    with open(GOLD / out_name, "wb") as out, \
         open(GOLD / (out_name + ".err"), "wb") as err:
        subprocess.run([str(BUILD / tool)] + [str(a) for a in args],
                       stdout=out, stderr=err, check=True)


def main():
    build()
    GOLD.mkdir(parents=True, exist_ok=True)
    rng = random.Random(99)
    f1 = GOLD / "child.vcf"
    p1 = GOLD / "father.vcf"
    p2 = GOLD / "mother.vcf"
    h1 = GOLD / "hap1.vcf"
    h2 = GOLD / "hap2.vcf"
    rand_vcf(f1, rng, 500)
    rand_vcf(p1, rng, 400)
    rand_vcf(p2, rng, 400)
    rand_vcf(h1, rng, 300, homo_only=True)
    rand_vcf(h2, rng, 300, homo_only=True)

    run("GetSNPOnly", [f1], "snponly.out")
    run("GetSNPInfo", [f1], "snpinfo.out")
    run("PhasedSNP", [f1], "phasedsnp.out")
    run("GetHapSNP_fromDipcall", [f1], "dipcall.out")
    run("MergeHapSNP", [h1, h2], "mergehap.out")
    run("HapInherit", [p1, f1], "hapinherit.out")
    run("Inherit3Aa", [p1, p2, f1], "inherit3aa.out")
    run("InheritSolidSNP", [p1, p2, f1], "solidsnp.out")
    run("PhaseInheritSolidSNP", [p1, p2, f1], "phasesolid.out")
    run("CalcHD", [GOLD / "phasedsnp.out", GOLD / "mergehap.out"],
        "calchd.out")
    print("golden fixtures written to", GOLD)


if __name__ == "__main__":
    main()
