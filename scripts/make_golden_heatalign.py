#!/usr/bin/env python
"""Golden fixtures for the heat-align tools from the reference binaries."""

import pathlib
import random
import subprocess

BUILD = pathlib.Path("/tmp/ref_build_heat")
REF = pathlib.Path("/root/reference/tools/draw_heatalign")
GOLD = pathlib.Path(__file__).resolve().parents[1] / "tests/golden/heatalign"


def build():
    BUILD.mkdir(exist_ok=True)
    for t in ("KIR", "MHC", "getN", "CheckGenes"):
        if not (BUILD / t).exists():
            subprocess.run(["g++", "-O2", "-std=c++11",
                            str(REF / f"{t}.cpp"), "-o", str(BUILD / t)],
                           check=True)


def make_align(path, rng, n_seqs=4, with_n=True):
    lines = []
    ref_pos = 1000
    for s in range(n_seqs):
        qname = f"scaffold_{s}"
        qpos = rng.randrange(1, 5000)
        fwd = rng.random() < 0.7
        for b in range(rng.randrange(2, 5)):
            blen = rng.randrange(1500, 80000)
            idy = round(rng.uniform(0.85, 1.0), 4)
            if fwd:
                q1, q2 = qpos, qpos + blen
            else:
                q1, q2 = qpos + blen, qpos
            lines.append(f"KIR\t{ref_pos}\t{ref_pos + blen}\t{qname}\t"
                         f"{q1}\t{q2}\t{'+' if fwd else '-'}\t{idy}")
            ref_pos += blen + rng.randrange(100, 3000)
            qpos += blen + rng.randrange(0, 500)
        if with_n and s in (1,):
            lines.append(f"KIR\t{ref_pos}\t{ref_pos + 2500}\t{qname}_n\t"
                         f"0\t0\tN\t1.0")
            ref_pos += 2500
    path.write_text("\n".join(lines) + "\n")


def main():
    build()
    GOLD.mkdir(parents=True, exist_ok=True)
    rng = random.Random(7)
    make_align(GOLD / "H1.align.txt", rng)
    make_align(GOLD / "H2.align.txt", rng)
    genes = [(rng.randrange(1, 1_000_000), name)
             for name in ("A1", "LONGGENE2", "B3", "KIR2DL4", "C")]
    (GOLD / "genes.txt").write_text(
        "".join(f"{p}\t{n}\n" for p, n in genes))
    for preset in ("KIR", "MHC"):
        with open(GOLD / f"{preset.lower()}.svg.golden", "wb") as out:
            subprocess.run(
                [str(BUILD / preset), "1100000",
                 "-i", str(GOLD / "H1.align.txt"),
                 "-i", str(GOLD / "H2.align.txt"),
                 "-g", str(GOLD / "genes.txt")],
                stdout=out, stderr=subprocess.DEVNULL, check=True,
                cwd=GOLD)

    # getN fixture
    fa = (">s1 desc\nACGTNNNACGT\nNNNN\nACGT\n>s2\nNNNNACGT\n"
          ">s3\nACGTNNN\n>s4\nAAnnNAA\n")
    (GOLD / "n.fa").write_text(fa)
    with open(GOLD / "getn.out.golden", "wb") as out:
        subprocess.run([str(BUILD / "getN")], stdin=open(GOLD / "n.fa"),
                       stdout=out, check=True)

    # CheckGenes fixture
    cg_genes = "\n".join(
        f"{a}\t{b}\t{n}" for a, b, n in
        [(1000, 5000, "g1"), (4000, 9000, "g2"), (100000, 101000, "g3"),
         (1000, 5000, "g1")]) + "\n"
    (GOLD / "cg.genes.txt").write_text(cg_genes)
    with open(GOLD / "checkgenes.out.golden", "wb") as out:
        subprocess.run([str(BUILD / "CheckGenes"),
                        str(GOLD / "H1.align.txt"),
                        str(GOLD / "cg.genes.txt")],
                       stdout=out, check=True)
    print("golden fixtures written to", GOLD)


if __name__ == "__main__":
    main()
