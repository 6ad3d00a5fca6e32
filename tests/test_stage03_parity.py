"""Bit-parity of stage 03 against the reference binaries' golden output.

Runs our Split -> classify -> route -> MergePhaseResult -> GenSq on the
same synthetic pseudohap2 assembly and compares every intermediate and
final file byte-for-byte (see scripts/make_golden_stage03.py).
"""

import pathlib

import pytest

from hast_tpu.pipeline import rephase as R

GOLD = pathlib.Path(__file__).parent / "golden" / "stage03"

FILES = [
    "output.phb.1.fa", "output.phb.2.fa", "output.homo.fa",
    "phasing.out",
    "output.phb.12.father.idx", "output.phb.12.mother.idx",
    "output.phb.12.ambiguous.idx",
    "output.merge.father.ids", "output.merge.mother.ids",
    "output.merge.homo.ids",
    "output.father.fa", "output.father.idx", "output.supplement.fa",
]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("stage03")
    R.mkoutput(assembly_path=str(GOLD / "assembly"), prefix="output",
               paternal_mer=str(GOLD / "paternal.mer"),
               maternal_mer=str(GOLD / "maternal.mer"),
               prefer="paternal", workdir=str(out))
    return out


@pytest.mark.parametrize("name", FILES)
def test_file_bit_identical(run_dir, name):
    ours = (run_dir / name).read_bytes()
    golden = (GOLD / name).read_bytes()
    assert ours == golden, name


def test_symlinks(run_dir):
    """primary always; secondary when the opposite fa exists
    (mkoutput_by_fabulous2.0.sh:142-152)."""
    primary = run_dir / "output.primary.fa"
    assert primary.is_symlink()
    assert primary.resolve().name == "output.father.fa"
    # prefer=paternal run never wrote mother.fa -> no secondary
    assert not (run_dir / "output.secondary.fa").exists()


def test_secondary_symlink(tmp_path):
    """Re-running with the opposite prefer in the same dir creates the
    conditional secondary symlink like the reference driver."""
    args = dict(assembly_path=str(GOLD / "assembly"), prefix="output",
                paternal_mer=str(GOLD / "paternal.mer"),
                maternal_mer=str(GOLD / "maternal.mer"),
                workdir=str(tmp_path))
    R.mkoutput(prefer="maternal", **args)
    assert not (tmp_path / "output.secondary.fa").exists()
    res = R.mkoutput(prefer="paternal", **args)
    secondary = tmp_path / "output.secondary.fa"
    assert secondary.is_symlink()
    assert secondary.resolve().name == "output.mother.fa"
    assert res["secondary"].endswith("output.secondary.fa")
    # primary was created by the first (maternal) run and is not clobbered
    assert (tmp_path / "output.primary.fa").resolve().name == \
        "output.mother.fa"


def test_classify_segments_fastq_mode():
    import io
    from hast_tpu.pipeline.rephase import classify_segments
    out = io.StringIO()
    classify_segments([str(GOLD / "paternal.mer"), str(GOLD / "maternal.mer")],
                      [str(GOLD / "fastq_mode.fq")], out, fmt="fastq")
    assert out.getvalue() == (GOLD / "fastq_mode.out").read_text()


def test_mkoutput_symlinks_with_directory_prefix(tmp_path):
    """Symlink targets must be basenamed: with prefix 'sub/hap' a raw
    target 'sub/hap.father.fa' would resolve to 'sub/sub/...' and
    dangle (links resolve relative to the link's own directory)."""
    import os
    sub = tmp_path / "sub"
    sub.mkdir()
    fa = sub / "hap.father.fa"
    fa.write_text(">s\nACGT\n")
    # simulate what mkoutput does for the primary link
    primary = str(sub / "hap.primary.fa")
    os.symlink(os.path.basename(str(fa)), primary)
    assert os.path.exists(primary)  # resolves (would fail if dangling)
    assert open(primary).read().startswith(">s")
