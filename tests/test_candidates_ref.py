"""Differential test of candidate extraction + insert-size libraries
against the COMPILED reference (GetCandidatesFromCIGAR::get,
GetCandidates.cpp:387-497, outputIndels/alignCIGAR left-alignment
:103-258, outputLibraries :305-386): both sides must write byte-identical
.variants.txt and .libraries.txt for the same record stream."""

import subprocess
from pathlib import Path

import pytest

from conftest import REFSHIM, _build
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.io.bam import BamReader
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def ref_candidates_exe():
    if not Path("/root/reference/GetCandidates.cpp").exists():
        return None
    return _build(
        "ref_candidates",
        [REFSHIM / "candidates_driver.cpp",
         "/root/reference/GetCandidates.cpp"],
        extra=["-w", "-fpermissive", "-I", "/root/reference/seqan_library"])


def _serialize_bam(bam_path):
    lines = []
    br = BamReader(bam_path)
    for r in br:
        cig = "".join(f"{ln}{op}" for op, ln in r.cigar) if r.cigar \
            else "*"
        qs = ",".join(str(b) for b in r.qual)
        lines.append(f"REC {r.qname} {r.flag} {r.tid} {r.pos} "
                     f"{r.mapq} {r.mtid} {r.mpos} {r.isize} {cig} "
                     f"{r.seq} {qs}")
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed,unmapped_frac", [(3, 0.0), (11, 0.15)])
def test_get_candidates_matches_reference(tmp_path, seed, unmapped_frac):
    exe = ref_candidates_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1400, var="+TT", genotype=2),
                PlantedVariant(pos=2000, var="-A", genotype=1),
                PlantedVariant(pos=2600, var="+GATC", genotype=1)]
    cfg = SimConfig(ref_len=3400, coverage=22, read_len=70,
                    unmapped_frac=unmapped_frac)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=seed)

    var_file, lib_file = get_candidates(bam, str(tmp_path / "ours"), fa)

    out = subprocess.run(
        [str(exe), fa, str(tmp_path / "ref"), "lib1"],
        input=_serialize_bam(bam), capture_output=True, text=True,
        timeout=300)
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])

    ours_v = open(var_file).read()
    ref_v = open(str(tmp_path / "ref.variants.txt")).read()
    assert ours_v == ref_v
    ours_l = open(lib_file).read()
    ref_l = open(str(tmp_path / "ref.libraries.txt")).read()
    assert ours_l == ref_l
