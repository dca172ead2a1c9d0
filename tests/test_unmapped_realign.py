"""Config 4: realigning unmapped reads whose mates are mapped, using
library insert-size distributions (--libFile path: mapUnmappedReads +
insert-size bMid priors), with num_unmapped_realigned reported."""

import jax
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.model import LibraryCollection
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def test_unmapped_mate_realignment(tmp_path):
    variants = [PlantedVariant(pos=700, var="-ACGT", genotype=2)]
    # short inserts so the mapped mates of unmapped reads overlap the
    # window (the read-filter cascade requires the mate itself to pass)
    cfg = SimConfig(ref_len=1500, coverage=30, read_len=60,
                    insert_mean=130, insert_sd=8, unmapped_frac=0.7)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=17)
    var_file, lib_file = get_candidates(bam, str(tmp_path / "cand"), fa)
    assert "#LIB" in open(lib_file).read()
    win_files = make_windows(var_file, str(tmp_path / "win"))

    libraries = LibraryCollection()
    libraries.add_from_file(lib_file)
    assert "lib1" in libraries

    params = Parameters()
    params.do_diploid = True
    params.map_unmapped_reads = True
    params.obs_params.map_unmapped_reads = True
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine([bam], fa, params, libraries, hmm_backend="oracle")
    glf = str(tmp_path / "out.glf.txt")
    rows = eng.detect_indels(win_files[0], glf)
    eng.close()
    dip = [r for r in rows if r.get("analysis_type") == "dip.map"]
    assert dip, open(glf).read()
    # unmapped reads were realigned onto the haplotypes
    assert any(int(r.get("num_unmapped_realigned", 0)) > 0 for r in dip), dip
    # and the deletion is still called hom
    assert any(str(r["glf"]).startswith("1/1") for r in dip)


def test_cli_map_unmapped_end_to_end(tmp_path):
    """--mapUnmapped through the CLI entry point: the unmapped-mate
    realignment path must be reachable WITHOUT --libFile (flag behavior
    per the reference's removed-options block, DInDel.cpp:3980-3983),
    falling back to the default single_end insert-size library."""
    from dindel_tpu.cli import main
    from dindel_tpu.out.glf import GLFReader

    variants = [PlantedVariant(pos=700, var="-ACGT", genotype=2)]
    cfg = SimConfig(ref_len=1500, coverage=30, read_len=60,
                    insert_mean=130, insert_sd=8, unmapped_frac=0.7)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=17)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    prefix = str(tmp_path / "cli_out")
    rc = main(["--analysis", "indels", "--ref", fa, "--outputFile", prefix,
               "--bamFile", bam, "--varFile", win_files[0], "--doDiploid",
               "--mapUnmapped", "--hmmBackend", "oracle",
               "--engine", "streaming"])
    assert rc == 0
    rows = list(GLFReader(prefix + ".glf.txt"))
    dip = [r for r in rows if r.get("analysis_type") == "dip.map"]
    assert dip

    def _i(v):
        try:
            return int(v)
        except (TypeError, ValueError):
            return 0
    assert any(_i(r.get("num_unmapped_realigned")) > 0 for r in dip), dip
    assert any(str(r["glf"]).startswith("1/1") for r in dip)


def test_cli_exposes_all_reference_flags():
    """The CLI must accept every option in the reference's option table
    (DInDel.cpp:4076-4176) INCLUDING the seven whose registration is
    commented out but whose parameters survive in the code
    (mapUnmapped, outputGLF, printCallsOnly, glfNumHap, numOutputTopHap,
    modelType, pFirstgLO)."""
    from dindel_tpu.cli import build_parser
    ap = build_parser()
    opts = {a for action in ap._actions for a in action.option_strings}
    reference_flags = [
        "--analysis", "--ref", "--outputFile", "--bamFile", "--bamFiles",
        "--region", "--tid", "--varFile", "--varFileIsOneBased",
        "--outputRealignedBAM", "--processRealignedBAM", "--quiet",
        "--doDiploid", "--doPooled", "--faster", "--filterHaplotypes",
        "--flankRefSeq", "--flankMaxMismatch", "--priorSNP", "--priorIndel",
        "--width", "--maxHap", "--maxRead", "--mapQualThreshold",
        "--capMapQualThreshold", "--capMapQualFast", "--skipMaxHap",
        "--minReadOverlap", "--maxReadLength", "--minCount",
        "--maxHapReadProd", "--changeINStoN", "--bayesa0", "--bayesType",
        "--checkAllCIGARs", "--filterReadAux", "--pError", "--pMut",
        "--maxLengthIndel", "--libFile", "--compareReadHap",
        "--compareReadHapThreshold", "--showEmpirical", "--showCandHap",
        "--showHapAlignments", "--showReads", "--inferenceMethod", "--opl",
        # commented-out registrations with live parameters:
        "--mapUnmapped", "--outputGLF", "--printCallsOnly", "--glfNumHap",
        "--numOutputTopHap", "--modelType", "--pFirstgLO",
    ]
    missing = [f for f in reference_flags if f not in opts]
    assert not missing, missing


def test_unmapped_reads_filtered_without_libfile(tmp_path):
    # without --libFile (mapUnmappedReads False) unmapped reads are dropped
    variants = [PlantedVariant(pos=700, var="-ACGT", genotype=2)]
    cfg = SimConfig(ref_len=1500, coverage=30, read_len=60,
                    insert_mean=130, insert_sd=8, unmapped_frac=0.7)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=17)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "out2")
    eng = WindowEngine([bam], fa, params, hmm_backend="oracle")
    rows = eng.detect_indels(win_files[0], str(tmp_path / "out2.glf.txt"))
    eng.close()
    dip = [r for r in rows if r.get("analysis_type") == "dip.map"]
    if dip:  # may still call from mapped reads alone
        assert all(int(r.get("num_unmapped_realigned", 0)) == 0 for r in dip)
