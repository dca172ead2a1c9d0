"""End-to-end integration: synthetic BAM with planted indels ->
getCIGARindels -> makeWindows -> diploid calling -> merged VCF.

This is BASELINE.json config 1: a small test BAM, diploid mode, VCF
output. Asserts the planted indels are called with the right genotype."""

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.pipeline.merge_diploid import merge_output_diploid
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def read_vcf_records(path):
    recs = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            toks = line.rstrip("\n").split("\t")
            recs.append(dict(chrom=toks[0], pos=int(toks[1]), ref=toks[3],
                             alt=toks[4], qual=float(toks[5]), filt=toks[6],
                             info=toks[7], gt=toks[9].split(":")[0]))
    return recs


@pytest.mark.parametrize("backend", ["oracle", "jax"])
def test_diploid_end_to_end(tmp_path, backend):
    variants = [
        PlantedVariant(pos=700, var="-ACG", genotype=1),
        PlantedVariant(pos=1400, var="+TT", genotype=1),
    ]
    cfg = SimConfig(ref_len=2100, coverage=25, read_len=75)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=11)

    # candidates from CIGARs
    var_file, lib_file = get_candidates(bam, str(tmp_path / "cand"), fa)
    cand_lines = open(var_file).read().strip().split("\n")
    assert cand_lines and cand_lines[0]

    # windows
    win_files = make_windows(var_file, str(tmp_path / "win"))
    assert win_files

    # diploid calling
    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine([bam], fa, params, hmm_backend=backend)
    glf_path = str(tmp_path / "out.glf.txt")
    rows = eng.detect_indels(win_files[0], glf_path)
    eng.close()
    assert rows, open(glf_path).read()

    # merge to VCF
    vcf_path = str(tmp_path / "calls.vcf")
    merge_output_diploid([glf_path], vcf_path, fa)
    recs = read_vcf_records(vcf_path)
    assert recs, open(glf_path).read()

    # Exact reference convention (mergeOutputDiploid.py:62,153): VCF POS is
    # the 0-based realigned position printed as the 1-based coordinate of
    # the anchor base, REF fetched starting at that anchor.  The planted
    # -ACG at 0-based 3132 left-aligns into the G-run at 3128;
    # the +TT stays at 3832.
    del_calls = [r for r in recs if len(r["ref"]) > len(r["alt"])]
    ins_calls = [r for r in recs if len(r["alt"].split(",")[0]) > len(r["ref"])]
    assert del_calls, recs
    assert ins_calls, recs
    dc = del_calls[0]
    assert (dc["pos"], dc["ref"], dc["alt"], dc["gt"]) == \
        (3128, "AGGG", "A", "0/1"), dc
    ic = ins_calls[0]
    assert (ic["pos"], ic["ref"], ic["alt"], ic["gt"]) == \
        (3832, "A", "ATT", "0/1"), ic


def test_hom_deletion(tmp_path):
    variants = [PlantedVariant(pos=600, var="-TGCA", genotype=2)]
    cfg = SimConfig(ref_len=1300, coverage=20, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=5)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine([bam], fa, params, hmm_backend="oracle")
    glf_path = str(tmp_path / "out.glf.txt")
    eng.detect_indels(win_files[0], glf_path)
    eng.close()
    vcf_path = str(tmp_path / "calls.vcf")
    merge_output_diploid([glf_path], vcf_path, fa)
    recs = read_vcf_records(vcf_path)
    del_calls = [r for r in recs if len(r["ref"]) > len(r["alt"])]
    assert del_calls
    assert del_calls[0]["gt"] == "1/1"
