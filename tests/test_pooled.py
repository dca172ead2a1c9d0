"""Pooled (Bayes-EM) pipeline end-to-end + genotype-likelihood join +
VCF->dindel conversion + realigned BAM output."""

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.pipeline.merge_pooled import merge_output_pooled
from dindel_tpu.pipeline.genotype_likelihoods import (
    Variant4, convert_vcf_to_dindel, make_genotype_likelihood_file)
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate
from dindel_tpu.io.bam import BamReader


def test_pooled_end_to_end(tmp_path):
    # several windows so the depth-percentile (ocr) filter has a real
    # histogram (a single window always fails it, as in the reference)
    variants = [PlantedVariant(pos=650, var="-CT", genotype=1),
                PlantedVariant(pos=1500, var="-GAT", genotype=1),
                PlantedVariant(pos=2400, var="+AC", genotype=1)]
    cfg = SimConfig(ref_len=3100, coverage=25, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=21)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    params = Parameters()
    params.estimate_hap_freqs = True     # --doPooled
    params.bayes_type = "singlevariant"
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine([bam], fa, params, hmm_backend="oracle")
    glf_path = str(tmp_path / "out.glf.txt")
    rows = eng.detect_indels(win_files[0], glf_path)
    eng.close()
    sv_rows = [r for r in rows if r.get("analysis_type") == "singlevariant"]
    assert sv_rows, open(glf_path).read()
    # the planted deletion should get high posterior
    del_rows = [r for r in sv_rows if str(r.get("nref_all", "")).startswith("-")]
    assert del_rows
    assert max(float(r["post_prob_variant"]) for r in del_rows) > 0.5

    # merge into sites-only VCF
    vcf_path = str(tmp_path / "pooled.vcf")
    merge_output_pooled([glf_path], vcf_path, fa, num_samples=1,
                        num_bam_files=1)
    recs = [l for l in open(vcf_path) if not l.startswith("#")]
    assert recs
    assert any("PASS" in r or "q20" in r for r in recs)

    # genotype-likelihood join
    gl_path = str(tmp_path / "gl.txt")
    n = make_genotype_likelihood_file([glf_path], gl_path, vcf_path, [bam])
    gl_lines = open(gl_path).read().strip().split("\n")
    assert n >= 1 and gl_lines[0]
    toks = gl_lines[0].split()
    assert len(toks) == 7  # tid pos var l00 l01 l11 bam


def test_variant4_and_convert(tmp_path):
    # VCF-style del: ref=ACT alt=A -> -CT at offset 1
    v = Variant4(ref="ACT", alt="A")
    assert v.type == "del" and v.str == "-CT" and v.offset == 1
    v = Variant4(ref="A", alt="ATT")
    assert v.type == "ins" and v.str == "+TT" and v.offset == 1
    v = Variant4(ref="A", alt="G")
    assert v.type == "snp" and v.str == "A=>G"

    from dindel_tpu.io.fasta import write_fasta
    ref = "ACGTACGTAACTGGGTACGT" * 10
    fap = str(tmp_path / "r.fa")
    write_fasta(fap, {"1": ref})
    vcf = tmp_path / "in.vcf"
    pos1 = 9  # 1-based; ref base at 0-based 8 = A
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.0\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"1\t{pos1}\t.\t{ref[8:11]}\t{ref[8]}\t50\tPASS\t.\n")
    out = str(tmp_path / "cand.txt")
    n = convert_vcf_to_dindel(str(vcf), out, fap)
    assert n == 1
    line = open(out).read().strip()
    toks = line.split()
    assert toks[0] == "1" and toks[2].startswith("-")


def test_realigned_bam_output(tmp_path):
    variants = [PlantedVariant(pos=600, var="-TGCA", genotype=2)]
    cfg = SimConfig(ref_len=1300, coverage=15, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=5)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    params = Parameters()
    params.do_diploid = True
    params.output_realigned_bam = True
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine([bam], fa, params, hmm_backend="oracle")
    eng.detect_indels(win_files[0], str(tmp_path / "out.glf.txt"))
    eng.close()
    import glob
    ra = glob.glob(str(tmp_path / "out.ra.*.bam"))
    assert ra, "no realigned BAM written"
    rd = BamReader(ra[0])
    recs = list(rd)
    assert recs
    # realigned reads spanning the deletion carry a 4D op
    with_del = [r for r in recs if ("D", 4) in r.cigar]
    assert with_del
    rd.close()
