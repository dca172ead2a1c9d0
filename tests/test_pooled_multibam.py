"""Pooled multi-BAM end-to-end: 4 BAM pools sharing one reference, a
low-frequency planted indel carried by one pool only, driven through
--doPooled -> mergeOutputPooled -> the per-sample GL join — the
reference's primary pooled deliverable (mergeOutputPooled.py:202-577,
makeGenotypeLikelihoodFilePooled.py:10-105)."""

import random

import jax

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.pipeline.merge_pooled import merge_output_pooled
from dindel_tpu.pipeline.genotype_likelihoods import (
    make_genotype_likelihood_file)
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate, random_ref


def test_pooled_multibam_to_vcf(tmp_path):
    # one shared reference; pool 0 is a het carrier of each indel,
    # pools 1-3 are ref/ref -> allele frequency 1/8
    rng = random.Random(99)
    ref = random_ref(rng, 3100)
    variants = [PlantedVariant(pos=650, var="-CT", genotype=1),
                PlantedVariant(pos=1500, var="-GAT", genotype=1),
                PlantedVariant(pos=2400, var="+AC", genotype=1)]
    cfg = SimConfig(ref_len=3100, coverage=25, read_len=70,
                    qname_prefix="p0_")
    fa, bam0 = simulate(str(tmp_path / "pool0"), variants, cfg, seed=31,
                        ref=ref)
    bams = [bam0]
    for k in (1, 2, 3):
        cfgk = SimConfig(ref_len=3100, coverage=25, read_len=70,
                         qname_prefix=f"p{k}_")
        _, bamk = simulate(str(tmp_path / f"pool{k}"), [], cfgk,
                           seed=31 + k, ref=ref)
        bams.append(bamk)

    # candidates from the carrier pool's CIGARs
    var_file, _ = get_candidates(bam0, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    params = Parameters()
    params.estimate_hap_freqs = True     # --doPooled
    params.bayes_type = "singlevariant"
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine(bams, fa, params, hmm_backend="jax")
    glf_path = str(tmp_path / "out.glf.txt")
    rows = eng.detect_indels(win_files[0], glf_path)
    eng.close()

    # per-BAM GLF rows: every singlevariant row block covers indidx 0..3
    sv = [r for r in rows if r.get("analysis_type") == "singlevariant"]
    assert sv
    assert sorted({int(r["indidx"]) for r in sv}) == [0, 1, 2, 3]

    # the planted deletions get high posterior despite 1/8 frequency
    del_rows = [r for r in sv
                if str(r.get("nref_all", "")).startswith("-")
                and int(r["indidx"]) == 0]
    assert del_rows
    assert max(float(r["post_prob_variant"]) for r in del_rows) > 0.5

    # merge across the 4 pools into the sites-only VCF
    vcf_path = str(tmp_path / "pooled.vcf")
    merge_output_pooled([glf_path], vcf_path, fa, num_samples=4,
                        num_bam_files=4)
    recs = [l.rstrip("\n").split("\t") for l in open(vcf_path)
            if not l.startswith("#")]
    assert recs
    # the -CT planted at 650 (+start_pad): VCF POS is the 1-based anchor
    P = cfg.start_pad
    by_pos = {int(r[1]): r for r in recs}
    assert 650 + P in by_pos, recs
    rec = by_pos[650 + P]
    assert len(rec[3]) == len(rec[4]) + 2          # REF/ALT encode a 2bp del
    ref_fa = ref[649:649 + len(rec[3])]
    assert rec[3] == ref_fa                        # REF matches the FASTA
    info = dict(kv.split("=") for kv in rec[7].split(";"))
    assert {"AF", "NS", "DP", "HP", "NF", "NR", "NFS", "NRS"} <= set(info)
    assert 0.0 < float(info["AF"]) < 0.5           # low-frequency call
    assert int(info["DP"]) > 50                    # depth summed over pools
    # mf filter threshold is 1/(10*numInds) = 0.025 -> an AF ~0.125 passes
    assert "mf" not in rec[6]

    # per-sample genotype-likelihood join over the 4 pools
    gl_path = str(tmp_path / "gl.txt")
    n = make_genotype_likelihood_file([glf_path], gl_path, vcf_path, bams)
    assert n >= 1
    gl_lines = [l.split() for l in open(gl_path).read().strip().split("\n")]
    # one row per (site, pool): tid pos var l00 l01 l11 bam
    assert all(len(t) == 7 for t in gl_lines)
    assert {t[6] for t in gl_lines} == set(bams)
    site_rows = [t for t in gl_lines if t[1] == str(650 + P)]
    assert len(site_rows) == 4
    # the carrier pool's data must favor 0/1 over 0/0 more strongly than
    # any non-carrier pool does
    def l01_minus_l00(t):
        return float(t[4]) - float(t[3])
    carrier = [t for t in site_rows if t[6] == bam0][0]
    others = [t for t in site_rows if t[6] != bam0]
    assert l01_minus_l00(carrier) > max(l01_minus_l00(t) for t in others)
