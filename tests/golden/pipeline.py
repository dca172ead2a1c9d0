"""Shared generator for the golden-fixture test: runs the full diploid
pipeline (sim -> getCIGARindels -> makeWindows -> batched engine with the
CLI's production settings -> mergeOutputDiploid) on a fixed seed and
returns the paths of the produced GLF and VCF.

Regenerate the checked-in fixtures after an INTENDED behavior change with
    python tests/golden/pipeline.py
(from the repo root; review the diff before committing).
"""

import os
import sys

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))


def run_pipeline(workdir: str):
    import numpy as np
    from dindel_tpu.config import Parameters
    from dindel_tpu.engine.batched import BatchedWindowEngine
    from dindel_tpu.engine.candidates import get_candidates
    from dindel_tpu.pipeline.windows import make_windows
    from dindel_tpu.pipeline.merge_diploid import merge_output_diploid
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    variants = [
        PlantedVariant(pos=700, var="-ACG", genotype=1),
        PlantedVariant(pos=1400, var="+TT", genotype=1),
        PlantedVariant(pos=1750, var="-T", genotype=2),
    ]
    cfg = SimConfig(ref_len=2400, coverage=25, read_len=75)
    fa, bam = simulate(os.path.join(workdir, "sim"), variants, cfg, seed=11)
    var_file, _lib = get_candidates(bam, os.path.join(workdir, "cand"), fa)
    win_files = make_windows(var_file, os.path.join(workdir, "win"))

    params = Parameters()
    params.do_diploid = True
    params.file_name = os.path.join(workdir, "out")
    # the CLI's --engine batched construction (cli.py): XLA DP kernel,
    # float32 DP tensors, float64 calling
    eng = BatchedWindowEngine([bam], fa, params, dp_impl="xla",
                              dtype=np.float32)
    glf_path = os.path.join(workdir, "out.glf.txt")
    eng.detect_indels(win_files[0], glf_path)
    eng.close()

    vcf_path = os.path.join(workdir, "calls.vcf")
    merge_output_diploid([glf_path], vcf_path, fa)
    return glf_path, vcf_path


def run_pooled_pipeline(workdir: str):
    """Pooled fixture: 4 BAM pools sharing one reference, one het
    carrier pool, --doPooled singlevariant -> mergeOutputPooled sites
    VCF -> per-sample GL join (the reference's primary pooled
    deliverable, mergeOutputPooled.py:202-577)."""
    import random

    import numpy as np
    from dindel_tpu.config import Parameters
    from dindel_tpu.engine.batched import BatchedWindowEngine
    from dindel_tpu.engine.candidates import get_candidates
    from dindel_tpu.pipeline.windows import make_windows
    from dindel_tpu.pipeline.merge_pooled import merge_output_pooled
    from dindel_tpu.pipeline.genotype_likelihoods import (
        make_genotype_likelihood_file)
    from dindel_tpu.sim import (PlantedVariant, SimConfig, simulate,
                                random_ref)

    rng = random.Random(99)
    ref = random_ref(rng, 2600)
    variants = [PlantedVariant(pos=650, var="-CT", genotype=1),
                PlantedVariant(pos=1500, var="+AC", genotype=1)]
    cfg = SimConfig(ref_len=2600, coverage=22, read_len=70,
                    qname_prefix="p0_")
    fa, bam0 = simulate(os.path.join(workdir, "pool0"), variants, cfg,
                        seed=31, ref=ref)
    bams = [bam0]
    for k in (1, 2, 3):
        cfgk = SimConfig(ref_len=2600, coverage=22, read_len=70,
                         qname_prefix=f"p{k}_")
        _, bamk = simulate(os.path.join(workdir, f"pool{k}"), [], cfgk,
                           seed=31 + k, ref=ref)
        bams.append(bamk)

    var_file, _lib = get_candidates(bam0, os.path.join(workdir, "cand"), fa)
    win_files = make_windows(var_file, os.path.join(workdir, "win"))

    params = Parameters()
    params.estimate_hap_freqs = True
    params.bayes_type = "singlevariant"
    params.file_name = os.path.join(workdir, "out")
    eng = BatchedWindowEngine(bams, fa, params, dp_impl="xla",
                              dtype=np.float32)
    glf_path = os.path.join(workdir, "out.glf.txt")
    eng.detect_indels(win_files[0], glf_path)
    eng.close()

    vcf_path = os.path.join(workdir, "pooled.vcf")
    merge_output_pooled([glf_path], vcf_path, fa, num_samples=4,
                        num_bam_files=4)
    gl_path = os.path.join(workdir, "gl.txt")
    make_genotype_likelihood_file([glf_path], gl_path, vcf_path, bams)
    # the GL table's last column embeds temp BAM paths; normalize to the
    # basename so the fixture is location-independent
    rows = []
    for line in open(gl_path):
        t = line.rstrip("\n").split(" ")
        t[-1] = os.path.basename(t[-1])
        rows.append(" ".join(t) + "\n")
    with open(gl_path, "w") as f:
        f.writelines(rows)
    return glf_path, vcf_path, gl_path


def normalize_vcf(text: str) -> str:
    """Drop the ##reference= header line (embeds a temp path)."""
    return "".join(l for l in text.splitlines(keepends=True)
                   if not l.startswith("##reference="))


if __name__ == "__main__":
    import tempfile
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, os.path.join(GOLDEN_DIR, os.pardir, os.pardir))
    with tempfile.TemporaryDirectory() as d:
        glf, vcf = run_pipeline(d)
        with open(os.path.join(GOLDEN_DIR, "diploid.glf.txt"), "w") as f:
            f.write(open(glf).read())
        with open(os.path.join(GOLDEN_DIR, "diploid.vcf"), "w") as f:
            f.write(normalize_vcf(open(vcf).read()))
    with tempfile.TemporaryDirectory() as d:
        glf, vcf, gl = run_pooled_pipeline(d)
        with open(os.path.join(GOLDEN_DIR, "pooled.glf.txt"), "w") as f:
            f.write(open(glf).read())
        with open(os.path.join(GOLDEN_DIR, "pooled.vcf"), "w") as f:
            f.write(normalize_vcf(open(vcf).read()))
        with open(os.path.join(GOLDEN_DIR, "pooled.gl.txt"), "w") as f:
            f.write(open(gl).read())
    print("fixtures regenerated under", GOLDEN_DIR)
