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
    print("fixtures regenerated under", GOLDEN_DIR)
