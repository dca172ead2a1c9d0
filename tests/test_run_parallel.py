"""Sharded run driver: multiple window files -> per-shard GLFs -> merged
VCF, same calls as a single run."""

import jax
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.pipeline.run_parallel import run_and_merge_diploid
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def test_sharded_run_and_merge(tmp_path):
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1700, var="-TT", genotype=2)]
    cfg = SimConfig(ref_len=2400, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=4)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    # force one window per file -> several shards
    win_files = make_windows(var_file, str(tmp_path / "win"),
                             variants_per_file=-1)
    assert len(win_files) >= 2

    params = Parameters()
    vcf = str(tmp_path / "calls.vcf")
    glfs, stats = run_and_merge_diploid(
        win_files, [bam], fa, params, str(tmp_path / "run"), vcf,
        num_workers=1)
    assert len(glfs) == len(win_files)
    assert sum(s["windows_ok"] for s in stats) >= 2
    recs = [l for l in open(vcf) if not l.startswith("#")]
    assert len(recs) >= 2
    # position-ordered output
    poss = [int(l.split("\t")[1]) for l in recs]
    assert poss == sorted(poss)
