"""Multi-process host staging (parallel/hostshard.py): N staging
processes ship packed slabs to a device server over a unix socket; the
per-shard GLF files merge into bytes IDENTICAL to a sequential
single-process run over the same window files (the window FILE is the
reference's own process boundary, python/makeWindows.py:46-54)."""

import os

import pytest

from dindel_tpu.config import Parameters
from dindel_tpu.engine.batched import BatchedWindowEngine
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.parallel.hostshard import run_hostshard
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def test_hostshard_cli(tmp_path):
    """--stageProcs through the CLI: comma-separated --varFile, merged
    GLF written, calls present."""
    from dindel_tpu.cli import main as cli_main
    variants = [PlantedVariant(pos=550 + i * 620, var="-AC", genotype=1)
                for i in range(4)]
    cfg = SimConfig(ref_len=560 + 4 * 620, coverage=15, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=23)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"),
                             variants_per_file=2)
    out = str(tmp_path / "out")
    rc = cli_main(["--analysis", "indels", "--doDiploid",
                   "--bamFile", bam, "--ref", fa,
                   "--varFile", ",".join(win_files),
                   "--outputFile", out, "--engine", "batched",
                   "--stageProcs", "2"])
    assert rc == 0
    glf = open(out + ".glf.txt").read()
    assert glf.splitlines()[0].startswith("msg index")
    assert " dip " in glf or " dip.map " in glf


@pytest.mark.parametrize("mode", ["dip", "pooled"])
def test_hostshard_matches_sequential(tmp_path, mode):
    variants = [PlantedVariant(pos=550 + i * 620,
                               var=("-AC", "+TG", "-T", "+A")[i % 4],
                               genotype=1 + i % 2)
                for i in range(8)]
    cfg = SimConfig(ref_len=560 + 8 * 620, coverage=15, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=17)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    # several small window files -> several shards
    win_files = make_windows(var_file, str(tmp_path / "win"),
                             variants_per_file=3)
    assert len(win_files) >= 2

    params = Parameters()
    if mode == "dip":
        params.do_diploid = True
    else:
        params.estimate_hap_freqs = True
    params.file_name = str(tmp_path / "seq")

    # sequential single-process anchor, same per-file engine lifecycle
    seq_paths = []
    eng = BatchedWindowEngine([bam], fa, params, batch_windows=16)
    for i, wf in enumerate(win_files):
        gp = str(tmp_path / f"seq.glf.{i}")
        eng.detect_indels(wf, gp)
        seq_paths.append(gp)
    eng.close()
    seq_glf = str(tmp_path / "seq.glf.txt")
    with open(seq_glf, "w") as out:
        for i, sp in enumerate(seq_paths):
            with open(sp) as f:
                for j, line in enumerate(f):
                    if j == 0 and i > 0:
                        continue
                    out.write(line)

    params2 = Parameters()
    if mode == "dip":
        params2.do_diploid = True
    else:
        params2.estimate_hap_freqs = True
    params2.file_name = str(tmp_path / "shard")
    out_glf = str(tmp_path / "shard.glf.txt")
    shard_paths = run_hostshard([bam], fa, params2, win_files, out_glf,
                                n_procs=2,
                                engine_kw=dict(batch_windows=16))
    assert len(shard_paths) == len(win_files)
    assert os.path.exists(out_glf)

    a = open(seq_glf).read()
    b = open(out_glf).read()
    assert a and a == b
