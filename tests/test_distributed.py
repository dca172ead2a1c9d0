"""Multi-HOST simulation: two OS processes under jax.distributed, each
with 4 virtual CPU devices (8 global), exercising

  - jax.distributed.initialize over the local "DCN",
  - a cross-process collective (process_allgather),
  - the production scale-out contract: each host runs run_shards on its
    slice of the window files and host 0 merges the GLF list into a VCF
    (SURVEY.md §2.4).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

REPO = str(Path(__file__).resolve().parent.parent)

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); coord = sys.argv[2]; work = sys.argv[3]
repo = sys.argv[4]
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 4)
except RuntimeError:
    pass
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4
import jax.numpy as jnp
from jax.experimental import multihost_utils
g = multihost_utils.process_allgather(jnp.ones(()) * (pid + 1))
assert float(g.sum()) == 3.0, g

# per-host shard processing: this host's slice of the window files
from dindel_tpu.config import Parameters
from dindel_tpu.pipeline.run_parallel import run_shards
win_files = sorted(
    os.path.join(work, f) for f in os.listdir(work) if f.startswith("win."))
mine = win_files[pid::2]
params = Parameters()
params.do_diploid = True
glfs, stats = run_shards(mine, [os.path.join(work, "sim.bam")],
                         os.path.join(work, "sim.fa"), params,
                         os.path.join(work, f"host{pid}"))
with open(os.path.join(work, f"host{pid}.glfs"), "w") as f:
    f.write("\n".join(glfs))
# barrier so host 0 merges only after every host wrote its shards
multihost_utils.sync_global_devices("shards_done")
if pid == 0:
    all_glfs = []
    for h in range(2):
        with open(os.path.join(work, f"host{h}.glfs")) as f:
            all_glfs += [l for l in f.read().split("\n") if l]
    from dindel_tpu.pipeline.merge_diploid import merge_output_diploid
    merge_output_diploid(all_glfs, os.path.join(work, "calls.vcf"),
                         os.path.join(work, "sim.fa"), sample_id="S")
print("WORKER_OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=2100, var="+TT", genotype=1)]
    cfg = SimConfig(ref_len=2800, coverage=20, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=11)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    # one window per file so each "host" owns at least one shard
    all_win = make_windows(var_file, str(tmp_path / "win0"))
    lines = [l for wf in all_win for l in open(wf) if l.strip()]
    assert len(lines) >= 2
    win_files = []
    for i, line in enumerate(lines):
        p = tmp_path / f"win.{i + 1}.txt"
        p.write_text(line)
        win_files.append(str(p))

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord, str(tmp_path), REPO],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for pr in procs:
        out, err = pr.communicate(timeout=560)
        outs.append((pr.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
        assert "WORKER_OK" in out
    vcf = (tmp_path / "calls.vcf").read_text()
    recs = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    # both planted het indels called across the two hosts' shards, with
    # the exact genotype
    dels = [r for r in recs
            if abs(int(r[1]) - 3132) <= 6 and len(r[3]) > len(r[4])]
    inss = [r for r in recs
            if abs(int(r[1]) - 4532) <= 6 and len(r[4]) > len(r[3])]
    assert dels and dels[0][9].split(":")[0] == "0/1", vcf
    assert inss and inss[0][9].split(":")[0] == "0/1", vcf

    # the multi-host path must not drift from single-host by even a base:
    # run the same shards in ONE process and require a byte-identical VCF
    from dindel_tpu.config import Parameters
    from dindel_tpu.pipeline.run_parallel import run_shards
    from dindel_tpu.pipeline.merge_diploid import merge_output_diploid
    params = Parameters()
    params.do_diploid = True
    glfs, _ = run_shards(win_files, [bam], fa, params,
                         str(tmp_path / "single"))
    merge_output_diploid(glfs, str(tmp_path / "calls_single.vcf"), fa,
                         sample_id="S")
    assert (tmp_path / "calls_single.vcf").read_text() == vcf
