"""Multi-chip dry run on the virtual 8-device CPU mesh + graft entry."""

import jax
import numpy as np
import pytest


def test_dryrun_multichip():
    assert len(jax.devices()) >= 8
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_jits():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*[jax.numpy.asarray(a) for a in args])
    ll = np.asarray(out[0])
    assert np.isfinite(ll).all()


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_engine_sharded_step_bit_equal(tmp_path, dtype):
    """The PRODUCTION engine under --mesh must produce byte-identical GLF
    output to the single-device engine on realistic windows (the sharded
    slab step is the same expand/DP/finish per pair; pair-axis sharding
    and padding must be invisible).  Covers the f32 configuration a real
    pod would run as well as the f64 parity configuration."""
    from dindel_tpu.config import Parameters
    from dindel_tpu.engine.batched import BatchedWindowEngine
    from dindel_tpu.engine.candidates import get_candidates
    from dindel_tpu.pipeline.windows import make_windows
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    jax.config.update("jax_enable_x64", True)
    assert len(jax.devices()) >= 8
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1500, var="+TT", genotype=2)]
    cfg = SimConfig(ref_len=2300, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=13)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    outs = {}
    for name, mesh in (("single", None), ("mesh", (4, 2))):
        params = Parameters()
        params.do_diploid = True
        params.estimate_hap_freqs = True
        params.file_name = str(tmp_path / name)
        eng = BatchedWindowEngine([bam], fa, params, batch_windows=8,
                                  dp_impl="xla", dtype=dtype,
                                  mesh=mesh)
        glf = str(tmp_path / f"{name}.glf.txt")
        eng.detect_indels(win_files[0], glf)
        assert eng.stats.windows_ok >= 2
        eng.close()
        outs[name] = open(glf).read()
    assert "dip.map" in outs["single"]
    assert outs["single"] == outs["mesh"]
