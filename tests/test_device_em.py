"""Pooled device-EM parity (VERDICT r4 item 7): the batched VB-EM device
kernel (infer/device_em) vs the host numpy anchor loop, A/B'd through
the full engine with the same zero-rescue discipline as
tests/test_device_call.py.

The device kernel uses jax digamma + dense reductions in the engine
dtype, so GLF floats agree to ~1e-3 relative (not byte-identical — the
host loop with the boost-replica digamma remains the byte-parity
anchor and still runs whenever x64 is on in production)."""

import math
import re

import numpy as np
import pytest

import dindel_tpu.engine.batched as batched
from dindel_tpu.config import Parameters
from dindel_tpu.engine.batched import BatchedWindowEngine
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def _sim(tmp_path, seed, n_var=6, coverage=18, ref_len=7000):
    rng = np.random.RandomState(seed)
    spacing = ref_len // (n_var + 2)
    variants = []
    for i in range(n_var):
        kind = rng.randint(3)
        if kind == 0:
            var = "-" + "ACGT"[rng.randint(4)] * rng.randint(1, 4)
        elif kind == 1:
            var = "+" + "".join("ACGT"[rng.randint(4)]
                                for _ in range(rng.randint(1, 4)))
        else:
            var = "-AC"
        variants.append(PlantedVariant(pos=(i + 1) * spacing, var=var,
                                       genotype=1 + rng.randint(2)))
    cfg = SimConfig(ref_len=ref_len, coverage=coverage, read_len=70)
    fa, bam = simulate(str(tmp_path / f"sim{seed}"), variants, cfg,
                       seed=seed)
    var_file, _ = get_candidates(bam, str(tmp_path / f"cand{seed}"), fa)
    win_files = make_windows(var_file, str(tmp_path / f"win{seed}"))
    return fa, bam, win_files


def _run(tmp_path, fa, bam, win_files, device_em, tag, program):
    params = Parameters()
    params.estimate_hap_freqs = True
    params.bayes_type = program
    params.file_name = str(tmp_path / f"out_{tag}")
    old = batched.FORCE_DEVICE_EM
    batched.FORCE_DEVICE_EM = device_em
    try:
        eng = BatchedWindowEngine([bam], fa, params, dtype=np.float64,
                                  batch_windows=128,
                                  max_pairs_per_slab=8192)
        glf = str(tmp_path / f"out_{tag}.glf.txt")
        for wf in win_files:
            eng.detect_indels(wf, glf)
        assert eng.stats.stage_seconds.get("slab_rescues", 0) == 0
        if device_em:
            assert eng.stats.stage_seconds.get("device_em", 0) > 0, \
                "device EM never dispatched (vacuous A/B)"
        eng.close()
    finally:
        batched.FORCE_DEVICE_EM = old
    return open(glf).read()


_FLOAT = re.compile(r"^-?\d+\.?\d*(e[+-]?\d+)?$|^-?inf$|^-?nan$", re.I)


def _compare(a_text, b_text, rtol):
    al = a_text.splitlines()
    bl = b_text.splitlines()
    assert len(al) == len(bl)
    for la, lb in zip(al, bl):
        ta, tb = la.split(" "), lb.split(" ")
        assert len(ta) == len(tb), (la, lb)
        for xa, xb in zip(ta, tb):
            if xa == xb:
                continue
            # differing tokens must be floats within tolerance; glf and
            # hapfreqs columns pack floats with ':'/','/';' separators
            pa = re.split(r"[:,;/]", xa)
            pb = re.split(r"[:,;/]", xb)
            assert len(pa) == len(pb), (xa, xb)
            for fa_, fb_ in zip(pa, pb):
                if fa_ == fb_:
                    continue
                assert _FLOAT.match(fa_) and _FLOAT.match(fb_), (xa, xb)
                va, vb = float(fa_), float(fb_)
                assert math.isclose(va, vb, rel_tol=rtol, abs_tol=1e-2), \
                    (la, lb)


@pytest.mark.parametrize("program", ["singlevariant", "all"])
def test_device_em_matches_host(tmp_path, program):
    fa, bam, wfs = _sim(tmp_path, 9)
    host = _run(tmp_path, fa, bam, wfs, False, f"host_{program}", program)
    dev = _run(tmp_path, fa, bam, wfs, True, f"dev_{program}", program)
    assert "singlevariant" in host or "all" in host
    _compare(host, dev, rtol=2e-3)


def test_device_em_kernel_converges_like_host():
    """Direct kernel check on a synthetic instance: loglik/pi match the
    host loop to f64 tolerance when run in f64."""
    from dindel_tpu.infer.device_em import run_batched_em
    from dindel_tpu.infer.pooled import digamma
    from dindel_tpu.utils import add_logs

    rng = np.random.RandomState(0)
    nr, nh = 37, 5
    rlT = -np.abs(rng.randn(nr, nh)) * 8.0
    compat = np.array([[1, 1, 0, 1, 1], [1, 0, 0, 0, 1]], bool)
    numah = np.array([4.0, 2.0])
    res = run_batched_em([(rlT, compat, numah)], a0=0.001, tol=1e-4,
                         dtype=np.float64)[0]

    for a in range(2):
        lpi = np.where(compat[a], math.log(1.0 / numah[a]), -100.0)
        e_old = -math.inf
        it = 0
        while True:
            Z = lpi[None, :] + rlT
            lognorm = np.full(nr, -math.inf)
            for h in range(nh):
                lognorm = np.logaddexp(lognorm, Z[:, h])
            zz = np.exp(Z - lognorm[:, None])
            nk = zz.sum(axis=0)
            loglik = lognorm.sum()
            ak = np.where(compat[a], nk + 0.001, 0.0)
            ahat = ak.sum()
            lpi = np.where(compat[a],
                           [digamma(x) - digamma(ahat) if c else 0.0
                            for x, c in zip(ak, compat[a])], -100.0)
            with np.errstate(divide="ignore"):
                pi = np.where(compat[a],
                              np.log((0.001 + nk) / (numah[a] * 0.001 + nr)),
                              -100.0)
            e_new = (zz * (pi[None, :] + rlT)).sum()
            conv = abs(e_old - e_new) < 1e-4 or it > 25
            e_old = e_new
            it += 1
            if conv:
                break
        got_ll, got_pi = res[a]
        assert abs(got_ll - loglik) < 1e-6 * max(1.0, abs(loglik))
        np.testing.assert_allclose(got_pi[compat[a]], pi[compat[a]],
                                   rtol=1e-6)
