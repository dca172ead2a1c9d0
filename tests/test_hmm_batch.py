"""Batched JAX pair-HMM vs the float64 NumPy oracle: must agree exactly
(float64 on CPU) on ll, flags, MAP states and extracted variant events."""

import random

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.model import Haplotype, Read
from dindel_tpu.hmm.reference import pair_hmm_single
from dindel_tpu.hmm.batch import BatchedPairHMM

BASES = "ACGT"


def rand_window(rng, nh=4, nr=12, H=90, L=60):
    ref = "".join(rng.choice(BASES) for _ in range(H))
    i = rng.randrange(10, H - 20)
    ref = ref[:i] + rng.choice(BASES) * 5 + ref[i + 5:]
    haps = [Haplotype(seq=ref)]
    for _ in range(nh - 1):
        h = ref
        k = rng.randrange(5, len(h) - 10)
        r = rng.random()
        if r < 0.4:
            h = h[:k] + h[k + rng.randint(1, 4):]
        elif r < 0.8:
            ins = "".join(rng.choice(BASES) for _ in range(rng.randint(1, 4)))
            h = h[:k] + ins + h[k:]
        else:
            h = h[:k] + rng.choice(BASES) + h[k + 1:]
        haps.append(Haplotype(seq=h))
    reads = []
    for _ in range(nr):
        src = haps[rng.randrange(len(haps))].seq
        start = rng.randrange(0, max(1, len(src) - L // 2))
        seq = src[start:start + L]
        if len(seq) < 10:
            seq = src[:10]
        seq = list(seq)
        for b in range(len(seq)):
            if rng.random() < 0.01:
                seq[b] = rng.choice(BASES)
        quals = np.array([1.0 - 10 ** (-rng.uniform(1, 3.5)) for _ in seq])
        reads.append(Read(seq="".join(seq), qual=quals,
                          map_qual=1.0 - 10 ** (-rng.uniform(1, 15)),
                          pos_stat_first=float(start),
                          is_unmapped=rng.random() < 0.05))
    return haps, reads


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_oracle(seed):
    rng = random.Random(seed)
    haps, reads = rand_window(rng)
    params = ObservationModelParameters()
    hmm = BatchedPairHMM(params, dtype=np.float64)
    liks = hmm.compute(haps, reads, hap_start=0)
    for hi, hap in enumerate(haps):
        for ri, r in enumerate(reads):
            ml_ref = pair_hmm_single(hap, r, 0, params)
            ml = liks[hi][ri]
            assert ml.ll == pytest.approx(ml_ref.ll, abs=1e-9), (hi, ri)
            assert ml.off_hap == ml_ref.off_hap, (hi, ri)
            assert ml.off_hap_hmq == ml_ref.off_hap_hmq, (hi, ri)
            assert ml.hpos == ml_ref.hpos, (hi, ri)
            assert {k: v.str for k, v in ml.indels.items()} == \
                   {k: v.str for k, v in ml_ref.indels.items()}, (hi, ri)
            assert {k: v.str for k, v in ml.snps.items()} == \
                   {k: v.str for k, v in ml_ref.snps.items()}, (hi, ri)
            assert ml.first_base == ml_ref.first_base
            assert ml.last_base == ml_ref.last_base
            assert ml.hap_indel_covered == ml_ref.hap_indel_covered
            assert ml.n_bqt == ml_ref.n_bqt
            assert ml.num_mismatch == ml_ref.num_mismatch


def test_varied_lengths():
    rng = random.Random(7)
    haps, reads = rand_window(rng, nh=6, nr=8, H=130, L=100)
    params = ObservationModelParameters()
    hmm = BatchedPairHMM(params, dtype=np.float64)
    liks = hmm.compute(haps, reads, hap_start=0)
    for hi, hap in enumerate(haps):
        for ri, r in enumerate(reads):
            ml_ref = pair_hmm_single(hap, r, 0, params)
            assert liks[hi][ri].ll == pytest.approx(ml_ref.ll, abs=1e-9)


def test_fast_finish_matches_exact_f32():
    """The parallel-argmax finish (exact_ties=False) must be bit-identical
    to the sequential EPS-guarded fold on realistic f32 workloads (the EPS
    margin is sub-ulp for any |ll| >= ~0.01; see _finish docstring)."""
    import jax.numpy as jnp
    from dindel_tpu.config import ObservationModelParameters
    from dindel_tpu.hmm.batch import (pack_pairs, compute_obs_mid, _finish,
                                      _dp_xla)
    from dindel_tpu.parallel.mesh import synth_windows

    (haps, reads, hs), = synth_windows(1, nh=4, nr=48, H=90, L=60, seed=11)
    pk = pack_pairs(haps, reads, hs, ObservationModelParameters(),
                    dtype=np.float32)
    args = [jnp.asarray(pk[k]) for k in
            ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
             "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]] \
        + [jnp.asarray(pk["scalars"])]
    amid, bmid_, btf, btb = _dp_xla(pk["H_pad"], pk["L_pad"], pk["numT"],
                                    *args)
    om = jnp.asarray(compute_obs_mid(pk))
    bm = jnp.asarray(pk["b_mid"])
    prr = jnp.asarray(pk["prior_rmq"])
    prh = jnp.asarray(pk["prior_hmq"])
    common = (pk["H_pad"], pk["L_pad"], bm, amid, bmid_, om, prr, prh,
              btf, btb)
    exact = _finish(*common, exact_ties=True)
    fast = _finish(*common, exact_ties=False)
    for name, x, y in zip(["ll", "off_hap", "off_hap_hmq", "ll_off",
                           "ll_on", "map_state"], exact, fast):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name
