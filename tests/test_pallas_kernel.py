"""Pallas DP kernel vs the XLA DP implementation (interpret mode on CPU):
identical alpha/beta bMid slices and backpointers with exact_ties=True."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.hmm.batch import pack_pairs, _dp_xla
from dindel_tpu.hmm.pallas_kernel import dp_pallas
from dindel_tpu.parallel.mesh import synth_windows


def test_pallas_matches_xla_interpret():
    params = ObservationModelParameters()
    (haps, reads, hs), = synth_windows(1, nh=4, nr=32, H=80, L=14, seed=3)
    pk = pack_pairs(haps, reads, hs, params, dtype=np.float32,
                    H_pad=126, L_pad=16)
    keys = ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
            "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]
    args = [jnp.asarray(pk[k]) for k in keys] + [jnp.asarray(pk["scalars"])]
    a1, b1, f1, g1 = [np.asarray(x) for x in _dp_xla(
        pk["H_pad"], pk["L_pad"], pk["numT"], *args)]
    a2, b2, f2, g2 = [np.asarray(x) for x in dp_pallas(
        pk["H_pad"], pk["L_pad"], pk["numT"], *args,
        interpret=True, exact_ties=True)]
    L_act = int(pk["read_len"].max())
    assert np.abs(a1 - a2).max() == 0.0
    assert np.abs(b1 - b2).max() == 0.0
    assert (f1[:L_act - 1].astype(np.int32) != f2[:L_act - 1]).sum() == 0
    assert (g1[:L_act - 1].astype(np.int32) != g2[:L_act - 1]).sum() == 0
