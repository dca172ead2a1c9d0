"""Pallas DP kernel vs the XLA DP implementation (interpret mode on CPU):
identical alpha/beta bMid slices and backpointers with exact_ties=True."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.hmm.batch import pack_pairs, _dp_xla
from dindel_tpu.hmm.pallas_kernel import dp_pallas, expand_bt_codes
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
    a2, b2, f2c, g2c = [np.asarray(x) for x in dp_pallas(
        pk["H_pad"], pk["L_pad"], pk["numT"], *args,
        interpret=True, exact_ties=True)]
    # Pallas emits nibble-packed transition-class codes; expand to the
    # _dp_xla full-index format for the comparison
    f2, g2 = expand_bt_codes(f2c, g2c, pk["hap_len"], pk["H_pad"],
                             pk["numT"])
    L_act = int(pk["read_len"].max())
    assert np.abs(a1 - a2).max() == 0.0
    assert np.abs(b1 - b2).max() == 0.0
    # The anchor-bounded kernel only writes btf slices b <= max(b_mid) and
    # btb slices b >= min(b_mid) — exactly the rows _finish consumes
    # (its b<=b_mid / b>=b_mid selects discard the rest).
    MB = int(pk["b_mid"].max())
    MN = int(pk["b_mid"].min())
    assert (f1[:MB].astype(np.int32) != f2[:MB]).sum() == 0
    assert (g1[MN:L_act - 1].astype(np.int32) != g2[MN:L_act - 1]).sum() == 0


def test_pallas_finish_matches_xla():
    """End-of-contract check: dp_pallas (anchor-bounded) + _finish equals
    _dp_xla + _finish on every output, valid map_state region included."""
    from dindel_tpu.hmm.batch import compute_obs_mid, _finish

    params = ObservationModelParameters()
    (haps, reads, hs), = synth_windows(1, nh=3, nr=16, H=70, L=24, seed=9)
    pk = pack_pairs(haps, reads, hs, params, dtype=np.float32,
                    H_pad=126, L_pad=32)
    keys = ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
            "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]
    args = [jnp.asarray(pk[k]) for k in keys] + [jnp.asarray(pk["scalars"])]
    obs_mid = jnp.asarray(compute_obs_mid(pk))
    prr = jnp.asarray(pk["prior_rmq"])
    prh = jnp.asarray(pk["prior_hmq"])
    bm = jnp.asarray(pk["b_mid"])

    def fin(dp_out, bt_codes=False):
        return [np.asarray(o) for o in _finish(
            pk["H_pad"], pk["L_pad"], bm, *dp_out[:2], obs_mid, prr, prh,
            *dp_out[2:], exact_ties=True, bt_codes=bt_codes,
            numT=pk["numT"], hap_len=jnp.asarray(pk["hap_len"]))]

    ref = fin(_dp_xla(pk["H_pad"], pk["L_pad"], pk["numT"], *args))
    got = fin(dp_pallas(pk["H_pad"], pk["L_pad"], pk["numT"], *args,
                        interpret=True, exact_ties=True), bt_codes=True)
    valid = (np.arange(pk["L_pad"])[None, :]
             < np.asarray(pk["read_len"])[:, None])
    names = ("ll", "off_hap", "off_hap_hmq", "ll_off", "ll_on", "map_state")
    for nm, a, b in zip(names, ref, got):
        if nm == "map_state":
            a = np.where(valid, a, -1)
            b = np.where(valid, b, -1)
        assert np.array_equal(a, b), nm
