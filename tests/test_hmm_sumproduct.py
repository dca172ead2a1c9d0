"""Tests for the sum-product (exact forward) pair-HMM.

The reference's own sum-product likelihood path is dead code
(ObservationModelFB::calcLikelihoodFromLastSlice throws 'CHANGE ME!'
unconditionally, ObservationModelFB.cpp:122-124, and the base class is
never instantiated by DInDel.cpp), so there is no differential target;
these are property tests of the intended semantics instead."""

import math
import random

import numpy as np

from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.model import Haplotype, Read
from dindel_tpu.hmm.reference import (
    _TransSum, _pass_sum_dec, _pass_sum_inc, _emissions,
    pair_hmm_single, pair_hmm_single_sum)

NEG = -math.inf


def _lse(a):
    m = np.max(a)
    return m + math.log(np.sum(np.exp(a - m))) if m != NEG else NEG


def test_dec_pass_is_stochastic_interior():
    """Interior source states have outgoing transition mass exactly 1, so
    with obs == 0 a one-hot source must produce logsumexp(dest) == 0.
    Boundary states are intentionally NOT conserving: the reference's
    deletion clamp (newx = max(x-y, 0), ObservationModelFB.cpp:633-640)
    double-counts LO, and on-hap sources within numT of the right edge leak
    mass (dest RO only receives from src H/RO) — the port mirrors that
    structure."""
    params = ObservationModelParameters()
    tr = _TransSum(params)
    H = 20
    S = 2 * (H + 2)
    obs = np.zeros(S)
    for x in range(1, H - tr.numT + 2):       # interior noins sources
        src = np.full(S, NEG)
        src[x] = 0.0
        dest = _pass_sum_dec(tr, H, src, obs)
        assert abs(_lse(dest)) < 1e-12, f"noins src state {x}"
    for x in range(0, H + 2):                 # every ins source conserves
        src = np.full(S, NEG)
        src[H + 2 + x] = 0.0
        dest = _pass_sum_dec(tr, H, src, obs)
        assert abs(_lse(dest)) < 1e-12, f"ins src state {x}"
    # LO double-counts (mass > 1), src H leaks (mass < 1)
    src = np.full(S, NEG)
    src[0] = 0.0
    assert _lse(_pass_sum_dec(tr, H, src, obs)) > 1e-3
    src = np.full(S, NEG)
    src[H] = 0.0
    assert _lse(_pass_sum_dec(tr, H, src, obs)) < -1e-3


def test_inc_pass_unit_when_beta_zero():
    """beta[b-1][dest] = sum_src P(src|dest) * obs[src] * beta[b][src]; with
    obs = beta = 0 every dest must equal log 1 = 0."""
    params = ObservationModelParameters()
    tr = _TransSum(params)
    H = 9
    S = 2 * (H + 2)
    dest = _pass_sum_inc(tr, H, np.zeros(S), np.zeros(S))
    np.testing.assert_allclose(dest, 0.0, atol=1e-12)


def test_sum_linearity():
    """Sum-product passes are log-linear: pass(logaddexp(a, b)) ==
    logaddexp(pass(a), pass(b)) — would fail for any max contamination."""
    rng = np.random.default_rng(0)
    params = ObservationModelParameters()
    tr = _TransSum(params)
    H = 8
    S = 2 * (H + 2)
    a = rng.normal(size=S)
    b = rng.normal(size=S)
    obs = rng.normal(size=S)
    for p in (_pass_sum_dec, _pass_sum_inc):
        lhs = p(tr, H, np.logaddexp(a, b), obs)
        rhs = np.logaddexp(p(tr, H, a, obs), p(tr, H, b, obs))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def _mk(hap_seq, read_seq, qual=0.999, map_qual=1 - 1e-6, pos=0.0):
    hap = Haplotype(seq=hap_seq)
    read = Read(seq=read_seq, qual=np.full(len(read_seq), qual),
                map_qual=map_qual, pos_stat_first=pos)
    return hap, read


def test_sum_ll_sane_and_marginals_normalized():
    rng = random.Random(1)
    hap_seq = "".join(rng.choice("ACGT") for _ in range(60))
    read_seq = hap_seq[10:50]
    hap, read = _mk(hap_seq, read_seq, pos=10.0)
    ll, off_hap, mar = pair_hmm_single_sum(hap, read, 0, want_marginals=True)
    # NB: ll can be slightly positive — the reference inits alpha[0] = 0 for
    # ALL states (ObservationModelFB.cpp:334-336), so the sum marginalizes
    # over every start state (bounded by log 2*numS)
    assert np.isfinite(ll) and ll < math.log(2 * 62)
    assert not off_hap
    assert mar.shape == (2 * 62,)
    np.testing.assert_allclose(mar.sum(), 1.0, rtol=1e-9)
    # the anchored-slice posterior concentrates on the true diagonal state:
    # read base bMid aligns to hap base (10 + bMid), state x = base + 1
    from dindel_tpu.hmm.reference import compute_b_mid
    b_mid = compute_b_mid(read, 0, len(hap_seq))
    assert mar.argmax() == 10 + b_mid + 1
    assert mar.max() > 0.9

    # sum-product marginalizes over paths: a clean read scores far better
    # than a garbage read against the same haplotype
    # a garbage read falls to the off-hap floor: its whole mass sits in
    # LO/RO paying the mapping-error prior (~log 1e-6 here)
    bad = "".join(rng.choice("ACGT") for _ in range(40))
    _, bad_read = _mk(hap_seq, bad, pos=10.0)
    ll_bad, off_bad, _ = pair_hmm_single_sum(hap, bad_read, 0)
    assert off_bad
    assert ll > ll_bad + 10.0
    assert ll_bad < math.log(1e-6) + 3.0


def test_sum_vs_max_map_agreement():
    """On an unambiguous perfect-overlap case the sum- and max-product
    models agree on on/off-hap classification and score within a few nats
    (they use different transition tables, so no exact relation holds)."""
    rng = random.Random(7)
    hap_seq = "".join(rng.choice("ACGT") for _ in range(80))
    read_seq = hap_seq[20:70]
    hap, read = _mk(hap_seq, read_seq, pos=20.0)
    ll_sum, off_sum, _ = pair_hmm_single_sum(hap, read, 0)
    ml = pair_hmm_single(hap, read, 0)
    assert not off_sum and not ml.off_hap
    assert abs(ll_sum - ml.ll) < 5.0
