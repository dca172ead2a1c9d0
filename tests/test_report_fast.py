"""The vectorized fast-path MAP decode in BatchedPairHMM.compute must
produce MLAlignments identical to the per-base _report_variants loop,
for clean reads AND reads whose MAP paths carry indel events (which take
the slow path)."""

import random

import numpy as np
import pytest

from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.hmm.batch import BatchedPairHMM
from dindel_tpu.hmm.reference import pair_hmm_single
from dindel_tpu.model import Haplotype, Read
from dindel_tpu.parallel.mesh import synth_windows


def _assert_ml_equal(a, b, ctx):
    # ll tolerance matches test_hmm_batch: the batched finish fold
    # associates the prior sum differently from the single-pair oracle
    assert a.ll == pytest.approx(b.ll, abs=1e-9), ctx
    assert a.off_hap == b.off_hap, ctx
    assert a.off_hap_hmq == b.off_hap_hmq, ctx
    assert a.hpos == b.hpos, ctx
    assert a.first_base == b.first_base, ctx
    assert a.last_base == b.last_base, ctx
    assert a.align == b.align, ctx
    assert a.num_indels == b.num_indels, ctx
    assert a.num_mismatch == b.num_mismatch, ctx
    assert a.n_bqt == b.n_bqt, ctx
    assert a.m_log_bq == b.m_log_bq, ctx
    assert a.n_mm_bqt == b.n_mm_bqt, ctx
    assert a.n_mm_left == b.n_mm_left, ctx
    assert a.n_mm_right == b.n_mm_right, ctx
    assert sorted(a.indels) == sorted(b.indels), ctx
    for k in a.indels:
        assert a.indels[k].str == b.indels[k].str, ctx
    assert sorted(a.snps) == sorted(b.snps), ctx
    for k in a.snps:
        assert a.snps[k].str == b.snps[k].str, ctx
    assert a.hap_indel_covered == b.hap_indel_covered, ctx
    assert a.hap_snp_covered == b.hap_snp_covered, ctx


def test_batched_decode_matches_oracle():
    """Batched (fast-path + slow-path) MLAlignments vs pair_hmm_single on
    reads with mismatches, planted indels, and off-window placements."""
    rng = random.Random(17)
    params = ObservationModelParameters()
    (haps, reads, hs), = synth_windows(1, nh=3, nr=24, H=90, L=48, seed=21)
    # mutate reads: mismatches everywhere, some deletions/insertions vs hap
    for ri, r in enumerate(reads):
        s = list(r.seq)
        for _ in range(rng.randrange(0, 5)):
            s[rng.randrange(len(s))] = rng.choice("ACGT")
        if ri % 4 == 1:   # deletion in read
            i = rng.randrange(5, len(s) - 8)
            del s[i:i + rng.randrange(1, 4)]
        if ri % 4 == 2:   # insertion in read
            i = rng.randrange(5, len(s) - 8)
            for _ in range(rng.randrange(1, 4)):
                s.insert(i, rng.choice("ACGT"))
        r.seq = "".join(s)
        r.qual = np.asarray([rng.choice([0.9, 0.97, 0.999, 1 - 1e-16])
                             for _ in r.seq])
        r.map_qual = rng.choice([0.9, 0.999, 1 - 1e-16])
    hmm = BatchedPairHMM(params, dtype=np.float64)
    liks = hmm.compute(haps, reads, hs)
    n_events = 0
    for hi, hap in enumerate(haps):
        for ri, r in enumerate(reads):
            want = pair_hmm_single(hap, r, hs, params)
            got = liks[hi][ri]
            n_events += bool(want.indels)
            _assert_ml_equal(got, want, (hi, ri))
    assert n_events > 0  # both decode paths exercised
