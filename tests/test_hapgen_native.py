"""The native block algebra (native/hapdist.cpp) must reproduce the
Python HaplotypeDistribution exactly: same blocks, same per-block
haplotype sets/counts/types/frequencies, same error strings — on
randomized synthetic CIGARs and on real simulated windows (the Python
implementation is itself differential-tested against the compiled
reference in tests/test_hapgen_ref.py, so equality here chains to the
reference)."""

import random

import pytest

from dindel_tpu.engine.hapgen import HapGenError, HaplotypeDistribution
from dindel_tpu.engine.hapgen_native import (NativeHaplotypeDistribution,
                                             native_lib)

pytestmark = pytest.mark.skipif(native_lib() is None,
                                reason="native hapdist unavailable")


class FakeRec:
    def __init__(self, pos, cigar, seq, flag=0):
        self.pos = pos
        self.cigar = cigar
        self.seq = seq
        self.flag = flag


def hd_signature(hd):
    blocks = [(b.pos0, b.pos1, b.type,
               tuple(sorted((s, h.type, h.count, round(h.freq, 12))
                            for s, h in b.haps.items())))
              for b in hd.blocks]
    ins = {p: (b.pos0, b.pos1, b.type,
               tuple(sorted((s, h.type, h.count, round(h.freq, 12))
                            for s, h in b.haps.items())))
           for p, b in hd.insertions.items()}
    return blocks, ins


def random_read(rng, ref_len, ref_start):
    """Random CIGAR walk: M segments with occasional I/D/S ops."""
    pos = ref_start + rng.randrange(ref_len - 30)
    cigar = []
    seq = []
    if rng.random() < 0.15:
        n = rng.randint(1, 5)
        cigar.append(("S", n))
        seq.append("".join(rng.choice("ACGT") for _ in range(n)))
    n_ops = rng.randint(1, 4)
    for k in range(n_ops):
        m = rng.randint(3, 25)
        cigar.append(("M", m))
        seq.append("".join(rng.choice("ACGT") for _ in range(m)))
        if k < n_ops - 1:
            if rng.random() < 0.5:
                d = rng.randint(1, 35)  # >30 exercises the chr(65) clamp
                cigar.append(("D", d))
            else:
                i = rng.randint(1, 4)
                cigar.append(("I", i))
                seq.append("".join(rng.choice("ACGT") for _ in range(i)))
    if rng.random() < 0.15:
        n = rng.randint(1, 5)
        cigar.append(("S", n))
        seq.append("".join(rng.choice("ACGT") for _ in range(n)))
    return FakeRec(pos, cigar, "".join(seq))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_matches_python_random(seed):
    rng = random.Random(seed)
    ref_len = 160
    ref_start = 1000
    ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
    reads = [random_read(rng, ref_len - 40, ref_start)
             for _ in range(60)]

    py = HaplotypeDistribution(ref_start + 80, ref, ref_start)
    nat = NativeHaplotypeDistribution(ref_start + 80, ref, ref_start)
    for r in reads:
        e_py = e_nat = None
        try:
            py.insert_read(r)
        except HapGenError as e:
            e_py = str(e)
        try:
            nat.insert_read(r)
        except HapGenError as e:
            e_nat = str(e)
        assert e_py == e_nat
        if e_py is not None:
            return
    py.set_frequencies()
    nat.set_frequencies()
    assert hd_signature(py) == hd_signature(nat)


def test_native_error_strings():
    ref = "ACGTACGTACGT"
    for cigar, seq, msg in [
            ([("P", 4)], "", "I don't know how to smoke this CIGAR"),
            ([("M", 4), ("M", 4)], "ACGTACGT", None),
    ]:
        py = HaplotypeDistribution(6, ref, 0)
        nat = NativeHaplotypeDistribution(6, ref, 0)
        r = FakeRec(2, cigar, seq)
        for hd in (py, nat):
            got = None
            try:
                hd.insert_read(r)
            except HapGenError as e:
                got = str(e)
            assert got == msg


def test_native_through_simulated_window(tmp_path):
    """Same signature on records from a real simulated BAM."""
    from dindel_tpu.io.bam_native import open_bam
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=760, var="+TT", genotype=1)]
    cfg = SimConfig(ref_len=1500, coverage=30, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=13)
    ref = "".join(l.strip() for l in open(fa) if not l.startswith(">"))
    rdr = open_bam(bam)
    recs = [r for r in rdr if 600 <= r.pos <= 900]
    rdr.close()
    assert len(recs) > 20
    window_ref = ref[580:920]
    py = HaplotypeDistribution(750, window_ref, 580)
    nat = NativeHaplotypeDistribution(750, window_ref, 580)
    for r in recs:
        py.insert_read(r)
        nat.insert_read(r)
    py.set_frequencies()
    nat.set_frequencies()
    assert hd_signature(py) == hd_signature(nat)
