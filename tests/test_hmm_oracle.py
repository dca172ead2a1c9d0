"""Differential tests: NumPy oracle pair-HMM vs the compiled reference
ObservationModelFBMaxErr (exact, bit-level where floating point allows)."""

import math
import random
import subprocess

import numpy as np
import pytest

from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.model import Haplotype, Read
from dindel_tpu.hmm.reference import pair_hmm_single

from conftest import ref_hmm_exe

BASES = "ACGT"


def mutate(seq: str, rng: random.Random, n_snp=0, n_ins=0, n_del=0):
    s = list(seq)
    for _ in range(n_snp):
        i = rng.randrange(len(s))
        s[i] = rng.choice(BASES)
    out = "".join(s)
    for _ in range(n_del):
        if len(out) > 8:
            i = rng.randrange(1, len(out) - 5)
            ln = rng.randint(1, 4)
            out = out[:i] + out[i + ln:]
    for _ in range(n_ins):
        i = rng.randrange(1, len(out) - 1)
        ins = "".join(rng.choice(BASES) for _ in range(rng.randint(1, 4)))
        out = out[:i] + ins + out[i:]
    return out


def run_ref(exe, cases):
    inp = "\n".join(cases) + "\n"
    out = subprocess.run([str(exe)], input=inp, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[:500]
    return out.stdout.strip().split("\n")


def make_case(rng: random.Random):
    H = rng.randint(20, 120)
    hap = "".join(rng.choice(BASES) for _ in range(H))
    # sprinkle homopolymers so the error model matters
    if rng.random() < 0.7:
        i = rng.randrange(2, H - 10)
        hap = hap[:i] + rng.choice(BASES) * rng.randint(3, 8) + hap[i + 6:]
    start = rng.randrange(0, max(1, len(hap) - 15))
    ln = rng.randint(10, len(hap) - start)
    read = hap[start:start + ln]
    read = mutate(read, rng, n_snp=rng.randint(0, 3),
                  n_ins=rng.randint(0, 1), n_del=rng.randint(0, 1))
    if len(read) < 5:
        read = hap[start:start + 10]
    quals = [min(1 - 1e-16, max(1e-16, 1.0 - 10 ** (-rng.uniform(1, 4)))) for _ in read]
    map_qual = 1.0 - 10 ** (-rng.uniform(1, 15.9))
    pos_stat = float(start + rng.randint(-3, 3))
    hap_start = 0
    max_len_del = rng.choice([5, 10])
    if max_len_del > len(hap):
        max_len_del = 5
    p_error = rng.choice([5e-4, 1e-4])
    p_mut = rng.choice([1e-5, 1e-4])
    b_mid = -1 if rng.random() < 0.8 else rng.randrange(0, len(read))
    force = 0
    unmapped = 1 if rng.random() < 0.1 else 0
    return dict(hap=hap, read=read, quals=quals, map_qual=map_qual,
                pos_stat=pos_stat, hap_start=hap_start,
                max_len_del=max_len_del, p_error=p_error, p_mut=p_mut,
                b_mid=b_mid, force=force, unmapped=unmapped)


def case_to_line(c):
    q = ",".join(repr(x) for x in c["quals"])
    return (f"{c['hap']} {c['read']} {c['map_qual']!r} {c['pos_stat']!r} "
            f"{c['hap_start']} {c['p_error']!r} {c['p_mut']!r} {c['max_len_del']} "
            f"0.01 {c['b_mid']} {c['force']} {c['unmapped']} {q}")


def run_oracle(c):
    params = ObservationModelParameters(
        p_error=c["p_error"], p_mut=c["p_mut"],
        max_length_del=c["max_len_del"], max_length_indel=c["max_len_del"],
        b_mid=c["b_mid"], force_read_on_haplotype=bool(c["force"]))
    hap = Haplotype(seq=c["hap"])
    read = Read(seq=c["read"], qual=np.array(c["quals"]),
                map_qual=c["map_qual"], pos_stat_first=c["pos_stat"],
                is_unmapped=bool(c["unmapped"]))
    return pair_hmm_single(hap, read, c["hap_start"], params)


@pytest.fixture(scope="module")
def exe():
    e = ref_hmm_exe()
    if e is None:
        pytest.skip("reference not available to compile")
    return e


def test_smain_case(exe):
    hap = "ATCGATTCGTGATATATATATTCAATGTAGTCGCTAG"
    read = "ATCGATTCGTGATAATATTCAATGTAGTCGCTAG"
    c = dict(hap=hap, read=read, quals=[0.99] * len(read), map_qual=1 - 1e-16,
             pos_stat=0.0, hap_start=0, max_len_del=10, p_error=1e-4,
             p_mut=1e-4, b_mid=-1, force=0, unmapped=0)
    ref = run_ref(exe, [case_to_line(c)])[0]
    ml = run_oracle(c)
    ref_ll = float(ref.split()[0])
    assert ml.ll == pytest.approx(ref_ll, abs=1e-12)
    assert "14:-TAT" in ref
    assert 14 in ml.indels and ml.indels[14].str == "-TAT"


def test_smain_case2(exe):
    hap = ("AAAATCACCAACACTTCATAATCTATTTTTTCCCCTGAGGAACTTCCTAAAATGAATAAAAAAAAACCCC"
           "AGCCACATCTGCATTTGCAAACAGGAAACTCTGCAAGCCATACTAAGACCAAAGCTTAGTT")
    read = "CAAACAGGAAACTCTGCAAGCCATACTAAGACCAAAGCTTAGTTA"
    c = dict(hap=hap, read=read, quals=[0.99] * len(read), map_qual=1 - 1e-16,
             pos_stat=0.0, hap_start=0, max_len_del=10, p_error=1e-4,
             p_mut=1e-4, b_mid=-1, force=0, unmapped=0)
    ref = run_ref(exe, [case_to_line(c)])[0]
    ml = run_oracle(c)
    assert ml.ll == pytest.approx(float(ref.split()[0]), abs=1e-12)


def test_random_differential(exe):
    rng = random.Random(1234)
    cases = [make_case(rng) for _ in range(120)]
    ref_lines = run_ref(exe, [case_to_line(c) for c in cases])
    n_mismatch = 0
    for i, (c, line) in enumerate(zip(cases, ref_lines)):
        head, ms, indels, snps = [p.strip() for p in line.split("|")]
        toks = head.split()
        ref_ll = float(toks[0])
        ref_off = int(toks[1])
        ref_off_hmq = int(toks[2])
        ref_first, ref_last = int(toks[5]), int(toks[6])
        ml = run_oracle(c)
        assert ml.ll == pytest.approx(ref_ll, rel=1e-12, abs=1e-10), f"case {i}"
        assert int(ml.off_hap) == ref_off, f"case {i}"
        assert int(ml.off_hap_hmq) == ref_off_hmq, f"case {i}"
        assert ml.first_base == ref_first and ml.last_base == ref_last, f"case {i}"
        my_indels = " ".join(f"{p}:{v.str}" for p, v in sorted(ml.indels.items()))
        my_snps = " ".join(f"{p}:{v.str}" for p, v in sorted(ml.snps.items()))
        assert my_indels == indels, f"case {i}: {my_indels!r} != {indels!r}"
        assert my_snps == snps, f"case {i}: {my_snps!r} != {snps!r}"
    assert n_mismatch == 0
