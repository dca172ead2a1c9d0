"""Differential tests for haplotype generation against the compiled
reference HaplotypeDistribution/HDIterator2 (HaplotypeDistribution.cpp:29-486,
HaplotypeDistribution.hpp:82-496, HapBlock.cpp:20-204).

Randomized windows of reads with M/I/D/S CIGARs plus candidate variants are
fed to both native/refshim/hapgen_driver.cpp (unmodified reference TUs) and
our engine.hapgen port; the generated haplotype lists must match exactly —
sequences, frequencies (bit-for-bit doubles), window extent, logNumHaps, and
thrown error strings."""

import math
import random
import subprocess

import pytest

from conftest import ref_hapgen_exe
from dindel_tpu.engine.hapgen import (HapGenError, HaplotypeDistribution,
                                      HDIterator)
from dindel_tpu.variants import AlignedCandidates, AlignedVariant


class _Rec:
    """Minimal BamRecord stand-in for HaplotypeDistribution.insert_read."""

    def __init__(self, pos, flag, cigar, seq):
        self.pos = pos
        self.flag = flag
        self.cigar = cigar
        self.seq = seq


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _gen_read(rng, ref_start, ref_len):
    """A read with a random (valid) CIGAR overlapping the window."""
    pos = ref_start + rng.randrange(max(ref_len - 15, 1))
    pat = rng.choice(["M", "M", "M", "MIM", "MDM", "SM", "MS", "MDMIM",
                      "MIMDM", "MDMDM"])
    ops = []
    for opc in pat:
        if opc == "M":
            ln = rng.randrange(4, 18)
        elif opc == "I":
            ln = rng.randrange(1, 5)
        elif opc == "D":
            # occasionally exercise the >30bp deletion recode clamp
            # (HaplotypeDistribution.cpp:128-136)
            ln = 32 if rng.random() < 0.05 else rng.randrange(1, 6)
        else:  # S
            ln = rng.randrange(1, 6)
        ops.append((opc, ln))
    seq = _rand_seq(rng, sum(ln for opc, ln in ops if opc != "D"))
    flag = 8 if rng.random() < 0.1 else 0  # BAM_FMUNMAP quirk: read skipped
    return _Rec(pos, flag, ops, seq)


def _gen_case(rng):
    ref_len = rng.randrange(40, 110)
    ref_start = rng.randrange(10, 900)
    ref_seq = _rand_seq(rng, ref_len)
    left = ref_start + rng.randrange(4, 12)
    right = ref_start + ref_len - 1 - rng.randrange(4, 12)
    if right <= left + 8:
        right = left + 9
    mid = left + (right - left) // 2
    max_hap = rng.choice([2, 4, 8, 8])
    change_n = rng.random() < 0.2
    reads = [_gen_read(rng, ref_start, ref_len)
             for _ in range(rng.randrange(2, 12))]
    cvars = []
    for _ in range(rng.randrange(0, 4)):
        vpos = rng.randrange(left, right + 1)
        kind = rng.randrange(3)
        if kind == 0:
            vs = "+" + _rand_seq(rng, rng.randrange(1, 4))
        elif kind == 1:
            # NB: the reference has undefined behavior (out-of-bounds
            # vector::erase, HaplotypeDistribution.hpp:262-266) when a
            # candidate deletion extends past the haplotype tail; keep
            # generated DELs clear of the right edge so the driver stays
            # in defined territory (our port clamps via slice semantics).
            ln = rng.randrange(1, 4)
            if vpos > right - ln - 6:
                vpos = max(left, right - ln - 6)
            vs = "-" + _rand_seq(rng, ln)
        else:
            vs = rng.choice("ACGT") + "=>" + rng.choice("ACGT")
        cvars.append((vpos, rng.random() < 0.5, vs))
    return dict(mid=mid, ref_start=ref_start, left=left, right=right,
                max_hap=max_hap, change_n=change_n, ref_seq=ref_seq,
                reads=reads, cvars=cvars)


def _case_text(c):
    lines = [f"CASE {c['mid']} {c['ref_start']} {c['left']} {c['right']} "
             f"{c['max_hap']} -1 {1 if c['change_n'] else 0} {c['ref_seq']}"]
    for r in c["reads"]:
        cig = "".join(f"{ln}{op}" for op, ln in r.cigar)
        lines.append(f"READ {r.pos} {r.flag} 40 {cig} {r.seq}")
    for vpos, add_comb, vs in c["cvars"]:
        lines.append(f"VAR {vpos} {1 if add_comb else 0} {vs}")
    lines.append("RUN")
    return "\n".join(lines) + "\n"


def _run_ref(exe, cases):
    inp = "".join(_case_text(c) for c in cases)
    res = subprocess.run([str(exe)], input=inp, capture_output=True,
                         text=True, timeout=300)
    outs = []
    cur = None
    for line in res.stdout.splitlines():
        if line.startswith("OK "):
            _, s, e, lnh = line.split()
            cur = dict(ok=True, start=int(s), end=int(e),
                       log_num_haps=float(lnh), haps=[])
        elif line.startswith("HAP"):
            parts = line.split(" ")
            # "HAP <seq> <freq>"; seq may be empty
            cur["haps"].append((parts[1], float(parts[2])))
        elif line.startswith("ERR "):
            cur = dict(ok=False, err=line[4:])
        elif line == "ENDCASE":
            outs.append(cur)
            cur = None
    assert len(outs) == len(cases), (
        f"driver produced {len(outs)}/{len(cases)} cases "
        f"(crash?)\nstderr: {res.stderr[-2000:]}")
    return outs


def _run_py(c):
    cands = AlignedCandidates(
        tid="1",
        variants=[AlignedVariant(vs, start_hap=vpos, add_comb=add_comb)
                  for vpos, add_comb, vs in c["cvars"]],
        left_pos=c["left"], right_pos=c["right"])
    try:
        hd = HaplotypeDistribution(c["mid"], c["ref_seq"], c["ref_start"])
        for r in c["reads"]:
            hd.insert_read(r)
        hd.set_frequencies()
        hdi = HDIterator(hd, c["max_hap"], c["mid"], c["left"], c["right"], -1)
        haps = hdi.generate_haps_with_aligned_variants(cands, c["change_n"])
        return dict(ok=True, start=hdi.start(), end=hdi.end(),
                    log_num_haps=hdi.get_log_num_haps(),
                    haps=[(h.seq, h.freq) for h in haps])
    except HapGenError as e:
        return dict(ok=False, err=str(e))


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_hapgen_differential_randomized(seed):
    exe = ref_hapgen_exe()
    if exe is None:
        pytest.skip("reference sources unavailable")
    rng = random.Random(seed)
    cases = [_gen_case(rng) for _ in range(80)]
    refs = _run_ref(exe, cases)
    n_err = 0
    for i, (c, ref) in enumerate(zip(cases, refs)):
        got = _run_py(c)
        ctx = f"case {i} (seed {seed}): {_case_text(c)}"
        assert got["ok"] == ref["ok"], ctx + f"\nref={ref}\ngot={got}"
        if not ref["ok"]:
            n_err += 1
            assert got["err"] == ref["err"], ctx
            continue
        assert got["start"] == ref["start"], ctx
        assert got["end"] == ref["end"], ctx
        assert got["log_num_haps"] == ref["log_num_haps"], ctx
        assert len(got["haps"]) == len(ref["haps"]), (
            ctx + f"\nref={ref['haps']}\ngot={got['haps']}")
        for (gs, gf), (rs, rf) in zip(got["haps"], ref["haps"]):
            assert gs == rs, ctx
            assert gf == rf, ctx + f" freq {gf!r} != {rf!r} for {gs}"
    # the generator should exercise both success and failure paths
    assert n_err < len(cases)


def test_hapgen_differential_dense_pileup():
    """Deep pileup over one window: many overlapping reads sharing indels
    so block splitting, frequency pruning (setThresholds) and the deletion
    recode all engage."""
    exe = ref_hapgen_exe()
    if exe is None:
        pytest.skip("reference sources unavailable")
    rng = random.Random(7)
    ref_start = 100
    ref_seq = _rand_seq(rng, 80)
    left, right = 110, 165
    mid = 137
    reads = []
    for k in range(40):
        pos = ref_start + rng.randrange(0, 40)
        if k % 3 == 0:
            cig = [("M", 20), ("D", 3), ("M", 15)]
        elif k % 3 == 1:
            cig = [("M", 18), ("I", 2), ("M", 17)]
        else:
            cig = [("M", 35)]
        seq = _rand_seq(rng, sum(ln for op, ln in cig if op != "D"))
        reads.append(_Rec(pos, 0, cig, seq))
    case = dict(mid=mid, ref_start=ref_start, left=left, right=right,
                max_hap=8, change_n=False, ref_seq=ref_seq, reads=reads,
                cvars=[(137, True, "-TT"), (120, False, "+GG")])
    ref = _run_ref(exe, [case])[0]
    got = _run_py(case)
    assert got == ref
