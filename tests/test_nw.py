"""Differential tests: our Gotoh NW + conversion vs the reference's SeqAn
globalAlignment path (score, hpos, indels with flanks, snps, align string)."""

import random
import subprocess

import pytest

from dindel_tpu.align.nw import (align_haplotype_to_ref, gotoh_align,
                                 _gotoh_py, convert_alignment)
from conftest import ref_nw_exe

BASES = "ACGT"


@pytest.fixture(scope="module")
def exe():
    e = ref_nw_exe()
    if e is None:
        pytest.skip("reference SeqAn not available")
    return e


def run_ref(exe, pairs):
    inp = "\n".join(f"{a} {b}" for a, b in pairs) + "\n"
    out = subprocess.run([str(exe)], input=inp, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[:400]
    return out.stdout.strip().split("\n")


def fmt_mine(ml):
    hpos = " ".join(str(h) for h in ml.hpos)
    indels = " ".join(
        f"{p}:{v.str}:{v.left_flank_hap}:{v.right_flank_hap}:{v.left_flank_read}:{v.right_flank_read}"
        for p, v in sorted(ml.indels.items()))
    snps = " ".join(f"{p}:{v.str}" for p, v in sorted(ml.snps.items()))
    return hpos, indels, snps


def make_pair(rng):
    n = rng.randint(20, 200)
    ref = "".join(rng.choice(BASES) for _ in range(n))
    if rng.random() < 0.7:  # homopolymer / repeat tracts
        i = rng.randrange(2, max(3, n - 12))
        unit = rng.choice(BASES) if rng.random() < 0.5 else "".join(
            rng.choice(BASES) for _ in range(2))
        ref = ref[:i] + unit * rng.randint(3, 6) + ref[i + 8:]
    cand = list(ref)
    # SNPs
    for _ in range(rng.randint(0, 2)):
        i = rng.randrange(len(cand))
        cand[i] = rng.choice(BASES)
    cand = "".join(cand)
    # indels
    for _ in range(rng.randint(0, 2)):
        if rng.random() < 0.5 and len(cand) > 12:
            i = rng.randrange(2, len(cand) - 8)
            cand = cand[:i] + cand[i + rng.randint(1, 6):]
        else:
            i = rng.randrange(1, len(cand))
            ins = "".join(rng.choice(BASES) for _ in range(rng.randint(1, 6)))
            cand = cand[:i] + ins + cand[i:]
    return ref, cand


def test_doc_example(exe):
    ref = "ATGGCGTGACTGATCCTATCGTCGTT"
    cand = "CTATCGTCTGTAGGTGTCCT"
    line = run_ref(exe, [(ref, cand)])[0]
    ml = align_haplotype_to_ref(ref, cand)
    score = float(line.split("|")[0])
    assert ml.ll == score


def test_random_differential(exe):
    rng = random.Random(99)
    pairs = [make_pair(rng) for _ in range(200)]
    lines = run_ref(exe, pairs)
    for i, ((ref, cand), line) in enumerate(zip(pairs, lines)):
        head, hpos_r, indels_r, snps_r, tail = [p.strip() for p in line.split("|")]
        ml = align_haplotype_to_ref(ref, cand)
        assert float(head) == ml.ll, f"case {i} score"
        hpos_m, indels_m, snps_m = fmt_mine(ml)
        assert hpos_m == hpos_r, f"case {i} hpos\nref={ref}\ncand={cand}"
        assert indels_m == indels_r, f"case {i} indels\nref={ref}\ncand={cand}\nmine={indels_m}\nref={indels_r}"
        assert snps_m == snps_r, f"case {i} snps\nref={ref}\ncand={cand}"
        talign, tfirst, tlast, trel = tail.rsplit(" ", 3)
        assert ml.align == talign, f"case {i} align"
        assert ml.first_base == int(tfirst) and ml.last_base == int(tlast), f"case {i} fb/lb"
        assert ml.rel_pos == int(trel), f"case {i} relPos"


def test_python_fallback_matches_native():
    rng = random.Random(7)
    for _ in range(30):
        ref, cand = make_pair(rng)
        s1, ops1 = gotoh_align(ref, cand)
        s2, ops2 = _gotoh_py(ref, cand, -1, -460, -100, -960)
        assert (s1, ops1) == (s2, ops2)
