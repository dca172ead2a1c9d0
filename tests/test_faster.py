"""Differential tests: sparse pair-HMM (hmm/faster.py, the --faster
path) vs the reference C++ ObservationModelS compiled from source
(Faster.cpp via native/refshim/faster_driver.cpp)."""

import random
import subprocess

import numpy as np
import pytest

from conftest import ref_faster_exe
from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.hmm.faster import (HapHash, SparsePairHMM,
                                   compute_likelihoods_faster)
from dindel_tpu.model import Haplotype, Read

EXE = ref_faster_exe()

pytestmark = pytest.mark.skipif(EXE is None,
                                reason="reference Faster.cpp unavailable")


def run_ref(cases):
    lines = []
    for (hap, read, map_qual, pos_stat_first, hap_start, p) in cases:
        quals = ",".join(f"{q:.17g}" for q in read.qual)
        lines.append(
            f"{hap.seq} {read.seq} {map_qual:.17g} {pos_stat_first} "
            f"{hap_start} {p.p_error:.17g} {p.p_mut:.17g} "
            f"{p.max_length_indel} {p.cap_map_qual_fast:.17g} {quals}")
    out = subprocess.run([str(EXE)], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    res = []
    for line in out.stdout.strip().split("\n"):
        head, hpos, indels, snps = line.split("|")
        f = head.split()
        res.append(dict(
            ll=float(f[0]), off_hap=bool(int(f[1])),
            off_hap_hmq=bool(int(f[2])), first_base=int(f[3]),
            last_base=int(f[4]),
            hpos=[int(x) for x in hpos.split()],
            indels=sorted(indels.split()),
            snps=sorted(snps.split())))
    return res


def make_cases(n, seed):
    rng = random.Random(seed)
    p = ObservationModelParameters()
    cases = []
    for _ in range(n):
        H = rng.randrange(60, 180)
        hap = "".join(rng.choice("ACGT") for _ in range(H))
        L = rng.randrange(25, min(90, H - 5))
        start = rng.randrange(0, H - L)
        read = list(hap[start:start + L])
        # perturb: mismatches and occasionally a small indel
        for _ in range(rng.randrange(0, 4)):
            i = rng.randrange(L)
            read[i] = rng.choice("ACGT")
        if rng.random() < 0.4:
            i = rng.randrange(1, L - 6)
            ln = rng.randrange(1, 5)
            if rng.random() < 0.5:
                del read[i:i + ln]
            else:
                for c in "ACGT"[:ln]:
                    read.insert(i, rng.choice("ACGT"))
        read = "".join(read)
        if len(read) < 25:
            continue
        qual = [rng.choice([0.99, 0.995, 0.999, 0.9999])
                for _ in range(len(read))]
        map_qual = rng.choice([0.9, 0.99, 0.999, 1.0 - 1e-16])
        # posStat.first ~ true mapped position (hap coords are 0-based at
        # hap_start)
        hap_start = rng.randrange(0, 30)
        pos_stat_first = hap_start + start + rng.randrange(-3, 4)
        r = Read(seq=read, qual=np.asarray(qual), map_qual=map_qual,
                 pos_stat_first=float(pos_stat_first))
        cases.append((Haplotype(seq=hap), r, map_qual, pos_stat_first,
                      hap_start, p))
    return cases


def _ours(case):
    hap, read, _mq, _psf, hap_start, p = case
    om = SparsePairHMM(hap, read, hap_start, p)
    ml = om.align(HapHash(4, hap))
    return ml


def test_differential_random_cases():
    cases = make_cases(60, seed=42)
    ref = run_ref(cases)
    for case, want in zip(cases, ref):
        ml = _ours(case)
        assert ml.ll == pytest.approx(want["ll"], rel=1e-12, abs=1e-12)
        assert ml.off_hap == want["off_hap"]
        assert ml.off_hap_hmq == want["off_hap_hmq"]
        assert ml.first_base == want["first_base"]
        assert ml.last_base == want["last_base"]
        assert ml.hpos == want["hpos"]
        got_indels = sorted(f"{pos}:{av.str}"
                            for pos, av in ml.indels.items())
        got_snps = sorted(f"{pos}:{av.str}"
                          for pos, av in ml.snps.items())
        assert got_indels == want["indels"]
        assert got_snps == want["snps"]


def test_driver_loop_on_hap():
    """computeLikelihoodsFaster marks every read on-hap (the reference's
    offHapHMQ tautology, Faster.cpp:528-536)."""
    cases = make_cases(6, seed=7)
    haps = [c[0] for c in cases[:2]]
    reads = [c[1] for c in cases]
    p = cases[0][5]
    liks, on_hap = compute_likelihoods_faster(haps, reads, 10, p)
    assert len(liks) == 2 and len(liks[0]) == len(reads)
    assert on_hap == [1] * len(reads)


def test_faster_end_to_end_diploid(tmp_path):
    """--faster pipeline slice: simulate a het deletion, call with the
    sparse HMM (params.slower=False), assert the VCF genotype."""
    from dindel_tpu.config import Parameters
    from dindel_tpu.engine.candidates import get_candidates
    from dindel_tpu.engine.window import WindowEngine
    from dindel_tpu.pipeline.windows import make_windows
    from dindel_tpu.pipeline.merge_diploid import merge_output_diploid
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1)]
    cfg = SimConfig(ref_len=1400, coverage=25, read_len=75)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=11)
    var_file, _lib = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    params = Parameters()
    params.do_diploid = True
    params.slower = False          # --faster
    params.file_name = str(tmp_path / "out")
    eng = WindowEngine([bam], fa, params, hmm_backend="oracle")
    glf_path = str(tmp_path / "out.glf.txt")
    rows = eng.detect_indels(win_files[0], glf_path)
    eng.close()
    assert rows
    vcf = str(tmp_path / "calls.vcf")
    merge_output_diploid([glf_path], vcf, fa, sample_id="S")
    recs = [l.split("\t") for l in open(vcf) if not l.startswith("#")]
    # planted -ACG at 700 left-aligns into the GGG run at 696
    hits = [r for r in recs
            if abs(int(r[1]) - 3132) <= 6 and len(r[3]) - len(r[4]) == 3]
    assert hits, open(vcf).read()
    assert hits[0][9].split(":")[0] in ("0/1", "1/0")
