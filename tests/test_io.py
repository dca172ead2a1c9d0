"""IO layer tests: FASTA/fai, BGZF round-trip, BAM write/read/fetch."""

import random

import pytest

from dindel_tpu.io.bgzf import BgzfReader, BgzfWriter
from dindel_tpu.io.fasta import FastaFile, write_fasta
from dindel_tpu.io.bam import BamHeader, BamRecord, BamReader, BamWriter
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def test_fasta_roundtrip(tmp_path):
    seq = "ACGTACGTNNACGTTTTTGGGCA" * 13
    p = str(tmp_path / "ref.fa")
    write_fasta(p, {"chr1": seq, "chr2": "TTTTAACC"}, width=10)
    fa = FastaFile(p)
    assert fa.get_sequence("chr1", 1, len(seq)) == seq
    assert fa.get_sequence("chr1", 5, 14) == seq[4:14]
    assert fa.get_sequence("chr2", 1, 8) == "TTTTAACC"
    # clamping like fai_fetch
    assert fa.get_sequence("chr1", 1, 10**9) == seq
    fa.close()


def test_bgzf_roundtrip(tmp_path):
    rng = random.Random(0)
    data = bytes(rng.randrange(256) for _ in range(300_000))
    p = str(tmp_path / "x.bgzf")
    w = BgzfWriter.open(p)
    for i in range(0, len(data), 7777):
        w.write(data[i:i + 7777])
    w.close()
    r = BgzfReader.open(p)
    assert r.read(len(data) + 100) == data
    r.close()


def test_bam_roundtrip_and_fetch(tmp_path):
    header = BamHeader(text="@SQ\tSN:1\tLN:10000\n@RG\tID:rg1\tLB:lib1\n",
                       refs=[("1", 10000)])
    rng = random.Random(1)
    recs = []
    for i in range(500):
        pos = rng.randrange(0, 9900)
        seq = "".join(rng.choice("ACGT") for _ in range(50))
        recs.append(BamRecord(qname=f"q{i}", flag=0, tid=0, pos=pos, mapq=40,
                              cigar=[("M", 50)], seq=seq,
                              qual=bytes([30] * 50), tags=[("RG", "Z", "rg1")]))
    recs.sort(key=lambda r: r.pos)
    p = str(tmp_path / "t.bam")
    w = BamWriter(p, header)
    for r in recs:
        w.write(r)
    w.close()

    rd = BamReader(p)
    assert rd.header.refs == [("1", 10000)]
    assert rd.header.rg_to_library() == {"rg1": "lib1"}
    got = list(rd)
    assert len(got) == 500
    assert [g.qname for g in got] == [r.qname for r in recs]
    assert got[0].seq == recs[0].seq
    assert got[0].cigar == [("M", 50)]

    # region fetch matches brute force
    for (beg, end) in [(0, 100), (5000, 5100), (9000, 10000), (1234, 1235)]:
        expect = [r.qname for r in recs if r.pos < end and r.end_pos() > beg]
        got_q = [r.qname for r in rd.fetch(0, beg, end)]
        assert got_q == expect, (beg, end)
    rd.close()


def test_simulate_sane(tmp_path):
    cfg = SimConfig(ref_len=2000, coverage=20)
    fa, bam = simulate(str(tmp_path / "sim"),
                       [PlantedVariant(pos=1000, var="-ACG", genotype=1)],
                       cfg, seed=3)
    rd = BamReader(bam)
    n = 0
    with_del = 0
    P = cfg.start_pad
    for r in rd.fetch(0, 950 + P, 1050 + P):
        n += 1
        if any(op == "D" for op, _ in r.cigar):
            with_del += 1
    assert n > 10
    assert with_del > 2
    fa_f = FastaFile(fa)
    assert len(fa_f.get_sequence("1", 1, 2000)) == 2000
