"""Differential test of getReads against the COMPILED reference
(DetInDel::getReads, DInDel.cpp:885-1262) over synthetic bam1_t streams:
the sliding buffer across windows, the uint32 fetch-window wrap near the
contig start, mate pairing, the filter cascade, unmapped-mate
realignment, the unstable mapQual std::sort permutation, and the
maxReads cap.  Both sides must produce the identical surviving read
list (qname, pos, mapQual bits, matePos, mateLen, strand, seq) in the
identical order, or the identical error, for every window."""

import subprocess

import numpy as np
import pytest

from conftest import ref_getreads_exe
from dindel_tpu.config import Parameters
from dindel_tpu.engine.reads import ReadBuffer, WindowError, get_reads
from dindel_tpu.io.bam import (BamHeader, BamRecord, BamWriter, FDUP,
                               FMREVERSE, FMUNMAP, FPAIRED, FQCFAIL,
                               FREVERSE, FUNMAP)
from dindel_tpu.io.bam_native import open_bam
from dindel_tpu.model import LibraryCollection


def _rand_seq(rng, n):
    return "".join("ACGT"[c] for c in rng.randint(0, 4, n))


def _gen_records(rng, n_pairs, lo, hi):
    """Position-scattered record set with every cascade-relevant case."""
    recs = []
    for i in range(n_pairs):
        L = int(rng.choice([36, 50, 70]))
        p1 = int(rng.randint(lo, hi))
        isize = int(rng.randint(80, 350))
        p2 = p1 + isize
        mapq = int(rng.choice([0, 13, 30, 60, 60, 60, 60]))
        qname = f"rd{i:05d}"
        kind = int(rng.randint(10))
        s1 = _rand_seq(rng, L)
        s2 = _rand_seq(rng, L)
        q1 = bytes(int(x) for x in rng.randint(10, 40, L))
        q2 = bytes(int(x) for x in rng.randint(10, 40, L))
        cig = f"{L}M"
        if kind == 0:  # FR proper pair
            recs.append((qname, FPAIRED, p1, mapq, 0, p2, cig, s1, q1))
            recs.append((qname, FPAIRED | FREVERSE | FMREVERSE * 0, p2,
                         mapq, 0, p1, cig, s2, q2))
        elif kind == 1:  # mate unmapped, placed at p1
            recs.append((qname, FPAIRED | FMUNMAP, p1, mapq, 0, p1, cig,
                         s1, q1))
            rflag = FPAIRED | FUNMAP | (FREVERSE if rng.randint(2) else 0)
            recs.append((qname, rflag, p1, 0, 0, p1, "*", s2, q2))
        elif kind == 2:  # orphan paired read (mate never materializes)
            recs.append((qname, FPAIRED, p1, mapq, 0, p2 + 100000, cig,
                         s1, q1))
        elif kind == 3:  # single-end read
            recs.append((qname, 0, p1, mapq, 0, -1, cig, s1, q1))
        elif kind == 4:  # duplicate-flagged + qcfail (prefiltered)
            recs.append((qname, FPAIRED | FDUP, p1, mapq, 0, p2, cig,
                         s1, q1))
            recs.append((qname + "q", FQCFAIL, p1, mapq, 0, -1, cig,
                         s1, q1))
        elif kind == 5:  # cross-tid mate
            recs.append((qname, FPAIRED, p1, mapq, 1, p2, cig, s1, q1))
        elif kind == 6:  # deletion CIGAR (end-pos matters for overlap)
            half = L // 2
            recs.append((qname, 0, p1, mapq, 0, -1,
                         f"{half}M5D{L - half}M", s1, q1))
        else:  # normal pair, same-strand quirk candidates
            f2 = FPAIRED | (FREVERSE if rng.randint(2) else 0)
            recs.append((qname, FPAIRED, p1, mapq, 0, p2, cig, s1, q1))
            recs.append((qname, f2, p2, mapq, 0, p1, cig, s2, q2))
    recs.sort(key=lambda r: r[2])
    return recs


def _driver_input(params, recs, windows, map_unmapped):
    lines = [f"CONFIG {params.tid} {params.min_read_overlap} "
             f"{params.max_reads} {params.max_read_length} "
             f"{repr(float(params.map_qual_threshold))} "
             f"{int(map_unmapped)}"]
    for (qname, flag, pos, mapq, mtid, mpos, cig, seq, qual) in recs:
        qs = ",".join(str(b) for b in qual)
        lines.append(f"REC {qname} {flag} {pos} {mapq} {mtid} {mpos} "
                     f"{cig} {seq} {qs}")
    for (l, r) in windows:
        lines.append(f"WINDOW {l} {r}")
    lines.append("RUN")
    return "\n".join(lines) + "\n"


def _parse_driver(out):
    res = []
    cur = []
    for line in out.splitlines():
        if line.startswith("R "):
            t = line.split()
            cur.append((t[1], int(t[2]), float(t[3]), int(t[4]),
                        int(t[5]), int(t[6]), t[7]))
        elif line.startswith("ERR "):
            cur = "ERR " + line[4:]
        elif line == "ENDWINDOW":
            res.append(cur)
            cur = []
    return res


def _write_bam(tmp_path, recs, n=1):
    header = BamHeader(text="@HD\tVN:1.0\tSO:coordinate\n@SQ\tSN:1\tLN:1000000000\n",
                       refs=[("1", 1000000000)])
    path = str(tmp_path / f"synth{n}.bam")
    w = BamWriter(path, header)
    for (qname, flag, pos, mapq, mtid, mpos, cig, seq, qual) in recs:
        cigar = []
        if cig != "*":
            num = ""
            for c in cig:
                if c.isdigit():
                    num += c
                else:
                    cigar.append((c, int(num)))
                    num = ""
        w.write(BamRecord(qname=qname, flag=flag, tid=0, pos=pos,
                          mapq=mapq, cigar=cigar, mtid=mtid, mpos=mpos,
                          isize=0, seq=seq, qual=qual))
    w.close()
    return path


def _ours(bam_path, params, windows, impl):
    bam = open_bam(bam_path)
    libraries = LibraryCollection()
    buf = ReadBuffer()
    buf.reset = True
    buf.old_left_pos = 0
    res = []
    for (l, r) in windows:
        try:
            reads = get_reads([bam], params.tid, l, r, params, libraries,
                              buf, impl=impl)
            buf.reset = False
            cur = []
            for rd in reads:
                rev = 1 if (rd.bam.flag & FREVERSE) else 0
                cur.append((rd.qname, rd.pos, float(rd.map_qual),
                            int(rd.mate_pos), int(rd.mate_len), rev,
                            rd.seq))
            res.append(cur)
        except WindowError as e:
            res.append("ERR " + str(e).replace(" ", "_"))
            buf.reset = True
        buf.old_left_pos = l
    bam.close()
    return res


@pytest.mark.parametrize("seed,map_unmapped", [(1, False), (2, False),
                                               (3, True), (4, True)])
def test_getreads_matches_reference(tmp_path, seed, map_unmapped):
    exe = ref_getreads_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    rng = np.random.RandomState(seed)
    recs = _gen_records(rng, 260, 2300, 9000)
    params = Parameters()
    params.tid = "1"
    params.map_unmapped_reads = map_unmapped
    params.obs_params.map_unmapped_reads = map_unmapped
    # windows: an early (uint32-wrap dead zone) window first, then a
    # sorted overlapping walk so the sliding buffer is exercised
    windows = [(100, 340), (2400, 2640), (2600, 2840), (2605, 2845),
               (4000, 4240), (4100, 4340), (8000, 8240), (8900, 9140)]

    out = subprocess.run([str(exe)],
                         input=_driver_input(params, recs, windows,
                                             map_unmapped),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    ref = _parse_driver(out.stdout)
    assert len(ref) == len(windows)

    bam_path = _write_bam(tmp_path, recs)
    for impl in ("loop", "array", "arena"):
        got = _ours(bam_path, params, windows, impl)
        assert got == ref, impl


def test_getreads_maxreads_cap(tmp_path):
    """Dense pileup: the cap + sort permutation decide WHICH reads
    survive; both sides must agree exactly."""
    exe = ref_getreads_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    rng = np.random.RandomState(7)
    recs = _gen_records(rng, 300, 3000, 3400)
    params = Parameters()
    params.tid = "1"
    params.max_reads = 200
    windows = [(3050, 3290), (3100, 3340)]
    out = subprocess.run([str(exe)],
                         input=_driver_input(params, recs, windows, False),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    ref = _parse_driver(out.stdout)
    bam_path = _write_bam(tmp_path, recs)
    for impl in ("loop", "array", "arena"):
        got = _ours(bam_path, params, windows, impl)
        assert got == ref, impl
