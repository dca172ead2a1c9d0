"""Differential test: native C++ BAM reader (native/bamio.cpp) vs the
pure-Python reader (io/bam.py) — identical records for whole-file
iteration and indexed region fetch on a simulated BAM."""

import random

import pytest

from dindel_tpu.io.bam import BamReader
from dindel_tpu.io.bam_native import NativeBamReader, native_lib
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

pytestmark = pytest.mark.skipif(native_lib() is None,
                                reason="native bamio unavailable")


@pytest.fixture(scope="module")
def bam_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("bamnative")
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1400, var="+TT", genotype=1)]
    cfg = SimConfig(ref_len=2100, coverage=25, read_len=75)
    _fa, bam = simulate(str(d / "sim"), variants, cfg, seed=11)
    return bam


def _assert_same(a, b):
    assert a.qname == b.qname
    assert a.flag == b.flag
    assert a.tid == b.tid
    assert a.pos == b.pos
    assert a.mapq == b.mapq
    assert a.cigar == b.cigar
    assert a.mtid == b.mtid
    assert a.mpos == b.mpos
    assert a.isize == b.isize
    assert a.seq == b.seq
    assert a.qual == b.qual
    assert a.all_tags() == b.all_tags()
    assert a.end_pos() == b.end_pos()


def test_header_identical(bam_path):
    py = BamReader(bam_path)
    nat = NativeBamReader(bam_path)
    assert nat.header.text == py.header.text
    assert nat.header.refs == py.header.refs
    py.close()
    nat.close()


def test_iteration_identical(bam_path):
    py = BamReader(bam_path)
    nat = NativeBamReader(bam_path)
    py_recs = list(py)
    nat_recs = list(nat)
    assert len(nat_recs) == len(py_recs) > 0
    for a, b in zip(nat_recs, py_recs):
        _assert_same(a, b)
    py.close()
    nat.close()


def test_fetch_identical(bam_path):
    py = BamReader(bam_path)
    nat = NativeBamReader(bam_path)
    ref_len = py.header.refs[0][1]
    rng = random.Random(5)
    regions = [(0, 0, 200), (0, ref_len - 200, ref_len),
               (0, 0, ref_len)]
    regions += [(0, b, b + rng.randrange(50, 400))
                for b in (rng.randrange(0, max(1, ref_len - 400))
                          for _ in range(10))]
    for tid, beg, end in regions:
        py_recs = list(py.fetch(tid, beg, end))
        nat_recs = list(nat.fetch(tid, beg, end))
        assert len(nat_recs) == len(py_recs), (tid, beg, end)
        for a, b in zip(nat_recs, py_recs):
            _assert_same(a, b)
    py.close()
    nat.close()


def test_fetch_no_index_fallback(bam_path, tmp_path):
    import shutil
    noidx = tmp_path / "noidx.bam"
    shutil.copy(bam_path, noidx)
    py = BamReader(bam_path)
    ref_len = py.header.refs[0][1]
    py_recs = list(py.fetch(0, 100, 700))
    nat = NativeBamReader(str(noidx))
    nat_recs = list(nat.fetch(0, 100, 700))
    assert len(nat_recs) == len(py_recs)
    for a, b in zip(nat_recs, py_recs):
        _assert_same(a, b)
    py.close()
    nat.close()
