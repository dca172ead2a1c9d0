"""The vectorized get_reads filter cascade must select exactly the same
reads — same order, same mutated fields — as the read-at-a-time loop port
of DetInDel::getReads (DInDel.cpp:885-1262)."""

import jax
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.reads import ReadBuffer, WindowError, get_reads
from dindel_tpu.io.bam_native import open_bam
from dindel_tpu.model import LibraryCollection
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate
from dindel_tpu.variants import read_window_file


def _read_sig(r):
    return (r.qname, r.pos, r.seq, r.map_qual, r.mate_pos, r.mate_len,
            r.is_unmapped, r.on_reverse_strand, r.pool_id,
            tuple(r.qual[:3]))


def _run(bam, fa, win_file, params, libraries, impl):
    bams = [open_bam(bam)]
    buf = ReadBuffer()
    buf.reset = True
    out = []
    for candidates in read_window_file(win_file, False):
        params.tid = candidates.tid
        try:
            reads = get_reads(bams, params.tid, candidates.left_pos,
                              candidates.right_pos, params, libraries, buf,
                              impl=impl)
            out.append([_read_sig(r) for r in reads])
            buf.reset = False
        except WindowError as e:
            out.append(str(e))
            buf.reset = True
        buf.old_left_pos = candidates.left_pos
    for b in bams:
        b.close()
    return out


@pytest.mark.parametrize("unmapped_frac,map_unmapped", [
    (0.0, False), (0.5, True), (0.5, False)])
def test_cascade_array_equals_loop(tmp_path, unmapped_frac, map_unmapped):
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1100, var="+TT", genotype=2),
                PlantedVariant(pos=1500, var="-T", genotype=1)]
    # overlapping windows so the sliding buffer trim/extend paths engage
    cfg = SimConfig(ref_len=2200, coverage=25, read_len=70,
                    insert_mean=160, insert_sd=20,
                    unmapped_frac=unmapped_frac)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=7)
    var_file, lib_file = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    params = Parameters()
    libraries = LibraryCollection()
    if map_unmapped:
        params.map_unmapped_reads = True
        params.obs_params.map_unmapped_reads = True
        libraries.add_from_file(lib_file)

    a = _run(bam, fa, win_files[0], params, libraries, "loop")
    b = _run(bam, fa, win_files[0], params, libraries, "array")
    c = _run(bam, fa, win_files[0], params, libraries, "arena")
    assert len(a) == len(b) and len(a) >= 2
    for wa, wb, wc in zip(a, b, c):
        assert wa == wb
        assert wa == wc


def test_cascade_array_equals_loop_low_maxreads(tmp_path):
    """maxReads cap + mapQual cutoff ordering."""
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1)]
    cfg = SimConfig(ref_len=1400, coverage=40, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=3)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    for max_reads in (20, 60):
        params = Parameters()
        params.max_reads = max_reads
        libraries = LibraryCollection()
        a = _run(bam, fa, win_files[0], params, libraries, "loop")
        b = _run(bam, fa, win_files[0], params, libraries, "array")
        c = _run(bam, fa, win_files[0], params, libraries, "arena")
        assert a == b
        assert a == c
