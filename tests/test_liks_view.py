"""LiksView (array-backed liks) must be indistinguishable from the
materialized list-of-lists form: identical MLAlignments, and identical
caller outputs (filter_haplotypes, diploid_glf, pooled VB-EM) whether the
callers consume the view's arrays or gather from the objects."""

import io

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.reads import ReadBuffer, get_reads
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.hmm.batch import BatchedPairHMM, LiksView
from dindel_tpu.infer.diploid import diploid_glf
from dindel_tpu.infer.filterhaps import filter_haplotypes
from dindel_tpu.infer.pooled import estimate_hap_freqs_bayes_em
from dindel_tpu.model import LibraryCollection
from dindel_tpu.out.glf import make_glf_output
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate
from dindel_tpu.variants import read_window_file


@pytest.fixture(scope="module")
def windows(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("liksview")
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1500, var="+TT", genotype=2),
                PlantedVariant(pos=2300, var="-T", genotype=1)]
    cfg = SimConfig(ref_len=3000, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=13)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    params = Parameters()
    eng = WindowEngine([bam], fa, params, LibraryCollection(),
                       hmm_backend="jax")
    buf = ReadBuffer()
    buf.reset = True
    out = []
    index = 0
    for candidates in read_window_file(win_files[0], False):
        index += 1
        params.tid = candidates.tid
        reads = get_reads(eng.bams, params.tid, candidates.left_pos,
                          candidates.right_pos, params, eng.libraries, buf)
        buf.reset = False
        buf.old_left_pos = candidates.left_pos
        skip, haps, lp, rp = eng.get_haplotypes(
            reads, candidates.center_pos, candidates.left_pos,
            candidates.right_pos, candidates)
        if skip or not haps:
            continue
        view = eng._batch_hmm.compute(haps, reads, lp)
        assert isinstance(view, LiksView)
        out.append(dict(index=index, cand_pos=candidates.center_pos,
                        left=lp, right=rp, candidates=candidates,
                        haps=haps, reads=reads, view=view))
    eng.close()
    assert len(out) >= 2
    return params, out


def test_view_arrays_match_materialized(windows):
    """The view's whole-matrix arrays equal the fields of the lazily
    materialized MLAlignments."""
    _params, ws = windows
    for w in ws:
        v = w["view"]
        liks = v.materialize()
        nh, nr = v.nh, v.nr
        for h in range(nh):
            nind_row = v.n_indel_entries_row(h)
            for r in range(nr):
                ml = liks[h][r]
                i = h * nr + r
                assert ml.ll == v.ll[i]
                assert ml.off_hap == bool(v.off_hap[i])
                assert ml.off_hap_hmq == bool(v.off_hap_hmq[i])
                assert ml.first_base == v.fb[i]
                assert ml.last_base == v.lb[i]
                assert ml.n_bqt == v.n_bqt[i]
                assert (ml.num_indels == 0) == (not v.has_event[i])
                assert len(ml.indels) == nind_row[r]


def _run_callers(params, w, liks, pooled):
    buf = io.StringIO()
    glf_data = make_glf_output(buf)
    filtered, var_coverage = filter_haplotypes(
        w["haps"], w["reads"], liks, params, params.filter_haplotypes)
    if pooled:
        estimate_hap_freqs_bayes_em(
            w["haps"], w["reads"], liks, w["cand_pos"], w["left"],
            w["right"], glf_data, w["index"], w["candidates"], params,
            filtered, var_coverage, 1, "singlevariant")
    else:
        diploid_glf(w["haps"], w["reads"], liks, w["cand_pos"], w["left"],
                    w["right"], glf_data, w["index"], w["candidates"],
                    params, filtered, var_coverage, "dip")
    return filtered, var_coverage, buf.getvalue()


@pytest.mark.parametrize("pooled", [False, True])
def test_callers_identical_on_view_and_lists(windows, pooled):
    params, ws = windows
    for w in ws:
        view = w["view"]
        lists = view.materialize()
        fa, va, out_a = _run_callers(params, w, view, pooled)
        fb, vb, out_b = _run_callers(params, w, lists, pooled)
        assert fa == fb
        assert va == vb
        assert out_a == out_b, (out_a, out_b)


def test_filterhaps_view_with_filtering(windows):
    params, ws = windows
    for w in ws:
        view = w["view"]
        lists = view.materialize()
        fa, va = filter_haplotypes(w["haps"], w["reads"], view, params, True)
        fb, vb = filter_haplotypes(w["haps"], w["reads"], lists, params, True)
        assert fa == fb
        assert va == vb


def _rebuild_view(view, monkeypatch, force_py):
    """Re-run LiksView's decode on the same inputs, optionally forcing
    the numpy implementation (DINDEL_DECODE=py)."""
    pk = dict(H_pad=view.H_pad, L_pad=view.L_pad, read_len=view.read_len,
              hap_len=view._hap_len, read_codes=view._pk_read_codes,
              hap_codes=view._pk_hap_codes)
    if force_py:
        monkeypatch.setenv("DINDEL_DECODE", "py")
    else:
        monkeypatch.delenv("DINDEL_DECODE", raising=False)
    return LiksView(view.haps, view.reads, pk, view.ll, view.off_hap,
                    view.off_hap_hmq, view.ll_off, view.ll_on, view._ms,
                    view.p)


def test_native_decode_matches_numpy(windows, monkeypatch):
    """native/decode.cpp must reproduce the numpy decode exactly,
    including bit-identical m_log_bq accumulation."""
    from dindel_tpu.hmm.decode_native import native_lib
    if native_lib() is None:
        pytest.skip("native decode unavailable")
    _params, ws = windows
    for w in ws:
        a = _rebuild_view(w["view"], monkeypatch, force_py=False)
        b = _rebuild_view(w["view"], monkeypatch, force_py=True)
        assert (a.xs == b.xs).all()
        assert (a.hpos_all == b.hpos_all).all()
        assert (a.fb == b.fb).all() and (a.lb == b.lb).all()
        assert (a.n_bqt == b.n_bqt).all()
        assert (a.n_mm_bqt == b.n_mm_bqt).all()
        assert (a.n_mm_left == b.n_mm_left).all()
        assert (a.n_mm_right == b.n_mm_right).all()
        assert (a.num_mm == b.num_mm).all()
        assert (a.has_event == b.has_event).all()
        assert (a.any_mism == b.any_mism).all()
        # bit-identical float accumulation (same add order)
        assert (a.m_log_bq == b.m_log_bq).all()
        # lazily-derived matrices agree too
        assert (a.mism == b.mism).all()
        assert (a.del_ev == b.del_ev).all()
