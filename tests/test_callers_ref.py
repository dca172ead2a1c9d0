"""Differential tests for the Bayesian callers against the compiled
reference: DetInDel::diploidGLF (DInDel.cpp:2933-3662),
estimateHaplotypeFrequenciesBayesEM (DInDel.cpp:2103-2930) and
filterHaplotypes (DInDel.cpp:1929-2101).

Both sides are pure functions of (haps, reads, liks, candidates, params):
realistic inputs are produced by running our engine (float64 oracle HMM) on
simulated BAMs, serialized into native/refshim/callers_driver.cpp (the
unmodified reference DInDel.cpp), and the emitted GLF rows must match the
reference's TEXT byte-for-byte — values, column order and ostream
formatting included.  The only stubbed numeric is digamma, which both sides
evaluate with the identical series (refshim boost/math stub ==
infer/pooled.digamma)."""

import io
import subprocess

import pytest

from conftest import ref_callers_exe
from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.reads import ReadBuffer, get_reads
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.infer.diploid import diploid_glf
from dindel_tpu.infer.filterhaps import filter_haplotypes
from dindel_tpu.infer.pooled import estimate_hap_freqs_bayes_em
from dindel_tpu.model import LibraryCollection
from dindel_tpu.out.glf import make_glf_output
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate
from dindel_tpu.variants import read_window_file


def _f(x):
    """repr of a true Python float — numpy scalars repr as np.float64(...)
    which the driver's istream cannot parse."""
    return repr(float(x))


def _ser_av(tag, pos, av):
    return (f"{tag} {pos} {av.str} {int(av.start_hap)} {int(av.end_hap)} "
            f"{int(av.start_read)} {int(av.end_read)} {int(av.left_flank_hap)} "
            f"{int(av.right_flank_hap)} {int(av.left_flank_read)} "
            f"{int(av.right_flank_read)}")


def _serialize_window(params, index, cand_pos, left, right, candidates,
                      haps, reads, liks, n_bams, program, analysis):
    p = params
    lines = [f"WINDOW {p.tid} {index} {cand_pos} {left} {right} "
             f"{int(p.filter_haplotypes)} {_f(p.prior_indel)} "
             f"{_f(p.prior_snp)} {_f(p.bayes_a0)} {p.obs_params.pad_cover} "
             f"{p.obs_params.max_mismatch} {n_bams} {program} {analysis}"]
    for v in candidates.variants:
        lines.append(f"CAND {int(v.start_hap)} {_f(v.freq)} "
                     f"{int(v.add_comb)} {v.str}")
    for h in haps:
        lines.append(f"HAP {h.seq}")
        for pos, av in h.indels.items():
            lines.append(_ser_av("HI", pos, av))
        for pos, av in h.snps.items():
            lines.append(_ser_av("HS", pos, av))
    for r in reads:
        flag = ((4 if r.is_unmapped else 0) | (16 if r.on_reverse_strand else 0)
                | (32 if r.mate_is_reverse else 0))
        lines.append(f"READ {_f(r.map_qual)} {flag} {int(r.pool_id)} "
                     f"{int(r.pos)} {int(r.mate_pos)} {r.seq}")
    for hi in range(len(haps)):
        for ri in range(len(reads)):
            ml = liks[hi][ri]
            lines.append(
                f"LIK {hi} {ri} {_f(ml.ll)} {int(ml.off_hap)} "
                f"{int(ml.off_hap_hmq)} {int(ml.num_indels)} {int(ml.n_bqt)} "
                f"{int(ml.n_mm_bqt)} {_f(ml.m_log_bq)} {int(ml.n_mm_left)} "
                f"{int(ml.n_mm_right)} {int(ml.num_mismatch)}")
            lines.append(f"HPOS {hi} {ri} "
                         + " ".join(str(int(v)) for v in ml.hpos))
            for pos, av in ml.indels.items():
                lines.append(_ser_av(f"LIND {hi} {ri}", pos, av))
            for pos, av in ml.snps.items():
                lines.append(_ser_av(f"LSNP {hi} {ri}", pos, av))
            for pos, cov in ml.hap_indel_covered.items():
                lines.append(f"LCOVI {hi} {ri} {pos} {int(cov)}")
            for pos, cov in ml.hap_snp_covered.items():
                lines.append(f"LCOVS {hi} {ri} {pos} {int(cov)}")
    lines.append("RUN")
    return "\n".join(lines) + "\n"


def _collect_windows(tmp_path, variants, cfg, seed, params, n_bams=1):
    """Run our engine through hapgen + float64 oracle liks on a simulated
    BAM; return the caller inputs per window."""
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=seed)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    eng = WindowEngine([bam], fa, params, LibraryCollection(),
                       hmm_backend="oracle")
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
        liks, _on = eng.compute_likelihoods(haps, reads, lp)
        for r in reads:
            r.pool_id = r.pool_id % n_bams
        out.append(dict(index=index, cand_pos=candidates.center_pos,
                        left=lp, right=rp, candidates=candidates,
                        haps=haps, reads=reads, liks=liks))
    eng.close()
    return out


def _run_python(params, windows, n_bams, program, analysis):
    buf = io.StringIO()
    glf_data = make_glf_output(buf)
    for w in windows:
        filtered, var_coverage = filter_haplotypes(
            w["haps"], w["reads"], w["liks"], params, params.filter_haplotypes)
        if analysis in ("pooled", "both"):
            estimate_hap_freqs_bayes_em(
                w["haps"], w["reads"], w["liks"], w["cand_pos"], w["left"],
                w["right"], glf_data, w["index"], w["candidates"], params,
                filtered, var_coverage, n_bams, program)
        if analysis in ("dip", "both"):
            filtered, var_coverage = filter_haplotypes(
                w["haps"], w["reads"], w["liks"], params,
                params.filter_haplotypes)
            diploid_glf(w["haps"], w["reads"], w["liks"], w["cand_pos"],
                        w["left"], w["right"], glf_data, w["index"],
                        w["candidates"], params, filtered, var_coverage,
                        "dip")
    return buf.getvalue().splitlines()


def _run_reference(exe, params, windows, n_bams, program, analysis, tmp_path):
    glf_path = str(tmp_path / "ref_glf.txt")
    inp = "".join(
        _serialize_window(params, w["index"], w["cand_pos"], w["left"],
                          w["right"], w["candidates"], w["haps"], w["reads"],
                          w["liks"], n_bams, program, analysis)
        for w in windows)
    res = subprocess.run([str(exe), glf_path], input=inp, capture_output=True,
                         text=True, timeout=600)
    n_done = res.stdout.count("ENDWINDOW")
    assert n_done == len(windows), (
        f"driver finished {n_done}/{len(windows)} windows; "
        f"stdout tail: {res.stdout[-1500:]}\nstderr: {res.stderr[-1500:]}")
    assert "ERR " not in res.stdout, res.stdout[-2000:]
    return open(glf_path).read().splitlines()


def _assert_rows_equal(ref_rows, py_rows, what):
    assert len(py_rows) == len(ref_rows), (
        what + f": {len(py_rows)} vs {len(ref_rows)} rows\n"
        f"py: {py_rows[:4]}\nref: {ref_rows[:4]}")
    for i, (pr, rr) in enumerate(zip(py_rows, ref_rows)):
        assert pr == rr, (what + f" row {i}:\npy : {pr}\nref: {rr}")


@pytest.fixture(scope="module")
def caller_inputs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("callers")
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1500, var="+TT", genotype=2),
                PlantedVariant(pos=2300, var="-T", genotype=1),
                PlantedVariant(pos=3100, var="+GATA", genotype=1)]
    cfg = SimConfig(ref_len=3900, coverage=20, read_len=75)
    params = Parameters()
    windows = _collect_windows(tmp_path, variants, cfg, 29, params, n_bams=2)
    assert len(windows) >= 3
    return params, windows


def test_diploid_glf_matches_reference(caller_inputs, tmp_path):
    exe = ref_callers_exe()
    if exe is None:
        pytest.skip("reference sources unavailable")
    params, windows = caller_inputs
    ref_rows = _run_reference(exe, params, windows, 1, "singlevariant",
                              "dip", tmp_path)
    py_rows = _run_python(params, windows, 1, "singlevariant", "dip")
    assert any("dip.map" in r for r in ref_rows)
    assert any(" dip " in r for r in ref_rows)
    _assert_rows_equal(ref_rows, py_rows, "diploid")


@pytest.mark.parametrize("program", ["singlevariant", "all", "priorpersite"])
def test_pooled_bayes_em_matches_reference(caller_inputs, tmp_path, program):
    exe = ref_callers_exe()
    if exe is None:
        pytest.skip("reference sources unavailable")
    params, windows = caller_inputs
    ref_rows = _run_reference(exe, params, windows, 2, program, "pooled",
                              tmp_path)
    py_rows = _run_python(params, windows, 2, program, "pooled")
    assert ref_rows, "pooled caller emitted no GLF rows"
    _assert_rows_equal(ref_rows, py_rows, f"pooled[{program}]")


def test_callers_with_filter_haplotypes(caller_inputs, tmp_path):
    """Same differential check with --filterHaplotypes on (exercises the
    doFilter branch of filterHaplotypes end-to-end)."""
    exe = ref_callers_exe()
    if exe is None:
        pytest.skip("reference sources unavailable")
    params, windows = caller_inputs
    import copy
    params = copy.deepcopy(params)
    params.filter_haplotypes = True
    ref_rows = _run_reference(exe, params, windows, 1, "singlevariant",
                              "both", tmp_path)
    py_rows = _run_python(params, windows, 1, "singlevariant", "both")
    _assert_rows_equal(ref_rows, py_rows, "filtered-both")
