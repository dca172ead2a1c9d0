"""Composed whole-window differential vs the COMPILED reference.

Runs the reference's own DetInDel::detectIndels (DInDel.cpp:1265-1417)
end-to-end — getReads -> getHaplotypes -> computeLikelihoods ->
diploidGLF / estimateHaplotypeFrequenciesBayesEM -> GLF — over synthetic
bam1_t streams (native/refshim/window_driver.cpp) and asserts OUR
WindowEngine produces the BYTE-IDENTICAL .glf.txt on the same BAM,
window file, and parameters: every field of every row, including
error-path rows (DInDel.cpp:1391-1402) and the float formatting.

This pins the L5 glue (hap-set assembly order/dedup DInDel.cpp:1600-1616,
empiricalDistributionMethod sequencing :380-640, GLF field population
:3618-3655) to the reference, not to self-generated goldens."""

import os
import subprocess

import pytest

from conftest import ref_window_exe
from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.io.bam import BamReader
from dindel_tpu.io.fasta import FastaFile
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def serialize_bam_recs(bam_path, file_ordinal=0):
    lines = []
    for r in BamReader(bam_path):
        cig = "".join(f"{ln}{op}" for op, ln in r.cigar) if r.cigar else "*"
        qs = ",".join(str(b) for b in r.qual)
        lines.append(f"REC {file_ordinal} {r.qname} {r.flag} {r.pos} "
                     f"{r.mapq} {r.mtid} {r.mpos} {cig} {r.seq} {qs}")
    return lines


def set_lines(params):
    """Our Parameters -> reference CLI-name SET lines
    (getParameters, DInDel.cpp:3908-3977)."""
    p = params
    o = p.obs_params
    f = repr
    return [
        f"SET maxHap {p.max_hap}",
        f"SET maxRead {p.max_reads}",
        f"SET width {p.width}",
        f"SET mapQualThreshold {f(float(p.map_qual_threshold))}",
        f"SET skipMaxHap {p.skip_max_hap}",
        f"SET minReadOverlap {p.min_read_overlap}",
        f"SET maxReadLength {p.max_read_length}",
        f"SET maxHapReadProd {p.max_hap_read_prod}",
        f"SET priorSNP {f(float(p.prior_snp))}",
        f"SET priorIndel {f(float(p.prior_indel))}",
        f"SET bayesa0 {f(float(p.bayes_a0))}",
        f"SET bayesType {p.bayes_type}",
        f"SET pError {f(float(o.p_error))}",
        f"SET pMut {f(float(o.p_mut))}",
        f"SET maxLengthIndel {o.max_length_indel}",
        f"SET capMapQualThreshold {f(float(o.map_qual_threshold))}",
        f"SET capMapQualFast {f(float(o.cap_map_qual_fast))}",
        f"SET flankRefSeq {o.pad_cover}",
        f"SET flankMaxMismatch {o.max_mismatch}",
        f"SET checkAllCIGARs {p.check_all_cigars}",
        f"SET EMtol {f(float(p.em_tol))}",
        f"SET noIndelWindow {p.no_indel_window}",
        f"SET varFileIsOneBased {int(p.var_file_is_one_based)}",
        f"SET doDiploid {int(p.do_diploid)}",
        f"SET doPooled {int(p.estimate_hap_freqs)}",
        f"SET faster {int(not p.slower)}",
        f"SET filterHaplotypes {int(p.filter_haplotypes)}",
        f"SET mapUnmapped {int(p.map_unmapped_reads)}",
        f"SET changeINStoN {int(p.change_ins_to_n)}",
    ]


def run_reference_window(exe, params, fasta_pairs, rec_lines, var_lines,
                         nbams=1, extra_lines=()):
    lines = set_lines(params) + list(extra_lines)
    for tid, seq in fasta_pairs:
        lines.append(f"FASTA {tid} {seq}")
    if nbams != 1:
        lines.append(f"NBAMS {nbams}")
    lines += rec_lines
    lines += [f"VAR {v}" for v in var_lines]
    lines.append("RUN")
    out = subprocess.run([str(exe)], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-500:])
    return [l[2:] for l in out.stdout.splitlines() if l.startswith("G ")]


def _sim_window_inputs(tmp_path, seed, variants=None, cfg=None):
    if variants is None:
        variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                    PlantedVariant(pos=1400, var="+TT", genotype=2)]
    if cfg is None:
        cfg = SimConfig(ref_len=2300, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=seed)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    var_lines = []
    for wf in win_files:
        var_lines += [l.rstrip("\n") for l in open(wf) if l.strip()]
    ff = FastaFile(fa)
    tid0 = ff.order[0]
    seq = ff.get_sequence(tid0, 1, ff.index[tid0][0])
    ff.close()
    return fa, bam, var_lines, tid0, seq


def _run_ours(tmp_path, bams, fa, params, var_lines):
    allv = str(tmp_path / "allwin.txt")
    with open(allv, "w") as f:
        f.write("\n".join(var_lines) + "\n")
    eng = WindowEngine(bams, fa, params, hmm_backend="oracle")
    glf_path = str(tmp_path / "ours.glf.txt")
    eng.detect_indels(allv, glf_path)
    eng.close()
    return [l.rstrip("\n") for l in open(glf_path)]


def _assert_identical(ref_glf, ours):
    assert len(ref_glf) == len(ours), (len(ref_glf), len(ours),
                                       ref_glf[:3], ours[:3])
    for i, (a, b) in enumerate(zip(ref_glf, ours)):
        assert a == b, f"line {i}:\nref : {a}\nours: {b}"


@pytest.mark.parametrize("seed", [7, 23, 101, 202])
def test_window_diploid_identical(tmp_path, seed):
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    fa, bam, var_lines, tid0, seq = _sim_window_inputs(tmp_path, seed)
    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)
    ours = _run_ours(tmp_path, [bam], fa, params, var_lines)
    assert any("dip" in l for l in ours)
    _assert_identical(ref_glf, ours)


@pytest.mark.parametrize("program", ["singlevariant", "all", "priorpersite"])
def test_window_pooled_identical(tmp_path, program):
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    fa, bam, var_lines, tid0, seq = _sim_window_inputs(tmp_path, 13)
    params = Parameters()
    params.estimate_hap_freqs = True
    params.bayes_type = program
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)
    ours = _run_ours(tmp_path, [bam], fa, params, var_lines)
    assert any(program in l for l in ours)
    _assert_identical(ref_glf, ours)


def test_window_error_paths_identical(tmp_path):
    """Error-path rows (DInDel.cpp:1391-1402): a window in the uint32
    fetch dead zone near the contig start (too_few_reads) followed by
    normal windows, all byte-equal including the msg column."""
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    fa, bam, var_lines, tid0, seq = _sim_window_inputs(tmp_path, 5)
    # prepend a dead-zone window (leftPos < old windows, so it must sort
    # first; detectIndels exits on unsorted input)
    var_lines = [f"{tid0} 100 220 160,-A"] + var_lines
    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)
    ours = _run_ours(tmp_path, [bam], fa, params, var_lines)
    assert any("error_" in l for l in ours)
    _assert_identical(ref_glf, ours)


def test_window_filterhaps_faster_identical(tmp_path):
    """--filterHaplotypes + --faster composed path."""
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    fa, bam, var_lines, tid0, seq = _sim_window_inputs(tmp_path, 31)
    params = Parameters()
    params.do_diploid = True
    params.slower = False
    params.filter_haplotypes = True
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)
    ours = _run_ours(tmp_path, [bam], fa, params, var_lines)
    _assert_identical(ref_glf, ours)


def test_window_libfile_mapunmapped_identical(tmp_path):
    """--libFile + --mapUnmapped composed path: the insert-size library
    changes the fetch-window maxDev (DInDel.cpp:907) and drives
    unmapped-mate realignment; both sides load the same histogram file
    (DInDel.cpp:4268-4273 / model.LibraryCollection.add_from_file)."""
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=2),
                PlantedVariant(pos=1500, var="+TA", genotype=1)]
    cfg = SimConfig(ref_len=2400, coverage=18, read_len=70,
                    unmapped_frac=0.2)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=29)
    var_file, lib_file = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    var_lines = []
    for wf in win_files:
        var_lines += [l.rstrip("\n") for l in open(wf) if l.strip()]
    ff = FastaFile(fa)
    tid0 = ff.order[0]
    seq = ff.get_sequence(tid0, 1, ff.index[tid0][0])
    ff.close()

    params = Parameters()
    params.do_diploid = True
    params.map_unmapped_reads = True
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(
        exe, params, [(tid0, seq)], serialize_bam_recs(bam), var_lines,
        extra_lines=[f"LIBFILE {lib_file}", "LIBNAME lib1"])

    from dindel_tpu.model import LibraryCollection
    lc = LibraryCollection()
    lc.add_from_file(lib_file)
    assert "lib1" in lc
    allv = str(tmp_path / "allwin.txt")
    with open(allv, "w") as f:
        f.write("\n".join(var_lines) + "\n")
    eng = WindowEngine([bam], fa, params, libraries=lc,
                       hmm_backend="oracle")
    glf_path = str(tmp_path / "ours.glf.txt")
    eng.detect_indels(allv, glf_path)
    eng.close()
    ours = [l.rstrip("\n") for l in open(glf_path)]
    _assert_identical(ref_glf, ours)


@pytest.mark.parametrize("knob", ["changeINStoN", "checkAllCIGARs0",
                                  "smallcaps", "prodcap"])
def test_window_quirk_knobs_identical(tmp_path, knob):
    """Composed byte-equality under the quirk knobs: --changeINStoN
    (inserted bases become N in haplotypes), --checkAllCIGARs 0,
    small maxHap/skipMaxHap (the too-many-haplotypes skip path,
    DInDel.cpp:1569-1572), and a tiny maxHapReadProd (the
    skipped_numhap_times_numread error row, DInDel.cpp:395-399)."""
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    variants = [PlantedVariant(pos=700, var="+GATC", genotype=1),
                PlantedVariant(pos=1400, var="-AA", genotype=2)]
    cfg = SimConfig(ref_len=2100, coverage=16, read_len=70)
    fa, bam, var_lines, tid0, seq = _sim_window_inputs(
        tmp_path, 41, variants=variants, cfg=cfg)
    params = Parameters()
    params.do_diploid = True
    if knob == "changeINStoN":
        params.change_ins_to_n = True
    elif knob == "checkAllCIGARs0":
        params.check_all_cigars = 0
    elif knob == "smallcaps":
        params.max_hap = 2
        params.skip_max_hap = 3
    elif knob == "prodcap":
        params.max_hap_read_prod = 50
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)
    ours = _run_ours(tmp_path, [bam], fa, params, var_lines)
    if knob == "prodcap":
        assert any("error_skipped_numhap" in l for l in ours)
    _assert_identical(ref_glf, ours)


@pytest.mark.parametrize("cfg_name", ["width30", "priors", "fasterpooled",
                                      "filterpooled", "maxread",
                                      "overlapgates", "fastercaps",
                                      "indelclamp"])
def test_window_param_matrix_identical(tmp_path, cfg_name):
    """More composed parameter coverage: narrow windows (--width 30
    changes the makeWindows geometry the engine sees), non-default
    priors, --faster + pooled, --filterHaplotypes + pooled, a tiny
    --maxRead (the too-many-reads error row, fetch throw at
    Read.hpp:402), a stricter --minReadOverlap read gate
    (filter cascade DInDel.cpp:1043-1229), the --faster map-qual caps
    (capMapQualFast / capMapQualThreshold, ObservationModelS), and a
    --maxLengthIndel below a planted indel length (hap-gen clamp)."""
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    fa, bam, var_lines, tid0, seq = _sim_window_inputs(tmp_path, 47)
    params = Parameters()
    if cfg_name == "width30":
        params.do_diploid = True
        params.width = 30
    elif cfg_name == "priors":
        params.do_diploid = True
        params.prior_indel = 1e-3
        params.prior_snp = 1e-2
        params.obs_params.p_error = 1e-3
    elif cfg_name == "fasterpooled":
        params.estimate_hap_freqs = True
        params.slower = False
    elif cfg_name == "filterpooled":
        params.estimate_hap_freqs = True
        params.filter_haplotypes = True
        params.bayes_type = "all"
    elif cfg_name == "maxread":
        params.do_diploid = True
        params.max_reads = 10
    elif cfg_name == "overlapgates":
        params.do_diploid = True
        # stricter overlap requirement changes the surviving read set
        # (and hence the libstdc++ sort permutation downstream)
        params.min_read_overlap = 35
    elif cfg_name == "fastercaps":
        params.do_diploid = True
        params.slower = False
        params.obs_params.cap_map_qual_fast = 20.0
        params.obs_params.map_qual_threshold = 60.0
    elif cfg_name == "indelclamp":
        params.do_diploid = True
        # the CLI couples both to --maxLengthIndel (DInDel.cpp:3943),
        # as does the refshim driver's SET line
        params.obs_params.max_length_indel = 2
        params.obs_params.max_length_del = 2
    params.file_name = str(tmp_path / "ours")
    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)
    ours = _run_ours(tmp_path, [bam], fa, params, var_lines)
    if cfg_name == "maxread":
        # the fetch-time cap (100*maxRead, Read.hpp:402) fires before
        # the post-filter above_read_count_threshold check can
        assert any("error_Too_many_reads_in_region" in l for l in ours)
    _assert_identical(ref_glf, ours)


def test_window_multibam_pooled_identical(tmp_path):
    """Pooled mode over TWO BAM files with different read streams
    (per-pool GLF rows, indidx column)."""
    exe = ref_window_exe()
    if exe is None:
        pytest.skip("reference sources/toolchain unavailable")
    import random

    from dindel_tpu.sim import random_ref
    base_ref = random_ref(random.Random(99), 1800)
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1)]
    cfg = SimConfig(ref_len=1800, coverage=14, read_len=70)
    fa1, bam1 = simulate(str(tmp_path / "s1"), variants, cfg, seed=3,
                         ref=base_ref)
    variants2 = [PlantedVariant(pos=700, var="-ACG", genotype=2)]
    fa2, bam2 = simulate(str(tmp_path / "s2"), variants2, cfg, seed=4,
                         ref=base_ref)
    ff1 = FastaFile(fa1)
    tid0 = ff1.order[0]
    seq1 = ff1.get_sequence(tid0, 1, ff1.index[tid0][0])
    ff1.close()
    var_file, _ = get_candidates(bam1, str(tmp_path / "cand"), fa1)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    var_lines = []
    for wf in win_files:
        var_lines += [l.rstrip("\n") for l in open(wf) if l.strip()]
    params = Parameters()
    params.estimate_hap_freqs = True
    params.file_name = str(tmp_path / "ours")
    recs = serialize_bam_recs(bam1, 0) + serialize_bam_recs(bam2, 1)
    ref_glf = run_reference_window(exe, params, [(tid0, seq1)], recs,
                                   var_lines, nbams=2)
    ours = _run_ours(tmp_path, [bam1, bam2], fa1, params, var_lines)
    _assert_identical(ref_glf, ours)
