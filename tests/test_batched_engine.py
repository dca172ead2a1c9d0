"""BatchedWindowEngine must produce the same GLF rows as the streaming
WindowEngine (float64, CPU)."""

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.engine.batched import BatchedWindowEngine
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


def test_batched_equals_streaming(tmp_path):
    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1500, var="+TT", genotype=2),
                PlantedVariant(pos=2300, var="-T", genotype=1)]
    cfg = SimConfig(ref_len=3000, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=13)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "a")
    eng = WindowEngine([bam], fa, params, hmm_backend="jax")
    glf_a = str(tmp_path / "a.glf.txt")
    rows_a = eng.detect_indels(win_files[0], glf_a)
    eng.close()

    params2 = Parameters()
    params2.do_diploid = True
    params2.file_name = str(tmp_path / "b")
    beng = BatchedWindowEngine([bam], fa, params2, batch_windows=8,
                               dp_impl="xla", dtype=np.float64)
    glf_b = str(tmp_path / "b.glf.txt")
    rows_b = beng.detect_indels(win_files[0], glf_b)
    assert beng.stats.windows_ok >= 2
    beng.close()

    a = open(glf_a).read()
    b = open(glf_b).read()
    assert a == b


def test_batched_realigned_bam_equals_streaming(tmp_path):
    """The batched engine's realigned-BAM output must byte-match the
    streaming engine's."""
    import glob
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    variants = [PlantedVariant(pos=600, var="-TGCA", genotype=2)]
    cfg = SimConfig(ref_len=1300, coverage=15, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=5)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    params = Parameters()
    params.do_diploid = True
    params.output_realigned_bam = True
    params.file_name = str(tmp_path / "a")
    eng = WindowEngine([bam], fa, params, hmm_backend="jax")
    eng.detect_indels(win_files[0], str(tmp_path / "a.glf.txt"))
    eng.close()

    params2 = Parameters()
    params2.do_diploid = True
    params2.output_realigned_bam = True
    params2.file_name = str(tmp_path / "b")
    beng = BatchedWindowEngine([bam], fa, params2, batch_windows=8,
                               dp_impl="xla", dtype=np.float64)
    beng.detect_indels(win_files[0], str(tmp_path / "b.glf.txt"))
    beng.close()

    ra_a = sorted(glob.glob(str(tmp_path / "a.ra.*.bam")))
    ra_b = sorted(glob.glob(str(tmp_path / "b.ra.*.bam")))
    assert ra_a and len(ra_a) == len(ra_b)
    from dindel_tpu.io.bam import BamReader
    for pa, pb in zip(ra_a, ra_b):
        ra = [(r.qname, r.pos, r.cigar, r.flag) for r in BamReader(pa)]
        rb = [(r.qname, r.pos, r.cigar, r.flag) for r in BamReader(pb)]
        assert ra == rb


def test_batched_error_rows_match_streaming(tmp_path):
    """Per-window fault isolation (the reference's skip-and-record
    contract, DInDel.cpp:1361-1408): windows with no reads become
    error_too_few_reads GLF rows while later windows still get called —
    identically in both engines."""
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    variants = [PlantedVariant(pos=900, var="-ACG", genotype=1)]
    cfg = SimConfig(ref_len=1800, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=13)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))
    # prepend a window in a read-free region of a second contig... the
    # simulator has one contig, so use a window far left where reads
    # cannot overlap given minReadOverlap
    lines = open(win_files[0]).read()
    bad = "1 1 30 15,-A\n"
    wf = tmp_path / "win_err.txt"
    wf.write_text(bad + lines)

    outs = {}
    for name, eng_cls, kw in (
            ("a", WindowEngine, dict(hmm_backend="jax")),
            ("b", BatchedWindowEngine,
             dict(batch_windows=8, dp_impl="xla", dtype=np.float64))):
        params = Parameters()
        params.do_diploid = True
        params.file_name = str(tmp_path / name)
        eng = eng_cls([bam], fa, params, **kw)
        glf = str(tmp_path / f"{name}.glf.txt")
        eng.detect_indels(str(wf), glf)
        eng.close()
        outs[name] = open(glf).read()
    assert outs["a"] == outs["b"]
    assert "error_" in outs["a"]
    # the good window after the failing one still produced rows
    assert "dip.map" in outs["a"]


def test_slab_fault_rescued_by_xla_fallback(tmp_path, monkeypatch):
    """If the packed device phase faults for a whole slab, every window in
    it must be re-scored individually through the batched XLA backend (not
    the float64 oracle) and the GLF output must be unchanged."""
    import dindel_tpu.engine.batched as batched_mod

    variants = [PlantedVariant(pos=700, var="-ACG", genotype=1),
                PlantedVariant(pos=1500, var="+TT", genotype=2)]
    cfg = SimConfig(ref_len=2200, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=13)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    outs = {}
    for name, sabotage in (("a", False), ("b", True)):
        if sabotage:
            def boom(*a, **k):
                raise RuntimeError("injected slab fault")
            monkeypatch.setattr(batched_mod, "run_packed_compact", boom)
            monkeypatch.setattr(batched_mod, "run_packed", boom)
        params = Parameters()
        params.do_diploid = True
        params.file_name = str(tmp_path / name)
        eng = BatchedWindowEngine([bam], fa, params, batch_windows=8,
                                  dp_impl="xla", dtype=np.float64)
        if sabotage:
            assert eng.hmm_backend == "jax"  # fallback is XLA, not oracle
        glf = str(tmp_path / f"{name}.glf.txt")
        eng.detect_indels(win_files[0], glf)
        assert eng.stats.windows_ok >= 2
        eng.close()
        outs[name] = open(glf).read()
    assert "dip.map" in outs["a"]
    assert outs["a"] == outs["b"]


def test_batched_equals_streaming_pooled(tmp_path):
    """Pooled (VB-EM) GLF output parity between the engines."""
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    variants = [PlantedVariant(pos=650, var="-CT", genotype=1),
                PlantedVariant(pos=1500, var="+AC", genotype=1)]
    cfg = SimConfig(ref_len=2200, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp_path / "sim"), variants, cfg, seed=21)
    var_file, _ = get_candidates(bam, str(tmp_path / "cand"), fa)
    win_files = make_windows(var_file, str(tmp_path / "win"))

    outs = {}
    for name, eng_cls, kw in (
            ("a", WindowEngine, dict(hmm_backend="jax")),
            ("b", BatchedWindowEngine,
             dict(batch_windows=8, dp_impl="xla", dtype=np.float64))):
        params = Parameters()
        params.estimate_hap_freqs = True
        params.bayes_type = "singlevariant"
        params.file_name = str(tmp_path / name)
        eng = eng_cls([bam], fa, params, **kw)
        glf = str(tmp_path / f"{name}.glf.txt")
        eng.detect_indels(win_files[0], glf)
        eng.close()
        outs[name] = open(glf).read()
    assert "singlevariant" in outs["a"]
    assert outs["a"] == outs["b"]
