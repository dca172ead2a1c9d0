"""Engine behaviors: multi-BAM pooled GLF blocks, EM program variants,
per-window error rows, run statistics, --opl dumps."""

import glob

import jax
import pytest

jax.config.update("jax_enable_x64", True)

from dindel_tpu.config import Parameters
from dindel_tpu.engine.candidates import get_candidates
from dindel_tpu.engine.window import WindowEngine
from dindel_tpu.pipeline.windows import make_windows
from dindel_tpu.sim import PlantedVariant, SimConfig, simulate


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("simdata")
    variants = [PlantedVariant(pos=600, var="-TG", genotype=1)]
    cfg = SimConfig(ref_len=1300, coverage=18, read_len=70)
    fa, bam = simulate(str(tmp / "sim"), variants, cfg, seed=9)
    var_file, lib_file = get_candidates(bam, str(tmp / "cand"), fa)
    win_files = make_windows(var_file, str(tmp / "win"))
    return dict(tmp=tmp, fa=fa, bam=bam, win=win_files[0], lib=lib_file)


def run_engine(sim, params, bams=None, backend="oracle"):
    eng = WindowEngine(bams or [sim["bam"]], sim["fa"], params,
                       hmm_backend=backend)
    glf = str(sim["tmp"] / "t.glf.txt")
    rows = eng.detect_indels(sim["win"], glf)
    stats = eng.stats
    eng.close()
    return rows, glf, stats


def test_multi_bam_pooled(sim):
    # second sample: same reference, distinct read names
    from dindel_tpu.io.fasta import FastaFile
    # the fetched reference already carries the simulator's start_pad, so
    # build the second sample with start_pad=0 and pre-shifted positions
    ref = FastaFile(sim["fa"]).get_sequence("1", 1, 10**9)
    cfg2 = SimConfig(ref_len=len(ref), coverage=18, read_len=70,
                     qname_prefix="s", start_pad=0)
    pad = SimConfig().start_pad
    _, bam2 = simulate(str(sim["tmp"] / "sim2"),
                       [PlantedVariant(pos=600 + pad, var="-TG",
                                       genotype=1)],
                       cfg2, seed=31, ref=ref)
    params = Parameters()
    params.estimate_hap_freqs = True
    params.file_name = str(sim["tmp"] / "mb")
    rows, glf, _ = run_engine(sim, params, bams=[sim["bam"], bam2])
    sv = [r for r in rows if r.get("analysis_type") == "singlevariant"]
    assert sv
    # per-BAM blocks: indidx 0 and 1 present for each variant
    idxs = {r["indidx"] for r in sv}
    assert idxs == {0, 1}


@pytest.mark.parametrize("program", ["all", "singlevariant", "priorpersite"])
def test_em_programs(sim, program):
    params = Parameters()
    params.estimate_hap_freqs = True
    params.bayes_type = program
    params.file_name = str(sim["tmp"] / f"em_{program}")
    rows, glf, _ = run_engine(sim, params)
    sv = [r for r in rows if r.get("analysis_type") == program]
    assert sv
    dels = [r for r in sv if str(r.get("nref_all", "")).startswith("-")]
    assert dels
    assert max(float(r["post_prob_variant"]) for r in dels) > 0.5


def test_error_rows(sim, tmp_path):
    # a window with no reads -> too_few_reads error row, engine continues
    win = tmp_path / "badwin.txt"
    with open(win, "w") as f:
        # contig-start dead zone (uint32 fetch wrap): too_few_reads row
        f.write("1 100 300 200,-TG\n")
        # the real window around the planted variant (600 + start_pad)
        f.write("1 2972 3152 3032,-TG\n")
    params = Parameters()
    params.do_diploid = True
    params.file_name = str(tmp_path / "err")
    eng = WindowEngine([sim["bam"]], sim["fa"], params, hmm_backend="oracle")
    glf = str(tmp_path / "err.glf.txt")
    eng.detect_indels(str(win), glf)
    eng.close()
    content = open(glf).read()
    lines = content.strip().split("\n")
    # first line is the header; error rows carry error_* in the msg column
    assert any(l.startswith("error_") for l in
               (ln.split()[0] for ln in lines[1:])) or "ok" in content
    # the second (good) window must still have been processed
    assert any(ln.split()[0] == "ok" for ln in lines[1:])


def test_stats_and_opl(sim):
    params = Parameters()
    params.do_diploid = True
    params.estimate_hap_freqs = True
    params.output_pooled_likelihoods = True
    params.file_name = str(sim["tmp"] / "opl")
    rows, glf, stats = run_engine(sim, params)
    s = stats.summary()
    assert s["windows_ok"] >= 1
    assert s["pairs_scored"] > 0
    assert s["cells_scored"] > 0
    assert "get_reads" in s["stage_seconds"]
    # --opl dumps
    assert glob.glob(str(sim["tmp"] / "opl.*.liks"))
    assert glob.glob(str(sim["tmp"] / "opl.*.hapvars"))
    assert glob.glob(str(sim["tmp"] / "opl.*.hapfreqs"))
    assert glob.glob(str(sim["tmp"] / "opl.check.txt"))


def test_first_overlapping_bisect_equals_linear():
    """The bisect-based HaplotypeDistribution._first_overlapping must
    equal the reference's linear scan on randomized block layouts."""
    import random
    from dindel_tpu.engine.hapgen import HaplotypeDistribution

    def linear(blocks, seq_start, seq_end):
        for x, hb in enumerate(blocks):
            if hb.end() >= seq_start and hb.start() <= seq_end:
                return x
        return -1

    rng = random.Random(9)
    for trial in range(30):
        n = rng.randrange(40, 160)
        ref = "".join(rng.choice("ACGT") for _ in range(n))
        start0 = rng.randrange(0, 50)
        hd = HaplotypeDistribution(start0 + n // 2, ref, start0)
        # random inserts to fragment the blocks
        for _ in range(rng.randrange(5, 25)):
            ln = rng.randrange(1, 9)
            s = rng.randrange(start0, start0 + n - ln)
            hd._insert_seq("".join(rng.choice("ACGT") for _ in range(ln)),
                           1, s)
        for _ in range(50):
            a = rng.randrange(start0 - 5, start0 + n + 5)
            b = a + rng.randrange(0, 12)
            assert hd._first_overlapping(a, b) == linear(hd.blocks, a, b), \
                (trial, a, b)


def test_sim_fast_cigar_matches_walk():
    """sim._HapColumns.cigar (O(read_len) slice) vs the full-walk
    _cigar_for_read reference on randomized variant layouts."""
    import random
    from dindel_tpu.sim import PlantedVariant, _cigar_for_read, _HapColumns

    rng = random.Random(7)
    BASES = "ACGT"
    for _ in range(40):
        n = rng.randint(200, 600)
        ref = "".join(rng.choice(BASES) for _ in range(n))
        variants = []
        last = -100
        for p in sorted(rng.sample(range(10, n - 20), rng.randint(0, 5))):
            if p - last < 8:
                continue
            last = p
            k = rng.randint(1, 3)
            kind = rng.randint(0, 2)
            if kind == 0:
                variants.append(PlantedVariant(
                    pos=p, var="+" + "".join(rng.choice(BASES)
                                             for _ in range(k)), genotype=1))
            elif kind == 1:
                variants.append(PlantedVariant(
                    pos=p, var="-" + ref[p:p + k], genotype=1))
            else:
                variants.append(PlantedVariant(
                    pos=p, var=ref[p] + "=>"
                    + rng.choice(BASES.replace(ref[p], "")), genotype=1))
        cols = _HapColumns(variants, ref)
        alt_len = len(cols.col_ref)
        L = rng.randint(20, 100)
        for _ in range(20):
            s = rng.randrange(0, max(1, alt_len - L))
            assert (_cigar_for_read(s, L, variants, ref)
                    == cols.cigar(s, L))
