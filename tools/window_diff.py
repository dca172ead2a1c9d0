"""Manual harness for the composed whole-window differential: simulate a
BAM, run OUR engine and the reference detectIndels (ref_window driver)
on identical inputs, and diff the GLF tables line by line.

Usage: JAX_PLATFORMS=cpu python tools/window_diff.py [seed] [mode]
mode: dip | pooled | both   (default dip)

The canonical helpers live in tests/test_window_ref.py; this tool just
drives them interactively on a bigger sim and prints the diffs."""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    mode = sys.argv[2] if len(sys.argv) > 2 else "dip"

    import conftest
    from test_window_ref import run_reference_window, serialize_bam_recs
    from dindel_tpu.config import Parameters
    from dindel_tpu.engine.candidates import get_candidates
    from dindel_tpu.engine.window import WindowEngine
    from dindel_tpu.io.fasta import FastaFile
    from dindel_tpu.pipeline.windows import make_windows
    from dindel_tpu.sim import PlantedVariant, SimConfig, simulate

    exe = conftest.ref_window_exe()
    assert exe, "cannot build ref_window"

    tmp = tempfile.mkdtemp(prefix="windiff_")
    variants = [
        PlantedVariant(pos=700, var="-ACG", genotype=1),
        PlantedVariant(pos=1400, var="+TT", genotype=2),
        PlantedVariant(pos=2000, var="-A", genotype=1),
    ]
    cfg = SimConfig(ref_len=2800, coverage=20, read_len=70)
    fa, bam = simulate(os.path.join(tmp, "sim"), variants, cfg, seed=seed)
    var_file, _lib = get_candidates(bam, os.path.join(tmp, "cand"), fa)
    win_files = make_windows(var_file, os.path.join(tmp, "win"))
    var_lines = []
    for wf in win_files:
        var_lines += [l.rstrip("\n") for l in open(wf) if l.strip()]

    params = Parameters()
    if mode in ("dip", "both"):
        params.do_diploid = True
    if mode in ("pooled", "both"):
        params.estimate_hap_freqs = True
    params.file_name = os.path.join(tmp, "ours")

    ff = FastaFile(fa)
    tid0 = ff.order[0]
    seq = ff.get_sequence(tid0, 1, ff.index[tid0][0])
    ff.close()

    ref_glf = run_reference_window(exe, params, [(tid0, seq)],
                                   serialize_bam_recs(bam), var_lines)

    allv = os.path.join(tmp, "allwin.txt")
    with open(allv, "w") as f:
        f.write("\n".join(var_lines) + "\n")
    eng = WindowEngine([bam], fa, params, hmm_backend="oracle")
    glf_path = os.path.join(tmp, "ours.glf.txt")
    eng.detect_indels(allv, glf_path)
    eng.close()
    ours = [l.rstrip("\n") for l in open(glf_path)]

    print(f"ref lines: {len(ref_glf)}  ours: {len(ours)}  (tmp: {tmp})")
    ndiff = 0
    for i in range(max(len(ref_glf), len(ours))):
        a = ref_glf[i] if i < len(ref_glf) else "<missing>"
        b = ours[i] if i < len(ours) else "<missing>"
        if a != b:
            ndiff += 1
            if ndiff <= 20:
                print(f"DIFF line {i}:\n  ref : {a}\n  ours: {b}")
    print(f"{ndiff} differing lines")
    if ndiff == 0:
        print("MATCH")
    return 0 if ndiff == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
