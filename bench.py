#!/usr/bin/env python
"""Benchmark: pair-HMM cell-updates/sec on the real device.

Prints ONE JSON line:
  {"metric": "pairhmm_cells_per_sec", "value": N, "unit": "cells/s",
   "vs_baseline": R, ...}

cells = L * 2*(H+2) * numT per (read, haplotype) pair — the reference's
inner-loop cost model (ObservationModelFB.cpp:1715-1829 loop bounds; see
SURVEY.md §6).  vs_baseline is measured against the actual reference C++
single-core implementation when it can be compiled (native/refshim), else
against a recorded single-core estimate.

Timing methodology: `value` is STEADY-STATE device throughput — K kernel
invocations serialized on-device inside one jit (each iteration's input
depends on the previous output), timed best-of-N, so the axon tunnel's
per-dispatch latency (~100-200 ms, larger than the kernel itself!) is
amortized away.  Single-shot dispatch latency is reported separately as
`dispatch_latency_s`.  The C++ baseline is a mean over subprocess runs.
"""

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Fallback single-core C++ cells/s (measured on this host with
# native/refshim/ref_hmm; updated when the differential driver runs).
DEFAULT_BASELINE_CELLS_PER_SEC = 400.0e6


def measure_reference_baseline(n_pairs=40, H=160, L=100):
    """Time the compiled reference ObservationModelFBMaxErr on random
    pairs; returns cells/s or None."""
    sys.path.insert(0, str(REPO / "tests"))
    try:
        from conftest import ref_hmm_exe
        exe = ref_hmm_exe()
    except Exception:
        return None
    if exe is None:
        return None
    import random
    rng = random.Random(0)
    lines = []
    for _ in range(n_pairs):
        hap = "".join(rng.choice("ACGT") for _ in range(H))
        start = rng.randrange(0, H - L) if H > L else 0
        read = hap[start:start + L]
        quals = ",".join("0.999" for _ in read)
        lines.append(f"{hap} {read} 0.99999 {start} 0 5e-4 1e-5 5 0.01 -1 0 0 {quals}")
    inp = "\n".join(lines) + "\n"
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        subprocess.run([str(exe)], input=inp, capture_output=True, text=True,
                       timeout=600)
    dt = (time.perf_counter() - t0) / reps
    numT = 7
    cells = n_pairs * L * 2 * (H + 2) * numT
    return cells / dt


def main():
    # ---- end-to-end windows/s FIRST, in a SUBPROCESS, before this
    # process touches the TPU (only one process can hold the axon chip).
    # Isolation also sidesteps a trace-state interaction: after the
    # chained kernel jit below has run, tracing the engine's fused slab
    # program recurses beyond any recursion limit in the same process.
    def run_windows(args_list, env_extra, timeout=1800):
        env = dict(os.environ)
        env.update(env_extra)
        out = subprocess.run(
            [sys.executable, str(REPO / "tools" / "bench_windows.py"),
             *args_list],
            capture_output=True, text=True, timeout=timeout, env=env)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() \
            else ""
        return json.loads(line)

    wrec = {}
    if os.environ.get("BENCH_SKIP_WINDOWS") == "1":
        wrec = {"windows_skipped": True}
        return _kernel_bench(wrec)
    # 1) headline diploid windows/s: 360 windows (same figure as
    # tools/bench_windows and README; the old 60-window run read ~10%
    # low from sim-density effects), warm + cold reported explicitly
    try:
        w = run_windows(["360"], {})
        stages = w.get("stage_seconds", {})
        if stages.get("slab_rescues"):
            # device path crashed; the rescue throughput is not the
            # production number
            wrec = {"windows_per_sec": None,
                    "windows_rescues": stages["slab_rescues"]}
        else:
            wrec = {
                "windows_per_sec": w.get("value"),
                "windows_vs_ref_core": (w.get("value") or 0) / 2.5,
                "windows_ok": w.get("windows_ok"),
                "windows_wall_s": w.get("wall_s"),
                "windows_cold_wall_s": w.get("cold_wall_s"),
                "windows_stage_seconds": stages,
            }
    except Exception as e:
        wrec = {"windows_error": repr(e)[:200]}
    # 2) pooled-mode windows/s (VB-EM caller incl. the device EM path)
    try:
        w = run_windows(["120"], {"BENCH_MODE": "pooled"})
        if not w.get("stage_seconds", {}).get("slab_rescues"):
            wrec["pooled_windows_per_sec"] = w.get("value")
            wrec["pooled_windows_cold_wall_s"] = w.get("cold_wall_s")
    except Exception as e:
        wrec["pooled_windows_error"] = repr(e)[:200]
    # 3) multi-process host staging (parallel/hostshard.py): N staging
    # processes feeding this chip; warm = last repeat.  N adapts to the
    # host: oversubscribing the CPUs collapses throughput (PERF_NOTES
    # round 5: 6 procs on a 4-core host measured 32.5 vs 74-84 at 4),
    # so leave one core for the device-server process and skip the mode
    # entirely when the host can't run >=2 staging procs beside it.
    procs = max(1, min(4, (os.cpu_count() or 2) - 1))
    if procs >= 2:
        try:
            w = run_windows(["360"], {"BENCH_STAGE_PROCS": str(procs),
                                      "BENCH_REPEATS": "3"})
            wrec["hostshard_windows_per_sec"] = w.get("value")
            wrec["hostshard_stage_procs"] = procs
        except Exception as e:
            wrec["hostshard_windows_error"] = repr(e)[:200]
    else:
        wrec["hostshard_skipped_ncpu"] = os.cpu_count()
    return _kernel_bench(wrec)


def _kernel_bench(wrec):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dindel_tpu.config import ObservationModelParameters
    from dindel_tpu.hmm.batch import (pack_pairs, compute_obs_mid, _finish,
                                      get_dp_impl)
    from dindel_tpu.parallel.mesh import synth_windows

    # realistic window scale: 8 haplotypes x 768 reads, 160bp haps, 100bp
    # reads (BASELINE.json config 2 geometry)
    nh, nr, H, L = 8, 768, 160, 100
    params = ObservationModelParameters()
    (haps, reads, hap_start), = synth_windows(1, nh=nh, nr=nr, H=H, L=L, seed=1)
    on_tpu = jax.devices()[0].platform != "cpu"
    # TPU path: lane-aligned state axis for the fused Pallas DP kernel
    pk = pack_pairs(haps, reads, hap_start, params, dtype=np.float32,
                    H_pad=254 if on_tpu else None,
                    L_pad=128 if on_tpu else None)
    keys = ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
            "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]
    args = [jnp.asarray(pk[k]) for k in keys] + [jnp.asarray(pk["scalars"])]
    obs_mid = jnp.asarray(compute_obs_mid(pk))
    prr = jnp.asarray(pk["prior_rmq"])
    prh = jnp.asarray(pk["prior_hmq"])
    bm = jnp.asarray(pk["b_mid"])
    dp = get_dp_impl("pallas" if on_tpu else "xla")
    eq_idx = keys.index("eq")

    def step(a):
        amid, bmid_, btf, btb = dp(pk["H_pad"], pk["L_pad"], pk["numT"], *a)
        return _finish(pk["H_pad"], pk["L_pad"], bm, amid, bmid_, obs_mid,
                       prr, prh, btf, btb, exact_ties=not on_tpu,
                       bt_codes=on_tpu, numT=pk["numT"],
                       hap_len=a[0] if on_tpu else None)

    # steady-state chain: K full (DP + finish) evaluations serialized on
    # device; iteration i+1's eq input depends on iteration i's ll output
    K = 8 if on_tpu else 2

    @jax.jit
    def chain(eq0):
        def body(eqc, _):
            a = list(args)
            a[eq_idx] = eqc
            out = step(a)
            return eqc + out[0][0] * 0.0, None

        eqc, _ = lax.scan(body, eq0, None, length=K)
        return jnp.sum(eqc)

    eq0 = args[eq_idx]

    # warmup/compile; fetch to host to force full completion (the axon
    # tunnel's block_until_ready does not wait for remote execution)
    out = step(args)
    np.asarray(out[0])
    np.asarray(chain(eq0))

    # best-of-N rounds: the axon tunnel shows ~2-5x run-to-run spread
    # (remote queueing), so the minimum over rounds is the stable estimate
    rounds = 4
    chain_times = []
    single_times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(chain(eq0))
        chain_times.append((time.perf_counter() - t0) / K)
        t0 = time.perf_counter()
        out = step(args)
        np.asarray(jnp.sum(out[0]))
        single_times.append(time.perf_counter() - t0)

    dt = min(chain_times)
    dt_median = sorted(chain_times)[len(chain_times) // 2]

    B = nh * nr
    numT = pk["numT"]
    # count true per-pair work (the reference's loop bounds on unpadded
    # sizes), not padded work — conservative for us
    cells = B * L * 2 * (H + 2) * numT
    cells_per_sec = cells / dt

    baseline = None
    try:
        baseline = measure_reference_baseline()
    except Exception:
        baseline = None
    if baseline is None:
        baseline = DEFAULT_BASELINE_CELLS_PER_SEC

    record = {
        "metric": "pairhmm_cells_per_sec",
        "value": cells_per_sec,
        "unit": "cells/s",
        "vs_baseline": cells_per_sec / baseline,
        "value_median": cells / dt_median,
        "chain_step_times_s": [round(t, 6) for t in chain_times],
        "dispatch_latency_s": round(min(single_times), 6),
        "baseline_cells_per_sec": baseline,
        "timing": "value=steady-state (K=%d on-device chained calls, "
                  "best-of-%d); baseline=mean-of-5 subprocess runs "
                  "incl. spawn" % (K, rounds),
    }
    # the driver records the LAST JSON line: print the kernel metric now
    # so it survives even if anything below is cut short, then the
    # combined record with the subprocess-measured windows/s
    print(json.dumps(record), flush=True)
    record.update(wrec)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
