#!/usr/bin/env python
"""A/B the Pallas DP kernel invariant-hoisting modes on the real TPU.

Usage: python tools/ab_hoist.py [mode ...]   (default: all split none)
Best-of-N timing per mode (the axon tunnel has 2-5x run-to-run spread);
asserts bit-identical outputs across modes (pure code motion).
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from dindel_tpu.config import ObservationModelParameters
from dindel_tpu.hmm.batch import pack_pairs
from dindel_tpu.hmm.pallas_kernel import dp_pallas
from dindel_tpu.parallel.mesh import synth_windows


def main():
    modes = sys.argv[1:] or ["all", "split", "none"]
    nh, nr, H, L = 8, 768, 160, 100
    params = ObservationModelParameters()
    (haps, reads, hap_start), = synth_windows(1, nh=nh, nr=nr, H=H, L=L,
                                              seed=1)
    pk = pack_pairs(haps, reads, hap_start, params, dtype=np.float32,
                    H_pad=254, L_pad=128)
    keys = ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
            "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]
    args = [jnp.asarray(pk[k]) for k in keys] + [jnp.asarray(pk["scalars"])]
    B = nh * nr
    numT = pk["numT"]
    cells = B * L * 2 * (H + 2) * numT
    ref = None
    for mode in modes:
        t0 = time.perf_counter()
        out = dp_pallas(pk["H_pad"], pk["L_pad"], numT, *args, hoist=mode)
        got = tuple(np.asarray(o) for o in out)
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = got
        else:
            for name, a, b in zip(("amid", "bmid", "btf", "btb"), ref, got):
                if not np.array_equal(a, b):
                    print(f"mode={mode}: MISMATCH in {name}", flush=True)
        reps, rounds = 2, 4
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = dp_pallas(pk["H_pad"], pk["L_pad"], numT, *args,
                                hoist=mode)
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"hoist={mode:6s}  dp={best*1e3:8.2f} ms  "
              f"{cells/best:.3e} cells/s  (first call {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
