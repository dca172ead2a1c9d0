#!/usr/bin/env python
"""Scan the Pallas DP kernel tile height TB on the real TPU.

Usage: python tools/bench_tb.py [tb ...]   (default: 8 16 32 128)
Prints cells/s per TB at the bench.py shape.
"""
import os
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
    tbs = [int(x) for x in sys.argv[1:]] or [8, 16, 32, 128]
    nh, nr, H, L = 8, 768, 160, 100
    params = ObservationModelParameters()
    (haps, reads, hap_start), = synth_windows(1, nh=nh, nr=nr, H=H, L=L, seed=1)
    pk = pack_pairs(haps, reads, hap_start, params, dtype=np.float32,
                    H_pad=254, L_pad=128)
    keys = ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
            "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]
    args = [jnp.asarray(pk[k]) for k in keys] + [jnp.asarray(pk["scalars"])]
    B = nh * nr
    numT = pk["numT"]
    cells = B * L * 2 * (H + 2) * numT
    ref_amid = None
    for tb in tbs:
        t0 = time.perf_counter()
        out = dp_pallas(pk["H_pad"], pk["L_pad"], numT, *args, tb=tb)
        amid = np.asarray(out[0])
        compile_s = time.perf_counter() - t0
        if ref_amid is None:
            ref_amid = amid
        else:
            diff = float(np.abs(ref_amid - amid).max())
            if diff != 0.0:
                print(f"tb={tb}: MISMATCH amid maxdiff {diff}", flush=True)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = dp_pallas(pk["H_pad"], pk["L_pad"], numT, *args, tb=tb)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"tb={tb:4d}  dp={dt*1e3:8.2f} ms  {cells/dt:.3e} cells/s  "
              f"(first call {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
