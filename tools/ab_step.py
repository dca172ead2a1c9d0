#!/usr/bin/env python
"""Interleaved A/B of Pallas DP kernel variants on the real TPU.

Variants are comma-separated kwarg specs for dp_pallas, e.g.:
  python tools/ab_step.py "" "anchor_bounds=False" "emit_bt=False"
Correctness is checked at the _finish-output level (ll / off-hap flags /
map_state — the actual kernel contract; raw bt rows outside the consumed
ranges are intentionally unwritten).  Timing rounds are interleaved
(A,B,A,B,...) so tunnel-queueing drift hits all variants equally;
reports best-of-N for the DP alone and DP+finish.
"""
import ast
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
from dindel_tpu.hmm.batch import pack_pairs, compute_obs_mid, _finish
from dindel_tpu.hmm.pallas_kernel import dp_pallas
from dindel_tpu.parallel.mesh import synth_windows


def parse_spec(spec):
    kw = {}
    for part in spec.split(","):
        if not part:
            continue
        k, v = part.split("=")
        kw[k.strip()] = ast.literal_eval(v.strip())
    return kw


def main():
    specs = sys.argv[1:] or ["", "anchor_bounds=False"]
    variants = [(s or "baseline", parse_spec(s)) for s in specs]
    nh, nr, H, L = 8, 768, 160, 100
    params = ObservationModelParameters()
    (haps, reads, hap_start), = synth_windows(1, nh=nh, nr=nr, H=H, L=L,
                                              seed=1)
    pk = pack_pairs(haps, reads, hap_start, params, dtype=np.float32,
                    H_pad=254, L_pad=128)
    keys = ["hap_len", "read_len", "b_mid", "read_codes", "hap_codes",
            "eq", "uq", "lpe", "lpn", "lpeV", "lpnV"]
    args = [jnp.asarray(pk[k]) for k in keys] + [jnp.asarray(pk["scalars"])]
    obs_mid = jnp.asarray(compute_obs_mid(pk))
    prr = jnp.asarray(pk["prior_rmq"])
    prh = jnp.asarray(pk["prior_hmq"])
    bm = jnp.asarray(pk["b_mid"])
    B = nh * nr
    numT = pk["numT"]
    cells = B * L * 2 * (H + 2) * numT

    def run_dp(kw):
        return dp_pallas(pk["H_pad"], pk["L_pad"], numT, *args, **kw)

    def run_full(kw):
        amid, bmid_, btf, btb = run_dp(kw)
        return _finish(pk["H_pad"], pk["L_pad"], bm, amid, bmid_, obs_mid,
                       prr, prh, btf, btb, exact_ties=False,
                       bt_codes=True, numT=numT, hap_len=args[0])

    names = ("ll", "off_hap", "off_hap_hmq", "ll_off", "ll_on", "map_state")
    # map_state is only defined for positions < read_len (beyond that the
    # backtrack walks unwritten HBM rows by design; consumers never read
    # those positions)
    valid = (np.arange(pk["L_pad"])[None, :]
             < np.asarray(pk["read_len"])[:, None])
    ref = None
    for name, kw in variants:
        t0 = time.perf_counter()
        out = run_full(kw)
        got = list(np.asarray(o) for o in out)
        got[-1] = np.where(valid, got[-1], -1)
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
        if kw.get("emit_bt", True):
            if ref is None:
                ref = got
            else:
                for nm, a, b in zip(names, ref, got):
                    if not np.array_equal(a, b):
                        bad = int(np.sum(a != b))
                        print(f"{name}: MISMATCH in {nm} ({bad} cells)",
                              flush=True)
        del out

    # Steady-state timing: K kernel invocations serialized ON DEVICE
    # inside one jit (each iteration's eq input depends on the previous
    # amid output), so the axon tunnel's per-dispatch latency (~100+ ms)
    # is amortized away and t/K approaches true device time.
    K = 8
    from jax import lax

    def make_chain(kw, full):
        idx = keys.index("eq")

        @jax.jit
        def chain(eq0):
            def body(eqc, _):
                a = list(args)
                a[idx] = eqc
                amid, bmid_, btf, btb = dp_pallas(
                    pk["H_pad"], pk["L_pad"], numT, *a, **kw)
                if full:
                    out = _finish(pk["H_pad"], pk["L_pad"], bm, amid,
                                  bmid_, obs_mid, prr, prh, btf, btb,
                                  exact_ties=False, bt_codes=True,
                                  numT=numT, hap_len=a[0])
                    dep = out[0][0]
                else:
                    dep = amid[0, 0]
                return eqc + dep * 0.0, None

            eqc, _ = lax.scan(body, eq0, None, length=K)
            return jnp.sum(eqc)

        return chain

    eq0 = args[keys.index("eq")]
    reps, rounds = 1, 4
    best_dp = {name: float("inf") for name, _ in variants}
    best_full = {name: float("inf") for name, _ in variants}
    chains = {}
    for name, kw in variants:
        chains[name] = (make_chain(kw, False), make_chain(kw, True))
        t0 = time.perf_counter()
        np.asarray(chains[name][0](eq0))
        np.asarray(chains[name][1](eq0))
        print(f"{name}: chains compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
    for _ in range(rounds):
        for name, kw in variants:
            t0 = time.perf_counter()
            np.asarray(chains[name][0](eq0))
            best_dp[name] = min(best_dp[name],
                                (time.perf_counter() - t0) / K)
            t0 = time.perf_counter()
            np.asarray(chains[name][1](eq0))
            best_full[name] = min(best_full[name],
                                  (time.perf_counter() - t0) / K)
    for name, _ in variants:
        d, f = best_dp[name], best_full[name]
        print(f"{name:30s}  dp={d*1e3:8.2f} ms ({cells/d:.3e} c/s)   "
              f"dp+finish={f*1e3:8.2f} ms ({cells/f:.3e} c/s)",
              flush=True)


if __name__ == "__main__":
    main()
