"""Batched pair-HMM for TPU: scores every (haplotype, read) pair of a
window in one device program.

Numerical contract: ObservationModelFBMaxErr (see hmm/reference.py, which
this module must match bit-for-bit in float64). Design notes:

- Fixed state layout per bucket: x in {0=LO, 1..H_pad, H_pad+1=RO} x
  insertion flag; per-pair true hap length Hh < H_pad is handled by mapping
  "beyond hap end" to the fixed RO index (gather-free via shifted V-arrays)
  and by masking dead states to -1e30 every step.
- The reference runs the forward (Dec) recursion only up to the per-read
  anchor bMid and the backward (Inc) recursion down to it.  We run both
  recursions over the full read uniformly (SPMD-friendly; 2x the minimal
  work but no data-dependent trip counts) and select the bMid slice per
  pair on the fly.
- updateMax's EPS/tie-to-lower-index rule (ObservationModelFB.cpp:877-888)
  is reproduced exactly by folding candidates in the reference's program
  order; the bMid-slice likelihood fold (:1096-1117) is an order-dependent
  scan over states and is emulated with lax.scan.
- Backpointers for both directions are stored (L x B x S int16) and the
  MAP path is reconstructed with two short scans; per-read variant events
  are extracted on host (hmm/reference._report_variants) for parity.

The DP recursions have two interchangeable implementations: pure-XLA scans
(_dp_xla — runs anywhere, float64 bit-parity on CPU) and a fused Pallas
TPU kernel (hmm/pallas_kernel.py — the production path on TPU).  The
likelihood folds + backtrack (_finish) are shared.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import ObservationModelParameters
from ..model import Haplotype, MLAlignment, Read
from .reference import (EPS, TIE, _Trans, _report_variants, compute_b_mid,
                        compute_b_mid_prior, hp_log_prob_error)

NEGBIG = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fold(dest_v, dest_i, cand_v, cand_i):
    """One updateMax step, vectorized (exact port of
    ObservationModelFB.cpp:877-888)."""
    take = cand_v > dest_v + EPS
    tie = (cand_v >= dest_v) & (cand_v <= dest_v + TIE) & (dest_i > cand_i)
    take = take | tie
    return jnp.where(take, cand_v, dest_v), jnp.where(take, cand_i, dest_i)


@partial(jax.jit, static_argnames=("H_pad", "L_pad", "numT"))
def _dp_xla(H_pad, L_pad, numT,
            hap_len, read_len, b_mid, read_codes, hap_codes,
            eq, uq, lpe, lpn, lpeV, lpnV, scalars):
    """XLA-scan implementation of the two DP recursions.
    Returns (alpha_mid, beta_mid, btf, btb); btf[b-1] are the forward
    backpointers of slice b (b=1..L_pad-1), btb[b] the backward successors
    of slice b (b=0..L_pad-2)."""
    B = hap_len.shape[0]
    S_half = H_pad + 2
    S = 2 * S_half
    RO = H_pad + 1
    dtype = eq.dtype

    logpLOgLO, logpFirstgLO, logpInsgIns, logpNoInsgIns, logpNoInsgNoIns = (
        scalars[0], scalars[1], scalars[2], scalars[3], scalars[4])

    xs_state = jnp.arange(S_half, dtype=jnp.int32)[None, :]
    live = (xs_state <= hap_len[:, None]) | (xs_state == RO)
    live2 = jnp.concatenate([live, live], axis=1)
    idx_base = jnp.arange(S, dtype=jnp.int32)[None, :].repeat(B, 0)
    j_idx = jnp.arange(S_half + numT, dtype=jnp.int32)[None, :]
    idxV = jnp.where(j_idx <= hap_len[:, None], j_idx, RO)
    hl = hap_len[:, None]

    def obs_slice(b):
        rb = read_codes[:, b][:, None]
        e = eq[:, b][:, None]
        u = uq[:, b][:, None]
        mismatch = (hap_codes != rb) & (hap_codes != ord("N"))
        on = jnp.where(mismatch, u, e)
        noins = jnp.concatenate([e, on, e], axis=1)
        ins = jnp.broadcast_to(e, (B, S_half)).astype(dtype)
        return jnp.concatenate([noins, ins], axis=1)

    def gather_col(M, col):
        return jnp.take_along_axis(M, col[:, None], axis=1)[:, 0]

    # Dec pass (FBMaxErr::passMessageTwoDec, ObservationModelFB.cpp:1775-1829)
    def dec_step(A, O):
        W = A + O
        Wn = W[:, :S_half]
        Wi = W[:, S_half:]
        dRO_v = jnp.full((B,), NEGBIG, dtype=dtype)
        dRO_i = jnp.full((B,), RO, dtype=jnp.int32)
        dRO_v, dRO_i = _fold(dRO_v, dRO_i,
                             W[:, RO] + logpLOgLO + logpNoInsgNoIns,
                             jnp.full((B,), RO, jnp.int32))
        WnH = gather_col(Wn, hap_len)
        dRO_v, dRO_i = _fold(dRO_v, dRO_i,
                             WnH + logpFirstgLO + logpNoInsgNoIns, hap_len)
        dx_v = jnp.full((B, S_half), NEGBIG, dtype=dtype)
        dx_i = idx_base[:, :S_half]
        x_idx = xs_state
        for y in range(1, numT):
            src_idx = jnp.maximum(x_idx - y, 0)
            srcW = jnp.take_along_axis(
                Wn, jnp.broadcast_to(src_idx, (B, S_half)), axis=1)
            lp = lpn if y == 1 else (lpe + (y - 1) * logpInsgIns)
            cand = srcW + lp + lpn
            dx_v, dx_i = _fold(dx_v, dx_i, cand,
                               jnp.broadcast_to(src_idx, (B, S_half)))
        d0_v = W[:, 0] + logpNoInsgNoIns
        d0_i = jnp.zeros((B,), jnp.int32)
        dRO_v, dRO_i = _fold(dRO_v, dRO_i,
                             W[:, S_half + RO] + logpLOgLO + lpe[:, RO],
                             jnp.full((B,), S_half + RO, jnp.int32))
        WiH = gather_col(Wi, hap_len)
        lpeH = gather_col(lpe, hap_len)
        dRO_v, dRO_i = _fold(dRO_v, dRO_i,
                             WiH + logpFirstgLO + lpeH, S_half + hap_len)
        src_idx = jnp.maximum(x_idx - 1, 0)
        srcWi = jnp.take_along_axis(
            Wi, jnp.broadcast_to(src_idx, (B, S_half)), axis=1)
        cand = srcWi + lpe
        dx_v, dx_i = _fold(dx_v, dx_i, cand,
                           S_half + jnp.broadcast_to(src_idx, (B, S_half)))
        di_v = Wi + logpInsgIns
        di_i = idx_base[:, S_half:]
        open_cand = Wn + logpNoInsgIns
        open_ok = (x_idx >= 1)
        di_v, di_i = _fold(di_v, di_i,
                           jnp.where(open_ok, open_cand, NEGBIG),
                           jnp.where(open_ok, idx_base[:, :S_half], di_i))
        noins_v = dx_v.at[:, 0].set(d0_v).at[:, RO].set(dRO_v)
        noins_i = dx_i.at[:, 0].set(d0_i).at[:, RO].set(dRO_i)
        newA = jnp.concatenate([noins_v, di_v], axis=1)
        newI = jnp.concatenate([noins_i, di_i], axis=1)
        newA = jnp.where(live2, newA, NEGBIG)
        newI = jnp.where(live2, newI, idx_base)
        return newA, newI

    # Inc pass (FBMaxErr::passMessageTwoInc, ObservationModelFB.cpp:1715-1773)
    def inc_step(Bt, O):
        W = Bt + O
        Wn = W[:, :S_half]
        Wi = W[:, S_half:]
        WnRO = Wn[:, RO][:, None]
        Vn_core = jnp.where(xs_state <= hl, Wn, WnRO)
        Vn = jnp.concatenate(
            [Vn_core, jnp.broadcast_to(WnRO, (B, numT)).astype(dtype)], axis=1)
        x_idx = xs_state
        d0_v = jnp.full((B,), NEGBIG, dtype=dtype)
        d0_i = jnp.zeros((B,), jnp.int32)
        d0_v, d0_i = _fold(d0_v, d0_i,
                           W[:, 0] + logpLOgLO + logpNoInsgNoIns,
                           jnp.zeros((B,), jnp.int32))
        d0_v, d0_i = _fold(d0_v, d0_i,
                           W[:, 1] + logpFirstgLO + logpNoInsgNoIns,
                           jnp.ones((B,), jnp.int32))
        dx_v = jnp.full((B, S_half), NEGBIG, dtype=dtype)
        dx_i = idx_base[:, :S_half]
        for y in range(1, numT):
            srcW = lax.dynamic_slice_in_dim(Vn, y, S_half, axis=1)
            src_lpn = lax.dynamic_slice_in_dim(lpnV, y, S_half, axis=1)
            src_lpe = lax.dynamic_slice_in_dim(lpeV, y, S_half, axis=1)
            src_i = lax.dynamic_slice_in_dim(idxV, y, S_half, axis=1)
            lp = src_lpn if y == 1 else (src_lpe + (y - 1) * logpInsgIns)
            cand = lp + src_lpn + srcW
            dx_v, dx_i = _fold(dx_v, dx_i, cand, src_i)
        dRO_v = jnp.full((B,), NEGBIG, dtype=dtype)
        dRO_i = jnp.full((B,), RO, jnp.int32)
        dRO_v, dRO_i = _fold(dRO_v, dRO_i, W[:, RO] + lpn[:, RO],
                             jnp.full((B,), RO, jnp.int32))
        lpe_x1 = jnp.concatenate(
            [lpe[:, 1:], jnp.zeros((B, 1), dtype)], axis=1)
        cost = jnp.where(x_idx == RO, jnp.zeros((), dtype), lpe_x1)
        cand = Wi + cost
        dx_v, dx_i = _fold(dx_v, dx_i, cand, S_half + idx_base[:, :S_half])
        dx0_v, dx0_i = _fold(d0_v, d0_i, cand[:, 0],
                             jnp.full((B,), S_half + 0, jnp.int32))
        dxRO_v, dxRO_i = _fold(dRO_v, dRO_i, cand[:, RO],
                               jnp.full((B,), S_half + RO, jnp.int32))
        di_v = Wi + logpInsgIns
        di_i = idx_base[:, S_half:]
        di0_v, di0_i = _fold(di_v[:, 0], di_i[:, 0],
                             Wn[:, 0] + logpNoInsgIns,
                             jnp.zeros((B,), jnp.int32))
        srcW = lax.dynamic_slice_in_dim(Vn, 1, S_half, axis=1)
        src_i = lax.dynamic_slice_in_dim(idxV, 1, S_half, axis=1)
        exit_ok = x_idx >= 1
        di_v, di_i = _fold(di_v, di_i,
                           jnp.where(exit_ok, srcW + logpNoInsgIns, NEGBIG),
                           jnp.where(exit_ok, src_i, di_i))
        di_v = di_v.at[:, 0].set(di0_v)
        di_i = di_i.at[:, 0].set(di0_i)
        noins_v = dx_v.at[:, 0].set(dx0_v).at[:, RO].set(dxRO_v)
        noins_i = dx_i.at[:, 0].set(dx0_i).at[:, RO].set(dxRO_i)
        newB = jnp.concatenate([noins_v, di_v], axis=1)
        newI = jnp.concatenate([noins_i, di_i], axis=1)
        newB = jnp.where(live2, newB, NEGBIG)
        newI = jnp.where(live2, newI, idx_base)
        return newB, newI

    zero_state = jnp.zeros((B, S), dtype=dtype)
    idx_base16 = idx_base.astype(jnp.int16)

    def fwd_body(carry, b):
        A, a_mid = carry
        O = obs_slice(b - 1)
        newA, btf_b = dec_step(A, O)
        a_mid = jnp.where((b_mid == b)[:, None], newA, a_mid)
        return (newA, a_mid), btf_b.astype(jnp.int16)

    (_, alpha_mid), btf = lax.scan(
        fwd_body, (zero_state, zero_state), jnp.arange(1, L_pad))

    def bwd_body(carry, b):
        Bt, b_mid_acc = carry
        O = obs_slice(b)
        newB, btb_b = inc_step(Bt, O)
        pad = ((b - 1) >= (read_len - 1))[:, None]
        newB = jnp.where(pad, zero_state, newB)
        btb_b = jnp.where(pad, idx_base, btb_b)
        b_mid_acc = jnp.where((b_mid == (b - 1))[:, None], newB, b_mid_acc)
        return (newB, b_mid_acc), btb_b.astype(jnp.int16)

    (_, beta_mid), btb_rev = lax.scan(
        bwd_body, (zero_state, zero_state), jnp.arange(L_pad - 1, 0, -1))
    beta_mid = jnp.where((b_mid == (L_pad - 1))[:, None], zero_state, beta_mid)
    btb = btb_rev[::-1]
    return alpha_mid, beta_mid, btf, btb


@partial(jax.jit, static_argnames=("H_pad", "L_pad", "exact_ties"))
def _finish(H_pad, L_pad, b_mid,
            alpha_mid, beta_mid, obs_mid, prior_rmq, prior_hmq, btf, btb,
            exact_ties=True):
    """bMid-slice likelihood folds (calcLikelihoodFromLastSlice,
    ObservationModelFB.cpp:1075-1144) + MAP-state reconstruction.

    exact_ties=True emulates the reference's order-dependent EPS-guarded
    fold (:1096-1117) with a sequential lax.scan over all 2*(H_pad+2)
    states.  exact_ties=False replaces it with a parallel first-occurrence
    argmax: the fold's `v > ll + EPS` guard degenerates to a strict `>`
    whenever EPS (1e-10) is below one ulp of the running maximum — true in
    float32 for any |ll| >= ~0.01, i.e. every realistic log-likelihood —
    and a strict-> fold with first-index-wins ties IS argmax.  Same
    deviation class as the Pallas kernel's fast fold."""
    B = b_mid.shape[0]
    S_half = H_pad + 2
    S = 2 * S_half
    RO = H_pad + 1
    dtype = alpha_mid.dtype

    base = alpha_mid + obs_mid + beta_mid
    vr = base + prior_rmq
    vh = base + prior_hmq

    if not exact_ties:
        map_rmq = jnp.argmax(vr, axis=1).astype(jnp.int32)
        ll = jnp.max(vr, axis=1)
        s_mid = jnp.argmax(vh, axis=1).astype(jnp.int32)
        ll_hmq = jnp.max(vh, axis=1)
        xm = jnp.arange(S, dtype=jnp.int32) % S_half
        is0 = (xm == 0)[None, :]
        isRO = (xm == RO)[None, :]
        neginf = jnp.array(-jnp.inf, dtype=dtype)
        ll_off = jnp.max(jnp.where(is0, vr, neginf), axis=1)
        ll_on = jnp.max(jnp.where(is0 | isRO, neginf, vr), axis=1)
    else:
        def lik_fold(carry, x):
            ll, idxR, llH, idxH, off0, off1 = carry
            v = vr[:, x]
            w = vh[:, x]
            takeR = v > ll + EPS
            ll = jnp.where(takeR, v, ll)
            idxR = jnp.where(takeR, x, idxR)
            takeH = w > llH + EPS
            llH = jnp.where(takeH, w, llH)
            idxH = jnp.where(takeH, x, idxH)
            xm = x % S_half
            is0 = xm == 0
            isRO = xm == RO
            off0 = jnp.where(is0 & (v > off0), v, off0)
            off1 = jnp.where((~is0) & (~isRO) & (v > off1), v, off1)
            return (ll, idxR, llH, idxH, off0, off1), None

        neg = jnp.full((B,), -jnp.inf, dtype=dtype)
        zero_i = jnp.zeros((B,), jnp.int32)
        (ll, map_rmq, ll_hmq, s_mid, ll_off, ll_on), _ = lax.scan(
            lik_fold, (neg, zero_i, neg, zero_i, neg, neg),
            jnp.arange(S, dtype=jnp.int32), unroll=8)

    def down_body(cur, t):
        b = t
        bt_b = btf[b - 1].astype(jnp.int32)
        nxt = jnp.take_along_axis(bt_b, cur[:, None], axis=1)[:, 0]
        cur2 = jnp.where(b <= b_mid, nxt, cur)
        return cur2, cur2

    _, down_states = lax.scan(down_body, s_mid,
                              jnp.arange(L_pad - 1, 0, -1))
    down_states = down_states[::-1]

    def up_body(cur, b):
        bt_b = btb[b].astype(jnp.int32)
        nxt = jnp.take_along_axis(bt_b, cur[:, None], axis=1)[:, 0]
        cur2 = jnp.where(b >= b_mid, nxt, cur)
        return cur2, cur2

    _, up_states = lax.scan(up_body, s_mid, jnp.arange(0, L_pad - 1))

    b_axis = jnp.arange(L_pad, dtype=jnp.int32)[None, :]
    ms_down = jnp.concatenate([down_states.transpose(1, 0),
                               s_mid[:, None]], axis=1)
    ms_up = jnp.concatenate([s_mid[:, None],
                             up_states.transpose(1, 0)], axis=1)
    map_state = jnp.where(b_axis < b_mid[:, None], ms_down,
                          jnp.where(b_axis > b_mid[:, None], ms_up,
                                    s_mid[:, None]))

    off_hap_hmq = ((s_mid % S_half) == 0) | ((s_mid % S_half) == RO)
    off_hap = ((map_rmq % S_half) == 0) | ((map_rmq % S_half) == RO)
    return ll, off_hap, off_hap_hmq, ll_off, ll_on, map_state


def compute_obs_mid(pk: dict) -> np.ndarray:
    """Observation potentials at each pair's bMid slice, host-side
    (setupReadObservationPotentials at one slice)."""
    B = pk["hap_len"].shape[0]
    H_pad = pk["H_pad"]
    S_half = H_pad + 2
    bm = pk["b_mid"]
    rows = np.arange(B)
    e = pk["eq"][rows, bm][:, None]
    u = pk["uq"][rows, bm][:, None]
    rb = pk["read_codes"][rows, bm][:, None]
    mismatch = (pk["hap_codes"] != rb) & (pk["hap_codes"] != ord("N"))
    on = np.where(mismatch, u, e)
    noins = np.concatenate([e, on, e * np.ones((B, 1))], axis=1)
    ins = np.broadcast_to(e, (B, S_half))
    return np.concatenate([noins, ins], axis=1).astype(pk["eq"].dtype)


_DP_IMPLS = {}


def get_dp_impl(name: str):
    if name == "xla":
        return _dp_xla
    if name == "pallas":
        from .pallas_kernel import dp_pallas
        return dp_pallas
    raise ValueError(name)


def run_packed(pk: dict, dp_impl: str = "xla", exact_ties: bool = None):
    """Run DP + finish on a packed dict; returns device outputs
    (ll, off_hap, off_hap_hmq, ll_off, ll_on, map_state).

    exact_ties=None picks per impl: XLA (the float64 oracle-parity path)
    keeps the exact sequential likelihood fold; Pallas (the f32 production
    path, whose DP fold is already fast-tie) uses the parallel argmax
    finish."""
    if exact_ties is None:
        exact_ties = (dp_impl == "xla")
    dp = get_dp_impl(dp_impl)
    alpha_mid, beta_mid, btf, btb = dp(
        pk["H_pad"], pk["L_pad"], pk["numT"],
        jnp.asarray(pk["hap_len"]), jnp.asarray(pk["read_len"]),
        jnp.asarray(pk["b_mid"]), jnp.asarray(pk["read_codes"]),
        jnp.asarray(pk["hap_codes"]), jnp.asarray(pk["eq"]),
        jnp.asarray(pk["uq"]), jnp.asarray(pk["lpe"]), jnp.asarray(pk["lpn"]),
        jnp.asarray(pk["lpeV"]), jnp.asarray(pk["lpnV"]),
        jnp.asarray(pk["scalars"]))
    obs_mid = jnp.asarray(compute_obs_mid(pk))
    return _finish(pk["H_pad"], pk["L_pad"], jnp.asarray(pk["b_mid"]),
                   alpha_mid, beta_mid, obs_mid,
                   jnp.asarray(pk["prior_rmq"]), jnp.asarray(pk["prior_hmq"]),
                   btf, btb, exact_ties=exact_ties)


def pack_pairs(haps: List[Haplotype], reads: List[Read], hap_start: int,
               p: ObservationModelParameters, dtype=np.float64,
               bucket: int = 16, H_pad: int = None, L_pad: int = None) -> dict:
    """Pack a window's (haps x reads) pairs into the fixed-layout arrays
    consumed by the DP kernels. Returns a dict incl. static dims."""
    nh, nr = len(haps), len(reads)
    H_max = max(h.size() for h in haps)
    L_max = max(r.size() for r in reads)
    if H_pad is None:
        H_pad = _round_up(H_max, bucket)
    if L_pad is None:
        L_pad = _round_up(max(L_max, 2), bucket)
    numT = p.max_length_del + 2
    S_half = H_pad + 2
    S = 2 * S_half
    B = nh * nr
    dt = dtype

    hap_len = np.zeros(B, np.int32)
    read_len = np.zeros(B, np.int32)
    b_mid = np.zeros(B, np.int32)
    read_codes = np.zeros((B, L_pad), np.uint8)
    hap_codes = np.zeros((B, H_pad), np.uint8)
    eq = np.zeros((B, L_pad), dt)
    uq = np.zeros((B, L_pad), dt)
    lpe = np.full((B, S_half), math.log(1e-5), dt)
    lpn = np.full((B, S_half), math.log(1 - 1e-5), dt)
    prior_rmq = np.zeros((B, S), dt)
    prior_hmq = np.zeros((B, S), dt)

    hap_arrs = []
    for h in haps:
        e_, n_ = hp_log_prob_error(h.seq)
        hap_arrs.append((e_, n_))
    tr_dummy = _Trans(p, haps[0].seq)

    for hi, hap in enumerate(haps):
        Hh = hap.size()
        if p.max_length_del > Hh:
            raise ValueError("hapSize error.")
        hseq = np.frombuffer(hap.seq.encode(), np.uint8)
        e_, n_ = hap_arrs[hi]
        for ri, r in enumerate(reads):
            i = hi * nr + ri
            hap_len[i] = Hh
            L = r.size()
            read_len[i] = L
            bm = compute_b_mid(r, hap_start, Hh, p.b_mid)
            b_mid[i] = bm
            read_codes[i, :L] = np.frombuffer(r.seq.encode(), np.uint8)
            hap_codes[i, :Hh] = hseq
            pr = np.asarray(r.qual, np.float64) * (1.0 - p.p_mut)
            eq[i, :L] = np.log(0.25 + 0.75 * pr)
            uq[i, :L] = np.log(0.75 + 1e-10 - 0.75 * pr)
            lpe[i, :Hh + 2] = e_
            lpn[i, :Hh + 2] = n_
            pr_r = compute_b_mid_prior(tr_dummy, r, hap_start, Hh, p,
                                       r.map_qual, bm)
            pr_h = compute_b_mid_prior(tr_dummy, r, hap_start, Hh, p,
                                       1.0 - 1e-10, bm)
            prior_rmq[i] = _expand_prior(pr_r, Hh, H_pad)
            prior_hmq[i] = _expand_prior(pr_h, Hh, H_pad)

    # V-arrays: lpe/lpn with indices beyond Hh clamped to the per-hap RO
    lpeV = np.zeros((B, S_half + numT), dt)
    lpnV = np.zeros((B, S_half + numT), dt)
    for i in range(B):
        Hh = hap_len[i]
        ROi = Hh + 1
        core_e = np.full(S_half + numT, lpe[i, ROi])
        core_n = np.full(S_half + numT, lpn[i, ROi])
        core_e[:Hh + 1] = lpe[i, :Hh + 1]
        core_n[:Hh + 1] = lpn[i, :Hh + 1]
        lpeV[i] = core_e
        lpnV[i] = core_n
        if ROi != H_pad + 1:
            lpe[i, H_pad + 1] = lpe[i, ROi]
            lpn[i, H_pad + 1] = lpn[i, ROi]

    scalars = np.array([math.log(1.0 - p.p_first_g_lo),
                        math.log(p.p_first_g_lo),
                        -0.5,
                        math.log(1.0 - math.exp(-0.5)),
                        math.log(1.0 - p.p_error)], dt)
    return dict(H_pad=H_pad, L_pad=L_pad, numT=numT, nh=nh, nr=nr,
                hap_len=hap_len, read_len=read_len, b_mid=b_mid,
                read_codes=read_codes, hap_codes=hap_codes, eq=eq, uq=uq,
                lpe=lpe, lpn=lpn, lpeV=lpeV, lpnV=lpnV,
                prior_rmq=prior_rmq, prior_hmq=prior_hmq, scalars=scalars)


class BatchedPairHMM:
    """Window-level driver: packs haps/reads, runs the kernels (bucketed
    by padded shapes), converts back to MLAlignment."""

    def __init__(self, params: ObservationModelParameters,
                 dtype=np.float64, bucket: int = 16, dp_impl: str = "xla"):
        self.params = params
        self.dtype = dtype
        self.bucket = bucket
        self.dp_impl = dp_impl

    def compute(self, haps: List[Haplotype], reads: List[Read],
                hap_start: int) -> List[List[MLAlignment]]:
        p = self.params
        nh, nr = len(haps), len(reads)
        if nh == 0 or nr == 0:
            return [[]]
        if self.dp_impl == "pallas":
            # lane-aligned state axis (S_half % 128 == 0) for the fused
            # TPU kernel
            H_max = max(h.size() for h in haps)
            H_pad_c = _round_up(H_max + 2, 128) - 2
            L_max = max(r.size() for r in reads)
            L_pad_c = _round_up(max(L_max, 2), 128)
            pk = pack_pairs(haps, reads, hap_start, p, self.dtype,
                            H_pad=H_pad_c, L_pad=L_pad_c)
        else:
            pk = pack_pairs(haps, reads, hap_start, p, self.dtype, self.bucket)
        H_pad = pk["H_pad"]

        (ll, off_hap, off_hap_hmq, ll_off, ll_on, map_state) = run_packed(
            pk, self.dp_impl)
        ll = np.asarray(ll)
        off_hap = np.asarray(off_hap)
        off_hap_hmq = np.asarray(off_hap_hmq)
        ll_off = np.asarray(ll_off)
        ll_on = np.asarray(ll_on)
        map_state = np.asarray(map_state)

        liks: List[List[MLAlignment]] = []
        for hi, hap in enumerate(haps):
            row = []
            Hh = hap.size()
            numS = Hh + 2
            ROh = Hh + 1
            S_half_f = H_pad + 2
            for ri, r in enumerate(reads):
                i = hi * nr + ri
                L = r.size()
                ms_fixed = map_state[i, :L]
                ins = ms_fixed >= S_half_f
                x = ms_fixed % S_half_f
                x = np.where(x == H_pad + 1, ROh, x)
                ms = np.where(ins, numS + x, x).astype(np.int32)
                ml = MLAlignment()
                ml.ll = float(ll[i])
                ml.off_hap = bool(off_hap[i])
                ml.off_hap_hmq = bool(off_hap_hmq[i])
                ml.ll_off = float(ll_off[i])
                ml.ll_on = float(ll_on[i])
                _report_variants(ml, ms, hap, r, p, numS, ROh)
                row.append(ml)
            liks.append(row)
        return liks


def _expand_prior(pr: np.ndarray, Hh: int, H_pad: int) -> np.ndarray:
    """Per-hap prior (2*(Hh+2),) -> fixed layout (2*(H_pad+2),)."""
    numS = Hh + 2
    S_half = H_pad + 2
    out = np.full(2 * S_half, NEGBIG)
    for i in range(2):
        out[i * S_half:i * S_half + Hh + 1] = pr[i * numS:i * numS + Hh + 1]
        out[i * S_half + H_pad + 1] = pr[i * numS + Hh + 1]
    return out
