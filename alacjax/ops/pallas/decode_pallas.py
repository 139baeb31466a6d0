"""Pallas kernel for the fused Rice-decode + inverse-predictor scan.

Same motivation as cost_pallas.py / emit_pallas.py: the decode scan's
XLA while body fragments into ~40 kLoop fusions per iteration and the
loop is launch-bound (docs/PERF_NOTES.md roofline note), so the decode
scan was the largest remaining gap to its compute floor (~6x).  Unlike
the encode scans, decode cannot run as ONE kernel launch: the bit
cursor's word fetch is a per-lane dynamic gather from the (B, W) packet
image, Mosaic has no per-lane cross-tile gather, and the image itself
does not fit VMEM at production shapes.  The structure here instead
amortizes the launch cost K steps at a time:

  * the outer ``lax.scan`` runs ceil(n_steps/K) iterations; each body is
    ONE XLA row-gather plus ONE Mosaic kernel call (vs ~40 fusions per
    step before);
  * the fixed-rate refill bound (fused_decode module docstring) means
    the rows any lane can need during the next K steps are exactly the
    next K*r_rows rows past its cache — so the XLA gather prefetches
    them in one take() BEFORE the kernel, with the same total gather
    traffic as the per-step refill (stalled lanes re-fetch overlapping
    rows either way);
  * inside the kernel the cache+lookahead window lives in VMEM scratch;
    each inner step runs the G substeps (Rice codeword + zero-run +
    cascade + FIR + coefficient adaptation) and then shifts the window
    by the per-lane row drift with selects — bit-identical to the XLA
    scan's refill, including the drift/underrun error flags.

Semantics are bit-identical to ops/fused_decode.decode_channel (the
defining scalar references are alacjax/oracle/ag.py :: dyn_decomp and
alacjax/oracle/dp.py :: unpc_block — ag_dec.c / dp_dec.c); tests assert
equality in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import (
    MAX_PREFIX_16, MAX_PREFIX_32, MMULSHIFT, N_MAX_MEAN_CLAMP,
    N_MEAN_CLAMP_VAL, PBSHIFT, QB, QBSHIFT,
)
from ..jaxutils import I32, U32, iota1
from .cost_pallas import LANE_TILE, _clz32, _lg3a, _sext, _sign

import numpy as np

_U1 = np.uint32(1)


def _lane_tile(Bp_min: int) -> int:
    """Lanes per grid step.  Grid steps run SEQUENTIALLY on the core, and
    the decode chain is latency-bound, so a small tile serializes the
    whole chain once per tile (measured: 3x SLOWER than the XLA scan at
    B=4096 with the 1024-lane tile).  A wide tile instead gives every
    vector op lane_rows/8 independent vregs to pipeline — the same
    latency chain amortizes across lanes.  Bounded by VMEM (the window
    scratch + look/out blocks scale with lane_rows; see _k_steps)."""
    env = os.environ.get("ALACJAX_DECODE_LT")
    cap = int(env) if env else 4096
    t = LANE_TILE
    while t < min(Bp_min, cap):
        t *= 2
    return min(t, cap)


def _k_steps(lane_rows: int) -> int:
    """Inner steps per kernel launch.  Flat in throughput from K=8..256
    (measured); sized so the VMEM window scratch + lookahead/output
    blocks stay ~<10 MB at the chosen lane tile."""
    env = os.environ.get("ALACJAX_DECODE_K")
    if env:
        return max(1, int(env))
    return max(8, 512 // lane_rows)


def _win_read32(ws, off):
    """32 bits at bit offset ``off`` (0..95) within the 128-bit window
    (fused_decode._win_read32, Mosaic-safe)."""
    idx = off >> 5
    a = jnp.where(idx == 0, ws[0], jnp.where(idx == 1, ws[1], ws[2]))
    b = jnp.where(idx == 0, ws[1], jnp.where(idx == 1, ws[2], ws[3]))
    sh = (off & 31).astype(U32)
    return jnp.where(sh == 0, a,
                     jnp.left_shift(a, sh) | jnp.right_shift(b, (32 - sh) & 31))


def _win_bits(ws, off, nbits):
    stream = _win_read32(ws, off)
    nb = jnp.asarray(nbits, dtype=U32)
    nb_c = jnp.where(nb >= 32, jnp.uint32(31), nb)    # Mosaic: no minui
    mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                     jnp.left_shift(_U1, nb_c) - 1)
    return jnp.right_shift(stream, (jnp.uint32(32) - nb) & 31) & mask


def _fetch_window4(vals, rel, max_rel, cache_words):
    """Select 4 consecutive cache words starting at ``rel`` (0..max_rel).

    Two-stage radix-8 variant of fused_decode._fetch_window4: stage A
    tree-selects rows r=rel>>3 and r+1 (16 words) over the <=6 row
    candidates the reach bound allows; stage B selects the 4-word window
    at lo=rel&7 within those 16.  Same values as the flat binary tree
    (both only differ on rel > max_rel, which the refill invariant rules
    out), at ~100 selects per fetch instead of ~340 — the fetch tree was
    ~60% of the kernel's measured step cost.
    """
    nrow = cache_words // 8
    rows = [tuple(vals[8 * i + j] for j in range(8)) for i in range(nrow)]
    r = rel >> 3
    lo = rel & 7
    r_max = min((max_rel + 3) >> 3, nrow - 1)
    need = 2
    bit = 1
    while bit <= r_max:
        need += bit
        bit <<= 1
    cand = [rows[min(i, nrow - 1)] for i in range(need)]
    bit = 1
    while bit <= r_max:
        take = (r & bit) != 0
        cand = [tuple(jnp.where(take, h, l) for h, l in
                      zip(cand[i + bit], cand[i]))
                for i in range(len(cand) - bit)]
        bit <<= 1
    w16 = list(cand[0]) + list(cand[1])
    wc = w16[:11]                      # lo <= 7, window 4 -> 11 candidates
    bit = 1
    while bit <= 7:
        take = (lo & bit) != 0
        wc = [jnp.where(take, wc[i + bit], wc[i])
              for i in range(len(wc) - bit)]
        bit <<= 1
    return tuple(wc[:4])


def _decode_kernel(state_ref, cache_ref, look_ref, prm_ref, out_ref,
                   stout_ref, cout_ref, win_ref, *, nk, G, K, cb_max, kb,
                   wb, r_rows, rel0, cache_words, max_adv, lane_rows):
    """One K-step block of the fused decode scan for one lane tile.

    state rows (i32): 0 bitpos, 1 mb, 2 zmode, 3 run_rem, 4 c, 5 err,
    6 blk_base, 7..7+nk lags, 8+nk..7+2nk coefs, 8+2nk s1_acc,
    9+2nk acc31.  prm rows: 0 chanbits, 1 pb, 2 na, 3 den, 4 mode,
    5 num.  The window scratch holds cache_words + 8*r_rows*K u32
    words per lane; its valid prefix shrinks by the per-lane shift each
    step and is exactly cache_words at block end (written to cout).
    """
    WIN = cache_words + 8 * r_rows * K
    _dbg = os.environ.get("ALACJAX_DKDBG", "").split(",")

    # window scratch <- current cache + the XLA-gathered lookahead rows
    win_ref[0:cache_words] = cache_ref[:]
    win_ref[cache_words:WIN] = look_ref[:]

    chanbits = prm_ref[0, :, :]
    pb_v = prm_ref[1, :, :].astype(U32)
    na = prm_ref[2, :, :]
    den = prm_ref[3, :, :]
    mode_nz = prm_ref[4, :, :] != 0
    num = prm_ref[5, :, :]

    na_k = jnp.where(na >= 1, na, 1)                  # clip(na,1,30) then
    na_k = jnp.where(na_k <= nk, na_k, nk)            # min with tap bound
    denhalf = jnp.left_shift(jnp.int32(1), den - 1)
    is0 = na == 0
    is31 = na == 31
    zero = jnp.zeros((lane_rows, 128), I32)

    def substep(st, vals, g):
        """fused_decode._rice_substep + the fused predictor, one sample."""
        (bitpos, mb, zmode, run_rem, c, err, blk_base) = st[:7]
        lags = st[7:8 + nk]
        coefs = st[8 + nk:8 + 2 * nk]
        s1_acc, acc31 = st[8 + 2 * nk], st[9 + 2 * nk]

        active = c < num
        in_run = run_rem > 0
        decode_now = active & ~in_run

        off0 = bitpos - (blk_base << 5)
        max_rel = min(cache_words - 4, rel0 + (g * max_adv + 31) // 32)
        if "nofetch" in _dbg:
            ws = tuple(vals[j] for j in range(4))
        else:
            ws = _fetch_window4(vals, off0 >> 5, max_rel, cache_words)
        woff = off0 & 31

        m0 = mb >> QBSHIFT
        k = jnp.minimum(_lg3a(m0), kb)
        m = jnp.left_shift(_U1, k.astype(U32)) - 1

        stream = _win_read32(ws, woff)
        pre = _clz32(~stream)
        esc = pre >= MAX_PREFIX_32
        v = jnp.right_shift(jnp.left_shift(stream, (pre + 1).astype(U32) & 31),
                            ((32 - k) & 31).astype(U32))
        use_v = (k != 1) & ~esc
        vge2 = v >= 2
        n_plain = (pre.astype(U32) * m
                   + jnp.where(use_v & vge2, v - 1, jnp.uint32(0)))
        adv_plain = pre + 1 + jnp.where(use_v, jnp.where(vge2, k, k - 1), 0)
        raw = _win_bits(ws, woff + MAX_PREFIX_32, chanbits)
        n = jnp.where(esc, raw, n_plain)
        adv = jnp.where(esc, MAX_PREFIX_32 + chanbits, adv_plain)

        ndecode = n + zmode
        half = (ndecode >> 1).astype(I32)
        delta = jnp.where((ndecode & 1) == 1, -(half + 1), half)

        c1 = c + 1
        mb_upd = (pb_v * ndecode + mb - ((pb_v * mb) >> PBSHIFT)).astype(U32)
        mb_upd = jnp.where(n > jnp.uint32(N_MAX_MEAN_CLAMP),
                           jnp.uint32(N_MEAN_CLAMP_VAL), mb_upd)

        trigger = decode_now & ((mb_upd << MMULSHIFT) < QB) & (c1 < num)

        if "norun" in _dbg:
            nz = jnp.zeros((lane_rows, 128), U32)
            adv2 = jnp.zeros((lane_rows, 128), I32)
            esc2 = pre >= 99
        kz = (_clz32(mb_upd) - 24
              + ((mb_upd + jnp.uint32(16)) >> 6).astype(I32))
        mz = (jnp.left_shift(_U1, kz.astype(U32)) - 1) & jnp.uint32(wb)
        off2 = woff + adv
        stream2 = _win_read32(ws, off2)
        pre2 = _clz32(~stream2)
        esc2 = pre2 >= MAX_PREFIX_16
        v2 = jnp.right_shift(
            jnp.left_shift(stream2, (pre2 + 1).astype(U32) & 31),
            ((32 - kz) & 31).astype(U32))
        v2ge2 = v2 >= 2
        mz1 = jnp.where(mz == 0, _U1, mz)             # Mosaic: no maxui
        nz_plain = (pre2.astype(U32) * mz1
                    + jnp.where((kz != 1) & v2ge2, v2 - 1, jnp.uint32(0)))
        adv2_plain = pre2 + 1 + jnp.where(kz != 1,
                                          jnp.where(v2ge2, kz, kz - 1), 0)
        raw2 = _win_bits(ws, off2 + MAX_PREFIX_16, 16)
        if "norun" not in _dbg:
            nz = jnp.where(esc2, raw2, nz_plain)
            adv2 = jnp.where(esc2, MAX_PREFIX_16 + 16, adv2_plain)

        overrun = trigger & (c1.astype(U32) + nz > num.astype(U32))
        err = err | overrun.astype(I32)
        nz_safe = jnp.where(overrun, jnp.uint32(0), nz)

        res = jnp.where(decode_now, delta, zero)
        run_rem2 = jnp.where(active,
                             jnp.where(in_run, run_rem - 1,
                                       jnp.where(trigger, nz_safe,
                                                 jnp.uint32(0))),
                             run_rem)
        zmode2 = jnp.where(decode_now,
                           jnp.where(trigger & (nz_safe < 65535) & ~overrun,
                                     _U1, jnp.uint32(0)), zmode)
        mb2 = jnp.where(decode_now,
                        jnp.where(trigger, jnp.uint32(0), mb_upd), mb)
        bitpos2 = jnp.where(decode_now,
                            bitpos + adv + jnp.where(trigger, adv2, 0),
                            bitpos)
        c2 = jnp.where(active, c1, c)

        if "nofir" in _dbg:
            st2 = ((bitpos2, mb2, zmode2, run_rem2, c2, err, blk_base)
                   + lags + coefs + (s1_acc, acc31))
            return st2, res
        # ---- fused predictor (dp_dec.c :: unpc_block + mode-31) ----
        s1_acc2 = jnp.where(active, s1_acc + res, s1_acc)
        x_t = jnp.where(mode_nz, _sext(s1_acc2, chanbits), res)

        top = zero
        for i in range(nk + 1):
            top = jnp.where(na_k == i, lags[i], top)
        in_warm = c <= na_k

        sum1 = denhalf
        for kk in range(nk):
            term = coefs[kk] * (lags[kk] - top)
            sum1 = sum1 + jnp.where(kk < na_k, term, 0)
        pred_adj = jnp.right_shift(sum1, den)
        out_gen = _sext(x_t + top + pred_adj, chanbits)
        out_warm = _sext(x_t + lags[0], chanbits)
        out = jnp.where(c == 0, x_t, jnp.where(in_warm, out_warm, out_gen))

        adapt = active & ~in_warm
        sg = _sign(x_t)
        del0 = x_t
        new_coefs = list(coefs)
        for kk in range(nk - 1, -1, -1):
            going = ((sg > 0) & (del0 > 0)) | ((sg < 0) & (del0 < 0))
            act_k = adapt & going & (kk < na_k)
            dd = top - lags[kk]
            sgn = _sign(dd)
            upd = jnp.where(sg > 0, -sgn, sgn)
            new_coefs[kk] = _sext(coefs[kk] + jnp.where(act_k, upd, 0), 16)
            mag = sgn * dd
            term = jnp.where(sg > 0, jnp.right_shift(mag, den),
                             jnp.right_shift(-mag, den))
            del0 = del0 - jnp.where(act_k, (na_k - kk) * term, 0)

        acc31_2 = jnp.where(active, acc31 + x_t, acc31)
        out = jnp.where(is0, x_t,
                        jnp.where(is31, _sext(acc31_2, chanbits), out))

        new_lags = tuple(jnp.where(active, vv, old)
                         for vv, old in zip((out,) + lags[:-1], lags))
        new_coefs = tuple(jnp.where(active, vv, old)
                          for vv, old in zip(new_coefs, coefs))
        st2 = ((bitpos2, mb2, zmode2, run_rem2, c2, err, blk_base)
               + new_lags + new_coefs + (s1_acc2, acc31_2))
        return st2, out

    def step(kstep, st):
        if "novals" in _dbg:
            vals = [win_ref[0, :, :].astype(U32)] * cache_words
        else:
            vals = [win_ref[j, :, :].astype(U32) for j in range(cache_words)]
        outs = []
        for g in range(G):
            if "nosub" in _dbg:
                out = st[0]
            else:
                st, out = substep(st, vals, g)
            outs.append(out)
        if "noout" not in _dbg:
            for g in range(G):
                out_ref[kstep * G + g, :, :] = outs[g]
        # per-lane window shift == the XLA scan's fixed-rate refill
        bitpos, blk_base = st[0], st[6]
        rel = (bitpos >> 5) - blk_base
        kshift = jnp.clip(rel >> 3, 0, r_rows)
        underrun = (rel - (kshift << 3)) > rel0
        err2 = st[5] | underrun.astype(I32)
        blk_base2 = blk_base + (kshift << 3)
        for i in range(0 if "noshift" in _dbg else (WIN - 8 * r_rows)):
            w = win_ref[i, :, :]
            for ks in range(1, r_rows + 1):
                w = jnp.where(kshift == ks, win_ref[i + 8 * ks, :, :], w)
            win_ref[i, :, :] = w
        return st[:5] + (err2, blk_base2) + st[7:]

    st0 = tuple(state_ref[r, :, :] for r in range(10 + 2 * nk))
    st0 = (st0[0], st0[1].astype(U32), st0[2].astype(U32),
           st0[3].astype(U32)) + st0[4:]
    stf = jax.lax.fori_loop(0, K, step, st0)
    stf = (stf[0], stf[1].astype(I32), stf[2].astype(I32),
           stf[3].astype(I32)) + stf[4:]
    for r in range(10 + 2 * nk):
        stout_ref[r, :, :] = stf[r]
    cout_ref[:] = win_ref[0:cache_words]


@functools.partial(
    jax.jit,
    static_argnames=("nk", "G", "K", "cb_max", "kb", "wb", "r_rows",
                     "rel0", "cache_words", "max_adv", "lt", "interpret"))
def _decode_pallas_call(state, cache, look, prm, *, nk, G, K, cb_max, kb,
                        wb, r_rows, rel0, cache_words, max_adv, lt,
                        interpret=False):
    NS, Bp = state.shape
    Gl = Bp // 128
    LOOKW = 8 * r_rows * K
    WIN = cache_words + LOOKW
    lane_rows = lt // 128

    st_t = state.reshape(NS, Gl, 128)
    ca_t = cache.reshape(cache_words, Gl, 128)
    lk_t = look.reshape(LOOKW, Gl, 128)
    pr_t = prm.reshape(6, Gl, 128)

    kern = functools.partial(
        _decode_kernel, nk=nk, G=G, K=K, cb_max=cb_max, kb=kb, wb=wb,
        r_rows=r_rows, rel0=rel0, cache_words=cache_words, max_adv=max_adv,
        lane_rows=lane_rows)
    grid = (Bp // lt,)
    outs, stout, cout = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NS, lane_rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((cache_words, lane_rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((LOOKW, lane_rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((6, lane_rows, 128), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K * G, lane_rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((NS, lane_rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((cache_words, lane_rows, 128), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K * G, Gl, 128), jnp.int32),
            jax.ShapeDtypeStruct((NS, Gl, 128), jnp.int32),
            jax.ShapeDtypeStruct((cache_words, Gl, 128), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((WIN, lane_rows, 128), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(st_t, ca_t, lk_t, pr_t)
    return (outs.reshape(K * G, Bp), stout.reshape(NS, Bp),
            cout.reshape(cache_words, Bp))


def decode_channel_pallas(words, start_bits, num_samples: int, chanbits,
                          mb0: int, pb, kb: int, wb: int, coefs0, mode,
                          numactive, denshift, cb_max: int, taps: int,
                          num=None, G: int = 8, interpret: bool = False):
    """Drop-in for fused_decode.decode_channel (raw=False, static taps):
    (B, W) words -> (samples (B, S) i32, end_bits (B,) i32, err (B,) bool).
    """
    B, W = words.shape
    S = num_samples
    nk = taps
    LT = _lane_tile(B)
    K = _k_steps(LT // 128)

    # geometry — must mirror fused_decode.decode_channel exactly
    max_adv = MAX_PREFIX_32 + cb_max + MAX_PREFIX_16 + 16
    max_codeword = max(MAX_PREFIX_32 - 1 + 1 + kb, MAX_PREFIX_32 + cb_max)
    r_rows = -(-G * max_codeword // 256)
    rel0 = 8 * (r_rows + 1)
    max_w = (G * max_adv + 31) // 32
    cache_words = -(-(rel0 + max_w + 4) // 8) * 8
    n_rows = cache_words // 8
    n_steps = -(-S // G)
    n_outer = -(-n_steps // K)
    LOOKR = r_rows * K

    Bp = -(-B // LT) * LT
    pad = Bp - B

    W8 = (W + 7) // 8
    wpad = words if W8 * 8 == W else jnp.pad(words, ((0, 0),
                                                     (0, W8 * 8 - W)))
    rows = wpad.reshape(B * W8, 8)
    lane_idx = jnp.minimum(iota1(Bp), B - 1)
    lane_row0 = lane_idx * W8

    def gather_rows(row_idx):
        """(Bp, R) absolute per-lane row indices -> (R*8, Bp) words."""
        idx = lane_row0[:, None] + jnp.clip(row_idx, 0, W8 - 1)
        r = jnp.take(rows, idx, axis=0)               # (Bp, R, 8)
        return r.reshape(Bp, -1).T

    def lane_vec(v, pad_val, cast=I32):
        v = jnp.broadcast_to(jnp.asarray(v, cast), (B,))
        if pad:
            v = jnp.concatenate([v, jnp.full((pad,), pad_val, cast)])
        return v

    start_p = lane_vec(start_bits, 0)
    base0 = (start_p >> 5) & ~jnp.int32(7)
    base_row0 = base0 >> 3

    cache0 = gather_rows(base_row0[:, None] + iota1(n_rows)[None, :])
    cache0 = cache0.astype(U32)

    prm = jnp.stack([
        lane_vec(chanbits, cb_max),
        lane_vec(pb, 40),
        lane_vec(numactive, 0),
        jnp.maximum(lane_vec(denshift, 1), 1),
        lane_vec(mode, 0),
        lane_vec(S if num is None else num, 0),
    ], axis=0)

    coefs0_arr = jnp.asarray(coefs0, I32)
    if pad:
        coefs0_arr = jnp.concatenate(
            [coefs0_arr, jnp.zeros((pad, coefs0_arr.shape[1]), I32)], axis=0)
    coef_rows = [coefs0_arr[:, k] if k < coefs0_arr.shape[1]
                 else jnp.zeros((Bp,), I32) for k in range(nk)]

    zero = jnp.zeros((Bp,), I32)
    state0 = jnp.stack(
        [start_p, jnp.full((Bp,), mb0, I32), zero, zero, zero, zero, base0]
        + [zero] * (nk + 1) + coef_rows + [zero, zero], axis=0)

    def body(carry, _):
        state, cache = carry
        base_row = state[6] >> 3
        look = gather_rows(base_row[:, None] + n_rows
                           + iota1(LOOKR)[None, :]).astype(U32)
        outs, state2, cache2 = _decode_pallas_call(
            state, cache, look, prm, nk=nk, G=G, K=K, cb_max=cb_max,
            kb=kb, wb=wb, r_rows=r_rows, rel0=rel0,
            cache_words=cache_words, max_adv=max_adv, lt=LT,
            interpret=interpret)
        return (state2, cache2), outs

    (statef, _), ys = jax.lax.scan(body, (state0, cache0), None,
                                   length=n_outer)
    samples = ys.reshape(n_outer * K * G, Bp).T[:B, :S]
    return samples, statef[0][:B], statef[5][:B] != 0
