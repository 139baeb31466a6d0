"""Grouped block-cache Rice decoder (imported by alacjax.ops.rice).

Per-lane gathers are the dominant cost of decode on TPU (cost ~ per-op
constant + elements), so the scan processes G samples per step from a
24-word per-lane cache (tuple of (B,) vectors — shifts are SSA renaming)
and refills with exactly two aligned 8-word row gathers per step: gather
ops per sample drop from 4+ to 2/G.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..types import (
    MAX_PREFIX_16, MAX_PREFIX_32, MMULSHIFT, N_MAX_MEAN_CLAMP,
    N_MEAN_CLAMP_VAL, PBSHIFT, QB, QBSHIFT,
)
from .jaxutils import I32, U32, clz32, iota1, lg3a

# numpy scalar, NOT jnp: a module-level jnp array becomes a hoisted
# executable constant, which this jax build loses on repeat calls
_U32_ONE = np.uint32(1)
_CACHE_WORDS = 24
_MAX_REL = 20  # rel stays <= 7 + ceil(G*max_adv/32) <= 20 by construction


def _cache_read32(blk, rel, phase):
    """32 bits at word offset ``rel`` (+1) and bit phase within the cache."""
    a = blk[0]
    b = blk[1]
    for j in range(1, _MAX_REL + 1):
        hit = rel == j
        a = jnp.where(hit, blk[j], a)
        b = jnp.where(hit, blk[j + 1], b)
    return jnp.where(phase == 0, a,
                     jnp.left_shift(a, phase)
                     | jnp.right_shift(b, (32 - phase) % 32))


def _cache_bits(blk, bitoff, blk_base_bits, nbits):
    """Read nbits (<=32, per-lane) at absolute bit offset ``bitoff``."""
    off = bitoff - blk_base_bits
    stream = _cache_read32(blk, (off >> 5).astype(I32), (off & 31).astype(U32))
    nb = jnp.asarray(nbits, dtype=U32)
    nb_c = jnp.minimum(nb, jnp.uint32(31))
    mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                     jnp.left_shift(_U32_ONE, nb_c) - 1)
    return jnp.right_shift(stream, (32 - nb) % 32) & mask


def decode_scan(words, start_bits, num_samples: int, bit_size,
                mb0: int, pb, kb: int, wb: int, max_bit_size: int = 32):
    """See alacjax.ops.rice.rice_decode (same contract)."""
    B, W = words.shape
    S = num_samples
    bit_size = jnp.broadcast_to(jnp.asarray(bit_size, dtype=I32), (B,))

    max_adv = MAX_PREFIX_32 + max_bit_size + MAX_PREFIX_16 + 16
    G = max(1, min(8, 416 // max_adv))
    n_steps = -(-S // G)

    W8 = (W + 7) // 8
    if W8 * 8 != W:
        words = jnp.pad(words, ((0, 0), (0, W8 * 8 - W)))
    rows = words.reshape(B * W8, 8)
    lane_row0 = iota1(B) * W8

    def fetch_row(row_idx):
        r = jnp.take(rows, lane_row0 + jnp.clip(row_idx, 0, W8 - 1), axis=0)
        return tuple(r[:, i] for i in range(8))

    start_bits = jnp.asarray(start_bits, I32)
    base0 = (start_bits >> 5) & ~jnp.int32(7)
    blk0 = fetch_row(base0 >> 3) + fetch_row((base0 >> 3) + 1) \
        + fetch_row((base0 >> 3) + 2)

    pb_v = jnp.asarray(pb, dtype=U32)

    def one_sample(st, blk, blk_base):
        bitpos, mb, c, zmode, err = st
        active = c < S
        blk_base_bits = blk_base * 32

        m0 = mb >> QBSHIFT
        k = jnp.minimum(lg3a(m0), kb)
        m = jnp.left_shift(_U32_ONE, k.astype(U32)) - 1

        off = bitpos - blk_base_bits
        stream = _cache_read32(blk, (off >> 5).astype(I32),
                               (off & 31).astype(U32))
        pre = clz32(~stream)
        esc = pre >= MAX_PREFIX_32
        v = jnp.right_shift(jnp.left_shift(stream, (pre + 1).astype(U32)),
                            ((32 - k) % 32).astype(U32))
        use_v = (k != 1) & ~esc
        vge2 = v >= 2
        n_plain = (pre.astype(U32) * m
                   + jnp.where(use_v & vge2, v - 1, jnp.uint32(0)))
        adv_plain = pre + 1 + jnp.where(use_v, jnp.where(vge2, k, k - 1), 0)
        raw = _cache_bits(blk, bitpos + MAX_PREFIX_32, blk_base_bits, bit_size)
        n = jnp.where(esc, raw, n_plain)
        adv = jnp.where(esc, MAX_PREFIX_32 + bit_size, adv_plain)

        ndecode = n + zmode
        half = (ndecode >> 1).astype(I32)
        delta = jnp.where((ndecode & 1) == 1, -(half + 1), half)

        c1 = c + 1
        mb_upd = (pb_v * ndecode + mb - ((pb_v * mb) >> PBSHIFT)).astype(U32)
        mb_upd = jnp.where(n > N_MAX_MEAN_CLAMP,
                           jnp.uint32(N_MEAN_CLAMP_VAL), mb_upd)
        mb1 = jnp.where(active, mb_upd, mb)

        trigger = active & ((mb1 << MMULSHIFT) < QB) & (c1 < S)
        # zero-run parameters from the collapsed mean
        kz = (clz32(mb1) - 24
              + ((mb1 + jnp.uint32(16)) >> 6).astype(I32))
        mz = (jnp.left_shift(_U32_ONE, kz.astype(U32)) - 1) & jnp.uint32(wb)

        off2 = bitpos + adv - blk_base_bits
        stream2 = _cache_read32(blk, (off2 >> 5).astype(I32),
                                (off2 & 31).astype(U32))
        pre2 = clz32(~stream2)
        esc2 = pre2 >= MAX_PREFIX_16
        v2 = jnp.right_shift(jnp.left_shift(stream2, (pre2 + 1).astype(U32)),
                             ((32 - kz) % 32).astype(U32))
        v2ge2 = v2 >= 2
        nz_plain = (pre2.astype(U32) * jnp.maximum(mz, _U32_ONE)
                    + jnp.where((kz != 1) & v2ge2, v2 - 1, jnp.uint32(0)))
        adv2_plain = pre2 + 1 + jnp.where(kz != 1,
                                          jnp.where(v2ge2, kz, kz - 1), 0)
        raw2 = _cache_bits(blk, bitpos + adv + MAX_PREFIX_16,
                           blk_base_bits, 16)
        nz = jnp.where(esc2, raw2, nz_plain)
        adv2 = jnp.where(esc2, MAX_PREFIX_16 + 16, adv2_plain)

        overrun = trigger & (c1.astype(U32) + nz > S)
        err = err | overrun
        nz_safe = jnp.where(overrun, jnp.uint32(0), nz)

        c2 = jnp.where(active, jnp.where(trigger, c1 + nz_safe.astype(I32), c1),
                       c)
        zmode2 = jnp.where(active,
                           jnp.where(trigger & (nz_safe < 65535) & ~overrun,
                                     jnp.uint32(1), jnp.uint32(0)), zmode)
        mb2 = jnp.where(trigger, jnp.uint32(0), mb1)
        bitpos2 = jnp.where(active,
                            bitpos + adv + jnp.where(trigger, adv2, 0), bitpos)
        emit_idx = jnp.where(active, c, S)
        return (bitpos2, mb2, c2, zmode2, err), emit_idx, delta

    def step(state, _):
        st = state[:5]
        blk_base = state[5]
        blk = state[6:]
        idxs, deltas = [], []
        for _g in range(G):
            st, ei, dv = one_sample(st, blk, blk_base)
            idxs.append(ei)
            deltas.append(dv)

        # refill: shift by 8k (k in 0..2), always fetch the next two rows
        rel = (st[0] >> 5) - blk_base
        kshift = jnp.clip(rel >> 3, 0, 2)
        ext = blk + fetch_row((blk_base >> 3) + 3) + fetch_row(
            (blk_base >> 3) + 4)
        blk2 = []
        for i in range(_CACHE_WORDS):
            w = ext[i]
            w = jnp.where(kshift == 1, ext[i + 8], w)
            w = jnp.where(kshift == 2, ext[i + 16], w)
            blk2.append(w)
        blk_base2 = blk_base + 8 * kshift
        return (st + (blk_base2,) + tuple(blk2),
                (tuple(idxs), tuple(deltas)))

    state0 = (start_bits.astype(I32), jnp.full((B,), mb0, dtype=U32),
              jnp.zeros((B,), dtype=I32), jnp.zeros((B,), dtype=U32),
              jnp.zeros((B,), dtype=bool), base0) + blk0
    final_state, (idxs, deltas) = jax.lax.scan(
        step, state0, None, length=n_steps)
    end_bits, err = final_state[0], final_state[4]

    idx = jnp.stack(idxs, axis=1).reshape(n_steps * G, B)
    vals = jnp.stack(deltas, axis=1).reshape(n_steps * G, B)

    def scatter_lane(i, v):
        return jnp.zeros((S,), dtype=I32).at[i].set(v, mode="drop")

    res = jax.vmap(scatter_lane)(idx.T, vals.T)
    return res, end_bits, err
