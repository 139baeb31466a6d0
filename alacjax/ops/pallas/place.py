"""Pallas TPU kernel: segment placer (packet assembly v3).

Takes the encoder's per-lane segments — phase-0 relative Rice streams
straight out of the in-search emission, plus dense header/shift/escape
field blocks — and assembles the final packet word image entirely in
VMEM:

  per segment: densify (radix compaction over the emission slots)
   -> insert the partial tail word -> funnel-shift by start&31
   -> word-shift by start>>5 (conditional power-of-2 shifts on the
      per-lane offset bits) -> masked OR into the output accumulator.

HBM sees each operand once and the output once; every shuffle round is
VMEM traffic.  Replaces both the standalone Rice emission scan and the
keyed chunk merge (see bitpack.place_segments for the contract and the
XLA fallback used by the CPU test tier).

Reference: bit-serial BitBuffer writes in codec/ALACEncoder.cpp ::
EncodeStereo; no scalar counterpart to the placement algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32


def _pad128(x, fill=0):
    T = x.shape[1]
    Tp = -(-T // 128) * 128
    if Tp == T:
        return x
    return jnp.pad(x, ((0, 0), (0, Tp - T)),
                   constant_values=x.dtype.type(fill))


def _shift_cols_left(x, p: int):
    R, T = x.shape
    if p >= T:
        return jnp.zeros_like(x)
    return jnp.concatenate(
        [x[:, p:], jnp.zeros((R, p), dtype=x.dtype)], axis=1)


def _shift_cols_right(x, p: int):
    R, T = x.shape
    if p >= T:
        return jnp.zeros_like(x)
    return jnp.concatenate(
        [jnp.zeros((R, p), dtype=x.dtype), x[:, :-p]], axis=1)


def _compact(vals, emit_i32, T: int):
    """LSB-first radix compaction: i-th emitted slot -> column i."""
    ne = emit_i32
    c = ne
    p = 1
    while p < T:
        c = c + _shift_cols_right(c, p)
        p <<= 1
    c_ex = c - ne
    j = jax.lax.broadcasted_iota(I32, vals.shape, 1)
    nonempty = ne != 0
    rem = jnp.where(nonempty, j - c_ex, 0)
    val = jnp.where(nonempty, vals, jnp.uint32(0))
    p = 1
    while p < T:
        pi = jnp.int32(p)
        move = (rem & pi) != 0
        stay_v = jnp.where(move, jnp.uint32(0), val)
        stay_r = jnp.where(move, 0, rem)
        arr_v = _shift_cols_left(jnp.where(move, val, jnp.uint32(0)), p)
        arr_m = _shift_cols_left(jnp.where(move, jnp.int32(1), 0), p)
        arr_r = _shift_cols_left(jnp.where(move, rem, 0), p)
        val = stay_v | arr_v
        rem = jnp.where(arr_m != 0, arr_r - pi, stay_r)
        p <<= 1
    return val


def _place(img, start, mask, Wp: int):
    """Funnel-shift a phase-0 image by start&31, word-shift by start>>5,
    mask per lane.  img: (R, Tseg), zero above its content bits;
    start/mask: (R, 1).  Returns (R, Wp)."""
    R, Tseg = img.shape
    phase = (start & 31).astype(U32)           # (R, 1)
    prev = _shift_cols_right(img, 1)
    hi = jnp.where(phase == 0, jnp.uint32(0),
                   jnp.left_shift(prev, (np.uint32(32) - phase) %
                                  np.uint32(32)))
    lo = jnp.where(phase == 0, img, jnp.right_shift(img, phase))
    placed = hi | lo
    # spill word: the last word's bits that crossed into word Tseg
    spill = jnp.where(phase == 0, jnp.uint32(0),
                      jnp.left_shift(img[:, Tseg - 1:Tseg],
                                     (np.uint32(32) - phase) %
                                     np.uint32(32)))
    if Tseg < Wp:
        placed = jnp.concatenate(
            [placed, spill,
             jnp.zeros((R, Wp - Tseg - 1), U32)], axis=1)
    else:
        placed = placed[:, :Wp]
    d = (start >> 5).astype(I32)               # (R, 1)
    p = 1
    while p < Wp:
        pi = jnp.int32(p)
        placed = jnp.where((d & pi) != 0, _shift_cols_right(placed, p),
                           placed)
        p <<= 1
    return jnp.where(mask != 0, placed, jnp.uint32(0))


def _make_kernel(descs, Wp: int):
    def kernel(*refs):
        scal_ref = refs[0]
        out_ref = refs[-1]
        scal = scal_ref[:]                       # (R, n_scal_pad) i32
        acc = jnp.zeros(out_ref.shape, U32)
        i = 1
        for desc in descs:
            c = desc["scol"]
            start = scal[:, c:c + 1]
            mask = scal[:, c + 1:c + 2]
            if desc["kind"] == "sparse":
                vals_ref, emit_ref = refs[i:i + 2]
                i += 2
                nbits = scal[:, c + 2:c + 3]
                tail = jax.lax.bitcast_convert_type(
                    scal[:, c + 3:c + 4], jnp.uint32)
                T = vals_ref.shape[1]
                dense = _compact(vals_ref[:], emit_ref[:], T)
                dense = dense[:, :desc["cap_words"]]
                wt = nbits >> 5                  # (R, 1)
                jcol = jax.lax.broadcasted_iota(I32, dense.shape, 1)
                dense = dense | jnp.where(jcol == wt, tail, jnp.uint32(0))
                acc = acc | _place(dense, start, mask, Wp)
            else:
                img_ref = refs[i]
                i += 1
                acc = acc | _place(img_ref[:], start, mask, Wp)
        out_ref[:] = acc
    return kernel


def place_segments_pallas(segments, num_words: int, rows: int = 8):
    B = segments[0]["start"].shape[0]
    Wp = -(-num_words // 128) * 128
    assert B % rows == 0

    descs = []
    operands = []
    in_specs = []
    scal_cols = []

    def add(arr):
        operands.append(arr)
        in_specs.append(pl.BlockSpec((rows, arr.shape[1]),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))

    def col(x, dtype=I32, bitcast=False):
        x = jnp.asarray(x)
        if bitcast:
            x = jax.lax.bitcast_convert_type(x.astype(U32), I32)
        else:
            x = x.astype(dtype)
        if x.ndim == 0:
            x = jnp.broadcast_to(x, (B,))
        return x

    for seg in segments:
        kind = seg.get("kind", "dense")
        scol = len(scal_cols)
        scal_cols.append(col(seg["start"]))
        scal_cols.append(col(seg["mask"]))
        if kind == "sparse":
            scal_cols.append(col(seg["nbits"]))
            scal_cols.append(col(seg["tail"], bitcast=True))
            cap = -(-seg["cap_words"] // 128) * 128
            descs.append(dict(kind="sparse", scol=scol,
                              cap_words=min(cap, Wp)))
            add(_pad128(seg["vals"].astype(U32)))
            add(_pad128(seg["emit"].astype(jnp.int32)))
        else:
            descs.append(dict(kind="dense", scol=scol))
            add(_pad128(seg["img"].astype(U32)))

    scal = jnp.stack(scal_cols, axis=1)
    scal = _pad128(scal)
    out = pl.pallas_call(
        _make_kernel(descs, Wp),
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, scal.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + in_specs,
        out_specs=pl.BlockSpec((rows, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wp), jnp.uint32),
    )(scal, *operands)
    return out[:, :num_words]
