"""Pallas kernel for the adaptive FIR predictor (encode, static order).

The recurrence is sequential over the sample axis, so each grid step
processes an (8, 128)-lane tile (full native VPU shape) over a chunk of
the sample axis, with the 17 lagged samples + coefficient rows carried in
registers inside the chunk and persisted across chunks in VMEM scratch.
Grid = (lane_tiles, sample_chunks), sample chunks iterating fastest.
Semantics are bit-identical to ops/predict.pc_block with a static
``numactive`` (same branchless early-exit masking; the defining scalar
reference is alacjax/oracle/dp.py :: pc_block, i.e. dp_enc.c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import kALACMaxCoefs
from ..jaxutils import I32

LANE_TILE = 1024          # 8 x 128 lanes per grid step
S_CHUNK = 512             # samples per grid step (2 MB per in/out block)


def _sign(x):
    return jnp.sign(x).astype(I32)


def _sext(x, bits: int):
    sh = 32 - bits
    return jnp.right_shift(jnp.left_shift(x, sh), sh)


def _kernel(x_ref, c_ref, out_ref, cout_ref, state_ref, *,
            order, chanbits, denshift, n_chunks):
    denhalf = jnp.int32(1 << (denshift - 1))
    sc = pl.program_id(1)

    # chunk 0: seed state from the transmitted coefficients; the lag slots
    # hold arbitrary data (warm-up masking makes them semantically dead)
    @pl.when(sc == 0)
    def _():
        for k in range(order):
            state_ref[k, :, :] = c_ref[k, 0, :, :]
        for j in range(order + 1):
            state_ref[kALACMaxCoefs + j, :, :] = x_ref[0, :, :]

    coefs0 = tuple(state_ref[k, :, :] for k in range(order))
    lags0 = tuple(state_ref[kALACMaxCoefs + j, :, :] for j in range(order + 1))

    def step(i, carry):
        lags = carry[:order + 1]
        coefs = carry[order + 1:]
        t = sc * S_CHUNK + i            # absolute sample index
        x_t = x_ref[i, :, :]
        top = lags[order]

        sum1 = denhalf
        for k in range(order):
            sum1 = sum1 + coefs[k] * (lags[k] - top)
        pred_adj = jnp.right_shift(sum1, denshift)

        out_gen = _sext(x_t - top - pred_adj, chanbits)
        out_warm = _sext(x_t - lags[0], chanbits)
        in_warm = t <= order
        out = jnp.where(t == 0, x_t, jnp.where(in_warm, out_warm, out_gen))
        out_ref[i, :, :] = out

        adapt = jnp.logical_not(in_warm)
        sg = _sign(out_gen)
        del0 = out_gen
        new_coefs = list(coefs)
        for k in range(order - 1, -1, -1):
            # boolean-valued select is unsupported by Mosaic (i1 trunc);
            # express the early-exit predicate with logical ops instead
            going = ((sg > 0) & (del0 > 0)) | ((sg < 0) & (del0 < 0))
            active = adapt & going
            dd = top - lags[k]
            sgn = _sign(dd)
            upd = jnp.where(sg > 0, -sgn, sgn)
            new_coefs[k] = _sext(coefs[k] + jnp.where(active, upd, 0), 16)
            mag = sgn * dd
            term = jnp.where(sg > 0,
                             jnp.right_shift(mag, denshift),
                             jnp.right_shift(-mag, denshift))
            del0 = del0 - jnp.where(active, (order - k) * term, 0)

        new_lags = (x_t,) + lags[:-1]
        return new_lags + tuple(new_coefs)

    final = jax.lax.fori_loop(0, S_CHUNK, step, lags0 + coefs0)

    # persist state for the next chunk
    for k in range(order):
        state_ref[k, :, :] = final[order + 1 + k]
    for j in range(order + 1):
        state_ref[kALACMaxCoefs + j, :, :] = final[j]

    @pl.when(sc == n_chunks - 1)
    def _():
        for k in range(order):
            cout_ref[k, 0, :, :] = final[order + 1 + k]
        for k in range(order, kALACMaxCoefs):
            cout_ref[k, 0, :, :] = c_ref[k, 0, :, :]


def pc_block_pallas(x, coefs0, order: int, chanbits: int, denshift: int = 9,
                    interpret: bool = False):
    """(B, S) samples -> (residuals (B, S), coefs_out (B, 16)).

    Static-order encode predictor; B must be a multiple of LANE_TILE and
    S of S_CHUNK (callers pad).  Bit-identical to ops/predict.pc_block.
    """
    B, S = x.shape
    if B % LANE_TILE or S % S_CHUNK:
        raise ValueError(f"B={B} needs %{LANE_TILE}==0, S={S} %{S_CHUNK}==0")
    G = B // 128
    xt = x.astype(I32).T.reshape(S, G, 128)          # (S, lane-groups, 128)
    ct = coefs0.astype(I32).T.reshape(kALACMaxCoefs, 1, G, 128)

    kern = functools.partial(_kernel, order=order, chanbits=chanbits,
                             denshift=denshift, n_chunks=S // S_CHUNK)
    grid = (B // LANE_TILE, S // S_CHUNK)
    out_t, cout_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S_CHUNK, 8, 128), lambda i, s: (s, i, 0)),
            pl.BlockSpec((kALACMaxCoefs, 1, 8, 128), lambda i, s: (0, 0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((S_CHUNK, 8, 128), lambda i, s: (s, i, 0)),
            pl.BlockSpec((kALACMaxCoefs, 1, 8, 128), lambda i, s: (0, 0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, G, 128), jnp.int32),
            jax.ShapeDtypeStruct((kALACMaxCoefs, 1, G, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kALACMaxCoefs + kALACMaxCoefs + 1, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(xt, ct)
    res = out_t.reshape(S, B).T
    cout = cout_t.reshape(kALACMaxCoefs, B).T
    return res, cout
