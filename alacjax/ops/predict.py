"""Batched adaptive FIR predictor on device (oracle: alacjax.oracle.dp;
reference: codec/dp_enc.c / dp_dec.c).

The per-frame recurrence is irreducibly sequential in the sample axis, so
it runs as a `lax.scan` over S steps, each step a full-width VPU op across
the B frame-lanes (SURVEY.md §5 sequence-parallel row).  The reference's
data-dependent early-exit coefficient walk becomes a branchless masked
update: each of the 16 tap iterations computes its activity predicate
(k < numactive, error still on the original side) and applies a masked
+/-1 coefficient step — bit-identical to the sequential walk because the
mask reproduces the exact break condition.

``numactive`` may be a static python int (encoder: candidate orders) or a
per-lane (B,) array (decoder: orders arrive in the stream).  Per-lane
values are supported for 0, 1..16, and 31; 17..30 (format-legal but never
emitted by our encoder or the reference's) are rejected host-side and
routed to the oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import kALACMaxCoefs
from .jaxutils import I32, sign_extend, sign_of_int

_W = kALACMaxCoefs + 1  # window: in[j-1] .. in[j-17]


def _scan_general(x_sb, coefs0, na, chanbits, denshift, *, decode: bool):
    """Shared general-mode scan.  x_sb: (S, B) time-major input (samples on
    encode, residuals on decode).  Returns (out (S, B), coefs (B, 16))."""
    S, B = x_sb.shape
    static_na = isinstance(na, int)
    na_v = jnp.full((B,), na, dtype=I32) if static_na else na.astype(I32)
    denshift = jnp.asarray(denshift, dtype=I32)
    # denshift == 0 is only reachable from invalid streams (the decoder
    # flags such lanes and overlays the oracle); clamp to avoid a
    # negative shift in the masked-off lanes
    denshift = jnp.maximum(denshift, 1)
    denhalf = jnp.left_shift(jnp.int32(1), denshift - 1).astype(I32)

    window0 = jnp.zeros((B, _W), dtype=I32)
    ts = jnp.arange(S, dtype=I32)

    def step(carry, inp):
        window, coefs = carry
        x_t, t = inp

        if static_na:
            top = window[:, na]
        else:
            top = jnp.take_along_axis(window, na_v[:, None], axis=1)[:, 0]

        # prediction: int32 wraparound accumulate, arithmetic shift
        sum1 = jnp.broadcast_to(denhalf, (B,)).astype(I32)
        for k in range(kALACMaxCoefs):
            if static_na and k >= na:
                break
            term = coefs[:, k] * (window[:, k] - top)
            if static_na:
                sum1 = sum1 + term
            else:
                sum1 = sum1 + jnp.where(k < na_v, term, 0)
        pred_adj = jnp.right_shift(sum1, denshift)

        if decode:
            out_gen = sign_extend(x_t + top + pred_adj, chanbits)
            out_warm = sign_extend(x_t + window[:, 0], chanbits)
            err = x_t                      # residual drives adaptation
        else:
            out_gen = sign_extend(x_t - top - pred_adj, chanbits)
            out_warm = sign_extend(x_t - window[:, 0], chanbits)
            err = out_gen

        out = jnp.where(t == 0, x_t, jnp.where(t <= na_v, out_warm, out_gen))

        # sign-sign adaptation with branchless early exit
        adapt = t > na_v
        sg = sign_of_int(err)
        del0 = err
        new_cols = []
        for k in range(kALACMaxCoefs - 1, -1, -1):
            if static_na and k >= na:
                new_cols.append(coefs[:, k])
                continue
            going = jnp.where(sg > 0, del0 > 0, del0 < 0)
            active = adapt & (sg != 0) & going & (k < na_v)
            dd = top - window[:, k]
            sgn = sign_of_int(dd)
            upd = jnp.where(sg > 0, -sgn, sgn)
            col = sign_extend(coefs[:, k] + jnp.where(active, upd, 0), 16)
            new_cols.append(col)
            mag = sgn * dd                      # |dd|
            term = jnp.where(sg > 0,
                             jnp.right_shift(mag, denshift),
                             jnp.right_shift(-mag, denshift))
            del0 = del0 - jnp.where(active, (na_v - k) * term, 0)
        coefs = jnp.stack(new_cols[::-1], axis=1)

        new_sample = out if decode else x_t
        window = jnp.concatenate([new_sample[:, None], window[:, :-1]], axis=1)
        return (window, coefs), out

    (_, coefs_out), out_sb = jax.lax.scan(
        step, (window0, coefs0.astype(I32)), (x_sb, ts))
    return out_sb, coefs_out


def _mode31(x, chanbits, decode: bool):
    """First-order difference special mode (numactive == 31)."""
    x = x.astype(I32)
    if decode:
        # cumulative sum mod 2^32, then clamp to chanbits: equivalent to the
        # per-step sign-extend because both agree mod 2^chanbits
        return sign_extend(jnp.cumsum(x, axis=1, dtype=I32), chanbits)
    first = x[:, :1]
    diffs = sign_extend(x[:, 1:] - x[:, :-1], chanbits)
    return jnp.concatenate([first, diffs], axis=1)


def _run(x, coefs0, numactive, chanbits, denshift, decode: bool):
    x = x.astype(I32)
    B, S = x.shape
    if coefs0 is None:
        coefs0 = jnp.zeros((B, kALACMaxCoefs), dtype=I32)

    if isinstance(numactive, int):
        if numactive == 0:
            return x, coefs0.astype(I32)
        if numactive == 31:
            return _mode31(x, chanbits, decode), coefs0.astype(I32)
        out_sb, coefs = _scan_general(
            x.T, coefs0, numactive, chanbits, denshift, decode=decode)
        return out_sb.T, coefs

    # per-lane numactive: run the general scan with na clamped into range,
    # then overlay the special modes
    na = numactive.astype(I32)
    na_eff = jnp.clip(na, 1, kALACMaxCoefs)
    out_sb, coefs = _scan_general(
        x.T, coefs0, na_eff, chanbits, denshift, decode=decode)
    out = out_sb.T
    m31 = _mode31(x, chanbits, decode)
    is0 = (na == 0)[:, None]
    is31 = (na == 31)[:, None]
    out = jnp.where(is0, x, jnp.where(is31, m31, out))
    return out, coefs


def pc_block(x, coefs0, numactive, chanbits, denshift=9):
    """Batched forward prediction: (B, S) samples -> (residuals, coefs_out)."""
    return _run(x, coefs0, numactive, chanbits, denshift, decode=False)


def unpc_block(res, coefs0, numactive, chanbits, denshift=9):
    """Batched inverse prediction: (B, S) residuals -> (samples, coefs_out)."""
    return _run(res, coefs0, numactive, chanbits, denshift, decode=True)
