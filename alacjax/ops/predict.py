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

Performance shape: the scan carry is a *tuple of (B,) vectors* (17 lagged
samples + 16 coefficient columns), so the per-step "window shift" is pure
SSA renaming — zero data movement — and every op in the body is a plain
elementwise op on (B,) lanes.  A (B, 17) window with per-step concatenate
costs ~10x in loop overhead.

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

# Scan unroll factor: 4 is the measured sweet spot on TPU; the CPU test
# tier sets ALACJAX_SCAN_UNROLL=1 because XLA CPU compile time scales
# with the unrolled body size (results are bit-identical either way).
# Read lazily at trace time so late os.environ updates (e.g. the
# multichip dryrun's setdefault) take effect even if this module was
# imported earlier in the process.
import os as _os


def _unroll() -> int:
    return int(_os.environ.get("ALACJAX_SCAN_UNROLL", "4"))


def _scan_general(x_sb, coefs0, na, chanbits, denshift, *, decode: bool,
                  cost_params=None, dual_cost: bool = False,
                  na_max: int | None = None, num=None):
    """Shared general-mode scan.  x_sb: (S, B) time-major input (samples on
    encode, residuals on decode).  Returns (out (S, B), coefs (B, 16)) or,
    with cost_params=(mb0, pb, kb, wb) on encode, (out, coefs, cost_bits):
    the adaptive-Rice bit cost of the residual stream accumulates inside
    the SAME scan (rice._encode_step_tokens length logic; the codeword
    values are dead code XLA eliminates), so the encoder's candidate
    search runs one fused scan per candidate instead of two.

    dual_cost=True additionally runs a SECOND Rice cost machine over the
    first-difference of the residual stream (the stage-2 / mode!=0
    cascade candidate, dp_enc.c :: pc_block numactive==31 applied to the
    FIR residuals) and returns (out, coefs, cost_bits, cost2_bits) — the
    whole order x stage candidate grid then costs one scan per order.

    ``num`` (per-lane (B,), <= S) restricts the COST machines to the
    first ``num`` samples of each lane — partial (tail) frames batch
    with full frames (reference: ALACEncoder.cpp partial-frame Encode).
    The predictor walk itself needs no mask: residuals below num are
    causal in the input, and post-num adaptation only affects coefs_out,
    which tails (always a stream's last packet) never commit."""
    S, B = x_sb.shape
    static_na = isinstance(na, int)
    na_v = None if static_na else na.astype(I32)
    denshift = jnp.asarray(denshift, dtype=I32)
    # denshift == 0 only reachable from invalid streams (flagged upstream)
    denshift = jnp.maximum(denshift, 1)
    denhalf = jnp.left_shift(jnp.int32(1), denshift - 1).astype(I32)

    zero = jnp.zeros((B,), dtype=I32)
    coefs0_i = coefs0.astype(I32)

    # per-lane na: the tap loop and the ``top`` lag select only need to
    # reach the static *maximum* order present (callers pass na_max; the
    # encoder's search grid is orders {4, 8}, so 8 instead of 16 — the
    # same specialization the fused decode scan applies via its na<=8
    # branch).  Bit-identical: lanes never index past their own na.
    nk = na if static_na else (na_max if na_max is not None
                               else kALACMaxCoefs)
    # carry sized to the order bound, not the format maximum: nk+1 lag
    # registers + nk coefficient columns instead of 17+16.  The scan
    # carry round-trips HBM once per loop iteration, so for the
    # production search (nk=8) this cuts the dominant per-step memory
    # traffic by a third; columns >= nk are never touched by the
    # adaptation walk and rejoin unchanged after the scan.
    nw = nk + 1
    lags0 = (zero,) * nw
    coef_cols0 = tuple(coefs0_i[:, k] for k in range(nk))
    if cost_params is not None:
        assert not decode
        from . import rice as rice_mod
        mb0_c, pb_c, kb_c, wb_c = cost_params
    S_eff = S if num is None else num.astype(I32)

    nc = nw + nk + 1  # core carry slots

    def step(carry, inp):
        if cost_params is not None:
            rice_state, total = carry[nc:nc + 5], carry[nc + 5]
            if dual_cost:
                prev_out = carry[nc + 6]
                rice2, total2 = carry[nc + 7:nc + 12], carry[nc + 12]
            carry = carry[:nc]
        lags, coefs, t = carry[:nw], carry[nw:nw + nk], carry[-1]
        x_t = inp

        if static_na:
            top = lags[na]
            in_warm = t <= na
        else:
            top = zero
            for i in range(nk + 1):
                top = jnp.where(na_v == i, lags[i], top)
            in_warm = t <= na_v

        sum1 = denhalf
        for k in range(nk):
            term = coefs[k] * (lags[k] - top)
            sum1 = sum1 + (term if static_na else jnp.where(k < na_v, term, 0))
        pred_adj = jnp.right_shift(sum1, denshift)

        if decode:
            out_gen = sign_extend(x_t + top + pred_adj, chanbits)
            out_warm = sign_extend(x_t + lags[0], chanbits)
            err = x_t                      # residual drives adaptation
        else:
            out_gen = sign_extend(x_t - top - pred_adj, chanbits)
            out_warm = sign_extend(x_t - lags[0], chanbits)
            err = out_gen

        out = jnp.where(t == 0, x_t, jnp.where(in_warm, out_warm, out_gen))

        # sign-sign adaptation with branchless early exit
        adapt = ~in_warm
        sg = sign_of_int(err)
        del0 = err
        new_coefs = list(coefs)
        for k in range(nk - 1, -1, -1):
            going = jnp.where(sg > 0, del0 > 0, del0 < 0)
            active = adapt & (sg != 0) & going
            if not static_na:
                active = active & (k < na_v)
            dd = top - lags[k]
            sgn = sign_of_int(dd)
            upd = jnp.where(sg > 0, -sgn, sgn)
            new_coefs[k] = sign_extend(coefs[k] + jnp.where(active, upd, 0), 16)
            mag = sgn * dd                      # |dd|
            term = jnp.where(sg > 0,
                             jnp.right_shift(mag, denshift),
                             jnp.right_shift(-mag, denshift))
            weight = (na - k) if static_na else (na_v - k)
            del0 = del0 - jnp.where(active, weight * term, 0)

        new_sample = out if decode else x_t
        new_lags = (new_sample,) + lags[:-1]   # SSA rotation: free
        new_carry = new_lags + tuple(new_coefs) + (t + 1,)
        if cost_params is None:
            return new_carry, out
        rice_state, _, lens = rice_mod._encode_step_tokens(
            out, t, rice_state, S=S_eff, bit_size=chanbits,
            pb=pb_c, kb=kb_c, wb=wb_c)
        total = total + lens[0] + lens[1] + lens[2]
        tail = rice_state + (total,)
        if dual_cost:
            d = jnp.where(t == 0, out, sign_extend(out - prev_out, chanbits))
            rice2, _, lens2 = rice_mod._encode_step_tokens(
                d, t, rice2, S=S_eff, bit_size=chanbits,
                pb=pb_c, kb=kb_c, wb=wb_c)
            total2 = total2 + lens2[0] + lens2[1] + lens2[2]
            tail = tail + (out,) + rice2 + (total2,)
        return new_carry + tail, out

    carry0 = lags0 + coef_cols0 + (jnp.int32(0),)
    if cost_params is not None:
        carry0 = carry0 + rice_mod._init_state(B, mb0_c) + (
            jnp.zeros((B,), dtype=I32),)
        if dual_cost:
            carry0 = carry0 + (zero,) + rice_mod._init_state(B, mb0_c) + (
                jnp.zeros((B,), dtype=I32),)
    carry_out, out_sb = jax.lax.scan(step, carry0, x_sb, unroll=_unroll())
    # columns >= nk never adapt: rejoin the untouched originals so the
    # returned table keeps the full (B, 16) persistent-bank shape
    cols = list(carry_out[nw:nw + nk])
    cols += [coefs0_i[:, k] for k in range(nk, coefs0_i.shape[1])]
    coefs_out = jnp.stack(cols, axis=1)
    if cost_params is None:
        return out_sb, coefs_out

    def flush(state, total):
        # virtual end step: flush a pending zero-run token (t == S)
        _, _, lens = rice_mod._encode_step_tokens(
            jnp.ones((B,), dtype=I32), jnp.int32(S), state, S=S_eff,
            bit_size=chanbits, pb=pb_c, kb=kb_c, wb=wb_c)
        return total + lens[0] + lens[1] + lens[2]

    total = flush(carry_out[nc:nc + 5], carry_out[nc + 5])
    if not dual_cost:
        return out_sb, coefs_out, total
    total2 = flush(carry_out[nc + 7:nc + 12], carry_out[nc + 12])
    return out_sb, coefs_out, total, total2


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
    """Batched forward prediction: (B, S) samples -> (residuals, coefs_out).

    With ALACJAX_PALLAS_PREDICT_LEGACY=1 and a static order, eligible shapes route to the
    hand-written Pallas kernel (ops/pallas/predict_pallas.py) — measured at
    parity with this scan on v5e (both are latency-bound on the serial
    per-sample dependency chain), kept as the tuning vehicle.
    """
    from . import pallas as pallas_cfg
    if (pallas_cfg.predict_legacy_enabled() and isinstance(numactive, int)
            and 0 < numactive <= kALACMaxCoefs
            and isinstance(denshift, int) and isinstance(chanbits, int)):
        from .pallas.predict_pallas import LANE_TILE, S_CHUNK, pc_block_pallas
        B, S = x.shape
        if B % LANE_TILE == 0 and S % S_CHUNK == 0 and coefs0 is not None:
            return pc_block_pallas(x, coefs0, numactive, chanbits, denshift)
    return _run(x, coefs0, numactive, chanbits, denshift, decode=False)


def unpc_block(res, coefs0, numactive, chanbits, denshift=9):
    """Batched inverse prediction: (B, S) residuals -> (samples, coefs_out)."""
    return _run(res, coefs0, numactive, chanbits, denshift, decode=True)


def pc_block_cost(x, coefs0, numactive: int, chanbits: int, denshift: int,
                  mb0: int, pb: int, kb: int, wb: int, num=None):
    """Fused forward prediction + adaptive-Rice bit cost (one scan).

    (B, S) samples -> (residuals (B, S), rice_cost_bits (B,)).  Exactly
    pc_block followed by rice.rice_cost, but the cost state machine runs
    inside the predictor scan — the encoder search's hot path.
    """
    res, cost, _ = pc_block_cost_coefs(
        x, coefs0, numactive, chanbits, denshift, mb0, pb, kb, wb, num=num)
    return res, cost


def _cost_kernel_ok(x, numactive, chanbits, denshift) -> bool:
    """Route to the fused Pallas cost kernel (ops/pallas/cost_pallas.py)
    on real TPU backends when the shape fits its envelope; the XLA scan
    stays the fallback (and the CPU test tier's default — interpret-mode
    parity is tested separately).  ALACJAX_PALLAS_COST forces either
    way."""
    env = _os.environ.get("ALACJAX_PALLAS_COST")
    if env is not None and env != "1":
        return False
    if env is None:
        import jax as _jax
        if _jax.default_backend() in ("cpu",):
            return False
    if not isinstance(denshift, int):
        return False   # chanbits may be per-lane (the kernel takes a tile)
    if isinstance(numactive, int) and numactive in (0, 31):
        return False
    from .pallas.cost_pallas import S_CHUNK
    return x.shape[1] % S_CHUNK == 0


def pc_block_cost_coefs(x, coefs0, numactive: int, chanbits: int,
                        denshift: int, mb0: int, pb: int, kb: int, wb: int,
                        num=None):
    """pc_block_cost that also returns the adapted coefficients (B, 16)
    (needed by the persistent-bank stream encoder, ALACEncoder.cpp's
    mCoefsU/V members surviving across packets)."""
    from . import pallas as pallas_cfg
    if (not pallas_cfg.predict_legacy_enabled()
            and _cost_kernel_ok(x, numactive, chanbits, denshift)):
        from .pallas.cost_pallas import pc_block_cost2_pallas
        if coefs0 is None:
            coefs0 = jnp.zeros((x.shape[0], kALACMaxCoefs), dtype=I32)
        res, c1, _, coefs = pc_block_cost2_pallas(
            x.astype(I32), coefs0, numactive, chanbits, denshift,
            mb0, pb, kb, wb, na_max=(numactive if isinstance(numactive, int)
                                     else kALACMaxCoefs),
            num=num, dual=False)
        return res, c1, coefs
    if pallas_cfg.predict_legacy_enabled():
        from . import rice as rice_mod
        res, coefs = pc_block(x, coefs0, numactive, chanbits, denshift)
        return res, rice_mod.rice_cost(res, chanbits, mb0, pb, kb, wb,
                                       num=num), coefs
    x = x.astype(I32)
    if numactive in (0, 31):
        from . import rice as rice_mod
        res, coefs = _run(x, coefs0, numactive, chanbits, denshift,
                          decode=False)
        return res, rice_mod.rice_cost(res, chanbits, mb0, pb, kb, wb,
                                       num=num), coefs
    out_sb, coefs, cost = _scan_general(
        x.T, coefs0, numactive, chanbits, denshift, decode=False,
        cost_params=(mb0, pb, kb, wb), num=num)
    return out_sb.T, cost, coefs


def wrap_diff(res, chanbits: int):
    """Stage-2 emission residual: pc_block(res, 31) == first difference
    with chanbits wraparound (dp_enc.c :: pc_block numactive==31)."""
    res = res.astype(I32)
    first = res[:, :1]
    diffs = sign_extend(res[:, 1:] - res[:, :-1], chanbits)
    return jnp.concatenate([first, diffs], axis=1)


def pc_block_cost2(x, coefs0, numactive, chanbits: int, denshift: int,
                   mb0: int, pb: int, kb: int, wb: int,
                   na_max: int | None = None, num=None):
    """Fused forward prediction + Rice cost of BOTH stage candidates.

    (B, S) samples -> (residuals (B, S), cost1 (B,), cost2 (B,),
    coefs (B, 16)) where cost1 prices the FIR residuals (mode 0) and
    cost2 prices their first difference (mode != 0, two-stage cascade) —
    one scan total.  The stage-2 residuals are wrap_diff(residuals);
    coefs are the adapted coefficients (stage 2's first-difference pass
    does not touch them).

    ``numactive`` may be a per-lane (B,) array of orders in 1..16 — the
    encoder stacks its whole (order x channel) candidate grid into ONE
    scan this way (fewer sequential scans beats the masked-tap overhead:
    the scans are latency-bound, not lane-bound).
    """
    from . import pallas as pallas_cfg
    x = x.astype(I32)
    static_na = isinstance(numactive, int)
    if pallas_cfg.predict_legacy_enabled() or (static_na and numactive in (0, 31)):
        from . import rice as rice_mod
        res, coefs = pc_block(x, coefs0, numactive, chanbits, denshift)
        return (res, rice_mod.rice_cost(res, chanbits, mb0, pb, kb, wb,
                                        num=num),
                rice_mod.rice_cost(wrap_diff(res, chanbits), chanbits,
                                   mb0, pb, kb, wb, num=num), coefs)
    if _cost_kernel_ok(x, numactive, chanbits, denshift):
        from .pallas.cost_pallas import pc_block_cost2_pallas
        if coefs0 is None:
            coefs0 = jnp.zeros((x.shape[0], kALACMaxCoefs), dtype=I32)
        nm = (numactive if static_na
              else (na_max if na_max is not None else kALACMaxCoefs))
        return pc_block_cost2_pallas(
            x, coefs0, numactive if static_na else numactive.astype(I32),
            chanbits, denshift, mb0, pb, kb, wb, na_max=nm, num=num,
            dual=True)
    na = numactive if static_na else numactive.astype(I32)
    out_sb, coefs, cost, cost2 = _scan_general(
        x.T, coefs0, na, chanbits, denshift, decode=False,
        cost_params=(mb0, pb, kb, wb), dual_cost=True, na_max=na_max,
        num=num)
    return out_sb.T, cost, cost2, coefs
