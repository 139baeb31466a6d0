"""Pallas kernel bit-exactness vs the scan/oracle (interpret mode on CPU;
the same kernel compiles and matches on TPU — see ops/pallas docstrings)."""

import numpy as np
import pytest
import jax.numpy as jnp

from alacjax.oracle import dp
from alacjax.ops import predict
from alacjax.ops.pallas.predict_pallas import LANE_TILE, S_CHUNK, pc_block_pallas

pytestmark = pytest.mark.slow  # device-compile-heavy (fast tier: -m "not slow")


@pytest.mark.parametrize("order", [4, 8])
def test_pallas_predictor_matches_scan_and_oracle(rng, order):
    B, S = LANE_TILE, S_CHUNK
    x = rng.integers(-30000, 30000, (B, S)).astype(np.int32)
    c0 = np.tile(np.asarray(dp.init_coefs(9), dtype=np.int32), (B, 1))
    r_p, c_p = pc_block_pallas(jnp.asarray(x), jnp.asarray(c0), order, 17, 9,
                               interpret=True)
    r_s, c_s = predict.pc_block(jnp.asarray(x), jnp.asarray(c0), order, 17, 9)
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_s))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_s))
    # spot-check one lane against the scalar oracle
    c_oracle = dp.init_coefs(9)
    r_oracle = dp.pc_block(x[3].astype(np.int64), c_oracle, order, 17, 9)
    np.testing.assert_array_equal(np.asarray(r_p)[3], r_oracle)
    np.testing.assert_array_equal(np.asarray(c_p)[3, :], c_oracle)


def test_pallas_multi_chunk_state_carry(rng):
    """State must persist across sample chunks (the scratch carry)."""
    B, S = LANE_TILE, 3 * S_CHUNK
    x = rng.integers(-2000, 2000, (B, S)).astype(np.int32)
    c0 = np.tile(np.asarray(dp.init_coefs(9), dtype=np.int32), (B, 1))
    r_p, c_p = pc_block_pallas(jnp.asarray(x), jnp.asarray(c0), 8, 17, 9,
                               interpret=True)
    r_s, c_s = predict.pc_block(jnp.asarray(x), jnp.asarray(c0), 8, 17, 9)
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_s))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_s))


# ---------------------------------------------------------------------------
# fused predict + dual-Rice-cost kernel (ops/pallas/cost_pallas.py) — the
# r4 production encode-search path on TPU backends
# ---------------------------------------------------------------------------
def _cost_args():
    mb0, pb, kb = 10, 40, 14
    return mb0, pb, kb, (1 << kb) - 1


@pytest.mark.parametrize("mode", ["static8", "perlane", "partial"])
def test_pallas_cost2_matches_scan(rng, mode):
    from alacjax.ops.pallas.cost_pallas import (
        S_CHUNK as SC, pc_block_cost2_pallas)
    L, S = 256, 2 * SC          # pads to LANE_TILE internally
    mb0, pb, kb, wb = _cost_args()
    x = rng.integers(-30000, 30000, (L, S)).astype(np.int32)
    x[:8] = 0                   # pure zero-run lanes
    x[8:16, ::2] = 0            # alternating zero runs
    c0 = np.zeros((L, 16), np.int32)
    na = 8 if mode == "static8" else jnp.asarray(
        rng.choice([4, 8], L).astype(np.int32))
    num = None
    if mode == "partial":
        num = jnp.asarray(rng.integers(1, S + 1, L).astype(np.int32))
        for i in range(L):
            x[i, int(num[i]):] = 0
    ref = predict.pc_block_cost2(jnp.asarray(x), jnp.asarray(c0), na, 17, 9,
                                 mb0, pb, kb, wb, na_max=8, num=num)
    got = pc_block_cost2_pallas(jnp.asarray(x), jnp.asarray(c0), na, 17, 9,
                                mb0, pb, kb, wb, na_max=8, num=num,
                                interpret=True)
    for name, a, b in zip(("res", "cost1", "cost2", "coefs"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_pallas_cost_single_matches_scan(rng):
    """dual=False (the mixres-trial route through pc_block_cost_coefs)."""
    from alacjax.ops.pallas.cost_pallas import (
        S_CHUNK as SC, pc_block_cost2_pallas)
    L, S = 128, SC
    mb0, pb, kb, wb = _cost_args()
    x = rng.integers(-60000, 60000, (L, S)).astype(np.int32)
    c0 = np.zeros((L, 16), np.int32)
    r_res, r_c, r_k = predict.pc_block_cost_coefs(
        jnp.asarray(x), jnp.asarray(c0), 8, 18, 9, mb0, pb, kb, wb)
    g_res, g_c, _, g_k = pc_block_cost2_pallas(
        jnp.asarray(x), jnp.asarray(c0), 8, 18, 9, mb0, pb, kb, wb,
        na_max=8, dual=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_res), np.asarray(g_res))
    np.testing.assert_array_equal(np.asarray(r_c), np.asarray(g_c))
    np.testing.assert_array_equal(np.asarray(r_k), np.asarray(g_k))


@pytest.mark.parametrize("mode", ["static", "perlane", "partial"])
def test_pallas_emit_matches_scan(rng, mode):
    """Emission kernel (ops/pallas/emit_pallas.py) vs rice_encode_words
    with emit_flush=False — the production emission mode."""
    from alacjax.ops import rice
    from alacjax.ops.pallas.cost_pallas import S_CHUNK as SC
    from alacjax.ops.pallas.emit_pallas import rice_encode_words_pallas
    L, S = 256, SC
    mb0, pb, kb = 10, 40, 14
    wb = (1 << kb) - 1
    x = rng.integers(-40000, 40000, (L, S)).astype(np.int32)
    x[:8] = 0
    x[8:16, ::3] = 0
    x[16:24] = rng.integers(-2, 3, (8, S))      # zero-run heavy
    start = jnp.asarray(rng.integers(0, 2000, L).astype(np.int32))
    num, bs, kw = None, 17, {}
    if mode == "perlane":
        bs = jnp.asarray(rng.choice([16, 17], L).astype(np.int32))
        kw = dict(bit_size_cap=17)
    if mode == "partial":
        num = jnp.asarray(rng.integers(1, S + 1, L).astype(np.int32))
        for i in range(L):
            x[i, int(num[i]):] = 0
    ref = rice.rice_encode_words(jnp.asarray(x), bs, mb0, pb, kb, wb, start,
                                 emit_flush=False, num=num, **kw)
    got = rice_encode_words_pallas(jnp.asarray(x), bs, mb0, pb, kb, wb,
                                   start, num=num, interpret=True, **kw)
    for name, a, b in zip(("words", "keys", "end", "tailv", "tailk"),
                          ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_pallas_cost2_perlane_chanbits(rng):
    """Per-lane chanbits (stacked SCE/CPE channels — the 5.1 search)."""
    from alacjax.ops.pallas.cost_pallas import (
        S_CHUNK as SC, pc_block_cost2_pallas)
    L, S = 192, SC
    mb0, pb, kb, wb = _cost_args()
    x = rng.integers(-2**22, 2**22, (L, S)).astype(np.int32)
    x[:6] = 0
    na = jnp.asarray(rng.choice([4, 8], L).astype(np.int32))
    cb = jnp.asarray(rng.choice([16, 17, 21], L).astype(np.int32))
    c0 = jnp.zeros((L, 16), jnp.int32)
    ref = predict.pc_block_cost2(jnp.asarray(x), c0, na, cb, 9,
                                 mb0, pb, kb, wb, na_max=8)
    got = pc_block_cost2_pallas(jnp.asarray(x), c0, na, cb, 9,
                                mb0, pb, kb, wb, na_max=8, interpret=True)
    for name, a, b in zip(("res", "cost1", "cost2", "coefs"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


# ---------------------------------------------------------------------------
# fused decode kernel (ops/pallas/decode_pallas.py) — K-step Mosaic blocks
# inside the outer scan; must be bit-identical to fused_decode.decode_channel
# including end_bits and the drift/underrun error flags
# ---------------------------------------------------------------------------
def _decode_streams(rng, orders, chanbits_per_lane, S, mode_nz):
    """Oracle-encoded packets for per-lane (order, chanbits) lanes."""
    import os
    from alacjax.bitbuffer import BitBuffer
    from alacjax.oracle import ag as oag, dp as odp
    from alacjax.ops import bitpack
    B = len(orders)
    packets, coefs0, xs = [], [], []
    for b, (na, cb) in enumerate(zip(orders, chanbits_per_lane)):
        full = 1 << (cb - 2)
        kind = b % 4
        if kind == 0:
            x = np.clip((np.sin(np.arange(S) * 0.07) * (full // 2)),
                        -full, full - 1).astype(np.int64)
        elif kind == 1:
            x = rng.integers(-full, full, S)
        elif kind == 2:
            x = np.zeros(S, dtype=np.int64)
            x[::173] = rng.integers(-300, 300, len(x[::173]))
        else:
            x = rng.integers(-3, 4, S)
        c = odp.init_coefs(9)
        coefs0.append(np.asarray(c, dtype=np.int32).copy())
        s1 = odp.pc_block(x, c, na, cb, 9)
        if mode_nz:
            s1 = odp.pc_block(s1, odp.init_coefs(9), 31, cb, 9)
        bb = BitBuffer(byte_size=16 * S)
        oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, s1, S, cb)
        packets.append(bb.to_bytes())
        xs.append(x)
    W = max(len(p) for p in packets) // 4 + 3
    wimg = jnp.asarray(bitpack.bytes_to_words(packets, W))
    return wimg, np.stack(coefs0), np.stack(xs)


@pytest.mark.parametrize("mode_nz", [False, True])
def test_pallas_decode_matches_scan(rng, mode_nz):
    import os
    from alacjax.ops import fused_decode
    from alacjax.ops.pallas.decode_pallas import decode_channel_pallas
    from alacjax.types import KB0, MB0, PB0
    wb = (1 << KB0) - 1
    S = 600
    orders = [0, 4, 8, 31, 8, 4, 0, 8]
    cb = [17] * len(orders)
    wimg, coefs0, xs = _decode_streams(rng, orders, cb, S, mode_nz)
    B = len(orders)
    zero = jnp.zeros((B,), jnp.int32)
    na_v = jnp.asarray(np.array(orders, np.int32))
    mode = jnp.full((B,), 1 if mode_nz else 0, jnp.int32)
    den = jnp.full((B,), 9, jnp.int32)
    pb = jnp.full((B,), PB0, jnp.int32)
    args = (wimg, zero, S, 17, MB0, pb, KB0, wb,
            jnp.asarray(coefs0), mode, na_v, den)
    G = int(os.environ.get("ALACJAX_DECODE_G", "8"))
    ref = fused_decode.decode_channel(*args, taps=8)
    got = decode_channel_pallas(*args, cb_max=17, taps=8, G=G,
                                interpret=True)
    for name, a, b in zip(("samples", "end_bits", "err"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    # the streams decode losslessly too (orders > taps flag err upstream)
    keep = [b for b, na in enumerate(orders) if na <= 8 or na == 31]
    np.testing.assert_array_equal(np.asarray(got[0])[keep], xs[keep])


def test_pallas_decode_perlane_chanbits_partial(rng):
    """Per-lane chanbits (stacked 5.1 elements) + partial tails."""
    import os
    from alacjax.ops import fused_decode
    from alacjax.ops.pallas.decode_pallas import decode_channel_pallas
    from alacjax.types import KB0, MB0, PB0
    wb = (1 << KB0) - 1
    S = 512
    orders = [4, 8, 8, 4, 0, 31]
    cb = [16, 17, 21, 17, 16, 17]
    wimg, coefs0, _ = _decode_streams(rng, orders, cb, S, False)
    B = len(orders)
    zero = jnp.zeros((B,), jnp.int32)
    num = jnp.asarray(np.array([S, S // 2 + 1, S, 7, S - 1, S], np.int32))
    # re-encode honoring num: simpler — decode only num samples of the
    # full-S streams; the scan must stop each lane at its num
    args = (wimg, zero, S, jnp.asarray(np.array(cb, np.int32)), MB0,
            jnp.full((B,), PB0, jnp.int32), KB0, wb, jnp.asarray(coefs0),
            zero, jnp.asarray(np.array(orders, np.int32)),
            jnp.full((B,), 9, jnp.int32))
    G = int(os.environ.get("ALACJAX_DECODE_G", "8"))
    ref = fused_decode.decode_channel(*args, chanbits_max=21, taps=8,
                                      num=num)
    got = decode_channel_pallas(*args, cb_max=21, taps=8, G=G, num=num,
                                interpret=True)
    for name, a, b in zip(("samples", "end_bits", "err"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_step_kernel_matches_xla_step(rng, monkeypatch):
    """Hybrid step kernel (pallas/decode_step.py, interpret mode) vs the
    pure-XLA scan step: identical samples/end/err.  The kernel calls the
    SAME _substep_core/_shift_cache the XLA step uses, so this guards
    the routing + ref plumbing (stack/unstack, i32<->u32 boundaries)."""
    import os
    from alacjax.ops import fused_decode
    from alacjax.types import KB0, MB0, PB0
    wb = (1 << KB0) - 1
    S = 600
    # 128 lanes (the kernel's minimum batch granularity), mixed content
    orders = ([0, 4, 8, 31] * 32)
    cb = [17] * len(orders)
    wimg, coefs0, _ = _decode_streams(rng, orders, cb, S, False)
    B = len(orders)
    zero = jnp.zeros((B,), jnp.int32)
    num = jnp.asarray(
        np.where(np.arange(B) % 7 == 3, S // 3, S).astype(np.int32))
    args = (wimg, zero, S, 17, MB0, jnp.full((B,), PB0, jnp.int32), KB0,
            wb, jnp.asarray(coefs0), zero,
            jnp.asarray(np.array(orders, np.int32)),
            jnp.full((B,), 9, jnp.int32))
    monkeypatch.setenv("ALACJAX_PALLAS_DECODE_STEP", "0")
    ref = fused_decode.decode_channel(*args, taps=8, num=num)
    monkeypatch.setenv("ALACJAX_PALLAS_DECODE_STEP", "1")
    got = fused_decode.decode_channel(*args, taps=8, num=num)
    for name, a, b in zip(("samples", "end_bits", "err"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
