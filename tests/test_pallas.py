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
