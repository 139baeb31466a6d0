"""Fused-scan ops vs their unfused compositions and the scalar oracle.

encode: predict.pc_block_cost == pc_block + rice.rice_cost
decode: fused_decode.decode_channel == dyn_decomp + (mode-31 stage) +
        unpc_block, on streams produced by the oracle entropy coder.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from alacjax.bitbuffer import BitBuffer
from alacjax.oracle import ag as oag
from alacjax.oracle import dp as odp
from alacjax.ops import bitpack, fused_decode, predict as jpred, rice as jrice
from alacjax.types import KB0, MB0, PB0

pytestmark = pytest.mark.slow

WB = (1 << KB0) - 1


def _corpus(rng, chanbits, B, S):
    full = 1 << (chanbits - 2)
    rows = []
    t = np.arange(S)
    rows.append(np.clip(np.sin(t * 0.05) * (full // 2), -full, full - 1))
    rows.append(rng.integers(-full, full, S))
    rows.append(np.zeros(S, dtype=np.int64))
    imp = np.zeros(S, dtype=np.int64)
    imp[::41] = full - 1
    rows.append(imp)
    while len(rows) < B:
        rows.append(rng.integers(-50, 51, S))
    return np.stack(rows[:B]).astype(np.int64)


@pytest.mark.parametrize("order", [4, 8])
def test_pc_block_cost_matches_unfused(rng, order):
    chanbits = 17
    B, S = 5, 700
    x = _corpus(rng, chanbits, B, S)
    c0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(odp.init_coefs(9), dtype=np.int32)), (B, 16))
    xj = jnp.asarray(x.astype(np.int32))
    res0, _ = jpred.pc_block(xj, c0, order, chanbits, 9)
    cost0 = jrice.rice_cost(res0, chanbits, MB0, PB0, KB0, WB)
    res1, cost1 = jpred.pc_block_cost(xj, c0, order, chanbits, 9,
                                      MB0, PB0, KB0, WB)
    np.testing.assert_array_equal(np.asarray(res0), np.asarray(res1))
    np.testing.assert_array_equal(np.asarray(cost0), np.asarray(cost1))


@pytest.mark.parametrize("mode_nz", [False, True])
def test_fused_decode_channel_matches_oracle(rng, mode_nz):
    """Streams: per-lane varied orders (incl. modes 0/31), oracle-encoded."""
    chanbits = 17
    S = 600
    orders = [0, 4, 8, 16, 31, 8]
    B = len(orders)
    x = _corpus(rng, chanbits, B, S)

    packets, coefs0 = [], []
    for b, na in enumerate(orders):
        c = odp.init_coefs(9)
        coefs0.append(np.asarray(c, dtype=np.int32).copy())
        s1 = odp.pc_block(x[b], c, na, chanbits, 9)
        if mode_nz:
            # two-stage: FIR residuals pass through the first-difference
            # stage (encoder side of the decoder's mode != 0 cascade)
            s1 = odp.pc_block(s1, odp.init_coefs(9), 31, chanbits, 9)
        bb = BitBuffer(byte_size=8 * S)
        oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, s1, S, chanbits)
        packets.append(bb.to_bytes())

    W = max(len(p) for p in packets) // 4 + 3
    wimg = jnp.asarray(bitpack.bytes_to_words(packets, W))
    na_v = jnp.asarray(np.array(orders, dtype=np.int32))
    mode = jnp.full((B,), 1 if mode_nz else 0, dtype=jnp.int32)
    out, end_bits, err = fused_decode.decode_channel(
        wimg, jnp.zeros((B,), jnp.int32), S, chanbits, MB0, PB0, KB0, WB,
        jnp.asarray(np.stack(coefs0)), mode, na_v, jnp.full((B,), 9, jnp.int32))
    assert not np.asarray(err).any()
    np.testing.assert_array_equal(np.asarray(out, dtype=np.int64), x)
    # cursor ends exactly at each stream's length
    want_bits = [len(p) * 8 for p in packets]
    got = np.asarray(end_bits)
    for b in range(B):
        assert want_bits[b] - 7 <= got[b] <= want_bits[b]


def test_fused_decode_zero_run_boundaries(rng):
    """Zero runs crossing cache refills and runs to end-of-frame."""
    chanbits = 17
    S = 2048
    B = 4
    x = np.zeros((B, S), dtype=np.int64)
    x[0, 0] = 9                      # run to end of frame
    x[1, ::511] = 400                # runs spanning refill boundaries
    x[2, :10] = rng.integers(-60000, 60000, 10)  # noise then silence
    x[3] = rng.integers(-2, 3, S)    # dense small values, frequent runs

    packets = []
    for b in range(B):
        bb = BitBuffer(byte_size=8 * S)
        oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, x[b], S, chanbits)
        packets.append(bb.to_bytes())
    W = max(len(p) for p in packets) // 4 + 3
    wimg = jnp.asarray(bitpack.bytes_to_words(packets, W))
    zero = jnp.zeros((B,), jnp.int32)
    out, _, err = fused_decode.decode_channel(
        wimg, zero, S, chanbits, MB0, PB0, KB0, WB,
        jnp.zeros((B, 16), jnp.int32), zero, zero, jnp.full((B,), 9, jnp.int32))
    assert not np.asarray(err).any()
    np.testing.assert_array_equal(np.asarray(out, dtype=np.int64), x)
