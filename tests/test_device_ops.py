"""Device op vs oracle bit-exactness (SURVEY.md §4 item 5: the scalar
NumPy oracle is the executable spec; pallas/jnp must match it exactly)."""

import numpy as np
import pytest
import jax.numpy as jnp

from alacjax.bitbuffer import BitBuffer
from alacjax.oracle import ag as oag
from alacjax.oracle import dp as odp
from alacjax.oracle import matrix as omat
from alacjax.ops import bitpack, matrix as jmat, predict as jpred, rice as jrice
from alacjax.types import KB0, MB0, PB0

WB = (1 << KB0) - 1


@pytest.mark.parametrize("mixres", [0, 2, 4])
def test_matrix_matches_oracle(rng, mixres):
    l = rng.integers(-(1 << 19), 1 << 19, (4, 200))
    r = rng.integers(-(1 << 19), 1 << 19, (4, 200))
    u_o, v_o = omat.mix(l[0], r[0], 2, mixres)
    u_j, v_j = jmat.mix(jnp.asarray(l, jnp.int32), jnp.asarray(r, jnp.int32), 2, mixres)
    np.testing.assert_array_equal(np.asarray(u_j[0]), u_o)
    np.testing.assert_array_equal(np.asarray(v_j[0]), v_o)
    l2, r2 = jmat.unmix(u_j, v_j, 2, mixres)
    np.testing.assert_array_equal(np.asarray(l2), l)
    np.testing.assert_array_equal(np.asarray(r2), r)


def test_matrix_per_lane_mixres(rng):
    l = rng.integers(-30000, 30000, (5, 100)).astype(np.int32)
    r = rng.integers(-30000, 30000, (5, 100)).astype(np.int32)
    mixres = np.array([0, 1, 2, 3, 4], dtype=np.int32)[:, None]
    u, v = jmat.mix(jnp.asarray(l), jnp.asarray(r), 2, mixres)
    l2, r2 = jmat.unmix(u, v, 2, mixres)
    np.testing.assert_array_equal(np.asarray(l2), l)
    np.testing.assert_array_equal(np.asarray(r2), r)


@pytest.mark.slow
@pytest.mark.parametrize("numactive", [0, 4, 8, 16, 31])
@pytest.mark.parametrize("chanbits", [17, 25, 32])
def test_predictor_matches_oracle(rng, numactive, chanbits):
    B, S = 3, 200
    x = rng.integers(-(1 << (chanbits - 1)), 1 << (chanbits - 1), (B, S))
    res_o = np.zeros_like(x)
    coefs_o = np.zeros((B, 16), dtype=np.int64)
    for b in range(B):
        c = odp.init_coefs(9)
        res_o[b] = odp.pc_block(x[b], c, numactive, chanbits, 9)
        coefs_o[b] = c
    c0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(odp.init_coefs(9), dtype=np.int32)), (B, 16))
    res_j, coefs_j = jpred.pc_block(
        jnp.asarray(x.astype(np.int32)), c0, numactive, chanbits, 9)
    np.testing.assert_array_equal(np.asarray(res_j, dtype=np.int64), res_o)
    if 0 < numactive <= 16:
        np.testing.assert_array_equal(np.asarray(coefs_j, dtype=np.int64), coefs_o)
    y, _ = jpred.unpc_block(jnp.asarray(res_o.astype(np.int32)), c0,
                            numactive, chanbits, 9)
    np.testing.assert_array_equal(np.asarray(y, dtype=np.int64), x)


@pytest.mark.slow
def test_predictor_dynamic_orders_mixed_batch(rng):
    chanbits = 17
    nas = np.array([0, 4, 8, 16, 31], dtype=np.int32)
    B, S = len(nas), 150
    x = rng.integers(-(1 << 16), 1 << 16, (B, S))
    res_o = np.zeros_like(x)
    for b in range(B):
        res_o[b] = odp.pc_block(x[b], odp.init_coefs(9), int(nas[b]), chanbits, 9)
    c0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(odp.init_coefs(9), dtype=np.int32)), (B, 16))
    y, _ = jpred.unpc_block(jnp.asarray(res_o.astype(np.int32)), c0,
                            jnp.asarray(nas), chanbits, 9)
    np.testing.assert_array_equal(np.asarray(y, dtype=np.int64), x)


def _rice_corpus(rng, bit_size, S=900):
    full = 1 << (bit_size - 1)
    rows = [rng.integers(-1500, 1500, S),
            np.zeros(S, dtype=np.int64),
            rng.integers(-3, 4, S)]
    sp = np.zeros(S, dtype=np.int64)
    sp[rng.integers(0, S, 20)] = rng.integers(-5, 6, 20)
    rows.append(sp)
    ex = np.zeros(S, dtype=np.int64)
    ex[::37] = full - 1
    ex[5::61] = -full
    rows.append(ex)
    z = np.zeros(S, dtype=np.int64)
    z[0] = 7   # run to end of frame
    rows.append(z)
    return np.stack(rows)


@pytest.mark.slow
@pytest.mark.parametrize("bit_size", [16, 17, 32])
def test_rice_encode_bytes_match_oracle(rng, bit_size):
    x = _rice_corpus(rng, bit_size)
    B, S = x.shape
    oracle_bytes, oracle_bits = [], []
    for b in range(B):
        bb = BitBuffer(byte_size=64)
        nb = oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, x[b], S, bit_size)
        oracle_bytes.append(bb.to_bytes())
        oracle_bits.append(nb)
    vals, lens = jrice.rice_encode_tokens(
        jnp.asarray(x.astype(np.int32)), bit_size, MB0, PB0, KB0, WB)
    W = max(oracle_bits) // 32 + 4
    words, total = bitpack.assemble(vals, lens, W)
    dev = bitpack.words_to_bytes(np.asarray(words), np.asarray(total))
    assert dev == oracle_bytes
    cost = jrice.rice_cost(jnp.asarray(x.astype(np.int32)), bit_size,
                           MB0, PB0, KB0, WB)
    np.testing.assert_array_equal(np.asarray(cost), oracle_bits)


@pytest.mark.slow
@pytest.mark.parametrize("bit_size", [16, 17, 32])
def test_rice_decode_matches_oracle(rng, bit_size):
    x = _rice_corpus(rng, bit_size)
    B, S = x.shape
    oracle_bytes, oracle_bits = [], []
    for b in range(B):
        bb = BitBuffer(byte_size=64)
        nb = oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, x[b], S, bit_size)
        oracle_bytes.append(bb.to_bytes())
        oracle_bits.append(nb)
    W = max(len(p) for p in oracle_bytes) // 4 + 3
    wimg = bitpack.bytes_to_words(oracle_bytes, W)
    res, end_bits, err = jrice.rice_decode(
        jnp.asarray(wimg), jnp.zeros(B, dtype=np.int32), S, bit_size,
        MB0, PB0, KB0, WB)
    assert not np.asarray(err).any()
    np.testing.assert_array_equal(np.asarray(res, dtype=np.int64), x)
    np.testing.assert_array_equal(np.asarray(end_bits), oracle_bits)


def test_bitpack_assemble_matches_bitbuffer(rng):
    T = 300
    lens = rng.integers(0, 33, (2, T))
    vals = (rng.integers(0, 1 << 32, (2, T)).astype(np.uint64)
            & ((1 << lens.astype(np.uint64)) - 1)).astype(np.uint32)
    words, total = bitpack.assemble(jnp.asarray(vals), jnp.asarray(lens), 350)
    got = bitpack.words_to_bytes(np.asarray(words), np.asarray(total))
    for b in range(2):
        bb = BitBuffer(byte_size=16)
        for v, l in zip(vals[b], lens[b]):
            bb.write(int(v), int(l))
        assert got[b] == bb.to_bytes()
        assert int(total[b]) == bb.get_position()
