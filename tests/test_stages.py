"""Per-stage oracle round-trip and encoder/decoder state-lockstep tests
(SURVEY.md §4 items 2 and 5)."""

import numpy as np
import pytest

from alacjax.bitbuffer import BitBuffer
from alacjax.oracle import ag, dp, matrix


@pytest.mark.parametrize("depth_bits", [16, 17, 20, 21, 24])
@pytest.mark.parametrize("mixres", [0, 1, 2, 3, 4])
def test_matrix_roundtrip(rng, depth_bits, mixres):
    full = 1 << (depth_bits - 1)
    l = rng.integers(-full, full, 800)
    r = rng.integers(-full, full, 800)
    u, v = matrix.mix(l, r, 2, mixres)
    l2, r2 = matrix.unmix(u, v, 2, mixres)
    np.testing.assert_array_equal(l2, l)
    np.testing.assert_array_equal(r2, r)


@pytest.mark.parametrize("bytes_shifted", [0, 1, 2])
def test_shift_off_in_roundtrip(rng, bytes_shifted):
    x = rng.integers(-(1 << 31), 1 << 31, 500)
    hi, lo = matrix.shift_off(x, bytes_shifted)
    np.testing.assert_array_equal(matrix.shift_in(hi, lo, bytes_shifted), x)
    if bytes_shifted:
        assert lo.min() >= 0 and lo.max() < (1 << (8 * bytes_shifted))


@pytest.mark.parametrize("numactive", [0, 1, 2, 3, 4, 8, 15, 16, 31])
@pytest.mark.parametrize("chanbits", [16, 17, 21, 25, 32])
def test_predictor_roundtrip_and_lockstep(rng, numactive, chanbits):
    full = 1 << (chanbits - 1)
    x = rng.integers(-full, full, 400)
    c_enc = dp.init_coefs(9)
    c_dec = c_enc.copy()
    res = dp.pc_block(x, c_enc, numactive, chanbits, 9)
    y = dp.unpc_block(res, c_dec, numactive, chanbits, 9)
    np.testing.assert_array_equal(y, x)
    # decoder coef trajectory must replay encoder's exactly
    np.testing.assert_array_equal(c_enc, c_dec)


@pytest.mark.parametrize("denshift", [1, 5, 9, 15])
def test_predictor_denshift_grid(rng, denshift):
    x = rng.integers(-(1 << 16), 1 << 16, 300)
    c_enc = dp.init_coefs(denshift)
    c_dec = c_enc.copy()
    res = dp.pc_block(x, c_enc, 8, 17, denshift)
    np.testing.assert_array_equal(dp.unpc_block(res, c_dec, 8, 17, denshift), x)


def test_predictor_residuals_fit_chanbits(rng):
    chanbits = 17
    x = rng.integers(-(1 << 16), 1 << 16, 400)
    res = dp.pc_block(x, dp.init_coefs(9), 8, chanbits, 9)
    assert res.min() >= -(1 << (chanbits - 1))
    assert res.max() < 1 << (chanbits - 1)


def _rice_roundtrip(x, bit_size):
    n = len(x)
    bb = BitBuffer(byte_size=32)
    nbits = ag.dyn_comp(ag.set_standard_ag_params(n, n), bb, x, n, bit_size)
    rd = BitBuffer(bb.to_bytes())
    y = ag.dyn_decomp(ag.set_standard_ag_params(n, n), rd, n, bit_size)
    assert rd.get_position() == nbits  # decoder consumes exactly what was written
    np.testing.assert_array_equal(y, x)
    return nbits


@pytest.mark.parametrize("bit_size", [16, 17, 21, 25, 32])
@pytest.mark.parametrize("kind", ["noise", "small", "sparse", "silence", "extreme"])
def test_rice_roundtrip(rng, bit_size, kind):
    n = 2000
    if kind == "noise":
        x = rng.integers(-3000, 3000, n)
    elif kind == "small":
        x = rng.integers(-4, 5, n)
    elif kind == "sparse":
        x = np.zeros(n, dtype=np.int64)
        x[rng.integers(0, n, 25)] = rng.integers(-5, 6, 25)
    elif kind == "silence":
        x = np.zeros(n, dtype=np.int64)
    else:  # extreme values exercise the escape path
        x = np.zeros(n, dtype=np.int64)
        x[::37] = (1 << (bit_size - 1)) - 1
        x[5::61] = -(1 << (bit_size - 1))
    _rice_roundtrip(x, bit_size)


def test_rice_long_zero_run_crosses_65535_cap(rng):
    # runs >= 65535 must split (ag_enc.c caps nz and clears zmode)
    x = np.zeros(70000, dtype=np.int64)
    x[0] = 5
    x[-1] = -3
    _rice_roundtrip(x, 17)


def test_rice_zero_run_compresses_silence():
    x = np.zeros(4096, dtype=np.int64)
    nbits = _rice_roundtrip(x, 17)
    assert nbits < 4096  # far below 1 bit/sample


def test_rice_decoder_rejects_overrun_run():
    # corrupt stream whose zero-run overruns the frame must fail closed
    from alacjax.types import AlacParamError
    x = np.zeros(100, dtype=np.int64)
    bb = BitBuffer(byte_size=16)
    ag.dyn_comp(ag.set_standard_ag_params(100, 100), bb, x, 100, 17)
    rd = BitBuffer(bb.to_bytes())
    with pytest.raises(AlacParamError):
        ag.dyn_decomp(ag.set_standard_ag_params(50, 50), rd, 50, 17)


def test_max_run_is_wire_only(rng):
    """Pin the dialect rule (docs/BITSTREAM.md): cookie maxRun is carried
    on the wire but does not parameterize the zero-run loop — the cap is
    65535 (16-bit escape ceiling).  A >255-sample zero run encodes
    byte-identically under default and non-default maxRun."""
    import dataclasses

    from alacjax.cookie import parse_cookie, serialize_cookie
    from alacjax.oracle import ALACDecoder, ALACEncoder
    from alacjax.types import AlacConfig

    x = np.zeros((1, 2048), dtype=np.int64)
    x[0, 0] = 999
    x[0, -1] = -7  # zero run of 2046 > 255 in between
    cfg_a = AlacConfig(bit_depth=16, num_channels=1, frame_length=2048)
    cfg_b = dataclasses.replace(cfg_a, max_run=40)
    pkt_a = ALACEncoder(cfg_a).encode_packet(x)
    pkt_b = ALACEncoder(cfg_b).encode_packet(x)
    assert pkt_a == pkt_b  # run loop ignores maxRun
    # ... but the cookie does carry it
    assert parse_cookie(serialize_cookie(cfg_b)).max_run == 40
    y, _ = ALACDecoder(cfg_b).decode_packet(pkt_b)
    np.testing.assert_array_equal(y, x)
