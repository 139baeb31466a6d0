"""End-to-end oracle codec tests: lossless round-trip is the primary gate
(SURVEY.md §4 item 1), plus escape, partial-frame, grammar, and fuzz paths."""

import numpy as np
import pytest

from alacjax.bitbuffer import BitBuffer
from alacjax.cookie import parse_cookie, serialize_cookie
from alacjax.oracle import ALACDecoder, ALACEncoder, dp
from alacjax.types import (
    AlacConfig, AlacError, ElementTag, kALACMaxCoefs,
)
from conftest import gen_pcm

FRAME = 256  # small frame keeps the scalar oracle fast in CI


def roundtrip(cfg, x, num_samples=None):
    enc = ALACEncoder(cfg)
    dec = ALACDecoder(parse_cookie(serialize_cookie(cfg)))
    pkt = enc.encode_packet(x)
    y, got = dec.decode_packet(pkt, num_samples=num_samples)
    return pkt, y, got


@pytest.mark.parametrize("depth", [16, 20, 24, 32])
@pytest.mark.parametrize("nch", [1, 2, 3, 6, 8])
@pytest.mark.parametrize("kind", ["sine", "noise", "silence", "impulse"])
def test_lossless_roundtrip(rng, depth, nch, kind):
    cfg = AlacConfig(bit_depth=depth, num_channels=nch, frame_length=FRAME)
    x = gen_pcm(rng, kind, nch, FRAME, depth)
    _, y, got = roundtrip(cfg, x)
    assert got == FRAME
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("depth", [16, 24])
def test_partial_frame_roundtrip(rng, depth):
    cfg = AlacConfig(bit_depth=depth, num_channels=2, frame_length=FRAME)
    x = gen_pcm(rng, "sine", 2, 129, depth)
    _, y, got = roundtrip(cfg, x, num_samples=129)
    assert got == 129
    np.testing.assert_array_equal(y, x)


def test_white_noise_triggers_escape_and_roundtrips(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=FRAME)
    x = gen_pcm(rng, "noise", 2, FRAME, 16)
    pkt, y, _ = roundtrip(cfg, x)
    np.testing.assert_array_equal(y, x)
    # escape keeps worst-case packets near raw size + small header
    assert len(pkt) <= 2 * FRAME * 2 + 16


def test_compression_on_tonal_content(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=1024)
    x = gen_pcm(rng, "sine", 2, 1024, 16)
    pkt, y, _ = roundtrip(cfg, x)
    np.testing.assert_array_equal(y, x)
    assert len(pkt) < 1024 * 2 * 2 * 0.75  # beats raw PCM comfortably


def test_fast_mode_roundtrip(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=FRAME,
                     fast_mode=True)
    x = gen_pcm(rng, "sine", 2, FRAME, 16)
    _, y, _ = roundtrip(cfg, x)
    np.testing.assert_array_equal(y, x)


def test_multi_packet_stream_with_coef_persistence(rng):
    """Encoder coef banks persist across packets (SURVEY.md §5 checkpoint
    row); every packet must still decode independently."""
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=FRAME)
    enc = ALACEncoder(cfg)
    dec = ALACDecoder(cfg)
    for i in range(4):
        x = gen_pcm(rng, "sine", 2, FRAME, 16)
        pkt = enc.encode_packet(x)
        y, _ = dec.decode_packet(pkt)
        np.testing.assert_array_equal(y, x)


def test_independent_frames_mode_is_stateless(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=FRAME)
    x = gen_pcm(rng, "sine", 2, FRAME, 16)
    enc1 = ALACEncoder(cfg, independent_frames=True)
    a = enc1.encode_packet(x)
    b = enc1.encode_packet(x)
    assert a == b  # no cross-packet state


def test_decoder_two_stage_prediction_mode(rng):
    """Decoder must invert the mode!=0 cascade (diff-31 stage after FIR).

    Our encoder emits mode 0 only, so drive the decoder with a hand-built
    element exercising ALACDecoder.cpp's cascaded unpc_block path.
    """
    from alacjax.oracle import ag as ag_mod
    from alacjax.oracle.encoder import _rice_params, _write_channel_params, \
        _write_element_header

    cfg = AlacConfig(bit_depth=16, num_channels=1, frame_length=FRAME)
    x = gen_pcm(rng, "sine", 1, FRAME, 16)[0]
    chanbits = 16
    order = 8
    coefs = dp.init_coefs(9)
    coefs0 = coefs.copy()
    # encode: FIR stage then first-difference stage (mode=1)
    res_fir = dp.pc_block(x, coefs, order, chanbits, 9)
    res = dp.pc_block(res_fir, np.zeros(kALACMaxCoefs, dtype=np.int64), 31,
                      chanbits, 0)
    bits = BitBuffer(byte_size=4 * FRAME)
    _write_element_header(bits, ElementTag.SCE, 0, False, 0, False, FRAME)
    bits.write(0, 16)  # mixBits/mixRes: present in mono elements too
    _write_channel_params(bits, 1, 9, 4, coefs0, order)
    ag_mod.dyn_comp(_rice_params(cfg, FRAME, 4), bits, res, FRAME, chanbits)
    bits.write(int(ElementTag.END), 3)
    bits.byte_align(add_zeros=True)

    y, got = ALACDecoder(cfg).decode_packet(bits.to_bytes())
    np.testing.assert_array_equal(y[0], x)


def test_decoder_skips_fil_and_dse_elements(rng):
    from alacjax.oracle.encoder import _write_element_header
    cfg = AlacConfig(bit_depth=16, num_channels=1, frame_length=FRAME)
    x = gen_pcm(rng, "sine", 1, FRAME, 16)
    body = ALACEncoder(cfg).encode_packet(x)

    # prepend FIL + DSE elements before the real packet's elements
    bits = BitBuffer(byte_size=len(body) + 64)
    bits.write(int(ElementTag.FIL), 3)
    bits.write(3, 4)                 # count=3
    bits.write(0xABCDEF, 24)         # 3 fill bytes
    bits.write(int(ElementTag.DSE), 3)
    bits.write(0, 4)                 # instance
    bits.write(1, 1)                 # byte-align flag
    bits.write(2, 8)                 # count=2
    bits.byte_align(add_zeros=True)
    bits.write(0xBEEF, 16)           # 2 data bytes
    rd = BitBuffer(body)
    total = len(body) * 8
    while rd.get_position() < total:
        take = min(32, total - rd.get_position())
        bits.write(rd.read(take), take)

    y, _ = ALACDecoder(cfg).decode_packet(bits.to_bytes())
    np.testing.assert_array_equal(y, x)


def test_decoder_fails_closed_on_corrupt_streams(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=FRAME)
    pkt = ALACEncoder(cfg).encode_packet(gen_pcm(rng, "sine", 2, FRAME, 16))
    dec = ALACDecoder(cfg)
    fuzz_rng = np.random.default_rng(7)
    for _ in range(30):
        bad = bytearray(pkt)
        for _ in range(int(fuzz_rng.integers(1, 6))):
            bad[int(fuzz_rng.integers(0, len(bad)))] = int(fuzz_rng.integers(0, 256))
        try:
            dec.decode_packet(bytes(bad))
        except AlacError:
            pass  # typed failure is the contract; crashes are not
    # truncation must also fail closed
    with pytest.raises(AlacError):
        dec.decode_packet(pkt[: len(pkt) // 3])


def test_golden_stream_hash_pinned(rng):
    """Regression pin: until /root/reference materializes, hash-pin our own
    streams (SURVEY.md §4 item 4)."""
    import hashlib
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=FRAME)
    x = gen_pcm(np.random.default_rng(42), "sine", 2, FRAME, 16)
    pkt = ALACEncoder(cfg).encode_packet(x)
    digest = hashlib.sha256(pkt).hexdigest()
    y, _ = ALACDecoder(cfg).decode_packet(pkt)
    np.testing.assert_array_equal(y, x)
    # If this changes intentionally (dialect change), update the pin.
    assert digest == GOLDEN_SINE_16_2_SHA256, digest


# regenerated 2026-08-18: reference-grammar alignment via libavcodec
# interop — mixBits/mixRes present in EVERY element (mono writes 0,0)
# and the two-stage cascade's wire mode is 15 (not 1); see
# tests/test_ffmpeg_interop.py
GOLDEN_SINE_16_2_SHA256 = (
    "6d78c55d44c4fd254568d7c5e8fe8949989c3b823df3f31c951c9a10142cf50d"
)
