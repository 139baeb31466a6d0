"""Native C++ host codec: byte parity with the oracle and round-trips.

The native codec is a third independent implementation (oracle python,
JAX device, C++), so byte-for-byte agreement is strong evidence the
dialect is self-consistent (SURVEY.md §4 item 5 cross-implementation
strategy)."""

import numpy as np
import pytest

from alacjax.oracle import ALACDecoder, ALACEncoder
from alacjax.types import AlacConfig, AlacError
from conftest import gen_pcm

native = pytest.importorskip("alacjax.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}")

S = 320


@pytest.mark.parametrize("depth", [16, 20, 24, 32])
@pytest.mark.parametrize("nch", [1, 2, 6, 8])
@pytest.mark.parametrize("kind", ["sine", "noise", "silence", "impulse"])
def test_native_packets_byte_identical_to_oracle(rng, depth, nch, kind):
    cfg = AlacConfig(bit_depth=depth, num_channels=nch, frame_length=S)
    x = gen_pcm(rng, kind, nch, S, depth)
    ne = native.NativeEncoder(cfg)
    oe = ALACEncoder(cfg)
    for _ in range(2):  # persistent coef banks must evolve identically
        assert ne.encode_packet(x) == oe.encode_packet(x)


def test_native_independent_frames_matches_oracle(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    x = gen_pcm(rng, "sine", 2, S, 16)
    a = native.NativeEncoder(cfg, independent_frames=True)
    b = ALACEncoder(cfg, independent_frames=True)
    assert a.encode_packet(x) == b.encode_packet(x)
    assert a.encode_packet(x) == a.encode_packet(x)  # stateless


@pytest.mark.parametrize("depth", [16, 24, 32])
def test_native_decode_roundtrip_and_cross(rng, depth):
    cfg = AlacConfig(bit_depth=depth, num_channels=2, frame_length=S)
    x = gen_pcm(rng, "impulse", 2, S, depth)
    pkt = native.NativeEncoder(cfg).encode_packet(x)
    y, got = native.NativeDecoder(cfg).decode_packet(pkt)
    assert got == S
    np.testing.assert_array_equal(y, x)
    # cross: oracle decodes native packets; native decodes oracle packets
    yo, _ = ALACDecoder(cfg).decode_packet(pkt)
    np.testing.assert_array_equal(yo, x)
    opkt = ALACEncoder(cfg).encode_packet(x)
    yn, _ = native.NativeDecoder(cfg).decode_packet(opkt)
    np.testing.assert_array_equal(yn, x)


def test_native_partial_frame(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    x = gen_pcm(rng, "sine", 2, 99, 16)
    pkt = native.NativeEncoder(cfg).encode_packet(x)
    assert pkt == ALACEncoder(cfg).encode_packet(x)
    y, got = native.NativeDecoder(cfg).decode_packet(pkt, num_samples=99)
    assert got == 99
    np.testing.assert_array_equal(y, x)


def test_native_fails_closed(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    x = gen_pcm(rng, "sine", 2, S, 16)
    pkt = native.NativeEncoder(cfg).encode_packet(x)
    dec = native.NativeDecoder(cfg)
    with pytest.raises(AlacError):
        dec.decode_packet(pkt[:5])
    fuzz = np.random.default_rng(3)
    for _ in range(50):
        bad = bytearray(pkt)
        for _ in range(int(fuzz.integers(1, 8))):
            bad[int(fuzz.integers(0, len(bad)))] = int(fuzz.integers(0, 256))
        try:
            dec.decode_packet(bytes(bad))
        except AlacError:
            pass  # typed error is the contract; segfault is not
