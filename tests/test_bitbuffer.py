"""BitBuffer wire-format unit tests (reference semantics: ALACBitUtilities.c)."""

import numpy as np
import pytest

from alacjax.bitbuffer import BitBuffer
from alacjax.types import AlacParamError


def test_msb_first_order():
    bb = BitBuffer(byte_size=4)
    bb.write(1, 1)       # 1
    bb.write(0, 2)       # 00
    bb.write(0b10110, 5)  # 10110
    assert bb.to_bytes() == bytes([0b10010110])


def test_write_read_roundtrip_random():
    rng = np.random.default_rng(3)
    widths = rng.integers(1, 33, 500)
    values = [int(rng.integers(0, 1 << w)) for w in widths]
    bb = BitBuffer(byte_size=8)
    for v, w in zip(values, widths):
        bb.write(v, int(w))
    rd = BitBuffer(bb.to_bytes())
    for v, w in zip(values, widths):
        assert rd.read(int(w)) == v


def test_byte_align_write_pads_zeros():
    bb = BitBuffer(byte_size=2)
    bb.write(0b111, 3)
    bb.byte_align(add_zeros=True)
    assert bb.get_position() == 8
    assert bb.to_bytes() == bytes([0b11100000])


def test_advance_rewind_position():
    bb = BitBuffer(bytes([0xAB, 0xCD]))
    bb.advance(4)
    assert bb.read(8) == 0xBC
    bb.rewind(8)
    assert bb.read(4) == 0xB


def test_peek_word_zero_pads_past_end():
    bb = BitBuffer(bytes([0xFF]))
    assert bb.peek_word() == 0xFF000000
    bb.advance(4)
    assert bb.peek_word() == 0xF0000000


def test_read_past_end_fails_closed():
    bb = BitBuffer(bytes([0x00]))
    bb.read(8)
    with pytest.raises(AlacParamError):
        bb.read(1)


def test_write_grows_buffer():
    bb = BitBuffer(byte_size=1)
    for _ in range(100):
        bb.write(0x5A, 8)
    assert bb.to_bytes() == bytes([0x5A]) * 100
