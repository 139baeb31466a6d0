"""Magic-cookie conformance tests (layout per ALACMagicCookieDescription.txt;
SURVEY.md §4 item 3)."""

import pytest

from alacjax.cookie import parse_cookie, serialize_cookie, cookie_size
from alacjax.types import AlacConfig, AlacParamError, kALACChannelLayoutTag_MPEG_5_1_D


def test_stereo_cookie_is_24_bytes_big_endian():
    cfg = AlacConfig(frame_length=4096, bit_depth=16, num_channels=2,
                     sample_rate=44100, max_frame_bytes=0x1234, avg_bit_rate=0x5678)
    raw = serialize_cookie(cfg)
    assert len(raw) == 24 == cookie_size(2)
    assert raw[0:4] == (4096).to_bytes(4, "big")      # frameLength
    assert raw[4] == 0                                 # compatibleVersion
    assert raw[5] == 16                                # bitDepth
    assert raw[6:9] == bytes([40, 10, 14])             # pb, mb, kb
    assert raw[9] == 2                                 # numChannels
    assert raw[10:12] == (255).to_bytes(2, "big")      # maxRun
    assert raw[12:16] == (0x1234).to_bytes(4, "big")   # maxFrameBytes
    assert raw[16:20] == (0x5678).to_bytes(4, "big")   # avgBitRate
    assert raw[20:24] == (44100).to_bytes(4, "big")    # sampleRate


def test_multichannel_cookie_has_channel_atom():
    cfg = AlacConfig(bit_depth=24, num_channels=6, sample_rate=48000)
    raw = serialize_cookie(cfg)
    assert len(raw) == 48 == cookie_size(6)
    atom = raw[24:]
    assert atom[0:4] == (24).to_bytes(4, "big")
    assert atom[4:8] == b"chan"
    assert atom[12:16] == kALACChannelLayoutTag_MPEG_5_1_D.to_bytes(4, "big")


@pytest.mark.parametrize("nch", [1, 2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("depth", [16, 20, 24, 32])
def test_cookie_roundtrip(nch, depth):
    cfg = AlacConfig(bit_depth=depth, num_channels=nch, sample_rate=96000,
                     frame_length=2048)
    out = parse_cookie(serialize_cookie(cfg))
    assert out == cfg


def test_cookie_accepts_frma_alac_atom_wrappers():
    cfg = AlacConfig(bit_depth=16, num_channels=2)
    core = serialize_cookie(cfg)
    wrapped = (
        (len(core) + 24).to_bytes(4, "big") + b"frma" + b"alac"
        + (len(core) + 12).to_bytes(4, "big") + b"alac" + (0).to_bytes(4, "big")
        + core
    )
    assert parse_cookie(wrapped) == cfg


def test_cookie_rejects_bad_version():
    cfg = AlacConfig(bit_depth=16, num_channels=2)
    raw = bytearray(serialize_cookie(cfg))
    raw[4] = 1  # compatibleVersion
    with pytest.raises(AlacParamError):
        parse_cookie(bytes(raw))


def test_cookie_rejects_truncated():
    with pytest.raises(AlacParamError):
        parse_cookie(b"\x00" * 10)
