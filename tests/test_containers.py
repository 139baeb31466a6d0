"""Container conformance + file-level round-trip tests (SURVEY.md §4 item 3)."""

import struct

import numpy as np
import pytest

from alacjax.containers import (
    ber_decode, ber_encode, pack_pcm, read_caf, read_wav, unpack_pcm,
    write_caf, write_wav,
)
from alacjax.containers.caf import CafFile
from alacjax.containers.wav import WavFile
from alacjax.convert import convert_file, decode_caf_to_wav, encode_wav_to_caf
from alacjax.types import AlacParamError
from conftest import gen_pcm


@pytest.mark.parametrize("depth", [16, 20, 24, 32])
@pytest.mark.parametrize("nch", [1, 2, 6])
def test_pcm_pack_unpack_roundtrip(rng, depth, nch):
    x = gen_pcm(rng, "noise", nch, 300, depth)
    wire = pack_pcm(x, depth)
    np.testing.assert_array_equal(unpack_pcm(wire, depth, nch), x)


def test_ber_integers():
    vals = [0, 1, 127, 128, 300, 16383, 16384, 0xFFFFFFFF]
    enc = ber_encode(vals)
    out, used = ber_decode(enc, len(vals))
    assert out == vals and used == len(enc)
    assert ber_encode([127]) == b"\x7f"
    assert ber_encode([128]) == b"\x81\x00"
    assert ber_encode([300]) == b"\x82\x2c"


def test_ber_truncated_fails_closed():
    with pytest.raises(AlacParamError):
        ber_decode(b"\x80", 1)


@pytest.mark.parametrize("depth", [16, 20, 24, 32])
def test_wav_roundtrip(rng, depth):
    x = gen_pcm(rng, "sine", 2, 500, depth)
    wav = WavFile(sample_rate=48000, bit_depth=depth, num_channels=2,
                  data=pack_pcm(x, depth))
    blob = write_wav(wav)
    back = read_wav(blob)
    assert (back.sample_rate, back.bit_depth, back.num_channels) == (48000, depth, 2)
    np.testing.assert_array_equal(unpack_pcm(back.data, depth, 2), x)


def test_wav_16bit_is_plain_pcm_format():
    wav = WavFile(44100, 16, 2, b"\x00" * 8)
    blob = write_wav(wav)
    fmt_at = blob.index(b"fmt ") + 8
    assert struct.unpack_from("<H", blob, fmt_at)[0] == 0x0001


def test_caf_chunk_layout_and_roundtrip(rng):
    packets = [bytes([i]) * (10 + i) for i in range(5)]
    caf = CafFile(sample_rate=44100, bit_depth=16, num_channels=2,
                  frames_per_packet=4096, cookie=b"C" * 24,
                  packets=packets, num_valid_frames=5 * 4096 - 100)
    blob = write_caf(caf)
    assert blob[:4] == b"caff"
    assert struct.unpack_from(">HH", blob, 4) == (1, 0)
    desc_at = blob.index(b"desc") + 12
    rate, fourcc, flags = struct.unpack_from(">d4sI", blob, desc_at)
    assert (rate, fourcc, flags) == (44100.0, b"alac", 1)

    back = read_caf(blob)
    assert back.packets == packets
    assert back.cookie == caf.cookie
    assert back.num_valid_frames == caf.num_valid_frames
    assert back.bit_depth == 16


def test_caf_multichannel_has_chan_chunk():
    caf = CafFile(48000, 24, 6, 4096, b"K" * 48, [b"x"], 10)
    blob = write_caf(caf)
    at = blob.index(b"chan") + 12
    tag = struct.unpack_from(">I", blob, at)[0]
    assert tag == (124 << 16) | 6  # MPEG_5_1_D


def test_caf_rejects_non_alac():
    caf = CafFile(44100, 16, 2, 4096, b"C" * 24, [b"x"], 10)
    blob = bytearray(write_caf(caf))
    at = blob.index(b"desc") + 12 + 8
    blob[at:at + 4] = b"aac "
    with pytest.raises(AlacParamError):
        read_caf(bytes(blob))


@pytest.mark.parametrize("depth", [16, 24])
def test_file_level_roundtrip(rng, depth, tmp_path):
    x = gen_pcm(rng, "sine", 2, 1000, depth)  # 1000 -> partial last packet
    wav_in = tmp_path / "in.wav"
    caf_mid = tmp_path / "mid.caf"
    wav_out = tmp_path / "out.wav"
    write_wav(WavFile(44100, depth, 2, pack_pcm(x, depth)), str(wav_in))

    convert_file(str(wav_in), str(caf_mid), frame_length=256)
    convert_file(str(caf_mid), str(wav_out))

    back = read_wav(str(wav_out))
    np.testing.assert_array_equal(unpack_pcm(back.data, depth, 2), x)
    assert back.sample_rate == 44100 and back.bit_depth == depth


def test_encode_decode_api_roundtrip(rng):
    x = gen_pcm(rng, "impulse", 3, 700, 16)
    wav = WavFile(96000, 16, 3, pack_pcm(x, 16))
    caf = encode_wav_to_caf(wav, frame_length=256)
    assert caf.num_valid_frames == 700
    assert len(caf.cookie) == 48  # >2ch: config + channel atom
    out = decode_caf_to_wav(caf)
    np.testing.assert_array_equal(unpack_pcm(out.data, 16, 3), x)


def test_cli_roundtrip(rng, tmp_path, capsys):
    from alacjax.cli import main
    x = gen_pcm(rng, "sine", 2, 600, 16)
    wav_in = tmp_path / "a.wav"
    write_wav(WavFile(44100, 16, 2, pack_pcm(x, 16)), str(wav_in))
    assert main([str(wav_in), str(tmp_path / "a.caf"), "--frame-size", "256",
                 "--backend", "oracle"]) == 0
    assert main([str(tmp_path / "a.caf"), str(tmp_path / "b.wav"),
                 "--backend", "oracle"]) == 0
    back = read_wav(str(tmp_path / "b.wav"))
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)


def test_cli_bad_direction(tmp_path):
    from alacjax.cli import main
    (tmp_path / "x.mp3").write_bytes(b"junk")
    assert main([str(tmp_path / "x.mp3"), str(tmp_path / "y.caf")]) != 0


def test_cli_exhaustive_search_roundtrip(rng, tmp_path):
    """--search exhaustive (full-rate mixres trials) must round-trip and
    produce a stream no larger than the standard search's."""
    from alacjax.cli import main
    x = gen_pcm(rng, "sine", 2, 900, 16)
    wav_in = tmp_path / "e.wav"
    write_wav(WavFile(44100, 16, 2, pack_pcm(x, 16)), str(wav_in))
    assert main([str(wav_in), str(tmp_path / "std.caf"), "--frame-size",
                 "256", "--backend", "oracle"]) == 0
    assert main([str(wav_in), str(tmp_path / "exh.caf"), "--frame-size",
                 "256", "--search", "exhaustive"]) == 0
    assert main([str(tmp_path / "exh.caf"), str(tmp_path / "e.wav.out"),
                 "--backend", "oracle"]) != 0  # bad extension fails closed
    assert main([str(tmp_path / "exh.caf"), str(tmp_path / "eo.wav"),
                 "--backend", "oracle"]) == 0
    back = read_wav(str(tmp_path / "eo.wav"))
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)
    import os
    assert os.path.getsize(tmp_path / "exh.caf") <= os.path.getsize(
        tmp_path / "std.caf")


# ---------------------------------------------------------------------------
# MP4/M4A container (containers/mp4.py — beyond the reference's WAV<->CAF)
# ---------------------------------------------------------------------------
def test_m4a_roundtrip_preserves_stream(rng):
    from alacjax.containers import read_m4a, write_m4a
    x = gen_pcm(rng, "sine", 2, 1000, 16)  # partial tail packet
    wav = WavFile(44100, 16, 2, pack_pcm(x, 16))
    caf = encode_wav_to_caf(wav, frame_length=256)
    blob = write_m4a(caf)
    back = read_m4a(blob)
    assert back.packets == caf.packets
    assert back.cookie == caf.cookie
    assert back.sample_rate == 44100 and back.bit_depth == 16
    assert back.num_channels == 2 and back.frames_per_packet == 256
    assert back.num_valid_frames == 1000


def test_m4a_box_layout():
    """Structural conformance: ftyp brand, mdat-before-moov, single-chunk
    sample tables, alac cookie box inside the sample entry."""
    import struct as _struct
    from alacjax.containers import write_m4a
    from alacjax.cookie import serialize_cookie
    from alacjax.types import AlacConfig
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=256)
    pkts = [b"A" * 31, b"B" * 17]
    caf = CafFile(44100, 16, 2, 256, serialize_cookie(cfg), pkts, 300)
    blob = write_m4a(caf)
    assert blob[4:8] == b"ftyp" and blob[8:12] == b"M4A "
    ftyp_size = _struct.unpack_from(">I", blob, 0)[0]
    assert blob[ftyp_size + 4: ftyp_size + 8] == b"mdat"
    assert blob[ftyp_size + 8: ftyp_size + 8 + 48] == b"".join(pkts)
    # stco's single offset points exactly at the mdat payload
    i = blob.index(b"stco")
    n, off = _struct.unpack_from(">II", blob, i + 8)
    assert (n, off) == (1, ftyp_size + 8)
    # stsz carries the two packet sizes
    i = blob.index(b"stsz")
    fixed, count, s0, s1 = _struct.unpack_from(">IIII", blob, i + 8)
    assert (fixed, count, s0, s1) == (0, 2, 31, 17)
    # stts: one full packet run + the 44-frame tail
    i = blob.index(b"stts")
    n, c0, d0, c1, d1 = _struct.unpack_from(">IIIII", blob, i + 8)
    assert (n, c0, d0, c1, d1) == (2, 1, 256, 1, 44)


@pytest.mark.parametrize("depth,nch", [(16, 2), (24, 1), (16, 6)])
def test_m4a_file_level_roundtrip(rng, depth, nch, tmp_path):
    x = gen_pcm(rng, "impulse", nch, 900, depth)
    wav_in = tmp_path / "in.wav"
    m4a_mid = tmp_path / "mid.m4a"
    wav_out = tmp_path / "out.wav"
    write_wav(WavFile(48000, depth, nch, pack_pcm(x, depth)), str(wav_in))
    convert_file(str(wav_in), str(m4a_mid), frame_length=256)
    convert_file(str(m4a_mid), str(wav_out))
    back = read_wav(str(wav_out))
    np.testing.assert_array_equal(unpack_pcm(back.data, depth, nch), x)
    assert back.sample_rate == 48000 and back.bit_depth == depth


def test_caf_m4a_repack_is_lossless_and_transcoding_free(rng, tmp_path):
    x = gen_pcm(rng, "sine", 2, 700, 16)
    wav_in = tmp_path / "in.wav"
    write_wav(WavFile(44100, 16, 2, pack_pcm(x, 16)), str(wav_in))
    convert_file(str(wav_in), str(tmp_path / "a.caf"), frame_length=256)
    convert_file(str(tmp_path / "a.caf"), str(tmp_path / "a.m4a"))
    convert_file(str(tmp_path / "a.m4a"), str(tmp_path / "b.caf"))
    a = read_caf(str(tmp_path / "a.caf"))
    b = read_caf(str(tmp_path / "b.caf"))
    assert a.packets == b.packets and a.cookie == b.cookie  # repack, not transcode
    convert_file(str(tmp_path / "b.caf"), str(tmp_path / "out.wav"))
    back = read_wav(str(tmp_path / "out.wav"))
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)


def test_m4a_truncated_and_malformed_fail_closed(rng):
    from alacjax.containers import read_m4a, write_m4a
    x = gen_pcm(rng, "sine", 2, 300, 16)
    wav = WavFile(44100, 16, 2, pack_pcm(x, 16))
    blob = write_m4a(encode_wav_to_caf(wav, frame_length=256))
    with pytest.raises(AlacParamError):
        read_m4a(b"\x00\x00\x00\x08free")          # no moov at all
    with pytest.raises(AlacParamError):
        read_m4a(blob[: len(blob) // 2])            # moov cut off
    # stsz says more bytes than mdat holds -> overrun must raise
    import struct as _struct
    i = blob.index(b"stsz")
    bad = bytearray(blob)
    _struct.pack_into(">I", bad, i + 16, 1 << 30)
    with pytest.raises(AlacParamError):
        read_m4a(bytes(bad))
