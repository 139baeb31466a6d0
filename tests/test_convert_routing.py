"""Backend routing in convert.encode_wav_to_caf (fast tier — the jax
backend is faked, so no device compile)."""

import numpy as np

from alacjax import convert
from alacjax.containers.pcm import pack_pcm
from alacjax.containers.wav import WavFile
from alacjax.oracle import ALACEncoder

S = 64


def _wav(rng, n=3 * S + 5):
    pcm = rng.integers(-500, 500, (2, n))
    return WavFile(44100, 16, 2, pack_pcm(pcm, 16))


def _fake_jax_backend(calls):
    def enc(config, pcm):
        calls.append(config)
        e = ALACEncoder(config, independent_frames=True)
        return [e.encode_packet(pcm[:, o:o + config.frame_length])
                for o in range(0, pcm.shape[1], config.frame_length)]
    return (enc, None)


def test_exhaustive_routes_to_device_when_independent(monkeypatch, rng):
    calls = []
    monkeypatch.setitem(convert._BACKENDS, "jax", _fake_jax_backend(calls))
    caf = convert.encode_wav_to_caf(
        _wav(rng), frame_length=S, backend="jax",
        independent_frames=True, search="exhaustive")
    assert len(calls) == 1 and calls[0].search == "exhaustive"
    assert len(caf.packets) == 4


def test_exhaustive_stateful_stays_on_host(monkeypatch, rng):
    """Without independent frames the persistent-bank host codec runs
    (the device encoder cannot do stateful exhaustive)."""
    calls = []
    monkeypatch.setitem(convert._BACKENDS, "jax", _fake_jax_backend(calls))
    wav = _wav(rng)
    caf = convert.encode_wav_to_caf(wav, frame_length=S, backend="jax",
                                    search="exhaustive")
    assert calls == []  # jax backend untouched
    # bytes == the stateful host exhaustive encoder
    from alacjax.containers.pcm import unpack_pcm
    pcm = unpack_pcm(wav.data, 16, 2)
    enc = ALACEncoder(convert.AlacConfig(
        frame_length=S, bit_depth=16, num_channels=2), search="exhaustive")
    want = [enc.encode_packet(pcm[:, o:o + S])
            for o in range(0, pcm.shape[1], S)]
    assert caf.packets == want


class _Stdin:
    def __init__(self, data):
        import io
        self.buffer = io.BytesIO(data)


class _Stdout:
    def __init__(self):
        import io
        self.buffer = io.BytesIO()


def test_cli_pipe_roundtrip(monkeypatch, rng, tmp_path):
    """'-' paths: wav bytes in -> m4a bytes out -> wav bytes back,
    content-sniffed, lossless."""
    import sys

    from alacjax.cli import main
    from alacjax.containers.pcm import unpack_pcm
    from alacjax.containers.wav import read_wav, write_wav

    wav = _wav(rng)
    wav_bytes = write_wav(wav)

    out1 = _Stdout()
    monkeypatch.setattr(sys, "stdin", _Stdin(wav_bytes))
    monkeypatch.setattr(sys, "stdout", out1)
    assert main(["-", "-", "--to", "m4a", "--frame-size", str(S),
                 "--backend", "oracle"]) == 0
    m4a_bytes = out1.buffer.getvalue()
    assert m4a_bytes[4:8] == b"ftyp"

    out2 = _Stdout()
    monkeypatch.setattr(sys, "stdin", _Stdin(m4a_bytes))
    monkeypatch.setattr(sys, "stdout", out2)
    assert main(["-", "-", "--backend", "oracle"]) == 0
    got = read_wav(out2.buffer.getvalue())
    np.testing.assert_array_equal(
        unpack_pcm(got.data, 16, 2),
        unpack_pcm(wav.data, 16, 2))

    # '-' with a real file on the other side; resume is rejected
    out3 = tmp_path / "p.caf"
    monkeypatch.setattr(sys, "stdin", _Stdin(wav_bytes))
    assert main(["-", str(out3), "--frame-size", str(S),
                 "--backend", "oracle"]) == 0
    assert out3.read_bytes()[:4] == b"caff"
    assert main(["-", "-", "--resume", "--backend", "oracle"]) != 0


def test_cli_pipe_garbage_fails_closed(monkeypatch, rng):
    import sys

    from alacjax.cli import main
    monkeypatch.setattr(sys, "stdin", _Stdin(b"not a container at all"))
    monkeypatch.setattr(sys, "stdout", _Stdout())
    assert main(["-", "-", "--backend", "oracle"]) != 0


def test_cli_check_flag(monkeypatch, rng, tmp_path, capsys):
    """--check decodes the output back and verifies losslessness; a
    corrupted output (simulated via a failing verify target) exits
    nonzero; --check on a decode is rejected."""
    import sys

    from alacjax.cli import main
    from alacjax.containers.wav import write_wav

    wav = _wav(rng)
    src = tmp_path / "c.wav"
    write_wav(wav, str(src))

    out = tmp_path / "c.m4a"
    assert main([str(src), str(out), "--frame-size", str(S),
                 "--backend", "oracle", "--check"]) == 0
    assert "--check OK" in capsys.readouterr().err

    # pipe encode with --check
    out1 = _Stdout()
    monkeypatch.setattr(sys, "stdin", _Stdin(write_wav(wav)))
    monkeypatch.setattr(sys, "stdout", out1)
    assert main(["-", "-", "--to", "caf", "--frame-size", str(S),
                 "--backend", "oracle", "--check"]) == 0
    assert "--check OK" in capsys.readouterr().err

    # batch with --check
    outdir = tmp_path / "b"
    assert main([str(src), "--outdir", str(outdir), "--frame-size", str(S),
                 "--backend", "oracle", "--check"]) == 0
    assert "1 files" in capsys.readouterr().err

    # --check on a decode: rejected
    back = tmp_path / "c2.wav"
    assert main([str(out), str(back), "--backend", "oracle",
                 "--check"]) != 0

    # a check that actually fails: truncate the encoded file's packets
    # by rewriting the source wav AFTER encoding (source != output now)
    _make_other = rng.integers(-500, 500, (2, 3 * S + 5))
    from alacjax.containers.pcm import pack_pcm
    from alacjax.containers.wav import WavFile
    write_wav(WavFile(44100, 16, 2, pack_pcm(_make_other, 16)), str(src))
    assert main([str(src), str(out), "--frame-size", str(S),
                 "--backend", "oracle", "--check"]) == 0  # re-encodes: OK
    write_wav(wav, str(src))  # source changed after encode -> mismatch
    from alacjax.convert import verify_lossless
    from alacjax.types import AlacParamError
    import pytest as _pytest
    with _pytest.raises(AlacParamError, match="lossless check FAILED"):
        verify_lossless(str(src), str(out), backend="oracle")


def test_codec_key_config_normalizes():
    """Cookie-only fields must not fragment the compiled-codec cache."""
    from alacjax.codec import _codec_key_config
    a = convert.AlacConfig(bit_depth=16, num_channels=2, sample_rate=48000,
                           max_frame_bytes=9999, avg_bit_rate=123456)
    b = convert.AlacConfig(bit_depth=16, num_channels=2, sample_rate=96000)
    assert _codec_key_config(a) == _codec_key_config(b)
    c = convert.AlacConfig(bit_depth=16, num_channels=2,
                           search="exhaustive")
    assert _codec_key_config(c) != _codec_key_config(b)  # search is real
