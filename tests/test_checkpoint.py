"""Checkpoint/resume at packet-shard granularity (SURVEY.md §5: preempted
batch jobs resume without redoing or corrupting finished work)."""

import os

import numpy as np
import pytest

from alacjax import checkpoint
from alacjax.containers import pack_pcm, read_caf, read_wav, unpack_pcm, write_wav
from alacjax.containers.wav import WavFile
from alacjax.convert import decode_caf_to_wav
from conftest import gen_pcm

S = 128


def _make_wav(rng, path, n=S * 7 + 50):
    x = gen_pcm(rng, "sine", 2, n, 16)
    write_wav(WavFile(44100, 16, 2, pack_pcm(x, 16)), str(path))
    return x


def test_resumable_encode_roundtrip(rng, tmp_path):
    wav = tmp_path / "in.wav"
    out = tmp_path / "out.caf"
    x = _make_wav(rng, wav)
    st = checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                     backend="oracle", chunk_frames=2)
    assert st.frames_done == st.num_frames == 7
    checkpoint.finalize(str(wav), str(out), backend="oracle")
    assert not os.path.exists(str(out) + ".journal")
    back = decode_caf_to_wav(read_caf(str(out)), backend="oracle")
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)


def test_resume_after_injected_failure(rng, tmp_path):
    wav = tmp_path / "in.wav"
    out = tmp_path / "out.caf"
    x = _make_wav(rng, wav)
    with pytest.raises(RuntimeError, match="injected"):
        checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                    backend="oracle", chunk_frames=2,
                                    _fail_after_chunks=2)
    st = checkpoint.load_state(str(out))
    assert st.frames_done == 4  # two chunks of two frames survived
    # resume completes without redoing finished chunks
    st = checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                     backend="oracle", chunk_frames=2)
    assert st.frames_done == 7
    checkpoint.finalize(str(wav), str(out), backend="oracle")
    back = decode_caf_to_wav(read_caf(str(out)), backend="oracle")
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)


def test_resume_survives_torn_tail(rng, tmp_path):
    """A crash mid-append (torn packet bytes) must roll back to the last
    consistent packet, not corrupt the stream."""
    wav = tmp_path / "in.wav"
    out = tmp_path / "out.caf"
    x = _make_wav(rng, wav)
    with pytest.raises(RuntimeError):
        checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                    backend="oracle", chunk_frames=2,
                                    _fail_after_chunks=2)
    # simulate torn write: chop bytes off the packet journal
    pp = str(out) + ".packets"
    with open(pp, "r+b") as f:
        f.truncate(os.path.getsize(pp) - 3)
    st = checkpoint.load_state(str(out))
    assert st.frames_done == 3  # last packet rolled back
    checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                backend="oracle", chunk_frames=2)
    checkpoint.finalize(str(wav), str(out), backend="oracle")
    back = decode_caf_to_wav(read_caf(str(out)), backend="oracle")
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)


def test_config_change_restarts(rng, tmp_path):
    wav = tmp_path / "in.wav"
    out = tmp_path / "out.caf"
    _make_wav(rng, wav)
    with pytest.raises(RuntimeError):
        checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                    backend="oracle", chunk_frames=2,
                                    _fail_after_chunks=1)
    # different frame length -> journal invalidated, restart from zero
    st = checkpoint.resumable_encode(str(wav), str(out), frame_length=64,
                                     backend="oracle", chunk_frames=4)
    assert st.num_frames == (S * 7 + 50) // 64
    assert st.frames_done == st.num_frames


def test_resumable_encode_to_m4a(rng, tmp_path):
    """finalize picks the container by output extension: .m4a goes
    through containers/mp4.py with the same journal machinery."""
    from alacjax.containers import read_m4a

    wav = tmp_path / "in.wav"
    out = tmp_path / "out.m4a"
    x = _make_wav(rng, wav)
    checkpoint.resumable_encode(str(wav), str(out), frame_length=S,
                                backend="oracle", chunk_frames=3)
    checkpoint.finalize(str(wav), str(out), backend="oracle")
    assert not os.path.exists(str(out) + ".journal")
    back = decode_caf_to_wav(read_m4a(str(out)), backend="oracle")
    np.testing.assert_array_equal(unpack_pcm(back.data, 16, 2), x)
