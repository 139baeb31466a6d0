"""Cross-file batched transcoding (alacjax/batch.py + CLI --outdir).

The batch path must be byte-identical to converting each file alone:
the device encoder is independent-frames, so sharing a device batch
across files cannot change any packet.  Fast tier covers the planning /
grouping / error surface on the oracle backend; the slow tier runs the
real grouped device batches and checks every output CAF's packets
against the per-frame oracle (like test_device_smoke) plus lossless
batch decode.
"""

import numpy as np
import pytest

from alacjax.batch import convert_many
from alacjax.containers.caf import read_caf
from alacjax.containers.pcm import pack_pcm, unpack_pcm
from alacjax.containers.wav import WavFile, read_wav, write_wav
from alacjax.oracle import ALACEncoder
from alacjax.types import AlacConfig, AlacParamError

S = 64


def _make_wav(path, rng, n, nch=2, depth=16, rate=44100):
    full = 1 << (depth - 1)
    t = np.arange(n)
    base = (np.sin(t * 0.05)[None, :] * (full // 64)).astype(np.int64)
    pcm = np.clip(base + rng.integers(-40, 40, (nch, n)), -full, full - 1)
    write_wav(WavFile(sample_rate=rate, bit_depth=depth, num_channels=nch,
                      data=pack_pcm(pcm, depth)), str(path))
    return pcm


def _expected_packets(pcm, cfg):
    enc = ALACEncoder(cfg, independent_frames=True)
    return [enc.encode_packet(pcm[:, o:o + cfg.frame_length])
            for o in range(0, pcm.shape[1], cfg.frame_length)]


def test_batch_oracle_roundtrip(tmp_path, rng):
    """Planning/grouping/IO surface on the oracle backend: batch outputs
    byte-identical to single-file convert_file outputs, then a batch
    decode restores every file's PCM."""
    from alacjax.convert import convert_file

    lens = [2 * S, S + 7, 5, 0]
    srcs, pcms = [], []
    for i, n in enumerate(lens):
        p = tmp_path / f"in{i}.wav"
        pcms.append(_make_wav(p, rng, n))
        srcs.append(str(p))

    outs = convert_many(srcs, str(tmp_path / "enc"), frame_length=S,
                        backend="oracle")
    for i, (src, out) in enumerate(zip(srcs, outs)):
        single = str(tmp_path / f"single{i}.caf")
        convert_file(src, single, frame_length=S, backend="oracle")
        assert open(out, "rb").read() == open(single, "rb").read(), src

    wavs = convert_many(outs, str(tmp_path / "dec"), backend="oracle")
    for pcm, w in zip(pcms, wavs):
        got = read_wav(w)
        np.testing.assert_array_equal(
            unpack_pcm(got.data, got.bit_depth, got.num_channels), pcm)


def test_batch_errors(tmp_path, rng):
    a = tmp_path / "a.wav"
    _make_wav(a, rng, S)
    with pytest.raises(AlacParamError, match="collision"):
        convert_many([str(a), str(a)], str(tmp_path / "o"),
                     backend="oracle")
    with pytest.raises(AlacParamError, match="not a conversion"):
        convert_many([str(a)], str(tmp_path / "o"), to="wav",
                     backend="oracle")
    with pytest.raises(AlacParamError, match="extension"):
        convert_many([str(tmp_path / "x.txt")], str(tmp_path / "o"),
                     backend="oracle")


def test_cli_batch_mode(tmp_path, rng):
    from alacjax.cli import main

    srcs = []
    for i, n in enumerate((S, S + 3)):
        p = tmp_path / f"c{i}.wav"
        _make_wav(p, rng, n)
        srcs.append(str(p))
    out = tmp_path / "out"
    assert main(srcs + ["--outdir", str(out), "--frame-size", str(S),
                        "--backend", "oracle"]) == 0
    assert sorted(f.name for f in out.iterdir()) == ["c0.caf", "c1.caf"]
    # single-file usage still works
    assert main([srcs[0], str(tmp_path / "one.caf"),
                 "--frame-size", str(S), "--backend", "oracle"]) == 0
    assert (tmp_path / "one.caf").exists()


@pytest.mark.slow
def test_batch_device_grouped_byte_parity(tmp_path, rng):
    """The real thing: mixed configs and tail lengths in ONE call, files
    grouped into shared device batches; every output CAF's packets are
    byte-identical to the per-frame oracle, and the batch decode is
    lossless."""
    jobs = [  # (n, nch, depth) — two groups: 16/2 and 24/1; the 16/2
        # group carries ~11 packets so the 4*chunk=8 slice budget flushes
        # MID-GROUP (the bounded-memory streaming path), not just at the end
        (2 * S, 2, 16), (2 * S, 2, 16), (S + 9, 2, 16), (2 * S, 2, 16),
        (7, 2, 16),
        (S + 1, 1, 24), (3 * S, 1, 24),
    ]
    srcs, pcms = [], []
    for i, (n, nch, depth) in enumerate(jobs):
        p = tmp_path / f"g{i}.wav"
        pcms.append(_make_wav(p, rng, n, nch=nch, depth=depth))
        srcs.append(str(p))

    outs = convert_many(srcs, str(tmp_path / "enc"), frame_length=S,
                        backend="jax", chunk=2)
    for (n, nch, depth), src, out, pcm in zip(jobs, srcs, outs, pcms):
        cfg = AlacConfig(frame_length=S, bit_depth=depth, num_channels=nch)
        caf = read_caf(out)
        assert caf.num_valid_frames == n
        assert caf.packets == _expected_packets(pcm, cfg), src

    wavs = convert_many(outs, str(tmp_path / "dec"), backend="jax",
                        chunk=2)
    for (n, nch, depth), pcm, w in zip(jobs, pcms, wavs):
        got = read_wav(w)
        assert (got.bit_depth, got.num_channels) == (depth, nch)
        np.testing.assert_array_equal(
            unpack_pcm(got.data, got.bit_depth, got.num_channels), pcm)


def test_batch_resume_skips_valid_outputs(tmp_path, rng):
    """resume=True redoes only missing/corrupt outputs: completed files
    keep their bytes (and mtimes), a truncated output is rewritten."""
    import os
    import time

    srcs = []
    for i in range(3):
        p = tmp_path / f"r{i}.wav"
        _make_wav(p, rng, S + i)
        srcs.append(str(p))
    out = tmp_path / "enc"
    outs = convert_many(srcs, str(out), frame_length=S, backend="oracle")
    # corrupt one output, delete another
    with open(outs[1], "wb") as f:
        f.write(b"caff\x00\x01trunc")
    os.remove(outs[2])
    mtime0 = os.path.getmtime(outs[0])
    time.sleep(0.05)
    outs2 = convert_many(srcs, str(out), frame_length=S, backend="oracle",
                         resume=True)
    assert outs2 == outs
    assert os.path.getmtime(outs[0]) == mtime0  # untouched
    single = str(tmp_path / "single1.caf")
    from alacjax.convert import convert_file
    convert_file(srcs[1], single, frame_length=S, backend="oracle")
    assert open(outs[1], "rb").read() == open(single, "rb").read()
    assert os.path.exists(outs[2])


def test_probe_wav_matches_read_wav(tmp_path, rng):
    from alacjax.containers.wav import probe_wav, read_wav

    for i, (n, nch, depth) in enumerate([(S + 3, 2, 16), (5, 1, 24),
                                         (0, 2, 32), (2 * S, 6, 20)]):
        p = tmp_path / f"p{i}.wav"
        _make_wav(p, rng, n, nch=nch, depth=depth)
        info = probe_wav(str(p))
        w = read_wav(str(p))
        assert (info.bit_depth, info.num_channels, info.sample_rate) == (
            w.bit_depth, w.num_channels, w.sample_rate)
        assert info.num_samples == w.num_frames == n


def test_batch_many_files_oracle_matches_single(tmp_path, rng):
    """Planning over many files (header probes + grouping) on the oracle
    backend; slicing itself is a jax-path feature covered by the
    slow-tier device test."""
    from alacjax.convert import convert_file

    srcs = []
    for i in range(6):
        p = tmp_path / f"s{i}.wav"
        _make_wav(p, rng, S + 11 * i)
        srcs.append(str(p))
    outs = convert_many(srcs, str(tmp_path / "enc"), frame_length=S,
                        backend="oracle")
    for i, (src, out) in enumerate(zip(srcs, outs)):
        single = str(tmp_path / f"sg{i}.caf")
        convert_file(src, single, frame_length=S, backend="oracle")
        assert open(out, "rb").read() == open(single, "rb").read(), src
