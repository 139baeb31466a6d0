"""Multi-seed stress round-trips over the device codec (regression net for
data-dependent decode/encode bugs; complements the single-seed tests)."""

import numpy as np
import pytest

from alacjax.codec import get_codec
from alacjax.oracle import ALACEncoder
from alacjax.types import AlacConfig
from conftest import gen_pcm

pytestmark = pytest.mark.slow  # device-compile-heavy (fast tier: -m "not slow")

S, NF = 256, 4


@pytest.mark.parametrize("seed_block", [0, 1, 2])
def test_device_decode_of_persistent_streams_many_seeds(seed_block):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    codec = get_codec(cfg, chunk=NF)
    for seed in range(seed_block * 8, seed_block * 8 + 8):
        rng = np.random.default_rng(seed)
        kind = ["sine", "noise", "impulse", "silence"][seed % 4]
        x = np.stack([gen_pcm(rng, kind, 2, S, 16) for _ in range(NF)])
        enc = ALACEncoder(cfg)  # persistent coefficient banks
        pkts = [enc.encode_packet(x[i]) for i in range(NF)]
        y = codec.decode_frames(pkts)
        np.testing.assert_array_equal(y, x, err_msg=f"seed={seed} {kind}")


@pytest.mark.parametrize("seed", [11, 13, 17])
def test_device_roundtrip_mixed_content(seed):
    """Frames mixing content classes inside one batch (forces divergent
    escape/mixres/order selections across lanes in one jit call)."""
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    codec = get_codec(cfg, chunk=4)
    rng = np.random.default_rng(seed)
    x = np.stack([
        gen_pcm(rng, "noise", 2, S, 16),     # escape frame
        gen_pcm(rng, "silence", 2, S, 16),   # zero-run heavy
        gen_pcm(rng, "sine", 2, S, 16),
        gen_pcm(rng, "impulse", 2, S, 16),
    ])
    pkts = codec.encode_frames(x)
    enc = ALACEncoder(cfg, independent_frames=True)
    for i in range(4):
        assert pkts[i] == enc.encode_packet(x[i]), f"frame {i}"
    y = codec.decode_frames(pkts)
    np.testing.assert_array_equal(y, x)


def test_device_roundtrip_pathological_rice_patterns():
    """Patterns aimed at Rice state machine corners: near-boundary runs,
    escape/non-escape alternation, maximal residuals after silence."""
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    codec = get_codec(cfg, chunk=4)
    full = 1 << 15
    frames = []
    x = np.zeros((2, S), np.int64); x[:, ::2] = full - 1; x[:, 1::2] = -full
    frames.append(x)                                   # alternating extremes
    x = np.zeros((2, S), np.int64); x[:, -1] = 1
    frames.append(x)                                   # run to last sample
    x = np.zeros((2, S), np.int64); x[:, 0] = -full
    frames.append(x)                                   # run from second sample
    x = np.zeros((2, S), np.int64)
    x[:, ::16] = np.arange(S // 16) * 1000 % full      # periodic run breaks
    frames.append(x)
    x4 = np.stack(frames)
    pkts = codec.encode_frames(x4)
    enc = ALACEncoder(cfg, independent_frames=True)
    for i in range(4):
        assert pkts[i] == enc.encode_packet(x4[i]), f"frame {i}"
    y = codec.decode_frames(pkts)
    np.testing.assert_array_equal(y, x4)
