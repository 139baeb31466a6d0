"""Device-batched exhaustive search (config.search == "exhaustive").

The host exhaustive path prices every mixres at full rate SERIALLY
(oracle/encoder.py :: _encode_cpe mix_list branch; reference semantics:
EncodeStereo's kMaxRes loop); the device path stacks the whole
(mixres x order x stage) candidate grid into the ONE dual-cost scan the
standard search already runs.  Byte-identity against the stateless host
exhaustive encoder is the gate, across depths, partial tails, escape
content, and multichannel layouts.
"""

import numpy as np
import pytest

from alacjax.codec import JaxCodec
from alacjax.oracle import ALACEncoder
from alacjax.types import AlacConfig, AlacParamError

pytestmark = pytest.mark.slow

S = 256
B = 8


def _stereoish(rng, nch, n, depth, corr):
    """Content whose stereo correlation varies: exercises every mixres."""
    full = 1 << (depth - 1)
    base = (np.sin(np.arange(n) * 0.03) * (full // 8)).astype(np.int64)
    chans = []
    for c in range(nch):
        mixed = corr * base + (1 - corr) * rng.integers(
            -full // 8, full // 8, n)
        chans.append(np.clip(mixed + rng.integers(-50, 50, n),
                             -full, full - 1).astype(np.int64))
    return np.stack(chans)


def _assert_device_matches_oracle(cfg, x, nums=None):
    codec = JaxCodec(cfg, chunk=x.shape[0])
    enc = ALACEncoder(cfg, independent_frames=True)  # inherits cfg.search
    assert enc.search == "exhaustive"
    if nums is None:
        pkts = codec.encode_frames(x)
        want = [enc.encode_packet(x[i]) for i in range(x.shape[0])]
    else:
        pkts = codec.encode_frames_ex(x, nums)
        want = [enc.encode_packet(x[i, :, :nums[i]])
                for i in range(x.shape[0])]
    for i, (got, exp) in enumerate(zip(pkts, want)):
        assert got == exp, f"frame {i}"
    return pkts


@pytest.mark.parametrize("depth,nch", [(16, 2), (24, 2), (16, 6)])
def test_exhaustive_device_byte_parity(rng, depth, nch):
    cfg = AlacConfig(bit_depth=depth, num_channels=nch, frame_length=S,
                     search="exhaustive")
    x = np.stack([_stereoish(rng, nch, S, depth, corr=c / (B - 1))
                  for c in range(B)])
    pkts = _assert_device_matches_oracle(cfg, x)
    # decode is search-agnostic: standard decoder restores the PCM
    y = JaxCodec(cfg, chunk=B).decode_frames(pkts)
    np.testing.assert_array_equal(y, x)


def test_exhaustive_device_partial_tails_and_escape(rng):
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                     search="exhaustive")
    full = 1 << 15
    x = np.stack([_stereoish(rng, 2, S, 16, corr=0.4) for _ in range(B)])
    x[1] = rng.integers(-full, full, (2, S))      # noise -> escape
    x[3] = rng.integers(-full, full, (2, S))
    nums = np.full(B, S, np.int32)
    nums[2] = S // 3 + 1                          # partial tails
    nums[5] = 1
    for b in range(B):
        x[b, :, nums[b]:] = 0
    _assert_device_matches_oracle(cfg, x, nums)


def test_exhaustive_picks_at_least_as_small_as_standard(rng):
    """Exhaustive may only improve the rate (it searches a superset)."""
    x = np.stack([_stereoish(rng, 2, S, 16, corr=c / (B - 1))
                  for c in range(B)])
    std = JaxCodec(AlacConfig(bit_depth=16, num_channels=2, frame_length=S),
                   chunk=B).encode_frames(x)
    exh = JaxCodec(AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                              search="exhaustive"), chunk=B).encode_frames(x)
    assert sum(map(len, exh)) <= sum(map(len, std))


def test_exhaustive_stream_banks_rejected():
    from alacjax.codec import encode_streams
    cfg = AlacConfig(bit_depth=16, num_channels=1, frame_length=64,
                     search="exhaustive")
    with pytest.raises(AlacParamError, match="independent-frames"):
        encode_streams(np.zeros((1, 2, 1, 64), np.int32), cfg)
