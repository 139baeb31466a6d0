"""Random-access reader (alacjax/reader.py).

ALAC packets are stateless, so range reads must equal slices of the full
decode — asserted over packet-boundary-crossing, tail-touching, and
empty/clamped ranges, on CAF and M4A, oracle and (slow tier) jax
backends.
"""

import numpy as np
import pytest

from alacjax import AlacReader
from alacjax.containers.caf import write_caf
from alacjax.containers.pcm import pack_pcm
from alacjax.containers.wav import WavFile, write_wav
from alacjax.convert import encode_wav_to_caf
from alacjax.types import AlacParamError

S = 64
N = 5 * S + 17  # ends in a partial tail


def _fixture(tmp_path, rng, ext: str) -> tuple[str, np.ndarray]:
    t = np.arange(N)
    pcm = np.clip((np.sin(t * 0.04)[None] * 800).astype(np.int64)
                  + rng.integers(-50, 50, (2, N)), -32768, 32767)
    wav = WavFile(44100, 16, 2, pack_pcm(pcm, 16))
    caf = encode_wav_to_caf(wav, frame_length=S, backend="oracle")
    path = str(tmp_path / ("f." + ext))
    if ext == "caf":
        write_caf(caf, path)
    else:
        from alacjax.containers.mp4 import write_m4a
        write_m4a(caf, path)
    return path, pcm


RANGES = [
    (0, None),          # whole stream
    (0, S),             # exactly one packet
    (S - 5, 11),        # crosses one boundary
    (S + 3, 3 * S),     # interior, multi-packet, unaligned both ends
    (5 * S, 17),        # exactly the partial tail
    (5 * S + 10, 100),  # clamped at EOF
    (N, 4),             # at EOF -> empty
    (7, 0),             # empty count
]


@pytest.mark.parametrize("ext", ["caf", "m4a"])
def test_reader_ranges_oracle(tmp_path, rng, ext):
    path, pcm = _fixture(tmp_path, rng, ext)
    r = AlacReader(path)
    assert (len(r), r.num_channels, r.sample_rate, r.bit_depth) == (
        N, 2, 44100, 16)
    for start, count in RANGES:
        got = r.read(start, count)
        end = N if count is None else min(start + count, N)
        np.testing.assert_array_equal(got, pcm[:, start:end],
                                      err_msg=f"range {start}+{count}")
    with pytest.raises(AlacParamError):
        r.read(-1, 5)


def test_reader_from_bytes(tmp_path, rng):
    path, pcm = _fixture(tmp_path, rng, "m4a")
    r = AlacReader(open(path, "rb").read())
    np.testing.assert_array_equal(r.read(S, S), pcm[:, S:2 * S])


@pytest.mark.slow
def test_reader_ranges_jax(tmp_path, rng):
    path, pcm = _fixture(tmp_path, rng, "caf")
    r = AlacReader(path, backend="jax", chunk=4)
    for start, count in RANGES:
        got = r.read(start, count)
        end = N if count is None else min(start + count, N)
        np.testing.assert_array_equal(got, pcm[:, start:end],
                                      err_msg=f"range {start}+{count}")
