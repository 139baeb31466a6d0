"""Multi-device frame-sharding tests on the simulated 8-device CPU mesh
(SURVEY.md §4 item 6)."""

import numpy as np
import pytest
import jax

from alacjax.parallel import ShardedCodec, frame_mesh
from alacjax.types import AlacConfig
from conftest import gen_pcm

pytestmark = pytest.mark.slow  # device-compile-heavy (fast tier: -m "not slow")


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU simulation")
    return frame_mesh(devs)


def test_mesh_has_8_simulated_devices():
    assert len(jax.devices()) == 8


def test_sharded_roundtrip_step_lossless(rng, mesh):
    S = 128
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                     fast_mode=True)
    codec = ShardedCodec(cfg, mesh=mesh, chunk=mesh.size * 2)
    B = mesh.size * 2
    pcm = np.stack([gen_pcm(rng, "sine", 2, S, 16) for _ in range(B)])
    decoded, _, _, total_bytes, mismatch, err = codec.roundtrip_step(
        pcm.astype(np.int32))
    assert int(mismatch) == 0
    assert not np.asarray(err).any()
    assert int(total_bytes) > 0


def test_sharded_encode_matches_single_device(rng, mesh):
    """Sharding must not change a single packet byte."""
    from alacjax.codec import get_codec
    S = 128
    cfg = AlacConfig(bit_depth=16, num_channels=2, frame_length=S)
    B = mesh.size * 2
    pcm = np.stack([gen_pcm(rng, "sine", 2, S, 16) for _ in range(B)])
    sharded = ShardedCodec(cfg, mesh=mesh, chunk=B).encode_frames(pcm)
    single = get_codec(cfg, chunk=B).encode_frames(pcm)
    assert sharded == single


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(min(8, len(jax.devices())))
