"""Frame-axis sharding over a device mesh.

Encode/decode kernels are per-frame-lane pure, so a 1-D ``frames`` mesh
axis scales them to N chips with XLA inserting only the input scatter /
output gather.  The packet-table byte-count reduction (the one real
collective in the system, SURVEY.md §5) is exposed as a psum inside the
sharded step so multi-chip compilation exercises ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import AlacConfig
from .. import codec as _codec

FRAMES_AXIS = "frames"


def frame_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices along the frames axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (FRAMES_AXIS,))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FRAMES_AXIS))


class ShardedCodec:
    """Batched codec whose frame batches shard across a device mesh.

    The per-chunk batch must be a multiple of the mesh size; the host
    stream API in alacjax.codec pads chunks, so this holds by construction
    when chunk % n_devices == 0.
    """

    def __init__(self, config: AlacConfig, mesh: Mesh | None = None,
                 chunk: int = _codec.DEFAULT_CHUNK):
        self.mesh = mesh if mesh is not None else frame_mesh()
        n = self.mesh.size
        if chunk % n:
            chunk = ((chunk + n - 1) // n) * n
        self.config = config
        self.chunk = chunk
        S = config.frame_length
        self.num_words = (config.max_escape_packet_bytes(S) + 3) // 4 + 2

        shard = frame_sharding(self.mesh)
        repl = NamedSharding(self.mesh, P())

        def encode_step(pcm):
            words, bits = _codec.encode_frames_device(
                pcm, config=config, num_words=self.num_words)
            return words, bits

        def decode_step(words):
            pcm, err, _num = _codec.decode_frames_device(
                words, config=config, num_samples=S)
            return pcm, err

        self._encode = jax.jit(
            encode_step,
            in_shardings=(shard,),
            out_shardings=(shard, shard),
        )
        self._decode = jax.jit(
            decode_step,
            in_shardings=(shard,),
            out_shardings=(shard, shard),
        )

        def train_step(pcm):
            """Full round-trip step: encode -> byte stats psum -> decode.

            This is the 'training step' analog for the codec: the complete
            compute pipeline plus the only collective the system needs
            (packet-table byte accounting over the frames axis).  Returns
            the encoded words/bits too so callers can assert byte-parity
            against the host implementations without a second program.
            """
            words, bits = _codec.encode_frames_device(
                pcm, config=config, num_words=self.num_words)
            decoded, err, _num = _codec.decode_frames_device(
                words, config=config, num_samples=S)
            total_bytes = jnp.sum((bits + 7) // 8)
            mismatch = jnp.sum((decoded != pcm.astype(jnp.int32))
                               .astype(jnp.int32))
            return decoded, words, bits, total_bytes, mismatch, err

        self._roundtrip = jax.jit(
            train_step,
            in_shardings=(shard,),
            out_shardings=(shard, shard, shard, repl, repl, shard),
        )

    # -- host API --------------------------------------------------------
    def encode_frames(self, pcm: np.ndarray):
        from ..ops import bitpack
        nf = pcm.shape[0]
        packets = []
        for off in range(0, nf, self.chunk):
            block = pcm[off:off + self.chunk]
            n = block.shape[0]
            if n < self.chunk:
                block = np.concatenate(
                    [block, np.zeros((self.chunk - n,) + block.shape[1:],
                                     dtype=block.dtype)], axis=0)
            words, bits = self._encode(jnp.asarray(block.astype(np.int32)))
            packets.extend(bitpack.words_to_bytes(
                np.asarray(words)[:n], np.asarray(bits)[:n]))
        return packets

    def roundtrip_step(self, pcm_block):
        """One full sharded encode+decode step (for dryrun/bench)."""
        return self._roundtrip(pcm_block)
