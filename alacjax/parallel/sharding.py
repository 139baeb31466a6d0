"""Frame-axis sharding over a device mesh.

Encode/decode kernels are per-frame-lane pure, so a 1-D ``frames`` mesh
axis scales them to N chips with XLA inserting only the input scatter /
output gather.  The packet-table byte-count reduction (the one real
collective in the system, SURVEY.md §5) is exposed as a psum inside the
sharded step so multi-chip compilation exercises ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import AlacConfig
from .. import codec as _codec
from ..codec import FRAMES_AXIS


def frame_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices along the frames axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (FRAMES_AXIS,))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FRAMES_AXIS))


class ShardedCodec(_codec.JaxCodec):
    """Batched codec whose frame batches shard across a device mesh.

    A thin subclass of :class:`alacjax.codec.JaxCodec` with the mesh
    pinned: it inherits the full pipelined host API (``encode_frames``,
    ``encode_frames_ex``, ``decode_frames``, ``decode_frames_ex``) with
    every compiled program sharded over the frames axis, and adds
    ``roundtrip_step`` — the encode→psum→decode 'training step' analog
    used by the multichip dryrun and the sharding tests.  Packet bytes
    are identical to the single-device codec (tested).
    """

    def __init__(self, config: AlacConfig, mesh: Mesh | None = None,
                 chunk: int = _codec.DEFAULT_CHUNK):
        mesh = mesh if mesh is not None else frame_mesh()
        super().__init__(config, chunk=chunk, mesh=mesh)
        S = config.frame_length

        shard = frame_sharding(self.mesh)
        repl = NamedSharding(self.mesh, P())

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

    def roundtrip_step(self, pcm_block):
        """One full sharded encode+decode step (for dryrun/bench)."""
        return self._roundtrip(pcm_block)
