"""pack_fields / unpack_fields / place_segment vs scalar bit packing.

These are the gather/scatter-free building blocks of the generalized
packet assembler (escape bodies, shift-byte blocks at every depth)."""

import numpy as np
import jax.numpy as jnp

from alacjax.ops import bitpack


def _ref_pack(fields, d, W):
    B, F = fields.shape
    out = np.zeros((B, W), dtype=np.uint64)
    for b in range(B):
        acc = 0
        for k in range(F):
            acc = (acc << d) | (int(fields[b, k]) & ((1 << d) - 1))
        acc <<= W * 32 - F * d
        for j in range(W - 1, -1, -1):
            out[b, j] = acc & 0xFFFFFFFF
            acc >>= 32
    return out.astype(np.uint32)


def test_pack_fields_matches_scalar(rng):
    for d in (8, 16, 20, 24, 32, 9, 17, 21, 1):
        for F in (1, 5, 64, 257):
            fields = rng.integers(0, 1 << min(d, 62), (3, F)).astype(
                np.uint64).astype(np.uint32)
            W = (F * d + 31) // 32
            got = np.asarray(bitpack.pack_fields(jnp.asarray(fields), d, W))
            np.testing.assert_array_equal(got, _ref_pack(fields, d, W))


def test_unpack_fields_roundtrip(rng):
    for d in (8, 16, 20, 24, 32, 13):
        F = 193
        fields = rng.integers(0, 1 << min(d, 62), (4, F)).astype(
            np.uint64).astype(np.uint32)
        masked = fields & np.uint32((1 << d) - 1 if d < 32 else 0xFFFFFFFF)
        img = bitpack.pack_fields(jnp.asarray(fields), d)
        back = np.asarray(bitpack.unpack_fields(img, d, F))
        np.testing.assert_array_equal(back, masked)


def test_place_segment_matches_scalar(rng):
    B, W = 6, 9
    words = rng.integers(0, 1 << 32, (B, W)).astype(np.uint64).astype(np.uint32)
    phase = rng.integers(0, 32, (B,)).astype(np.int32)
    phase[0] = 0
    phase[1] = 31
    got = np.asarray(bitpack.place_segment(
        jnp.asarray(words), jnp.asarray(phase)))
    for b in range(B):
        acc = 0
        for j in range(W):
            acc = (acc << 32) | int(words[b, j])
        acc <<= 32 - int(phase[b])
        for j in range(W, -1, -1):
            assert got[b, j] == (acc & 0xFFFFFFFF)
            acc >>= 32


def test_extract_segment_matches_scalar(rng):
    """extract_segment (the decoder's windowed block reader) must cut the
    exact bit range [start, start + 32*num_out) to phase 0, zero-filling
    past the image end."""
    B, W = 5, 12
    words = rng.integers(0, 1 << 32, (B, W)).astype(np.uint64).astype(
        np.uint32)
    starts = np.array([0, 31, 32, 200, 32 * W - 7], dtype=np.int32)
    num_out = 4
    got = np.asarray(bitpack.extract_segment(
        jnp.asarray(words), jnp.asarray(starts), num_out))
    for b in range(B):
        acc = 0
        for j in range(W):
            acc = (acc << 32) | int(words[b, j])
        total = 32 * W
        for j in range(num_out):
            s = int(starts[b]) + 32 * j
            if s >= total:
                want = 0
            elif s + 32 <= total:
                want = (acc >> (total - s - 32)) & 0xFFFFFFFF
            else:  # tail: zero-fill past the image end
                want = (acc << (s + 32 - total)) & 0xFFFFFFFF
            assert got[b, j] == want, (b, j)


def test_extract_segment_inverts_place_segment(rng):
    B, W = 4, 7
    words = rng.integers(0, 1 << 32, (B, W)).astype(np.uint64).astype(
        np.uint32)
    phase = np.array([0, 1, 17, 31], dtype=np.int32)
    placed = bitpack.place_segment(jnp.asarray(words), jnp.asarray(phase))
    back = np.asarray(bitpack.extract_segment(
        placed, jnp.asarray(phase), W))
    np.testing.assert_array_equal(back, words)
