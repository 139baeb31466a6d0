"""pack_fields / unpack_fields / place_segment vs scalar bit packing.

These are the gather/scatter-free building blocks of the generalized
packet assembler (escape bodies, shift-byte blocks at every depth)."""

import numpy as np
import pytest
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


def test_combine_chunks_overflow_poisons_lane():
    """Exceeding the dup budget must corrupt LOUDLY, not drop a word.

    Lane 0 stays within max_dups cumulative duplicate extras and must
    reconstruct exactly; lane 1 exceeds the budget and must come back
    bit-inverted (poisoned) rather than silently missing a word.
    """
    W = 6
    max_dups = 2
    # lane 0: keys 0..5 plus 2 duplicate extras (of word 2) -> in budget
    k0 = [0, 1, 2, 2, 2, 3, 4, 5]
    v0 = [10, 11, 4, 4, 4, 13, 14, 15]  # dup values add: word2 = 12
    # lane 1: 3 duplicate extras of word 0 -> word 5 lands at offset 3
    k1 = [0, 0, 0, 0, 1, 2, 3, 4, 5]
    v1 = [1, 1, 1, 1, 21, 22, 23, 24, 25]
    T = max(len(k0), len(k1))
    pad = 0xFFFFFFFF
    keys = np.full((2, T), pad, dtype=np.uint32)
    vals = np.zeros((2, T), dtype=np.uint32)
    keys[0, :len(k0)] = k0; vals[0, :len(v0)] = v0
    keys[1, :len(k1)] = k1; vals[1, :len(v1)] = v1

    out = np.asarray(bitpack.combine_chunks(
        jnp.asarray(keys) * 0 + jnp.asarray(vals),  # ensure jnp inputs
        jnp.asarray(keys), W, max_dups=max_dups))

    assert out[0].tolist() == [10, 11, 12, 13, 14, 15]
    # the over-budget lane is bit-inverted: every word's MSB is set,
    # impossible for the small true values — loud, not a dropped word
    assert (out[1] >> 31 == 1).all(), (
        f"over-budget lane must be poisoned, got {out[1].tolist()}")


def test_host_serializers_match_reference_semantics(rng):
    """words_to_bytes/bytes_to_words (the hot host boundary) against the
    plain astype('>u4') spec, including empty-batch/zero-word/zero-bit
    edges and the oversize guard."""
    from alacjax.ops.bitpack import bytes_to_words, words_to_bytes

    for B, W in ((0, 8), (3, 0), (1, 1), (7, 33), (64, 130)):
        words = rng.integers(0, 2**32, (B, W), dtype=np.uint64).astype(
            np.uint32)
        bits = rng.integers(0, W * 32 + 1, (B,))
        pk = words_to_bytes(words, bits)
        raw = words.astype(">u4").tobytes()
        assert pk == [raw[b * W * 4: b * W * 4 + (int(bits[b]) + 7) // 8]
                      for b in range(B)], (B, W)
        if W:
            wr = bytes_to_words(pk, W)
            full = wr.astype(">u4").tobytes()
            for b in range(B):
                nb = (int(bits[b]) + 7) // 8
                assert full[b * W * 4: b * W * 4 + nb] == pk[b]
    with pytest.raises(ValueError):
        bytes_to_words([b"x" * 9], 2)
