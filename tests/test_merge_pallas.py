"""Pallas merge-compaction kernel == XLA radix shuffle (interpret mode).

The production TPU path uses ops/pallas/merge.py, which the CPU test
tier otherwise never exercises; this locks the kernel to the XLA
formulation on randomized streams satisfying the merge invariant.
"""

import numpy as np
import pytest


@pytest.mark.slow
@pytest.mark.parametrize("B,T,W", [(8, 300, 120), (16, 1000, 380)])
def test_pallas_merge_matches_xla(rng, B, T, W):
    import jax.numpy as jnp

    from alacjax.ops import bitpack
    from alacjax.ops.pallas.merge import merge_compact_pallas

    emit = rng.random((B, T)) < 0.4
    emit &= (np.cumsum(emit, axis=1) - 1) < W
    keys = np.where(emit, np.cumsum(emit, axis=1) - 1,
                    0xFFFFFFFF).astype(np.uint32)
    vals = np.where(emit, rng.integers(0, 2**32, (B, T)),
                    0).astype(np.uint32)

    ref = np.zeros((B, W), np.uint32)
    bi, ti = np.nonzero(emit)
    ref[bi, keys[bi, ti]] = vals[bi, ti]

    got = np.asarray(merge_compact_pallas(
        jnp.asarray(vals), jnp.asarray(keys), W, interpret=True))
    np.testing.assert_array_equal(got, ref)

    # and the XLA fallback path agrees (tails empty)
    tails_v = jnp.zeros((B, 1), jnp.uint32)
    tails_k = jnp.full((B, 1), 0xFFFFFFFF, jnp.uint32)
    import os
    os.environ["ALACJAX_PALLAS_MERGE"] = "0"
    try:
        got2 = np.asarray(bitpack.merge_sorted_chunks(
            jnp.asarray(vals), jnp.asarray(keys), tails_v, tails_k, W))
    finally:
        del os.environ["ALACJAX_PALLAS_MERGE"]
    np.testing.assert_array_equal(got2, ref)
