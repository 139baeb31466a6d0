"""Pallas kernel bit-exactness vs the scan/oracle (interpret mode on CPU;
the same kernel compiles and matches on TPU — see ops/pallas docstrings)."""

import numpy as np
import pytest
import jax.numpy as jnp

from alacjax.oracle import dp
from alacjax.ops import predict
from alacjax.ops.pallas.predict_pallas import LANE_TILE, S_CHUNK, pc_block_pallas

pytestmark = pytest.mark.slow  # device-compile-heavy (fast tier: -m "not slow")


@pytest.mark.parametrize("order", [4, 8])
def test_pallas_predictor_matches_scan_and_oracle(rng, order):
    B, S = LANE_TILE, S_CHUNK
    x = rng.integers(-30000, 30000, (B, S)).astype(np.int32)
    c0 = np.tile(np.asarray(dp.init_coefs(9), dtype=np.int32), (B, 1))
    r_p, c_p = pc_block_pallas(jnp.asarray(x), jnp.asarray(c0), order, 17, 9,
                               interpret=True)
    r_s, c_s = predict.pc_block(jnp.asarray(x), jnp.asarray(c0), order, 17, 9)
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_s))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_s))
    # spot-check one lane against the scalar oracle
    c_oracle = dp.init_coefs(9)
    r_oracle = dp.pc_block(x[3].astype(np.int64), c_oracle, order, 17, 9)
    np.testing.assert_array_equal(np.asarray(r_p)[3], r_oracle)
    np.testing.assert_array_equal(np.asarray(c_p)[3, :], c_oracle)


def test_pallas_multi_chunk_state_carry(rng):
    """State must persist across sample chunks (the scratch carry)."""
    B, S = LANE_TILE, 3 * S_CHUNK
    x = rng.integers(-2000, 2000, (B, S)).astype(np.int32)
    c0 = np.tile(np.asarray(dp.init_coefs(9), dtype=np.int32), (B, 1))
    r_p, c_p = pc_block_pallas(jnp.asarray(x), jnp.asarray(c0), 8, 17, 9,
                               interpret=True)
    r_s, c_s = predict.pc_block(jnp.asarray(x), jnp.asarray(c0), 8, 17, 9)
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_s))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_s))
