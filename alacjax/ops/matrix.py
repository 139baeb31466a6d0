"""Batched stereo decorrelation on device (oracle: alacjax.oracle.matrix;
reference: codec/matrix_enc.c / matrix_dec.c).

Pure elementwise jnp — XLA fuses these into adjacent stages for free.
``mixres``/``mixbits``/``bytes_shifted`` may be scalars or per-frame (B, 1)
arrays (the encoder's winner selection and the decoder's per-frame headers
are data-dependent).  int32 wraparound semantics match the oracle exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .jaxutils import I32


def mix(left, right, mixbits, mixres):
    """U = (mixres*L + ((1<<mixbits)-mixres)*R) >> mixbits, V = L - R;
    pass-through where mixres == 0."""
    l = left.astype(I32)
    r = right.astype(I32)
    mixres = jnp.asarray(mixres, dtype=I32)
    mixbits = jnp.asarray(mixbits, dtype=I32)
    m2 = (jnp.left_shift(jnp.int32(1), mixbits) - mixres).astype(I32)
    u_mixed = jnp.right_shift(mixres * l + m2 * r, mixbits)
    mixed = mixres != 0
    u = jnp.where(mixed, u_mixed, l)
    v = jnp.where(mixed, l - r, r)
    return u, v


def unmix(u, v, mixbits, mixres):
    """R = U - ((mixres*V) >> mixbits), L = V + R; pass-through where
    mixres == 0."""
    u = u.astype(I32)
    v = v.astype(I32)
    mixres = jnp.asarray(mixres, dtype=I32)
    mixbits = jnp.asarray(mixbits, dtype=I32)
    r_mixed = u - jnp.right_shift(mixres * v, mixbits)
    mixed = mixres != 0
    l = jnp.where(mixed, v + r_mixed, u)
    r = jnp.where(mixed, r_mixed, v)
    return l, r


def shift_off(x, bytes_shifted):
    """Split off low bytes: returns (x >> 8*bs, x & mask) — the mask side
    travels as the uint16 shift channel."""
    x = x.astype(I32)
    bs = jnp.asarray(bytes_shifted, dtype=I32)
    shift = bs * 8
    mask = jnp.left_shift(jnp.int32(1), shift) - 1
    return jnp.right_shift(x, shift), x & mask


def shift_in(x, shift_vals, bytes_shifted):
    """Re-insert shifted-off low bytes."""
    bs = jnp.asarray(bytes_shifted, dtype=I32)
    shift = bs * 8
    return jnp.left_shift(x.astype(I32), shift) | shift_vals.astype(I32)
