#!/usr/bin/env python
"""A/B: sort-based combine_chunks vs searchsorted compaction vs radix
shuffle, on inputs matching the NEW invariant (per-lane strictly
increasing keys, gapless word coverage, no dups — dups become tail
words OR'd separately)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (script lives in tools/)
import sys
import time

import numpy as np


def main():
    import jax, os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from alacjax.ops import bitpack
    from alacjax.ops.jaxutils import I32, U32, iota1

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    T = 16431
    W = 6152

    rng = np.random.default_rng(0)
    # strictly-increasing sparse keys covering [0, nw) per lane
    emit = rng.random((B, T)) < 0.375
    emit &= (np.cumsum(emit, axis=1) - 1) < W      # cap coverage at W words
    keys = np.where(emit, np.cumsum(emit, axis=1) - 1, 0).astype(np.uint32)
    keys = np.where(emit, keys, 0xFFFFFFFF).astype(np.uint32)
    vals = np.where(emit, rng.integers(0, 2**32, (B, T)), 0).astype(np.uint32)

    keys_d = jnp.asarray(keys)
    vals_d = jnp.asarray(vals)

    # reference (numpy)
    ref = np.zeros((B, W), np.uint32)
    bi, ti = np.nonzero(emit)
    ref[bi, keys[bi, ti]] = vals[bi, ti]

    def timeit(name, fn, *args):
        out = jax.jit(fn).lower(*args).compile()
        r = np.asarray(out(*args))
        ok = (r == ref).all()
        # chained timing: one dispatch loop, single block at the end
        t0 = time.time()
        rs = [out(*args) for _ in range(iters)]
        for x in rs:
            x.block_until_ready()
        dt = (time.time() - t0) / iters * 1000
        print(f"{name:42s} {dt:8.2f} ms  correct={ok}")
        return dt

    # A: current production path
    def sort_combine(v, k):
        return bitpack.combine_chunks(v, k, W, max_dups=8)
    timeit("A sort+dedup combine_chunks", sort_combine, vals_d, keys_d)

    # B: searchsorted compaction (cumsum + binary search + one gather)
    def search_compact(v, k):
        nonempty = (k != jnp.uint32(0xFFFFFFFF)).astype(I32)
        c = jnp.cumsum(nonempty, axis=1)              # inclusive
        flat_c = c.reshape(-1)
        flat_v = v.reshape(-1)
        rows = iota1(B)[:, None] * T
        w = iota1(W, I32)[None, :]
        target = w + 1
        lo = jnp.broadcast_to(w, (B, W))              # c[j] <= j+1 -> src >= w
        hi = jnp.full((B, W), T, I32)
        # find first j with c[j] >= target
        for _ in range(15):
            mid = (lo + hi) >> 1
            cm = flat_c[rows + jnp.minimum(mid, T - 1)]
            ge = cm >= target
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        covered = target <= c[:, -1:]
        out = flat_v[rows + jnp.minimum(lo, T - 1)]
        return jnp.where(covered, out, 0)
    timeit("B cumsum+searchsorted+gather", search_compact, vals_d, keys_d)

    # B2: same but binary search over halved range via 2x subsampled
    # first stage (coarse 64-blocks then fine)
    def search_compact2(v, k):
        nonempty = (k != jnp.uint32(0xFFFFFFFF)).astype(I32)
        c = jnp.cumsum(nonempty, axis=1)
        K = 64
        nb = (T + K - 1) // K
        cb = c[:, K - 1::K]                            # (B, nb) block cum
        if cb.shape[1] < nb:
            cb = jnp.pad(cb, ((0, 0), (0, nb - cb.shape[1])),
                         constant_values=T)
        flat_cb = cb.reshape(-1)
        rows_b = iota1(B)[:, None] * nb
        w = iota1(W, I32)[None, :]
        target = w + 1
        lo = jnp.zeros((B, W), I32)
        hi = jnp.full((B, W), nb, I32)
        for _ in range(9):                             # log2(257)
            mid = (lo + hi) >> 1
            cm = flat_cb[rows_b + jnp.minimum(mid, nb - 1)]
            ge = cm >= target
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        # fine: search inside block lo (K slots)
        flat_c = c.reshape(-1)
        flat_v = v.reshape(-1)
        rows = iota1(B)[:, None] * T
        flo = lo * K
        fhi = jnp.minimum(flo + K, T)
        for _ in range(6):                             # log2(64)
            mid = (flo + fhi) >> 1
            cm = flat_c[rows + jnp.minimum(mid, T - 1)]
            ge = cm >= target
            fhi = jnp.where(ge, mid, fhi)
            flo = jnp.where(ge, flo, mid + 1)
        covered = target <= c[:, -1:]
        out = flat_v[rows + jnp.minimum(flo, T - 1)]
        return jnp.where(covered, out, 0)
    timeit("B2 two-level search (64-blocks)", search_compact2, vals_d, keys_d)

    # C: radix-shuffle compaction (LSB-first collision-free moves)
    def radix_compact(v, k):
        nonempty = k != jnp.uint32(0xFFFFFFFF)
        c_ex = jnp.cumsum(nonempty.astype(I32), axis=1) - nonempty
        j = iota1(T, I32)[None, :]
        rem = jnp.where(nonempty, j - c_ex, 0)         # displacement
        val = v
        p = 1
        while p < T:
            bit = jnp.int32(p)
            move = (rem & bit) != 0
            stay_v = jnp.where(move, 0, val)
            stay_r = jnp.where(move, 0, rem)
            arr_v = jnp.pad(jnp.where(move, val, 0)[:, p:], ((0, 0), (0, p)))
            arr_r = jnp.pad(jnp.where(move, rem - bit, 0)[:, p:],
                            ((0, 0), (0, p)))
            arrived = jnp.pad(move[:, p:], ((0, 0), (0, p)))
            val = stay_v | arr_v
            rem = jnp.where(arrived, arr_r, stay_r)
            p <<= 1
        return val[:, :W]
    timeit("C radix-shuffle compaction", radix_compact, vals_d, keys_d)


if __name__ == "__main__":
    main()
