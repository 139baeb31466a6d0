#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (script lives in tools/)
"""A/B: sort-based combine_chunks vs sorted scatter-add merge."""
import sys
import time

import numpy as np


def main():
    import jax, os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp
    from alacjax.ops import bitpack

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    S = 4096
    Tr = 2 * (S + 1)          # one rice stream's slots
    W = 6152

    rng = np.random.default_rng(0)
    # realistic per-channel streams: dense sorted keys (dups where the
    # accumulator didn't complete a word), ~35% completion rate
    def gen_stream(base):
        emit = rng.random((B, Tr)) < 0.35
        wc = np.cumsum(emit, axis=1) - emit
        keys = (base[:, None] + wc).astype(np.uint32)
        vals = np.where(emit, rng.integers(0, 2**32, (B, Tr)), 0).astype(np.uint32)
        return keys, vals

    base0 = rng.integers(3, 5, B)
    k0, v0 = gen_stream(base0)
    base1 = base0 + (k0.max(axis=1) - base0) + 1
    k1, v1 = gen_stream(base1)
    hk = np.tile(np.arange(4, dtype=np.uint32), (B, 1))
    hv = rng.integers(0, 2**32, (B, 4)).astype(np.uint32)

    def timeit(fn, args, label):
        jfn = jax.jit(fn)
        out = jfn(*args, jnp.uint32(0))
        _ = int(np.asarray(out))
        t0 = time.time()
        s = out
        for _i in range(iters):
            s = jfn(*args, s & jnp.uint32(1))
        v = int(np.asarray(s))
        dt = (time.time() - t0) / iters
        print(f"{label:42s} {dt*1e3:9.2f} ms  (chk {v & 0xffff})", flush=True)
        return dt

    args = tuple(jnp.asarray(a) for a in (k0, v0, k1, v1, hk, hv))

    # A: current sort-based combine (with INF empties, as today)
    def merge_sort(k0, v0, k1, v1, hk, hv, seed):
        INF = jnp.uint32(0xFFFFFFFF)
        k0x = jnp.where(v0 == 0, INF, k0)
        k1x = jnp.where(v1 == 0, INF, k1)
        vals = jnp.concatenate([hv + seed, v0, v1], axis=1)
        keys = jnp.concatenate([hk, k0x, k1x], axis=1)
        out = bitpack.combine_chunks(vals, keys, W, max_dups=8)
        return out[:, 5].sum(dtype=jnp.uint32)
    timeit(merge_sort, args, "A sort+dedup combine_chunks")

    # B: per-stream sorted scatter-add (dense keys, zero-valued empties)
    def merge_scatter(k0, v0, k1, v1, hk, hv, seed):
        def lane(acc, k, v):
            return acc.at[k].add(v, mode="drop", indices_are_sorted=True)
        out = jnp.zeros((B, W), jnp.uint32)
        out = jax.vmap(lane)(out, hk, hv + seed)
        out = jax.vmap(lane)(out, k0, v0)
        out = jax.vmap(lane)(out, k1, v1)
        return out[:, 5].sum(dtype=jnp.uint32)
    timeit(merge_scatter, args, "B per-stream sorted scatter-add")

    # C: one concatenated scatter-add (unsorted at stream joins)
    def merge_scatter1(k0, v0, k1, v1, hk, hv, seed):
        vals = jnp.concatenate([hv + seed, v0, v1], axis=1)
        keys = jnp.concatenate([hk, k0, k1], axis=1)
        def lane(k, v):
            return jnp.zeros((W,), jnp.uint32).at[k].add(v, mode="drop")
        out = jax.vmap(lane)(keys, vals)
        return out[:, 5].sum(dtype=jnp.uint32)
    timeit(merge_scatter1, args, "C concat unsorted scatter-add")
    return 0


if __name__ == "__main__":
    sys.exit(main())
