#!/usr/bin/env python
"""Stage-level profile of the encode pipeline at the bench config.

axon async quirk: block_until_ready on jit outputs lies, so every stage
fn reduces its output to a device scalar that is XOR-folded into the next
iteration's input — a data dependency that forces sequential execution —
and only the final scalar is read back.
"""
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
    from alacjax import codec as C
    from alacjax.ops import predict, rice, matrix, bitpack
    from alacjax.oracle.encoder import (DEFAULT_MIX_BITS, MIXRES_DILATE,
                                        MAX_RES, FAST_ORDER,
                                        bytes_shifted_for_depth)
    from alacjax.types import AlacConfig, DENSHIFT_DEFAULT
    from bench import make_music

    S = 4096
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    config = AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                        sample_rate=44100)
    pcm = make_music(B, S)
    x0 = jnp.asarray(pcm)
    mb0, pb, kb, wb = C._rice_params_static(config)
    chanbits = 17
    nw = (config.max_escape_packet_bytes(S) + 3) // 4 + 2

    def timeit(fn, label):
        """fn: (pcm, seed_scalar) -> scalar (jitted).  Chained timing."""
        jfn = jax.jit(fn)
        s = jfn(x0, jnp.int32(0))
        _ = int(np.asarray(s))  # warm + compile + readback program
        t0 = time.time()
        for _i in range(iters):
            s = jfn(x0, s)
        v = int(np.asarray(s))
        dt = (time.time() - t0) / iters
        print(f"{label:35s} {dt*1e3:9.2f} ms   (chk {v & 0xffff})",
              flush=True)
        return dt

    def full(p, seed):
        p = p + (seed & 1)
        w, tb = C.encode_frames_device(p, config=config, num_words=nw)
        return tb.sum() + w[:, 0].astype(jnp.int32).sum()
    t_full = timeit(full, "FULL encode")

    def trial(p, seed):
        p = p + (seed & 1)
        l, r = p[:, 0, :], p[:, 1, :]
        ld = l[:, ::MIXRES_DILATE]
        rd = r[:, ::MIXRES_DILATE]
        cand = []
        for mr in range(MAX_RES + 1):
            u, v = matrix.mix(ld, rd, DEFAULT_MIX_BITS, mr)
            cand.extend((u, v))
        st = jnp.concatenate(cand, axis=0)
        _, c = predict.pc_block_cost(
            st, C._init_coefs_batched(st.shape[0]), FAST_ORDER,
            chanbits, DENSHIFT_DEFAULT, mb0, pb, kb, wb)
        return c.sum()
    t_trial = timeit(trial, "mixres trial (10B, S/4)")

    def search(p, seed):
        p = p + (seed & 1)
        l, r = p[:, 0, :], p[:, 1, :]
        u, v = matrix.mix(l, r, DEFAULT_MIX_BITS, 2)
        st = jnp.concatenate([u, v, u, v], axis=0)
        na = jnp.concatenate([jnp.full((2 * B,), 4, jnp.int32),
                              jnp.full((2 * B,), 8, jnp.int32)], axis=0)
        res, c1, c2, coefs = predict.pc_block_cost2(
            st, C._init_coefs_batched(4 * B), na, chanbits,
            DENSHIFT_DEFAULT, mb0, pb, kb, wb)
        return c1.sum() + c2.sum() + res[:, -1].sum()
    t_search = timeit(search, "search pc_block_cost2 (4B, S)")

    def emit(p, seed):
        p = p + (seed & 1)
        l, r = p[:, 0, :], p[:, 1, :]
        u, v = matrix.mix(l, r, DEFAULT_MIX_BITS, 2)
        res = jnp.concatenate([u, v], axis=0)
        starts = jnp.tile(jnp.full((B,), 103, jnp.int32), 2)
        cw, ck, eb = rice.rice_encode_words(res, chanbits, mb0, pb, kb, wb,
                                            starts, bit_size_cap=chanbits)
        return eb.sum() + cw[:, 0].astype(jnp.int32).sum()
    t_emit = timeit(emit, "rice emission (2B, S)")

    T = 2 * (S + 1) * 2 + 43  # realistic: 2 rice streams + header + END
    def comb(p, seed):
        v0 = p[:, 0, :].astype(jnp.uint32) + seed.astype(jnp.uint32)
        vals = jnp.tile(v0, (1, (T + S - 1) // S))[:, :T]
        # ~25% occupancy like the real stream; keys ascending where present
        occ = (vals & 3) == 0
        keys = jnp.where(occ,
                         jnp.cumsum(occ.astype(jnp.uint32), axis=1) % nw,
                         jnp.uint32(0xFFFFFFFF))
        w = bitpack.combine_chunks(vals, keys, nw, max_dups=8)
        return w[:, 0].astype(jnp.int32).sum()
    t_comb = timeit(comb, f"combine_chunks (T={T}, W={nw})")

    def esc(p, seed):
        p = p + (seed & 1)
        raw = C._interleave2(p[:, 0, :], p[:, 1, :])
        epos = jnp.full((B,), 23, jnp.int32) + (seed & 1)
        rw, rk, _ = C._emit_block(raw.astype(jnp.uint32), 16, epos)
        return rw[:, 0].astype(jnp.int32).sum() + rk[:, 1].astype(jnp.int32).sum()
    t_esc = timeit(esc, "escape _emit_block (B, 2S @16b)")

    def selpad(p, seed):
        vals_c = jnp.tile(p[:, 0, :].astype(jnp.uint32), (1, 5))[:, :T] + seed.astype(jnp.uint32)
        keys_c = vals_c ^ jnp.uint32(123)
        vals_e = p[:, 1, : S + 3].astype(jnp.uint32)
        keys_e = vals_e ^ jnp.uint32(55)
        pad = T - vals_e.shape[1]
        vals_e = jnp.pad(vals_e, ((0, 0), (0, pad)))
        keys_e = jnp.pad(keys_e, ((0, 0), (0, pad)),
                         constant_values=np.uint32(0xFFFFFFFF))
        ue = (p[:, 0, 0] & 1 == 0)[:, None]
        av = jnp.where(ue, vals_e, vals_c)
        ak = jnp.where(ue, keys_e, keys_c)
        return av[:, 0].astype(jnp.int32).sum() + ak[:, -1].astype(jnp.int32).sum()
    t_sel = timeit(selpad, "escape pad+select (B,T)x2")

    rest = t_full - t_trial - t_search - t_emit - t_comb - t_esc - t_sel
    print(f"{'other (headers, mix, misc)':35s} {rest*1e3:9.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
