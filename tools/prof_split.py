#!/usr/bin/env python
"""Measure encode vs decode share at the bench config (TPU).

axon timing is async-weird (memory: per-call timing lies); so each phase
is timed as a loop of N dispatches with ONE block_until_ready at the end.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (script lives in tools/)
import sys
import time

import numpy as np


def main():
    import jax
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    from alacjax.codec import get_codec
    from alacjax.types import AlacConfig
    from bench import make_music

    S = 4096
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    config = AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                        sample_rate=44100)
    codec = get_codec(config, chunk=B)
    pcm = make_music(B, S)
    x = jnp.asarray(pcm)

    t0 = time.time()
    words, bits = codec._encode(x)
    words.block_until_ready()
    print(f"enc compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    dec, err, _ = codec._decode(words)
    dec.block_until_ready()
    print(f"dec compile+run: {time.time()-t0:.1f}s", flush=True)
    assert not np.asarray(err).any()
    assert (np.asarray(dec) == pcm).all(), "round-trip not lossless"

    # encode-only loop
    t0 = time.time()
    for _ in range(iters):
        w, b = codec._encode(x)
    w.block_until_ready()
    t_enc = (time.time() - t0) / iters
    # decode-only loop
    t0 = time.time()
    for _ in range(iters):
        d, e, _n = codec._decode(words)
    d.block_until_ready()
    t_dec = (time.time() - t0) / iters
    tot = t_enc + t_dec
    print(f"B={B} iters={iters}")
    print(f"encode: {t_enc*1e3:8.1f} ms/batch ({t_enc/tot*100:4.1f}%) "
          f"{B/t_enc:9.0f} f/s")
    print(f"decode: {t_dec*1e3:8.1f} ms/batch ({t_dec/tot*100:4.1f}%) "
          f"{B/t_dec:9.0f} f/s")
    print(f"enc+dec: {B/tot:9.0f} f/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
