#!/usr/bin/env python
"""In-context truncation profile of the device codec (TPU).

Compiles the REAL encode/decode programs cut at successive stages via
the stop_at knob (codec._encode_packet_chunks / decode_frames_device);
XLA dead-code-eliminates everything downstream of the cut, so the
difference between successive cuts is the true in-context stage cost
(component harnesses misattribute: the merge measured 27 ms standalone
and ~0 in context).

Timing: chained-scalar methodology (axon async quirk — see memory
notes): each iteration's input depends on the previous iteration's
reduced scalar, and only the final scalar is read back.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (script lives in tools/)
import sys
import time

import numpy as np


def main():
    import jax, os
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")  # repo-root cache (script lives in tools/)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from alacjax import codec as C
    from alacjax.types import AlacConfig

    S = 4096
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    # argv[4]: config selector (stage costs differ hugely by config)
    name = sys.argv[4] if len(sys.argv) > 4 else "stereo16"
    kw = {"stereo16": dict(bit_depth=16, num_channels=2),
          "mono16": dict(bit_depth=16, num_channels=1),
          "hires24": dict(bit_depth=24, num_channels=2),
          "surround51": dict(bit_depth=16, num_channels=6),
          "escape32": dict(bit_depth=32, num_channels=2)}[name]
    config = AlacConfig(frame_length=S, sample_rate=44100, **kw)
    nw = (config.max_escape_packet_bytes(S) + 3) // 4 + 2

    from bench_configs import gen
    pcm = gen("escape" if name == "escape32" else "music",
              B, S, config.num_channels, config.bit_depth).astype(np.int32)
    x0 = jnp.asarray(pcm)
    words0, _ = jax.jit(lambda p: C.encode_frames_device(
        p, config=config, num_words=nw))(x0)
    words0.block_until_ready()

    def reduce_tree(t):
        leaves = [l for l in jax.tree_util.tree_leaves(t)
                  if hasattr(l, "ravel")]
        acc = jnp.int32(0)
        for l in leaves:
            acc = acc + l.ravel()[:8].astype(jnp.int32).sum()
        return acc

    def timeit(fn, label):
        jfn = jax.jit(fn)
        t0 = time.time()
        s = jfn(jnp.int32(0))
        _ = int(np.asarray(s))
        comp = time.time() - t0
        t0 = time.time()
        for _i in range(iters):
            s = jfn(s)
        v = int(np.asarray(s))
        dt = (time.time() - t0) / iters
        print(f"{label:28s} {dt*1e3:9.2f} ms   (compile {comp:5.1f}s, "
              f"chk {v & 0xffff})", flush=True)
        return dt

    def enc(stop):
        def fn(seed):
            p = x0 + (seed & 1)
            out = C._encode_packet_chunks(p, config, nw, stop_at=stop)
            return reduce_tree(out)
        return fn

    def dec(stop):
        def fn(seed):
            w = words0 ^ (seed.astype(jnp.uint32) & jnp.uint32(0))
            w = w + (seed.astype(jnp.uint32) & jnp.uint32(1))  # serialize
            out = C.decode_frames_device(w, config=config, num_samples=S,
                                         stop_at=stop)
            return reduce_tree(out)
        return fn

    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    if which in ("both", "enc"):
        timeit(enc("mix"), "enc: mix(+mixres sel)")
        timeit(enc("search"), "enc: +search")
        timeit(enc("rice"), "enc: +rice emission")
        timeit(enc("assemble"), "enc: +assembly")
        timeit(enc(None), "enc: FULL (+merge)")
    if which in ("both", "dec"):
        timeit(dec("params"), "dec: headers+params")
        timeit(dec("scan"), "dec: +fused scans")
        timeit(dec("nounesc"), "dec: +unmix/shift")
        timeit(dec(None), "dec: FULL (+unescape)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
