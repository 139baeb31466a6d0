#!/usr/bin/env python
"""A/B the fused decode path: XLA scan vs the K-step Mosaic kernel.

Two levels, both lossless-gated:

  python tools/prof_decode_kernel.py channel   # decode_channel only,
                                               # B=512 mixed orders, parity + ms
  python tools/prof_decode_kernel.py codec     # full codec._decode @ B=4096
                                               # (headline conditions)

Knobs under test ride the usual env vars (ALACJAX_DECODE_LT,
ALACJAX_DECODE_K, ALACJAX_DECODE_G); ALACJAX_PALLAS_DECODE is driven by
this script.  See ops/pallas/decode_pallas.py for the kernel design and
docs/PERF_NOTES.md for the measured history.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _channel_fixture(B=512, S=4096):
    from alacjax.bitbuffer import BitBuffer
    from alacjax.oracle import ag as oag, dp as odp
    from alacjax.ops import bitpack
    from alacjax.types import KB0, PB0

    rng = np.random.default_rng(42)
    orders = rng.choice([0, 4, 8, 31], B)
    packets, coefs0 = [], []
    for b in range(B):
        na = int(orders[b])
        full = 1 << 15
        kind = b % 4
        if kind == 0:
            x = np.clip(np.sin(np.arange(S) * 0.07) * (full // 2),
                        -full, full - 1).astype(np.int64)
        elif kind == 1:
            x = rng.integers(-full, full, S)
        elif kind == 2:
            x = np.zeros(S, dtype=np.int64)
            x[::173] = rng.integers(-300, 300, len(x[::173]))
        else:
            x = rng.integers(-3, 4, S)
        c = odp.init_coefs(9)
        coefs0.append(np.asarray(c, dtype=np.int32).copy())
        s1 = odp.pc_block(x, c, na, 17, 9)
        bb = BitBuffer(byte_size=16 * S)
        oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, s1, S, 17)
        packets.append(bb.to_bytes())
    W = max(len(p) for p in packets) // 4 + 3
    wimg = jnp.asarray(bitpack.bytes_to_words(packets, W))
    zero = jnp.zeros((B,), jnp.int32)
    return (wimg, zero, jnp.full((B,), PB0, jnp.int32),
            jnp.asarray(np.stack(coefs0)), zero,
            jnp.asarray(orders.astype(np.int32)),
            jnp.full((B,), 9, jnp.int32)), S


def run_channel():
    from alacjax.ops import fused_decode
    from alacjax.types import KB0, MB0
    wb = (1 << KB0) - 1
    args, S = _channel_fixture()
    results = {}
    for env in ("0", "1"):
        os.environ["ALACJAX_PALLAS_DECODE"] = env
        f = jax.jit(lambda w, sb, pb_, c0, m, na, d: fused_decode.decode_channel(
            w, sb, S, 17, MB0, pb_, KB0, wb, c0, m, na, d, taps=8))
        t0 = time.time()
        r = jax.block_until_ready(f(*args))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            r = f(*args)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 10
        tag = "kernel" if env == "1" else "scan  "
        print(f"{tag}: compile {tc:.1f}s  per-call {dt * 1e3:.2f} ms",
              flush=True)
        results[env] = tuple(np.asarray(v) for v in r)
    for name, a, b in zip(("samples", "end_bits", "err"),
                          results["0"], results["1"]):
        np.testing.assert_array_equal(a, b, err_msg=name)
    print("parity OK: samples/end_bits/err bit-identical")


def run_codec(B=4096):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import make_music
    from alacjax import codec as codec_mod
    from alacjax.codec import get_codec
    from alacjax.types import AlacConfig

    S = 4096
    config = AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                        sample_rate=44100)
    pcm = make_music(B, S)
    x = jnp.asarray(pcm)
    for env in ("0", "1"):
        os.environ["ALACJAX_PALLAS_DECODE"] = env
        codec_mod._CODEC_CACHE.clear()   # fresh trace per env
        codec = get_codec(config, chunk=B)
        words, bits = codec._encode(x)
        words.block_until_ready()
        t0 = time.time()
        d, e, _ = codec._decode(words)
        d.block_until_ready()
        tcd = time.time() - t0
        assert not np.asarray(e).any() and (np.asarray(d) == pcm).all(), \
            "lossless FAIL"
        N = 10
        t0 = time.time()
        for _ in range(N):
            d, e, _n = codec._decode(words)
        d.block_until_ready()
        dt = (time.time() - t0) / N
        t0 = time.time()
        for _ in range(N):
            w2, b2 = codec._encode(x)
            d, e, _n = codec._decode(w2)
        d.block_until_ready()
        dt2 = (time.time() - t0) / N
        print(f"PALLAS_DECODE={env}: dec compile {tcd:.1f}s  "
              f"decode {dt * 1e3:.1f} ms ({B / dt:.0f} f/s)  "
              f"enc+dec {dt2 * 1e3:.1f} ms ({B / dt2:.0f} f/s)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "channel"
    if mode == "codec":
        run_codec(int(sys.argv[2]) if len(sys.argv) > 2 else 4096)
    else:
        run_channel()
