#!/usr/bin/env python
"""Benchmark the five BASELINE.json configs on the attached chip.

Unlike bench.py (one JSON line for the driver), this prints one line per
config — the judge-facing coverage table.  Every run is gated on exact
losslessness.
"""

import json
import sys
import time

import numpy as np

from bench import make_music


def gen(config_name: str, B: int, S: int, nch: int, depth: int) -> np.ndarray:
    rng = np.random.default_rng(3)
    full = 1 << (depth - 1)
    if config_name == "escape":
        return rng.integers(-full, full, (B, nch, S)).astype(np.int64)
    base = make_music(B, S).astype(np.int64)  # (B, 2, S) 16-bit
    scale = full // (1 << 15)
    out = np.zeros((B, nch, S), dtype=np.int64)
    for c in range(nch):
        out[:, c] = np.clip(base[:, c % 2] * max(scale, 1)
                            + rng.integers(-3, 4, (B, S)), -full, full - 1)
    return out


CONFIGS = [
    ("stereo 16-bit 44.1kHz (headline)", dict(bit_depth=16, num_channels=2,
                                              sample_rate=44100), "music"),
    ("mono 16-bit", dict(bit_depth=16, num_channels=1,
                         sample_rate=44100), "music"),
    ("stereo 24-bit 96kHz hi-res", dict(bit_depth=24, num_channels=2,
                                        sample_rate=96000), "music"),
    ("5.1 multichannel 16-bit", dict(bit_depth=16, num_channels=6,
                                     sample_rate=48000), "music"),
    ("escape stress (white noise) 32-bit", dict(bit_depth=32, num_channels=2,
                                                sample_rate=96000), "escape"),
]


def main() -> int:
    from bench import require_backend
    require_backend()
    import jax
    import os
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    import jax.numpy as jnp
    from alacjax.codec import get_codec
    from alacjax.types import AlacConfig

    S = 4096
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    for name, kw, kind in CONFIGS:
        cfg = AlacConfig(frame_length=S, **kw)
        codec = get_codec(cfg, chunk=B)
        pcm = gen("escape" if kind == "escape" else "music",
                  B, S, cfg.num_channels, cfg.bit_depth)
        x = jnp.asarray(pcm.astype(np.int32))
        t0 = time.time()
        words, bits = codec._encode(x)
        words.block_until_ready()
        decoded, err, _ = codec._decode(words)
        decoded.block_until_ready()
        compile_s = time.time() - t0
        assert not np.asarray(err).any(), name
        assert (np.asarray(decoded) == pcm).all(), f"{name}: NOT LOSSLESS"

        t0 = time.time()
        for _ in range(iters):
            w, b = codec._encode(x)
            d, e, _n = codec._decode(w)
        d.block_until_ready()
        dt = time.time() - t0
        fps = B * iters / dt

        # enc/dec split (diagnostic): same chained methodology per phase
        t0 = time.time()
        for _ in range(iters):
            w, b = codec._encode(x)
        w.block_until_ready()
        enc_dt = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            d, e, _n = codec._decode(words)
        d.block_until_ready()
        dec_dt = time.time() - t0
        ratio = float(np.sum((np.asarray(bits) + 7) // 8)) / (
            pcm.size * cfg.bit_depth / 8)
        print(json.dumps({
            "config": name,
            "frames_per_sec": round(fps, 1),
            "audio_x_realtime": round(fps * S / cfg.sample_rate, 1),
            "compression_ratio": round(ratio, 3),
            "lossless": True,
            "compile_s": round(compile_s, 1),
            "encode_fps": round(B * iters / enc_dt, 1),
            "decode_fps": round(B * iters / dec_dt, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
