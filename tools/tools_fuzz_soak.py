#!/usr/bin/env python
"""Unbounded differential fuzz soak: content + grammar campaigns.

Complements the bounded tests in tests/test_grammar_fuzz.py and
tests/test_device_codec.py with an open-ended random campaign at FIXED
compiled shapes (S=256, B=8 — programs compile once per shape, then
each round is cheap):

  * grammar rounds: random legal header parameters (orders 0..31,
    cascade nibbles, denshift, pb factor, hostile mix params) asserted
    bit-identical across oracle / native C++ / device decoders;
  * content rounds: adversarial PCM (transient bursts, escape-crossing
    ramps, anti-phase stereo, zero-run churn, near-silence) asserted
    byte-identical between the oracle and device ENCODERS, then decoded
    losslessly on device.

Usage: python tools_fuzz_soak.py [minutes=30] [seed0=0]
Exits nonzero on the first divergence, printing the reproducer seed.
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)  # script lives in tools/
sys.path.insert(0, os.path.join(_REPO, "tests"))
os.environ.setdefault("ALACJAX_SCAN_UNROLL", "1")
os.environ.setdefault("ALACJAX_DECODE_G", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from alacjax.codec import get_codec  # noqa: E402
from alacjax.oracle import ALACEncoder  # noqa: E402
from alacjax.types import AlacConfig  # noqa: E402

S = 256
B = 8

GRAMMAR_SHAPES = [(16, 1), (16, 2), (16, 3), (16, 6), (16, 8),
                  (20, 2), (24, 2), (32, 2)]
CONTENT_SHAPES = [(16, 2), (16, 6), (20, 2), (24, 2), (32, 2), (16, 8)]
# device exhaustive search vs the host exhaustive encoder (the whole
# candidate grid's selection/tie-break logic under adversarial content)
EXHAUSTIVE_SHAPES = [(16, 2), (24, 2)]


def gen_adversarial(rng, nch: int, n: int, depth: int) -> np.ndarray:
    """Adversarial content classes beyond conftest.gen_pcm."""
    full = 1 << (depth - 1)
    kind = rng.integers(0, 7)
    t = np.arange(n)
    if kind == 0:  # transient bursts: cold predictor restarts
        x = np.zeros((nch, n))
        for _ in range(rng.integers(2, 6)):
            p = rng.integers(0, n - 8)
            x[:, p:p + 8] += rng.integers(-full, full, (nch, 8))
    elif kind == 1:  # amplitude ramp crossing the escape threshold
        env = np.linspace(0, 1.2, n)
        x = env[None, :] * rng.integers(-full, full, (nch, n))
    elif kind == 2:  # anti-phase / decorrelated stereo (mixres decisions)
        a = np.sin(t * 0.05) * (full // 2)
        x = np.stack([((-1) ** c) * a + rng.integers(-99, 100, n)
                      for c in range(nch)])
    elif kind == 3:  # zero-run churn: silence blocks + noise blocks
        x = rng.integers(-full, full, (nch, n))
        for _ in range(rng.integers(3, 9)):
            p = rng.integers(0, n - 16)
            x[:, p:p + rng.integers(4, 17)] = 0
    elif kind == 4:  # near-silence: mb estimate collapse
        x = rng.integers(-2, 3, (nch, n))
    elif kind == 5:  # DC plateaus with steps
        x = np.repeat(rng.integers(-full, full, (nch, max(1, n // 32))),
                      32, axis=1)[:, :n]
    else:  # sines at varying crest factor + noise floor
        x = sum(np.sin(t * f)[None, :] * (full >> k)
                for k, f in enumerate((0.01, 0.13, 0.71), start=2))
        x = x + rng.integers(-30, 31, (nch, n))
    return np.clip(x, -full, full - 1).astype(np.int64)


def grammar_round(cfg, seed):
    from test_grammar_fuzz import _assert_all_agree, _build_batch
    pkts, metas = _build_batch(cfg, seed=seed, max_order=30)
    _assert_all_agree(cfg, pkts, metas, taps=30)


def content_round(cfg, codec, seed):
    rng = np.random.default_rng(seed)
    x = np.stack([gen_adversarial(rng, cfg.num_channels, S, cfg.bit_depth)
                  for _ in range(B)])
    nums = np.full(B, S)
    if rng.random() < 0.5:  # partial tails batched with full frames
        nums[rng.integers(0, B)] = int(rng.integers(1, S))
        nums[rng.integers(0, B)] = int(rng.integers(1, S))
    for b in range(B):
        x[b, :, nums[b]:] = 0
    pkts = codec.encode_frames_ex(x, nums)
    enc = ALACEncoder(cfg, independent_frames=True)
    for i in range(B):
        want = enc.encode_packet(x[i, :, :nums[i]])
        assert pkts[i] == want, f"encode divergence frame {i} seed {seed}"
    y, got = codec.decode_frames_ex(pkts)
    assert list(got) == list(nums), (list(got), list(nums), seed)
    for i in range(B):
        np.testing.assert_array_equal(y[i, :, :nums[i]], x[i, :, :nums[i]],
                                      err_msg=f"decode seed {seed} frame {i}")


def exhaustive_round(cfg, codec, seed):
    """Device exhaustive grid == host exhaustive encoder, byte for byte."""
    rng = np.random.default_rng(seed)
    x = np.stack([gen_adversarial(rng, cfg.num_channels, S, cfg.bit_depth)
                  for _ in range(B)])
    pkts = codec.encode_frames(x)
    enc = ALACEncoder(cfg, independent_frames=True)  # inherits cfg.search
    for i in range(B):
        want = enc.encode_packet(x[i])
        assert pkts[i] == want, f"exhaustive divergence frame {i} seed {seed}"


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    deadline = time.time() + minutes * 60

    gcfgs = [AlacConfig(bit_depth=d, num_channels=c, frame_length=S)
             for d, c in GRAMMAR_SHAPES]
    ccfgs = [(cfg, get_codec(cfg, chunk=B))
             for cfg in (AlacConfig(bit_depth=d, num_channels=c,
                                    frame_length=S)
                         for d, c in CONTENT_SHAPES)]
    ecfgs = [(cfg, get_codec(cfg, chunk=B))
             for cfg in (AlacConfig(bit_depth=d, num_channels=c,
                                    frame_length=S, search="exhaustive")
                         for d, c in EXHAUSTIVE_SHAPES)]
    rounds = 0
    seed = seed0
    while time.time() < deadline:
        for cfg in gcfgs:
            grammar_round(cfg, seed=10_000_000 + seed)
        for cfg, codec in ccfgs:
            content_round(cfg, codec, seed=20_000_000 + seed)
        for cfg, codec in ecfgs:
            exhaustive_round(cfg, codec, seed=30_000_000 + seed)
        seed += 1
        rounds += 1
        print(f"[soak] round {rounds} clean (seed {seed - 1}, "
              f"{len(gcfgs)} grammar + {len(ccfgs)} content + "
              f"{len(ecfgs)} exhaustive shapes)", flush=True)
    print(f"[soak] DONE: {rounds} rounds clean "
          f"({rounds * (len(gcfgs) + len(ccfgs) + len(ecfgs)) * B} "
          f"packet batches)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
