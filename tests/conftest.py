"""Test configuration.

Multi-device semantics are tested on a simulated 8-device CPU mesh
(SURVEY.md §4 item 6): JAX must be configured before first import, so this
conftest sets the env vars at collection time.  Real-chip benchmarking goes
through bench.py, not the test suite.
"""

import os

# NOTE: this environment's sitecustomize imports jax at interpreter start
# with JAX_PLATFORMS=axon, so the env var alone cannot force CPU; the
# config update below is the override that actually works.  XLA_FLAGS is
# still read lazily at first backend init, so the host-device-count flag
# must be set before any jax use.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xA1AC)


def gen_pcm(rng, kind: str, nch: int, n: int, depth: int) -> np.ndarray:
    """Deterministic fixture PCM (SURVEY.md §4 workload fixtures):
    white noise (escape stress), sine mixtures (zero-run friendly),
    silence (pure zero-run), impulse trains."""
    full = 1 << (depth - 1)
    if kind == "noise":
        return rng.integers(-full, full, (nch, n))
    if kind == "sine":
        t = np.arange(n)
        base = (np.sin(t * 0.01)[None, :] * (full // 4)
                + np.sin(t * 0.1)[None, :] * 200).astype(np.int64)
        return np.clip(base + rng.integers(-3, 4, (nch, n)), -full, full - 1)
    if kind == "silence":
        return np.zeros((nch, n), dtype=np.int64)
    if kind == "impulse":
        x = np.zeros((nch, n), dtype=np.int64)
        x[:, ::211] = full - 1
        x[:, 7::401] = -full
        return x
    raise ValueError(kind)
