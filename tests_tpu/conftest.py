"""TPU-tier test configuration (VERDICT r4 item 7).

Unlike tests/ (which pins jax to the simulated-CPU platform), this tier
runs on the REAL attached accelerator: each Mosaic kernel is compiled
(interpret=False) and checked bit-equal against its XLA-scan reference,
so a Mosaic lowering regression fails a named kernel test here instead
of surfacing as an unexplained headline round-trip failure.

Run explicitly on a TPU box:  python -m pytest tests_tpu/ -q
(not part of the default `pytest tests/` tiers — testpaths excludes it).
"""

import hashlib

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    import jax
    if jax.default_backend() in ("cpu",):
        skip = pytest.mark.skip(reason="TPU tier: no accelerator backend")
        for it in items:
            it.add_marker(skip)


@pytest.fixture()
def rng(request):
    seed = int.from_bytes(
        hashlib.sha256(request.node.nodeid.encode()).digest()[:4], "big")
    return np.random.default_rng(seed)
