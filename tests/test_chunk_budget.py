"""combine_chunks duplicate-budget verification (ADVICE r2).

The codec sizes combine_chunks' ``max_dups`` as 4 + 4*n_elements — a
hand-derived bound on the CUMULATIVE duplicate extras across the packet
(boundary words shared between header/shift/rice/END segments).  If the
bound were ever exceeded the positional reconstruction would silently
drop a word.  This test instruments combine_chunks, runs the WIDEST
supported layout (7.1 = 8 channels: 5 elements) with mixed
escape/compressed lanes, and asserts the measured displacement stays
inside the budget — plus byte-parity so the instrumented run is a real
encode.
"""

import numpy as np
import pytest

from alacjax.ops import bitpack
from alacjax.oracle import ALACEncoder
from alacjax.types import AlacConfig

S = 64


@pytest.mark.slow
def test_dup_budget_widest_layout(rng, monkeypatch):
    import alacjax.codec as codec_mod
    from alacjax.codec import JaxCodec

    observed = []
    real = bitpack.combine_chunks

    def record(k, max_dups):
        # concrete values at runtime (jax.debug.callback)
        k = np.asarray(k)
        for lane in range(k.shape[0]):
            row = k[lane]
            row = row[row != 0xFFFFFFFF]
            first = np.concatenate([[True], row[1:] != row[:-1]])
            pos = np.nonzero(first)[0]
            disp = pos - row[first].astype(np.int64)
            assert (disp >= 0).all(), "key gap: uncovered word index"
            observed.append((int(disp.max(initial=0)), int(max_dups)))

    def instrumented(vals, keys, num_words, max_dups=8):
        import jax
        import jax.numpy as jnp

        jax.debug.callback(record, jnp.sort(keys, axis=1), max_dups)
        return real(vals, keys, num_words, max_dups=max_dups)

    monkeypatch.setattr(codec_mod.bitpack, "combine_chunks", instrumented)

    cfg = AlacConfig(bit_depth=16, num_channels=8, frame_length=S)
    # mixed content: compressible lanes + full-scale noise (escape) lanes
    x = np.zeros((4, 8, S), dtype=np.int64)
    t = np.arange(S)
    x[0] = (np.sin(t * 0.05)[None, :] * 3000).astype(np.int64)
    x[1] = rng.integers(-32768, 32768, (8, S))        # all escape
    x[2, ::2] = rng.integers(-32768, 32768, (4, S))   # alternating
    x[2, 1::2] = (np.sin(t * 0.1)[None, :] * 500).astype(np.int64)
    x[3] = rng.integers(-40, 40, (8, S))              # tiny residuals

    pkts = JaxCodec(cfg, chunk=4).encode_frames(x)
    enc = ALACEncoder(cfg, independent_frames=True)
    for i in range(4):
        assert pkts[i] == enc.encode_packet(x[i]), f"frame {i}"

    assert observed, "instrumented combine_chunks never ran"
    worst = max(d for d, _ in observed)
    budget = min(m for _, m in observed)
    assert worst <= budget, f"displacement {worst} exceeds budget {budget}"
