import _tmp_cache
import os, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.argv = ["x"]
from bench import make_music
from alacjax.types import AlacConfig
from alacjax import codec as codec_mod
from alacjax.codec import get_codec
S = 4096; B = 4096
config = AlacConfig(bit_depth=16, num_channels=2, frame_length=S, sample_rate=44100)
pcm = make_music(B, S)
x = jnp.asarray(pcm)
for env in ("0", "1"):
    os.environ["ALACJAX_PALLAS_DECODE"] = env
    codec_mod._CODEC_CACHE.clear()          # fresh trace per env
    codec = get_codec(config, chunk=B)
    t0 = time.time()
    words, bits = codec._encode(x); words.block_until_ready()
    tce = time.time()-t0
    t0 = time.time()
    d, e, _ = codec._decode(words); d.block_until_ready()
    tcd = time.time()-t0
    assert not np.asarray(e).any() and (np.asarray(d) == pcm).all(), "lossless FAIL"
    N = 10
    t0 = time.time()
    for _ in range(N): d, e, _n = codec._decode(words)
    d.block_until_ready()
    dt = (time.time()-t0)/N
    t0 = time.time()
    for _ in range(N):
        w2, b2 = codec._encode(x)
        d, e, _n = codec._decode(w2)
    d.block_until_ready()
    dt2 = (time.time()-t0)/N
    print(f"PALLAS_DECODE={env}: dec compile {tcd:.1f}s  decode {dt*1e3:.1f} ms ({B/dt:.0f} f/s)  enc+dec {dt2*1e3:.1f} ms ({B/dt2:.0f} f/s)", flush=True)
