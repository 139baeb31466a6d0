import os, time
import numpy as np, jax, jax.numpy as jnp
exec(open('_tmp_ab.py').read().split('def run(')[0])
os.environ["ALACJAX_PALLAS_DECODE"] = "0"
from alacjax.ops import fused_decode
f = jax.jit(lambda w, sb, pb_, c0, m, na, d: fused_decode.decode_channel(
    w, sb, S, 17, MB0, pb_, KB0, WB, c0, m, na, d, taps=8))
r = f(*args); np.asarray(r[1])  # compile+warm
N = 30
t0=time.time()
for _ in range(N): r = f(*args)
t_q = time.time()-t0
t0=time.time(); r[1].block_until_ready(); t_bur = time.time()-t0
t0=time.time(); np.asarray(r[1]); t_as = time.time()-t0
print(f"queue {N} calls: {t_q*1e3:.1f} ms; block_until_ready: {t_bur*1e3:.1f} ms; then asarray: {t_as*1e3:.1f} ms", flush=True)
print(f"=> per-call via bur: {(t_q+t_bur)/N*1e3:.2f} ms; via asarray-drain: {(t_q+t_bur+t_as)/N*1e3:.2f} ms", flush=True)
