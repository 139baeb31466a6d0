import os, time, importlib
import numpy as np, jax, jax.numpy as jnp
exec(open('_tmp_ab.py').read().split('def run(')[0])
os.environ["ALACJAX_PALLAS_DECODE"] = "1"
from alacjax.ops import fused_decode
from alacjax.ops.pallas import decode_pallas as dpal
def sync(r): np.asarray(r[1])
def timeit(tag):
    importlib.reload(dpal)
    f = jax.jit(lambda w, sb, pb_, c0, m, na, d: fused_decode.decode_channel(
        w, sb, S, 17, MB0, pb_, KB0, WB, c0, m, na, d, taps=8))
    t0=time.time(); r = f(*args); sync(r); tc=time.time()-t0
    t0 = time.time()
    for _ in range(10): sync(f(*args))
    dt = (time.time() - t0) / 10
    print(f"{tag}: compile {tc:.1f}s per-call {dt*1e3:.2f} ms", flush=True)
for K in ("16", "32", "64", "128", "256"):
    os.environ["ALACJAX_DECODE_K"] = K
    os.environ["ALACJAX_DKDBG"] = "nosub,noshift,novals,noout"
    timeit(f"K={K} empty")
    os.environ["ALACJAX_DKDBG"] = ""
    timeit(f"K={K} full ")
