import os, time, importlib
import numpy as np, jax, jax.numpy as jnp
exec(open('_tmp_ab.py').read().split('def run(')[0])
os.environ["ALACJAX_PALLAS_DECODE"] = "1"
from alacjax.ops import fused_decode
from alacjax.ops.pallas import decode_pallas as dpal
N = 30
def timeit(tag):
    importlib.reload(dpal)
    f = jax.jit(lambda w, sb, pb_, c0, m, na, d: fused_decode.decode_channel(
        w, sb, S, 17, MB0, pb_, KB0, WB, c0, m, na, d, taps=8))
    t0=time.time(); r = f(*args); np.asarray(r[1]); tc=time.time()-t0
    # warm sync path (np.asarray caches per-array; use fresh results)
    t0 = time.time()
    for _ in range(N): r = f(*args)
    np.asarray(r[1])                       # one sync drains the queue
    dt = (time.time() - t0) / N
    print(f"{tag}: compile {tc:.1f}s per-call {dt*1e3:.2f} ms", flush=True)
os.environ["ALACJAX_PALLAS_DECODE"]="0"; timeit("XLA-scan")
os.environ["ALACJAX_PALLAS_DECODE"]="1"
for dbg in ("", "nosub,noshift,novals,noout", "nosub", "noshift", "nofetch"):
    os.environ["ALACJAX_DKDBG"] = dbg
    timeit(f"dbg={dbg or 'full'}")
