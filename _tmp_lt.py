import _tmp_cache
import os, time
import numpy as np, jax, jax.numpy as jnp
exec(open('_tmp_ab.py').read().split('def run(')[0])
from alacjax.ops import fused_decode
# tile the B=512 fixture 8x -> B=4096 lanes
R = 8
wimg8 = jnp.tile(wimg, (R, 1))
zero8 = jnp.tile(zero, R); na8 = jnp.tile(na_v, R); pb8 = jnp.tile(pbv, R)
den8 = jnp.tile(den, R); c08 = jnp.tile(c0j, (R, 1))
args8 = (wimg8, zero8, S, 17, MB0, pb8, KB0, WB, c08, jnp.tile(jnp.zeros((512,),jnp.int32),R), na8, den8)
def bench(tag):
    f = jax.jit(lambda w, sb, pb_, m, c0, na, d: fused_decode.decode_channel(
        w, sb, S, 17, MB0, pb_, KB0, WB, c0, m, na, d, taps=8))
    a = (wimg8, zero8, pb8, args8[9], c08, na8, den8)
    t0=time.time(); r = f(*a); r[0].block_until_ready(); tc=time.time()-t0
    N=10
    t0=time.time()
    for _ in range(N): r = f(*a)
    r[0].block_until_ready()
    dt=(time.time()-t0)/N
    print(f"{tag}: compile {tc:.1f}s  per-call {dt*1e3:.2f} ms", flush=True)
    return tuple(np.asarray(v) for v in r)
os.environ["ALACJAX_PALLAS_DECODE"]="0"
ref = bench("XLA scan      B=4096")
os.environ["ALACJAX_PALLAS_DECODE"]="1"
for lt in ("1024", "2048", "4096"):
    os.environ["ALACJAX_DECODE_LT"] = lt
    got = bench(f"kernel LT={lt:>4}  B=4096")
    for name, x, y in zip(("samples","end_bits","err"), ref, got):
        np.testing.assert_array_equal(x, y, err_msg=f"LT={lt} {name}")
    print(f"  LT={lt}: parity OK", flush=True)
