import os, time
import numpy as np, jax, jax.numpy as jnp
exec(open('_tmp_ab.py').read().split('def run(')[0])
from alacjax.ops.jaxutils import I32, U32, iota1
Bp = 512; W8 = (W + 7) // 8
wpad = wimg if W8*8==W else jnp.pad(wimg,((0,0),(0,W8*8-W)))
rows = wpad.reshape(B*W8, 8)
lane_row0 = jnp.minimum(iota1(Bp), B-1) * W8
K=32; r_rows=1; LOOKR=r_rows*K; n_outer=16; n_rows=5
def gather_rows(row_idx):
    idx = lane_row0[:, None] + jnp.clip(row_idx, 0, W8 - 1)
    r = jnp.take(rows, idx, axis=0)
    return r.reshape(Bp, -1).T
@jax.jit
def gather_only(base0):
    def body(carry, _):
        base_row = carry
        look = gather_rows(base_row[:, None] + n_rows + iota1(LOOKR)[None, :]).astype(U32)
        return base_row + LOOKR, jnp.sum(look, axis=0)
    bf, ys = jax.lax.scan(body, base0, None, length=n_outer)
    return bf, ys
@jax.jit
def gather_noT(base0):
    def body(carry, _):
        base_row = carry
        idx = lane_row0[:, None] + jnp.clip(base_row[:, None] + n_rows + iota1(LOOKR)[None, :], 0, W8-1)
        r = jnp.take(rows, idx, axis=0).astype(U32)   # (Bp, LOOKR, 8), no transpose
        return base_row + LOOKR, jnp.sum(r, axis=(1,2))
    bf, ys = jax.lax.scan(body, base0, None, length=n_outer)
    return bf, ys
@jax.jit
def final_T(ys):   # (n_outer, K*8, Bp) -> (B, S) like samples reshape
    return ys.reshape(n_outer*K*8, Bp).T[:B, :4096]
base0 = jnp.zeros((Bp,), I32)
for name, f, a in (("gather+T scan", gather_only, (base0,)),
                   ("gather noT scan", gather_noT, (base0,)),
                   ("final transpose", final_T, (jnp.ones((n_outer, K*8, Bp), I32),))):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(10): jax.block_until_ready(f(*a))
    print(f"{name}: {(time.time()-t0)/10*1e3:.2f} ms", flush=True)
