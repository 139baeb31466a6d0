import time
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((512,), jnp.int32); jax.block_until_ready(x)
f = jax.jit(lambda v: v + 1)
r = f(x); jax.block_until_ready(r)
# per-call with block_until_ready
t0=time.time()
for _ in range(20): jax.block_until_ready(f(x))
print(f"trivial jit, block_until_ready each: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
# per-call with np.asarray sync
t0=time.time()
for _ in range(20): np.asarray(f(x))
print(f"trivial jit, np.asarray each: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
# chained, one sync
t0=time.time()
r = x
for _ in range(100): r = f(r)
jax.block_until_ready(r)
print(f"trivial jit, chained x100 one sync: {(time.time()-t0)/100*1e3:.3f} ms/call", flush=True)
