import time
import numpy as np, jax, jax.numpy as jnp
for shape, tag in (((1,), "4B"), ((512,), "2KB"), ((256*1024,), "1MB"), ((8*1024*1024,), "32MB")):
    x = jnp.ones(shape, jnp.int32)
    jax.block_until_ready(x)
    for i in range(3):
        t0=time.time(); a = np.asarray(x); dt=time.time()-t0
        print(f"D2H {tag} try{i}: {dt*1e3:.1f} ms ({a.nbytes/max(dt,1e-9)/1e6:.1f} MB/s)", flush=True)
