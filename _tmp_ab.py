import os, time
import numpy as np
import jax, jax.numpy as jnp
from alacjax.bitbuffer import BitBuffer
from alacjax.oracle import ag as oag, dp as odp
from alacjax.ops import bitpack, fused_decode
from alacjax.types import KB0, MB0, PB0

rng = np.random.default_rng(42)
WB = (1 << KB0) - 1
S = 4096
B = 512
orders = rng.choice([0, 4, 8, 31], B)
packets, coefs0, xs = [], [], []
for b in range(B):
    na = int(orders[b])
    full = 1 << 15
    kind = b % 4
    if kind == 0:
        x = np.clip(np.sin(np.arange(S) * 0.07) * (full // 2), -full, full - 1).astype(np.int64)
    elif kind == 1:
        x = rng.integers(-full, full, S)
    elif kind == 2:
        x = np.zeros(S, dtype=np.int64); x[::173] = rng.integers(-300, 300, len(x[::173]))
    else:
        x = rng.integers(-3, 4, S)
    c = odp.init_coefs(9)
    coefs0.append(np.asarray(c, dtype=np.int32).copy())
    s1 = odp.pc_block(x, c, na, 17, 9)
    bb = BitBuffer(byte_size=16 * S)
    oag.dyn_comp(oag.set_standard_ag_params(S, S), bb, s1, S, 17)
    packets.append(bb.to_bytes())
    xs.append(x)
W = max(len(p) for p in packets) // 4 + 3
wimg = jnp.asarray(bitpack.bytes_to_words(packets, W))
zero = jnp.zeros((B,), jnp.int32)
na_v = jnp.asarray(orders.astype(np.int32))
pbv = jnp.full((B,), PB0, jnp.int32)
den = jnp.full((B,), 9, jnp.int32)
c0j = jnp.asarray(np.stack(coefs0))
args = (wimg, zero, pbv, c0j, zero, na_v, den)

def run(env):
    os.environ["ALACJAX_PALLAS_DECODE"] = env
    f = jax.jit(lambda w, sb, pb_, c0, m, na, d: fused_decode.decode_channel(
        w, sb, S, 17, MB0, pb_, KB0, WB, c0, m, na, d, taps=8))
    t0 = time.time(); out = jax.block_until_ready(f(*args)); tc = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        out = jax.block_until_ready(f(*args))
    dt = (time.time() - t0) / 10
    return out, tc, dt

(ref, tc0, dt0) = run("0")
(got, tc1, dt1) = run("1")
for name, a, b in zip(("samples", "end", "err"), ref, got):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
print(f"PARITY OK on {jax.devices()[0].device_kind}")
print(f"scan:   compile {tc0:.1f}s  run {dt0*1e3:.2f} ms")
print(f"kernel: compile {tc1:.1f}s  run {dt1*1e3:.2f} ms  speedup {dt0/dt1:.2f}x")
