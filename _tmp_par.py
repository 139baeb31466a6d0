import _tmp_cache
import os, time
import numpy as np, jax, jax.numpy as jnp
exec(open('_tmp_ab.py').read().split('def run(')[0])
from alacjax.ops import fused_decode
outs = {}
for env in ("0", "1"):
    os.environ["ALACJAX_PALLAS_DECODE"] = env
    f = jax.jit(lambda w, sb, pb_, c0, m, na, d: fused_decode.decode_channel(
        w, sb, S, 17, MB0, pb_, KB0, WB, c0, m, na, d, taps=8))
    r = f(*args)
    outs[env] = tuple(np.asarray(v) for v in r)
for name, a, b in zip(("samples", "end_bits", "err"), outs["0"], outs["1"]):
    np.testing.assert_array_equal(a, b, err_msg=name)
print("on-TPU parity OK: samples/end_bits/err bit-identical (B=512 mixed orders 0/4/8/31)", flush=True)
# also partial-num + per-lane chanbits path quick check on device
from alacjax.ops.pallas.decode_pallas import decode_channel_pallas
num = jnp.asarray(np.where(np.arange(512) % 3 == 0, 4096, 2049), np.int32)
a = fused_decode.decode_channel(wimg, zero, S, 17, MB0, pbv, KB0, WB, c0j,
                                zero, na_v, den, taps=8, num=num)
os.environ["ALACJAX_PALLAS_DECODE"] = "1"
b = decode_channel_pallas(wimg, zero, S, 17, MB0, pbv, KB0, WB, c0j,
                          zero, na_v, den, cb_max=17, taps=8, num=num)
# note: path a env=1 routes to pallas too; force scan via env
os.environ["ALACJAX_PALLAS_DECODE"] = "0"
a = fused_decode.decode_channel(wimg, zero, S, 17, MB0, pbv, KB0, WB, c0j,
                                zero, na_v, den, taps=8, num=num)
for name, x, y in zip(("samples", "end_bits", "err"), a, b):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
print("on-TPU parity OK: partial-num path", flush=True)
