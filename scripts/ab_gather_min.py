"""Probe which dynamic_gather shapes Mosaic accepts on this TPU."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)

def try_shape(s, w, axis=1, dtype=jnp.float32):
    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...].astype(jnp.int32), axis=axis)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((s, w)).astype(np.float32)
    idx = rng.integers(0, (w if axis == 1 else s), (s, w)).astype(np.int32)
    want = np.take_along_axis(x, idx, axis=axis)
    try:
        got = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((s, w), dtype)
        )(jnp.asarray(x), jnp.asarray(idx))
        err = np.abs(np.asarray(got) - want).max()
        print(f"shape=({s},{w}) axis={axis}: OK err={err}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"shape=({s},{w}) axis={axis}: FAIL {type(e).__name__} {msg}", flush=True)
        return False

for s, w in [(8, 128), (8, 256), (8, 512), (16, 128), (16, 512), (32, 128)]:
    try_shape(s, w, axis=1)
try_shape(8, 128, axis=0)
try_shape(256, 128, axis=0)
