import time
import numpy as np
import jax
import jax.numpy as jnp
from lancedb_tpu.ops.topk import topk_smallest

TOP_K = 10
rng = np.random.default_rng(0)
dev = jax.devices()[0]
x = rng.standard_normal((1 << 20, 128)).astype(np.float32)
xj = jax.device_put(jnp.asarray(x), dev)                      # f32 stored
xb = jax.device_put(jnp.asarray(x, dtype=jnp.bfloat16), dev)  # bf16 stored
xn2 = jnp.sum(jnp.square(xj), axis=1)
qstack = jax.device_put(jnp.asarray(rng.standard_normal((8, 256, 128)).astype(np.float32)), dev)
xj.block_until_ready(); xb.block_until_ready(); qstack.block_until_ready()

def timed(label, batch_fn, args, iters=64):
    @jax.jit
    def run(qstack, *a):
        def body(carry, i):
            q = qstack[i % 8] + carry * 1e-20
            v = batch_fn(q, *a)
            return carry + jnp.sum(v) * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return out
    t0 = time.perf_counter(); np.asarray(run(qstack, *args)); c = time.perf_counter() - t0
    ts = []
    for rep in range(3):
        fresh = qstack * (1.0 + 1e-6 * (rep + 1))
        t0 = time.perf_counter(); np.asarray(run(fresh, *args)); ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / iters
    print(f"{label:30s} compile={c:5.1f}s {per*1e3:8.3f} ms/batch {256/per:9.0f} qps")

def bench_style(q, xj, xn2):
    dots = jnp.dot(q.astype(jnp.bfloat16), xj.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    v, _ = topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)
    return v

def bf16_stored(q, xb, xn2):
    dots = jnp.dot(q.astype(jnp.bfloat16), xb.T, preferred_element_type=jnp.float32)
    v, _ = topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)
    return v

timed("bench-style f32-store cast", bench_style, (xj, xn2))
timed("bf16-stored", bf16_stored, (xb, xn2))
