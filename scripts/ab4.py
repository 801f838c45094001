import time, numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, '/root/repo')
from lancedb_tpu.ops.topk import topk_smallest
rng = np.random.default_rng(0)
dev = jax.devices()[0]
N, D = 1 << 20, 128
x = rng.standard_normal((N, D)).astype(np.float32)
xb = jax.device_put(jnp.asarray(x, dtype=jnp.bfloat16), dev)
xb3 = jax.device_put(jnp.asarray(x.reshape(128, 8192, D), dtype=jnp.bfloat16), dev)
xn2 = jax.device_put(jnp.asarray(np.einsum("nd,nd->n", x, x)), dev)
qstack = jax.device_put(jnp.asarray(rng.standard_normal((8, 256, D)).astype(np.float32)), dev)
for a in (xb, xb3, xn2, qstack): a.block_until_ready()

def timed_scan(label, fn, args, iters=16):
    @jax.jit
    def run(qstack, *a):
        def body(carry, i):
            q = qstack[i % 8] + carry * 1e-20
            return carry + jnp.sum(fn(q, *a)) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))[0]
    t0 = time.perf_counter(); np.asarray(run(qstack, *args)); c = time.perf_counter() - t0
    ts = []
    for rep in range(3):
        fresh = qstack * (1.0 + 1e-6 * (rep + 1))
        t0 = time.perf_counter(); np.asarray(run(fresh, *args)); ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / iters
    print(f"{label:34s} compile={c:6.1f}s {per*1e3:8.2f} ms/batch", flush=True)

def upcast(q, xb, xn2):
    dots = jax.lax.dot_general(q, xb.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return topk_smallest(xn2[None, :] - 2.0 * dots, 10)[0]

def chunked(q, xb3, xn2):
    qb = q.astype(jnp.bfloat16)
    dots = jnp.einsum("qd,cnd->cqn", qb, xb3, preferred_element_type=jnp.float32)
    d = dots.transpose(1, 0, 2).reshape(q.shape[0], -1)
    return topk_smallest(xn2[None, :] - 2.0 * d, 10)[0]

timed_scan("bf16 arg upcast-f32 matmul", upcast, (xb, xn2))
timed_scan("bf16 arg chunked einsum 128x8192", chunked, (xb3, xn2))
