import time, numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, '/root/repo')
from lancedb_tpu.ops.topk import topk_smallest
rng = np.random.default_rng(0)
dev = jax.devices()[0]
x = rng.standard_normal((1 << 20, 128)).astype(np.float32)
xb = jax.device_put(jnp.asarray(x, dtype=jnp.bfloat16), dev)        # (N, D) bf16
xbT = jax.device_put(jnp.asarray(x.T.copy(), dtype=jnp.bfloat16), dev)  # (D, N) bf16
xn2 = jax.device_put(jnp.asarray(np.einsum("nd,nd->n", x, x)), dev)
qstack = jax.device_put(jnp.asarray(rng.standard_normal((8, 256, 128)).astype(np.float32)), dev)
for a in (xb, xbT, xn2, qstack): a.block_until_ready()
iters = 16

def timed(label, fn, args):
    @jax.jit
    def run(qstack, *a):
        def body(carry, i):
            q = qstack[i % 8] + carry * 1e-20
            v = fn(q, *a)
            return carry + jnp.sum(v) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))[0]
    t0 = time.perf_counter(); np.asarray(run(qstack, *args)); c = time.perf_counter() - t0
    ts = []
    for rep in range(3):
        fresh = qstack * (1.0 + 1e-6 * (rep + 1))
        t0 = time.perf_counter(); np.asarray(run(fresh, *args)); ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / iters
    print(f"{label:28s} compile={c:6.1f}s {per*1e3:8.2f} ms/batch {256/per:9.0f} qps", flush=True)

def dg(q, xb, xn2):  # contract dim1 x dim1, no transpose
    dots = jax.lax.dot_general(q.astype(jnp.bfloat16), xb,
        dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return topk_smallest(xn2[None, :] - 2.0 * dots, 10)[0]

def pre_t(q, xbT, xn2):  # pre-transposed storage
    dots = jnp.dot(q.astype(jnp.bfloat16), xbT, preferred_element_type=jnp.float32)
    return topk_smallest(xn2[None, :] - 2.0 * dots, 10)[0]

timed("bf16 (N,D) dot_general", dg, (xb, xn2))
timed("bf16 (D,N) pre-transposed", pre_t, (xbT, xn2))
