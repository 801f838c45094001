import time, numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, '/root/repo')
from lancedb_tpu.ops.topk import topk_smallest
rng = np.random.default_rng(0)
dev = jax.devices()[0]
N, D = 1 << 20, 128
x = rng.standard_normal((N, D)).astype(np.float32)
xb = jax.device_put(jnp.asarray(x, dtype=jnp.bfloat16), dev)
xu = jax.device_put(jnp.asarray(np.clip(np.round(x*40+128),0,255).astype(np.uint8)), dev)
xn2 = jax.device_put(jnp.asarray(np.einsum("nd,nd->n", x, x)), dev)
qstack = jax.device_put(jnp.asarray(rng.standard_normal((8, 256, D)).astype(np.float32)), dev)
for a in (xb, xu, xn2, qstack): a.block_until_ready()

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
    print(f"[scan]   {label:28s} compile={c:6.1f}s {per*1e3:8.2f} ms/batch", flush=True)

def timed_single(label, fn, args, reps=8):
    g = jax.jit(fn)
    q0 = qstack[0]
    np.asarray(g(q0, *args))
    ts = []
    for rep in range(reps):
        q = qstack[rep % 8] * (1 + 1e-6 * rep)
        q.block_until_ready()
        t0 = time.perf_counter(); g(q, *args).block_until_ready(); ts.append(time.perf_counter() - t0)
    print(f"[single] {label:28s} min={min(ts)*1e3:8.2f}ms med={float(np.median(ts))*1e3:8.2f}ms", flush=True)

def mm_bf(q, xb, xn2):
    dots = jax.lax.dot_general(q.astype(jnp.bfloat16), xb,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return topk_smallest(xn2[None, :] - 2.0 * dots, 10)[0]

def mm_u8(q, xu, xn2):
    dots = jax.lax.dot_general(q.astype(jnp.bfloat16), xu.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return topk_smallest(xn2[None, :] - 2.0 * dots, 10)[0]

timed_single("bf16 arg matmul+topk", mm_bf, (xb, xn2))
timed_single("u8 arg cast matmul+topk", mm_u8, (xu, xn2))
timed_scan("bf16 arg matmul+topk", mm_bf, (xb, xn2))
timed_scan("u8 arg cast matmul+topk", mm_u8, (xu, xn2))
