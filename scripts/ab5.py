import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
dev = jax.devices()[0]
N, D = 1 << 20, 128
x = rng.standard_normal((N, D)).astype(np.float32)
xb = jax.device_put(jnp.asarray(x, dtype=jnp.bfloat16), dev)
xj = jax.device_put(jnp.asarray(x), dev)
q0 = jax.device_put(jnp.asarray(rng.standard_normal((256, D)).astype(np.float32)), dev)
for a in (xb, xj, q0): a.block_until_ready()
print("xb devices:", xb.devices(), "committed:", xb.committed, flush=True)

def t(label, f, *args, reps=6):
    g = jax.jit(f)
    np.asarray(g(*args))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter(); np.asarray(g(*args)); ts.append(time.perf_counter() - t0)
    print(f"{label:30s} min={min(ts)*1e3:9.2f}ms med={float(np.median(ts))*1e3:9.2f}ms", flush=True)

t("sum(xb) bf16 read", lambda a: jnp.sum(a.astype(jnp.float32)), xb)
t("sum(xj) f32 read", lambda a: jnp.sum(a), xj)
t("mm bf16-arg (sum out)", lambda q, a: jnp.sum(jax.lax.dot_general(q.astype(jnp.bfloat16), a,
    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)), q0, xb)
t("mm f32-arg cast (sum out)", lambda q, a: jnp.sum(jax.lax.dot_general(
    q.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)), q0, xj)
