import time, sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from lancedb_tpu.ops.pallas_scan import ivf_flat_scan_pallas
from lancedb_tpu.index.vector import _select_probes, _ivf_flat_search_device
from lancedb_tpu.ops.topk import topk_smallest
print("backend:", jax.default_backend(), flush=True)

P, PMAX, D, Q, NP, K = 1402, 1224, 128, 128, 28, 10
rng = np.random.default_rng(0)
cents = jnp.asarray(rng.standard_normal((P, D)).astype(np.float32))
vecs = jnp.asarray(rng.standard_normal((P, PMAX, D)).astype(np.float32))
norms = jnp.asarray(rng.random((P, PMAX)).astype(np.float32) + 50)
qs = jnp.asarray(rng.standard_normal((8, Q, D)).astype(np.float32))
pen = jnp.zeros((1,), jnp.float32)

def timed(label, fn, args, iters=8):
    @jax.jit
    def run(qs, *a):
        def body(carry, i):
            q = qs[i % 8] + carry * 1e-20
            return carry + jnp.sum(fn(q, *a)) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))[0]
    np.asarray(run(qs, *args))
    ts = []
    for r in range(3):
        f = qs * (1 + 1e-6 * r)
        t0 = time.perf_counter(); np.asarray(run(f, *args)); ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / iters
    print(f"{label:36s} {per*1e3:8.2f} ms/batch", flush=True)

probe_fixed = jnp.asarray(rng.integers(0, P, (Q, NP), dtype=np.int32))
alpha = jnp.full((Q,), -2.0, jnp.float32)

def kernel_only(q, vecs, norms, probe):
    g = jnp.sum(jnp.square(q), axis=1)
    return ivf_flat_scan_pallas(probe, q, vecs, norms, alpha, g)[:, 0, 0]

def kernel_plus_select(q, vecs, norms, cents):
    pid, _ = _select_probes(q, cents, NP, "l2")
    g = jnp.sum(jnp.square(q), axis=1)
    return ivf_flat_scan_pallas(pid, q, vecs, norms, alpha, g)[:, 0, 0]

def kernel_select_topk(q, vecs, norms, cents):
    pid, _ = _select_probes(q, cents, NP, "l2")
    g = jnp.sum(jnp.square(q), axis=1)
    d = ivf_flat_scan_pallas(pid, q, vecs, norms, alpha, g)
    return topk_smallest(d.reshape(Q, -1), K)[0]

def full_fn(q, cents, vecs, norms, pen):
    return _ivf_flat_search_device(q, cents, vecs, norms, pen, k=K, nprobes=NP,
                                   metric="l2", has_mask=False, use_pallas=True)[0]

def full_fn_xla(q, cents, vecs, norms, pen):
    return _ivf_flat_search_device(q, cents, vecs, norms, pen, k=K, nprobes=NP,
                                   metric="l2", has_mask=False, use_pallas=False)[0]

timed("kernel only (fixed probes)", kernel_only, (vecs, norms, probe_fixed))
timed("kernel + probe select", kernel_plus_select, (vecs, norms, cents))
timed("kernel + select + topk", kernel_select_topk, (vecs, norms, cents))
timed("full fn use_pallas=True", full_fn, (cents, vecs, norms, pen))
timed("full fn use_pallas=False", full_fn_xla, (cents, vecs, norms, pen))
