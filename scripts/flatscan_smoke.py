import time, sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from lancedb_tpu.ops.pallas_scan import ivf_flat_scan_pallas
print("backend:", jax.default_backend(), flush=True)

def check(P, PMAX, D, Q, NP, perf_iters=0):
    rng = np.random.default_rng(0)
    probe = jnp.asarray(rng.integers(0, P, (Q, NP), dtype=np.int32))
    qv = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
    vecs = jnp.asarray(rng.standard_normal((P, PMAX, D)).astype(np.float32))
    norms = jnp.asarray(rng.random((P, PMAX)).astype(np.float32) + 50)
    alpha = jnp.full((Q,), -2.0, jnp.float32)
    gamma = jnp.sum(jnp.square(qv), axis=1)
    t0 = time.perf_counter()
    out = np.asarray(ivf_flat_scan_pallas(probe, qv, vecs, norms, alpha, gamma))
    print(f"P={P} PMAX={PMAX}: ran in {time.perf_counter()-t0:.1f}s", flush=True)
    # numpy oracle
    pid = np.asarray(probe); qn = np.asarray(qv); vv = np.asarray(vecs); nn = np.asarray(norms)
    g2 = np.asarray(gamma)
    ref = np.zeros((Q, NP, PMAX), np.float32)
    for i in range(Q):
        for j in range(NP):
            b = pid[i, j]
            ref[i, j] = -2.0 * (vv[b] @ qn[i]) + nn[b] + g2[i]
    err = np.max(np.abs(out - ref) / (np.abs(ref) + 1))
    print("max rel err:", err, flush=True)
    assert err < 1e-4
    if perf_iters:
        @jax.jit
        def run(qv, probe, vecs, norms, alpha):
            def body(carry, i):
                g = jnp.sum(jnp.square(qv), axis=1) + carry * 1e-20
                o = ivf_flat_scan_pallas(probe, qv, vecs, norms, alpha, g)
                return carry + jnp.sum(o[:, 0, 0]) * 1e-9, None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(perf_iters))[0]
        np.asarray(run(qv, probe, vecs, norms, alpha))
        ts = []
        for r in range(3):
            f = qv * (1 + 1e-6 * r)
            t0 = time.perf_counter(); np.asarray(run(f, probe, vecs, norms, alpha)); ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / perf_iters
        print(f"perf: {per*1e3:.2f} ms/batch {Q/per:.0f} qps", flush=True)

check(16, 128, 128, 4, 3)
check(1024, 1280, 128, 128, 23, perf_iters=8)
