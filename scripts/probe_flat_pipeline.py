"""Decompose the probed IVF_FLAT pipeline cost: scan vs top-k variants."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from lancedb_tpu.ops.pallas_group_scan import ivf_flat_grouped_scan_pallas

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
Q, NP, K = 128, 28, 10
P, PMAX, D = 1402, 1224, 128
REPS = 8
probe_ids = jnp.asarray(rng.integers(0, P, (Q, NP), dtype=np.int32))
qv = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
vecs = jnp.asarray(rng.standard_normal((P, PMAX, D)).astype(np.float32))
nrm = jnp.asarray(rng.uniform(0, 1, (P, PMAX)).astype(np.float32))
al = jnp.full((Q,), -2.0, jnp.float32)
ga = jnp.asarray(rng.uniform(1, 2, (Q,)).astype(np.float32))


def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(a[0], a[1] + c, *a[2:])
            leaf = jax.tree.leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    t0 = time.time(); np.asarray(loop(*args))
    comp = time.time() - t0
    times = []
    for rep in range(3):
        a2 = list(args); a2[1] = a2[1] * (1.0 + 1e-6 * (rep + 1))
        t0 = time.time(); np.asarray(loop(*a2))
        times.append(time.time() - t0)
    dt = float(np.median(times)) / REPS
    print(f"{name}: {dt*1e3:.3f} ms ({Q/dt:.0f} qps)  [compile {comp:.1f}s]", flush=True)


def scan_only(pids, qv, vecs, nrm, al, ga):
    return ivf_flat_grouped_scan_pallas(pids, qv, vecs, nrm, al, ga, qpc=8)

def scan_exact_topk(pids, qv, vecs, nrm, al, ga):
    d = scan_only(pids, qv, vecs, nrm, al, ga).reshape(Q, -1)
    return jax.lax.top_k(-d, K)

def scan_twostage_topk(pids, qv, vecs, nrm, al, ga):
    d = scan_only(pids, qv, vecs, nrm, al, ga)        # (Q, NP, PMAX)
    v1, i1 = jax.lax.top_k(-d, K)                     # per-probe exact
    v2, i2 = jax.lax.top_k(v1.reshape(Q, -1), K)      # across probes
    return v2, i2

def scan_approx_topk(pids, qv, vecs, nrm, al, ga):
    d = scan_only(pids, qv, vecs, nrm, al, ga).reshape(Q, -1)
    return jax.lax.approx_max_k(-d, K)

def topk_only(pids, d_fake, vecs, nrm, al, ga):
    return jax.lax.top_k(-d_fake.reshape(Q, -1), K)

timeit("scan only        ", scan_only, probe_ids, qv, vecs, nrm, al, ga)
timeit("scan+exact topk  ", scan_exact_topk, probe_ids, qv, vecs, nrm, al, ga)
timeit("scan+2stage topk ", scan_twostage_topk, probe_ids, qv, vecs, nrm, al, ga)
timeit("scan+approx topk ", scan_approx_topk, probe_ids, qv, vecs, nrm, al, ga)
d_fake = jnp.asarray(rng.standard_normal((Q, NP, PMAX)).astype(np.float32))
timeit("exact topk only  ", topk_only, probe_ids, d_fake, vecs, nrm, al, ga)

# correctness: two-stage == exact
d = np.asarray(scan_only(probe_ids, qv, vecs, nrm, al, ga))
v_e = np.sort(d.reshape(Q, -1), axis=1)[:, :K]
v2 = -np.sort(-np.asarray(scan_twostage_topk(probe_ids, qv, vecs, nrm, al, ga)[0]), axis=1)
print("two-stage == exact:", np.allclose(np.sort(-v2, axis=1), v_e), flush=True)
