"""A/B the grouped fused IVF_FLAT probed scan vs the XLA chunked path
and the old one-pair-per-cell kernel, at SIFT1M bench shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from lancedb_tpu.ops.pallas_group_scan import ivf_flat_grouped_scan_pallas
from lancedb_tpu.ops.pallas_scan import ivf_flat_scan_pallas

print("backend:", jax.default_backend(), flush=True)

# ---------- correctness (small, works on any backend via interpret) ----
rng = np.random.default_rng(0)
Qs, NPs, Ps, PMs, Ds = 5, 3, 7, 16, 128
pids = rng.integers(0, Ps, (Qs, NPs)).astype(np.int32)
qv = rng.standard_normal((Qs, Ds)).astype(np.float32)
vecs = rng.standard_normal((Ps, PMs, Ds)).astype(np.float32)
nrm = rng.standard_normal((Ps, PMs)).astype(np.float32)
al = np.full(Qs, -2.0, np.float32)
ga = rng.standard_normal(Qs).astype(np.float32)
interp = jax.default_backend() != "tpu"
got = np.asarray(ivf_flat_grouped_scan_pallas(
    jnp.asarray(pids), jnp.asarray(qv), jnp.asarray(vecs), jnp.asarray(nrm),
    jnp.asarray(al), jnp.asarray(ga), qpc=8, interpret=interp))
want = np.empty((Qs, NPs, PMs), np.float32)
for qi in range(Qs):
    for j in range(NPs):
        pid = pids[qi, j]
        want[qi, j] = al[qi] * (vecs[pid] @ qv[qi]) + nrm[pid] + ga[qi]
err = np.abs(got - want).max()
print("correctness max err:", err, flush=True)
assert err < 1e-3

if jax.default_backend() != "tpu":
    sys.exit(0)

# ---------- timing at bench shapes ------------------------------------
Q, NP = 128, 28
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
            return c + out.reshape(-1)[0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    t0 = time.time(); np.asarray(loop(*args))
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    times = []
    for rep in range(3):
        a2 = list(args); a2[1] = a2[1] * (1.0 + 1e-6 * (rep + 1))
        t0 = time.time(); np.asarray(loop(*a2))
        times.append(time.time() - t0)
    dt = float(np.median(times)) / REPS
    print(f"{name}: {dt*1e3:.3f} ms/scan ({Q/dt:.0f} qps-equiv)", flush=True)


timeit("grouped qpc=8 ", lambda *a: ivf_flat_grouped_scan_pallas(*a, qpc=8), probe_ids, qv, vecs, nrm, al, ga)
timeit("grouped qpc=16", lambda *a: ivf_flat_grouped_scan_pallas(*a, qpc=16), probe_ids, qv, vecs, nrm, al, ga)
timeit("old 1-pair    ", ivf_flat_scan_pallas, probe_ids, qv, vecs, nrm, al, ga)

# XLA chunked-gather reference
def xla_chunked(probe_ids, qv, vecs, nrm, al, ga):
    def probe_step(j):
        pid = probe_ids[:, j]
        blocks = jnp.take(vecs, pid, axis=0)           # (Q, PMAX, D)
        nr = jnp.take(nrm, pid, axis=0)                # (Q, PMAX)
        dots = jnp.einsum("qpd,qd->qp", blocks, qv,
                          precision=jax.lax.Precision.HIGHEST)
        return al[:, None] * dots + nr + ga[:, None]
    return jax.lax.map(probe_step, jnp.arange(NP)).transpose(1, 0, 2)

timeit("xla chunked   ", xla_chunked, probe_ids, qv, vecs, nrm, al, ga)

# small-batch serving point
Q2 = 8
probe_ids2 = jnp.asarray(rng.integers(0, P, (Q2, 20), dtype=np.int32))
qv2 = jnp.asarray(rng.standard_normal((Q2, D)).astype(np.float32))
al2, ga2 = jnp.full((Q2,), -2.0, jnp.float32), jnp.zeros((Q2,), jnp.float32)
Q = Q2  # for qps print
timeit("grouped b8 np20", lambda *a: ivf_flat_grouped_scan_pallas(*a, qpc=8), probe_ids2, qv2, vecs, nrm, al2, ga2)
def xla_chunked2(probe_ids, qv, vecs, nrm, al, ga):
    def probe_step(j):
        pid = probe_ids[:, j]
        blocks = jnp.take(vecs, pid, axis=0)
        nr = jnp.take(nrm, pid, axis=0)
        dots = jnp.einsum("qpd,qd->qp", blocks, qv,
                          precision=jax.lax.Precision.HIGHEST)
        return al[:, None] * dots + nr + ga[:, None]
    return jax.lax.map(probe_step, jnp.arange(20)).transpose(1, 0, 2)
timeit("xla b8 np20    ", xla_chunked2, probe_ids2, qv2, vecs, nrm, al2, ga2)
