"""Where do the 169 ms of the 8-bit IVF_PQ batch go? Time the pallas ADC
scan alone, then _ivf_pq_search_device end-to-end, at bench shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

from lancedb_tpu.index.vector import _ivf_pq_search_device, _pallas_available
from lancedb_tpu.ops.pallas_adc import ivf_pq_adc_scan_pallas

print("pallas available:", _pallas_available(), flush=True)

rng = np.random.default_rng(0)
Q, NP, K = 128, 20, 10
P, PMAX = 1402, 1280
S, KC, DSUB = 16, 256, 8  # 8-bit x 16 sub
DIM = S * DSUB

q = jnp.asarray(rng.standard_normal((Q, DIM)).astype(np.float32))
cents = jnp.asarray(rng.standard_normal((P, DIM)).astype(np.float32))
codes = jnp.asarray(rng.integers(0, KC, (P, S, PMAX), dtype=np.uint8))
rnorms = jnp.asarray(rng.uniform(1, 10, (P, PMAX)).astype(np.float32))
cbs = jnp.asarray(rng.standard_normal((S, KC, DSUB)).astype(np.float32))
pen = jnp.zeros((1,), jnp.float32)

REPS = 10

def timeit(name, fn, *args, perturb_idx=0, **kw):
    """Loop REPS times inside one jit; the carry perturbs args[perturb_idx]
    (must be a float array) so every iteration genuinely executes."""
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a)
            a2[perturb_idx] = a2[perturb_idx] + c
            out = fn(*a2, **kw)
            leaf = jax.tree.leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    def fresh_args(rep):
        # the axon relay memoizes identical executions: every timing rep
        # must use numerically fresh inputs (bench.py does the same)
        a = list(args)
        a[perturb_idx] = a[perturb_idx] * (1.0 + 1e-6 * (rep + 1))
        return a

    t0 = time.time(); np.asarray(loop(*fresh_args(99)))
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    times = []
    for rep in range(3):
        t0 = time.time(); np.asarray(loop(*fresh_args(rep)))
        times.append(time.time() - t0)
    dt = float(np.median(times)) / REPS
    print(f"{name}: {dt*1e3:.3f} ms ({Q/dt:.0f} qps)", flush=True)

# 1. the raw pallas ADC scan
probe_ids = jnp.asarray(rng.integers(0, P, (Q, NP), dtype=np.int32))
dlut = jnp.asarray(rng.standard_normal((Q, S, KC)).astype(np.float32))
qc = jnp.asarray(rng.standard_normal((Q, NP)).astype(np.float32))
qn2 = jnp.asarray(rng.uniform(1, 2, (Q,)).astype(np.float32))
timeit("pallas ADC scan (8bit)", ivf_pq_adc_scan_pallas, probe_ids, dlut, codes, rnorms, qc, qn2, perturb_idx=1)

# 2. full search step, pallas on
timeit("search_device pallas=True ", _ivf_pq_search_device, q, cents, codes, rnorms, cbs, pen,
       k=K, nprobes=NP, metric="l2", has_mask=False, use_pallas=True, exact_sel=False)
# 3. full search step, XLA fallback
timeit("search_device pallas=False", _ivf_pq_search_device, q, cents, codes, rnorms, cbs, pen,
       k=K, nprobes=NP, metric="l2", has_mask=False, use_pallas=False, exact_sel=False)
