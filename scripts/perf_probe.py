"""Device-side timing of the IVF search kernels with fabricated index
arrays (shapes match a 1M x 128 index, 1024 partitions, pmax=1024).
Times an in-jit lax.scan loop so tunnel round-trips amortize away.
All large arrays are passed as jit ARGUMENTS (closure constants appear
to be re-uploaded per call through the axon tunnel).

PYTHONPATH=. JAX_PLATFORMS='' python scripts/perf_probe.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from lancedb_tpu.index.vector import (
    _ivf_flat_search_device, _ivf_pq_search_device, _select_probes,
)
from lancedb_tpu.ops.topk import topk_smallest

P, PMAX, D, S, K = 1024, 1024, 128, 16, 256
Q, NP, TOPK = 128, 20, 10

rng = np.random.default_rng(0)
dev = jax.devices()[0]
put = lambda a, **kw: jax.device_put(jnp.asarray(a, **kw), dev)
centroids = put(rng.standard_normal((P, D)).astype(np.float32))
vecs = put(rng.standard_normal((P, PMAX, D)).astype(np.float32), dtype=jnp.bfloat16)
norms2 = put(rng.random((P, PMAX)).astype(np.float32) + 100)
codes = put(rng.integers(0, 256, (P, PMAX, S), dtype=np.uint8))
codebooks = put(rng.standard_normal((S, K, D // S)).astype(np.float32))
pen = put(np.zeros((1,), np.float32))
qs = put(rng.standard_normal((8, Q, D)).astype(np.float32))
flatvecs = put(rng.standard_normal((1 << 20, D)).astype(np.float32), dtype=jnp.bfloat16)
flatn2 = put(rng.random((1 << 20,)).astype(np.float32) + 100)
for a in (centroids, vecs, norms2, codes, codebooks, qs, flatvecs, flatn2):
    a.block_until_ready()


def timeit(label, fn, args, iters=16):
    @jax.jit
    def run(qs, *args):
        def body(carry, i):
            q = qs[i % 8] + carry * 1e-20
            v = fn(q, *args)
            return carry + jnp.sum(v) * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return out

    t0 = time.perf_counter(); np.asarray(run(qs, *args)); c = time.perf_counter() - t0
    ts = []
    for r in range(3):
        f = qs * (1 + 1e-6 * r)
        t0 = time.perf_counter(); np.asarray(run(f, *args)); ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / iters
    print(f"{label:34s} compile={c:5.1f}s  {per*1e3:8.3f} ms/batch  {Q/per:9.0f} qps")
    return per


timeit("probe-select only",
       lambda q, c: _select_probes(q, c, NP, "l2")[1], (centroids,))
timeit("ivf_flat (take+einsum)",
       lambda q, c, v, n, p: _ivf_flat_search_device(
           q, c, v, n, p, k=TOPK, nprobes=NP, metric="l2", has_mask=False)[0],
       (centroids, vecs, norms2, pen))
timeit("ivf_pq (onehot scan)",
       lambda q, c, cd, rn, cb, p: _ivf_pq_search_device(
           q, c, cd, rn, cb, p, k=TOPK, nprobes=NP, metric="l2", has_mask=False)[0],
       (centroids, codes, norms2, codebooks, pen), iters=4)
timeit("flat 1M matmul+topk",
       lambda q, v, n: topk_smallest(
           n[None, :] - 2.0 * jnp.dot(q.astype(jnp.bfloat16), v.T,
                                      preferred_element_type=jnp.float32), TOPK)[0],
       (flatvecs, flatn2))
timeit("flat 1M matmul only",
       lambda q, v, n: jnp.max(
           n[None, :] - 2.0 * jnp.dot(q.astype(jnp.bfloat16), v.T,
                                      preferred_element_type=jnp.float32), axis=-1),
       (flatvecs, flatn2))
timeit("flat 1M approx topk",
       lambda q, v, n: jax.lax.approx_max_k(
           -(n[None, :] - 2.0 * jnp.dot(q.astype(jnp.bfloat16), v.T,
                                        preferred_element_type=jnp.float32)), TOPK)[0],
       (flatvecs, flatn2))
