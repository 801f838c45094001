"""Breakdown of _ivf_pq_search_device stages at bench config #2 shapes
(1M x 128, P=1024, S=16, K=16, Q=128, np=20). Mock arrays; run on TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pq_breakdown.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lancedb_tpu.index.vector import _ivf_pq_search_device, _pq_dlut, _select_probes
from lancedb_tpu.ops.topk import approx_topk_smallest, topk_smallest

assert jax.default_backend() == "tpu", jax.default_backend()

rng = np.random.default_rng(0)
P, PMAX, Q, NP, S, K, D = 1024, 1024, 128, 20, 16, 16, 128
DSUB = D // S

centroids = jnp.asarray(rng.standard_normal((P, D)).astype(np.float32))
codes = jnp.asarray(rng.integers(0, K, (P, S, PMAX), dtype=np.uint8))
rnorms = jnp.asarray((rng.standard_normal((P, PMAX)).astype(np.float32)) ** 2)
codebooks = jnp.asarray(rng.standard_normal((S, K, DSUB)).astype(np.float32))
zero_pen = jnp.zeros((1,), jnp.float32)
q = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))


def bench(fn, label, iters=24):
    @jax.jit
    def run(qq):
        def body(c, i):
            out = fn(qq + c * 1e-20)
            return c + jnp.sum(out) * 1e-12, None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return out

    np.asarray(run(q))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(q))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"  {label}: {per * 1e3:.2f} ms/batch  {Q / per:.0f} qps")


bench(lambda qq: _ivf_pq_search_device(
    qq, centroids, codes, rnorms, codebooks, zero_pen,
    k=10, nprobes=NP, metric="l2", has_mask=False, exact_sel=False,
    use_pallas=False)[0], "full (xla, approx sel)")
bench(lambda qq: _ivf_pq_search_device(
    qq, centroids, codes, rnorms, codebooks, zero_pen,
    k=10, nprobes=NP, metric="l2", has_mask=False, exact_sel=True,
    use_pallas=False)[0], "full (xla, exact sel)")
bench(lambda qq: _select_probes(qq, centroids, NP, "l2")[1], "select_probes")
bench(lambda qq: _pq_dlut(qq, codebooks, S), "dlut build")

dists = jnp.asarray(rng.standard_normal((Q, NP * PMAX)).astype(np.float32))
bench(lambda qq: approx_topk_smallest(dists + jnp.sum(qq) * 1e-20, 10)[0],
      "approx topk (Q, np*pmax)")
bench(lambda qq: topk_smallest(dists + jnp.sum(qq) * 1e-20, 10)[0],
      "exact topk (Q, np*pmax)")


# ADC scan only (xla one-hot path, contiguous random probes)
def adc_only(qq):
    probe_ids, probe_dots = _select_probes(qq, centroids, NP, "l2")
    dlut = _pq_dlut(qq, codebooks, S)
    dlut_b = dlut.astype(jnp.bfloat16)
    qn2 = jnp.sum(jnp.square(qq), axis=-1)

    def probe_step(j):
        pid = probe_ids[:, j]
        codes_j = jnp.take(codes, pid, axis=0)
        rn_j = jnp.take(rnorms, pid, axis=0)
        oh = jax.nn.one_hot(codes_j.astype(jnp.int32), K, dtype=jnp.bfloat16, axis=-1)
        qdotr = jnp.einsum("qspk,qsk->qp", oh, dlut_b, preferred_element_type=jnp.float32)
        return qn2[:, None] - 2.0 * (probe_dots[:, j][:, None] + qdotr) + rn_j

    return jax.lax.map(probe_step, jnp.arange(NP)).transpose(1, 0, 2)


bench(adc_only, "probes+dlut+adc (no topk)")
