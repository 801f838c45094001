"""A/B the grouped ADC kernel vs the per-pair kernel and the XLA
one-hot einsum at SIFT1M-class shapes (P=1024, pmax=1024, S=16, Q=128,
np=20). Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adc_grouped.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lancedb_tpu.ops.pallas_adc import (
    ivf_pq_adc_grouped_scan_pallas,
    ivf_pq_adc_scan_pallas,
)

assert jax.default_backend() == "tpu", jax.default_backend()

rng = np.random.default_rng(0)
P, PMAX, Q, NP = 1024, 1024, 128, 20


def bench(fn, label, iters=20):
    @jax.jit
    def run(probe_ids):
        def body(c, i):
            out = fn((probe_ids + i) % P)
            return c + jnp.sum(out) * 1e-12, None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return out

    pid = jnp.asarray(probe_ids)
    np.asarray(run(pid))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(pid))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"  {label}: {per * 1e3:.2f} ms/batch  {Q / per:.0f} qps")


for S, K in ((16, 16), (16, 256), (48, 16)):
    print(f"--- S={S} K={K} ---")
    codes = jnp.asarray(rng.integers(0, K, (P, S, PMAX), dtype=np.uint8))
    dlut = jnp.asarray(rng.standard_normal((Q, S, K)).astype(np.float32))
    rnorms = jnp.asarray(rng.standard_normal((P, PMAX)).astype(np.float32) ** 2)
    qc = jnp.asarray(rng.standard_normal((Q, NP)).astype(np.float32))
    qn2 = jnp.asarray(rng.standard_normal(Q).astype(np.float32) ** 2)
    # clustered probes: queries share partitions (realistic for IVF)
    centers = rng.integers(0, P, Q // 8)
    probe_ids = np.stack([
        (centers[i // 8] + rng.choice(64, NP, replace=False)) % P for i in range(Q)
    ]).astype(np.int32)

    def xla_onehot(pid, c=codes, d=dlut, K_=K):
        # the _ivf_pq_search_device fallback formulation
        dlut_b = d.astype(jnp.bfloat16)

        def probe_step(j):
            p_j = pid[:, j]
            codes_j = jnp.take(c, p_j, axis=0)
            rn_j = jnp.take(rnorms, p_j, axis=0)
            oh = jax.nn.one_hot(codes_j.astype(jnp.int32), K_, dtype=jnp.bfloat16, axis=-1)
            qdotr = jnp.einsum("qspk,qsk->qp", oh, dlut_b, preferred_element_type=jnp.float32)
            return qn2[:, None] - 2.0 * (qc[:, j][:, None] + qdotr) + rn_j

        return jax.lax.map(probe_step, jnp.arange(NP)).transpose(1, 0, 2)

    bench(xla_onehot, "xla one-hot einsum")
    bench(lambda pid, c=codes, d=dlut: ivf_pq_adc_scan_pallas(pid, d, c, rnorms, qc, qn2),
          "per-pair pallas")
    for qpc in (8, 16):
        bench(lambda pid, c=codes, d=dlut, q_=qpc: ivf_pq_adc_grouped_scan_pallas(
            pid, d, c, rnorms, qc, qn2, qpc=q_), f"grouped qpc={qpc}")
