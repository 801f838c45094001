"""Headline benchmark — run on real TPU hardware by the driver.

Config #1 from BASELINE.json: SIFT1M-shaped (1M × 128-d fp32) flat
brute-force L2 top-10. Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": x}

vs_baseline = TPU QPS / CPU QPS measured on this same machine with
numpy+BLAS (multithreaded matmul + argpartition — a favorable stand-in
for the reference's CPU SIMD scan; the reference repo publishes no
reproducible numbers, BASELINE.md). Correctness is asserted: TPU top-10
must match exact numpy top-10 on sampled queries (recall 1.0).

Secondary diagnostics go to stderr only.
"""

import json
import sys
import time

import numpy as np

N_ROWS = 1_000_000
DIM = 128
N_QUERIES = 256
TOP_K = 10
MEASURE_ITERS = 8


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def cpu_baseline(x: np.ndarray, q: np.ndarray) -> float:
    """Numpy/BLAS brute-force QPS (one batch, full exact top-10)."""
    xn2 = np.einsum("nd,nd->n", x, x)
    t0 = time.perf_counter()
    dots = q @ x.T
    d = xn2[None, :] - 2.0 * dots
    idx = np.argpartition(d, TOP_K, axis=1)[:, :TOP_K]
    np.take_along_axis(d, idx, axis=1)
    dt = time.perf_counter() - t0
    return len(q) / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lancedb_tpu.ops.topk import topk_smallest

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    rng = np.random.default_rng(42)
    log("generating data ...")
    x = rng.standard_normal((N_ROWS, DIM)).astype(np.float32)
    q = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)

    log("CPU baseline ...")
    cpu_qps = cpu_baseline(x, q)
    log(f"cpu_qps={cpu_qps:.1f}")

    xj = jax.device_put(jnp.asarray(x))
    xn2 = jnp.sum(jnp.square(xj), axis=1)
    qj = jax.device_put(jnp.asarray(q))

    @jax.jit
    def search(qb, xj, xn2):
        # exact L2: f32 matmul at highest precision + exact top-k
        dots = jnp.dot(
            qb, xj.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d = xn2[None, :] - 2.0 * dots
        return topk_smallest(d, TOP_K)

    log("compiling ...")
    t0 = time.perf_counter()
    vals, idx = search(qj, xj, xn2)
    vals.block_until_ready()
    log(f"compile+first-run {time.perf_counter() - t0:.1f}s")

    # correctness: exact recall vs numpy on 8 sampled queries
    sample = slice(0, 8)
    d_ref = (
        np.einsum("nd,nd->n", x, x)[None, :]
        - 2.0 * (q[sample] @ x.T)
    )
    ref_top = np.argsort(d_ref, axis=1)[:, :TOP_K]
    got = np.asarray(idx)[sample]
    recall = np.mean([
        len(set(got[i]) & set(ref_top[i])) / TOP_K for i in range(got.shape[0])
    ])
    log(f"recall@10 vs exact = {recall:.4f}")
    assert recall >= 0.999, f"exact search must have recall 1.0, got {recall}"

    log("measuring ...")
    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        vals, idx = search(qj, xj, xn2)
    vals.block_until_ready()
    dt = time.perf_counter() - t0
    tpu_qps = MEASURE_ITERS * N_QUERIES / dt
    log(f"tpu_qps={tpu_qps:.1f}  ({dt / MEASURE_ITERS * 1e3:.2f} ms / {N_QUERIES}-query batch)")

    print(
        json.dumps(
            {
                "metric": "SIFT1M-shape flat L2 top-10 QPS (batch=256, exact f32)",
                "value": round(tpu_qps, 1),
                "unit": "qps",
                "vs_baseline": round(tpu_qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
