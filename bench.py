"""Headline benchmark — run on real TPU hardware by the driver.

Covers BASELINE.json configs on SIFT1M-shaped synthetic data
(1M × 128-d fp32, seeded):

  #1 flat brute-force L2 top-10 (exact, recall 1.0)  ← headline JSON
  #2 IVF_FLAT 1024 partitions, nprobes sweep (QPS + recall@10)
  #3 IVF_PQ (residual, 16 subvectors) + refine rerank (build time, QPS, recall)

Prints ONE JSON line (headline = config #1 QPS); everything else goes
to stderr and bench_details.json.

Timing notes: the axon tunnel adds ~25 ms per dispatch+fetch round
trip and may elide unconsumed dispatches, so each measurement runs N
batches INSIDE one jit (lax.scan with a data dependence across
iterations) and syncs with a host fetch; the per-call overhead is
calibrated with a trivial program and subtracted.

vs_baseline = TPU QPS / CPU QPS for the same scan with numpy+BLAS on
this machine (the reference publishes no reproducible numbers —
BASELINE.md).
"""

import json
import sys
import time

import numpy as np

N_ROWS = 1_000_000
DIM = 128
N_QUERIES = 256
TOP_K = 10
SCAN_ITERS = 32


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def cpu_baseline(x, q):
    xn2 = np.einsum("nd,nd->n", x, x)
    t0 = time.perf_counter()
    d = xn2[None, :] - 2.0 * (q @ x.T)
    idx = np.argpartition(d, TOP_K, axis=1)[:, :TOP_K]
    np.take_along_axis(d, idx, axis=1)
    return len(q) / (time.perf_counter() - t0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lancedb_tpu.ops.topk import topk_smallest

    details = {}
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(42)
    log("generating data ...")
    x = rng.standard_normal((N_ROWS, DIM)).astype(np.float32)
    queries = rng.standard_normal((8, N_QUERIES, DIM)).astype(np.float32)
    q0 = queries[0]

    log("CPU baseline ...")
    cpu_qps = cpu_baseline(x, q0)
    details["cpu_flat_qps"] = round(cpu_qps, 2)
    log(f"cpu_flat_qps={cpu_qps:.1f}")

    # ---- exact ground truth for recall checks (numpy, 64 queries) ----
    xn2_np = np.einsum("nd,nd->n", x, x)
    gt_q = q0[:64]
    d_ref = xn2_np[None, :] - 2.0 * (gt_q @ x.T)
    gt_top = np.argpartition(d_ref, TOP_K, axis=1)[:, :TOP_K]
    gt_sets = [set(row.tolist()) for row in gt_top]

    def recall_of(ids_array) -> float:
        return float(
            np.mean([len(set(ids_array[i].tolist()) & gt_sets[i]) / TOP_K for i in range(64)])
        )

    # ---- device data ----
    xj = jax.device_put(jnp.asarray(x))
    xn2 = jnp.sum(jnp.square(xj), axis=1)
    qstack = jax.device_put(jnp.asarray(queries))
    _ = np.asarray(xn2[0])  # force upload

    def timed_loop(batch_fn, *extra, iters=SCAN_ITERS, label=""):
        """Run `iters` batches inside one jit; return seconds/batch."""

        @jax.jit
        def run(qstack, *extra):
            def body(carry, i):
                q = qstack[i % 8] + carry * 1e-20
                v = batch_fn(q, *extra)
                return carry + jnp.sum(v) * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return out

        t0 = time.perf_counter()
        _ = np.asarray(run(qstack, *extra))  # compile + first run
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(run(qstack * 1.000001, *extra))  # fresh inputs
        total = time.perf_counter() - t0
        per_batch = max(total - _OVERHEAD, 1e-9) / iters
        log(f"{label}: compile={compile_s:.1f}s  {per_batch * 1e3:.3f} ms/batch  "
            f"{N_QUERIES / per_batch:.0f} qps")
        return per_batch

    # calibrate tunnel round-trip overhead
    @jax.jit
    def _tiny(q):
        return jnp.sum(q[0, :8, :8])

    np.asarray(_tiny(qstack))
    t0 = time.perf_counter()
    np.asarray(_tiny(qstack * 1.000001))
    global _OVERHEAD
    _OVERHEAD = time.perf_counter() - t0
    log(f"tunnel overhead ≈ {_OVERHEAD * 1e3:.1f} ms")

    # =============== config #1: flat exact L2 (headline) ===============
    def flat_exact(q, xj, xn2):
        dots = jnp.dot(
            q, xj.T, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )
        v, i = topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)
        return v

    per_batch = timed_loop(flat_exact, xj, xn2, label="flat exact f32")
    flat_qps = N_QUERIES / per_batch
    details["tpu_flat_exact_qps"] = round(flat_qps, 1)

    # correctness: recall 1.0 on 64 queries
    @jax.jit
    def flat_ids(q, xj, xn2):
        dots = jnp.dot(
            q, xj.T, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )
        return topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)[1]

    ids = np.asarray(flat_ids(jnp.asarray(gt_q), xj, xn2))
    r = recall_of(ids)
    details["tpu_flat_recall"] = r
    log(f"flat exact recall@10 = {r:.4f}")
    assert r >= 0.999, f"exact search must be exact, got {r}"

    # flat bf16 (fast mode)
    def flat_bf16(q, xj, xn2):
        dots = jnp.dot(
            q.astype(jnp.bfloat16), xj.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        v, i = topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)
        return v

    pb = timed_loop(flat_bf16, xj, xn2, label="flat bf16")
    details["tpu_flat_bf16_qps"] = round(N_QUERIES / pb, 1)

    # =============== config #2/#3: IVF indexes =========================
    try:
        import lancedb_tpu
        from lancedb_tpu.index import IvfFlat, IvfPq
        from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
        from lancedb_tpu.io.object_store import MemoryStore
        from lancedb_tpu.storage.dataset import Dataset
        import pyarrow as pa

        log("building dataset for IVF benches ...")
        tbl = pa.table(
            {
                "id": pa.array(np.arange(N_ROWS, dtype=np.int64)),
                "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), DIM),
            }
        )
        ds = Dataset.create(MemoryStore(), "bench.lance", tbl.schema, tbl)

        t0 = time.perf_counter()
        meta_ivf = build_vector_index(ds, "vector", IvfFlat(num_partitions=1024))
        ivf_build_s = time.perf_counter() - t0
        details["ivf_flat_build_seconds"] = round(ivf_build_s, 1)
        log(f"IVF_FLAT build {ivf_build_s:.1f}s")
        s = load_searcher(ds, meta_ivf)
        for nprobes in (1, 8, 20, 64):
            t0 = time.perf_counter()
            d, rids = s.search(q0, SearchParams(k=TOP_K, nprobes=nprobes))
            warm0 = time.perf_counter() - t0
            t0 = time.perf_counter()
            d, rids = s.search(q0 * 1.000001, SearchParams(k=TOP_K, nprobes=nprobes))
            dt = time.perf_counter() - t0
            ids = (rids[:64] & np.uint64(0xFFFFFFFF)).astype(np.int64)  # frag 0 → offset == id
            rec = recall_of(ids)
            qps = N_QUERIES / max(dt - _OVERHEAD, 1e-9)
            details[f"ivf_flat_np{nprobes}"] = {"qps": round(qps, 1), "recall": round(rec, 4)}
            log(f"IVF_FLAT nprobes={nprobes}: {qps:.0f} qps recall@10={rec:.4f}")

        t0 = time.perf_counter()
        meta_pq = build_vector_index(
            ds, "vector", IvfPq(num_partitions=1024, num_sub_vectors=16)
        )
        pq_build_s = time.perf_counter() - t0
        details["ivf_pq_build_seconds"] = round(pq_build_s, 1)
        log(f"IVF_PQ build {pq_build_s:.1f}s")
        sp = load_searcher(ds, meta_pq)
        for rf in (None, 10):
            params = SearchParams(k=TOP_K, nprobes=20, refine_factor=rf)
            sp.search(q0, params)  # warm
            t0 = time.perf_counter()
            d, rids = sp.search(q0 * 1.000001, params)
            if rf:
                d, rids = sp.refine(ds, "vector", q0 * 1.000001, d, rids, TOP_K)
            dt = time.perf_counter() - t0
            ids = (rids[:64] & np.uint64(0xFFFFFFFF)).astype(np.int64)
            rec = recall_of(ids)
            qps = N_QUERIES / max(dt - _OVERHEAD, 1e-9)
            key = f"ivf_pq_np20_rf{rf or 0}"
            details[key] = {"qps": round(qps, 1), "recall": round(rec, 4)}
            log(f"IVF_PQ nprobes=20 refine={rf}: {qps:.0f} qps recall@10={rec:.4f}")
    except Exception as e:  # keep the headline even if IVF benches fail
        log(f"IVF benches failed: {type(e).__name__}: {e}")
        details["ivf_error"] = str(e)

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)
    log("details written to bench_details.json")

    print(
        json.dumps(
            {
                "metric": "SIFT1M-shape flat L2 top-10 QPS (batch=256, exact f32, recall=1.0)",
                "value": round(flat_qps, 1),
                "unit": "qps",
                "vs_baseline": round(flat_qps / cpu_qps, 2),
            }
        )
    )


_OVERHEAD = 0.025

if __name__ == "__main__":
    main()
