"""Headline benchmark — run on real TPU hardware by the driver.

Covers BASELINE.json configs on SIFT1M-shaped data (1M × 128-d fp32).
The data is a seeded mixture of gaussian clusters: real embedding
datasets (SIFT/GIST/OpenAI) are clusterable — that's the property IVF
exploits — so pure-iid-gaussian data would make IVF recall meaningless.

  #1 flat brute-force L2 top-10 (exact, recall 1.0)  ← headline JSON
  #2 IVF_FLAT 1024 partitions, nprobes sweep (QPS + recall@10)
  #3 IVF_PQ (residual, 16 subvectors) + refine rerank (build, QPS, recall)

Prints ONE JSON line (headline = config #1 QPS); details to stderr +
bench_details.json.

Measurement protocol for the axon tunnel (per-dispatch round trip is
noisy, 25–450 ms, and identical dispatches may be elided): every timed
case runs its batch loop INSIDE one jit (lax.scan with a cross-
iteration data dependence), is warmed including every sub-path, then
timed over fresh inputs and synced with a host fetch; enough in-jit
iterations that compute ≫ round trip.
"""

import json
import sys
import time

import numpy as np

N_ROWS = 1_000_000
DIM = 128
N_QUERIES = 256
TOP_K = 10
N_CLUSTERS = 4096  # synthetic structure (≈ SIFT clusterability)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_data(rng):
    """Clustered synthetic embeddings: 4096 centers, σ=0.35 within."""
    centers = rng.standard_normal((N_CLUSTERS, DIM)).astype(np.float32)
    assign = rng.integers(0, N_CLUSTERS, N_ROWS)
    x = centers[assign] + 0.35 * rng.standard_normal((N_ROWS, DIM)).astype(np.float32)
    # queries near the data manifold (true near-neighbor structure)
    qa = rng.integers(0, N_CLUSTERS, N_QUERIES * 8)
    q = centers[qa] + 0.35 * rng.standard_normal((N_QUERIES * 8, DIM)).astype(np.float32)
    return x.astype(np.float32), q.astype(np.float32).reshape(8, N_QUERIES, DIM)


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
    log("generating clustered data ...")
    x, queries = make_data(rng)
    q0 = queries[0]

    log("CPU baseline ...")
    cpu_qps = cpu_baseline(x, q0)
    details["cpu_flat_qps"] = round(cpu_qps, 2)
    log(f"cpu_flat_qps={cpu_qps:.1f}")

    # exact ground truth on 64 queries
    xn2_np = np.einsum("nd,nd->n", x, x)
    gt_q = q0[:64]
    d_ref = xn2_np[None, :] - 2.0 * (gt_q @ x.T)
    gt_sets = [set(r.tolist()) for r in np.argpartition(d_ref, TOP_K, axis=1)[:, :TOP_K]]

    def recall_of(ids64) -> float:
        return float(np.mean([len(set(ids64[i].tolist()) & gt_sets[i]) / TOP_K for i in range(64)]))

    xj = jax.device_put(jnp.asarray(x))
    xn2 = jnp.sum(jnp.square(xj), axis=1)
    qstack = jax.device_put(jnp.asarray(queries))
    _ = np.asarray(xn2[0])

    # ---------------- flat scans: in-jit loop, compute-dominated --------
    def timed_inner_loop(batch_fn, iters, label):
        @jax.jit
        def run(qstack, xj, xn2):
            def body(carry, i):
                q = qstack[i % 8] + carry * 1e-20
                v = batch_fn(q, xj, xn2)
                return carry + jnp.sum(v) * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return out

        t0 = time.perf_counter()
        np.asarray(run(qstack, xj, xn2))
        compile_s = time.perf_counter() - t0
        times = []
        for rep in range(3):
            fresh = qstack * (1.0 + 1e-6 * (rep + 1))
            t0 = time.perf_counter()
            np.asarray(run(fresh, xj, xn2))
            times.append(time.perf_counter() - t0)
        total = float(np.median(times))
        per_batch = total / iters
        log(f"{label}: compile={compile_s:.1f}s total={total * 1e3:.0f}ms "
            f"{per_batch * 1e3:.3f} ms/batch {N_QUERIES / per_batch:.0f} qps")
        return per_batch

    def flat_exact(q, xj, xn2):
        dots = jnp.dot(q, xj.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        v, _ = topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)
        return v

    def flat_bf16(q, xj, xn2):
        dots = jnp.dot(q.astype(jnp.bfloat16), xj.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        v, _ = topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)
        return v

    per_batch = timed_inner_loop(flat_exact, 64, "flat exact f32")
    flat_qps = N_QUERIES / per_batch
    details["tpu_flat_exact_qps"] = round(flat_qps, 1)
    pb = timed_inner_loop(flat_bf16, 64, "flat bf16")
    details["tpu_flat_bf16_qps"] = round(N_QUERIES / pb, 1)

    @jax.jit
    def flat_ids(q, xj, xn2):
        dots = jnp.dot(q, xj.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        return topk_smallest(xn2[None, :] - 2.0 * dots, TOP_K)[1]

    ids = np.asarray(flat_ids(jnp.asarray(gt_q), xj, xn2))
    r = recall_of(ids)
    details["tpu_flat_recall"] = r
    log(f"flat exact recall@10 = {r:.4f}")
    assert r >= 0.999, f"exact search must be exact, got {r}"

    # ---------------- IVF benches ---------------------------------------
    try:
        from lancedb_tpu.index import IvfFlat, IvfPq
        from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
        from lancedb_tpu.io.object_store import MemoryStore
        from lancedb_tpu.storage.dataset import Dataset
        import pyarrow as pa

        log("building dataset for IVF benches ...")
        tbl = pa.table({
            "id": pa.array(np.arange(N_ROWS, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), DIM),
        })
        ds = Dataset.create(MemoryStore(), "bench.lance", tbl.schema, tbl)

        def timed_search(searcher, params, refine=False, reps=5):
            """Median end-to-end wall time per 256-query batch (fresh
            queries per rep; every path warmed first)."""
            def once(qarr):
                d, rid = searcher.search(qarr, params)
                if refine:
                    d, rid = searcher.refine(ds, "vector", qarr, d, rid, TOP_K)
                return d, rid

            once(queries[1])  # warm (compiles + refine path)
            once(queries[2])
            times = []
            for rep in range(reps):
                qarr = queries[3 + (rep % 5)]
                t0 = time.perf_counter()
                once(qarr)
                times.append(time.perf_counter() - t0)
            return float(np.median(times))

        t0 = time.perf_counter()
        meta_ivf = build_vector_index(ds, "vector", IvfFlat(num_partitions=1024))
        ivf_build_s = time.perf_counter() - t0
        details["ivf_flat_build_seconds"] = round(ivf_build_s, 1)
        log(f"IVF_FLAT build {ivf_build_s:.1f}s (includes one-time kernel compiles)")
        s = load_searcher(ds, meta_ivf)
        for nprobes in (8, 20, 64):
            params = SearchParams(k=TOP_K, nprobes=nprobes)
            dt = timed_search(s, params)
            d, rid = s.search(gt_q, params)
            rec = recall_of((rid & np.uint64(0xFFFFFFFF)).astype(np.int64))
            qps = N_QUERIES / dt
            details[f"ivf_flat_np{nprobes}"] = {"qps": round(qps, 1), "recall": round(rec, 4)}
            log(f"IVF_FLAT nprobes={nprobes}: {qps:.0f} qps recall@10={rec:.4f}")

        t0 = time.perf_counter()
        meta_pq = build_vector_index(ds, "vector", IvfPq(num_partitions=1024, num_sub_vectors=16))
        pq_build_s = time.perf_counter() - t0
        details["ivf_pq_build_seconds"] = round(pq_build_s, 1)
        log(f"IVF_PQ build {pq_build_s:.1f}s")
        sp = load_searcher(ds, meta_pq)
        for rf in (None, 10):
            params = SearchParams(k=TOP_K, nprobes=20, refine_factor=rf)
            dt = timed_search(sp, params, refine=bool(rf))
            d, rid = sp.search(gt_q, params)
            if rf:
                d, rid = sp.refine(ds, "vector", gt_q, d, rid, TOP_K)
            rec = recall_of((rid & np.uint64(0xFFFFFFFF)).astype(np.int64))
            qps = N_QUERIES / dt
            details[f"ivf_pq_np20_rf{rf or 0}"] = {"qps": round(qps, 1), "recall": round(rec, 4)}
            log(f"IVF_PQ nprobes=20 refine={rf}: {qps:.0f} qps recall@10={rec:.4f}")
    except Exception as e:
        import traceback

        traceback.print_exc(file=sys.stderr)
        details["ivf_error"] = f"{type(e).__name__}: {e}"

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)
    log("details written to bench_details.json")

    print(json.dumps({
        "metric": "SIFT1M-shape flat L2 top-10 QPS (batch=256, exact f32, recall=1.0)",
        "value": round(flat_qps, 1),
        "unit": "qps",
        "vs_baseline": round(flat_qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()
