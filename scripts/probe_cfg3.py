"""Probe BASELINE config #3 geometry on the real chip: 1M x 960-d,
2048 partitions, 96 subvectors, 4-bit PQ + refine10. Measures build
(incl. tunnel upload), probed-scan QPS, raw + refined recall, and the
refine rerank cost separately."""

import sys
import time

import numpy as np

N, D = 1_000_000, 960
NPART, NSUB, NBITS = 2048, 96, 4
NQ = 64
TOP_K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import pyarrow as pa

    from lancedb_tpu.index import IvfPq
    from lancedb_tpu.index.vector import (
        SearchParams, _ivf_pq_search_device, _pallas_available,
        build_vector_index, load_searcher,
    )
    from lancedb_tpu.io.object_store import MemoryStore
    from lancedb_tpu.ops.topk import approx_topk_smallest, topk_smallest
    from lancedb_tpu.storage.dataset import Dataset

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    spectrum = ((np.arange(D) + 1.0) ** -0.5).astype(np.float32)
    spectrum = spectrum / np.linalg.norm(spectrum) * np.sqrt(D)
    coarse = rng.standard_normal((4096, D)).astype(np.float32)
    pa_idx = rng.integers(0, 4096, 65536)
    parents = coarse[pa_idx] + 0.45 * rng.standard_normal((65536, D)).astype(np.float32)
    asn = rng.integers(0, 65536, N)
    x = (parents[asn] + 0.18 * rng.standard_normal((N, D)).astype(np.float32)) * spectrum
    x = x.astype(np.float32)
    qp = rng.integers(0, 65536, NQ)
    q = ((parents[qp] + 0.18 * rng.standard_normal((NQ, D)).astype(np.float32)) * spectrum).astype(np.float32)
    log(f"datagen {time.perf_counter() - t0:.0f}s")

    t0 = time.perf_counter()
    tbl = pa.table({
        "id": pa.array(np.arange(N, dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), D),
    })
    ds = Dataset.create(MemoryStore(), "p3.lance", tbl.schema, tbl)
    log(f"dataset {time.perf_counter() - t0:.0f}s")

    t0 = time.perf_counter()
    meta = build_vector_index(ds, "vector", IvfPq(
        num_partitions=NPART, num_sub_vectors=NSUB, num_bits=NBITS))
    build_s = time.perf_counter() - t0
    log(f"BUILD {build_s:.0f}s")

    s = load_searcher(ds, meta)
    blocks, logical = s.nparts, s.params.get("num_logical_partitions", s.nparts)
    log(f"blocks={blocks} logical={logical} pmax={s.pmax}")
    pd = s._device
    dev = jax.devices()[0]
    zero_pen = jax.device_put(jnp.zeros((1,), jnp.float32), dev)

    # ground truth on-device (bf16 coarse + f32 rerank of 8k cands)
    t0 = time.perf_counter()
    xj = jax.device_put(jnp.asarray(x, jnp.bfloat16), dev)
    log(f"GT upload {time.perf_counter() - t0:.0f}s")
    xn2 = jnp.sum(jnp.square(xj.astype(jnp.float32)), axis=1)

    @jax.jit
    def gt_ids(qd, xj, xn2):
        dots = jnp.dot(qd.astype(jnp.bfloat16), xj.T, preferred_element_type=jnp.float32)
        _, cand = approx_topk_smallest(xn2[None, :] - 2.0 * dots, 100)
        xc = jnp.take(xj, cand, axis=0).astype(jnp.float32)
        d2 = jnp.sum(jnp.square(qd[:, None, :] - xc), axis=-1)
        _, pos = topk_smallest(d2, TOP_K)
        return jnp.take_along_axis(cand, pos, axis=1)

    t0 = time.perf_counter()
    gt = np.asarray(gt_ids(jnp.asarray(q), xj, xn2))
    log(f"GT compute {time.perf_counter() - t0:.0f}s")
    gt_sets = [set(r.tolist()) for r in gt]
    del xj, xn2

    # probed scan timing (in-jit loop like bench.py)
    npb = min(blocks, max(1, int(np.ceil(20 * blocks / logical))))
    qstack = jax.device_put(jnp.asarray(np.tile(q, (2, 1, 1))), dev)

    @jax.jit
    def run(qstack, c, cd, rn, cb, p):
        def body(carry, i):
            qq = qstack[i % 2] + carry * 1e-20
            v, _ = _ivf_pq_search_device(
                qq, c, cd, rn, cb, p, k=TOP_K, nprobes=npb, metric="l2",
                has_mask=False, exact_sel=False, use_pallas=_pallas_available())
            return carry + jnp.sum(v) * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(16))
        return out

    args = (pd["centroids"], pd["codes"], pd["rnorms"], pd["codebooks"], zero_pen)
    t0 = time.perf_counter()
    np.asarray(run(qstack, *args))
    log(f"scan compile+run {time.perf_counter() - t0:.1f}s")
    times = []
    for rep in range(3):
        fresh = qstack * (1.0 + 1e-6 * rep)
        t0 = time.perf_counter()
        np.asarray(run(fresh, *args))
        times.append(time.perf_counter() - t0)
    per = float(np.median(times)) / 16
    log(f"scan {per * 1e3:.2f} ms/batch{NQ} -> {NQ / per:.0f} qps (RTT not subtracted)")

    # recall raw + refined, and refine cost
    d1, rid1 = s.search(q, SearchParams(k=TOP_K, nprobes=20))
    ids1 = (rid1 & np.uint64(0xFFFFFFFF)).astype(np.int64)
    rec_raw = np.mean([len(set(ids1[i].tolist()) & gt_sets[i]) / TOP_K for i in range(NQ)])
    d2_, rid2 = s.search(q, SearchParams(k=TOP_K, nprobes=20, refine_factor=10))
    t0 = time.perf_counter()
    d3, rid3 = s.refine(ds, "vector", q, d2_, rid2, TOP_K)
    refine_s = time.perf_counter() - t0
    ids3 = (rid3 & np.uint64(0xFFFFFFFF)).astype(np.int64)
    rec_rf = np.mean([len(set(ids3[i].tolist()) & gt_sets[i]) / TOP_K for i in range(NQ)])
    log(f"recall raw={rec_raw:.4f} refine10={rec_rf:.4f} refine_cost={refine_s * 1e3:.0f}ms/{NQ}q")


if __name__ == "__main__":
    main()
