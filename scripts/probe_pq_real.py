"""Real-build PQ timing: replicate bench config #2 4-bit exactly
(clustered 1M x 128, NPART=1024, nsub=32) and print the actual layout
(blocks, pmax, npb) plus per-stage timings on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

assert jax.default_backend() == "tpu", jax.default_backend()

import bench as B
from lancedb_tpu.index import IvfPq
from lancedb_tpu.index.vector import (
    SearchParams,
    _ivf_pq_search_device,
    _pallas_available,
    build_vector_index,
    load_searcher,
)
from lancedb_tpu.storage.dataset import Dataset
from lancedb_tpu.io.object_store import MemoryStore

rng = np.random.default_rng(7)
print("generating clustered data ...")
x, q = B.make_clustered(rng, B.N_ROWS, B.DIM)
fsl = pa.FixedSizeListArray.from_arrays(pa.array(x.reshape(-1), pa.float32()), B.DIM)
tbl = pa.table({"id": pa.array(np.arange(B.N_ROWS, dtype=np.int64)), "vector": fsl})
ds = Dataset.create(MemoryStore(), "t.lance", tbl.schema, tbl)
t0 = time.perf_counter()
meta = build_vector_index(ds, "vector", IvfPq(num_partitions=B.NPART, num_sub_vectors=32, num_bits=4))
print(f"build {time.perf_counter() - t0:.0f}s")
sp = load_searcher(ds, meta)
blocks = sp.nparts
logical = sp.params.get("num_logical_partitions", blocks)
pd = sp._device
npb = min(blocks, max(1, int(np.ceil(20 * blocks / logical))))
print(f"blocks={blocks} logical={logical} pmax={sp.pmax} npb={npb} "
      f"codes={pd['codes'].shape} {pd['codes'].dtype} pallas={_pallas_available()}")

Q = 128
qj = jnp.asarray(q[:Q].astype(np.float32))
zero_pen = jnp.zeros((1,), jnp.float32)


def bench(fn, label, iters=24):
    @jax.jit
    def run(qq):
        def body(c, i):
            out = fn(qq + c * 1e-20)
            return c + jnp.sum(out) * 1e-12, None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return out
    np.asarray(run(qj))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(qj))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"  {label}: {per * 1e3:.2f} ms/batch  {Q / per:.0f} qps")


for use_pallas in (False, True):
    bench(lambda qq, up=use_pallas: _ivf_pq_search_device(
        qq, pd["centroids"], pd["codes"], pd["rnorms"], pd["codebooks"], zero_pen,
        k=10, nprobes=npb, metric="l2", has_mask=False, exact_sel=False,
        use_pallas=up)[0], f"full use_pallas={use_pallas}")

# grouped kernel through the same route shape
from lancedb_tpu.ops.pallas_adc import ivf_pq_adc_grouped_scan_pallas
from lancedb_tpu.index.vector import _pq_dlut, _select_probes
from lancedb_tpu.ops.topk import approx_topk_smallest


def full_grouped(qq, qpc=8):
    probe_ids, probe_dots = _select_probes(qq, pd["centroids"], npb, "l2")
    dlut = _pq_dlut(qq, pd["codebooks"], pd["codes"].shape[1])
    qn2 = jnp.sum(jnp.square(qq), axis=-1)
    dists = ivf_pq_adc_grouped_scan_pallas(
        probe_ids, dlut, pd["codes"], pd["rnorms"], probe_dots, qn2, qpc=qpc)
    flat = dists.reshape(Q, -1)
    return approx_topk_smallest(flat, 10)[0]


for qpc in (8, 16):
    bench(lambda qq, q_=qpc: full_grouped(qq, q_), f"full grouped qpc={qpc}")

# fused device refine at the real build: end-to-end sp.search vs raw
# scan, plus the refined public path cost
from lancedb_tpu.index.vector import SearchParams

params_rf = SearchParams(k=10, nprobes=20, refine_factor=10)
print("preparing device refine ...")
t0 = time.perf_counter()
ok = sp.prepare_device_refine(ds, "vector")
print(f"prepare_device_refine={ok} {time.perf_counter() - t0:.1f}s")
if ok:
    qh = q[:Q].astype(np.float32)
    sp.search(qh, params_rf)  # warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        sp.search(qh, params_rf)
        reps.append(time.perf_counter() - t0)
    med = float(np.median(reps))
    print(f"  fused refined sp.search: {med * 1e3:.1f} ms/batch  {Q / med:.0f} qps")
    sp.search(qh, SearchParams(k=10, nprobes=20))  # warm plain
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        sp.search(qh, SearchParams(k=10, nprobes=20))
        reps.append(time.perf_counter() - t0)
    med = float(np.median(reps))
    print(f"  plain sp.search:        {med * 1e3:.1f} ms/batch  {Q / med:.0f} qps")
