import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"

N, DIM, NQ, K = 200_000, 128, 64, 10
NCOARSE, NPARENT, NPART = 1024, 20_000, 256
rng = np.random.default_rng(42)
spectrum = (np.arange(DIM) + 1.0) ** -0.5
spectrum = (spectrum / np.linalg.norm(spectrum) * np.sqrt(DIM)).astype(np.float32)
coarse = rng.standard_normal((NCOARSE, DIM)).astype(np.float32)
parents = coarse[rng.integers(0, NCOARSE, NPARENT)] + 0.45 * rng.standard_normal((NPARENT, DIM)).astype(np.float32)
x = (parents[rng.integers(0, NPARENT, N)] + 0.18 * rng.standard_normal((N, DIM)).astype(np.float32)) * spectrum
q = (parents[rng.integers(0, NPARENT, NQ)] + 0.18 * rng.standard_normal((NQ, DIM)).astype(np.float32)) * spectrum
xn2 = np.einsum("nd,nd->n", x.astype(np.float64), x.astype(np.float64))
d_ref = xn2[None, :] - 2.0 * (q.astype(np.float64) @ x.T.astype(np.float64))
gt_sets = [set(r.tolist()) for r in np.argsort(d_ref, axis=1)[:, :K]]
def recall(ids):
    return float(np.mean([len(set(ids[i].tolist()[:K]) & gt_sets[i]) / K for i in range(NQ)]))

import pyarrow as pa_
from lancedb_tpu.index import IvfPq
from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset
tbl = pa_.table({"id": pa_.array(np.arange(N, dtype=np.int64)),
                 "vector": pa_.FixedSizeListArray.from_arrays(pa_.array(x.ravel()), DIM)})
ds = Dataset.create(MemoryStore(), "o.lance", tbl.schema, tbl)
for label, cfg in [
    ("PQ 4bit", IvfPq(num_partitions=NPART, num_sub_vectors=32, num_bits=4)),
    ("OPQ 4bit", IvfPq(num_partitions=NPART, num_sub_vectors=32, num_bits=4, opq=True)),
    ("PQ 8bit", IvfPq(num_partitions=NPART, num_sub_vectors=16)),
    ("OPQ 8bit", IvfPq(num_partitions=NPART, num_sub_vectors=16, opq=True)),
]:
    t0 = time.perf_counter()
    meta = build_vector_index(ds, "vector", cfg)
    bt = time.perf_counter() - t0
    s = load_searcher(ds, meta)
    _, rid = s.search(q, SearchParams(k=K, nprobes=20))
    raw = recall((rid & np.uint64(0xFFFFFFFF)).astype(np.int64))
    d2, rid2 = s.search(q, SearchParams(k=K, nprobes=20, refine_factor=10))
    d2, rid2 = s.refine(ds, "vector", q, d2, rid2, K)
    rr = recall((rid2 & np.uint64(0xFFFFFFFF)).astype(np.int64))
    print(f"{label:10s} build={bt:5.1f}s raw={raw:.4f} refine10={rr:.4f}", flush=True)
