import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"
N, DIM, NQ, K = 200_000, 128, 64, 10
rng = np.random.default_rng(42)
spectrum = (np.arange(DIM) + 1.0) ** -0.5
spectrum = (spectrum / np.linalg.norm(spectrum) * np.sqrt(DIM)).astype(np.float32)
coarse = rng.standard_normal((1024, DIM)).astype(np.float32)
parents = coarse[rng.integers(0, 1024, 20000)] + 0.45 * rng.standard_normal((20000, DIM)).astype(np.float32)
x = (parents[rng.integers(0, 20000, N)] + 0.18 * rng.standard_normal((N, DIM)).astype(np.float32)) * spectrum
q = (parents[rng.integers(0, 20000, NQ)] + 0.18 * rng.standard_normal((NQ, DIM)).astype(np.float32)) * spectrum
xn2 = np.einsum("nd,nd->n", x.astype(np.float64), x.astype(np.float64))
d_ref = xn2[None, :] - 2.0 * (q.astype(np.float64) @ x.T.astype(np.float64))
gt = [set(r.tolist()) for r in np.argsort(d_ref, axis=1)[:, :K]]
def recall(ids):
    return float(np.mean([len(set(ids[i].tolist()[:K]) & gt[i]) / K for i in range(NQ)]))
import pyarrow as pa
from lancedb_tpu.index import IvfPq
from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset
tbl = pa.table({"id": pa.array(np.arange(N, dtype=np.int64)),
                "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), DIM)})
ds = Dataset.create(MemoryStore(), "s.lance", tbl.schema, tbl)
meta = build_vector_index(ds, "vector", IvfPq(num_partitions=256, num_sub_vectors=32, num_bits=4))
s = load_searcher(ds, meta)
for mode in ("normal", "accurate"):
    _, rid = s.search(q, SearchParams(k=K, nprobes=20, approx_mode=mode))
    print(f"PQ raw  sel={mode}: {recall((rid & np.uint64(0xFFFFFFFF)).astype(np.int64)):.4f}", flush=True)
    d2, rid2 = s.search(q, SearchParams(k=K, nprobes=20, refine_factor=10, approx_mode=mode))
    d2, rid2 = s.refine(ds, "vector", q, d2, rid2, K)
    print(f"PQ ref  sel={mode}: {recall((rid2 & np.uint64(0xFFFFFFFF)).astype(np.int64)):.4f}", flush=True)
