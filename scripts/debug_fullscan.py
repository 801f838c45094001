import sys
sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)

N, DIM, NQ, K = 200_000, 64, 64, 10
rng = np.random.default_rng(42)
centers = rng.standard_normal((512, DIM)).astype(np.float32)
x = centers[rng.integers(0, 512, N)] + 0.25 * rng.standard_normal((N, DIM)).astype(np.float32)
q = x[rng.integers(0, N, NQ)] + 0.02 * rng.standard_normal((NQ, DIM)).astype(np.float32)
xn2 = np.einsum("nd,nd->n", x.astype(np.float64), x.astype(np.float64))
d_ref = xn2[None, :] - 2.0 * (q.astype(np.float64) @ x.T.astype(np.float64))
gt = [set(r.tolist()) for r in np.argsort(d_ref, axis=1)[:, :K]]
def recall(ids):
    return float(np.mean([len(set(ids[i].tolist()[:K]) & gt[i]) / K for i in range(NQ)]))

import pyarrow as pa
from lancedb_tpu.index import IvfFlat
from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset
tbl = pa.table({"id": pa.array(np.arange(N, dtype=np.int64)),
                "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), DIM)})
ds = Dataset.create(MemoryStore(), "d.lance", tbl.schema, tbl)
meta = build_vector_index(ds, "vector", IvfFlat(num_partitions=128))
s = load_searcher(ds, meta)
print("blocks:", s.nparts, "pmax:", s.pmax, flush=True)
for np_ in (8, 32):
    _, rid = s.search(q, SearchParams(k=K, nprobes=np_, use_index_for_batch=True))
    print(f"probed np={np_}: recall {recall((rid & np.uint64(0xFFFFFFFF)).astype(np.int64)):.4f}", flush=True)
_, rid = s.search(q, SearchParams(k=K, nprobes=32))  # auto → full scan (64*44 > blocks)
print(f"auto(full-scan) recall: {recall((rid & np.uint64(0xFFFFFFFF)).astype(np.int64)):.4f}", flush=True)
_, rid = s.search(q, SearchParams(k=K, nprobes=32, approx_mode="accurate"))
print(f"full-scan f32-exact-mode recall: {recall((rid & np.uint64(0xFFFFFFFF)).astype(np.int64)):.4f}", flush=True)
