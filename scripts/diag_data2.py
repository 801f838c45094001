"""Validate realistic hierarchical bench data: PQ/IVF recall should behave
like SIFT1M (raw PQ ~0.5+, refine -> 0.95+, IVF_FLAT ~1.0, recall rises
with nprobes)."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp

N, DIM, NQ, K = 200_000, 128, 64, 10
NCOARSE, NPARENT = 1024, 20_000
rng = np.random.default_rng(42)

# covariance spectrum like real embeddings: energy concentrated in few dims
spectrum = (np.arange(DIM) + 1.0) ** -0.5
spectrum = (spectrum / np.linalg.norm(spectrum) * np.sqrt(DIM)).astype(np.float32)

coarse = rng.standard_normal((NCOARSE, DIM)).astype(np.float32)
parents = coarse[rng.integers(0, NCOARSE, NPARENT)] + 0.45 * rng.standard_normal((NPARENT, DIM)).astype(np.float32)
pa = rng.integers(0, NPARENT, N)
x = (parents[pa] + 0.18 * rng.standard_normal((N, DIM)).astype(np.float32)) * spectrum
qp = rng.integers(0, NPARENT, NQ)
q = (parents[qp] + 0.18 * rng.standard_normal((NQ, DIM)).astype(np.float32)) * spectrum

xn2 = np.einsum("nd,nd->n", x.astype(np.float64), x.astype(np.float64))
d_ref = xn2[None, :] - 2.0 * (q.astype(np.float64) @ x.T.astype(np.float64))
gt = np.argsort(d_ref, axis=1)[:, :K]
gt_sets = [set(r.tolist()) for r in gt]
def recall(ids):
    return float(np.mean([len(set(ids[i].tolist()[:K]) & gt_sets[i]) / K for i in range(NQ)]))

import pyarrow as pa_
from lancedb_tpu.index import IvfPq, IvfFlat
from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

tbl = pa_.table({
    "id": pa_.array(np.arange(N, dtype=np.int64)),
    "vector": pa_.FixedSizeListArray.from_arrays(pa_.array(x.ravel()), DIM),
})
ds = Dataset.create(MemoryStore(), "diag2.lance", tbl.schema, tbl)

NPART = 256
meta_f = build_vector_index(ds, "vector", IvfFlat(num_partitions=NPART))
sf = load_searcher(ds, meta_f)
for npb in (4, 10, 20):
    d3, rid3 = sf.search(q, SearchParams(k=K, nprobes=npb))
    print(f"IVF_FLAT np={npb}: recall {recall((rid3 & np.uint64(0xFFFFFFFF)).astype(np.int64)):.4f}", flush=True)

for nb, ns in ((8, 16), (4, 32)):
    meta = build_vector_index(ds, "vector", IvfPq(num_partitions=NPART, num_sub_vectors=ns, num_bits=nb))
    s = load_searcher(ds, meta)
    d, rid = s.search(q, SearchParams(k=K, nprobes=20))
    r_raw = recall((rid & np.uint64(0xFFFFFFFF)).astype(np.int64))
    d2, rid2 = s.search(q, SearchParams(k=K, nprobes=20, refine_factor=10))
    d2, rid2 = s.refine(ds, "vector", q, d2, rid2, K)
    r_ref = recall((rid2 & np.uint64(0xFFFFFFFF)).astype(np.int64))
    print(f"IVF_PQ {nb}bit x{ns}: raw {r_raw:.4f}  refine10 {r_ref:.4f}  pmax={s.pmax}", flush=True)
