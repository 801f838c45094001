"""500k HNSW end-to-end: build via build_hnsw_index, host-walk qps,
batched device beam qps + recall."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import pyarrow as pa

from lancedb_tpu.index import HnswFlat
from lancedb_tpu.index.hnsw import build_hnsw_index
from lancedb_tpu.index.vector import SearchParams, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
d = 128
rng = np.random.default_rng(0)
nc = 1000
cents = rng.standard_normal((nc, d)).astype(np.float32) * 2
x = cents[rng.integers(0, nc, n)] + rng.standard_normal((n, d)).astype(np.float32)

tbl = pa.table({
    "id": pa.array(np.arange(n, dtype=np.int64)),
    "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), d),
})
ds = Dataset.create(MemoryStore(), "t.lance", tbl.schema, tbl)
t0 = time.time()
meta = build_hnsw_index(ds, "vector", HnswFlat())
print(f"build: {time.time()-t0:.1f}s", flush=True)
print("timings:", meta.params["build_timings"], flush=True)

s = load_searcher(ds, meta)
rng2 = np.random.default_rng(17)
qs = x[rng2.integers(0, n, 256)] + 0.05 * rng2.standard_normal((256, d)).astype(np.float32)
qs = qs.astype(np.float32)

# ground truth on 256 queries (host matmul)
t0 = time.time()
d_all = (qs * qs).sum(1)[:, None] - 2.0 * (qs @ x.T) + (x * x).sum(1)[None, :]
gt = np.argsort(d_all, axis=1)[:, :10]
gt_sets = [set(r.tolist()) for r in gt]
print(f"gt: {time.time()-t0:.0f}s", flush=True)

# host walk qps (single query loop, 64 queries)
for i in range(4):
    s.search(qs[i], SearchParams(k=10, ef=64))
for ef in (64, 128):
    t0 = time.time()
    ids_h = []
    for i in range(64):
        _, r = s.search(qs[i], SearchParams(k=10, ef=ef))
        ids_h.append((r[0] & np.uint64(0xFFFFFFFF)).astype(np.int64))
    dt = time.time() - t0
    rec = np.mean([len(set(ids_h[i].tolist()) & gt_sets[i]) / 10 for i in range(64)])
    print(f"host ef={ef}: {64/dt:.0f} qps recall={rec:.4f}", flush=True)

# device batched
for ef in (64, 128, 256):
    dd, rr = s.search_batched(qs, SearchParams(k=10, ef=ef))  # warm/compile
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        dd, rr = s.search_batched(qs, SearchParams(k=10, ef=ef))
    dt = (time.time() - t0) / reps
    ids = (rr & np.uint64(0xFFFFFFFF)).astype(np.int64)
    rec = np.mean([len(set(ids[i].tolist()) & gt_sets[i]) / 10 for i in range(256)])
    print(f"device ef={ef}: {256/dt:.0f} qps recall={rec:.4f} ({dt*1000:.1f} ms/batch-256)", flush=True)
