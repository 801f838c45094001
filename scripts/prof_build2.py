import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"
import pyarrow as pa
from lancedb_tpu.index import IvfPq, IvfFlat
from lancedb_tpu.index.vector import build_vector_index
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

N, DIM = 1_000_000, 128
rng = np.random.default_rng(0)
x = rng.standard_normal((N, DIM)).astype(np.float32)
tbl = pa.table({
    "id": pa.array(np.arange(N, dtype=np.int64)),
    "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), DIM),
})
ds = Dataset.create(MemoryStore(), "p.lance", tbl.schema, tbl)
for label, cfg in [
    ("IVF_PQ 4bit cold", IvfPq(num_partitions=1024, num_sub_vectors=32, num_bits=4)),
    ("IVF_PQ 4bit warm", IvfPq(num_partitions=1024, num_sub_vectors=32, num_bits=4, seed=1)),
    ("IVF_FLAT", IvfFlat(num_partitions=1024)),
]:
    t0 = time.perf_counter()
    build_vector_index(ds, "vector", cfg)
    print(f"{label:22s} {time.perf_counter()-t0:6.1f}s", flush=True)
