import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"
from lancedb_tpu.parallel import ShardedIvfPqIndex, make_mesh

mesh = make_mesh(1)
n, dim = 20_000, 32
rng = np.random.default_rng(5)
centers = rng.standard_normal((64, dim)).astype(np.float32)
x = centers[rng.integers(0, 64, n)] + 0.2 * rng.standard_normal((n, dim)).astype(np.float32)
idx = ShardedIvfPqIndex(mesh, x, np.arange(n, dtype=np.uint64), num_partitions=32, num_sub_vectors=8)
q = x[123:124] + 0.01 * rng.standard_normal((1, dim)).astype(np.float32)
vals, ids = idx.search(q, k=5, nprobes=8)
print("sharded pallas-in-shard_map top-5:", ids[0].tolist(), flush=True)
assert ids[0][0] == 123
print("sharded TPU e2e OK", flush=True)
