import sys, tempfile
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"
import lancedb_tpu

rng = np.random.default_rng(9)
N, DIM = 30_000, 128
centers = rng.standard_normal((64, DIM)).astype(np.float32)
x = centers[rng.integers(0, 64, N)] + 0.2 * rng.standard_normal((N, DIM)).astype(np.float32)
db = lancedb_tpu.connect(tempfile.mkdtemp())
tbl = db.create_table("t", data=[{"id": i, "cat": i % 3, "vector": x[i].tolist()} for i in range(N)])
q = x[555] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
for metric in ("l2", "cosine", "dot"):
    tbl.create_index(index_type="IVF_FLAT", num_partitions=32, metric=metric, replace=True)
    res = tbl.search(q).limit(5).nprobes(4).to_list()  # small batch -> probed pallas path
    ids = [r["id"] for r in res]
    print(f"IVF_FLAT pallas {metric}: top-5 {ids}", flush=True)
    if metric != "dot":
        assert ids[0] == 555, metric
    d = [r["_distance"] for r in res]
    assert d == sorted(d), metric
# filtered (penalty fold into kernel)
res = tbl.search(q).where("cat = 1").limit(5).nprobes(4).to_list()
assert all(r["cat"] == 1 for r in res)
print("filtered ok:", [r["id"] for r in res], flush=True)
print("IVF_FLAT pallas e2e OK", flush=True)
