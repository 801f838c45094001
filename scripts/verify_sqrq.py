import sys, tempfile
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"
import lancedb_tpu

rng = np.random.default_rng(3)
N, DIM = 20_000, 32
centers = rng.standard_normal((64, DIM)).astype(np.float32)
x = centers[rng.integers(0, 64, N)] + 0.2 * rng.standard_normal((N, DIM)).astype(np.float32)
db = lancedb_tpu.connect(tempfile.mkdtemp())
tbl = db.create_table("t", data=[{"id": i, "vector": x[i].tolist()} for i in range(N)])
q = x[77] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
for it in ("IVF_SQ", "IVF_RQ"):
    tbl.create_index(index_type=it, num_partitions=32, replace=True)
    res = tbl.search(q).limit(5).nprobes(8).to_list()
    print(it, "top-5:", [r["id"] for r in res], flush=True)
    assert res[0]["id"] == 77, it
    # probe: nprobes larger than one gather chunk (exercises lax.map path)
    res2 = tbl.search(q).limit(5).nprobes(32).to_list()
    assert res2[0]["id"] == 77, it
print("SQ/RQ e2e OK", flush=True)
