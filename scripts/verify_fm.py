import sys, tempfile, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
t0 = time.time()
import lancedb_tpu
print("backend:", jax.default_backend(), flush=True)

db = lancedb_tpu.connect(tempfile.mkdtemp())
docs = ["alpha beta", "gamma delta", "betamax tapes", "pure gold", "alphabet soup"]
tbl = db.create_table("t", data=[
    {"id": i, "text": docs[i], "vector": np.random.default_rng(i).standard_normal(8).tolist()}
    for i in range(len(docs))
])
tbl.create_scalar_index("text", index_type="FM")
r = tbl.search(np.zeros(8, np.float32)).where("text LIKE '%beta%'").limit(10).to_list()
print("LIKE '%beta%':", sorted(x["id"] for x in r), flush=True)
assert sorted(x["id"] for x in r) == [0, 2]
r2 = tbl.search(np.zeros(8, np.float32)).where("text LIKE 'alpha%'").limit(10).to_list()
print("LIKE 'alpha%':", sorted(x["id"] for x in r2), flush=True)
assert sorted(x["id"] for x in r2) == [0, 4]
# probe: pattern with '_' falls back to scan and still works
r3 = tbl.search(np.zeros(8, np.float32)).where("text LIKE '%bet_max%'").limit(10).to_list()
print("LIKE '%bet_max%' (scan fallback):", [x["id"] for x in r3], flush=True)
assert [x["id"] for x in r3] == [2]
print(f"FM e2e ok ({time.time()-t0:.0f}s)", flush=True)
