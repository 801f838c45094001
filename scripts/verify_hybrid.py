import sys, tempfile
sys.path.insert(0, '/root/repo')
import numpy as np, jax
assert jax.default_backend() == "tpu"
import lancedb_tpu

rng = np.random.default_rng(4)
N, DIM = 5000, 64
words = ["apple", "banana", "cherry", "dragon", "elder", "fig", "grape"]
docs = [" ".join(rng.choice(words, 5)) for _ in range(N)]
docs[77] = "golden retriever puppy playing fetch"
x = rng.standard_normal((N, DIM)).astype(np.float32)
db = lancedb_tpu.connect(tempfile.mkdtemp())
tbl = db.create_table("t", data=[{"id": i, "text": docs[i], "vector": x[i].tolist()} for i in range(N)])
tbl.create_fts_index("text")
tbl.create_index(index_type="IVF_FLAT", num_partitions=16)

# 1. FTS alone
r1 = tbl.search("golden retriever").limit(3).to_list()
print("fts:", [(r["id"], round(r["_score"], 2)) for r in r1], flush=True)
assert r1[0]["id"] == 77

# 2. hybrid: vector near row 77 + matching text → RRF fusion must rank 77 first
q = x[77] + 0.05 * rng.standard_normal(DIM).astype(np.float32)
r2 = tbl.search((q.tolist(), "golden retriever"), query_type="hybrid").limit(5).to_list()
print("hybrid:", [(r["id"], round(r.get("_relevance_score", 0), 4)) for r in r2], flush=True)
assert r2[0]["id"] == 77

# 3. hybrid with a reranker override
from lancedb_tpu.rerankers import LinearCombinationReranker
r3 = (tbl.search((q.tolist(), "golden retriever"), query_type="hybrid")
      .rerank(LinearCombinationReranker(weight=0.5)).limit(5).to_list())
print("hybrid linear:", [r["id"] for r in r3], flush=True)
assert r3[0]["id"] == 77
print("hybrid TPU e2e OK", flush=True)
