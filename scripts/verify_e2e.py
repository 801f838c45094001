"""End-to-end verification of the Pallas IVF_PQ path through the PUBLIC API
on real TPU hardware."""
import sys, tempfile, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

import lancedb_tpu
from lancedb_tpu.index import IvfPq

rng = np.random.default_rng(7)
N, DIM = 50_000, 64
centers = rng.standard_normal((256, DIM)).astype(np.float32)
cluster = rng.integers(0, 256, N)
x = centers[cluster] + 0.2 * rng.standard_normal((N, DIM)).astype(np.float32)

db = lancedb_tpu.connect(tempfile.mkdtemp())
tbl = db.create_table("vecs", data=[
    {"id": i, "cat": int(i % 3), "vector": x[i].tolist()} for i in range(N)
])

# 1. default 8-bit IVF_PQ
tbl.create_index(vector_column_name="vector", config=IvfPq(num_partitions=64))
q = x[123] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
res = tbl.search(q).limit(10).nprobes(10).to_list()
print("1. top-10 ids:", [r["id"] for r in res], "dists:", [round(r["_distance"], 3) for r in res], flush=True)
# raw 8-bit ADC distances on this tightly clustered data collapse into
# a ~68-way exact tie (σ=0.2 residuals vs 16-dim/256-code cells): rank
# WITHIN the tie is arbitrary, so the semantic assertions are (a) every
# raw hit comes from the query row's cluster, and (b) the refine step
# below restores exact rank-1.
assert all(cluster[r["id"]] == cluster[123] for r in res), \
    "raw PQ hits should come from the source row's cluster"

# 2. refine path
res2 = tbl.search(q).limit(5).nprobes(10).refine_factor(8).to_list()
print("2. refine top-5 ids:", [r["id"] for r in res2], flush=True)
assert res2[0]["id"] == 123

# 3. prefilter (has_mask path through pallas: penalty folded into rnorms)
res3 = tbl.search(q).where("cat = 1").limit(5).nprobes(10).to_list()
print("3. filtered top-5:", [(r["id"], r["cat"]) for r in res3], flush=True)
assert all(r["cat"] == 1 for r in res3)
assert all(r["id"] % 3 == 1 for r in res3)

# 4. 4-bit PQ through public config
tbl.create_index(vector_column_name="vector", config=IvfPq(num_partitions=64, num_sub_vectors=16, num_bits=4), replace=True)
res4 = tbl.search(q).limit(5).nprobes(10).to_list()
print("4. 4-bit top-5 ids:", [r["id"] for r in res4], flush=True)
assert res4[0]["id"] == 123

# 5. cosine metric PQ (normalization + l2/2 reporting path)
tbl.create_index(vector_column_name="vector", config=IvfPq(num_partitions=64, distance_type="cosine"), replace=True)
res5 = tbl.search(q).limit(5).nprobes(10).refine_factor(20).to_list()
print("5. cosine+refine top-5 ids:", [r["id"] for r in res5], "d:", [round(r["_distance"], 4) for r in res5], flush=True)
assert res5[0]["id"] == 123 and 0 <= res5[0]["_distance"] < 0.01

# 6. dot metric PQ (the qn2=0 + halving kernel path)
tbl.create_index(vector_column_name="vector", config=IvfPq(num_partitions=64, distance_type="dot"), replace=True)
res6 = tbl.search(q).limit(5).nprobes(10).to_list()
print("6. dot top-5 ids:", [r["id"] for r in res6], "d:", [round(r["_distance"], 2) for r in res6], flush=True)
# dot distance = -q.x; best should be large-norm rows near q; check monotone order
d6 = [r["_distance"] for r in res6]
assert d6 == sorted(d6)

# 7. probe: invalid num_bits through public config
try:
    tbl.create_index(vector_column_name="vector", config=IvfPq(num_partitions=64, num_bits=5), replace=True)
    raise SystemExit("7. ERROR: num_bits=5 accepted!")
except (ValueError, Exception) as e:
    assert isinstance(e, ValueError), f"expected ValueError, got {type(e).__name__}: {e}"
    print("7. num_bits=5 rejected:", type(e).__name__, str(e)[:60], flush=True)

# 8. probe: nprobes > num_partitions (clamp path)
res8 = tbl.search(q).limit(3).nprobes(10_000).to_list()
print("8. nprobes=10000 ok, top id:", res8[0]["id"], flush=True)

# 9. probe: delete rows then search (deletion mask through pallas)
tbl.create_index(vector_column_name="vector", config=IvfPq(num_partitions=64), replace=True)
tbl.delete("id = 123")
res9 = tbl.search(q).limit(5).nprobes(10).to_list()
print("9. after delete, top-5:", [r["id"] for r in res9], flush=True)
assert 123 not in [r["id"] for r in res9]
print("ALL E2E CHECKS PASSED", flush=True)

# 10. FLAT index default mode = device two-pass (exact results)
tbl.create_index(vector_column_name="vector", index_type="FLAT", replace=True)
res10 = tbl.search(q).limit(5).to_list()
print("10. FLAT 2-pass top-5:", [r["id"] for r in res10], flush=True)
assert 123 not in [r["id"] for r in res10]  # deleted earlier
d10 = [r["_distance"] for r in res10]
assert d10 == sorted(d10)

# 11. OPQ-rotated IVF_PQ through public config
from lancedb_tpu.index import IvfPq as _IvfPq
tbl.create_index(vector_column_name="vector",
                 config=_IvfPq(num_partitions=64, opq=True, opq_iters=3), replace=True)
res11 = tbl.search(q).limit(5).nprobes(10).refine_factor(8).to_list()
print("11. OPQ top-5:", [r["id"] for r in res11], flush=True)
assert all(r["id"] != 123 for r in res11)
print("EXTENDED CHECKS PASSED", flush=True)

# 12. IVF_HNSW_FLAT: batched device beam (>=16 queries routes to device)
from lancedb_tpu.index import HnswFlat
tbl.create_index(vector_column_name="vector", config=HnswFlat(m=12), replace=True)
qs = np.stack([x[i] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
               for i in range(200, 232)])
t0 = time.time()
res12 = [tbl.search(qs[i]).limit(3).to_list() for i in range(4)]  # host walks
host_ms = (time.time() - t0) / 4 * 1000
ok_host = sum(r[0]["id"] == 200 + i for i, r in enumerate(res12))
print(f"12. HNSW host walks: {ok_host}/4 rank-1, {host_ms:.1f} ms/q", flush=True)
assert ok_host >= 3
from lancedb_tpu.index.vector import SearchParams, load_searcher
from lancedb_tpu.index.hnsw import HnswSearcher
ds12 = tbl._dataset
meta12 = [m for m in ds12.manifest.indices if m.index_type == "IVF_HNSW_FLAT"][0]
s12 = load_searcher(ds12, meta12)
assert isinstance(s12, HnswSearcher)
d12, r12 = s12.search(qs, SearchParams(k=3, ef=64))  # 32 queries -> device beam
ids12 = (r12[:, 0] & np.uint64(0xFFFFFFFF)).astype(np.int64)
got = int((ids12 == np.arange(200, 232)).sum())
print(f"12b. HNSW device beam rank-1: {got}/32", flush=True)
assert got >= 30
# prefiltered batched search through the public API
res12c = tbl.search(qs[0]).where("cat = 1").limit(5).to_list()
assert all(r["cat"] == 1 for r in res12c)
print("12c. HNSW prefilter ok:", [r["id"] for r in res12c[:3]], flush=True)

# 13. FTS with the jieba dictionary tokenizer through the public API
td = db.create_table("docs", data=[
    {"id": 0, "text": "机器学习模型训练"},
    {"id": 1, "text": "深度神经网络"},
    {"id": 2, "text": "machine learning models"},
])
td.create_fts_index("text", base_tokenizer="jieba", stem=False)
r13 = td.search("机器学习", query_type="fts").limit(2).to_list()
assert r13[0]["id"] == 0
print("13. jieba FTS ok:", [r["id"] for r in r13], flush=True)

# 14. f16 storage + f16 query end-to-end
import pyarrow as pa
xf = x[:500].astype(np.float16)
tf16 = db.create_table("f16", pa.table({
    "id": pa.array(np.arange(500)),
    "vector": pa.FixedSizeListArray.from_arrays(
        pa.array(xf.ravel(), pa.float16()), DIM),
}))
r14 = tf16.search(xf[77]).limit(1).to_list()
assert r14[0]["id"] == 77
print("14. f16 round-trip ok", flush=True)
print("ROUND-4 CHECKS PASSED", flush=True)
