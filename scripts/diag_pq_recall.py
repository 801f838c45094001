"""Diagnose IVF_PQ recall: isolate partition-selection vs PQ-quantization
vs device-scan contributions. Run on TPU: python scripts/diag_pq_recall.py"""

import numpy as np
import jax
import jax.numpy as jnp

N, DIM, NC, NPART, NQ, K = 200_000, 128, 1024, 256, 64, 10
NPROBE = 20

rng = np.random.default_rng(42)
centers = rng.standard_normal((NC, DIM)).astype(np.float32)
assign_c = rng.integers(0, NC, N)
x = centers[assign_c] + 0.35 * rng.standard_normal((N, DIM)).astype(np.float32)
qa = rng.integers(0, NC, NQ)
q = centers[qa] + 0.35 * rng.standard_normal((NQ, DIM)).astype(np.float32)

# ground truth (f64)
d_ref = ((q[:, None, :].astype(np.float64) - x[None, :, :].astype(np.float64)) ** 2).sum(-1) if False else None
xn2 = np.einsum("nd,nd->n", x.astype(np.float64), x.astype(np.float64))
d_ref = xn2[None, :] - 2.0 * (q.astype(np.float64) @ x.T.astype(np.float64))
gt = np.argsort(d_ref, axis=1)[:, :K]
gt_sets = [set(r.tolist()) for r in gt]

def recall(ids):
    return float(np.mean([len(set(ids[i].tolist()[:K]) & gt_sets[i]) / K for i in range(NQ)]))

from lancedb_tpu.ops.kmeans import kmeans_fit, kmeans_assign
from lancedb_tpu.ops.pq import pq_train, pq_encode, pq_reconstruct

print("training ivf ...")
cents = kmeans_fit(x, NPART, metric="l2", max_iters=50, sample_rate=256, seed=0)
part = kmeans_assign(x, cents)

# 1. partition-selection recall ceiling: is each true NN's partition probed?
qc = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
probe = np.argsort(qc, axis=1)[:, :NPROBE]
cover = []
for i in range(NQ):
    probed = set(probe[i].tolist())
    cover.append(np.mean([part[j] in probed for j in gt[i]]))
print(f"partition coverage of true top-{K} @ nprobes={NPROBE}: {np.mean(cover):.4f}")

# 2. PQ quantization quality (exact numpy ADC on reconstructions, f64)
print("training pq ...")
res = x - cents[part]
cb = pq_train(res, 16, num_bits=8, max_iters=50, sample_rate=256, seed=0)
codes = pq_encode(res, cb)
recon = pq_reconstruct(codes, cb) + cents[part]
err = np.mean(((recon - x) ** 2).sum(-1)) / np.mean((x ** 2).sum(-1))
print(f"relative reconstruction MSE: {err:.4f}")

d_pq = np.einsum("nd,nd->n", recon.astype(np.float64), recon.astype(np.float64))[None, :] \
    - 2.0 * (q.astype(np.float64) @ recon.T.astype(np.float64))
# restrict to probed partitions
mask = np.zeros((NQ, N), bool)
for i in range(NQ):
    mask[i] = np.isin(part, probe[i])
d_pq_m = np.where(mask, d_pq, np.inf)
ids10 = np.argsort(d_pq_m, axis=1)[:, :K]
ids100 = np.argsort(d_pq_m, axis=1)[:, :100]
print(f"numpy exact-ADC recall@10 (probed): {recall(ids10):.4f}")
r100 = float(np.mean([len(set(ids100[i].tolist()) & gt_sets[i]) / K for i in range(NQ)]))
print(f"numpy exact-ADC truth-in-top-100 (refine ceiling): {r100:.4f}")

# 2b. same but bf16-rounded LUT dot contributions (emulating device dlut path)
recon_b = np.asarray(jnp.asarray(recon).astype(jnp.bfloat16).astype(jnp.float32))
q_b = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32))
d_pq_bf = np.einsum("nd,nd->n", recon, recon)[None, :] - 2.0 * (q_b @ recon_b.T)
d_pq_bf = np.where(mask, d_pq_bf, np.inf)
ids_bf = np.argsort(d_pq_bf, axis=1)[:, :K]
print(f"bf16-dot ADC recall@10 (probed): {recall(ids_bf):.4f}")

# 3. the actual device scan through the index machinery
import pyarrow as pa
from lancedb_tpu.index import IvfPq, IvfFlat
from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

tbl = pa.table({
    "id": pa.array(np.arange(N, dtype=np.int64)),
    "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), DIM),
})
ds = Dataset.create(MemoryStore(), "diag.lance", tbl.schema, tbl)
meta = build_vector_index(ds, "vector", IvfPq(num_partitions=NPART, num_sub_vectors=16))
s = load_searcher(ds, meta)
d, rid = s.search(q, SearchParams(k=K, nprobes=NPROBE))
ids_dev = (rid & np.uint64(0xFFFFFFFF)).astype(np.int64)
print(f"device IVF_PQ scan recall@10: {recall(ids_dev):.4f}")
d2, rid2 = s.search(q, SearchParams(k=K, nprobes=NPROBE, refine_factor=10))
d2, rid2 = s.refine(ds, "vector", q, d2, rid2, K)
ids_ref = (rid2 & np.uint64(0xFFFFFFFF)).astype(np.int64)
print(f"device IVF_PQ + refine10 recall@10: {recall(ids_ref):.4f}")

# 4. IVF_FLAT bf16 ceiling
meta_f = build_vector_index(ds, "vector", IvfFlat(num_partitions=NPART))
sf = load_searcher(ds, meta_f)
d3, rid3 = sf.search(q, SearchParams(k=K, nprobes=NPROBE))
ids_f = (rid3 & np.uint64(0xFFFFFFFF)).astype(np.int64)
print(f"device IVF_FLAT recall@10 (bf16 store): {recall(ids_f):.4f}")
# coverage-limited exact scan (f64 restricted to probed): IVF_FLAT ceiling
d_cov = np.where(mask, d_ref, np.inf)
ids_cov = np.argsort(d_cov, axis=1)[:, :K]
print(f"exact-restricted-to-probed recall@10 (IVF ceiling): {recall(ids_cov):.4f}")

# 5. 4-bit PQ (32 subvectors, same 16B/row budget) through the searcher
meta4 = build_vector_index(ds, "vector", IvfPq(num_partitions=NPART, num_sub_vectors=32, num_bits=4))
s4 = load_searcher(ds, meta4)
d, rid = s4.search(q, SearchParams(k=K, nprobes=NPROBE))
ids4 = (rid & np.uint64(0xFFFFFFFF)).astype(np.int64)
print(f"device IVF_PQ 4bit x32sub recall@10: {recall(ids4):.4f}")
d5, rid5 = s4.search(q, SearchParams(k=K, nprobes=NPROBE, refine_factor=10))
d5, rid5 = s4.refine(ds, "vector", q, d5, rid5, K)
ids5 = (rid5 & np.uint64(0xFFFFFFFF)).astype(np.int64)
print(f"device IVF_PQ 4bit + refine10 recall@10: {recall(ids5):.4f}")
