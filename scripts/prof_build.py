import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"

N, DIM, NPART, NSUB = 1_000_000, 128, 1024, 32
rng = np.random.default_rng(0)
x = rng.standard_normal((N, DIM)).astype(np.float32)

from lancedb_tpu.ops.kmeans import kmeans_fit, kmeans_assign
from lancedb_tpu.ops.pq import pq_train, pq_encode, pq_reconstruct
from lancedb_tpu.index.vector import _balanced_layout, _scatter_padded

def t(label, f):
    t0 = time.perf_counter(); r = f(); dt = time.perf_counter() - t0
    print(f"{label:28s} {dt:7.1f}s", flush=True); return r

cents = t("kmeans_fit (262k sample)", lambda: kmeans_fit(x, NPART, max_iters=50, sample_rate=256, seed=0))
assign = t("kmeans_assign 1M", lambda: kmeans_assign(x, cents))
residuals = t("residuals (host)", lambda: x - cents[assign])
cb = t("pq_train 4bit", lambda: pq_train(residuals, NSUB, num_bits=4, max_iters=50, sample_rate=256, seed=0))
codes = t("pq_encode 1M", lambda: pq_encode(residuals, cb))
recon = t("pq_reconstruct 1M", lambda: pq_reconstruct(codes, cb))
rnorms = t("rnorms (host)", lambda: np.sum((recon + cents[assign]).astype(np.float64) ** 2, axis=1).astype(np.float32))
order, bc, counts, pmax = t("_balanced_layout", lambda: _balanced_layout(assign, cents, 128))
cp = t("scatter codes", lambda: _scatter_padded(codes, order, counts, pmax))
t("transpose codes", lambda: np.ascontiguousarray(cp.transpose(0, 2, 1)))
t("scatter rnorms", lambda: _scatter_padded(rnorms, order, counts, pmax, fill=np.float32(3e38)))
