"""Build 500k HNSW once, then sweep beam-kernel shapes + host seeding."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import pyarrow as pa

from lancedb_tpu.index import HnswFlat
from lancedb_tpu.index.hnsw import _hnsw_beam_device, _hnsw_seed_device, build_hnsw_index
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
print(f"build {time.time()-t0:.0f}s", flush=True)
s = load_searcher(ds, meta)

rng2 = np.random.default_rng(17)
qs = x[rng2.integers(0, n, 1024)] + 0.05 * rng2.standard_normal((1024, d)).astype(np.float32)
qs = qs.astype(np.float32)
t0 = time.time()
d_all = (qs[:64] * qs[:64]).sum(1)[:, None] - 2.0 * (qs[:64] @ x.T) + (x * x).sum(1)[None, :]
gt = np.argsort(d_all, axis=1)[:, :10]
gt_sets = [set(r.tolist()) for r in gt]
print(f"gt {time.time()-t0:.0f}s", flush=True)


def recall64(ids_fn):
    rec = np.mean([len(set(ids_fn(i)) & gt_sets[i]) / 10 for i in range(64)])
    return rec


# host two-stage seeding
for i in range(4):
    s._search_host(qs[i], SearchParams(k=10, ef=64))
for ef in (64, 128):
    t0 = time.time()
    ids_h = []
    for i in range(64):
        _, r = s._search_host(qs[i], SearchParams(k=10, ef=ef))
        ids_h.append((r[0] & np.uint64(0xFFFFFFFF)).astype(np.int64).tolist())
    dt = time.time() - t0
    print(f"host ef={ef}: {64/dt:.0f} qps recall={recall64(lambda i: set(ids_h[i])):.4f}",
          flush=True)

# direct kernel sweep
dev = s._prepare_device()
for B in (256, 1024):
    qd = jnp.asarray(qs[:B])
    seeds = _hnsw_seed_device(qd, dev["up_bf"], dev["up_norms2"], dev["up_nodes"],
                              16, "l2")
    pen = dev["norms2"][:1]
    for E, e_exp in ((64, 4), (64, 8), (64, 16), (128, 8)):
        iters = max(E // e_exp, 4)
        seed_ids = jnp.concatenate(
            [seeds, jnp.full((B, E - 16), -1, jnp.int32)], axis=1)
        args = dict(k=10, e_expand=e_exp, iters=iters, metric="l2",
                    has_mask=False, kind="FLAT")
        dd, ii = _hnsw_beam_device(qd, seed_ids, dev["adj"], dev["vA"], dev["vB"],
                                   dev["vC"], dev["norms2"], pen, **args)
        jax.block_until_ready(dd)
        t0 = time.time()
        reps = 6
        for _ in range(reps):
            dd, ii = _hnsw_beam_device(qd, seed_ids, dev["adj"], dev["vA"],
                                       dev["vB"], dev["vC"], dev["norms2"], pen,
                                       **args)
        jax.block_until_ready(dd)
        dt = (time.time() - t0) / reps
        ids = np.asarray(ii)
        rec = recall64(lambda i: set(ids[i].tolist()))
        print(f"B={B} E={E} e={e_exp} it={iters}: {B/dt:.0f} qps "
              f"recall={rec:.4f} ({dt*1000:.1f} ms)", flush=True)
