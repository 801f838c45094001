"""Capacity proof: ≥30M x 128 IVF_PQ build + search on ONE chip.

Replaces the 65M-rows/chip extrapolation with a measured point
(VERDICT r3 weak #8): build seconds, search qps, raw/refined recall,
and HBM in use after the index is resident. Writes SCALE_PROOF.json at
the repo root; bench.py embeds it into bench_details.json with
provenance.
"""
import gc
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
D = 128
NPART = 4096
NSUB = 16
NPROBES = 20
NQ = 32
TOP_K = 10

rng = np.random.default_rng(0)
nc = 10_000
cents = (rng.standard_normal((nc, D)) * 2.0).astype(np.float32)

t0 = time.time()
x = np.empty((N, D), dtype=np.float32)
CH = 1_000_000
for s in range(0, N, CH):
    e = min(s + CH, N)
    a = rng.integers(0, nc, e - s)
    x[s:e] = cents[a] + rng.standard_normal((e - s, D)).astype(np.float32)
print(f"datagen {time.time()-t0:.0f}s ({x.nbytes/2**30:.1f} GiB)", flush=True)

qi = rng.integers(0, N, NQ)
q = x[qi] + 0.05 * rng.standard_normal((NQ, D)).astype(np.float32)

import pyarrow as pa

from lancedb_tpu.index import IvfPq
from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

t0 = time.time()
tbl = pa.table({
    "id": pa.array(np.arange(N, dtype=np.int64)),
    "vector": pa.FixedSizeListArray.from_arrays(
        pa.array(x.reshape(-1), type=pa.float32()), D
    ),
})
ds = Dataset.create(MemoryStore(), "scale30m.lance", tbl.schema, tbl)
del tbl
gc.collect()
print(f"dataset {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
meta = build_vector_index(
    ds, "vector",
    IvfPq(num_partitions=NPART, num_sub_vectors=NSUB, num_bits=8,
          distance_type="l2"),
)
build_s = time.time() - t0
print(f"build {build_s:.0f}s", flush=True)

# exact ground truth on host (blocked; offline cost, not serving)
t0 = time.time()
gt = np.zeros((NQ, TOP_K), dtype=np.int64)
best_d = np.full((NQ, TOP_K), np.inf, dtype=np.float32)
qn2 = (q * q).sum(1)[:, None]
for s in range(0, N, CH):
    e = min(s + CH, N)
    blk = x[s:e]
    d = qn2 - 2.0 * (q @ blk.T) + (blk * blk).sum(1)[None, :]
    cand = np.argpartition(d, TOP_K, axis=1)[:, :TOP_K]
    cd = np.take_along_axis(d, cand, axis=1)
    alld = np.concatenate([best_d, cd], axis=1)
    alli = np.concatenate([gt, cand + s], axis=1)
    pick = np.argpartition(alld, TOP_K, axis=1)[:, :TOP_K]
    best_d = np.take_along_axis(alld, pick, axis=1)
    gt = np.take_along_axis(alli, pick, axis=1)
print(f"gt {time.time()-t0:.0f}s", flush=True)
gt_sets = [set(r.tolist()) for r in gt]

sp = load_searcher(ds, meta)


def recall_of(rid):
    ids = (rid & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return float(np.mean(
        [len(set(ids[i, :TOP_K].tolist()) & gt_sets[i]) / TOP_K for i in range(NQ)]
    ))


out = {"n": N, "d": D, "npart": NPART, "nsub": NSUB, "nbits": 8,
       "build_seconds": round(build_s, 1), "nprobes": NPROBES,
       "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

# refine path: allow the f16 refine table (N*128*2 bytes) on device so
# search(refine_factor=10) returns genuinely refined top-10 in one
# dispatch chain; fall back to the explicit host refine if it doesn't fit
import os

os.environ.setdefault(
    "LANCEDB_TPU_DEVICE_REFINE_BUDGET", str(int(N * D * 2 + 2**30))
)
t0 = time.time()
fused = sp.prepare_device_refine(ds, "vector")
print(f"device refine table prepared={fused} ({time.time()-t0:.0f}s)", flush=True)
out["refine_mode"] = "fused_device_f16" if fused else "host"

for rf, tag in ((None, "raw"), (10, "refine10")):
    params = SearchParams(k=TOP_K, nprobes=NPROBES, refine_factor=rf)
    d0, r0 = sp.search(q, params)  # warm + compile
    if rf and not fused:
        d0, r0 = sp.refine(ds, "vector", q, d0, r0, TOP_K)
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        d0, r0 = sp.search(q, params)
        if rf and not fused:
            d0, r0 = sp.refine(ds, "vector", q, d0, r0, TOP_K)
    dt = (time.time() - t0) / reps
    out[f"qps_{tag}"] = round(NQ / dt, 1)
    out[f"recall_{tag}"] = round(recall_of(r0), 4)
    print(f"{tag}: {NQ/dt:.0f} qps recall@10={out[f'recall_{tag}']}", flush=True)

try:
    import jax

    ms = jax.local_devices()[0].memory_stats() or {}
    out["hbm_in_use_gib"] = round(ms.get("bytes_in_use", 0) / 2**30, 2)
    out["hbm_limit_gib"] = round(ms.get("bytes_limit", 0) / 2**30, 2)
except Exception as e:  # memory_stats may be unsupported on the tunnel
    out["hbm_note"] = f"memory_stats unavailable: {type(e).__name__}"

with open("/root/repo/SCALE_PROOF.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
