"""Profile HNSW build stages on the real chip (125k default)."""
import json, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
n = int(sys.argv[1]) if len(sys.argv) > 1 else 125_000
d = 128
rng = np.random.default_rng(0)
# clustered like bench datagen
nc = 1000
cents = rng.standard_normal((nc, d)).astype(np.float32) * 2
assign = rng.integers(0, nc, n)
x = cents[assign] + rng.standard_normal((n, d)).astype(np.float32)

from lancedb_tpu.index.hnsw import _build_layers
t0 = time.time()
timings = {}
layers, entry, levels = _build_layers(x, 20, "l2", timings=timings)
total = time.time() - t0
print(json.dumps({"n": n, "total_s": round(total, 1), "timings": timings}))
