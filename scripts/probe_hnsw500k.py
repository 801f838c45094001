"""Standalone re-run of bench.py's 500k HNSW sweep (after search-path
changes) — updates only the hnsw_* keys in bench_details.json."""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

assert jax.default_backend() == "tpu", jax.default_backend()

import bench

rng = np.random.default_rng(7)
x, _ = bench.make_clustered(rng, 1_000_000, 128)
details = json.load(open("bench_details.json"))
bench.run_hnsw_config(details, x, rng)
json.dump(details, open("bench_details.json", "w"), indent=2)
print(json.dumps({k: v for k, v in details.items() if k.startswith("hnsw")}))
