"""Standalone re-run of bench.py's FTS/hybrid section (config #5) after
query-path changes — updates only the fts_*/hybrid_* keys."""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

assert jax.default_backend() == "tpu", jax.default_backend()

import bench

rng = np.random.default_rng(11)
details = json.load(open("bench_details.json"))
bench.run_fts_hybrid_config(details, rng)
json.dump(details, open("bench_details.json", "w"), indent=2)
print(json.dumps({k: v for k, v in details.items()
                  if k.startswith(("fts", "hybrid"))}))
