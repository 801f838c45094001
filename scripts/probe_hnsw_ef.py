"""HNSW recall-vs-ef sweep at 100k on clustered data (diagnosing the
500k recall@10=0.61 at default ef=64 from the r3 bench)."""

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")
from bench import host_gt, make_clustered  # noqa: E402

from lancedb_tpu.index import HnswFlat  # noqa: E402
from lancedb_tpu.index.hnsw import build_hnsw_index  # noqa: E402
from lancedb_tpu.index.vector import SearchParams, load_searcher  # noqa: E402
from lancedb_tpu.io.object_store import MemoryStore  # noqa: E402
from lancedb_tpu.storage.dataset import Dataset  # noqa: E402


def main():
    rng = np.random.default_rng(3)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = 128
    x, q = make_clustered(rng, n, d, n_queries=64)
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), d),
    })
    ds = Dataset.create(MemoryStore(), "h.lance", tbl.schema, tbl)
    t0 = time.time()
    meta = build_hnsw_index(ds, "vector", HnswFlat())
    print("build", round(time.time() - t0, 1), flush=True)
    s = load_searcher(ds, meta)
    gt = host_gt(x, q, k=10)
    for ef in (64, 128, 256, 512):
        t0 = time.time()
        _, rid = s.search(q, SearchParams(k=10, ef=ef))
        dt = time.time() - t0
        ids = (rid & np.uint64(0xFFFFFFFF)).astype(np.int64)
        rec = np.mean([len(set(ids[i].tolist()) & gt[i]) / 10 for i in range(64)])
        print(f"ef={ef}: recall={rec:.4f} {64 / dt:.0f} qps(batch)", flush=True)


if __name__ == "__main__":
    main()
