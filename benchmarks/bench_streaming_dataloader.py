#!/usr/bin/env python3
"""Benchmark for StreamingDataset throughput.

Parity harness of the reference's streaming dataloader benchmark
(reference python/benchmarks/bench_streaming_dataloader.py:1-48):
sweeps ``read_batch_size`` to show how amortising per-request overhead
scales; rows carry a binary payload so bytes/s is meaningful.

Run from the repo root:
    python benchmarks/bench_streaming_dataloader.py

Optional env vars (same knobs as the reference):
    BENCH_NUM_ROWS   — total rows (default 49152 = 24 x 2048)
    BENCH_NUM_SPLITS — number of splits (default 24)
    BENCH_STEPS      — samples to time per chunk size (default 4096)
    BENCH_ROW_BYTES  — payload bytes per row (default 4096)
"""

import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lancedb_tpu
from lancedb_tpu.data import StreamingDataset, permutation_builder

NUM_ROWS = int(os.environ.get("BENCH_NUM_ROWS", 24 * 2048))
NUM_SPLITS = int(os.environ.get("BENCH_NUM_SPLITS", 24))
STEPS = int(os.environ.get("BENCH_STEPS", 4096))
ROW_BYTES = int(os.environ.get("BENCH_ROW_BYTES", 4096))


def main() -> None:
    rng = np.random.default_rng(0)
    payload = [rng.bytes(ROW_BYTES) for _ in range(64)]
    tbl = pa.table(
        {
            "id": pa.array(np.arange(NUM_ROWS, dtype=np.int64)),
            "data": pa.array([payload[i % 64] for i in range(NUM_ROWS)], pa.binary()),
        }
    )
    with tempfile.TemporaryDirectory() as root:
        db = lancedb_tpu.connect(root)
        t = db.create_table("bench", tbl)
        perm = permutation_builder(t).split_random(seed=42).shuffle(seed=42).execute()

        print(f"rows={NUM_ROWS} splits={NUM_SPLITS} row_bytes={ROW_BYTES}")
        print(f"{'read_batch_size':>16} {'rows/s':>12} {'MiB/s':>10}")
        for rbs in (1, 4, 16, 64, 256, 1024, 4096, 16384):
            ds = StreamingDataset(
                perm,
                num_splits=NUM_SPLITS,
                read_batch_size=rbs,
            )
            it = iter(ds)
            for _ in range(min(256, STEPS // 4)):  # warm the pipeline
                next(it)
            t0 = time.perf_counter()
            n = 0
            for _ in range(STEPS):
                next(it)
                n += 1
            dt = time.perf_counter() - t0
            rows_s = n / dt
            print(f"{rbs:>16} {rows_s:>12.0f} {rows_s * ROW_BYTES / 2**20:>10.1f}")


if __name__ == "__main__":
    main()
