"""Two-process (DCN-tier) mesh dryrun — VERDICT r2 #5.

Validates the multi-HOST story the single-process virtual mesh cannot:
`jax.distributed` coordination across 2 real OS processes × 4 CPU
devices each (8 global), with

  * distributed k-means (rows sharded across processes via
    `make_array_from_process_local_data`, psum reductions over the
    global mesh),
  * sharded flat search (per-shard top-k + all_gather merge) matching a
    single-host numpy reference,
  * per-worker analyze metrics where each WORKER IS A REAL PROCESS —
    every process reports its own scan rows/time, process 0 renders the
    reference-style per_worker display (reference query.rs:671-693:
    Cloud workers each report operator metrics).

Run: python scripts/dryrun_two_process.py           (spawns 2 children)
     python scripts/dryrun_two_process.py --child N (internal)
"""

import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(process_id: int) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=os.environ["DRYRUN_COORD"],
        num_processes=2,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from lancedb_tpu.parallel import (
        QUERY_AXIS,
        SHARD_AXIS,
        make_distributed_kmeans_step,
        make_mesh,
        make_sharded_flat_search,
    )

    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    assert jax.process_count() == 2
    pid = jax.process_index()
    mesh = make_mesh(8)  # (query=1, shard=8) over the GLOBAL device list
    rng = np.random.default_rng(0)  # same seed both processes: shared refs
    dim, k_clusters, n_rows = 16, 8, 512

    # --- distributed k-means: rows sharded across processes -------------
    x = rng.standard_normal((n_rows, dim)).astype(np.float32)
    row_shard = NamedSharding(mesh, P((QUERY_AXIS, SHARD_AXIS), None))
    local_rows = x[pid * (n_rows // 2): (pid + 1) * (n_rows // 2)]
    xj = jax.make_array_from_process_local_data(row_shard, local_rows, x.shape)
    step = make_distributed_kmeans_step(mesh, k=k_clusters)
    cents = jax.device_put(x[:k_clusters].copy(), NamedSharding(mesh, P()))
    for _ in range(2):
        cents, counts = step(xj, cents)
    counts_np = np.asarray(counts)  # replicated output: addressable everywhere
    assert counts_np.sum() == n_rows, counts_np

    # --- sharded flat search: shards live on BOTH processes -------------
    t0 = time.perf_counter()
    q = rng.standard_normal((4, dim)).astype(np.float32)
    norms2 = np.sum(x.astype(np.float64) ** 2, axis=1).astype(np.float32)
    slot_ids = np.arange(n_rows, dtype=np.int32)
    vec_shard = NamedSharding(mesh, P(SHARD_AXIS, None))
    n_loc = n_rows // 2
    xj2 = jax.make_array_from_process_local_data(
        vec_shard, x[pid * n_loc: (pid + 1) * n_loc], x.shape
    )
    n2j = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(SHARD_AXIS)), norms2[pid * n_loc: (pid + 1) * n_loc],
        norms2.shape,
    )
    idj = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(SHARD_AXIS)), slot_ids[pid * n_loc: (pid + 1) * n_loc],
        slot_ids.shape,
    )
    flat = make_sharded_flat_search(mesh, k=5)
    qj = jax.device_put(q, NamedSharding(mesh, P(QUERY_AXIS, None)))
    vals, ids = flat(qj, xj2, n2j, idj)
    vals_np, ids_np = np.asarray(vals), np.asarray(ids)
    scan_s = time.perf_counter() - t0
    # reference: exact numpy on the full matrix (both processes hold it)
    d_ref = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    for i in range(len(q)):
        expect = set(np.argsort(d_ref[i])[:5].tolist())
        assert set(ids_np[i].tolist()) == expect, (i, ids_np[i], sorted(expect))

    # --- per-worker analyze metrics from REAL processes -----------------
    # each process reports its own operator metrics; process_allgather
    # assembles the per-worker table (reference query.rs:671-693)
    my_metrics = np.array([float(pid), float(n_loc), scan_s * 1e3], np.float32)
    all_metrics = multihost_utils.process_allgather(my_metrics)
    assert all_metrics.shape == (2, 3)
    workers = sorted(int(r[0]) for r in all_metrics)
    assert workers == [0, 1], workers
    if pid == 0:
        sections = []
        for r in np.asarray(all_metrics):
            sections.append(
                f"--- worker {int(r[0])} ---\n"
                f"ShardedScanExec: rows={int(r[1])}, "
                f"metrics=[elapsed_compute={r[2]:.2f}ms]"
            )
        print("\n".join(sections), flush=True)
        print(f"TWO_PROCESS_DRYRUN OK workers={len(all_metrics)} "
              f"rows={int(all_metrics[:, 1].sum())}", flush=True)


def main() -> None:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU"))
        and k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "DRYRUN_COORD": f"127.0.0.1:{port}",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        if p.returncode != 0:
            ok = False
            print(f"--- process {i} FAILED rc={p.returncode}\n{out[-4000:]}")
    if not ok:
        raise SystemExit(1)
    marker = [o for o in outs if "TWO_PROCESS_DRYRUN OK workers=2" in o]
    if not marker:
        print("\n".join(o[-2000:] for o in outs))
        raise SystemExit("missing success marker")
    # surface the per-worker analyze display
    head = marker[0]
    print(head[head.index("--- worker 0 ---"):].rstrip())


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
