"""A/B the bucketed runtime-nprobes scan against the static programs on
real hardware (VERDICT r3 #2 follow-up): 1M x 128 IVF_FLAT + IVF_PQ,
in-jit loop timing per bench.py's protocol."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_clustered  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import pyarrow as pa

    from lancedb_tpu.index import IvfFlat, IvfPq
    from lancedb_tpu.index.vector import (
        _ivf_flat_search_device,
        _ivf_flat_search_device_rt,
        _ivf_pq_search_device,
        _ivf_pq_search_device_rt,
        _np_max_bucket,
        _pallas_available,
        build_vector_index,
        load_searcher,
    )
    from lancedb_tpu.io.object_store import MemoryStore
    from lancedb_tpu.storage.dataset import Dataset

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(42)
    n, dim = 1_000_000, 128
    x, q = make_clustered(rng, n, dim, n_queries=256)
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), dim),
    })
    ds = Dataset.create(MemoryStore(), "probe.lance", tbl.schema, tbl)
    dev = jax.devices()[0]
    qd = jax.device_put(jnp.asarray(q[:128]), dev)
    zero = jax.device_put(jnp.zeros((1,), jnp.float32), dev)

    def timed(fn, label, iters=32):
        @jax.jit
        def run(qq):
            def body(c, i):
                v = fn(qq + c * 1e-20)
                return c + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0)) * 1e-9, None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return out

        t0 = time.perf_counter()
        np.asarray(run(qd))
        comp = time.perf_counter() - t0
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            np.asarray(run(qd * (1 + 1e-6 * (r + 1))))
            ts.append(time.perf_counter() - t0)
        per = (float(np.median(ts)) - 0.03) / iters
        print(f"{label}: compile={comp:.1f}s {per * 1e3:.3f} ms/batch "
              f"{128 / per:.0f} qps", flush=True)

    t0 = time.perf_counter()
    meta = build_vector_index(ds, "vector", IvfFlat(num_partitions=1024))
    print(f"IVF_FLAT build {time.perf_counter() - t0:.0f}s", flush=True)
    s = load_searcher(ds, meta)
    fd = s._device
    blocks, logical = s.nparts, s.params["num_logical_partitions"]
    for np_user in (8, 20, 64):
        npb = max(1, int(np.ceil(np_user * blocks / logical)))
        nm = _np_max_bucket(npb, blocks)
        timed(lambda qq, npb=npb, nm=nm: _ivf_flat_search_device_rt(
            qq, fd["centroids"], fd["vectors"], fd["norms2"], zero,
            jnp.asarray(npb, jnp.int32), k=10, np_max=nm, metric="l2",
            has_mask=False, use_pallas=_pallas_available())[0],
            f"RT  np={np_user} (npb={npb} bucket={nm})")
        timed(lambda qq, npb=npb: _ivf_flat_search_device(
            qq, fd["centroids"], fd["vectors"], fd["norms2"], zero,
            k=10, nprobes=npb, metric="l2", has_mask=False,
            use_pallas=_pallas_available())[0],
            f"STA np={np_user} (npb={npb})")

    t0 = time.perf_counter()
    meta = build_vector_index(
        ds, "vector", IvfPq(num_partitions=1024, num_sub_vectors=32, num_bits=4))
    print(f"IVF_PQ build {time.perf_counter() - t0:.0f}s", flush=True)
    sp = load_searcher(ds, meta)
    pd = sp._device
    blocks, logical = sp.nparts, sp.params["num_logical_partitions"]
    npb = max(1, int(np.ceil(20 * blocks / logical)))
    nm = _np_max_bucket(npb, blocks)
    timed(lambda qq: _ivf_pq_search_device_rt(
        qq, pd["centroids"], pd["codes"], pd["rnorms"], pd["codebooks"], zero,
        jnp.asarray(npb, jnp.int32), k=10, np_max=nm, metric="l2",
        has_mask=False, use_pallas=_pallas_available())[0],
        f"RT  pq np=20 (npb={npb} bucket={nm})")
    timed(lambda qq: _ivf_pq_search_device(
        qq, pd["centroids"], pd["codes"], pd["rnorms"], pd["codebooks"], zero,
        k=10, nprobes=npb, metric="l2", has_mask=False,
        use_pallas=_pallas_available())[0],
        f"STA pq np=20 (npb={npb})")


if __name__ == "__main__":
    main()
