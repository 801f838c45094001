"""Recompile-free nprobes (VERDICT r3 #2).

The probe budget is a RUNTIME int32 in the compiled search program
(index/vector.py _masked_chunked_topk): sweeping nprobes must trigger
zero new compiles after one warmup, and results must match the static-
nprobes programs (reference treats min/max nprobes as runtime knobs,
rust/lancedb/src/query.rs:1215-1283).
"""

import numpy as np
import pytest

import lancedb_tpu
from lancedb_tpu.index import IvfFlat, IvfPq, IvfSq
from lancedb_tpu.index.vector import (
    SearchParams,
    _ivf_flat_search_device_rt,
    _ivf_pq_search_device_rt,
    _ivf_sq_search_device_rt,
    build_vector_index,
    load_searcher,
)
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset


@pytest.fixture(scope="module")
def built():
    import pyarrow as pa

    rng = np.random.default_rng(3)
    n, dim = 6000, 32
    x = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(pa.array(x.ravel()), dim),
    })
    ds = Dataset.create(MemoryStore(), "rt.lance", tbl.schema, tbl)
    q = x[rng.integers(0, n, 8)] + 0.05 * rng.standard_normal((8, dim)).astype(np.float32)
    return ds, x, q


@pytest.mark.parametrize("config", [
    IvfFlat(num_partitions=32),
    IvfPq(num_partitions=32, num_sub_vectors=8, num_bits=4),
    IvfSq(num_partitions=32),
])
def test_sweep_compiles_once_and_improves(built, config):
    ds, x, q = built
    meta = build_vector_index(ds, "vector", config)
    s = load_searcher(ds, meta)
    rt_fn = {
        "IVF_FLAT": _ivf_flat_search_device_rt,
        "IVF_PQ": _ivf_pq_search_device_rt,
        "IVF_SQ": _ivf_sq_search_device_rt,
    }[s.index_type]

    # exact ground truth
    d = np.sum(x * x, 1)[None, :] - 2.0 * (q @ x.T)
    gt = [set(r.tolist()) for r in np.argpartition(d, 10, 1)[:, :10]]

    recalls = {}
    s.search(q, SearchParams(k=10, nprobes=2))  # warmup compile
    within_bucket = rt_fn._cache_size()
    for nprobes in (2, 4, 8, 16):
        # all inside the 16-probe bucket: ZERO new compiles
        s.search(q, SearchParams(k=10, nprobes=nprobes))
        assert rt_fn._cache_size() == within_bucket, (
            f"nprobes={nprobes} recompiled inside its bucket"
        )
    for nprobes in (2, 4, 8, 16, 32):
        _, rid = s.search(q, SearchParams(k=10, nprobes=nprobes))
        ids = (rid & np.uint64(0xFFFFFFFF)).astype(np.int64)
        recalls[nprobes] = np.mean(
            [len(set(r.tolist()) & g) / 10 for r, g in zip(ids, gt)]
        )
    # steady state: a second identical sweep compiles nothing (the
    # program set is bounded by the handful of np_max buckets)
    steady = rt_fn._cache_size()
    for nprobes in (2, 4, 8, 16, 32):
        s.search(q, SearchParams(k=10, nprobes=nprobes))
    assert rt_fn._cache_size() == steady, (
        f"repeat sweep recompiled: {steady} -> {rt_fn._cache_size()}"
    )
    # more probes must not hurt recall (PQ gets slack: a quantized
    # imposter from a new partition can displace a true neighbor)
    vals = list(recalls.values())
    slack = 0.11 if s.index_type == "IVF_PQ" else 1e-9
    assert all(b >= a - slack for a, b in zip(vals, vals[1:])), recalls
    # raw (unrefined) 4-bit PQ on iid gaussian data bottoms out around
    # 0.28 regardless of nprobes — verified identical to the static
    # path; the refined path is covered by test_rt_public_api below
    floor = 0.2 if s.index_type == "IVF_PQ" else 0.95
    assert recalls[32] >= floor, recalls


def test_rt_matches_static_ivf_flat(built):
    ds, x, q = built
    meta = build_vector_index(ds, "vector", IvfFlat(num_partitions=16))
    s = load_searcher(ds, meta)
    from lancedb_tpu.index.vector import _ivf_flat_search_device
    import jax.numpy as jnp

    fd = s._device
    zero = jnp.zeros((1,), jnp.float32)
    for nprobes in (1, 3, 16):
        v_st, sl_st = _ivf_flat_search_device(
            jnp.asarray(q), fd["centroids"], fd["vectors"], fd["norms2"], zero,
            k=5, nprobes=nprobes, metric="l2", has_mask=False, use_pallas=False,
        )
        v_rt, sl_rt = _ivf_flat_search_device_rt(
            jnp.asarray(q), fd["centroids"], fd["vectors"], fd["norms2"], zero,
            jnp.asarray(nprobes, jnp.int32),
            k=5, np_max=16, metric="l2", has_mask=False, use_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(v_rt), np.asarray(v_st), rtol=1e-5, atol=1e-5
        )
        assert (np.asarray(sl_rt) == np.asarray(sl_st)).all()


def test_rt_public_api_filter_and_refine(tmp_path):
    """End to end through the public API: runtime-nprobes path with a
    prefilter and refine_factor still returns correct, filtered rows."""
    rng = np.random.default_rng(11)
    n, dim = 4000, 16
    x = rng.standard_normal((n, dim)).astype(np.float32)
    db = lancedb_tpu.connect(str(tmp_path))
    t = db.create_table("t", {
        "id": np.arange(n), "cat": (np.arange(n) % 4), "vector": list(x),
    })
    t.create_index(index_type="IVF_PQ", num_partitions=16, num_sub_vectors=4,
                   num_bits=4)
    res = (
        t.search(x[7]).where("cat = 3").nprobes(6).refine_factor(4)
        .limit(5).to_arrow()
    )
    assert res.num_rows == 5
    assert all(c == 3 for c in res.column("cat").to_pylist())
    # nearest cat=3 row must surface first
    d = np.sum((x - x[7]) ** 2, axis=1)
    d[np.arange(n) % 4 != 3] = np.inf
    assert res.column("id").to_pylist()[0] == int(np.argmin(d))
