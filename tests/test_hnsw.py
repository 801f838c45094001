"""HNSW index family tests (reference IvfHnsw* builders, m=20
ef_construction=300 defaults — index/vector.rs:402-415)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.index import HnswFlat, HnswPq, HnswSq
from lancedb_tpu.index.hnsw import build_hnsw_index, HnswSearcher
from lancedb_tpu.index.vector import SearchParams, load_searcher
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

N, DIM = 1200, 24
RNG = np.random.default_rng(17)
VECS = RNG.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def dataset():
    store = MemoryStore()
    tbl = pa.table(
        {
            "id": pa.array(np.arange(N, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(pa.array(VECS.ravel()), DIM),
        }
    )
    return Dataset.create(store, "t.lance", tbl.schema, tbl)


QUERIES = RNG.standard_normal((8, DIM)).astype(np.float32)


def exact_topk(k):
    d = ((QUERIES[:, None, :] - VECS[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


def recall(rowids, truth, dataset, k):
    hits = 0
    for qi in range(rowids.shape[0]):
        valid = rowids[qi][rowids[qi] != np.uint64(np.iinfo(np.uint64).max)]
        ids = set(dataset.take_rows(valid, columns=["id"]).column("id").to_pylist())
        hits += len(ids & set(truth[qi].tolist())) / k
    return hits / rowids.shape[0]


class TestHnsw:
    def test_flat_recall(self, dataset):
        meta = build_hnsw_index(dataset, "vector", HnswFlat(m=12, ef_construction=80))
        s = load_searcher(dataset, meta)
        assert isinstance(s, HnswSearcher)
        d, rids = s.search(QUERIES, SearchParams(k=10, ef=120))
        r = recall(rids, exact_topk(10), dataset, 10)
        assert r > 0.85, r
        assert (np.diff(d, axis=1) >= -1e-5).all()

    def test_sq_recall(self, dataset):
        meta = build_hnsw_index(dataset, "vector", HnswSq(m=12, ef_construction=80))
        s = load_searcher(dataset, meta)
        d, rids = s.search(QUERIES, SearchParams(k=10, ef=120))
        assert recall(rids, exact_topk(10), dataset, 10) > 0.8

    def test_pq_with_refine(self, dataset):
        meta = build_hnsw_index(
            dataset, "vector", HnswPq(m=12, ef_construction=80, num_sub_vectors=6)
        )
        s = load_searcher(dataset, meta)
        d, rids = s.search(QUERIES, SearchParams(k=10, ef=200, refine_factor=5))
        d2, rids2 = s.refine(dataset, "vector", QUERIES, d, rids, 10)
        assert recall(rids2, exact_topk(10), dataset, 10) > 0.5

    def test_ef_improves_recall(self, dataset):
        meta = build_hnsw_index(dataset, "vector", HnswFlat(m=8, ef_construction=40))
        s = load_searcher(dataset, meta)
        truth = exact_topk(10)
        r_small = recall(s.search(QUERIES, SearchParams(k=10, ef=12))[1], truth, dataset, 10)
        r_big = recall(s.search(QUERIES, SearchParams(k=10, ef=300))[1], truth, dataset, 10)
        assert r_big >= r_small

    def test_prefilter_penalty(self, dataset):
        meta = build_hnsw_index(dataset, "vector", HnswFlat(m=12, ef_construction=80))
        s = load_searcher(dataset, meta)
        allowed_tbl = dataset.to_table(columns=["id"], predicate="id < 200", with_row_id=True)
        allowed = np.sort(allowed_tbl.column("_rowid").to_numpy().astype(np.uint64))
        pen = s.slot_penalty(allowed, None)
        d, rids = s.search(QUERIES, SearchParams(k=5, ef=200), slot_penalty=pen)
        for qi in range(len(QUERIES)):
            valid = rids[qi][rids[qi] != np.uint64(np.iinfo(np.uint64).max)]
            ids = dataset.take_rows(valid, columns=["id"]).column("id").to_pylist()
            assert all(i < 200 for i in ids)

    def test_via_table_api(self, mem_db):
        import lancedb_tpu  # noqa: F401
        from conftest import make_vector_table

        t = mem_db.create_table("t", make_vector_table(400, dim=16, seed=2))
        t.create_index(index_type="IVF_HNSW_FLAT", metric="l2")
        idx = t.list_indices()
        assert idx[0]["index_type"] == "IVF_HNSW_FLAT"
        from lancedb_tpu.arrow import fsl_to_numpy

        data = make_vector_table(400, dim=16, seed=2)
        q = fsl_to_numpy(data.column("vector"))[11]
        res = t.search(q).limit(1).to_arrow()
        assert res.column("id")[0].as_py() == 11

    def test_cosine(self, dataset):
        meta = build_hnsw_index(
            dataset, "vector", HnswFlat(distance_type="cosine", m=12, ef_construction=80)
        )
        s = load_searcher(dataset, meta)
        d, rids = s.search(QUERIES, SearchParams(k=5, ef=100))
        assert (d >= -1e-5).all() and (d <= 2.0 + 1e-5).all()


class TestKnnGraphPrimitive:
    """The batched-build core: exact kNN ids vs brute force."""

    def test_knn_graph_exact_l2(self):
        from lancedb_tpu.index.hnsw import _knn_graph

        rng = np.random.default_rng(5)
        v = rng.standard_normal((500, 16)).astype(np.float32)
        ids = _knn_graph(v, 8, "l2")
        d = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        truth = np.argsort(d, axis=1)[:, :8]
        # distance sets must match exactly (ties may permute ids)
        got = np.sort(np.take_along_axis(d, ids, axis=1), axis=1)
        want = np.sort(np.take_along_axis(d, truth, axis=1), axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        assert (ids != np.arange(500)[:, None]).all()  # self excluded

    def test_knn_graph_dot(self):
        from lancedb_tpu.index.hnsw import _knn_graph

        rng = np.random.default_rng(6)
        v = rng.standard_normal((300, 8)).astype(np.float32)
        ids = _knn_graph(v, 4, "dot")
        d = -(v @ v.T)
        np.fill_diagonal(d, np.inf)
        truth = np.argsort(d, axis=1)[:, :4]
        got = np.sort(np.take_along_axis(d, ids, axis=1), axis=1)
        want = np.sort(np.take_along_axis(d, truth, axis=1), axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestDeviceBeamSearch:
    """Batched device serving (CAGRA-style beam over layer 0) must match
    the host walk's contract: same metric values, penalty filtering,
    recall comparable at equal ef."""

    @pytest.fixture(scope="class")
    def flat_searcher(self, dataset):
        meta = build_hnsw_index(dataset, "vector", HnswFlat(m=12, ef_construction=80))
        return load_searcher(dataset, meta)

    def test_batched_recall_and_order(self, flat_searcher):
        q32 = np.repeat(QUERIES, 4, axis=0)  # 32 queries -> device route
        d, rids = flat_searcher.search(q32, SearchParams(k=10, ef=128))
        assert d.shape == (32, 10)
        assert (np.diff(d, axis=1) >= -1e-5).all()
        truth = exact_topk(10)
        ids = (rids & np.uint64(0xFFFFFFFF)).astype(np.int64)
        rec = np.mean(
            [len(set(ids[i].tolist()) & set(truth[i // 4].tolist())) / 10
             for i in range(32)]
        )
        assert rec > 0.85, rec

    def test_batched_matches_host_values(self, flat_searcher):
        """Distances from the device path are exact f32 (final rescore)."""
        q32 = np.repeat(QUERIES, 4, axis=0)
        d_dev, r_dev = flat_searcher.search_batched(q32, SearchParams(k=5, ef=200))
        d_host, r_host = flat_searcher._search_host(QUERIES, SearchParams(k=5, ef=200))
        # same query -> same top-1 (exact distances, high ef)
        np.testing.assert_allclose(d_dev[::4][:, 0], d_host[:, 0], rtol=1e-4)

    def test_batched_penalty(self, flat_searcher, dataset):
        allowed_tbl = dataset.to_table(columns=["id"], predicate="id < 300",
                                       with_row_id=True)
        allowed = np.sort(allowed_tbl.column("_rowid").to_numpy().astype(np.uint64))
        pen = flat_searcher.slot_penalty(allowed, None)
        q32 = np.repeat(QUERIES, 4, axis=0)
        d, rids = flat_searcher.search_batched(q32, SearchParams(k=5, ef=64),
                                               slot_penalty=pen)
        sentinel = np.uint64(np.iinfo(np.uint64).max)
        for qi in range(32):
            valid = rids[qi][rids[qi] != sentinel]
            ids = dataset.take_rows(valid, columns=["id"]).column("id").to_pylist()
            assert all(i < 300 for i in ids)

    def test_batched_sq_storage(self, dataset):
        meta = build_hnsw_index(dataset, "vector", HnswSq(m=12, ef_construction=80))
        s = load_searcher(dataset, meta)
        q32 = np.repeat(QUERIES, 4, axis=0)
        d, rids = s.search_batched(q32, SearchParams(k=10, ef=128))
        truth = exact_topk(10)
        ids = (rids & np.uint64(0xFFFFFFFF)).astype(np.int64)
        rec = np.mean(
            [len(set(ids[i].tolist()) & set(truth[i // 4].tolist())) / 10
             for i in range(32)]
        )
        assert rec > 0.75, rec

    def test_build_timings_recorded(self, flat_searcher):
        t = flat_searcher.params["build_timings"]
        assert "knn_l0" in t and "adjacency_l0" in t
