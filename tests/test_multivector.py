"""Multivector (ColBERT-style maxsim) search tests (reference colpali
embedder + multivector handling, table/query.rs:168-218)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.index.multivector import is_multivector_type, maxsim_rescore

DIM = 8
RNG = np.random.default_rng(3)


def make_doc(base: np.ndarray, n_tokens: int, noise: float = 0.05):
    toks = base[None, :] + noise * RNG.standard_normal((n_tokens, DIM)).astype(np.float32)
    return [t.tolist() for t in toks.astype(np.float32)]


@pytest.fixture
def mv_table(mem_db):
    # 3 clusters of documents around distinct directions
    bases = np.eye(DIM, dtype=np.float32)[:3] * 5
    rows = []
    for i in range(30):
        base = bases[i % 3]
        rows.append({"id": i, "cluster": i % 3, "vector": make_doc(base, 3 + i % 4)})
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("cluster", pa.int64()),
            ("vector", pa.list_(pa.list_(pa.float32(), DIM))),
        ]
    )
    return mem_db.create_table("mv", rows, schema=schema)


class TestMultivector:
    def test_type_detection(self, mv_table):
        assert is_multivector_type(mv_table.schema.field("vector").type)

    def test_maxsim_math(self):
        q = np.eye(2, dtype=np.float32)  # two orthogonal unit tokens
        doc_exact = [np.eye(2, dtype=np.float32)]  # contains both
        doc_half = [np.array([[1.0, 0.0]], dtype=np.float32)]  # only one
        s = maxsim_rescore(q, doc_exact + doc_half)
        assert s[0] == pytest.approx(2.0, abs=1e-2)
        assert s[1] == pytest.approx(1.0, abs=1e-2)

    def test_brute_force_search(self, mv_table):
        q = np.full((2, DIM), 0.0, np.float32)
        q[:, 1] = 5.0  # cluster-1 direction
        res = mv_table.search(q.tolist()).limit(5).to_arrow()
        assert res.num_rows == 5
        assert all(c == 1 for c in res.column("cluster").to_pylist())
        d = res.column("_distance").to_pylist()
        assert d == sorted(d)

    def test_with_token_index(self, mv_table):
        mv_table.create_index(vector_column_name="vector")
        idx = mv_table.list_indices()
        assert len(idx) == 1
        q = np.zeros((2, DIM), np.float32)
        q[:, 2] = 1.0
        res = mv_table.search(q.tolist()).limit(4).to_arrow()
        assert all(c == 2 for c in res.column("cluster").to_pylist())

    def test_prefilter(self, mv_table):
        q = np.zeros((1, DIM), np.float32)
        q[:, 0] = 1.0
        res = mv_table.search(q.tolist()).where("id >= 9").limit(5).to_arrow()
        ids = res.column("id").to_pylist()
        assert all(i >= 9 for i in ids)
        assert all(c == 0 for c in res.column("cluster").to_pylist())

    def test_single_token_query(self, mv_table):
        q = np.zeros(DIM, np.float32)
        q[0] = 1.0
        res = mv_table.search([q.tolist()]).limit(3).to_arrow()
        assert res.num_rows == 3


class TestMultivectorInference:
    def test_nested_python_lists_become_multivector(self, mem_db):
        """list<list<float>> input with constant inner length is
        promoted to list<fixed_size_list> so late-interaction search
        works on tables created from plain python data."""
        t = mem_db.create_table("mvinf", {"id": [1, 2], "emb": [
            [[1.0, 0.0], [0.5, 0.5]], [[0.0, 1.0]],
        ]}, mode="overwrite")
        ftype = t.schema.field("emb").type
        assert pa.types.is_fixed_size_list(ftype.value_type)
        r = t.search([[0.0, 1.0]], vector_column_name="emb").limit(1).to_list()
        assert r[0]["id"] == 2

    def test_ragged_inner_lengths_stay_plain_lists(self, mem_db):
        t = mem_db.create_table("mvrag", {"id": [1], "emb": [
            [[1.0, 0.0], [0.5]],
        ]}, mode="overwrite")
        assert not pa.types.is_fixed_size_list(t.schema.field("emb").type.value_type)
