"""Integration parity tests: torch DataLoader over StreamingDataset
(reference test_torch.py) and the README quickstart as an executable
doc test (reference runs docs snippets under tests/docs/)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.data import StreamingDataset, permutation_builder


@pytest.fixture
def vec_table(mem_db):
    n = 96
    rng = np.random.default_rng(0)
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(
            pa.array(rng.standard_normal(n * 8).astype(np.float32)), 8),
    })
    return mem_db.create_table("ints", tbl)


class TestTorchDataLoader:
    """StreamingDataset is a real torch IterableDataset (reference
    test_torch.py): DataLoader drives it, multi-worker splits are
    disjoint and complete."""

    def test_dataloader_basic(self, vec_table):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        perm = permutation_builder(vec_table).shuffle(seed=1).execute()
        ds = StreamingDataset(perm, num_splits=8)
        dl = DataLoader(ds, batch_size=16, collate_fn=lambda rows: rows)
        ids = [r["id"] for batch in dl for r in batch]
        assert sorted(ids) == list(range(96))

    def test_dataloader_two_workers(self, vec_table):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        perm = permutation_builder(vec_table).execute()
        ds = StreamingDataset(perm, num_splits=8)
        dl = DataLoader(
            ds, batch_size=8, num_workers=2, collate_fn=lambda rows: rows,
        )
        ids = [r["id"] for batch in dl for r in batch]
        # workers own disjoint split subsets; together they cover all rows
        assert sorted(ids) == list(range(96))

    def test_tensor_collation(self, vec_table):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        perm = permutation_builder(vec_table).execute()
        ds = StreamingDataset(perm, num_splits=8, columns=["vector"])
        def collate(rows):
            return torch.tensor(np.stack([r["vector"] for r in rows]).astype(np.float32))
        dl = DataLoader(ds, batch_size=12, collate_fn=collate)
        b = next(iter(dl))
        assert b.shape == (12, 8) and b.dtype == torch.float32


class TestReadmeQuickstart:
    """The README quickstart, executed verbatim in spirit."""

    def test_quickstart(self, tmp_path):
        import numpy as np

        import lancedb_tpu as ldb

        db = ldb.connect(str(tmp_path))
        tbl = db.create_table("items", [
            {"id": 1, "text": "golden retriever", "vector": np.random.rand(32).tolist()},
            {"id": 2, "text": "tabby cat", "vector": np.random.rand(32).tolist()},
        ])
        q = np.random.rand(32)
        out = tbl.search(q).limit(5).where("id > 0").to_arrow()
        assert out.num_rows == 2 and "_distance" in out.column_names

        tbl.create_index(index_type="IVF_PQ", metric="l2", num_partitions=2,
                         num_sub_vectors=4)
        res = tbl.search(q).nprobes(2).refine_factor(4).to_pandas()
        assert len(res) == 2

        tbl.create_fts_index("text")
        hits = tbl.search("golden dog", query_type="fts").limit(5).to_list()
        assert hits[0]["id"] == 1
        fused = tbl.search((q, "golden dog"), query_type="hybrid").limit(5).to_arrow()
        assert fused.num_rows >= 1

        # SQL surface from the README table
        sql = db.sql("SELECT COUNT(*) AS n FROM items WHERE id > 0").to_pylist()
        assert sql[0]["n"] == 2
