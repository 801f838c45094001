"""Dataset-view `Permutation` tests (reference python permutation.py:414-1124
`Permutation` + `Transforms`, tests in python/tests/test_permutation.py):
the torch map-style / huggingface-shaped lazy view over a base table and
an optional permutation split, with builder-style column ops, formats,
skip/take/repeat, and DataLoader-worker pickling."""

import pickle

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.data import Permutation, Permutations, permutation_builder
from lancedb_tpu.errors import InvalidInputError


def _base(db, n=50, name="pv"):
    return db.create_table(name, {
        "id": np.arange(n, dtype=np.int64),
        "val": np.arange(n, dtype=np.float32) * 0.5,
        "cat": np.arange(n) % 3,
    }, mode="overwrite")


class TestIdentityView:
    def test_shape_schema_len(self, mem_db):
        t = _base(mem_db)
        p = Permutation.identity(t)
        assert len(p) == 50
        assert p.num_rows == 50
        assert p.num_columns == 3
        assert p.shape == (50, 3)
        assert p.column_names == ["id", "val", "cat"]
        assert p.schema.field("val").type == pa.float32()

    def test_getitem_and_getitems(self, mem_db):
        t = _base(mem_db)
        p = Permutation.identity(t)
        row = p[7]
        assert row == [{"id": 7, "val": 3.5, "cat": 1}]
        rows = p.__getitems__([3, 1, 4])
        assert [r["id"] for r in rows] == [3, 1, 4]

    def test_iter_formats(self, mem_db):
        t = _base(mem_db, n=10)
        p = Permutation.identity(t).with_batch_size(4)
        # default python format skips the ragged last batch on __iter__
        batches = list(p)
        assert len(batches) == 2 and all(len(b) == 4 for b in batches)
        # explicit iter keeps it
        batches = list(p.iter(4))
        assert [len(b) for b in batches] == [4, 4, 2]

        cols = next(iter(p.with_format("python_col").iter(4)))
        assert cols["id"] == [0, 1, 2, 3]
        npb = next(iter(p.with_format("numpy").iter(4)))
        assert isinstance(npb["val"], np.ndarray)
        ab = next(iter(p.with_format("arrow").iter(4)))
        assert isinstance(ab, pa.RecordBatch) and ab.num_rows == 4
        pdb = next(iter(p.with_format("pandas").iter(4)))
        assert list(pdb["id"]) == [0, 1, 2, 3]
        with pytest.raises(InvalidInputError):
            p.with_format("csv")

    def test_custom_transform(self, mem_db):
        t = _base(mem_db, n=6)
        p = Permutation.identity(t).with_transform(
            lambda b: int(pa.compute.sum(b.column(0)).as_py())
        )
        assert p.take_offsets([0, 1, 2]) == 3

    def test_out_of_range(self, mem_db):
        t = _base(mem_db, n=5)
        p = Permutation.identity(t)
        with pytest.raises(InvalidInputError):
            p[5]


class TestColumnOps:
    def test_select_remove_rename(self, mem_db):
        t = _base(mem_db)
        p = Permutation.identity(t)
        sel = p.select_columns(["val", "id"])
        assert sel.column_names == ["val", "id"]
        rem = p.remove_columns(["cat", "missing-is-ignored"])
        assert rem.column_names == ["id", "val"]
        with pytest.raises(InvalidInputError):
            p.remove_columns(["id", "val", "cat"])
        ren = p.rename_columns({"id": "pk", "val": "score"})
        assert ren.column_names == ["pk", "score", "cat"]
        assert ren[2] == [{"pk": 2, "score": 1.0, "cat": 2}]
        with pytest.raises(InvalidInputError):
            p.rename_column("nope", "x")
        with pytest.raises(InvalidInputError):
            p.rename_column("id", "val")
        # the original view is untouched by builders
        assert p.column_names == ["id", "val", "cat"]

    def test_select_rowid(self, mem_db):
        t = _base(mem_db, n=8)
        p = Permutation.identity(t).select_columns(["id", "_rowid"])
        rows = p.__getitems__([0, 3])
        assert [r["id"] for r in rows] == [0, 3]
        assert all(isinstance(r["_rowid"], int) for r in rows)

    def test_flatten_struct(self, mem_db):
        pts = pa.array([{"x": i, "y": -i} for i in range(6)])
        tbl = pa.table({"id": pa.array(range(6), pa.int64()), "point": pts})
        t = mem_db.create_table("pvs", tbl, mode="overwrite")
        p = Permutation.identity(t).flatten()
        assert p.column_names == ["id", "point.x", "point.y"]
        assert p.schema.field("point.x").type == pa.int64()
        assert p[2] == [{"id": 2, "point.x": 2, "point.y": -2}]
        # flatten then select a child
        child = p.select_columns(["point.y"])
        assert child[1] == [{"point.y": -1}]

    def test_unique(self, mem_db):
        t = _base(mem_db, n=30)
        p = Permutation.identity(t)
        assert sorted(p.unique("cat")) == [0, 1, 2]
        with pytest.raises(InvalidInputError):
            p.unique("nope")


class TestWindowing:
    def test_skip_take_repeat(self, mem_db):
        t = _base(mem_db, n=20)
        p = Permutation.identity(t)
        w = p.with_skip(5).with_take(10)
        assert len(w) == 10
        assert [r["id"] for r in w.__getitems__([0, 9])] == [5, 14]
        r3 = w.with_repeat(3)
        assert len(r3) == 30
        assert r3[10] == r3[0] and r3[29] == r3[9]
        # aliases
        assert len(p.skip(18).take(5)) == 2
        with pytest.raises(InvalidInputError):
            p.with_repeat(0)

    def test_skip_past_end(self, mem_db):
        t = _base(mem_db, n=4)
        p = Permutation.identity(t).with_skip(10)
        assert len(p) == 0
        assert list(p.iter(2)) == []


class TestSplitViews:
    def test_from_tables_named_split(self, mem_db):
        t = _base(mem_db, n=40)
        perm = permutation_builder(t).split_random(
            seed=3, fractions=[0.75, 0.25], split_names=["train", "val"],
        ).execute()
        train = Permutation.from_tables(t, perm.perm_table, "train")
        val = Permutation.from_tables(t, perm.perm_table, "val")
        assert len(train) == 30 and len(val) == 10
        train_ids = {r["id"] for b in train.with_batch_size(7).iter(7) for r in b}
        val_ids = {r["id"] for b in val.iter(4) for r in b}
        assert train_ids | val_ids == set(range(40))
        assert not (train_ids & val_ids)
        with pytest.raises(InvalidInputError):
            Permutation.from_tables(t, perm.perm_table, "test")
        with pytest.raises(InvalidInputError):
            Permutation.from_tables(t, None, 1)

    def test_permutations_accessors(self, mem_db):
        t = _base(mem_db, n=40)
        perm = permutation_builder(t).split_random(
            seed=3, fractions=[0.5, 0.5], split_names=["a", "b"],
        ).execute()
        ps = Permutations.from_tables(t, perm.perm_table)
        va = ps.get_by_name("a")
        vb = ps.get_by_index(1)
        assert isinstance(va, Permutation) and isinstance(vb, Permutation)
        assert len(va) == 20 and len(vb) == 20
        with pytest.raises(InvalidInputError):
            ps.get_by_name("zzz")
        with pytest.raises(InvalidInputError):
            ps.get_by_index(5)

    def test_shuffled_split_order_is_permutation(self, mem_db):
        t = _base(mem_db, n=25)
        perm = permutation_builder(t).split_random(seed=1).shuffle(seed=9).execute()
        p = Permutation.from_tables(t, perm.perm_table, 0)
        ids = [r["id"] for b in p.iter(25) for r in b]
        assert ids != sorted(ids)
        assert sorted(ids) == list(range(25))


class TestPickling:
    def test_memory_table_roundtrip(self, mem_db):
        t = _base(mem_db, n=12)
        perm = permutation_builder(t).split_random(seed=2).execute()
        p = (Permutation.from_tables(t, perm.perm_table, 0)
             .select_columns(["id"]).with_skip(2).with_batch_size(5))
        q = pickle.loads(pickle.dumps(p))
        assert len(q) == len(p) == 10
        assert q.__getitems__([0, 1]) == p.__getitems__([0, 1])
        assert q.column_names == ["id"]

    def test_local_table_roundtrip(self, tmp_db):
        t = _base(tmp_db, n=9, name="pvl")
        p = Permutation.identity(t).rename_column("val", "score")
        q = pickle.loads(pickle.dumps(p))
        assert q[4] == [{"id": 4, "score": 2.0, "cat": 1}]

    def test_connection_factory(self, tmp_db):
        import functools

        t = _base(tmp_db, n=6, name="pvf")
        factory = functools.partial(_open_table, tmp_db.uri)
        p = Permutation.identity(t).with_connection_factory(factory)
        q = pickle.loads(pickle.dumps(p))
        assert q[5] == p[5]


def _open_table(uri, name):
    import lancedb_tpu

    return lancedb_tpu.connect(uri).open_table(name)


class TestTorchIntegration:
    def test_torch_formats(self, mem_db):
        torch = pytest.importorskip("torch")
        t = _base(mem_db, n=8)
        p = Permutation.identity(t)
        rows = p.with_format("torch").take_offsets([0, 1])
        assert isinstance(rows, list) and rows[0]["id"].item() == 0
        trows = p.with_format("torch_row").take_offsets([2, 3])
        assert torch.as_tensor(trows[0]).shape == (3,)
        tcol = p.with_format("torch_col").take_offsets([0, 1, 2])
        assert tuple(tcol.shape) == (3, 3)

    def test_dataloader_map_style(self, mem_db):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        t = _base(mem_db, n=32)
        p = Permutation.identity(t).remove_columns(["cat"]).with_format("torch")
        dl = DataLoader(p, batch_size=8, shuffle=True)
        seen = []
        for batch in dl:
            assert set(batch.keys()) == {"id", "val"}
            assert batch["id"].shape == (8,)
            seen.extend(batch["id"].tolist())
        assert sorted(seen) == list(range(32))


class TestStreamingSurface:
    """StreamingDataset additions (reference streaming.py:448-581):
    stage gauges, consumed/unscanned counters, worker pickling, and
    streaming straight from a dataset-view Permutation or bare table."""

    def test_gauges_and_counters(self, mem_db):
        from lancedb_tpu.data import StreamingDataset, permutation_builder

        t = _base(mem_db, n=64, name="sds1")
        perm = permutation_builder(t).split_random(seed=5).execute()
        sds = StreamingDataset(perm, num_splits=4, read_batch_size=8)
        assert sds.consumed_rows == 0
        assert sds.raw_queue_depth == 0 and sds.prefetch_queue_depth == 0
        it = iter(sds)
        got = [next(it) for _ in range(10)]
        assert len(got) == 10
        assert sds.consumed_rows == 10
        assert sds.unscanned_rows <= 64 - 10
        assert sds.prefetch_queue_depth >= 0
        rest = list(it)
        assert sds.consumed_rows == 64 and len(got) + len(rest) == 64
        assert sds.transform_time >= 0.0
        assert sds.unscanned_rows == 0  # iteration done, live state cleared

    def test_stream_from_view_and_table(self, mem_db):
        from lancedb_tpu.data import Permutation, StreamingDataset

        t = _base(mem_db, n=24, name="sds2")
        view = Permutation.identity(t)
        sds = StreamingDataset(view, num_splits=2, read_batch_size=5)
        ids = sorted(r["id"] for r in sds)
        assert ids == list(range(24))
        # bare table works too
        sds2 = StreamingDataset(t, num_splits=3)
        assert len(list(sds2)) == 24

    def test_pickle_roundtrip_resumes(self, mem_db):
        from lancedb_tpu.data import StreamingDataset, permutation_builder

        t = _base(mem_db, n=30, name="sds3")
        perm = permutation_builder(t).split_random(seed=7).execute()
        sds = StreamingDataset(perm, num_splits=3, read_batch_size=4)
        first = [r["id"] for r in sds]
        clone = pickle.loads(pickle.dumps(
            StreamingDataset(perm, num_splits=3, read_batch_size=4)))
        assert [r["id"] for r in clone] == first

    def test_pickle_with_connection_factory(self, tmp_db):
        import functools

        from lancedb_tpu.data import StreamingDataset, permutation_builder

        t = _base(tmp_db, n=12, name="sds4")
        perm = permutation_builder(t).split_random(seed=2).execute()
        factory = functools.partial(_open_table, tmp_db.uri)
        sds = StreamingDataset(perm, num_splits=2,
                               connection_factory=factory)
        clone = pickle.loads(pickle.dumps(sds))
        assert sorted(r["id"] for r in clone) == list(range(12))
