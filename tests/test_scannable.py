"""Scannable source-normalization tests (reference scannable.py:
{schema, num_rows, reader factory, rescannable} for every input)."""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from lancedb_tpu.scannable import Scannable, to_scannable


def _tbl(n=10):
    return pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})


class TestConverters:
    def test_table_rescannable(self):
        s = to_scannable(_tbl(7))
        assert s.rescannable and s.num_rows == 7
        assert s.reader().read_all().num_rows == 7
        assert s.reader().read_all().num_rows == 7  # again: rescannable

    def test_batch(self):
        s = to_scannable(_tbl(3).to_batches()[0])
        assert s.num_rows == 3 and s.rescannable

    def test_reader_one_shot(self):
        t = _tbl(5)
        s = to_scannable(pa.RecordBatchReader.from_batches(t.schema, t.to_batches()))
        assert not s.rescannable and s.num_rows is None
        assert s.reader().read_all().num_rows == 5
        with pytest.raises(ValueError, match="once"):
            s.reader()

    def test_list_and_dict(self):
        assert to_scannable([{"a": 1}, {"a": 2}]).num_rows == 2
        assert to_scannable({"a": [1, 2, 3]}).num_rows == 3

    def test_pyarrow_dataset(self, tmp_path):
        pads.write_dataset(_tbl(20), str(tmp_path / "ds"), format="parquet")
        ds = pads.dataset(str(tmp_path / "ds"))
        s = to_scannable(ds)
        assert s.rescannable and s.num_rows == 20
        assert s.reader().read_all().num_rows == 20
        assert s.reader().read_all().num_rows == 20

    def test_scanner_one_shot(self, tmp_path):
        pads.write_dataset(_tbl(20), str(tmp_path / "ds"), format="parquet")
        sc = pads.dataset(str(tmp_path / "ds")).scanner(columns=["id"])
        s = to_scannable(sc)
        assert not s.rescannable
        assert s.reader().read_all().num_rows == 20

    def test_iterator_of_batches(self):
        t = _tbl(9)
        s = to_scannable(iter(t.to_batches(max_chunksize=3)))
        assert not s.rescannable
        assert s.reader().read_all().num_rows == 9

    def test_iterator_of_rows(self):
        s = to_scannable(iter([{"a": 1}, {"a": 2}]))
        assert s.num_rows == 2  # row iterators materialize

    def test_polars(self):
        pl = pytest.importorskip("polars")
        s = to_scannable(pl.DataFrame({"a": [1, 2]}))
        assert s.rescannable and s.num_rows == 2


class TestDatasetIngest:
    def test_add_pyarrow_dataset_streams(self, mem_db, tmp_path):
        """table.add(pa.dataset(...)) streams parquet into fragments."""
        n = 5000
        src = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(np.random.default_rng(0).standard_normal(n * 4).astype(np.float32)), 4
            ),
        })
        pads.write_dataset(src, str(tmp_path / "parquet"), format="parquet")
        t = mem_db.create_table("t", schema=src.schema)
        t.add(pads.dataset(str(tmp_path / "parquet")))
        assert t.count_rows() == n
        # one commit for the whole stream
        assert len(t.list_versions()) == 2
