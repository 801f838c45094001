"""DuckDB interop over the pyarrow dataset protocol.

Reference parity: python/python/tests/test_duckdb.py — duckdb's Arrow
replacement scan discovers `adapter` from the local namespace and
drives it through the pyarrow dataset protocol (schema → scanner(
columns, filter) → to_batches). The duckdb-engine half runs only where
duckdb is installed (importorskip, like the reference's optional
extras); the protocol half runs everywhere by invoking the EXACT call
sequence duckdb's replacement scan makes, so the surface stays pinned
even in duckdb-less environments.
"""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

import lancedb_tpu
from lancedb_tpu.integrations.pyarrow import PyarrowDatasetAdapter


@pytest.fixture
def tbl(tmp_path):
    data = pa.table({
        "x": [1, 2, 3, 4],
        "y": [5, 6, 7, 8],
        "name": ["a", "b", "c", "d"],
    })
    return lancedb_tpu.connect(str(tmp_path)).create_table("test", data)


class TestDuckdbEngine:
    """The reference test, verbatim behavior (needs duckdb installed)."""

    def test_basic_query(self, tbl):
        duckdb = pytest.importorskip("duckdb")
        adapter = PyarrowDatasetAdapter(tbl)  # noqa: F841  (replacement scan)
        duck = duckdb.connect()
        assert duck.sql("SELECT SUM(x) FROM adapter").fetchall()[0][0] == 10
        assert duck.sql("SELECT SUM(y) FROM adapter").fetchall()[0][0] == 26

    def test_filter_and_projection(self, tbl):
        duckdb = pytest.importorskip("duckdb")
        adapter = PyarrowDatasetAdapter(tbl)  # noqa: F841
        duck = duckdb.connect()
        rows = duck.sql(
            "SELECT name FROM adapter WHERE x > 2 ORDER BY name"
        ).fetchall()
        assert [r[0] for r in rows] == ["c", "d"]
        # aggregate over a projected column subset
        assert duck.sql(
            "SELECT COUNT(*) FROM adapter WHERE y >= 6"
        ).fetchall()[0][0] == 3


class TestReplacementScanProtocol:
    """duckdb's exact pyarrow-dataset call sequence, no duckdb needed:
    it checks isinstance(ds, pyarrow.dataset.Dataset), reads .schema,
    then calls .scanner(columns=[...], filter=<pads.Expression>) and
    consumes .to_batches()/to_reader()."""

    def test_is_a_pyarrow_dataset(self, tbl):
        adapter = PyarrowDatasetAdapter(tbl)
        assert isinstance(adapter, pads.Dataset)
        assert set(adapter.schema.names) >= {"x", "y", "name"}

    def test_scanner_projection_and_filter_pushdown(self, tbl):
        adapter = PyarrowDatasetAdapter(tbl)
        sc = adapter.scanner(columns=["name", "x"], filter=pads.field("x") > 2)
        out = pa.Table.from_batches(
            sc.to_batches(), schema=sc.projected_schema
        ).sort_by("x")
        assert out.column_names == ["name", "x"]
        assert out.column("name").to_pylist() == ["c", "d"]

    def test_scanner_reader_and_count(self, tbl):
        adapter = PyarrowDatasetAdapter(tbl)
        reader = adapter.scanner(filter=pads.field("y") >= 6).to_reader()
        assert reader.read_all().num_rows == 3
        assert adapter.count_rows(filter=pads.field("y") >= 6) == 3
        assert adapter.count_rows() == 4

    def test_compound_filter_expressions(self, tbl):
        adapter = PyarrowDatasetAdapter(tbl)
        expr = (pads.field("x") > 1) & (pads.field("name") != "d")
        got = adapter.to_table(columns=["x"], filter=expr)
        assert sorted(got.column("x").to_pylist()) == [2, 3]

    def test_head_and_take(self, tbl):
        adapter = PyarrowDatasetAdapter(tbl)
        assert adapter.head(2).num_rows == 2
        taken = adapter.take(np.asarray([0, 3]))
        assert taken.column("name").to_pylist() == ["a", "d"]

    def test_batches_respect_batch_size(self, tbl):
        adapter = PyarrowDatasetAdapter(tbl)
        batches = list(adapter.to_batches(batch_size=1))
        assert sum(b.num_rows for b in batches) == 4
        assert all(b.num_rows <= 1 for b in batches)
