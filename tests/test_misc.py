"""Expr DSL, metrics recorder, and job subsystem tests."""

import time

import numpy as np
import pytest

from lancedb_tpu.errors import JobFailureError
from lancedb_tpu.expr import col, expr_to_sql_string, lit
from lancedb_tpu.jobs import JobRegistry, JobStatus
from lancedb_tpu.metrics import MetricsRecorder, metrics_catalog, recorder, snapshot_metrics

from conftest import make_vector_table


class TestExprDsl:
    def test_comparisons_sql(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(50))
        e = (col("id") >= 10) & (col("id") < 20)
        assert t.count_rows(e.sql()) == 10
        e2 = col("label").is_in(["item-0", "item-1"]) | col("price").between(0, 1)
        assert t.count_rows(e2.sql()) > 0

    def test_arithmetic_and_functions(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(20))
        assert t.count_rows(((col("id") * 2 + 1) > 35).sql()) == 2  # ids 18,19
        assert t.count_rows(col("label").starts_with("item-0").sql()) > 0
        assert t.count_rows(col("label").upper().like("ITEM-%").sql()) == 20
        assert t.count_rows((~(col("id") < 10)).sql()) == 10

    def test_null_handling(self, mem_db):
        import pyarrow as pa

        t = mem_db.create_table("t", pa.table({"x": pa.array([1, None, 3])}))
        assert t.count_rows(col("x").is_null().sql()) == 1
        assert t.count_rows(col("x").is_not_null().sql()) == 2

    def test_lowering(self):
        s = expr_to_sql_string((col("a") + lit(1)) % 3 == 0)
        from lancedb_tpu.filters.sql import parse_sql_expr

        parse_sql_expr(s)  # round-trips through the parser


class TestMetrics:
    def test_counters_and_gauges(self):
        rec = MetricsRecorder()
        rec.increment_counter("queries", labels={"table": "t"})
        rec.increment_counter("queries", 2, labels={"table": "t"})
        rec.set_gauge("hbm_bytes", 123.0)
        snap = rec.snapshot()
        assert snap["counters"][0]["value"] == 3
        assert snap["gauges"][0]["value"] == 123.0

    def test_histogram_le_buckets(self):
        rec = MetricsRecorder()
        for v in (0.003, 0.004, 0.2, 5.0):
            rec.record_histogram("latency", v)
        h = rec.snapshot()["histograms"][0]
        assert h["count"] == 4
        assert h["le"]["0.005"] == 2
        assert h["le"]["+Inf"] == 4
        assert abs(h["sum"] - 5.207) < 1e-9

    def test_global_recorder(self):
        recorder().increment_counter("test_global")
        assert "test_global" in metrics_catalog()
        assert any(c["name"] == "test_global" for c in snapshot_metrics()["counters"])


class TestJobs:
    def test_submit_wait(self):
        reg = JobRegistry()
        job = reg.submit("demo", lambda: 40 + 2)
        assert job.wait(timeout=10) == 42
        assert job.status() == JobStatus.SUCCEEDED
        assert reg.list()[0]["status"] == "SUCCEEDED"

    def test_failure(self):
        reg = JobRegistry()

        def boom():
            raise ValueError("nope")

        job = reg.submit("demo", boom)
        with pytest.raises(JobFailureError):
            job.wait(timeout=10)
        assert job.status() == JobStatus.FAILED
        assert "nope" in reg.history()[0]["error"]

    def test_cancel_pending(self):
        reg = JobRegistry(max_workers=1)
        block = reg.submit("slow", lambda: time.sleep(0.4))
        queued = reg.submit("queued", lambda: 1)
        assert queued.cancel()
        block.wait(timeout=10)
        assert queued.status() == JobStatus.CANCELLED

    def test_create_index_async(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(600, dim=8))
        job = t.create_index_async(index_type="IVF_FLAT", num_partitions=4)
        job.wait(timeout=120)
        assert job.status() == JobStatus.SUCCEEDED
        assert t.list_indices()[0]["index_type"] == "IVF_FLAT"
        assert mem_db.list_jobs()[0]["type"] == "create_index"
        assert mem_db.get_job(job.id) is job


class TestSession:
    def test_cache_hits_and_eviction(self, mem_db):
        from lancedb_tpu.session import Session

        session = mem_db.session
        t = mem_db.create_table("t", make_vector_table(300, dim=8))
        t.create_index(index_type="IVF_FLAT", num_partitions=4)
        q = np.zeros(8, np.float32)
        t.search(q).limit(2).to_arrow()
        stats0 = session.stats()
        assert stats0["entries"] == 1 and stats0["bytes"] > 0
        # second table handle reuses the cached searcher
        t2 = mem_db.open_table("t")
        t2.search(q).limit(2).to_arrow()
        assert session.stats()["hits"] >= 1

    def test_tiny_budget_evicts(self, tmp_path):
        import lancedb_tpu
        from lancedb_tpu.session import Session

        db = lancedb_tpu.connect(str(tmp_path / "db"), session=Session(index_cache_size_bytes=1))
        a = db.create_table("a", make_vector_table(200, dim=8))
        b = db.create_table("b", make_vector_table(200, dim=8))
        a.create_index(index_type="IVF_FLAT", num_partitions=2)
        b.create_index(index_type="IVF_FLAT", num_partitions=2)
        q = np.zeros(8, np.float32)
        a.search(q).limit(1).to_arrow()
        b.search(q).limit(1).to_arrow()
        assert db.session.stats()["evictions"] >= 1

    def test_eventual_consistency_refresh(self, tmp_path):
        import time

        import lancedb_tpu

        writer = lancedb_tpu.connect(str(tmp_path / "db"))
        writer.create_table("t", make_vector_table(10))
        reader = lancedb_tpu.connect(str(tmp_path / "db"), read_consistency_interval=0.1)
        rt = reader.open_table("t")
        assert rt.count_rows() == 10
        writer.open_table("t").add(make_vector_table(5, seed=2))
        time.sleep(0.4)  # background refresher picks up the new version
        assert rt._Table__dataset.version >= 2 or rt.count_rows() == 15
        assert rt.count_rows() == 15

    def test_strong_consistency(self, tmp_path):
        import lancedb_tpu

        writer = lancedb_tpu.connect(str(tmp_path / "db"))
        writer.create_table("t", make_vector_table(10))
        reader = lancedb_tpu.connect(str(tmp_path / "db"), read_consistency_interval=0)
        rt = reader.open_table("t")
        writer.open_table("t").add(make_vector_table(5, seed=2))
        assert rt.count_rows() == 15  # interval=0 → check every read


class TestTestUtils:
    def test_local_connection(self):
        from lancedb_tpu.test_utils import new_test_connection, random_vector_table

        with new_test_connection() as conn:
            t = conn.create_table("t", random_vector_table(50, dim=8))
            assert t.count_rows() == 50

    def test_query_node_subprocess(self, tmp_path, monkeypatch):
        """env-switchable remote connection (reference
        test_utils/connection.rs:36-41): spawn a query node, parse its
        port from stdout, connect over HTTP."""
        import os
        import stat
        import sys

        from lancedb_tpu.test_utils import new_test_connection

        script = tmp_path / "spawn_node.sh"
        dbdir = tmp_path / "served"
        script.write_text(
            "#!/bin/sh\n"
            f'exec {sys.executable} -m lancedb_tpu.remote.server "{dbdir}" --port 0\n'
        )
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("CREATE_LANCEDB_TEST_CONNECTION_SCRIPT", str(script))
        tc = new_test_connection()
        try:
            tc.connection.create_table("t", [{"id": 1}])
            assert tc.connection.table_names() == ["t"]
        finally:
            tc.close()

    def test_mock_embeddings(self):
        from lancedb_tpu.test_utils import MockTextEmbeddingFunction

        fn = MockTextEmbeddingFunction(8)
        a = fn.compute_source_embeddings(["x", "y"])
        b = fn.compute_source_embeddings(["x", "y"])
        np.testing.assert_array_equal(a, b)
        assert a.shape == (2, 8)


class TestTableSurfaceParity:
    """Small reference-API parity methods added in round 2."""

    def test_uri_and_to_lance(self, tmp_db):
        from conftest import make_vector_table

        t = tmp_db.create_table("t", make_vector_table(5))
        assert t.uri.endswith("/t.lance")
        ds = t.to_lance()
        assert ds.count_rows() == 5

    def test_prewarm_data(self, mem_db):
        from conftest import make_vector_table

        t = mem_db.create_table("t", make_vector_table(10))
        t.prewarm_data()  # no error; readers cached
        assert t.count_rows() == 10

    def test_update_field_metadata(self, mem_db):
        from conftest import make_vector_table

        t = mem_db.create_table("t", make_vector_table(5))
        v0 = t.version
        t.update_field_metadata("id", {"owner": "ml-team"})
        assert t.version == v0 + 1
        assert t.schema.field("id").metadata == {b"owner": b"ml-team"}
        # data intact, metadata-only commit
        assert t.count_rows() == 5
        t.replace_field_metadata("id", {"owner": "search"})
        assert t.schema.field("id").metadata == {b"owner": b"search"}

    def test_compact_lsm_dispatches(self, mem_db):
        t = mem_db.create_table("t", [{"id": i, "v": i} for i in range(5)])
        t.set_lsm_write_spec("unsharded", key_columns=["id"])
        (t.merge_insert("id").when_matched_update_all()
          .when_not_matched_insert_all().use_lsm()
          .execute([{"id": 99, "v": 1}]))
        job = t.compact_lsm()
        job.wait(timeout=30)
        assert t.count_rows("id = 99") == 1
        assert t.get_lsm_stats()["total_wal_rows"] == 0

    def test_get_lsm_stats_none_when_disabled(self, mem_db):
        t = mem_db.create_table("t", [{"id": 1}])
        assert t.get_lsm_stats() is None


class TestConnectionQueryParity:
    def test_connection_dunders(self, mem_db):
        from conftest import make_vector_table

        mem_db.create_table("t1", make_vector_table(5))
        assert "t1" in mem_db
        assert "nope" not in mem_db
        assert len(mem_db) == 1
        assert mem_db["t1"].count_rows() == 5
        assert mem_db.list_tables() == ["t1"]
        assert mem_db.is_open()
        with mem_db as db:
            pass
        assert not mem_db.is_open()

    def test_builder_aliases_and_column(self, mem_db):
        import numpy as np

        from conftest import make_vector_table

        t = mem_db.create_table("t", make_vector_table(50))
        q = np.zeros(16, np.float32)
        b = t.search(q).limit(3)
        assert b.to_table().num_rows == 3
        assert b.to_pyarrow().num_rows == 3
        assert len(b.to_json()) == 3
        reader = t.search(q).limit(10).to_reader(max_batch_length=4)
        rows = sum(batch.num_rows for batch in reader)
        assert rows == 10
        schema = t.search(q).limit(5).output_schema()
        assert "_distance" in schema.names
        res = t.search(q).column("vector").limit(2).to_arrow()
        assert res.num_rows == 2

    def test_nearest_to_switch(self, mem_db):
        import numpy as np

        from conftest import make_vector_table

        t = mem_db.create_table("t", make_vector_table(50))
        res = t.query().where("id < 25").nearest_to(np.zeros(16, np.float32)).limit(5).to_arrow()
        assert res.num_rows == 5
        assert all(i < 25 for i in res.column("id").to_pylist())

    def test_postfilter_and_phrase(self, mem_db):
        import numpy as np

        data = [{"id": i, "text": f"the quick brown fox {i}" if i % 2 else f"lazy dog {i}",
                 "vector": [float(i)] * 4} for i in range(40)]
        t = mem_db.create_table("t", data)
        t.create_fts_index("text")
        q = np.zeros(4, np.float32)
        res = t.search(q).where("id < 10").postfilter().limit(40).to_arrow()
        assert all(i < 10 for i in res.column("id").to_pylist())
        hits = t.search("quick brown", query_type="fts").phrase_query().limit(5).to_list()
        assert all("quick brown" in h["text"] for h in hits)


class TestPyarrowIntegration:
    """pyarrow.dataset protocol adapters (reference integrations/
    pyarrow.py): projection + filter pushdown, streaming batches."""

    @pytest.fixture
    def ds_adapter(self, mem_db):
        from conftest import make_vector_table
        from lancedb_tpu.integrations import to_pyarrow_dataset

        t = mem_db.create_table("t", make_vector_table(100))
        return to_pyarrow_dataset(t)

    def test_dataset_protocol(self, ds_adapter):
        import pyarrow.dataset as pads

        assert isinstance(ds_adapter, pads.Dataset)
        assert ds_adapter.count_rows() == 100
        assert ds_adapter.count_rows(filter="id < 10") == 10
        assert set(ds_adapter.schema.names) >= {"id", "vector"}
        head = ds_adapter.head(3, columns=["id"])
        assert head.num_rows == 3 and head.column_names == ["id"]

    def test_scanner_streaming(self, ds_adapter):
        sc = ds_adapter.scanner(columns=["id"], filter="id >= 50", batch_size=16)
        total = 0
        for batch in sc.to_batches():
            assert batch.num_rows <= 16
            assert all(i >= 50 for i in batch.column("id").to_pylist())
            total += batch.num_rows
        assert total == 50
        assert sc.count_rows() == 50

    def test_expression_filter(self, ds_adapter):
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        expr = pc.field("id") < 7
        out = ds_adapter.to_table(columns=["id"], filter=expr)
        assert sorted(out.column("id").to_pylist()) == list(range(7))

    def test_take_and_sort(self, ds_adapter):
        taken = ds_adapter.take([5, 1, 9], columns=["id"])
        assert taken.column("id").to_pylist() == [5, 1, 9]
        top = ds_adapter.sort_by([("id", "descending")]).column("id")[0].as_py()
        assert top == 99

    def test_pyarrow_head_with_expression_filter(self, ds_adapter):
        """limit must bound POST-filter rows when the filter is an
        Expression (review finding: limit was pushed pre-filter)."""
        import pyarrow.compute as pc

        out = ds_adapter.head(10, filter=pc.field("id") >= 50)
        assert out.num_rows == 10
        assert all(i >= 50 for i in out.column("id").to_pylist())


class TestFlattenColumns:
    """to_pandas(flatten=) struct flattening (reference util.py:160)."""

    def test_flatten_levels(self, mem_db):
        import pyarrow as pa

        from lancedb_tpu.arrow import flatten_columns

        inner = pa.StructArray.from_arrays(
            [pa.array([1, 2]), pa.array(["a", "b"])], names=["x", "y"])
        outer = pa.StructArray.from_arrays([inner], names=["inner"])
        tbl = pa.table({"id": [10, 20], "st": outer})
        one = flatten_columns(tbl, 1)
        assert "st.inner" in one.column_names
        full = flatten_columns(tbl, True)
        assert {"st.inner.x", "st.inner.y", "id"} == set(full.column_names)
        assert flatten_columns(tbl, None).column_names == tbl.column_names
        assert flatten_columns(tbl, False).column_names == tbl.column_names
        with pytest.raises(ValueError):
            flatten_columns(tbl, 0)

    def test_to_pandas_flatten(self, mem_db):
        import pyarrow as pa

        t = mem_db.create_table("fl", pa.table({
            "id": [1], "meta": pa.StructArray.from_arrays([pa.array([5])], names=["k"]),
        }))
        df = t.to_pandas(flatten=True)
        assert "meta.k" in df.columns
