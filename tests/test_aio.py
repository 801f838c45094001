"""Async SDK tests (reference python async SDK: AsyncConnection /
AsyncTable / AsyncQuery builders, streaming batches)."""

import asyncio

import numpy as np
import pytest

import lancedb_tpu as ldb
from conftest import make_vector_table


def arun(coro):
    return asyncio.run(coro)


class TestAsyncBuilders:
    def test_vector_builder_fluent(self, tmp_path):
        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(200, dim=16))
            q = np.zeros(16, np.float32)
            res = await (
                t.search(q).nprobes(4).refine_factor(2).where("id < 50").limit(5).to_arrow()
            )
            assert res.num_rows == 5
            assert all(i < 50 for i in res.column("id").to_pylist())
            plan = await t.search(q).limit(3).explain_plan()
            assert "KnnFlat" in plan or "ANN" in plan

        arun(main())

    def test_fts_and_hybrid_builders(self, tmp_path):
        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            data = make_vector_table(50, dim=8)
            data = data.append_column(
                "text", [[f"document number {i} about topic{i % 5}" for i in range(50)]]
            )
            t = await db.create_table("t", data)
            await t.create_fts_index("text")
            res = await t.search("topic3", query_type="fts").limit(5).to_arrow()
            assert res.num_rows > 0
            assert all("topic3" in s for s in res.column("text").to_pylist())

        arun(main())

    def test_streaming_batches_backpressure(self, tmp_path):
        """to_batches is an async iterator that never materializes the
        full result: batch count and row total must match a bounded
        chunk size."""

        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(1000, dim=8))
            seen_rows = 0
            nbatches = 0
            async for batch in t.query().to_batches(max_batch_length=100):
                assert batch.num_rows <= 100
                seen_rows += batch.num_rows
                nbatches += 1
            assert seen_rows == 1000
            assert nbatches >= 10

        arun(main())

    def test_streaming_propagates_errors(self, tmp_path):
        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(100, dim=8))
            with pytest.raises(Exception):
                async for _ in t.query().to_batches(max_batch_length=10, timeout=0.0):
                    await asyncio.sleep(0.05)

        arun(main())

    def test_early_consumer_exit_stops_producer(self, tmp_path):
        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(1000, dim=8))
            it = t.query().to_batches(max_batch_length=10)
            async for _ in it:
                break  # abandon the stream after one batch
            await it.aclose()

        arun(main())


class TestAsyncTableSurface:
    def test_merge_insert_and_indices(self, tmp_path):
        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(100, dim=8))
            stats = await t.merge_insert(
                "id", [{"id": 1, "vector": [0.5] * 8}, {"id": 500, "vector": [1.0] * 8}]
            )
            assert stats["num_updated_rows"] == 1
            assert stats["num_inserted_rows"] == 1
            await t.create_scalar_index("id")
            idx = await t.list_indices()
            assert any(i["index_type"] == "BTREE" for i in idx)
            s = await t.stats()
            assert s["num_rows"] == 101

        arun(main())

    def test_versions_roundtrip(self, tmp_path):
        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(10, dim=8))
            v1 = await t.version()
            await t.add(make_vector_table(5, dim=8, seed=2))
            assert await t.count_rows() == 15
            await t.checkout(v1)
            assert await t.count_rows() == 10
            await t.checkout_latest()
            await t.restore(v1)
            assert await t.count_rows() == 10
            versions = await t.list_versions()
            assert len(versions) >= 3

        arun(main())

    def test_tags_branches_prewarm(self, tmp_path):
        """Async facade for tags/branches/prewarm (reference AsyncTable
        tags + branch ops, python/python/lancedb/table.py async surface)."""

        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(20, dim=8))
            v1 = await t.version()
            await t.tags.create("v1-tag", v1)
            tags = await t.tags.list()
            assert "v1-tag" in tags
            await t.tags.update("v1-tag", v1)
            await t.tags.delete("v1-tag")
            assert "v1-tag" not in await t.tags.list()

            await t.create_branch("experiment", v1)
            assert "experiment" in await t.branches()
            await t.checkout_branch("experiment")
            await t.add(make_vector_table(5, dim=8, seed=3))
            assert await t.count_rows() == 25

        arun(main())

    def test_async_blob_fetch(self, tmp_path):
        async def main():
            import pyarrow as pa

            from lancedb_tpu.blob import blob_field

            db = await ldb.connect_async(str(tmp_path / "db"))
            payloads = [b"a" * 64, b"b" * 64, None]
            schema = pa.schema([pa.field("id", pa.int64()), blob_field("doc")])
            data = pa.table(
                {
                    "id": pa.array([0, 1, 2], pa.int64()),
                    "doc": pa.array(payloads, pa.large_binary()),
                },
                schema=schema,
            )
            t = await db.create_table("t", data)
            assert await t.blob_columns() == ["doc"]
            blobs = await t.fetch_blobs("doc", [0, 2])
            assert blobs[0] == payloads[0] and blobs[1] is None
            ranged = await t.fetch_blob_ranges("doc", [1], [(8, 16)])
            assert ranged[0] == payloads[1][8 : 8 + 16]
            files = await t.fetch_blob_files("doc", [0])
            assert files[0].read(4) == b"aaaa"

        arun(main())

    def test_concurrent_queries_bounded_executor(self, tmp_path):
        """A burst of concurrent queries completes on the shared
        bounded pool (no unbounded thread creation)."""

        async def main():
            db = await ldb.connect_async(str(tmp_path / "db"))
            t = await db.create_table("t", make_vector_table(300, dim=8))
            q = np.zeros(8, np.float32)
            results = await asyncio.gather(
                *[t.search(q).limit(3).to_arrow() for _ in range(24)]
            )
            assert all(r.num_rows == 3 for r in results)
            import threading

            aio_threads = [
                th for th in threading.enumerate() if th.name.startswith("lancedb-aio")
            ]
            assert 0 < len(aio_threads) <= 32

        arun(main())
