"""End-to-end API tests over the connection/table/query surface
(modeled on reference python tests test_table.py / test_query.py)."""

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu as ldb
from lancedb_tpu.errors import InvalidInputError, TableAlreadyExistsError, TableNotFoundError

from conftest import make_vector_table


class TestConnection:
    def test_create_open_drop(self, mem_db):
        t = mem_db.create_table("t1", make_vector_table(50))
        assert mem_db.table_names() == ["t1"]
        t2 = mem_db.open_table("t1")
        assert t2.count_rows() == 50
        with pytest.raises(TableAlreadyExistsError):
            mem_db.create_table("t1", make_vector_table(5))
        mem_db.drop_table("t1")
        assert mem_db.table_names() == []
        with pytest.raises(TableNotFoundError):
            mem_db.open_table("t1")

    def test_create_modes(self, mem_db):
        mem_db.create_table("t", make_vector_table(10))
        t = mem_db.create_table("t", make_vector_table(20), mode="overwrite")
        assert t.count_rows() == 20
        t = mem_db.create_table("t", exist_ok=True, schema=t.schema)
        assert t.count_rows() == 20

    def test_schema_only_create(self, mem_db):
        schema = pa.schema([("id", pa.int64()), ("vector", ldb.vector(8))])
        t = mem_db.create_table("empty", schema=schema)
        assert t.count_rows() == 0
        t.add([{"id": 1, "vector": [0.0] * 8}])
        assert t.count_rows() == 1

    def test_rename(self, tmp_db):
        tmp_db.create_table("a", make_vector_table(5))
        tmp_db.rename_table("a", "b")
        assert tmp_db.table_names() == ["b"]

    def test_table_names_pagination(self, mem_db):
        for n in ["c", "a", "b"]:
            mem_db.create_table(n, make_vector_table(2))
        assert mem_db.table_names() == ["a", "b", "c"]
        assert mem_db.table_names(page_token="a", limit=1) == ["b"]

    def test_from_dict_of_arrays(self, mem_db):
        vecs = np.random.rand(10, 4).astype(np.float32)
        t = mem_db.create_table("m", {"vector": vecs, "id": np.arange(10)})
        assert t.schema.field("vector").type == pa.list_(pa.float32(), 4)


class TestCrud:
    def test_add_and_count(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        t.add(make_vector_table(10, seed=9))
        assert t.count_rows() == 266
        assert t.count_rows("price > 50") > 0

    def test_delete_update(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(100))
        n = t.delete("id >= 90")
        assert n == 10 and t.count_rows() == 90
        t.update(where="id < 5", values={"price": 0.0})
        assert t.count_rows("price = 0.0") == 5
        t.update(values_sql={"price": "price + 1"}, where="id = 10")
        assert t.count_rows("price >= 1") >= 1

    def test_merge_insert(self, mem_db):
        t = mem_db.create_table(
            "t", [{"id": i, "val": f"v{i}"} for i in range(5)]
        )
        stats = (
            t.merge_insert("id")
            .when_matched_update_all()
            .when_not_matched_insert_all()
            .execute([{"id": 3, "val": "updated"}, {"id": 99, "val": "new"}])
        )
        assert stats["num_updated_rows"] == 1
        assert stats["num_inserted_rows"] == 1
        assert t.count_rows() == 6
        assert t.count_rows("val = 'updated'") == 1

    def test_merge_insert_delete_missing(self, mem_db):
        t = mem_db.create_table("t", [{"id": i} for i in range(5)])
        t.merge_insert("id").when_not_matched_by_source_delete().when_not_matched_insert_all().execute(
            [{"id": 1}, {"id": 7}]
        )
        assert sorted(t.to_arrow().column("id").to_pylist()) == [1, 7]

    def test_merge_insert_condition(self, mem_db):
        t = mem_db.create_table("t", [{"id": 1, "v": 5}, {"id": 2, "v": 50}])
        t.merge_insert("id").when_matched_update_all(
            where="target.v < source.v"
        ).execute([{"id": 1, "v": 10}, {"id": 2, "v": 10}])
        vals = dict(zip(t.to_arrow().column("id").to_pylist(), t.to_arrow().column("v").to_pylist()))
        assert vals == {1: 10, 2: 50}


class TestQuery:
    def test_vector_search_basic(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        from lancedb_tpu.arrow import fsl_to_numpy

        q = fsl_to_numpy(sample_table_data.column("vector"))[0]
        res = t.search(q).limit(5).to_arrow()
        assert res.num_rows == 5
        assert "_distance" in res.column_names
        assert res.column("id")[0].as_py() == 0  # itself
        assert res.column("_distance")[0].as_py() < 1e-5

    def test_search_with_filter(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        res = t.search(q).where("id >= 100 AND id < 120").limit(50).to_arrow()
        ids = res.column("id").to_pylist()
        assert len(ids) == 20
        assert all(100 <= i < 120 for i in ids)

    def test_postfilter(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        res = t.search(q).where("id < 10", prefilter=False).limit(30).to_arrow()
        assert res.num_rows <= 10  # postfilter may drop results below limit

    def test_select_and_row_id(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        res = t.search(q).select(["id"]).with_row_id(True).limit(3).to_arrow()
        assert set(res.column_names) == {"id", "_distance", "_rowid"}

    def test_dynamic_select(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        res = t.search(q).select({"id2": "id * 2"}).limit(3).to_arrow()
        assert "id2" in res.column_names

    def test_multiple_query_vectors(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        from lancedb_tpu.arrow import fsl_to_numpy

        vecs = fsl_to_numpy(sample_table_data.column("vector"))
        res = t.search([vecs[0], vecs[1]]).limit(3).to_arrow()
        assert "query_index" in res.column_names
        assert res.num_rows == 6

    def test_empty_query_builder(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        res = t.search(None).where("id < 7").select(["id", "price"]).to_arrow()
        assert res.num_rows == 7
        res2 = t.query().where("id < 3").to_arrow()
        assert res2.num_rows == 3

    def test_offset_limit(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        full = t.search(q).limit(10).to_arrow()
        page2 = t.search(q).limit(5).offset(5).to_arrow()
        assert page2.column("id").to_pylist() == full.column("id").to_pylist()[5:]

    def test_distance_range(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        all_res = t.search(q).limit(20).to_arrow()
        d5 = all_res.column("_distance")[5].as_py()
        res = t.search(q).limit(20).distance_range(upper_bound=d5).to_arrow()
        assert res.num_rows == 5
        assert max(res.column("_distance").to_pylist()) < d5

    def test_to_list_pandas(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        q = np.zeros(16, np.float32)
        rows = t.search(q).limit(2).to_list()
        assert len(rows) == 2 and "_distance" in rows[0]
        df = t.search(q).limit(2).to_pandas()
        assert len(df) == 2

    def test_with_index_then_delta(self, mem_db):
        data = make_vector_table(300, dim=16, seed=3)
        t = mem_db.create_table("t", data)
        t.create_index(index_type="IVF_FLAT", num_partitions=8, metric="l2")
        from lancedb_tpu.arrow import fsl_to_numpy

        vecs = fsl_to_numpy(data.column("vector"))
        res = t.search(vecs[5]).nprobes(8).limit(1).to_arrow()
        assert res.column("id")[0].as_py() == 5
        # add new rows — delta fragments searched brute-force
        extra = make_vector_table(10, dim=16, seed=99)
        extra = extra.set_column(0, "id", pa.array(np.arange(1000, 1010)))
        t.add(extra)
        q = fsl_to_numpy(extra.column("vector"))[0]
        res = t.search(q).nprobes(8).limit(1).to_arrow()
        assert res.column("id")[0].as_py() == 1000

    def test_search_after_delete_with_index(self, mem_db):
        data = make_vector_table(200, dim=16, seed=4)
        t = mem_db.create_table("t", data)
        t.create_index(index_type="IVF_FLAT", num_partitions=4)
        from lancedb_tpu.arrow import fsl_to_numpy

        vecs = fsl_to_numpy(data.column("vector"))
        assert t.search(vecs[7]).limit(1).to_arrow().column("id")[0].as_py() == 7
        t.delete("id = 7")
        top = t.search(vecs[7]).nprobes(4).limit(1).to_arrow()
        assert top.column("id")[0].as_py() != 7

    def test_bypass_vector_index(self, mem_db):
        data = make_vector_table(100, dim=16)
        t = mem_db.create_table("t", data)
        t.create_index(index_type="IVF_PQ", num_partitions=4, num_sub_vectors=4)
        q = np.zeros(16, np.float32)
        res = t.search(q).bypass_vector_index().limit(5).to_arrow()
        assert res.num_rows == 5
        plan = t.search(q).bypass_vector_index().limit(5).explain_plan()
        assert "KnnFlat" in plan

    def test_explain_analyze(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        t.create_index(index_type="IVF_FLAT", num_partitions=4)
        q = np.zeros(16, np.float32)
        plan = t.search(q).limit(5).explain_plan()
        assert "ANNSubIndexExec" in plan
        analyzed = t.search(q).limit(5).analyze_plan()
        assert "elapsed_ms" in analyzed

    def test_analyze_per_operator_metrics(self, mem_db, sample_table_data):
        """analyze_plan annotates each executed operator with
        output_rows + elapsed_compute (reference analyze_plan renders
        DataFusion operator metrics, query.rs:756)."""
        t = mem_db.create_table("t", sample_table_data)
        t.create_index(index_type="IVF_FLAT", num_partitions=4)
        q = np.zeros(16, np.float32)
        analyzed = t.search(q).where("id < 100").limit(5).analyze_plan()
        for op in ("ANNSubIndexExec", "PrefilterExec", "TakeExec"):
            line = next(l for l in analyzed.splitlines() if op in l)
            assert "metrics=[output_rows=" in line and "elapsed_compute=" in line
        pre = next(l for l in analyzed.splitlines() if "PrefilterExec" in l)
        assert "output_rows=100" in pre  # id < 100 allows exactly 100 rows
        # plain queries pay nothing: no metrics annotations in explain
        assert "metrics=[" not in t.search(q).limit(5).explain_plan()


class TestIndexManagement:
    def test_list_and_stats(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        t.create_index(index_type="IVF_PQ", num_partitions=4, num_sub_vectors=4)
        idx = t.list_indices()
        assert len(idx) == 1 and idx[0]["index_type"] == "IVF_PQ"
        stats = t.index_stats(idx[0]["name"])
        assert stats["num_indexed_rows"] == 256
        assert stats["num_unindexed_rows"] == 0
        t.drop_index(idx[0]["name"])
        assert t.list_indices() == []

    def test_auto_resolves_vector_to_ivf_pq(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        t.create_index(index_type="AUTO", num_partitions=4)
        idx = t.list_indices()
        assert len(idx) == 1 and idx[0]["index_type"] == "IVF_PQ"

    def test_auto_resolves_scalar_to_btree(self, mem_db, sample_table_data):
        from lancedb_tpu.index import Auto

        t = mem_db.create_table("t", sample_table_data)
        t.create_index(vector_column_name="id", config=Auto())
        idx = t.list_indices()
        assert len(idx) == 1 and idx[0]["index_type"] == "BTREE"

    def test_auto_rejects_unindexable_type(self, mem_db):
        t = mem_db.create_table(
            "t",
            pa.table({"v": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(32, np.float32)), 8),
                "b": pa.array([b"x"] * 4, pa.binary())}),
        )
        with pytest.raises(InvalidInputError):
            t.create_index(vector_column_name="b", index_type="AUTO")

    def test_wait_and_prewarm(self, mem_db, sample_table_data):
        t = mem_db.create_table("t", sample_table_data)
        t.create_index(index_type="IVF_FLAT", num_partitions=4, name="vi")
        t.wait_for_index(["vi"], timeout=1)
        t.prewarm_index("vi")

    def test_optimize_reindexes_delta(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(200, dim=16))
        t.create_index(index_type="IVF_FLAT", num_partitions=4, name="vi")
        extra = make_vector_table(50, dim=16, seed=5)
        t.add(extra)
        assert t.index_stats("vi")["num_unindexed_rows"] == 50
        t.optimize()
        assert t.index_stats("vi")["num_unindexed_rows"] == 0


class TestVersioning:
    def test_versions_checkout_restore(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(10))
        v1 = t.version
        t.add(make_vector_table(10, seed=2))  # ids 0..9 again → 20 rows
        t.tags.create("before-delete")
        t.delete("id < 5")  # removes both copies of ids 0..4
        assert t.count_rows() == 10
        t.checkout(v1)
        assert t.count_rows() == 10
        t.checkout("before-delete")
        assert t.count_rows() == 20
        t.restore()
        assert t.count_rows() == 20
        versions = t.list_versions()
        assert versions[-1]["metadata"]["op"] == "restore"

    def test_branches(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(10))
        t.create_branch("exp")
        t.checkout_branch("exp")
        t.add(make_vector_table(5, seed=1))
        assert t.count_rows() == 15
        assert t.current_branch == "exp"
        t.checkout_branch("main")
        assert t.count_rows() == 10


class TestAsync:
    def test_async_roundtrip(self, tmp_path):
        import asyncio

        async def main():
            db = await ldb.connect_async(str(tmp_path / "adb"))
            t = await db.create_table("t", make_vector_table(30))
            assert await t.count_rows() == 30
            res = await t.vector_search(np.zeros(16, np.float32), limit=3)
            assert res.num_rows == 3
            assert (await db.table_names()) == ["t"]

        asyncio.run(main())


class TestBinaryVectors:
    def test_hamming_search(self, mem_db):
        rng = np.random.default_rng(1)
        vecs = rng.integers(0, 256, (100, 16), dtype=np.uint8)
        tbl = pa.table(
            {
                "id": pa.array(range(100)),
                "vector": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), type=pa.uint8()), 16
                ),
            }
        )
        t = mem_db.create_table("bin", tbl)
        res = t.search(vecs[42]).metric("hamming").limit(3).to_arrow()
        assert res.column("id")[0].as_py() == 42
        assert res.column("_distance")[0].as_py() == 0.0


class TestParityExtras:
    def test_clone_table(self, mem_db):
        t = mem_db.create_table("src", make_vector_table(20))
        v1 = t.version
        t.add(make_vector_table(10, seed=3))
        c = mem_db.clone_table("src", "copy_latest")
        assert c.count_rows() == 30
        c2 = mem_db.clone_table("src", "copy_v1", version=v1)
        assert c2.count_rows() == 20
        # clones are independent
        c.add(make_vector_table(5, seed=4))
        assert mem_db.open_table("src").count_rows() == 30

    def test_order_by(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(20))
        out = t.query().select(["id"]).order_by(("id", "desc")).to_arrow()
        assert out.column("id").to_pylist()[:3] == [19, 18, 17]
        out2 = t.query().select(["id", "label"]).order_by("label", ("id", "desc")).to_arrow()
        assert out2.column("label")[0].as_py() == "item-0"

    def test_write_progress(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(5))
        events = []
        t.add(make_vector_table(7, seed=1), on_progress=events.append)
        assert [e["stage"] for e in events] == ["start", "committed"]
        assert events[1]["rows"] == 7 and events[1]["version"] == t.version

    def test_primary_key_declaration(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(5))
        assert t.primary_key is None
        t.declare_primary_key("id")
        assert t.primary_key == ["id"]
        t2 = mem_db.open_table("t")
        assert t2.primary_key == ["id"]

    def test_branch_diff_and_merge(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(10))
        t.create_branch("feature")
        t.checkout_branch("feature")
        t.add(make_vector_table(5, seed=8))
        t.checkout_branch("main")
        diff = t.diff_branch("feature")
        assert diff["new_rows"] == 5
        assert len(diff["unmerged_versions"]) >= 1
        out = t.merge_branch("feature")
        assert out["fragments_merged"] == 1
        assert t.count_rows() == 15
        # idempotent second merge
        assert t.merge_branch("feature")["fragments_merged"] == 0


class TestOnBadVectors:
    """on_bad_vectors modes (reference table.py:331-376: error/drop/
    fill/null over null or non-finite vectors)."""

    def _data(self):
        return [
            {"id": 0, "vector": [1.0, 2.0, 3.0, 4.0]},
            {"id": 1, "vector": [float("nan"), 2.0, 3.0, 4.0]},
            {"id": 2, "vector": [5.0, 6.0, 7.0, 8.0]},
        ]

    def test_error_default(self, mem_db):
        with pytest.raises(InvalidInputError, match="bad vector"):
            mem_db.create_table("t", self._data())

    def test_drop(self, mem_db):
        t = mem_db.create_table("t", self._data(), on_bad_vectors="drop")
        assert t.count_rows() == 2
        assert sorted(t.to_arrow().column("id").to_pylist()) == [0, 2]

    def test_fill(self, mem_db):
        t = mem_db.create_table("t", self._data(), on_bad_vectors="fill", fill_value=9.0)
        row = t.search(np.array([9.0] * 4, np.float32)).limit(1).to_list()[0]
        assert row["id"] == 1
        assert row["vector"] == [9.0] * 4

    def test_add_respects_mode(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "vector": [0.0] * 4}])
        with pytest.raises(InvalidInputError):
            t.add([{"id": 1, "vector": [float("inf")] * 4}])
        t.add([{"id": 1, "vector": [float("inf")] * 4}], on_bad_vectors="drop")
        assert t.count_rows() == 1

    def test_streaming_add_sanitizes(self, mem_db):
        """on_bad_vectors applies to streaming (reader) ingests too
        (review finding: the append_stream fast path skipped it)."""
        schema = pa.schema([("id", pa.int64()), ("vector", pa.list_(pa.float32(), 4))])
        t = mem_db.create_table("t", schema=schema)

        def gen():
            yield pa.record_batch([
                pa.array([0, 1]),
                pa.FixedSizeListArray.from_arrays(
                    pa.array([1.0, 2.0, 3.0, 4.0, float("nan"), 2.0, 3.0, 4.0],
                             type=pa.float32()), 4),
            ], schema=schema)

        with pytest.raises(InvalidInputError):
            t.add(pa.RecordBatchReader.from_batches(schema, gen()))
        t.add(pa.RecordBatchReader.from_batches(schema, gen()), on_bad_vectors="drop")
        assert t.count_rows() == 1

    def test_4bit_odd_subvector_dim_builds(self, mem_db):
        """dim=80 -> suggested nsub 5 (odd); the 4-bit even bump must not
        produce a non-dividing subvector count (review finding)."""
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((300, 80)).astype(np.float32)
        t = mem_db.create_table("t", {"id": np.arange(300), "vector": list(vecs)})
        t.create_index(index_type="IVF_PQ", num_partitions=4, num_bits=4)
        res = t.search(vecs[5]).refine_factor(4).limit(1).to_list()
        assert res[0]["id"] == 5


class TestParitySurface:
    """API-parity additions from the reference SDK sweep: tokenize,
    blob_columns/branches properties, LSM spec get/unset, row-address
    and fragment-scoped scans, query serialization, connection
    serialize/namespace passthroughs."""

    def test_tokenize(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "text": "The Quick brown Foxes"}])
        t.create_fts_index("text")
        toks = t.tokenize("Quick Foxes", column="text")
        assert [tk.text for tk in toks] == ["quick", "fox"]  # stemmed, stopless
        assert [tk.position for tk in toks] == [0, 1]
        with pytest.raises(InvalidInputError):
            t.tokenize("x", column="text", index_name="text_idx")

    def test_blob_columns_and_branches(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "x": 1.0}])
        assert t.blob_columns == []
        t.create_branch("dev")
        assert "dev" in t.branches

    def test_lsm_spec_get_unset(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "v": "a"}])
        assert t.get_lsm_write_spec() is None
        t.set_lsm_write_spec("unsharded", key_columns=["id"])
        spec = t.get_lsm_write_spec()
        assert spec["key_columns"] == ["id"]
        t.unset_lsm_write_spec()
        assert t.get_lsm_write_spec() is None

    def test_with_row_address(self, mem_db):
        t = mem_db.create_table("t", [{"id": i} for i in range(5)])
        out = t.query().with_row_address().to_arrow()
        assert "_rowaddr" in out.column_names
        assert "_rowid" not in out.column_names
        out2 = t.query().with_row_id().with_row_address().to_arrow()
        assert set(["_rowid", "_rowaddr"]) <= set(out2.column_names)
        assert out2.column("_rowid").to_pylist() == out2.column("_rowaddr").to_pylist()
        # on a search surface too
        t2 = mem_db.create_table("tv", {"id": np.arange(8), "vector": list(np.eye(8, 4, dtype=np.float32) + 0.01)})
        res = t2.search(np.zeros(4, np.float32)).with_row_address().limit(2).to_arrow()
        assert "_rowaddr" in res.column_names

    def test_fragment_ids_scoped_scan(self, mem_db):
        t = mem_db.create_table("t", [{"id": i} for i in range(3)])
        t.add([{"id": i} for i in range(3, 6)])
        frags = [f.id for f in t._dataset.manifest.fragments]
        assert len(frags) == 2
        out = t.query().fragment_ids([frags[0]]).to_arrow()
        assert out.column("id").to_pylist() == [0, 1, 2]
        out = t.query().with_fragments([frags[1]]).to_arrow()
        assert out.column("id").to_pylist() == [3, 4, 5]
        # search builders reject scan-only options
        t2 = mem_db.create_table("tv", {"id": np.arange(8), "vector": list(np.random.default_rng(0).standard_normal((8, 4)).astype(np.float32))})
        with pytest.raises(InvalidInputError, match="fragment"):
            t2.search(np.zeros(4, np.float32)).fragment_ids([0]).to_arrow()
        with pytest.raises(InvalidInputError, match="use_lsm"):
            t2.search(np.zeros(4, np.float32)).use_lsm().to_arrow()

    def test_to_query_object(self, mem_db):
        import json as _json

        t = mem_db.create_table("tv", {"id": np.arange(8), "vector": list(np.random.default_rng(0).standard_normal((8, 4)).astype(np.float32))})
        q = t.search([1.0, 0.0, 0.0, 0.0]).nprobes(5).where("id > 2").limit(3)
        obj = q.to_query_object()
        assert obj["k"] == 3 and obj["minimum_nprobes"] == 5
        assert obj["filter"] == "id > 2"
        assert obj["query_vectors"] == [[1.0, 0.0, 0.0, 0.0]]
        _json.dumps(obj)  # fully serializable

    def test_vector_text_setters(self, mem_db):
        rng = np.random.default_rng(0)
        t = mem_db.create_table("tv", {"id": np.arange(16), "vector": list(np.eye(16, 4, dtype=np.float32))})
        res = t.search(np.zeros(4, np.float32)).vector([1.0, 0, 0, 0]).distance_type("l2").limit(1).to_list()
        assert res[0]["id"] == 0

    def test_connection_serialize_roundtrip(self, tmp_path):
        import lancedb_tpu

        db = lancedb_tpu.connect(str(tmp_path))
        db.create_table("t", [{"id": 1}])
        s = db.serialize()
        db2 = lancedb_tpu.deserialize_conn(s)
        assert db2.table_names() == ["t"]

    def test_connection_namespace_passthrough(self, tmp_path):
        import lancedb_tpu

        db = lancedb_tpu.connect(str(tmp_path))
        db.create_namespace(["prod"])
        assert db.namespace_exists(["prod"])
        assert "prod" in db.list_namespaces()
        assert "properties" in db.describe_namespace(["prod"]) or isinstance(
            db.describe_namespace(["prod"]), dict
        )
        db.drop_namespace(["prod"])
        assert not db.namespace_exists(["prod"])

    def test_parity_aliases(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "x": 1.0}])
        t.set_unenforced_primary_key(["id"])
        assert t.primary_key == ["id"]
        t.replace_field_metadata("x", {"unit": "m"})
        assert t.schema.field("x").metadata[b"unit"] == b"m"
        t.migrate_v2_manifest_paths()  # no-op parity shim


class TestTableMerge:
    """Table.merge — left-join column merge (reference table.py:3324)."""

    def test_merge_adds_columns(self, mem_db):
        t = mem_db.create_table("t", [{"id": i, "x": float(i)} for i in range(5)])
        t.merge([{"id": i, "label": f"L{i}"} for i in range(3)], left_on="id")
        out = t.query().to_arrow().sort_by("id")
        assert out.column("label").to_pylist() == ["L0", "L1", "L2", None, None]
        assert "label" in t.schema.names

    def test_merge_with_table_and_right_on(self, mem_db):
        t = mem_db.create_table("t", [{"id": i} for i in range(3)])
        o = mem_db.create_table("o", [{"key": i, "v": i * 10} for i in range(3)])
        t.merge(o, left_on="id", right_on="key")
        out = t.query().to_arrow().sort_by("id")
        assert out.column("v").to_pylist() == [0, 10, 20]

    def test_merge_overlap_rejected(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "x": 1.0}])
        with pytest.raises(InvalidInputError, match="overlap|exist"):
            t.merge([{"id": 0, "x": 2.0}], left_on="id")

    def test_merge_preserves_row_ids(self, mem_db):
        t = mem_db.create_table("t", [{"id": i} for i in range(4)])
        before = t.query().with_row_id().to_arrow()
        t.merge([{"id": i, "y": i} for i in range(4)], left_on="id")
        after = t.query().with_row_id().to_arrow()
        assert before.column("_rowid").to_pylist() == after.column("_rowid").to_pylist()


class TestReviewFindings:
    """Regression tests for the post-parity code-review findings."""

    def test_merge_duplicate_keys_rejected(self, mem_db):
        t = mem_db.create_table("t", [{"id": 1, "x": 1.0}])
        with pytest.raises(InvalidInputError, match="unique"):
            t.merge([{"id": 1, "v": "a"}, {"id": 1, "v": "b"}], left_on="id")

    def test_fts_hybrid_to_query_object_carry_query(self, mem_db):
        import json as _json

        t = mem_db.create_table("t", [
            {"id": 0, "text": "quick brown fox", "vector": [1.0, 0.0]},
            {"id": 1, "text": "lazy dog", "vector": [0.0, 1.0]},
        ])
        t.create_fts_index("text")
        obj = t.search("quick fox", query_type="fts").to_query_object()
        assert obj["query_type"] == "fts"
        assert "quick fox" in _json.dumps(obj["full_text_query"])
        obj = t.search("quick", query_type="hybrid",
                       vector_column_name="vector").vector([1.0, 0.0]).to_query_object()
        assert obj["query_type"] == "hybrid"
        assert obj["query_vectors"] == [[1.0, 0.0]]
        assert "quick" in _json.dumps(obj["full_text_query"])

    def test_to_batches_honors_fragment_scope_and_rowaddr(self, mem_db):
        t = mem_db.create_table("t", [{"id": i} for i in range(3)])
        t.add([{"id": i} for i in range(3, 6)])
        frags = [f.id for f in t._dataset.manifest.fragments]
        rows = []
        for b in t.query().fragment_ids([frags[1]]).to_batches(max_batch_length=2):
            rows += b.column("id").to_pylist()
        assert rows == [3, 4, 5]
        batches = list(t.query().with_row_address().to_batches())
        assert all("_rowaddr" in b.schema.names for b in batches)

    def test_use_lsm_with_fragment_ids_rejected(self, mem_db):
        t = mem_db.create_table("t", [{"id": 0, "v": "a"}])
        with pytest.raises(InvalidInputError, match="fragment"):
            t.query().use_lsm().fragment_ids([0]).to_arrow()

    def test_nearest_to_rejects_carried_scan_flags(self, mem_db):
        t = mem_db.create_table("t", {"id": np.arange(4), "vector": list(np.eye(4, 2, dtype=np.float32))})
        with pytest.raises(InvalidInputError, match="use_lsm"):
            t.query().use_lsm().nearest_to([1.0, 0.0]).to_arrow()
        with pytest.raises(InvalidInputError, match="fragment"):
            t.query().fragment_ids([0]).nearest_to([1.0, 0.0]).to_arrow()

    def test_num_bits_error_type(self, mem_db):
        from lancedb_tpu.index import IvfPq

        rng = np.random.default_rng(0)
        t = mem_db.create_table("t", {"id": np.arange(300), "vector": list(rng.standard_normal((300, 16)).astype(np.float32))})
        with pytest.raises(InvalidInputError):
            t.create_index(config=IvfPq(num_partitions=4, num_bits=5))
        with pytest.raises(ValueError):  # InvalidInputError IS a ValueError
            t.create_index(config=IvfPq(num_partitions=4, num_bits=3))

    def test_oauth_short_ttl_still_caches(self):
        import json as _json

        from lancedb_tpu.remote import OAuthConfig, OAuthHeaderProvider

        calls = []
        def transport(method, url, headers, body):
            calls.append(url)
            if "well-known" in url:
                return 200, _json.dumps({"token_endpoint": "https://idp/t"}).encode()
            return 200, _json.dumps({"access_token": f"tok{len(calls)}", "expires_in": 60}).encode()

        prov = OAuthHeaderProvider(
            OAuthConfig(issuer_url="https://idp", client_id="c",
                        client_secret="s", scopes=["x"]),
            transport=transport,
        )
        h1 = prov()
        n = len(calls)
        # ttl (60s) < buffer (300s): effective buffer floors at ttl/2 so
        # the token is NOT refetched immediately
        assert prov() == h1
        assert len(calls) == n


class TestIdentityAndStorageOptions:
    """Parity shims: Table.id/namespace, storage-options accessors,
    LanceTable.open/create classmethods, FTS get_query (reference
    table.py:2184-2212,3044-3072, query.py:3458, db.py:1358)."""

    def test_table_id_and_namespace(self, mem_db):
        t = mem_db.create_table("plain", {"id": [1, 2]})
        assert t.namespace == []
        assert t.id == "plain"

    def test_namespace_table_id(self, tmp_path):
        from lancedb_tpu.namespace import connect_namespace

        ns = connect_namespace(str(tmp_path))
        ns.create_namespace(["a"])
        ns.create_namespace(["a", "b"])
        t = ns.create_table(["a", "b", "t1"], {"id": [1]})
        assert t.namespace == ["a", "b"]
        assert t.id == "a$b$t1"
        t2 = ns.open_table(["a", "b", "t1"])
        assert t2.id == "a$b$t1"

    def test_open_create_classmethods(self, mem_db):
        from lancedb_tpu.table import Table

        t = Table.create(mem_db, "viacls", {"id": [1, 2, 3]})
        assert t.count_rows() == 3
        t2 = Table.open(mem_db, "viacls")
        assert t2.count_rows() == 3

    def test_storage_options_provider(self, tmp_path):
        import lancedb_tpu

        calls = []

        def provider():
            calls.append(1)
            return {"token": f"tok{len(calls)}"}

        db = lancedb_tpu.connect(
            str(tmp_path),
            storage_options={"region": "us-east-1"},
            storage_options_provider=provider,
        )
        t = db.create_table("t", {"id": [1]})
        assert t.initial_storage_options() == {"region": "us-east-1"}
        latest = t.latest_storage_options()
        assert latest == {"region": "us-east-1", "token": "tok1"}
        # refresh pulls a new credential each call
        assert t.latest_storage_options()["token"] == "tok2"
        # no provider → latest falls back to initial
        db2 = lancedb_tpu.connect(str(tmp_path))
        t2 = db2.open_table("t")
        assert t2.latest_storage_options() == t2.initial_storage_options()

    def test_fts_get_query(self, mem_db):
        t = mem_db.create_table("docs", {"id": [1, 2], "text": ["hello world", "bye"]})
        t.create_fts_index("text")
        b = t.search("hello", query_type="fts")
        assert b.get_query() == "hello"

    def test_async_accessors(self, mem_db):
        import asyncio

        from lancedb_tpu.db import AsyncConnection

        async def go():
            conn = AsyncConnection(mem_db)
            assert await conn.get_read_consistency_interval() is None
            t = await conn.create_table("at", {"id": [1], "text": ["x"]})
            assert t.id == "at"
            assert t.namespace == []
            assert await t.initial_storage_options() is None
            assert await t.latest_storage_options() is None

        asyncio.run(go())


class TestLimitSemantics:
    def test_vector_query_requires_limit(self, mem_db):
        t = mem_db.create_table("lim", {"id": [1, 2], "vector": [[1.0, 0.0], [0.0, 1.0]]})
        with pytest.raises(ValueError, match="Limit is required"):
            t.search([1.0, 0.0]).limit(0).to_list()
        with pytest.raises(ValueError, match="Limit is required"):
            t.search([1.0, 0.0]).limit(None).to_list()
        # plain scans: None/0 means every row (reference query.py:1183)
        assert len(t.search(None).limit(None).to_list()) == 2

    def test_to_pandas_kwargs_passthrough(self, mem_db):
        t = mem_db.create_table("pdk", {"id": [1, 2], "vector": [[1.0, 0.0], [0.0, 1.0]]})
        df = t.search([1.0, 0.0]).limit(1).to_pandas(use_threads=False)
        assert len(df) == 1


class TestAddProgress:
    """Reference progress= forms on add (reference test_table.py
    test_add_progress_callback / _tqdm_like / _bool)."""

    def test_callback_dict_shape(self, mem_db):
        t = mem_db.create_table("pg1", [{"id": 1}, {"id": 2}], mode="overwrite")
        updates = []
        t.add([{"id": 3}, {"id": 4}], progress=lambda p: updates.append(dict(p)))
        assert t.count_rows() == 4
        assert len(updates) >= 1
        for p in updates:
            for key in ("output_rows", "output_bytes", "total_rows",
                        "elapsed_seconds", "active_tasks", "total_tasks", "done"):
                assert key in p
        assert updates[-1]["done"] is True
        assert updates[-1]["output_rows"] == 2

    def test_tqdm_like(self, mem_db):
        class FakeBar:
            def __init__(self):
                self.total = None
                self.n = 0
                self.postfix = None

            def update(self, n):
                self.n += n

            def set_postfix_str(self, s):
                self.postfix = s

            def refresh(self):
                pass

        t = mem_db.create_table("pg2", [{"id": 1}], mode="overwrite")
        bar = FakeBar()
        t.add([{"id": 2}, {"id": 3}], progress=bar)
        assert bar.n == 2
        assert bar.total == 2
        assert "MB/s" in bar.postfix and "workers" in bar.postfix

    def test_bool_and_none(self, mem_db):
        t = mem_db.create_table("pg3", [{"id": 1}], mode="overwrite")
        t.add([{"id": 2}], progress=True)  # must not raise without tqdm
        t.add([{"id": 3}], progress=False)
        assert t.count_rows() == 3

    def test_streaming_add_fires_done(self, mem_db):
        import pyarrow as pa

        t = mem_db.create_table("pg4", [{"id": 1}], mode="overwrite")
        updates = []

        def gen():
            yield pa.record_batch([pa.array([2, 3])], names=["id"])

        t.add(gen(), progress=lambda p: updates.append(dict(p)))
        assert t.count_rows() == 3
        assert updates and updates[-1]["done"] is True


class TestNprobesValidationAndHybridRange:
    """Reference test_query.py:917 nprobes validation and
    test_hybrid_query.py:219 hybrid distance_range."""

    def _t(self, mem_db):
        rng = np.random.default_rng(0)
        t = mem_db.create_table("npv", [
            {"id": i, "text": f"word{i} common",
             "vector": list(rng.standard_normal(8).astype(float))}
            for i in range(50)
        ], mode="overwrite")
        t.create_fts_index("text")
        return t, rng.standard_normal(8).astype(np.float32)

    def test_invalid_nprobes(self, mem_db):
        t, q = self._t(mem_db)
        with pytest.raises(ValueError, match="minimum_nprobes must be greater than 0"):
            t.search(q).nprobes(0).limit(2).to_list()
        with pytest.raises(ValueError, match="minimum_nprobes must be greater than 0"):
            t.search(q).minimum_nprobes(0).limit(2).to_list()
        with pytest.raises(ValueError, match="maximum_nprobes must be greater"):
            t.search(q).minimum_nprobes(100).limit(2).to_list()

    def test_maximum_nprobes_zero_is_unlimited(self, mem_db):
        t, q = self._t(mem_db)
        t.create_index(index_type="IVF_FLAT", num_partitions=4)
        res = t.search(q).minimum_nprobes(2).maximum_nprobes(0).limit(3).to_list()
        assert len(res) == 3

    def test_hybrid_distance_range(self, mem_db):
        t, q = self._t(mem_db)
        assert len(t.search((q, "common"), query_type="hybrid")
                   .limit(5).distance_range(upper_bound=100.0).to_list()) == 5
        # zero upper bound empties the vector leg; fts leg still returns
        res = t.search((q, "common"), query_type="hybrid") \
               .limit(5).distance_range(upper_bound=0.0).to_list()
        assert len(res) > 0


def test_s3_bucket_with_dots_requires_region():
    """S3 buckets with dots break virtual-hosted-style region detection
    (reference __init__.py:36-66, lancedb issue #1898)."""
    with pytest.raises(InvalidInputError, match="contains dots"):
        ldb.connect("s3://my.bucket/db")


class TestHalfPrecision:
    """f16 storage + query-vector fidelity (reference IntoQueryVector
    accepts f16/f32/f64 and stores halffloat columns —
    rust/lancedb/src/query.rs:131-374)."""

    def test_f16_column_round_trip(self, mem_db):
        import numpy as np
        import pyarrow as pa

        x = np.random.default_rng(0).standard_normal((50, 8)).astype(np.float16)
        fsl = pa.FixedSizeListArray.from_arrays(pa.array(x.ravel(), pa.float16()), 8)
        t = mem_db.create_table("f16", pa.table(
            {"id": pa.array(np.arange(50)), "vector": fsl}))
        back = t.to_arrow()
        assert back.schema.field("vector").type.value_type == pa.float16()
        got = np.asarray(back.column("vector").combine_chunks().flatten(),
                         dtype=np.float16).reshape(50, 8)
        np.testing.assert_array_equal(got, x)  # bit-exact storage round-trip

    def test_query_vector_dtypes(self, mem_db):
        import numpy as np
        import pyarrow as pa

        x = np.random.default_rng(1).standard_normal((80, 8)).astype(np.float16)
        fsl = pa.FixedSizeListArray.from_arrays(pa.array(x.ravel(), pa.float16()), 8)
        t = mem_db.create_table("f16q", pa.table(
            {"id": pa.array(np.arange(80)), "vector": fsl}))
        for dt in (np.float16, np.float32, np.float64):
            res = t.search(x[7].astype(dt)).limit(1).to_arrow()
            assert res.column("id")[0].as_py() == 7, dt

    def test_f16_with_index(self, mem_db):
        import numpy as np
        import pyarrow as pa

        x = np.random.default_rng(2).standard_normal((300, 16)).astype(np.float16)
        fsl = pa.FixedSizeListArray.from_arrays(pa.array(x.ravel(), pa.float16()), 16)
        t = mem_db.create_table("f16i", pa.table(
            {"id": pa.array(np.arange(300)), "vector": fsl}))
        t.create_index(index_type="IVF_FLAT", metric="l2", num_partitions=4)
        res = t.search(x[11]).limit(1).to_arrow()
        assert res.column("id")[0].as_py() == 11
