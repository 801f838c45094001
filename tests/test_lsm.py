"""LSM / MemWAL tests (reference test_merge_insert_lsm.py territory:
sharding specs, WAL routing, read overlay, flush, checkpoint, stats)."""

import numpy as np
import pytest

from lancedb_tpu.errors import InvalidInputError

from conftest import make_vector_table


@pytest.fixture
def table(mem_db):
    t = mem_db.create_table("t", [{"id": i, "val": f"v{i}", "n": i * 10} for i in range(20)])
    return t


def upsert(t, rows):
    return (
        t.merge_insert("id")
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .use_lsm()
        .execute(rows)
    )


class TestLsmSpec:
    def test_install_describe_drop(self, table):
        table.set_lsm_write_spec("bucket", key_columns=["id"], num_shards=4)
        spec = table.describe_lsm_spec()
        assert spec == {"mode": "bucket", "key_columns": ["id"], "num_shards": 4}
        table.drop_lsm_spec()
        assert table.describe_lsm_spec() is None

    def test_requires_spec(self, table):
        with pytest.raises(InvalidInputError):
            upsert(table, [{"id": 1, "val": "x", "n": 0}])

    def test_key_validation(self, table):
        with pytest.raises(InvalidInputError):
            table.set_lsm_write_spec("bucket", key_columns=["ghost"], num_shards=2)

    def test_shape_validation(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        with pytest.raises(InvalidInputError):
            table.merge_insert("id").when_not_matched_by_source_delete().use_lsm().execute(
                [{"id": 1, "val": "x", "n": 0}]
            )


class TestLsmWriteRead:
    def test_wal_append_and_overlay(self, table):
        table.set_lsm_write_spec("bucket", key_columns=["id"], num_shards=4)
        stats = upsert(table, [{"id": 3, "val": "updated", "n": 333},
                               {"id": 99, "val": "new", "n": 990}])
        assert stats["num_rows"] == 2
        # base table untouched
        assert table.count_rows() == 20
        # LSM read overlay sees both
        rows = table.query().use_lsm().to_arrow().to_pylist()
        by_id = {r["id"]: r for r in rows}
        assert len(rows) == 21
        assert by_id[3]["val"] == "updated"
        assert by_id[99]["val"] == "new"
        # filters apply to WAL rows too
        res = table.query().use_lsm().where("n >= 300").to_arrow()
        assert {r["id"] for r in res.to_pylist()} >= {3, 99}

    def test_last_write_wins(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        upsert(table, [{"id": 5, "val": "first", "n": 1}])
        upsert(table, [{"id": 5, "val": "second", "n": 2}])
        rows = table.query().use_lsm().where("id = 5").to_arrow().to_pylist()
        assert len(rows) == 1 and rows[0]["val"] == "second"

    def test_sharding_distribution(self, table):
        table.set_lsm_write_spec("bucket", key_columns=["id"], num_shards=4)
        upsert(table, [{"id": i, "val": "x", "n": 0} for i in range(100, 140)])
        stats = table.lsm_stats()
        assert stats["enabled"]
        assert len(stats["shards"]) > 1  # keys spread over shards
        assert stats["total_wal_rows"] == 40

    def test_identity_sharding(self, table):
        table.set_lsm_write_spec("identity", key_columns=["id"], num_shards=3)
        upsert(table, [{"id": 7, "val": "x", "n": 0}])
        stats = table.lsm_stats()
        assert list(stats["shards"].keys()) == [7 % 3]


class TestLsmMaintenance:
    def test_flush_folds_into_base(self, table):
        table.set_lsm_write_spec("bucket", key_columns=["id"], num_shards=2)
        upsert(table, [{"id": 3, "val": "updated", "n": 0}, {"id": 50, "val": "new", "n": 0}])
        out = table.flush_lsm()
        assert out["rows_flushed"] == 2
        assert out["merge"]["num_updated_rows"] == 1
        assert out["merge"]["num_inserted_rows"] == 1
        assert table.count_rows() == 21
        assert table.count_rows("val = 'updated'") == 1
        assert table.lsm_stats()["total_wal_rows"] == 0

    def test_checkpoint(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        upsert(table, [{"id": 200, "val": "wal", "n": 1}])
        out = table.checkpoint_lsm(timeout=10)
        assert out["rows_flushed"] == 1
        assert table.count_rows("id = 200") == 1
        assert table.lsm_stats()["total_wal_rows"] == 0

    def test_drop_nonempty_requires_force(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        upsert(table, [{"id": 300, "val": "x", "n": 0}])
        with pytest.raises(InvalidInputError):
            table.drop_lsm_spec()
        table.drop_lsm_spec(force=True)
