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
        assert spec["mode"] == "bucket"
        assert spec["key_columns"] == ["id"]
        assert spec["num_shards"] == 4
        assert spec["maintained_indexes"] == []  # snapshot of (no) indices
        assert spec["writer_config"]["max_entry_rows"] > 0
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


class TestGenerations:
    """MemWAL generation lifecycle (reference merge/lsm.rs + lance
    MemWAL): seal barriers, writer cache, maintained indexes."""

    def test_seal_advances_generation(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        lsm = table._lsm
        upsert(table, [{"id": 1, "val": "a", "n": 0}])
        w = lsm.writer(0)
        assert w.generation == 0
        sealed = w.seal()
        assert sealed == 0 and w.generation == 1
        upsert(table, [{"id": 2, "val": "b", "n": 0}])
        gens = table.lsm_stats()["shards"][0]["generations"]
        assert gens == [0, 1]

    def test_flush_targets_sealed_watermark_only(self, table):
        """Rows written after the checkpoint's seal survive the flush
        (land in the next generation) — the convergence guarantee."""
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        lsm = table._lsm
        upsert(table, [{"id": 100, "val": "old-gen", "n": 0}])
        watermark = lsm.seal_all()
        upsert(table, [{"id": 101, "val": "new-gen", "n": 0}])
        out = lsm.flush(max_generation=watermark)
        assert out["rows_flushed"] == 1
        assert table.count_rows("id = 100") == 1  # folded
        assert table.count_rows("id = 101") == 0  # still in WAL
        assert table.lsm_stats()["total_wal_rows"] == 1

    def test_concurrent_seal_single_winner(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        lsm = table._lsm
        upsert(table, [{"id": 1, "val": "x", "n": 0}])
        w = lsm.writer(0)
        g1 = w.seal()
        # a second sealer of the same generation is a no-op (marker exists)
        from lancedb_tpu.lsm import ShardWriter

        w2 = ShardWriter(lsm._store, lsm._shard_dir(0))
        assert w2.generation == g1 + 1  # discovered the seal

    def test_writer_cache_persists_across_upserts(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        upsert(table, [{"id": 1, "val": "a", "n": 0}])
        upsert(table, [{"id": 2, "val": "b", "n": 0}])
        manifests = table._lsm.writer_manifests()
        assert manifests[0]["entries_written"] == 2
        assert manifests[0]["rows_written"] == 2
        table.close_lsm_writers()
        assert table._lsm.writer_manifests() == {}

    def test_maintained_indexes_validated_and_refreshed(self, mem_db):
        t = mem_db.create_table("t", make_vector_table(200, dim=16))
        t.create_index(index_type="IVF_FLAT", num_partitions=4, name="vi")
        with pytest.raises(InvalidInputError):
            t.set_lsm_write_spec("unsharded", key_columns=["id"],
                                 maintained_indexes=["ghost"])
        t.set_lsm_write_spec("unsharded", key_columns=["id"])
        assert t.describe_lsm_spec()["maintained_indexes"] == ["vi"]
        rows = make_vector_table(5, dim=16, seed=9).to_pylist()
        for i, r in enumerate(rows):
            r["id"] = 1000 + i
        (t.merge_insert("id").when_matched_update_all()
           .when_not_matched_insert_all().use_lsm().execute(rows))
        out = t.flush_lsm()
        assert out["rows_flushed"] == 5
        assert out["indexes_refreshed"] == 1
        assert t.index_stats("vi")["num_unindexed_rows"] == 0

    def test_latest_wins_across_generations(self, table):
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        lsm = table._lsm
        upsert(table, [{"id": 7, "val": "gen0", "n": 0}])
        lsm.seal_all()
        upsert(table, [{"id": 7, "val": "gen1", "n": 0}])
        rows = table.query().use_lsm().where("id = 7").to_arrow().to_pylist()
        assert rows == [{"id": 7, "val": "gen1", "n": 0}]

    def test_last_write_wins_across_writer_restart(self, table):
        """A fresh ShardWriter (process restart / cache drain) must not
        rank its new entries BEFORE older ones within the same
        generation — review finding: counter-based names restarted at 0
        and silently lost the newest value."""
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        upsert(table, [{"id": 7, "val": "first", "n": 0}])
        upsert(table, [{"id": 7, "val": "second", "n": 0}])
        table.close_lsm_writers()  # simulate restart: fresh writer
        upsert(table, [{"id": 7, "val": "newest", "n": 0}])
        rows = table.query().use_lsm().where("id = 7").to_arrow().to_pylist()
        assert rows == [{"id": 7, "val": "newest", "n": 0}]
        out = table.flush_lsm()
        assert table.count_rows("val = 'newest'") == 1

    def test_idle_flush_mints_no_markers(self, table):
        """Flushing an idle table must not seal empty generations
        forever (review finding: unbounded SEAL_/FLUSHED_ markers)."""
        table.set_lsm_write_spec("unsharded", key_columns=["id"])
        upsert(table, [{"id": 1, "val": "x", "n": 0}])
        table.flush_lsm()
        lsm = table._lsm
        gen_before = lsm.writer(0).generation
        for _ in range(5):
            out = table.flush_lsm()
            assert out["rows_flushed"] == 0
        assert lsm.writer(0).generation == gen_before
        markers = [
            p for p in lsm._store.list(lsm._shard_dir(0))
            if p.rsplit("/", 1)[-1].startswith("SEAL_")
        ]
        assert len(markers) == 1  # only the one real seal
