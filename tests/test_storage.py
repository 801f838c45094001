"""Storage layer tests: fragments, manifest MVCC, deletion vectors,
time travel, tags, branches, schema evolution.

Modeled on the reference's python test suite structure
(python/python/tests/test_table.py versioning/tags tests).
"""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.errors import (
    CommitConflictError,
    InvalidInputError,
    TagNotFoundError,
    VersionNotFoundError,
)
from lancedb_tpu.io.object_store import LocalStore, MemoryStore
from lancedb_tpu.storage.dataset import Dataset


def simple_table(n=10, start=0):
    return pa.table(
        {
            "a": pa.array(np.arange(start, start + n, dtype=np.int64)),
            "b": pa.array([f"s{i}" for i in range(start, start + n)]),
        }
    )


@pytest.fixture(params=["local", "memory"])
def store_root(request, tmp_path):
    if request.param == "local":
        return LocalStore(), str(tmp_path / "tbl.lance")
    return MemoryStore(), "tbl.lance"


def test_create_and_read(store_root):
    store, root = store_root
    data = simple_table(25)
    ds = Dataset.create(store, root, data.schema, data)
    assert ds.version == 1
    assert ds.count_rows() == 25
    out = ds.to_table()
    assert out.equals(data)


def test_append_and_versions(store_root):
    store, root = store_root
    data = simple_table(10)
    ds = Dataset.create(store, root, data.schema, data)
    ds.append(simple_table(5, start=10))
    assert ds.version == 2
    assert ds.count_rows() == 15
    ds2 = Dataset.open(store, root)
    assert ds2.count_rows() == 15
    versions = ds.list_versions()
    assert [v.version for v in versions] == [1, 2]
    assert versions[1].transaction["op"] == "append"


def test_filter_and_projection(store_root):
    store, root = store_root
    data = simple_table(100)
    ds = Dataset.create(store, root, data.schema, data)
    out = ds.to_table(columns=["a"], predicate="a >= 90")
    assert out.num_rows == 10
    assert out.column_names == ["a"]
    assert ds.count_rows("a < 5 OR a >= 95") == 10
    out = ds.to_table(predicate="b IN ('s3', 's7')")
    assert out.num_rows == 2


def test_limit_offset(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(50).schema, simple_table(50))
    out = ds.to_table(limit=10, offset=5)
    assert out.column("a").to_pylist() == list(range(5, 15))


def test_row_ids_and_take(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(20).schema, simple_table(20))
    ds.append(simple_table(20, start=20))
    out = ds.to_table(with_row_id=True)
    assert "_rowid" in out.column_names
    rids = out.column("_rowid").to_numpy()
    taken = ds.take_rows(rids[[5, 30, 1]])
    assert taken.column("a").to_pylist() == [5, 30, 1]
    by_offset = ds.take_offsets(np.array([0, 39, 20]))
    assert by_offset.column("a").to_pylist() == [0, 39, 20]


def test_delete(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(30).schema, simple_table(30))
    n = ds.delete("a % 3 = 0")
    assert n == 10
    assert ds.count_rows() == 20
    assert ds.count_rows("a % 3 = 0") == 0
    # delete everything remaining in a fragment drops the fragment
    ds.delete("a < 100")
    assert ds.count_rows() == 0
    assert len(ds.manifest.fragments) == 0


def test_delete_then_take_offsets(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(10).schema, simple_table(10))
    ds.delete("a = 3")
    out = ds.take_offsets(np.array([3]))
    assert out.column("a").to_pylist() == [4]  # logical offset skips deleted


def test_update(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(10).schema, simple_table(10))
    stats = ds.update({"a": "a + 100"}, where="a >= 5")
    assert stats["rows_updated"] == 5
    vals = sorted(ds.to_table().column("a").to_pylist())
    assert vals == [0, 1, 2, 3, 4, 105, 106, 107, 108, 109]


def test_time_travel_checkout_restore(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(10).schema, simple_table(10))
    ds.append(simple_table(10, start=10))
    v2 = ds.version
    ds.delete("a < 5")
    assert ds.count_rows() == 15
    ds.checkout(v2)
    assert ds.count_rows() == 20
    with pytest.raises(InvalidInputError):
        ds.append(simple_table(1))
    ds.restore()
    assert ds.count_rows() == 20
    assert ds.version > v2
    ds.checkout_latest()
    assert ds.count_rows() == 20


def test_tags(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(5).schema, simple_table(5))
    ds.create_tag("v1-release")
    ds.append(simple_table(5, start=5))
    assert ds.tag_version("v1-release") == 1
    ds2 = Dataset.open(store, root, tag="v1-release")
    assert ds2.count_rows() == 5
    ds.update_tag("v1-release", ds.version)
    assert ds.tag_version("v1-release") == ds.version
    ds.delete_tag("v1-release")
    with pytest.raises(TagNotFoundError):
        ds.tag_version("v1-release")


def test_branches(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(10).schema, simple_table(10))
    ds.create_branch("experiment")
    br = Dataset.open(store, root, branch="experiment")
    br.append(simple_table(10, start=10))
    assert br.count_rows() == 20
    # main unaffected
    main = Dataset.open(store, root)
    assert main.count_rows() == 10
    assert set(br.list_branches()) == {"main", "experiment"}
    br.delete_branch("experiment")


def test_schema_evolution(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(10).schema, simple_table(10))
    ds.add_columns({"doubled": "a * 2"})
    assert "doubled" in ds.schema.names
    assert ds.to_table().column("doubled").to_pylist() == [i * 2 for i in range(10)]
    ds.alter_columns({"path": "doubled", "rename": "twice"})
    assert "twice" in ds.schema.names and "doubled" not in ds.schema.names
    ds.alter_columns({"path": "twice", "data_type": pa.float32()})
    assert ds.schema.field("twice").type == pa.float32()
    ds.drop_columns(["twice"])
    assert "twice" not in ds.schema.names
    assert ds.to_table().column_names == ["a", "b"]


def test_commit_conflict_rebase(store_root):
    """Two writers appending concurrently both succeed via rebase."""
    store, root = store_root
    ds1 = Dataset.create(store, root, simple_table(5).schema, simple_table(5))
    ds2 = Dataset.open(store, root)
    ds1.append(simple_table(5, start=5))
    ds2.append(simple_table(5, start=10))  # forces rebase path
    final = Dataset.open(store, root)
    assert final.count_rows() == 15
    assert sorted(final.to_table().column("a").to_pylist()) == list(range(15))


def test_compact_files(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(5).schema, simple_table(5))
    for i in range(1, 5):
        ds.append(simple_table(5, start=5 * i))
    assert len(ds.manifest.fragments) == 5
    res = ds.compact_files(target_rows=100)
    assert res["fragments_removed"] == 5
    assert len(ds.manifest.fragments) == 1
    assert ds.count_rows() == 25
    assert sorted(ds.to_table().column("a").to_pylist()) == list(range(25))


def test_prune_versions(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(5).schema, simple_table(5))
    for i in range(1, 4):
        ds.append(simple_table(5, start=5 * i))
    res = ds.prune_versions(keep_latest=1)
    assert res["old_versions_removed"] == 3
    with pytest.raises(VersionNotFoundError):
        Dataset.open(store, root, version=1)
    assert Dataset.open(store, root).count_rows() == 20


def test_overwrite(store_root):
    store, root = store_root
    ds = Dataset.create(store, root, simple_table(10).schema, simple_table(10))
    new = pa.table({"x": pa.array([1.5, 2.5])})
    ds.overwrite(new)
    assert ds.schema.names == ["x"]
    assert ds.count_rows() == 2
    # old version still readable
    old = Dataset.open(store, root, version=1)
    assert old.schema.names == ["a", "b"]


class TestFsspecStore:
    """FsspecStore conformance via fsspec's built-in memory filesystem
    (the same adapter serves s3/gs/az when their impls are installed)."""

    @pytest.fixture
    def fstore(self):
        from lancedb_tpu.io.object_store import FsspecStore

        s = FsspecStore("memory")
        s.fs.store.clear()
        return s

    def test_roundtrip_and_ranges(self, fstore):
        fstore.write_bytes("/a/b.bin", b"hello world")
        assert fstore.read_bytes("/a/b.bin") == b"hello world"
        assert fstore.read_range("/a/b.bin", 6, 5) == b"world"
        assert fstore.size("/a/b.bin") == 11
        assert fstore.exists("/a/b.bin") and not fstore.exists("/a/c.bin")

    def test_put_if_absent_commit_primitive(self, fstore):
        assert fstore.put_if_absent("/m/1.json", b"v1") is True
        assert fstore.put_if_absent("/m/1.json", b"v2") is False
        assert fstore.read_bytes("/m/1.json") == b"v1"

    def test_list_and_delete(self, fstore):
        for i in range(3):
            fstore.write_bytes(f"/d/f{i}", b"x")
        assert len(list(fstore.list("/d"))) == 3
        fstore.delete("/d/f0")
        fstore.delete("/d/f0")  # idempotent
        assert len(list(fstore.list("/d"))) == 2

    def test_full_dataset_lifecycle_over_fsspec(self, fstore):
        """Dataset MVCC (create/append/delete/time-travel) on an fsspec
        filesystem — the commit path a cloud bucket would serve."""
        tbl = simple_table(20)
        ds = Dataset.create(fstore, "/db/t.lance", tbl.schema, tbl)
        v1 = ds.version
        ds.append(simple_table(5, start=100))
        assert ds.count_rows() == 25
        ds.delete("a >= 100")
        assert ds.count_rows() == 20
        old = Dataset.open(fstore, "/db/t.lance", version=v1)
        assert old.count_rows() == 20


class TestParallelFragmentWrites:
    def test_multi_fragment_append_order_preserved(self, tmp_path):
        """Appends larger than max_rows_per_fragment write fragments in
        parallel; row order and ids must match a serial write."""
        import numpy as np
        import pyarrow as pa

        from lancedb_tpu.io.object_store import LocalStore
        from lancedb_tpu.storage.dataset import Dataset

        n = 10_000
        tbl = pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})
        store = LocalStore(str(tmp_path))
        ds = Dataset.create(store, "t.lance", tbl.schema, None)
        ds.append(tbl, max_rows_per_fragment=1000)
        assert len(ds.manifest.fragments) == 10
        assert [f.physical_rows for f in ds.manifest.fragments] == [1000] * 10
        out = ds.to_table(columns=["id"])
        assert out.column("id").to_pylist() == list(range(n))
        # fragment ids are dense and ordered
        assert [f.id for f in ds.manifest.fragments] == sorted(
            f.id for f in ds.manifest.fragments
        )
        assert len({f.id for f in ds.manifest.fragments}) == 10


class TestStreamingIngest:
    """append_stream: unbounded batch sources land in bounded memory
    with one atomic commit (reference add_data.rs streaming inserts)."""

    def test_reader_streams_in_bounded_fragments(self, tmp_path):
        import numpy as np
        import pyarrow as pa

        from lancedb_tpu.io.object_store import LocalStore
        from lancedb_tpu.storage.dataset import Dataset

        schema = pa.schema([("id", pa.int64())])
        store = LocalStore(str(tmp_path))
        ds = Dataset.create(store, "t.lance", schema, None)

        def gen():
            for i in range(0, 5000, 137):  # ragged batches
                n = min(137, 5000 - i)
                yield pa.record_batch([pa.array(np.arange(i, i + n))], schema=schema)

        reader = pa.RecordBatchReader.from_batches(schema, gen())
        rows = ds.append_stream(reader, max_rows_per_fragment=1000)
        assert rows == 5000
        assert ds.count_rows() == 5000
        frags = ds.manifest.fragments
        assert len(frags) == 5
        assert all(f.physical_rows == 1000 for f in frags)
        # single commit: one version past the create
        assert len(ds.list_versions()) == 2
        out = ds.to_table(columns=["id"]).column("id").to_pylist()
        assert out == list(range(5000))

    def test_table_add_routes_readers(self, mem_db):
        import numpy as np
        import pyarrow as pa

        schema = pa.schema([
            ("id", pa.int64()),
            ("vector", pa.list_(pa.float32(), 4)),
        ])
        t = mem_db.create_table("t", schema=schema)
        rng = np.random.default_rng(0)

        def gen():
            for i in range(4):
                vecs = rng.standard_normal((50, 4)).astype(np.float32)
                yield pa.record_batch([
                    pa.array(np.arange(i * 50, i * 50 + 50)),
                    pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), 4),
                ], schema=schema)

        t.add(pa.RecordBatchReader.from_batches(schema, gen()))
        assert t.count_rows() == 200

    def test_generator_input(self, mem_db):
        import pyarrow as pa

        schema = pa.schema([("id", pa.int64())])
        t = mem_db.create_table("t", schema=schema)
        t.add(pa.record_batch([pa.array([i])], schema=schema) for i in range(5))
        assert t.count_rows() == 5
