"""Blob column tests (reference test_blob.py / blob_integration.rs)."""

import io

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.blob import blob_field, is_blob_field
from lancedb_tpu.errors import InvalidInputError


@pytest.fixture(params=["mem", "tmp"])
def db(request, tmp_path):
    import uuid

    import lancedb_tpu

    if request.param == "mem":
        return lancedb_tpu.connect(f"memory://{uuid.uuid4().hex}")
    return lancedb_tpu.connect(str(tmp_path / "db"))


PAYLOADS = [b"hello world", b"\x00\x01\x02" * 1000, None, b"last blob"]


@pytest.fixture
def blob_table(db):
    schema = pa.schema(
        [pa.field("id", pa.int64()), blob_field("media")]
    )
    t = db.create_table("b", schema=schema)
    t.add([{"id": i, "media": p} for i, p in enumerate(PAYLOADS)])
    return t


class TestBlob:
    def test_schema_is_descriptor(self, blob_table):
        f = blob_table.schema.field("media")
        assert is_blob_field(f)
        assert pa.types.is_struct(f.type)

    def test_scan_returns_descriptors(self, blob_table):
        out = blob_table.to_arrow()
        descs = out.column("media").to_pylist()
        assert descs[0]["size"] == len(PAYLOADS[0])
        assert descs[2] is None or descs[2]["file"] is None

    def test_fetch_blobs(self, blob_table):
        rids = blob_table.query().with_row_id(True).to_arrow().column("_rowid").to_pylist()
        blobs = blob_table.fetch_blobs("media", rids)
        assert blobs[0] == PAYLOADS[0]
        assert blobs[1] == PAYLOADS[1]
        assert blobs[2] is None
        assert blobs[3] == PAYLOADS[3]

    def test_blob_file_seek_read(self, blob_table):
        rids = blob_table.query().with_row_id(True).to_arrow().column("_rowid").to_pylist()
        bf = blob_table.fetch_blob_files("media", [rids[0]])[0]
        assert bf.size() == len(PAYLOADS[0])
        assert bf.read(5) == b"hello"
        assert bf.tell() == 5
        bf.seek(6)
        assert bf.read() == b"world"
        bf.seek(-5, io.SEEK_END)
        assert bf.read() == b"world"
        with bf:
            pass
        assert bf.closed

    def test_fetch_blob_ranges(self, blob_table):
        rids = blob_table.query().with_row_id(True).to_arrow().column("_rowid").to_pylist()
        parts = blob_table.fetch_blob_ranges("media", [rids[0], rids[3]], [(0, 5), (5, 4)])
        assert parts[0] == b"hello"
        assert parts[1] == b"blob"

    def test_multiple_appends_separate_files(self, blob_table):
        blob_table.add([{"id": 10, "media": b"second batch"}])
        rids = blob_table.query().where("id = 10").with_row_id(True).to_arrow()
        blobs = blob_table.fetch_blobs("media", rids.column("_rowid").to_pylist())
        assert blobs[0] == b"second batch"

    def test_non_blob_column_rejected(self, blob_table):
        with pytest.raises(InvalidInputError):
            blob_table.fetch_blobs("id", [0])

    def test_search_with_blob_table(self, db):
        schema = pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field("vector", pa.list_(pa.float32(), 4)),
                blob_field("payload"),
            ]
        )
        t = db.create_table("bv", schema=schema)
        t.add(
            [
                {"id": i, "vector": [float(i)] * 4, "payload": f"blob-{i}".encode()}
                for i in range(10)
            ]
        )
        res = t.search(np.zeros(4, np.float32)).limit(2).with_row_id(True).to_arrow()
        assert res.column("id")[0].as_py() == 0
        blobs = t.fetch_blobs("payload", res.column("_rowid").to_pylist())
        assert blobs[0] == b"blob-0"


class TestBlobRangeValidation:
    def test_invalid_ranges_rejected(self, mem_db):
        import pyarrow as pa
        import pytest as _pytest

        from lancedb_tpu.blob import blob_field
        from lancedb_tpu.errors import InvalidInputError

        schema = pa.schema([pa.field("id", pa.int64()), blob_field("p")])
        t = mem_db.create_table("brv", schema=schema, mode="overwrite")
        t.add([{"id": 1, "p": b"abcdef"}])
        with _pytest.raises(InvalidInputError, match="non-negative"):
            t.fetch_blob_ranges("p", [0], [(-1, 2)])
        with _pytest.raises(InvalidInputError, match="ranges"):
            t.fetch_blob_ranges("p", [0], [(0, 1), (1, 1)])
        assert t.fetch_blob_ranges("p", [0], [(1, 3)]) == [b"bcd"]
