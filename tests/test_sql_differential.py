"""Differential SQL testing against sqlite3 (scripts/fuzz_sql_diff.py):
random valid queries over the shared subset must agree row-for-row.
The reference gets DataFusion's full dialect for free (reference
table/datafusion.rs:37-44); this is our independent-oracle check that
the in-repo engine implements the same semantics."""

import sys

import pyarrow as pa
import pytest

sys.path.insert(0, "scripts")

from fuzz_sql_diff import fuzz  # noqa: E402


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_differential_vs_sqlite(seed):
    failures = fuzz(150, seed)
    assert not failures, failures[:5]


class TestFuzzFoundRegressions:
    """Bugs the differential fuzzer caught, pinned as unit tests."""

    @pytest.fixture()
    def db(self):
        import lancedb_tpu

        conn = lancedb_tpu.connect("memory://")
        conn.create_table("t", pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array([3, None, 8], pa.int64()),
        }), mode="overwrite")
        return conn

    def test_in_list_negative_literals(self, db):
        out = db.sql("SELECT id FROM t WHERE id IN (-1, 2, -3)").to_pydict()
        assert out["id"] == [2]

    def test_not_in_null_lhs_is_filtered(self, db):
        # NULL NOT IN (8, 2) is NULL, not TRUE
        out = db.sql("SELECT b FROM t WHERE b NOT IN (8, 2)").to_pydict()
        assert out["b"] == [3]

    def test_in_list_with_null_member(self, db):
        assert db.sql("SELECT b FROM t WHERE b IN (8, NULL)").to_pydict()["b"] == [8]
        # x NOT IN (..., NULL) is never TRUE
        assert db.sql("SELECT b FROM t WHERE b NOT IN (8, NULL)").to_pydict()["b"] == []

    def test_case_on_empty_input_is_typed(self, db):
        # zero-row input: CASE output must carry the branch type so
        # downstream kernels (coalesce/equal) find a matching signature
        out = db.sql(
            "SELECT coalesce(b, CASE WHEN 3 < id THEN id ELSE id END) AS e "
            "FROM t WHERE id IS NULL"
        )
        assert out.num_rows == 0
        assert out.schema.field("e").type == pa.int64()


@pytest.mark.parametrize("seed", [12])
def test_differential_with_scalar_indexes(seed):
    """Same oracle check with BTree/Bitmap indexes on every t1 column:
    the WHERE pushdown path must return scan-identical results."""
    failures = fuzz(150, seed, indexes=True)
    assert not failures, failures[:5]


class TestBitmapNulls:
    def test_bitmap_index_on_nullable_strings(self):
        import lancedb_tpu

        conn = lancedb_tpu.connect("memory://")
        t = conn.create_table("bm", pa.table({
            "id": pa.array([0, 1, 2, 3], pa.int64()),
            "s": pa.array(["x", None, "y", None], pa.string()),
        }), mode="overwrite")
        t.create_scalar_index("s", index_type="BITMAP")  # used to crash
        assert {r["id"] for r in t.search(None).where("s = 'x'").to_list()} == {0}
        assert {r["id"] for r in t.search(None).where("s IS NULL").to_list()} == {1, 3}
        assert {r["id"] for r in t.search(None).where("s IS NOT NULL").to_list()} == {0, 2}
