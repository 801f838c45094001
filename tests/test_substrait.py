"""Substrait filter ingestion (VERDICT r3 #9): round trip from
pyarrow's substrait serializer through where() — reference QueryFilter
accepts Sql | Substrait | Datafusion (rust/lancedb/src/query.rs:792-812).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import lancedb_tpu
from lancedb_tpu.errors import InvalidInputError
from lancedb_tpu.filters.substrait import substrait_to_sql

ps = pytest.importorskip("pyarrow.substrait")


SCHEMA = pa.schema([
    ("id", pa.int64()), ("cat", pa.int64()), ("x", pa.float64()),
    ("name", pa.string()), ("ok", pa.bool_()),
])


def blob(expr):
    return ps.serialize_expressions([expr], ["filter"], SCHEMA)


@pytest.fixture(scope="module")
def tbl():
    db = lancedb_tpu.connect("memory://substrait")
    rng = np.random.default_rng(5)
    n = 200
    return db.create_table("t", pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "cat": pa.array(np.arange(n, dtype=np.int64) % 7),
        "x": pa.array(rng.random(n)),
        "name": pa.array([f"n{i % 13}" for i in range(n)]),
        "ok": pa.array([i % 2 == 0 for i in range(n)]),
        "vector": pa.FixedSizeListArray.from_arrays(
            pa.array(rng.random(n * 8, dtype=np.float32).ravel()), 8
        ),
    }))


@pytest.mark.parametrize("expr,sql", [
    ((pc.field("cat") == 3) & (pc.field("x") > 0.5), "cat = 3 AND x > 0.5"),
    ((pc.field("name") == "n1") | ~pc.field("ok"), "name = 'n1' OR NOT ok"),
    (pc.field("x").is_null(), "x IS NULL"),
    (pc.field("cat").isin([1, 2, 3]), "cat IN (1, 2, 3)"),
    (pc.field("cat") != 2, "cat != 2"),
    ((pc.field("cat") >= 1) & (pc.field("cat") <= 5), "cat >= 1 AND cat <= 5"),
    (pc.field("ok") == True, "ok = TRUE"),  # noqa: E712
    (pc.field("x").is_valid(), "x IS NOT NULL"),
])
def test_roundtrip_matches_sql(tbl, expr, sql):
    via_substrait = (
        tbl.search().where(blob(expr)).limit(1000).to_arrow().column("id").to_pylist()
    )
    via_sql = (
        tbl.search().where(sql).limit(1000).to_arrow().column("id").to_pylist()
    )
    assert sorted(via_substrait) == sorted(via_sql)
    assert len(via_sql) > 0 or "IS NULL" in sql


def test_substrait_prefilter_on_vector_search(tbl):
    expr = pc.field("cat") == 4
    q = np.zeros(8, dtype=np.float32)
    out = tbl.search(q).where(blob(expr)).limit(5).to_arrow()
    assert out.num_rows == 5
    assert all(c == 4 for c in out.column("cat").to_pylist())


def test_substrait_composes_with_sql(tbl):
    out = (
        tbl.search().where(blob(pc.field("cat") == 3)).where("id < 50")
        .limit(1000).to_arrow()
    )
    ids = out.column("id").to_pylist()
    assert ids and all(i < 50 and i % 7 == 3 for i in ids)


def test_string_escaping_roundtrip():
    schema = pa.schema([("name", pa.string())])
    buf = ps.serialize_expressions(
        [pc.field("name") == "a'b\"c\\d"], ["f"], schema
    )
    sql = substrait_to_sql(buf)
    assert sql == "(`name` = 'a''b\"c\\d')"


def test_unsupported_substrait_rejected():
    schema = pa.schema([("ts", pa.timestamp("us"))])
    buf = ps.serialize_expressions(
        [pc.field("ts") == pa.scalar(0, pa.timestamp("us"))], ["f"], schema
    )
    with pytest.raises(InvalidInputError):
        substrait_to_sql(buf)


def test_garbage_blob_rejected(tbl):
    with pytest.raises(InvalidInputError, match="substrait"):
        tbl.search().where(b"not a substrait plan")
