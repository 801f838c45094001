"""Streaming to_batches + order_by on every query surface
(reference QueryExecutionOptions max_batch_length/timeout,
query.rs:626-648; QueryRequest.order_by, query.rs:818-887)."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import make_vector_table


@pytest.fixture
def tbl(tmp_db):
    t = tmp_db.create_table("t", make_vector_table(n=300, dim=8))
    # several fragments so streaming crosses fragment boundaries
    t.add(make_vector_table(n=300, dim=8, seed=1))
    t.add(make_vector_table(n=300, dim=8, seed=2))
    return t


def test_scan_to_batches_streams_bounded_batches(tbl):
    batches = list(tbl.search(None).to_batches(max_batch_length=128))
    assert all(b.num_rows <= 128 for b in batches)
    assert sum(b.num_rows for b in batches) == 900
    got = pa.Table.from_batches(batches)
    want = tbl.search(None).to_arrow()
    assert got.equals(want)


def test_scan_to_batches_with_filter_limit_offset(tbl):
    batches = list(
        tbl.search(None)
        .where("price < 50")
        .select(["id", "price"])
        .offset(5)
        .limit(40)
        .to_batches(max_batch_length=16)
    )
    got = pa.Table.from_batches(batches)
    want = (
        tbl.search(None).where("price < 50").select(["id", "price"]).offset(5).limit(40).to_arrow()
    )
    assert got.equals(want)
    assert all(b.num_rows <= 16 for b in batches)


def test_scan_to_batches_never_materializes_all(tbl, monkeypatch):
    """The plain-scan streaming path must not call Dataset.to_table."""
    from lancedb_tpu.storage.dataset import Dataset

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("streaming scan must not materialize via to_table")

    monkeypatch.setattr(Dataset, "to_table", boom)
    n = sum(b.num_rows for b in tbl.search(None).to_batches(max_batch_length=64))
    assert n == 900


def test_to_batches_timeout_zero(tbl):
    with pytest.raises(TimeoutError):
        list(tbl.search(None).to_batches(max_batch_length=1, timeout=0.0))


def test_order_by_on_vector_search(tbl):
    q = np.zeros(8, dtype=np.float32)
    out = tbl.search(q).limit(20).order_by("price").to_arrow()
    prices = out.column("price").to_pylist()
    assert prices == sorted(prices)
    assert out.num_rows == 20
    out_desc = tbl.search(q).limit(20).order_by(("price", "desc")).to_arrow()
    assert out_desc.column("price").to_pylist() == sorted(prices, reverse=True)


def test_order_by_on_fts(tmp_db):
    t = tmp_db.create_table(
        "docs",
        pa.table(
            {
                "text": pa.array(["quick fox", "quick dog", "quick cat"]),
                "rank": pa.array([2, 0, 1]),
            }
        ),
    )
    t.create_fts_index("text")
    out = t.search("quick").order_by("rank").to_arrow()
    assert out.column("rank").to_pylist() == [0, 1, 2]


def test_order_by_on_hybrid(tmp_db):
    n, d = 64, 8
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t = tmp_db.create_table(
        "h",
        pa.table(
            {
                "text": pa.array([f"word{i % 5} common" for i in range(n)]),
                "rank": pa.array(np.arange(n)[::-1].copy()),
                "vector": pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), d),
            }
        ),
    )
    t.create_fts_index("text")
    out = (
        t.search((vecs[3], "common"), query_type="hybrid")
        .limit(10)
        .order_by("rank")
        .to_arrow()
    )
    ranks = out.column("rank").to_pylist()
    assert ranks == sorted(ranks)


def test_search_to_batches_chunking(tbl):
    q = np.zeros(8, dtype=np.float32)
    batches = list(tbl.search(q).limit(30).to_batches(max_batch_length=7))
    assert sum(b.num_rows for b in batches) == 30
    assert all(b.num_rows <= 7 for b in batches)


class TestColumnOrdering:
    """order_by with ColumnOrdering nulls placement (reference
    query.py:361)."""

    def test_nulls_first_on_scan_and_search(self, mem_db):
        import numpy as np
        import pyarrow as pa

        from lancedb_tpu.query import ColumnOrdering

        t = mem_db.create_table("co", {
            "id": [1, 2, 3], "v": pa.array([5, None, 2], pa.int64()),
            "vector": [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]],
        }, mode="overwrite")
        r = t.search(None).order_by(ColumnOrdering("v", nulls_first=True)).to_arrow()
        assert r.column("v").to_pylist() == [None, 2, 5]
        r = t.search(None).order_by(ColumnOrdering("v", ascending=False)).to_arrow()
        assert r.column("v").to_pylist() == [5, 2, None]
        r = (t.search(np.array([1.0, 0.0], np.float32)).limit(3)
             .order_by(ColumnOrdering("v", nulls_first=True)).to_arrow())
        assert r.column("v").to_pylist() == [None, 2, 5]
