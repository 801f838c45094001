"""Scalar index tests: BTree/Bitmap/LabelList lookups + prefilter
acceleration equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.filters.sql import parse_sql_expr
from lancedb_tpu.index.scalar import ScalarIndexReader, try_scalar_prefilter
from lancedb_tpu.query import compute_allowed_rowids

from conftest import make_vector_table


@pytest.fixture
def table(mem_db):
    t = mem_db.create_table("t", make_vector_table(500))
    return t


class TestScalarIndexes:
    def test_btree_range_lookup(self, table):
        table.create_scalar_index("id", index_type="BTREE", replace=True)
        ix = table._dataset.manifest.indices[0]
        r = ScalarIndexReader(table._dataset.store, table._dataset.index_dir(ix.uuid), ix)
        rids = r.lookup_range(10, 19)
        assert len(rids) == 10
        assert len(r.lookup_eq(42)) == 1
        assert len(r.lookup_range(lo=490, lo_incl=False)) == 9

    def test_bitmap_lookup(self, table):
        table.create_scalar_index("label", index_type="BITMAP")
        ix = table._dataset.manifest.index_by_name("label_idx")
        r = ScalarIndexReader(table._dataset.store, table._dataset.index_dir(ix.uuid), ix)
        rids = r.lookup_eq("item-3")
        assert len(rids) == len([i for i in range(500) if i % 7 == 3])
        assert len(r.lookup_in(["item-0", "item-1"])) == len(
            [i for i in range(500) if i % 7 in (0, 1)]
        )

    def test_label_list(self, mem_db):
        tbl = pa.table(
            {
                "id": pa.array(range(6)),
                "tags": pa.array([["a"], ["a", "b"], ["b"], [], ["c"], ["a", "c"]]),
            }
        )
        t = mem_db.create_table("ll", tbl)
        t.create_scalar_index("tags", index_type="LABEL_LIST")
        ix = t._dataset.manifest.indices[0]
        r = ScalarIndexReader(t._dataset.store, t._dataset.index_dir(ix.uuid), ix)
        assert len(r.lookup_eq("a")) == 3
        assert len(r.lookup_eq("c")) == 2

    def test_prefilter_equivalence(self, table):
        """Index-resolved prefilter == scan-resolved prefilter."""
        preds = [
            "id = 7",
            "id >= 100 AND id < 150",
            "id BETWEEN 5 AND 9",
            "id IN (1, 3, 999)",
            "id < 10 OR id > 490",
        ]
        scan_results = {p: compute_allowed_rowids(table, p) for p in preds}
        table.create_scalar_index("id", index_type="BTREE")
        for p in preds:
            ast = parse_sql_expr(p)
            fast = try_scalar_prefilter(table, ast)
            assert fast is not None, f"{p} should resolve via the BTree"
            np.testing.assert_array_equal(np.sort(fast), scan_results[p])

    def test_prefilter_declines_when_stale(self, table):
        table.create_scalar_index("id", index_type="BTREE")
        table.add(make_vector_table(10, seed=9))  # new fragment → stale coverage
        ast = parse_sql_expr("id = 7")
        assert try_scalar_prefilter(table, ast) is None

    def test_search_with_indexed_prefilter(self, table):
        table.create_scalar_index("id", index_type="BTREE")
        table.create_index(index_type="IVF_FLAT", num_partitions=8, name="vec")
        res = table.search(np.zeros(16, np.float32)).where("id BETWEEN 50 AND 59").limit(20).to_arrow()
        ids = res.column("id").to_pylist()
        assert len(ids) == 10 and all(50 <= i <= 59 for i in ids)


class TestFmIndex:
    @pytest.fixture
    def text_table(self, mem_db):
        docs = [
            "the quick brown fox", "jumped over the lazy dog",
            "pack my box with five dozen jugs", "sphinx of black quartz",
            "quick silver lining", "foxtrot uniform", "", "boxing day",
        ]
        data = pa.table({
            "id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(np.random.default_rng(0).standard_normal(len(docs) * 4).astype(np.float32)),
                4,
            ),
        })
        return mem_db.create_table("txt", data)

    def _reader(self, table):
        ix = table._dataset.manifest.index_by_name("text_idx")
        return ScalarIndexReader(table._dataset.store, table._dataset.index_dir(ix.uuid), ix)

    def test_substring(self, text_table):
        text_table.create_scalar_index("text", index_type="FM")
        r = self._reader(text_table)
        hits = r.lookup_like("%ox%")  # fox, box, foxtrot, boxing
        docs = text_table.to_arrow().column("text").to_pylist()
        expect = sorted(i for i, d in enumerate(docs) if "ox" in d)
        got = sorted((hits & np.uint64(0xFFFFFFFF)).astype(int).tolist())
        assert got == expect

    def test_prefix_suffix_exact(self, text_table):
        text_table.create_scalar_index("text", index_type="FM")
        r = self._reader(text_table)
        assert len(r.lookup_like("quick%")) == 1     # prefix-anchored
        assert len(r.lookup_like("%dog")) == 1       # suffix-anchored
        assert len(r.lookup_like("boxing day")) == 1  # exact
        assert len(r.lookup_like("%zebra%")) == 0
        assert r.lookup_like("%qu_ck%") is None      # '_' needs a scan

    def test_like_prefilter_equivalence(self, text_table):
        pred = "text LIKE '%box%'"
        scan = compute_allowed_rowids(text_table, pred)
        text_table.create_scalar_index("text", index_type="FM")
        fast = try_scalar_prefilter(text_table, parse_sql_expr(pred))
        assert fast is not None
        np.testing.assert_array_equal(np.sort(fast), scan)

    def test_search_with_fm_prefilter(self, text_table):
        text_table.create_scalar_index("text", index_type="FM")
        res = (
            text_table.search(np.zeros(4, np.float32))
            .where("text LIKE '%quick%'").limit(10).to_arrow()
        )
        assert sorted(res.column("id").to_pylist()) == [0, 4]
