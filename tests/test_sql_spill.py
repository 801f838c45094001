"""Bounded-memory SQL execution (VERDICT r2 #4): spilling GROUP BY and
Grace hash join give identical results at any budget, with a working
set bounded by batch + partition (reference analog: DataFusion's
external aggregation/joins used by the Shuffler,
rust/lancedb/src/dataloader/permutation/shuffle.rs:32-81)."""

import uuid

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu
from lancedb_tpu.errors import InvalidInputError
from lancedb_tpu.sql_spill import (
    set_sql_memory_budget,
    spilled_group_by,
    spilled_join,
)


@pytest.fixture
def db():
    db = lancedb_tpu.connect(f"memory://spill-{uuid.uuid4().hex}")
    rng = np.random.default_rng(0)
    n = 50_000
    db.create_table("big", {
        "id": np.arange(n),
        "grp": (np.arange(n) * 2654435761 % 97).astype(np.int64),
        "val": rng.standard_normal(n),
        "cat": [f"c{i % 13}" for i in range(n)],
    })
    db.create_table("dims", {
        "g": np.arange(90, dtype=np.int64),
        "w": rng.standard_normal(90),
    })
    yield db
    set_sql_memory_budget(None)


QUERIES = [
    "SELECT grp, count(*) n, sum(val) s, avg(val) a, count(DISTINCT cat) cd "
    "FROM big GROUP BY grp ORDER BY grp",
    "SELECT count(*) n, sum(val) s, min(val) mn, max(val) mx, avg(val) a "
    "FROM big WHERE id < 30000",
    "SELECT b.grp, count(*) n, sum(b.val * d.w) sw FROM big b "
    "JOIN dims d ON b.grp = d.g GROUP BY b.grp ORDER BY b.grp",
    "SELECT count(*) n FROM (SELECT b.id x FROM big b "
    "LEFT OUTER JOIN dims d ON b.grp = d.g WHERE d.w IS NULL) q",
    "SELECT grp, min(cat) mc, max(cat) xc FROM big WHERE grp < 10 "
    "GROUP BY grp HAVING count(*) > 100 ORDER BY grp",
]


class TestBudgetInvariance:
    @pytest.mark.parametrize("q", QUERIES)
    def test_identical_across_budgets(self, db, q):
        ref = db.sql(q).to_pydict()
        set_sql_memory_budget(200_000)  # ~50k rows ≫ budget: forces spill
        got = db.sql(q).to_pydict()
        set_sql_memory_budget(None)
        assert set(ref) == set(got)
        for k in ref:
            if ref[k] and isinstance(ref[k][0], float):
                np.testing.assert_allclose(ref[k], got[k], rtol=1e-9)
            else:
                assert ref[k] == got[k]

    def test_window_over_spilled_aggregation(self, db):
        q = ("SELECT grp, count(*) c, rank() OVER (ORDER BY count(*) DESC) r "
             "FROM big GROUP BY grp ORDER BY grp LIMIT 5")
        ref = db.sql(q).to_pydict()
        set_sql_memory_budget(150_000)
        got = db.sql(q).to_pydict()
        set_sql_memory_budget(None)
        assert ref == got

    def test_invalid_budget_rejected(self):
        with pytest.raises(InvalidInputError):
            set_sql_memory_budget(0)


def _batches(n=40_000, width=2, batch_rows=2_000, seed=3):
    rng = np.random.default_rng(seed)
    key = ((np.arange(n, dtype=np.uint64) * np.uint64(11400714819323198485)) % np.uint64(211)).astype(np.int64)
    val = rng.standard_normal(n)
    tbl = pa.table({"k": key, "v": val})
    return tbl.to_batches(max_chunksize=batch_rows), tbl


class TestWorkingSetBound:
    def test_group_by_partition_bound(self, tmp_path):
        budget = 64 * 1024
        stats = {}
        batches, tbl = _batches()
        out = spilled_group_by(
            batches, ["k"], [("v", "sum"), ([], "count_all")], budget,
            tmp_dir=str(tmp_path), stats=stats,
        )
        assert stats["partitions"] > 1
        # the working set is one batch + one partition; partitions that
        # overflowed recursively split, so none materially exceeds budget
        assert stats["peak_partition_bytes"] <= 2 * budget
        # exactness vs a single-shot aggregate
        ref = tbl.group_by("k").aggregate([("v", "sum"), ([], "count_all")])
        o = out.sort_by("k").to_pydict()
        r = ref.sort_by("k").to_pydict()
        assert o["count_all"] == r["count_all"]
        np.testing.assert_allclose(o["v_sum"], r["v_sum"], rtol=1e-9)

    def test_degenerate_single_key_cannot_split(self, tmp_path):
        # one key owns every row: repartitioning cannot help; the spill
        # recursion must terminate and still produce the exact answer
        n = 20_000
        tbl = pa.table({"k": np.zeros(n, np.int64), "v": np.ones(n)})
        stats = {}
        out = spilled_group_by(
            tbl.to_batches(max_chunksize=1000), ["k"], [("v", "sum")],
            budget_bytes=8 * 1024, tmp_dir=str(tmp_path), stats=stats,
        )
        assert out.num_rows == 1
        assert out.column("v_sum")[0].as_py() == n

    def test_grace_join_bucket_bound(self, tmp_path):
        budget = 64 * 1024
        stats = {}
        lb, lt = _batches(n=30_000, seed=1)
        rb, rt = _batches(n=30_000, seed=2)
        parts = list(spilled_join(
            lb, rb, ["k"], ["k"], "inner", budget,
            right_suffix="_r", tmp_dir=str(tmp_path), stats=stats,
        ))
        assert stats["partitions"] > 1
        joined = pa.concat_tables(parts)
        ref = lt.join(rt, keys=["k"], right_keys=["k"], join_type="inner",
                      right_suffix="_r")
        assert joined.num_rows == ref.num_rows
        np.testing.assert_allclose(
            sorted(joined.column("v").to_pylist())[:100],
            sorted(ref.column("v").to_pylist())[:100],
        )
        # every bucket pair stayed far below the full 30k+30k row join
        assert stats["peak_partition_bytes"] < lt.nbytes + rt.nbytes

    def test_grace_outer_join_preserves_unmatched(self, tmp_path):
        lt = pa.table({"k": np.arange(100, dtype=np.int64), "a": np.arange(100)})
        rt = pa.table({"k": np.arange(50, 150, dtype=np.int64), "b": np.arange(100)})
        parts = list(spilled_join(
            lt.to_batches(), rt.to_batches(), ["k"], ["k"], "full outer",
            budget_bytes=1 << 20, tmp_dir=str(tmp_path),
        ))
        joined = pa.concat_tables(parts)
        assert joined.num_rows == 150
        matched = joined.filter(
            pa.compute.and_(
                pa.compute.is_valid(joined.column("a")),
                pa.compute.is_valid(joined.column("b")),
            )
        )
        assert matched.num_rows == 50


class TestGraceJoinChaining:
    """Review regression: a later outer join over an EMPTY intermediate
    stream synthesizes its left schema instead of erroring — the budget
    changes strategy, never results."""

    def test_outer_join_after_empty_intermediate(self):
        import uuid

        db = lancedb_tpu.connect(f"memory://gjc-{uuid.uuid4().hex}")
        db.create_table("a", {"k": [1, 2]})
        db.create_table("b", {"k": [3, 4]})  # a ⋈ b is empty
        db.create_table("c", {"k2": [9, 9], "u": [5, 6]})
        q = ("SELECT c.u FROM a JOIN b ON a.k = b.k "
             "RIGHT OUTER JOIN c ON a.k = c.k2 ORDER BY c.u")
        ref = db.sql(q).to_pydict()
        set_sql_memory_budget(100_000)
        try:
            got = db.sql(q).to_pydict()
        finally:
            set_sql_memory_budget(None)
        assert ref == got == {"u": [5, 6]}


class TestEmptyScanBudget:
    def test_keyed_group_by_empty_table(self, db):
        import lancedb_tpu

        conn = lancedb_tpu.connect("memory://")
        conn.create_table("empty", pa.table({
            "x": pa.array([], pa.int64()), "y": pa.array([], pa.float64()),
        }), mode="overwrite")
        set_sql_memory_budget(10_000_000)
        try:
            out = conn.sql("SELECT x, count(*) AS c FROM empty GROUP BY x")
            assert out.num_rows == 0
            assert out.column_names == ["x", "c"]
        finally:
            set_sql_memory_budget(None)

    def test_keyed_group_by_where_matches_nothing(self, db):
        import lancedb_tpu

        conn = lancedb_tpu.connect("memory://")
        conn.create_table("t2", pa.table({"x": [1, 1, 2], "y": [1.0, 2.0, 3.0]}), mode="overwrite")
        set_sql_memory_budget(10_000_000)
        try:
            out = conn.sql("SELECT x, sum(y) AS s FROM t2 WHERE y > 99 GROUP BY x")
            assert out.num_rows == 0
        finally:
            set_sql_memory_budget(None)
