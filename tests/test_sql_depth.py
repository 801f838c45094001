"""Window functions, CTEs, and correlated subqueries (VERDICT r2 #3).

Reference surface: the DataFusion 54 dialect the reference exposes by
registering BaseTable as a TableProvider
(reference rust/lancedb/src/table/datafusion.rs:37-44).
"""

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu
from lancedb_tpu.errors import InvalidInputError, SqlParseError
from lancedb_tpu.sql import explain_select, parse_select


@pytest.fixture
def db():
    import uuid

    db = lancedb_tpu.connect(f"memory://sqldepth-{uuid.uuid4().hex}")
    db.create_table("emp", {
        "id": list(range(10)),
        "dept": ["a", "a", "a", "b", "b", "b", "c", "c", "c", "c"],
        "salary": [10, 20, 20, 5, 15, 25, 1, 2, 3, None],
    })
    db.create_table("dept", {
        "name": ["a", "b", "c", "d"], "budget": [100, 40, 5, 0],
    })
    return db


def run(db, q):
    return db.sql(q).to_pydict()


# ---------------------------------------------------------------- windows


class TestWindowFunctions:
    def test_row_number_partitioned(self, db):
        out = run(db, "SELECT id, row_number() OVER (PARTITION BY dept ORDER BY salary DESC) rn "
                      "FROM emp ORDER BY id")
        assert out["rn"] == [3, 1, 2, 3, 2, 1, 3, 2, 1, 4]  # nulls sort last

    def test_rank_and_dense_rank_ties(self, db):
        out = run(db, "SELECT id, rank() OVER (PARTITION BY dept ORDER BY salary) r, "
                      "dense_rank() OVER (PARTITION BY dept ORDER BY salary) dr "
                      "FROM emp WHERE dept = 'a' ORDER BY id")
        assert out["r"] == [1, 2, 2]      # tie at 20 → both rank 2
        assert out["dr"] == [1, 2, 2]

    def test_rank_gap_after_tie(self, db):
        db.create_table("t4", {"x": [1, 5, 5, 9]})
        out = run(db, "SELECT x, rank() OVER (ORDER BY x) r, dense_rank() OVER (ORDER BY x) d "
                      "FROM t4 ORDER BY x")
        assert out["r"] == [1, 2, 2, 4]   # rank gaps, dense_rank doesn't
        assert out["d"] == [1, 2, 2, 3]

    def test_running_sum_includes_peers(self, db):
        # default frame is RANGE ... CURRENT ROW: order-key ties (peers)
        # are included together — the 20/20 tie sums both at once
        out = run(db, "SELECT id, sum(salary) OVER (PARTITION BY dept ORDER BY salary) s "
                      "FROM emp WHERE dept = 'a' ORDER BY id")
        assert out["s"] == [10, 50, 50]

    def test_partition_total_without_order(self, db):
        out = run(db, "SELECT id, sum(salary) OVER (PARTITION BY dept) s FROM emp ORDER BY id")
        assert out["s"] == [50, 50, 50, 45, 45, 45, 6, 6, 6, 6]

    def test_sum_skips_nulls(self, db):
        out = run(db, "SELECT id, sum(salary) OVER (PARTITION BY dept ORDER BY salary) s "
                      "FROM emp WHERE dept = 'c' ORDER BY id")
        assert out["s"] == [1, 3, 6, 6]   # null salary row adds nothing

    def test_avg_min_max_count(self, db):
        out = run(db, "SELECT id, avg(salary) OVER (PARTITION BY dept) a, "
                      "min(salary) OVER (PARTITION BY dept) mn, "
                      "max(salary) OVER (PARTITION BY dept) mx, "
                      "count(salary) OVER (PARTITION BY dept) c, "
                      "count(*) OVER (PARTITION BY dept) ca "
                      "FROM emp WHERE dept = 'c' ORDER BY id")
        assert out["a"] == [2.0] * 4
        assert out["mn"] == [1] * 4 and out["mx"] == [3] * 4
        assert out["c"] == [3] * 4        # count(x) skips the null
        assert out["ca"] == [4] * 4       # count(*) does not

    def test_rows_frame_sliding(self, db):
        out = run(db, "SELECT id, sum(salary) OVER "
                      "(ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) s FROM emp "
                      "ORDER BY id")
        assert out["s"][0] == 30          # 10+20
        assert out["s"][1] == 50          # 10+20+20
        assert out["s"][9] == 3           # 3 + null

    def test_rows_frame_min_max(self, db):
        out = run(db, "SELECT id, min(salary) OVER "
                      "(ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) m FROM emp "
                      "ORDER BY id")
        assert out["m"][:4] == [10, 10, 10, 5]

    def test_lag_lead(self, db):
        out = run(db, "SELECT id, lag(salary) OVER (PARTITION BY dept ORDER BY id) lg, "
                      "lead(salary, 1, -1) OVER (PARTITION BY dept ORDER BY id) ld "
                      "FROM emp ORDER BY id")
        assert out["lg"] == [None, 10, 20, None, 5, 15, None, 1, 2, 3]
        assert out["ld"] == [20, 20, -1, 15, 25, -1, 2, 3, None, -1]

    def test_first_last_value_peer_frame(self, db):
        out = run(db, "SELECT id, first_value(salary) OVER (PARTITION BY dept ORDER BY salary) f, "
                      "last_value(salary) OVER (PARTITION BY dept ORDER BY salary) l "
                      "FROM emp WHERE dept = 'a' ORDER BY id")
        assert out["f"] == [10, 10, 10]
        assert out["l"] == [10, 20, 20]   # last_value stops at the peer group

    def test_last_value_unbounded_frame(self, db):
        out = run(db, "SELECT id, last_value(salary) OVER (PARTITION BY dept ORDER BY salary "
                      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) l "
                      "FROM emp WHERE dept = 'a' ORDER BY id")
        assert out["l"] == [20, 20, 20]

    def test_ntile_percent_rank_cume_dist(self, db):
        out = run(db, "SELECT id, ntile(3) OVER (ORDER BY id) nt, "
                      "percent_rank() OVER (ORDER BY salary) pr, "
                      "cume_dist() OVER (ORDER BY salary) cd FROM emp ORDER BY id")
        assert out["nt"] == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
        assert out["pr"][6] == 0.0        # smallest salary
        assert out["cd"][9] == 1.0

    def test_min_max_over_strings(self, db):
        out = run(db, "SELECT id, max(dept) OVER (ORDER BY id) mx FROM emp ORDER BY id")
        assert out["mx"] == ["a"] * 3 + ["b"] * 3 + ["c"] * 4

    def test_window_over_grouped_rows(self, db):
        out = run(db, "SELECT dept, count(*) c, "
                      "rank() OVER (ORDER BY count(*) DESC) rn "
                      "FROM emp GROUP BY dept ORDER BY dept")
        assert out["c"] == [3, 3, 4]
        assert out["rn"] == [2, 2, 1]

    def test_window_in_expression(self, db):
        out = run(db, "SELECT id, salary - avg(salary) OVER (PARTITION BY dept) d "
                      "FROM emp WHERE dept = 'b' ORDER BY id")
        assert out["d"] == [-10.0, 0.0, 10.0]

    def test_order_by_window(self, db):
        out = run(db, "SELECT id FROM emp WHERE dept = 'a' "
                      "ORDER BY row_number() OVER (ORDER BY salary DESC), id")
        assert out["id"] == [1, 2, 0]

    def test_where_applies_before_window(self, db):
        out = run(db, "SELECT id, count(*) OVER () n FROM emp WHERE id < 4 ORDER BY id")
        assert out["n"] == [4] * 4

    def test_window_rejected_in_where(self, db):
        with pytest.raises(InvalidInputError, match="not allowed in WHERE"):
            run(db, "SELECT id FROM emp WHERE row_number() OVER (ORDER BY id) < 3")

    def test_window_rejected_in_having(self, db):
        with pytest.raises(InvalidInputError, match="not allowed in HAVING"):
            run(db, "SELECT dept FROM emp GROUP BY dept "
                    "HAVING rank() OVER (ORDER BY dept) = 1")

    def test_frame_start_after_end_rejected(self, db):
        with pytest.raises(SqlParseError, match="after frame end"):
            parse_select("SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 1 FOLLOWING AND 1 PRECEDING) FROM t")

    def test_non_window_function_rejected(self, db):
        with pytest.raises(SqlParseError, match="not a window function"):
            parse_select("SELECT abs(x) OVER (ORDER BY x) FROM t")

    def test_explain_shows_window_operator(self, db):
        plan = explain_select("SELECT id, rank() OVER (ORDER BY salary) FROM emp")
        assert "WindowAggExec" in plan
        assert "RANK() OVER (ORDER BY" in plan

    def test_distinct_after_window(self, db):
        out = run(db, "SELECT DISTINCT dept, count(*) OVER (PARTITION BY dept) n FROM emp "
                      "ORDER BY dept")
        assert out == {"dept": ["a", "b", "c"], "n": [3, 3, 4]}


# ------------------------------------------------------------------- CTEs


class TestCtes:
    def test_basic_cte(self, db):
        out = run(db, "WITH rich AS (SELECT id FROM emp WHERE salary > 15) "
                      "SELECT count(*) n FROM rich")
        assert out["n"] == [3]

    def test_cte_column_aliases(self, db):
        out = run(db, "WITH x(n) AS (SELECT count(*) FROM emp) SELECT n FROM x")
        assert out["n"] == [10]

    def test_chained_ctes_see_earlier(self, db):
        out = run(db, "WITH x(n) AS (SELECT count(*) FROM emp), "
                      "y AS (SELECT n + 1 m FROM x) SELECT m FROM y")
        assert out["m"] == [11]

    def test_cte_join(self, db):
        out = run(db, "WITH top AS (SELECT dept, avg(salary) a FROM emp GROUP BY dept) "
                      "SELECT e.id FROM emp e JOIN top t ON e.dept = t.dept "
                      "WHERE e.salary > t.a ORDER BY e.id")
        assert out["id"] == [1, 2, 5, 8]

    def test_cte_visible_in_subquery(self, db):
        out = run(db, "WITH big AS (SELECT name FROM dept WHERE budget > 50) "
                      "SELECT id FROM emp WHERE dept IN (SELECT name FROM big) ORDER BY id")
        assert out["id"] == [0, 1, 2]

    def test_cte_union_body(self, db):
        out = run(db, "WITH u AS (SELECT id FROM emp WHERE id < 2 UNION ALL "
                      "SELECT id FROM emp WHERE id > 8) SELECT count(*) n FROM u")
        assert out["n"] == [3]

    def test_cte_where_and_projection(self, db):
        out = run(db, "WITH e AS (SELECT * FROM emp) "
                      "SELECT id FROM e WHERE dept = 'b' ORDER BY id")
        assert out["id"] == [3, 4, 5]

    def test_cte_shadows_base_table(self, db):
        out = run(db, "WITH emp AS (SELECT id FROM emp WHERE id < 3) "
                      "SELECT count(*) n FROM emp")
        assert out["n"] == [3]

    def test_cte_column_count_mismatch(self, db):
        with pytest.raises(InvalidInputError, match="declares 2 columns"):
            run(db, "WITH x(a, b) AS (SELECT id FROM emp) SELECT a FROM x")

    def test_recursive_keyword_parses(self, db):
        stmt = parse_select("WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r")
        assert stmt.ctes_recursive and [n for n, _, _ in stmt.ctes] == ["r"]

    def test_explain_shows_cte(self, db):
        plan = explain_select("WITH t AS (SELECT id FROM emp) SELECT * FROM t")
        assert "CteExec: name=t" in plan

    def test_cte_reexecutable(self, db):
        # the statement object survives re-execution (no baked-in state)
        stmt = parse_select("WITH x AS (SELECT count(*) c FROM emp) SELECT c FROM x")
        from lancedb_tpu.sql import execute_select

        a = execute_select(stmt, db.open_table)
        b = execute_select(stmt, db.open_table)
        assert a.to_pydict() == b.to_pydict() == {"c": [10]}


# ------------------------------------------------- correlated subqueries


class TestCorrelatedSubqueries:
    def test_exists(self, db):
        out = run(db, "SELECT name FROM dept d WHERE EXISTS "
                      "(SELECT 1 FROM emp e WHERE e.dept = d.name AND e.salary > 10) "
                      "ORDER BY name")
        assert out["name"] == ["a", "b"]

    def test_not_exists(self, db):
        out = run(db, "SELECT name FROM dept d WHERE NOT EXISTS "
                      "(SELECT 1 FROM emp e WHERE e.dept = d.name) ORDER BY name")
        assert out["name"] == ["d"]

    def test_scalar_in_where(self, db):
        out = run(db, "SELECT id FROM emp e WHERE salary > "
                      "(SELECT avg(salary) FROM emp e2 WHERE e2.dept = e.dept) ORDER BY id")
        assert out["id"] == [1, 2, 5, 8]

    def test_scalar_in_select_list(self, db):
        out = run(db, "SELECT name, (SELECT count(*) FROM emp e WHERE e.dept = d.name) n "
                      "FROM dept d ORDER BY name")
        assert out["n"] == [3, 3, 4, 0]

    def test_scalar_empty_result_is_null(self, db):
        out = run(db, "SELECT name, (SELECT max(salary) FROM emp e WHERE e.dept = d.name) m "
                      "FROM dept d ORDER BY name")
        assert out["m"] == [20, 25, 3, None]

    def test_correlated_in(self, db):
        out = run(db, "SELECT id FROM emp e WHERE id IN "
                      "(SELECT max(id) FROM emp e2 WHERE e2.dept = e.dept) ORDER BY id")
        assert out["id"] == [2, 5, 9]

    def test_correlated_not_in_3vl(self, db):
        # NOT IN against a set containing NULL is never true
        out = run(db, "SELECT name FROM dept d WHERE name NOT IN "
                      "(SELECT dept FROM emp e WHERE e.salary > d.budget) ORDER BY name")
        # budget a=100: no emp salary >100 → empty set → keep; b=40: none → keep;
        # c=5: many → 'c' in {a,b} ? no → keep; d=0: all non-null salaries → keep
        assert out["name"] == ["a", "b", "c", "d"]

    def test_mixed_pushdown_and_correlated(self, db):
        out = run(db, "SELECT id FROM emp e WHERE id < 6 AND EXISTS "
                      "(SELECT 1 FROM dept d WHERE d.name = e.dept AND d.budget > 50) "
                      "ORDER BY id")
        assert out["id"] == [0, 1, 2]

    def test_correlated_after_join(self, db):
        out = run(db, "SELECT e.id FROM emp e JOIN dept d ON e.dept = d.name "
                      "WHERE e.salary > (SELECT avg(salary) FROM emp x WHERE x.dept = e.dept) "
                      "ORDER BY e.id")
        assert out["id"] == [1, 2, 5, 8]

    def test_no_name_capture_through_join_env(self, db):
        # inner alias z must not capture the outer's rewritten columns
        out = run(db, "SELECT e.id FROM emp e JOIN dept d ON e.dept = d.name "
                      "WHERE d.budget > 30 AND EXISTS "
                      "(SELECT 1 FROM emp z WHERE z.dept = e.dept AND z.salary > e.salary) "
                      "ORDER BY e.id")
        assert out["id"] == [0, 3, 4]

    def test_uncorrelated_still_resolves_eagerly(self, db):
        out = run(db, "SELECT id FROM emp WHERE dept IN "
                      "(SELECT name FROM dept WHERE budget > 50) ORDER BY id")
        assert out["id"] == [0, 1, 2]

    def test_correlated_in_having(self, db):
        # the outer row of a HAVING correlation is the GROUP row
        out = run(db, "SELECT dept FROM emp e GROUP BY dept HAVING count(*) > "
                      "(SELECT budget FROM dept d WHERE d.name = e.dept) "
                      "ORDER BY dept")
        # per-dept counts vs budgets: a 3<=100, b 3<=40, c 4<=5 -> none
        assert out["dept"] == []

    def test_correlated_having_vs_aggregate(self, db):
        out = run(db, "SELECT dept, sum(salary) s FROM emp GROUP BY dept "
                      "HAVING sum(salary) > (SELECT avg(salary) FROM emp e2 "
                      "WHERE e2.dept = emp.dept) ORDER BY dept")
        assert out["dept"] == ["a", "b", "c"]

    def test_single_table_alias_qualified_columns(self, db):
        # e.salary resolves without a join (DataFusion schema qualifiers)
        out = run(db, "SELECT e.id FROM emp e WHERE e.salary > 15 ORDER BY e.id")
        assert out["id"] == [1, 2, 5]

    def test_table_name_qualified_columns(self, db):
        out = run(db, "SELECT emp.id FROM emp WHERE emp.salary > 15 ORDER BY emp.id")
        assert out["id"] == [1, 2, 5]

    def test_correlated_caches_by_key(self, db):
        # 10 outer rows, 3 distinct depts → 3 inner executions
        import lancedb_tpu.sql as sqlmod

        calls = []
        orig = sqlmod.execute_select

        def counting(stmt, open_table):
            calls.append(1)
            return orig(stmt, open_table)

        sqlmod.execute_select = counting
        try:
            out = orig(
                "SELECT id FROM emp e WHERE salary > "
                "(SELECT avg(salary) FROM emp x WHERE x.dept = e.dept)",
                db.open_table,
            )
        finally:
            sqlmod.execute_select = orig
        assert len(calls) == 3  # one per distinct dept
        assert sorted(out.column("id").to_pylist()) == [1, 2, 5, 8]


class TestSetOperations:
    """INTERSECT / EXCEPT with [ALL] and DataFusion precedence
    (INTERSECT binds tighter than UNION/EXCEPT)."""

    @pytest.fixture
    def sdb(self):
        import uuid

        db = lancedb_tpu.connect(f"memory://setops-{uuid.uuid4().hex}")
        db.create_table("a", {"x": [1, 2, 2, 3, 3, 3, None]})
        db.create_table("b", {"x": [2, 3, 3, 4, None]})
        return db

    @staticmethod
    def _sorted(vals):
        return sorted(vals, key=lambda v: (v is None, v))

    def test_intersect_distinct_nulls_equal(self, sdb):
        out = run(sdb, "SELECT x FROM a INTERSECT SELECT x FROM b")
        assert self._sorted(out["x"]) == [2, 3, None]

    def test_intersect_all_bag_semantics(self, sdb):
        out = run(sdb, "SELECT x FROM a INTERSECT ALL SELECT x FROM b")
        assert self._sorted(out["x"]) == [2, 3, 3, None]

    def test_except_distinct(self, sdb):
        out = run(sdb, "SELECT x FROM a EXCEPT SELECT x FROM b")
        assert out["x"] == [1]

    def test_except_all_subtracts_counts(self, sdb):
        out = run(sdb, "SELECT x FROM a EXCEPT ALL SELECT x FROM b")
        assert self._sorted(out["x"]) == [1, 2, 3]

    def test_intersect_binds_tighter_than_union(self, sdb):
        out = run(sdb, "SELECT x FROM a UNION SELECT x FROM a INTERSECT SELECT x FROM b")
        assert self._sorted(out["x"]) == [1, 2, 3, None]  # a ∪ (a ∩ b)

    def test_order_limit_bind_to_whole_expression(self, sdb):
        out = run(sdb, "SELECT x FROM a EXCEPT ALL SELECT x FROM b ORDER BY x DESC LIMIT 2")
        assert out["x"] == [3, 2]

    def test_mixed_union_all_chain(self, sdb):
        out = run(sdb, "SELECT x FROM a WHERE x = 1 UNION ALL SELECT x FROM a WHERE x = 1 "
                       "UNION SELECT x FROM b WHERE x = 4")
        assert self._sorted(out["x"]) == [1, 4]  # trailing UNION dedupes

    def test_explain_set_op(self, sdb):
        plan = explain_select("SELECT x FROM a INTERSECT ALL SELECT x FROM b")
        assert "SetOpExec" in plan and "intersect all" in plan

    def test_cte_with_set_op_body(self, sdb):
        out = run(sdb, "WITH c AS (SELECT x FROM a INTERSECT SELECT x FROM b) "
                       "SELECT count(*) n FROM c WHERE x IS NOT NULL")
        assert out["n"] == [2]


class TestWindowFrameEdges:
    """Review regression: FOLLOWING-only / PRECEDING-only frames clamp
    at partition edges instead of wrapping prefix-sum indices."""

    @pytest.fixture
    def tdb(self):
        import uuid

        db = lancedb_tpu.connect(f"memory://frames-{uuid.uuid4().hex}")
        db.create_table("t", {"x": [10, 15, 1, 3, 7]})
        return db

    def test_following_only_frame(self, tdb):
        out = run(tdb, "SELECT x, sum(x) OVER (ORDER BY x "
                       "ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) s FROM t ORDER BY x")
        assert out["s"] == [17, 25, 15, None, None]

    def test_preceding_only_frame(self, tdb):
        out = run(tdb, "SELECT x, sum(x) OVER (ORDER BY x "
                       "ROWS BETWEEN 5 PRECEDING AND 3 PRECEDING) s FROM t ORDER BY x")
        assert out["s"] == [None, None, None, 1, 4]

    def test_empty_frame_count_is_zero(self, tdb):
        out = run(tdb, "SELECT x, count(*) OVER (ORDER BY x "
                       "ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) c FROM t ORDER BY x")
        assert out["c"] == [2, 2, 1, 0, 0]

    def test_following_min_over_strings_clamps(self, tdb):
        import uuid

        db2 = lancedb_tpu.connect(f"memory://frames2-{uuid.uuid4().hex}")
        db2.create_table("s", {"w": ["b", "a", "c"]})
        out = run(db2, "SELECT w, min(w) OVER (ORDER BY w "
                       "ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) m FROM s ORDER BY w")
        assert out["m"] == ["b", "c", None]


class TestRangeAndGroupsFrames:
    """RANGE value-offset and GROUPS peer-offset frames (DataFusion
    dialect; previously only ROWS was accepted)."""

    @pytest.fixture
    def tdb(self):
        import uuid

        db = lancedb_tpu.connect(f"memory://rframes-{uuid.uuid4().hex}")
        # x has a tie (5,5) and a gap (9→20)
        db.create_table("t", {"x": [1, 5, 5, 9, 20], "g": ["a", "a", "a", "b", "b"]})
        return db

    def test_range_value_window(self, tdb):
        # frame = rows with key in [x-4, x+4]
        out = run(tdb, "SELECT x, sum(x) OVER (ORDER BY x "
                       "RANGE BETWEEN 4 PRECEDING AND 4 FOLLOWING) s FROM t ORDER BY x")
        assert out["s"] == [11, 20, 20, 19, 20]

    def test_range_current_row_includes_peers(self, tdb):
        # CURRENT ROW in RANGE = peer-group edge: both 5s share a frame
        out = run(tdb, "SELECT x, sum(x) OVER (ORDER BY x "
                       "RANGE BETWEEN CURRENT ROW AND CURRENT ROW) s FROM t ORDER BY x")
        assert out["s"] == [1, 10, 10, 9, 20]

    def test_range_desc_order(self, tdb):
        out = run(tdb, "SELECT x, sum(x) OVER (ORDER BY x DESC "
                       "RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) s FROM t ORDER BY x")
        # DESC: frame = rows with key in [x, x+4]
        assert out["s"] == [11, 19, 19, 9, 20]

    def test_range_partitioned(self, tdb):
        out = run(tdb, "SELECT x, count(*) OVER (PARTITION BY g ORDER BY x "
                       "RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) c FROM t ORDER BY x")
        assert out["c"] == [1, 3, 3, 1, 1]  # 20 is >10 away from 9

    def test_range_requires_single_numeric_key(self, tdb):
        with pytest.raises(SqlParseError, match="exactly one"):
            parse_select("SELECT sum(x) OVER (ORDER BY x, g "
                         "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
        with pytest.raises(InvalidInputError, match="numeric or temporal ORDER BY"):
            run(tdb, "SELECT sum(x) OVER (ORDER BY g "
                     "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) s FROM t")

    def test_range_fractional_offset(self, tdb):
        out = run(tdb, "SELECT x, count(*) OVER (ORDER BY x "
                       "RANGE BETWEEN 0.5 PRECEDING AND 0.5 FOLLOWING) c FROM t ORDER BY x")
        assert out["c"] == [1, 2, 2, 1, 1]

    def test_groups_window(self, tdb):
        # peer groups in x order: {1}, {5,5}, {9}, {20}
        out = run(tdb, "SELECT x, sum(x) OVER (ORDER BY x "
                       "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) s FROM t ORDER BY x")
        assert out["s"] == [11, 20, 20, 39, 29]

    def test_groups_following_only_empty_at_edge(self, tdb):
        out = run(tdb, "SELECT x, count(*) OVER (ORDER BY x "
                       "GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) c FROM t ORDER BY x")
        # frames: {5,5,9}, {9,20}, {9,20}, {20}, {}
        assert out["c"] == [3, 2, 2, 1, 0]

    def test_groups_requires_order_by(self, tdb):
        with pytest.raises(SqlParseError, match="GROUPS.*ORDER BY"):
            parse_select("SELECT sum(x) OVER (GROUPS BETWEEN 1 PRECEDING "
                         "AND CURRENT ROW) FROM t")

    def test_first_last_value_with_range_frame(self, tdb):
        out = run(tdb, "SELECT x, first_value(x) OVER (ORDER BY x "
                       "RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) f, "
                       "last_value(x) OVER (ORDER BY x "
                       "RANGE BETWEEN CURRENT ROW AND 4 FOLLOWING) l "
                       "FROM t ORDER BY x")
        assert out["f"] == [1, 1, 1, 5, 20]
        assert out["l"] == [5, 9, 9, 9, 20]

    def test_range_null_keys_frame_with_peers(self, tdb):
        import uuid

        db = lancedb_tpu.connect(f"memory://rnull-{uuid.uuid4().hex}")
        db.create_table("t", {"x": [1, 2, None, None]})
        out = run(db, "SELECT x, count(*) OVER (ORDER BY x "
                      "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) c FROM t")
        by_x = dict(zip(out["x"], out["c"]))
        assert by_x[1] == 1 and by_x[2] == 2
        # null rows are peers of each other only
        assert out["c"].count(2) >= 1 and sum(1 for x, c in zip(out["x"], out["c"]) if x is None and c == 2) == 2


class TestTemporalRangeFrames:
    """RANGE BETWEEN INTERVAL ... over timestamp ORDER BY keys."""

    @pytest.fixture
    def tdb(self):
        import datetime as dt
        import uuid

        db = lancedb_tpu.connect(f"memory://tframes-{uuid.uuid4().hex}")
        base = dt.datetime(2026, 1, 1)
        ts = [base, base + dt.timedelta(hours=1), base + dt.timedelta(hours=2),
              base + dt.timedelta(days=2)]
        tbl = pa.table({"ts": pa.array(ts), "v": [1, 2, 4, 8]})
        db.create_table("ev", tbl)
        return db

    def test_interval_window(self, tdb):
        out = run(tdb, "SELECT v, sum(v) OVER (ORDER BY ts RANGE BETWEEN "
                       "INTERVAL '90 minutes' PRECEDING AND CURRENT ROW) s "
                       "FROM ev ORDER BY ts")
        assert out["s"] == [1, 3, 6, 8]

    def test_interval_unit_keyword(self, tdb):
        out = run(tdb, "SELECT v, count(*) OVER (ORDER BY ts RANGE BETWEEN "
                       "INTERVAL '1' DAY PRECEDING AND INTERVAL '1' DAY FOLLOWING) c "
                       "FROM ev ORDER BY ts")
        assert out["c"] == [3, 3, 3, 1]

    def test_interval_requires_temporal_key(self, tdb):
        with pytest.raises(InvalidInputError, match="temporal"):
            run(tdb, "SELECT sum(v) OVER (ORDER BY v RANGE BETWEEN "
                     "INTERVAL '1 hour' PRECEDING AND CURRENT ROW) s FROM ev")

    def test_malformed_interval(self, tdb):
        with pytest.raises(SqlParseError, match="interval"):
            parse_select("SELECT sum(v) OVER (ORDER BY ts RANGE BETWEEN "
                         "INTERVAL '1 fortnight' PRECEDING AND CURRENT ROW) FROM ev")


class TestExtendedAggregates:
    """stddev/variance (sample + population), median, array_agg,
    bool_and/bool_or — grouped, keyless, and streaming paths."""

    @pytest.fixture
    def adb(self):
        import uuid

        db = lancedb_tpu.connect(f"memory://aggs-{uuid.uuid4().hex}")
        db.create_table("t", {
            "g": ["a", "a", "a", "b", "b"],
            "x": [1.0, 2.0, 3.0, 10.0, 30.0],
            "ok": [True, True, False, True, True],
        })
        return db

    def test_grouped(self, adb):
        out = run(adb, "SELECT g, stddev(x) s, var_pop(x) v, median(x) m, "
                       "array_agg(x) a, bool_and(ok) ba, bool_or(ok) bo "
                       "FROM t GROUP BY g ORDER BY g")
        assert out["s"][0] == pytest.approx(1.0)
        assert out["v"] == [pytest.approx(2.0 / 3), pytest.approx(100.0)]
        assert out["m"] == [2.0, 10.0]
        assert out["a"] == [[1.0, 2.0, 3.0], [10.0, 30.0]]
        assert out["ba"] == [False, True]
        assert out["bo"] == [True, True]

    def test_keyless(self, adb):
        out = run(adb, "SELECT stddev(x) s, stddev_pop(x) sp, variance(x) v, "
                       "median(x) m, bool_and(ok) b FROM t")
        assert out["s"][0] == pytest.approx(12.1531888819)
        assert out["sp"][0] == pytest.approx(10.8701425934)
        assert out["v"][0] == pytest.approx(147.7)
        assert out["m"] == [3.0]
        assert out["b"] == [False]

    def test_streaming_keyless_matches(self, adb):
        """Batch-streamed accumulators agree with the one-shot path."""
        import pyarrow as pa

        from lancedb_tpu.sql import _execute_grouped_streaming, _find_aggs, parse_select

        stmt = parse_select(
            "SELECT stddev(x) s, var_pop(x) vp, median(x) m, count(*) c FROM t"
        )
        aggs = _find_aggs([it.expr for it in stmt.items])
        tbl = pa.table({"x": [1.0, 2.0, 3.0, 10.0, 30.0]})
        out = _execute_grouped_streaming(
            stmt, iter(tbl.to_batches(max_chunksize=2)), aggs, 1 << 20
        ).to_pydict()
        assert out["s"][0] == pytest.approx(12.1531888819)
        assert out["vp"][0] == pytest.approx(118.16)
        assert out["m"] == [3.0]
        assert out["c"] == [5]

    def test_having_on_stddev(self, adb):
        out = run(adb, "SELECT g FROM t GROUP BY g HAVING stddev(x) > 5")
        assert out["g"] == ["b"]

    def test_string_agg(self, adb):
        out = run(adb, "SELECT g, string_agg(g, '/') j, count(*) c FROM t GROUP BY g ORDER BY g")
        assert out["j"] == ["a/a/a", "b/b"]
        out = run(adb, "SELECT string_agg(g, '-') j FROM t")
        assert out["j"] == ["a-a-a-b-b"]
        with pytest.raises(SqlParseError, match="two arguments"):
            run(adb, "SELECT string_agg(g) FROM t")
        with pytest.raises(SqlParseError, match="one argument"):
            run(adb, "SELECT sum(x, 2) FROM t")


class TestReviewFixes:
    """Regressions from the r3 code review of the window/aggregate work."""

    def test_range_default_frame_over_string_key(self, db):
        # no value offsets → pure peer arithmetic, any ORDER BY type
        out = run(db, "SELECT dept, count(*) OVER (ORDER BY dept RANGE BETWEEN "
                      "UNBOUNDED PRECEDING AND CURRENT ROW) c FROM emp ORDER BY id")
        assert out["c"][:3] == [3, 3, 3]
        out2 = run(db, "SELECT id, count(*) OVER (ORDER BY dept, salary RANGE BETWEEN "
                       "UNBOUNDED PRECEDING AND CURRENT ROW) c FROM emp WHERE dept='a' "
                       "ORDER BY id")
        assert out2["c"] == [1, 3, 3]

    def test_fractional_rows_offset_is_parse_error(self, db):
        with pytest.raises(SqlParseError, match="must be integers"):
            parse_select("SELECT sum(salary) OVER (ORDER BY id ROWS BETWEEN "
                         "1.5 PRECEDING AND CURRENT ROW) FROM emp")

    def test_array_agg_keeps_nulls_everywhere(self, db):
        import pyarrow as pa

        from lancedb_tpu.sql import _execute_grouped_streaming, _find_aggs, parse_select

        grouped = run(db, "SELECT dept, array_agg(salary) a FROM emp "
                          "WHERE dept = 'c' GROUP BY dept")
        assert grouped["a"] == [[1, 2, 3, None]]
        keyless = run(db, "SELECT array_agg(salary) a FROM emp WHERE dept = 'c'")
        assert keyless["a"] == [[1, 2, 3, None]]
        stmt = parse_select("SELECT array_agg(x) a FROM t")
        aggs = _find_aggs([it.expr for it in stmt.items])
        tbl = pa.table({"x": [1, 2, None, 3]})
        out = _execute_grouped_streaming(
            stmt, iter(tbl.to_batches(max_chunksize=2)), aggs, 1 << 20
        ).to_pydict()
        assert out["a"] == [[1, 2, None, 3]]


def test_split_part_zero_rows():
    import pyarrow as pa

    from lancedb_tpu.filters import evaluate_expression

    empty = pa.table({"s": pa.array([], type=pa.string())})
    assert evaluate_expression(empty, "split_part(s, ' ', 2)").to_pylist() == []


def test_substr_left_right_negative_semantics():
    import pyarrow as pa

    from lancedb_tpu.filters import evaluate_expression

    data = pa.table({"s": ["apple"]})
    ev = lambda e: evaluate_expression(data, e).to_pylist()[0]
    assert ev("substr(s, 0, 3)") == "ap"      # Postgres virtual-position
    assert ev("substr(s, -1, 3)") == "a"
    assert ev("left(s, -2)") == "app"         # all but last 2
    assert ev("right(s, -2)") == "ple"        # all but first 2


def test_f32_precision_never_fuses_against_bf16():
    import uuid

    import jax.numpy as jnp
    import numpy as np

    import lancedb_tpu
    from lancedb_tpu.index import IvfPq
    from lancedb_tpu.index.vector import SearchParams, build_vector_index, load_searcher
    from lancedb_tpu.io.object_store import MemoryStore
    from lancedb_tpu.storage.dataset import Dataset
    import pyarrow as pa

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    tbl = pa.table({
        "id": pa.array(np.arange(500, dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), 16),
    })
    ds = Dataset.create(MemoryStore(), "t.lance", tbl.schema, tbl)
    meta = build_vector_index(ds, "vector", IvfPq(num_partitions=4, num_sub_vectors=4, num_bits=4))
    s = load_searcher(ds, meta)
    assert s.prepare_device_refine(ds, "vector")
    # simulate a TPU bf16 resident table
    s._device["refine_vecs"] = s._device["refine_vecs"].astype(jnp.bfloat16)
    p_default = SearchParams(k=5, nprobes=4, refine_factor=5)
    p_f32 = SearchParams(k=5, nprobes=4, refine_factor=5, precision="float32")
    assert s.will_fuse_refine(p_default)
    assert not s.will_fuse_refine(p_f32)


    def test_corr_and_covar(self, adb):
        import numpy as np

        out = run(adb, "SELECT corr(x, x) c1, covar_samp(x, x) cs, covar_pop(x, x) cp FROM t")
        assert out["c1"][0] == pytest.approx(1.0)
        xa = np.array([1.0, 2.0, 3.0, 10.0, 30.0])
        assert out["cs"][0] == pytest.approx(float(np.cov(xa, xa, ddof=1)[0, 1]))
        assert out["cp"][0] == pytest.approx(float(np.cov(xa, xa, ddof=0)[0, 1]))
        # pairs with either side NULL are excluded; single-pair group -> NULL corr
        out = run(adb, "SELECT g, corr(x, x) c FROM t GROUP BY g ORDER BY g")
        assert out["c"][0] == pytest.approx(1.0)
        with pytest.raises(SqlParseError, match="two arguments"):
            run(adb, "SELECT corr(x) FROM t")


class TestSetOpOrderByNested:
    def test_intersect_then_union_order_by(self, mem_db):
        mem_db.create_table("soa", {"a": [1, 2, 3]})
        mem_db.create_table("sob", {"a": [2, 3, 4]})
        mem_db.create_table("soc", {"a": [9, 3]})
        out = mem_db.sql(
            "SELECT a FROM soa INTERSECT SELECT a FROM sob "
            "UNION SELECT a FROM soc ORDER BY a DESC"
        ).to_pydict()
        assert out["a"] == [9, 3, 2]

    def test_nullif_null_argument(self, mem_db):
        import pyarrow as pa

        mem_db.create_table("nt", pa.table({
            "a": [1, 2, 3], "b": pa.array([2, None, 3], pa.int64()),
        }))
        out = mem_db.sql("SELECT nullif(a, b) AS n FROM nt").to_pydict()
        assert out["n"] == [1, 2, None]


class TestNullsOrdering:
    def test_nulls_first_last(self, mem_db):
        import pyarrow as pa

        mem_db.create_table("no1", pa.table({"a": pa.array([3, None, 1], pa.int64())}))
        sql = mem_db.sql
        assert sql("SELECT a FROM no1 ORDER BY a").to_pydict()["a"] == [1, 3, None]
        # DataFusion/Postgres default: DESC puts nulls first
        assert sql("SELECT a FROM no1 ORDER BY a DESC").to_pydict()["a"] == [None, 3, 1]
        assert sql("SELECT a FROM no1 ORDER BY a NULLS FIRST").to_pydict()["a"] == [None, 1, 3]
        assert sql("SELECT a FROM no1 ORDER BY a DESC NULLS LAST").to_pydict()["a"] == [3, 1, None]
        assert sql("SELECT a FROM no1 ORDER BY a + 1 NULLS FIRST").to_pydict()["a"] == [None, 1, 3]

    def test_window_order_nulls_rejected(self, mem_db):
        import pytest as _pytest

        from lancedb_tpu.errors import SqlParseError

        mem_db.create_table("no2", {"a": [1, 2]})
        with _pytest.raises(SqlParseError, match="window ORDER BY"):
            mem_db.sql("SELECT sum(a) OVER (ORDER BY a NULLS FIRST) AS s FROM no2")



# ------------------------------------------------- WITH RECURSIVE (r3 #10)


class TestRecursiveCte:
    def test_counter(self, db):
        out = run(db, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                      "SELECT n + 1 FROM t WHERE n < 5) SELECT n FROM t ORDER BY n")
        assert out["n"] == [1, 2, 3, 4, 5]

    def test_factorial_accumulator(self, db):
        out = run(db, "WITH RECURSIVE f(i, x) AS (SELECT 0, 1 UNION ALL "
                      "SELECT i + 1, x * (i + 1) FROM f WHERE i < 6) "
                      "SELECT max(x) m FROM f")
        assert out["m"] == [720]

    def test_graph_reachability_terminates_on_cycle(self):
        import lancedb_tpu

        gdb = lancedb_tpu.connect("memory://sql-recursive-graph")
        gdb.create_table("edges", pa.table({
            "src": [1, 2, 3, 4], "dst": [2, 3, 1, 5],
        }), mode="overwrite")
        out = run(gdb, "WITH RECURSIVE r(node) AS (SELECT 1 UNION "
                           "SELECT e.dst FROM edges e JOIN r ON e.src = r.node) "
                           "SELECT node FROM r ORDER BY node")
        assert out["node"] == [1, 2, 3]

    def test_divergent_recursion_bounded(self, db):
        with pytest.raises(InvalidInputError, match="iterations"):
            run(db, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                    "SELECT n + 1 FROM t) SELECT count(*) FROM t")

    def test_recursive_requires_union(self, db):
        with pytest.raises(InvalidInputError, match="UNION"):
            run(db, "WITH RECURSIVE t(n) AS (SELECT 1 INTERSECT "
                    "SELECT n FROM t) SELECT * FROM t")

    def test_non_self_referencing_cte_under_recursive(self, db):
        out = run(db, "WITH RECURSIVE base AS (SELECT id FROM emp WHERE id < 3) "
                      "SELECT count(*) n FROM base")
        assert out["n"] == [3]

    # -------- adversarial divergence / cap coverage (VERDICT r4 #8) ----

    def test_union_all_on_cycle_diverges_to_cap(self, monkeypatch):
        """UNION ALL never dedupes, so a graph cycle spins forever — the
        iteration cap must catch it (UNION on the same graph terminates,
        test_graph_reachability_terminates_on_cycle)."""
        import uuid

        gdb = lancedb_tpu.connect(f"memory://sql-divergent-{uuid.uuid4().hex}")
        gdb.create_table("edges", pa.table({"src": [1, 2], "dst": [2, 1]}))
        monkeypatch.setenv("LANCEDB_TPU_SQL_RECURSION_LIMIT", "50")
        with pytest.raises(InvalidInputError, match="50 iterations"):
            run(gdb, "WITH RECURSIVE r(node) AS (SELECT 1 UNION ALL "
                     "SELECT e.dst FROM edges e JOIN r ON e.src = r.node) "
                     "SELECT count(*) FROM r")

    def test_self_loop_edge_terminates_under_union(self):
        import uuid

        gdb = lancedb_tpu.connect(f"memory://sql-selfloop-{uuid.uuid4().hex}")
        gdb.create_table("edges", pa.table({
            "src": [1, 2, 2], "dst": [2, 2, 3],  # 2 -> 2 self loop
        }))
        out = run(gdb, "WITH RECURSIVE r(node) AS (SELECT 1 UNION "
                       "SELECT e.dst FROM edges e JOIN r ON e.src = r.node) "
                       "SELECT node FROM r ORDER BY node")
        assert out["node"] == [1, 2, 3]

    def test_recursion_limit_env_is_respected(self, db, monkeypatch):
        monkeypatch.setenv("LANCEDB_TPU_SQL_RECURSION_LIMIT", "10")
        with pytest.raises(InvalidInputError, match="10 iterations"):
            run(db, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                    "SELECT n + 1 FROM t WHERE n < 100) SELECT count(*) FROM t")
        monkeypatch.setenv("LANCEDB_TPU_SQL_RECURSION_LIMIT", "200")
        out = run(db, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                      "SELECT n + 1 FROM t WHERE n < 100) SELECT count(*) c FROM t")
        assert out["c"] == [100]

    def test_termination_exactly_at_cap_boundary(self, db, monkeypatch):
        """A recursion that needs exactly `limit` step evaluations (the
        last one returning zero rows) succeeds; one more step raises —
        pins the off-by-one at the cap."""
        monkeypatch.setenv("LANCEDB_TPU_SQL_RECURSION_LIMIT", "30")
        out = run(db, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                      "SELECT n + 1 FROM t WHERE n < 30) SELECT count(*) c FROM t")
        assert out["c"] == [30]
        with pytest.raises(InvalidInputError, match="iterations"):
            run(db, "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                    "SELECT n + 1 FROM t WHERE n < 31) SELECT count(*) c FROM t")

    def test_union_distinct_dedupes_string_and_list_rows(self):
        """The working-set dedupe keys on full row values, including
        list-typed columns (hashability via tuple conversion)."""
        import uuid

        gdb = lancedb_tpu.connect(f"memory://sql-dedupe-{uuid.uuid4().hex}")
        gdb.create_table("edges", pa.table({
            "src": ["a", "b", "c"], "dst": ["b", "a", "a"],
        }))
        out = run(gdb, "WITH RECURSIVE r(node) AS (SELECT 'a' UNION "
                       "SELECT e.dst FROM edges e JOIN r ON e.src = r.node) "
                       "SELECT node FROM r ORDER BY node")
        assert out["node"] == ["a", "b"]

    def test_divergent_value_growth_bounded(self, monkeypatch):
        """UNION distinct can't save a query whose rows never repeat
        (monotone value growth) — only the cap stops it."""
        import uuid

        gdb = lancedb_tpu.connect(f"memory://sql-growth-{uuid.uuid4().hex}")
        gdb.create_table("one", pa.table({"x": [1]}))
        monkeypatch.setenv("LANCEDB_TPU_SQL_RECURSION_LIMIT", "25")
        with pytest.raises(InvalidInputError, match="25 iterations"):
            run(gdb, "WITH RECURSIVE t(n) AS (SELECT 1 UNION "
                     "SELECT n + 1 FROM t) SELECT count(*) FROM t")

    def test_from_less_select(self, db):
        out = run(db, "SELECT 1 one, 2 + 2 four")
        assert out == {"one": [1], "four": [4]}
