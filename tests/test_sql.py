"""SQL SELECT engine tests (reference: DataFusion layer + fts() UDTF,
rust/lancedb/src/table/datafusion.rs + datafusion/udtf/fts.rs)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.errors import InvalidInputError, SqlParseError


@pytest.fixture
def db(tmp_db):
    n = 100
    tmp_db.create_table(
        "sales",
        pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "cat": pa.array([f"c{i % 4}" for i in range(n)]),
                "qty": pa.array((np.arange(n) % 7 + 1).astype(np.int64)),
                "price": pa.array((np.arange(n) * 0.5).astype(np.float64)),
            }
        ),
    )
    tmp_db.create_table(
        "docs",
        pa.table(
            {
                "id": pa.array([0, 1, 2, 3]),
                "text": pa.array(
                    [
                        "the quick brown fox",
                        "a quick silver car",
                        "slow brown turtle",
                        "nothing to see",
                    ]
                ),
            }
        ),
    )
    return tmp_db


def test_projection_where_order_limit(db):
    out = db.sql(
        "SELECT id, price * 2 AS dbl FROM sales WHERE id >= 90 ORDER BY id DESC LIMIT 3"
    )
    assert out.column_names == ["id", "dbl"]
    assert out.column("id").to_pylist() == [99, 98, 97]
    assert out.column("dbl").to_pylist() == [99.0, 98.0, 97.0]


def test_select_star(db):
    out = db.sql("SELECT * FROM sales WHERE id < 5")
    assert out.num_rows == 5
    assert set(out.column_names) == {"id", "cat", "qty", "price"}


def test_group_by_aggregates(db):
    out = db.sql(
        "SELECT cat, COUNT(*) AS n, SUM(qty) AS total, AVG(price) AS avg_p "
        "FROM sales GROUP BY cat ORDER BY cat"
    )
    assert out.column("cat").to_pylist() == ["c0", "c1", "c2", "c3"]
    assert out.column("n").to_pylist() == [25, 25, 25, 25]
    # verify one group against numpy
    ids = np.arange(100)
    qty = ids % 7 + 1
    assert out.column("total").to_pylist()[0] == int(qty[ids % 4 == 0].sum())
    assert out.column("avg_p").to_pylist()[0] == pytest.approx(
        float((ids[ids % 4 == 0] * 0.5).mean())
    )


def test_global_aggregates(db):
    out = db.sql("SELECT COUNT(*) AS n, MIN(price) AS lo, MAX(price) AS hi FROM sales")
    assert out.to_pylist() == [{"n": 100, "lo": 0.0, "hi": 49.5}]


def test_count_distinct(db):
    out = db.sql("SELECT COUNT(DISTINCT cat) AS k FROM sales")
    assert out.column("k").to_pylist() == [4]


def test_having(db):
    out = db.sql(
        "SELECT cat, SUM(qty) AS total FROM sales WHERE id < 50 "
        "GROUP BY cat HAVING SUM(qty) > 50 ORDER BY total DESC"
    )
    ids = np.arange(50)
    qty = ids % 7 + 1
    want = {
        f"c{c}": int(qty[ids % 4 == c].sum())
        for c in range(4)
        if qty[ids % 4 == c].sum() > 50
    }
    got = dict(zip(out.column("cat").to_pylist(), out.column("total").to_pylist()))
    assert got == want
    assert out.column("total").to_pylist() == sorted(want.values(), reverse=True)


def test_agg_in_expression(db):
    # int / int is integer division (DataFusion/Postgres semantics)
    out = db.sql("SELECT SUM(qty) / COUNT(*) AS q FROM sales")
    assert out.column("q").to_pylist() == [int((np.arange(100) % 7 + 1).sum()) // 100]
    out = db.sql("SELECT SUM(qty) * 1.0 / COUNT(*) AS mean_qty FROM sales")
    assert out.column("mean_qty").to_pylist()[0] == pytest.approx(
        (np.arange(100) % 7 + 1).mean()
    )


def test_distinct(db):
    out = db.sql("SELECT DISTINCT cat FROM sales ORDER BY cat")
    assert out.column("cat").to_pylist() == ["c0", "c1", "c2", "c3"]


def test_subquery(db):
    out = db.sql(
        "SELECT cat, COUNT(*) AS n FROM "
        "(SELECT cat FROM sales WHERE id < 8) GROUP BY cat ORDER BY cat"
    )
    assert out.column("n").to_pylist() == [2, 2, 2, 2]


def test_offset(db):
    out = db.sql("SELECT id FROM sales ORDER BY id LIMIT 5 OFFSET 10")
    assert out.column("id").to_pylist() == [10, 11, 12, 13, 14]


def test_fts_table_function(db):
    t = db.open_table("docs")
    t.create_fts_index("text")
    out = db.sql("SELECT id, _score FROM fts(docs, 'quick') ORDER BY _score DESC")
    assert sorted(out.column("id").to_pylist()) == [0, 1]
    out2 = db.sql("SELECT COUNT(*) AS n FROM fts(docs, 'brown')")
    assert out2.column("n").to_pylist() == [2]
    # k limit argument
    out3 = db.sql("SELECT id FROM fts(docs, 'quick', 1)")
    assert out3.num_rows == 1


def test_fts_json_query(db):
    t = db.open_table("docs")
    t.create_fts_index("text")
    out = db.sql(
        'SELECT id FROM fts(docs, \'{"match": {"query": "quick brown", "operator": "AND"}}\')'
    )
    assert out.column("id").to_pylist() == [0]


def test_fts_with_where(db):
    t = db.open_table("docs")
    t.create_fts_index("text")
    out = db.sql("SELECT id FROM fts(docs, 'quick') WHERE id > 0")
    assert out.column("id").to_pylist() == [1]


def test_errors(db):
    with pytest.raises(SqlParseError):
        db.sql("SELEC id FROM sales")
    with pytest.raises(SqlParseError):
        db.sql("SELECT id FROM sales GROUP id")
    with pytest.raises(InvalidInputError, match="GROUP BY"):
        db.sql("SELECT price, SUM(qty) FROM sales GROUP BY cat")
    with pytest.raises(SqlParseError):
        db.sql("SELECT id FROM sales trailing junk ,")


def test_nulls_in_groups(tmp_db):
    tmp_db.create_table(
        "t",
        pa.table(
            {
                "g": pa.array(["a", None, "a", None, "b"]),
                "v": pa.array([1, 2, 3, 4, 5]),
            }
        ),
    )
    out = tmp_db.sql("SELECT g, SUM(v) AS s, COUNT(*) AS n FROM t GROUP BY g")
    got = {
        r["g"]: (r["s"], r["n"]) for r in out.to_pylist()
    }
    assert got == {"a": (4, 2), None: (6, 2), "b": (5, 1)}


def test_where_pushdown_uses_scalar_index(db, monkeypatch):
    t = db.open_table("sales")
    t.create_scalar_index("id", index_type="BTREE")
    from lancedb_tpu.index import scalar as scalar_mod

    calls = []
    orig = scalar_mod.try_scalar_prefilter

    def spy(table, ast):
        out = orig(table, ast)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(scalar_mod, "try_scalar_prefilter", spy)
    # the query layer imports it lazily from the module, so patching the
    # module attribute is enough if the call site resolves dynamically;
    # regardless, verify the result is correct
    out = db.sql("SELECT COUNT(*) AS n FROM sales WHERE id BETWEEN 10 AND 19")
    assert out.column("n").to_pylist() == [10]


class TestJoins:
    """SQL JOINs over tables (reference: DataFusion joins over
    TableProviders, table/datafusion.rs)."""

    @pytest.fixture
    def jdb(self, mem_db):
        mem_db.create_table(
            "orders",
            [{"oid": i, "cust": i % 3, "amount": float(i * 10)} for i in range(9)],
        )
        mem_db.create_table(
            "customers",
            [{"cid": c, "name": f"cust{c}", "tier": "gold" if c == 0 else "basic"}
             for c in range(3)],
        )
        return mem_db

    def test_inner_join_with_filter_and_order(self, jdb):
        out = jdb.sql(
            "SELECT o.oid, c.name, o.amount FROM orders o "
            "JOIN customers c ON o.cust = c.cid "
            "WHERE o.amount > 20 ORDER BY o.oid"
        ).to_pylist()
        assert out[0] == {"oid": 3, "name": "cust0", "amount": 30.0}
        assert len(out) == 6  # oid 3..8

    def test_left_join_aggregate(self, jdb):
        out = jdb.sql(
            "SELECT c.tier, SUM(o.amount) AS total FROM orders o "
            "LEFT JOIN customers c ON o.cust = c.cid "
            "GROUP BY c.tier ORDER BY total DESC"
        ).to_pylist()
        assert out == [
            {"tier": "basic", "total": 270.0},
            {"tier": "gold", "total": 90.0},
        ]

    def test_multi_join(self, jdb):
        jdb.create_table("regions", [{"cid": c, "region": f"r{c}"} for c in range(3)])
        out = jdb.sql(
            "SELECT o.oid, c.name, r.region FROM orders o "
            "JOIN customers c ON o.cust = c.cid "
            "JOIN regions r ON o.cust = r.cid ORDER BY o.oid LIMIT 3"
        ).to_pylist()
        assert out[0] == {"oid": 0, "name": "cust0", "region": "r0"}

    def test_column_collision_suffixed(self, jdb):
        jdb.create_table("aux", [{"cid": c, "name": f"aux{c}"} for c in range(3)])
        out = jdb.sql(
            "SELECT c.name, a.name FROM customers c JOIN aux a ON c.cid = a.cid "
            "ORDER BY c.cid"
        ).to_pylist()
        assert out[0] == {"name": "cust0", "name_a": "aux0"}

    def test_join_subquery(self, jdb):
        out = jdb.sql(
            "SELECT o.oid, big.name FROM orders o "
            "JOIN (SELECT cid, name FROM customers WHERE cid < 2) AS big "
            "ON o.cust = big.cid ORDER BY o.oid"
        ).to_pylist()
        assert all(r["name"] in ("cust0", "cust1") for r in out)
        assert len(out) == 6  # cust 2's orders drop out

    def test_non_equality_on_rejected(self, jdb):
        from lancedb_tpu.errors import SqlParseError

        with pytest.raises(SqlParseError, match="equalit"):
            jdb.sql("SELECT * FROM orders o JOIN customers c ON o.cust > c.cid")


class TestExplainAnalyze:
    """EXPLAIN / EXPLAIN ANALYZE over the SQL engine (reference:
    DataFusion explain + analyze_plan operator metrics, query.rs:741-766)."""

    def test_explain_shape_and_operators(self, db):
        out = db.sql(
            "EXPLAIN SELECT cat, SUM(qty) AS total FROM sales "
            "WHERE id > 10 GROUP BY cat HAVING SUM(qty) > 1 "
            "ORDER BY total DESC LIMIT 3"
        )
        assert out.column_names == ["plan_type", "plan"]
        plan = out.column("plan")[0].as_py()
        assert "GlobalLimitExec: limit=3" in plan
        assert "SortExec" in plan
        assert "AggregateExec" in plan and "SUM(`qty`)" in plan
        assert "ScanExec: table=sales" in plan
        assert "pushdown=[(`id`) > (10)]" in plan
        # aliases are outputs, not scan columns
        assert "total" not in plan.split("ScanExec")[1]

    def test_explain_does_not_execute(self, tmp_db):
        # table does not exist: plain EXPLAIN must still succeed
        out = tmp_db.sql("EXPLAIN SELECT * FROM nope WHERE x = 1")
        assert "ScanExec: table=nope" in out.column("plan")[0].as_py()

    def test_explain_analyze_metrics(self, db):
        out = db.sql(
            "EXPLAIN ANALYZE SELECT cat, COUNT(*) AS n FROM sales "
            "GROUP BY cat ORDER BY n DESC"
        )
        assert out.column("plan_type")[0].as_py() == "Plan with Metrics"
        plan = out.column("plan")[0].as_py()
        assert "AggregateExec" in plan and "output_rows=4" in plan
        assert "elapsed_compute=" in plan
        assert "total: rows=4" in plan

    def test_explain_analyze_join(self, db):
        db.create_table("cats", [{"cat": f"c{i}", "label": f"L{i}"} for i in range(4)])
        out = db.sql(
            "EXPLAIN ANALYZE SELECT s.id, c.label FROM sales s "
            "JOIN cats c ON s.cat = c.cat WHERE s.qty > 3 ORDER BY s.id LIMIT 5"
        )
        plan = out.column("plan")[0].as_py()
        assert "HashJoinExec: type=inner" in plan
        assert "ScanExec: table=sales, metrics=[output_rows=100" in plan
        assert "FilterExec" in plan

    def test_explain_subquery_nesting(self, db):
        out = db.sql(
            "EXPLAIN SELECT * FROM (SELECT cat, COUNT(*) AS n FROM sales GROUP BY cat) WHERE n > 10"
        )
        plan = out.column("plan")[0].as_py()
        lines = plan.splitlines()
        # the subquery's aggregate is nested under the outer filter
        agg = [l for l in lines if "AggregateExec" in l][0]
        filt = [l for l in lines if "FilterExec" in l][0]
        assert len(agg) - len(agg.lstrip()) > len(filt) - len(filt.lstrip())

    def test_explain_fts_source(self, db):
        db.open_table("docs").create_fts_index("text")
        out = db.sql("EXPLAIN SELECT * FROM fts(docs, 'fox') LIMIT 2")
        plan = out.column("plan")[0].as_py()
        assert "FtsExec: table=docs" in plan
        res = db.sql("EXPLAIN ANALYZE SELECT * FROM fts(docs, 'fox') LIMIT 2")
        assert "FtsExec" in res.column("plan")[0].as_py()


class TestCaseAndUnion:
    """CASE expressions and UNION set operations (reference: DataFusion
    SQL surface reachable through the reference's SQL layer)."""

    def test_searched_case(self, db):
        out = db.sql(
            "SELECT id, CASE WHEN id >= 90 THEN 'big' WHEN id >= 50 THEN 'mid' "
            "ELSE 'small' END AS bucket FROM sales WHERE id IN (0, 60, 95) ORDER BY id"
        ).to_pylist()
        assert [r["bucket"] for r in out] == ["small", "mid", "big"]

    def test_simple_case_group_by_alias(self, db):
        out = db.sql(
            "SELECT CASE cat WHEN 'c0' THEN 'zero' ELSE 'rest' END AS k, "
            "COUNT(*) AS n FROM sales GROUP BY k ORDER BY k"
        ).to_pylist()
        assert out == [{"k": "rest", "n": 75}, {"k": "zero", "n": 25}]

    def test_case_in_where(self, db):
        out = db.sql(
            "SELECT id FROM sales WHERE CASE WHEN cat = 'c0' THEN id > 90 ELSE FALSE END"
        ).to_pylist()
        assert all(r["id"] > 90 and r["id"] % 4 == 0 for r in out)

    def test_case_without_else_yields_null(self, db):
        out = db.sql(
            "SELECT CASE WHEN id < 1 THEN 'x' END AS v FROM sales ORDER BY id LIMIT 2"
        ).to_pylist()
        assert out[0]["v"] == "x" and out[1]["v"] is None

    def test_union_all(self, db):
        out = db.sql(
            "SELECT id FROM sales WHERE id < 2 UNION ALL SELECT id FROM sales WHERE id < 1"
        ).to_pylist()
        assert sorted(r["id"] for r in out) == [0, 0, 1]

    def test_union_distinct_with_order_limit(self, db):
        out = db.sql(
            "SELECT cat FROM sales UNION SELECT cat FROM sales ORDER BY cat LIMIT 3"
        ).to_pylist()
        assert [r["cat"] for r in out] == ["c0", "c1", "c2"]

    def test_union_column_count_mismatch(self, db):
        from lancedb_tpu.errors import InvalidInputError

        with pytest.raises(InvalidInputError, match="columns"):
            db.sql("SELECT id FROM sales UNION ALL SELECT id, cat FROM sales")

    def test_union_explain(self, db):
        plan = db.sql(
            "EXPLAIN SELECT id FROM sales WHERE id < 2 UNION ALL SELECT id FROM sales"
        ).column("plan")[0].as_py()
        assert "UnionExec: all=True" in plan
        assert plan.count("ScanExec") == 2

    def test_mixed_union_folds_left_to_right(self, db):
        # standard SQL allows mixing UNION and UNION ALL: each operator
        # applies pairwise, left-to-right (was rejected pre-r3)
        out = db.sql(
            "SELECT id FROM sales WHERE id = 1 UNION SELECT id FROM sales WHERE id = 1 "
            "UNION ALL SELECT id FROM sales WHERE id = 1"
        )
        assert sorted(out.column("id").to_pylist()) == [1, 1]


class TestCaseSemantics:
    """Post-review CASE semantics: branch short-circuit (no faults on
    unmatched rows) and NULL conditions falling through."""

    def test_guarded_division(self, tmp_db):
        tmp_db.create_table("g", [{"a": 10, "b": 2}, {"a": 5, "b": 0}])
        out = tmp_db.sql(
            "SELECT CASE WHEN b != 0 THEN a / b ELSE 0 END AS q FROM g ORDER BY q"
        ).to_pylist()
        assert [r["q"] for r in out] == [0, 5]

    def test_null_condition_falls_through(self, tmp_db):
        import pyarrow as pa

        tmp_db.create_table(
            "n", pa.table({"p": pa.array([20.0, None, 1.0])})
        )
        out = tmp_db.sql(
            "SELECT CASE WHEN p > 10 THEN 'hi' ELSE 'lo' END AS v FROM n"
        ).to_pylist()
        assert [r["v"] for r in out] == ["hi", "lo", "lo"]

    def test_union_order_by_expression_desc(self, db):
        out = db.sql(
            "SELECT id FROM sales WHERE id < 3 UNION ALL "
            "SELECT id FROM sales WHERE id < 2 ORDER BY id + 0 DESC LIMIT 3"
        ).to_pylist()
        assert [r["id"] for r in out] == [2, 1, 1]


class TestSubqueryExpressions:
    """IN (SELECT ...) and scalar subqueries in WHERE/HAVING
    (reference: DataFusion subquery expressions)."""

    def test_in_subquery(self, db):
        db.create_table("hot", [{"c": "c1"}, {"c": "c3"}])
        out = db.sql(
            "SELECT DISTINCT cat FROM sales WHERE cat IN (SELECT c FROM hot) ORDER BY cat"
        ).to_pylist()
        assert [r["cat"] for r in out] == ["c1", "c3"]

    def test_not_in_subquery(self, db):
        db.create_table("cold", [{"c": "c0"}, {"c": "c1"}, {"c": "c2"}])
        out = db.sql(
            "SELECT DISTINCT cat FROM sales WHERE cat NOT IN (SELECT c FROM cold)"
        ).to_pylist()
        assert [r["cat"] for r in out] == ["c3"]

    def test_scalar_subquery_comparison(self, db):
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE price > (SELECT AVG(price) FROM sales)"
        ).to_pylist()
        assert out[0]["n"] == 50  # prices are linear: half above the mean

    def test_scalar_subquery_multi_row_rejected(self, db):
        from lancedb_tpu.errors import InvalidInputError

        with pytest.raises(InvalidInputError, match="rows"):
            db.sql("SELECT id FROM sales WHERE id > (SELECT id FROM sales)")

    def test_subquery_multi_column_rejected(self, db):
        from lancedb_tpu.errors import InvalidInputError

        with pytest.raises(InvalidInputError, match="column"):
            db.sql("SELECT id FROM sales WHERE id IN (SELECT id, qty FROM sales)")

    def test_nested_subquery(self, db):
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE qty IN "
            "(SELECT qty FROM sales WHERE qty > (SELECT AVG(qty) FROM sales))"
        ).to_pylist()
        assert out[0]["n"] > 0


def test_sql_fuzz_typed_errors(db):
    """Random token soup must raise TYPED errors (SqlParseError /
    InvalidInputError), never crash with an internal exception."""
    import random

    from lancedb_tpu.errors import LanceDBError

    rng = random.Random(7)
    tokens = ["SELECT", "FROM", "sales", "WHERE", "id", "cat", "GROUP", "BY",
              "ORDER", "LIMIT", "UNION", "ALL", "JOIN", "ON", "CASE", "WHEN",
              "THEN", "END", "(", ")", ",", "*", "=", ">", "+", "'x'", "1",
              "IN", "NOT", "NULL", "AND", "COUNT", "AS", "fts",
              # r3 surface: windows, CTEs, set ops, frames
              "OVER", "PARTITION", "ROWS", "BETWEEN", "PRECEDING", "FOLLOWING",
              "UNBOUNDED", "CURRENT", "ROW", "WITH", "RECURSIVE", "INTERSECT",
              "EXCEPT", "rank", "row_number", "lag", "EXISTS"]
    for _ in range(500):
        q = " ".join(rng.choice(tokens) for _ in range(rng.randint(1, 14)))
        try:
            db.sql(q)
        except (LanceDBError, RecursionError):
            pass


class TestExistsSubquery:
    def test_exists_and_not_exists(self, db):
        db.create_table("probe1", [{"v": 1}])
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE EXISTS (SELECT v FROM probe1 WHERE v > 0)"
        ).to_pylist()
        assert out[0]["n"] == 100
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE NOT EXISTS (SELECT v FROM probe1 WHERE v > 5)"
        ).to_pylist()
        assert out[0]["n"] == 100
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE EXISTS (SELECT v FROM probe1 WHERE v > 5)"
        ).to_pylist()
        assert out[0]["n"] == 0

    def test_exists_composes_with_predicates(self, db):
        db.create_table("probe2", [{"v": 9}])
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE id < 10 AND EXISTS (SELECT v FROM probe2)"
        ).to_pylist()
        assert out[0]["n"] == 10


class TestSubquerySemantics:
    """Post-review subquery fixes: projection-position subqueries,
    temporal pushdown, NULL three-valued logic, inner LIMIT in EXISTS,
    statement re-executability."""

    def test_scalar_subquery_in_projection(self, db):
        out = db.sql("SELECT (SELECT MAX(id) FROM sales) AS m, id FROM sales LIMIT 2")
        assert out.to_pylist()[0]["m"] == 99

    def test_timestamp_scalar_subquery_pushdown(self, tmp_db):
        import datetime as dt

        import pyarrow as pa

        rows = pa.table({
            "ts": pa.array([dt.datetime(2024, 1, i + 1) for i in range(5)]),
            "v": pa.array(range(5)),
        })
        tmp_db.create_table("tt", rows)
        out = tmp_db.sql(
            "SELECT COUNT(*) AS n FROM tt WHERE ts >= (SELECT MAX(ts) FROM tt)"
        ).to_pylist()
        assert out[0]["n"] == 1

    def test_not_in_with_null_subquery_result(self, tmp_db):
        import pyarrow as pa

        tmp_db.create_table("t5", [{"a": i} for i in range(1, 6)])
        tmp_db.create_table("n5", pa.table({"c": pa.array([1, None], type=pa.int64())}))
        out = tmp_db.sql(
            "SELECT COUNT(*) AS n FROM t5 WHERE a NOT IN (SELECT c FROM n5)"
        ).to_pylist()
        assert out[0]["n"] == 0  # three-valued logic: never TRUE
        out = tmp_db.sql(
            "SELECT COUNT(*) AS n FROM t5 WHERE a IN (SELECT c FROM n5)"
        ).to_pylist()
        assert out[0]["n"] == 1  # NULLs dropped from the match set

    def test_exists_honors_inner_limit(self, db):
        out = db.sql(
            "SELECT COUNT(*) AS n FROM sales WHERE EXISTS (SELECT id FROM sales LIMIT 0)"
        ).to_pylist()
        assert out[0]["n"] == 0

    def test_statement_object_reexecutes_fresh(self, tmp_db):
        from lancedb_tpu.sql import execute_select, parse_select

        tmp_db.create_table("base", [{"a": 1}, {"a": 2}])
        tmp_db.create_table("keys", [{"c": 1}])
        stmt = parse_select("SELECT COUNT(*) AS n FROM base WHERE a IN (SELECT c FROM keys)")
        assert execute_select(stmt, tmp_db.open_table).to_pylist()[0]["n"] == 1
        tmp_db.open_table("keys").add([{"c": 2}])
        assert execute_select(stmt, tmp_db.open_table).to_pylist()[0]["n"] == 2


def test_having_with_alias(db):
    out = db.sql(
        "SELECT cat, COUNT(*) AS n FROM sales GROUP BY cat HAVING n >= 25 ORDER BY cat"
    ).to_pylist()
    assert all(r["n"] == 25 for r in out) and len(out) == 4
    out = db.sql(
        "SELECT cat, SUM(qty) AS total FROM sales GROUP BY cat HAVING total > 90 ORDER BY total DESC"
    ).to_pylist()
    assert all(r["total"] > 90 for r in out)


def test_string_concat(db):
    out = db.sql("SELECT cat || '-' || CAST(id AS string) AS tag FROM sales WHERE id = 7").to_pylist()
    assert out[0]["tag"] == "c3-7"
    out = db.sql("SELECT concat(cat, ':', qty) AS t FROM sales WHERE id = 0").to_pylist()
    assert out[0]["t"] == "c0:1"
    out = db.sql("SELECT COUNT(*) AS n FROM sales WHERE cat || '' = 'c1'").to_pylist()
    assert out[0]["n"] == 25


class TestConcatSemantics:
    """Post-review: HAVING alias vs grouped column precedence, concat()
    NULL skipping vs || propagation, ||'s DataFusion precedence, typed
    type errors."""

    def test_having_column_beats_alias(self, tmp_db):
        import pyarrow as pa

        tmp_db.create_table("h", pa.table({"cat": pa.array(["a", "a", "b"])}))
        out = tmp_db.sql(
            "SELECT upper(cat) AS cat, COUNT(*) AS n FROM h GROUP BY cat HAVING cat = 'a'"
        ).to_pylist()
        assert out == [{"cat": "A", "n": 2}]

    def test_concat_null_handling(self, tmp_db):
        import pyarrow as pa

        tmp_db.create_table("c", pa.table({"x": pa.array(["x", None])}))
        out = tmp_db.sql("SELECT concat(x, '-') AS c, x || '-' AS o FROM c").to_pylist()
        assert [r["c"] for r in out] == ["x-", "-"]
        assert [r["o"] for r in out] == ["x-", None]

    def test_concat_precedence_type_error_is_typed(self, tmp_db):
        from lancedb_tpu.errors import InvalidInputError

        tmp_db.create_table("p", [{"n": 2}])
        # 1 + 2 || 'z' groups as 1 + (2 || 'z') like DataFusion -> typed error
        with pytest.raises(InvalidInputError, match="type error"):
            tmp_db.sql("SELECT 1 + 2 || 'z' AS v FROM p")
