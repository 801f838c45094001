"""SQL predicate parser + evaluator tests (dialect coverage mirrors the
filters exercised in reference python tests test_query.py / test_table.py)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.errors import SqlParseError
from lancedb_tpu.filters import (
    evaluate_expression,
    evaluate_predicate_mask,
    parse_sql_expr,
    referenced_columns,
)


@pytest.fixture
def data():
    return pa.table(
        {
            "i": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "f": pa.array([0.5, 1.5, 2.5, None, 4.5], type=pa.float64()),
            "s": pa.array(["apple", "banana", "Cherry", None, "apple pie"]),
            "b": pa.array([True, False, True, None, False]),
        }
    )


def mask(data, expr):
    return evaluate_predicate_mask(data, expr).tolist()


def test_comparisons(data):
    assert mask(data, "i > 2") == [False, False, False, True, True]
    assert mask(data, "i >= 2 AND i <= 3") == [False, False, True, True, False]
    assert mask(data, "i = 1 OR i == 3") == [False, True, False, True, False]
    assert mask(data, "i != 0") == [False, True, True, True, True]
    assert mask(data, "i <> 0") == [False, True, True, True, True]


def test_null_semantics(data):
    # NULL comparisons are not matches (SQL WHERE semantics)
    assert mask(data, "f > 0") == [True, True, True, False, True]
    assert mask(data, "f IS NULL") == [False, False, False, True, False]
    assert mask(data, "f IS NOT NULL") == [True, True, True, False, True]
    assert mask(data, "NOT (f > 1)") == [True, False, False, False, False]


def test_in_between_like(data):
    assert mask(data, "i IN (1, 3)") == [False, True, False, True, False]
    assert mask(data, "i NOT IN (1, 3)") == [True, False, True, False, True]
    assert mask(data, "i BETWEEN 1 AND 3") == [False, True, True, True, False]
    assert mask(data, "i NOT BETWEEN 1 AND 3") == [True, False, False, False, True]
    assert mask(data, "s LIKE 'apple%'") == [True, False, False, False, True]
    assert mask(data, "s NOT LIKE 'apple%'") == [False, True, True, False, False]


def test_arithmetic_and_functions(data):
    assert mask(data, "i * 2 + 1 >= 7") == [False, False, False, True, True]
    assert mask(data, "i % 2 = 0") == [True, False, True, False, True]
    assert mask(data, "lower(s) = 'cherry'") == [False, False, True, False, False]
    assert mask(data, "length(s) > 6") == [False, False, False, False, True]
    assert mask(data, "contains(s, 'pie')") == [False, False, False, False, True]
    assert mask(data, "starts_with(s, 'ba')") == [False, True, False, False, False]


def test_string_escapes(data):
    d = pa.table({"s": pa.array(["it's", "plain"])})
    assert evaluate_predicate_mask(d, "s = 'it''s'").tolist() == [True, False]


def test_boolean_column(data):
    assert mask(data, "b") == [True, False, True, False, False]
    assert mask(data, "b IS TRUE") == [True, False, True, False, False]
    assert mask(data, "b IS FALSE") == [False, True, False, False, True]


def test_cast(data):
    assert mask(data, "CAST(f AS int) = 2") == [False, False, True, False, False]


def test_quoted_identifiers():
    d = pa.table({"weird col": pa.array([1, 2])})
    assert evaluate_predicate_mask(d, "`weird col` = 2").tolist() == [False, True]


def test_expression_eval(data):
    out = evaluate_expression(data, "i * 10")
    assert out.to_pylist() == [0, 10, 20, 30, 40]
    out = evaluate_expression(data, "upper(s)")
    assert out.to_pylist()[0] == "APPLE"


def test_referenced_columns():
    ast = parse_sql_expr("a > 1 AND lower(b) = 'x' OR c BETWEEN d AND 5")
    assert referenced_columns(ast) == {"a", "b", "c", "d"}


def test_parse_errors():
    with pytest.raises(SqlParseError):
        parse_sql_expr("a >")
    with pytest.raises(SqlParseError):
        parse_sql_expr("")
    with pytest.raises(SqlParseError):
        parse_sql_expr("a = 'unterminated")
    with pytest.raises(SqlParseError):
        parse_sql_expr("a = 1 extra")


def test_sql_roundtrip():
    exprs = [
        "(`a`) > (1)",
        "((`a`) > (1)) AND ((`b`) = ('x'))",
    ]
    for e in exprs:
        assert parse_sql_expr(e).sql() == parse_sql_expr(parse_sql_expr(e).sql()).sql()


def test_string_functions_extended(data):
    def ev(e):
        return evaluate_expression(data, e).to_pylist()

    assert ev("substr(s, 1, 3)") == ["app", "ban", "Che", None, "app"]
    assert ev("substring(s, 7)") == ["", "", "", None, "pie"]
    assert ev("replace(s, 'a', '@')") == ["@pple", "b@n@n@", "Cherry", None, "@pple pie"]
    assert ev("strpos(s, 'an')") == [0, 2, 0, None, 0]
    assert ev("left(s, 2)") == ["ap", "ba", "Ch", None, "ap"]
    assert ev("right(s, 3)") == ["ple", "ana", "rry", None, "pie"]
    assert ev("reverse(left(s, 3))") == ["ppa", "nab", "ehC", None, "ppa"]
    assert ev("initcap(s)") == ["Apple", "Banana", "Cherry", None, "Apple Pie"]
    assert ev("split_part(s, ' ', 2)") == ["", "", "", None, "pie"]
    assert ev("lpad('7', 3, '0')")[0] == "007"


def test_numeric_conditional_functions(data):
    def ev(e):
        return evaluate_expression(data, e).to_pylist()

    assert ev("nullif(i, 2)") == [0, 1, None, 3, 4]
    assert ev("ifnull(f, 0.0)") == [0.5, 1.5, 2.5, 0.0, 4.5]
    assert ev("nvl(f, -1.0)")[3] == -1.0
    assert ev("sign(f - 1.0)") == [-1.0, 1.0, 1.0, None, 1.0]
    assert ev("trunc(f)") == [0.0, 1.0, 2.0, None, 4.0]
    import math

    got = ev("atan2(1.0, 1.0)")[0]
    assert abs(got - math.pi / 4) < 1e-12
    assert abs(ev("log(2.0, 8.0)")[0] - 3.0) < 1e-12
    assert ev("log(100.0)")[0] == 2.0


def test_array_has_and_date_trunc():
    data = pa.table({
        "tags": pa.array([["red", "blue"], ["green"], None, []]),
        "ts": pa.array([1755400000000000] * 4, type=pa.timestamp("us")),
    })

    def ev(e):
        return evaluate_expression(data, e).to_pylist()

    assert ev("array_has(tags, 'red')") == [True, False, None, False]
    d = ev("date_trunc('day', ts)")[0]
    assert (d.hour, d.minute, d.second) == (0, 0, 0)


class TestHexLiterals:
    """X'..' blob literals (DataFusion/standard SQL binary syntax)."""

    def test_binary_equality_and_index(self, mem_db):
        import pyarrow as pa

        fsb = pa.table({
            "id": pa.array([1, 2, 3]),
            "h": pa.array([b"aa", b"bb", b"aa"], pa.binary(2)),
        })
        t = mem_db.create_table("hexlit", fsb, mode="overwrite")
        assert t.count_rows("h = X'6161'") == 2
        t.create_scalar_index("h", index_type="BITMAP")
        assert t.count_rows("h = X'6161'") == 2
        assert t.count_rows("h = x'6262'") == 1
        # identifiers starting with x are unaffected
        t2 = mem_db.create_table("xcol_t", pa.table({"xcol": [1, 2]}), mode="overwrite")
        assert t2.count_rows("xcol = 1") == 1
        import pytest as _pytest

        from lancedb_tpu.errors import SqlParseError

        with _pytest.raises(SqlParseError):
            t.count_rows("h = X'zz'")
