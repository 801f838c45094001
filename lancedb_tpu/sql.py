"""SQL SELECT engine over lancedb-tpu tables.

The reference executes full SQL through DataFusion: `BaseTable` is a
DataFusion `TableProvider` with filter pushdown (reference
rust/lancedb/src/table/datafusion.rs:37-44) and full-text search is
reachable from SQL through the `fts(table, query)` table function
(reference rust/lancedb/src/table/datafusion/udtf/fts.rs:16-51). This
module implements that surface natively:

  SELECT [DISTINCT] items FROM source [WHERE p] [GROUP BY e,..]
  [HAVING p] [ORDER BY e [ASC|DESC],..] [LIMIT n] [OFFSET m]

* `source` is a table name, `fts(table, 'query' [, k])`, or a
  parenthesised sub-select.
* Aggregates: COUNT(*) / COUNT(x) / COUNT(DISTINCT x) / SUM / AVG /
  MIN / MAX, freely nested in scalar expressions.
* WHERE over a base table is pushed down into the storage scan (and
  from there into scalar indexes via the existing prefilter path);
  projection pushdown reads only referenced columns.

Row-wise expression evaluation reuses filters/eval.py (pyarrow
compute); grouping/aggregation runs on pyarrow group_by kernels. This
is a host-side engine by design — the reference's DataFusion layer is
also CPU-side; the device is for vector/FTS scans, which enter SQL
through fts() and (via query builders) the search APIs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

from .errors import InvalidInputError, SqlParseError
from .filters.eval import evaluate_expression, evaluate_predicate_mask
from .filters.sql import (
    Between,
    BinaryOp,
    Case,
    Cast,
    Column,
    Expr,
    FunctionCall,
    Literal,
    UnaryOp,
    _Parser,
)

AGG_NAMES = {"count", "sum", "avg", "min", "max"}
# clause-boundary words (not reserved in the expression grammar, so the
# statement parser stops expression parsing when it sees one)
_CLAUSE_WORDS = {
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
    "BY", "ASC", "DESC", "DISTINCT", "SELECT", "UNION",
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "ON",
}


@dataclass(frozen=True)
class Star(Expr):
    def sql(self) -> str:
        return "*"


@dataclass(frozen=True)
class Aggregate(Expr):
    func: str          # count | count_distinct | count_all | sum | avg | min | max
    arg: Expr | None   # None for count(*)

    def sql(self) -> str:
        if self.func == "count_all":
            return "COUNT(*)"
        if self.func == "count_distinct":
            return f"COUNT(DISTINCT {self.arg.sql()})"
        return f"{self.func.upper()}({self.arg.sql()})"


@dataclass
class SelectItem:
    expr: Expr
    alias: str | None

    @property
    def name(self) -> str:
        if self.alias:
            return self.alias
        if isinstance(self.expr, Column):
            return self.expr.name
        return self.expr.sql().lower()


@dataclass
class TableSource:
    kind: str                       # 'table' | 'fts' | 'subquery'
    name: str | None = None         # table name
    fts_query: Expr | None = None   # fts() args
    fts_k: Expr | None = None
    subquery: "SelectStatement | None" = None
    alias: str | None = None


@dataclass
class Join:
    """One JOIN clause (reference: DataFusion joins over registered
    TableProviders — table/datafusion.rs). Equality keys only."""

    source: TableSource
    how: str                        # 'inner' | 'left outer' | 'right outer' | 'full outer'
    on: list[tuple[Expr, Expr]]     # AND-ed equality pairs


@dataclass
class SelectStatement:
    items: list[SelectItem]
    source: TableSource
    joins: list["Join"] = field(default_factory=list)
    where: Expr | None = None
    group_by: list[Expr] = field(default_factory=list)
    having: Expr | None = None
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)  # (expr, desc)
    limit: int | None = None
    offset: int = 0
    distinct: bool = False


@dataclass(frozen=True)
class Exists(Expr):
    """EXISTS (SELECT ...) — uncorrelated; resolves to a boolean
    literal before execution (correlated subqueries are not supported,
    matching the pushdown-friendly subset)."""

    stmt: "SelectStatement" = None  # type: ignore[assignment]

    def sql(self) -> str:
        return "EXISTS (<subquery>)"


@dataclass(frozen=True)
class Subquery(Expr):
    """A parenthesized SELECT used as an expression — IN (SELECT ...)
    or a scalar comparison (reference: DataFusion subquery expressions).
    Resolved to literal values before execution/pushdown."""

    stmt: "SelectStatement" = None  # type: ignore[assignment]

    def sql(self) -> str:
        return "(<subquery>)"


@dataclass
class UnionStatement:
    """UNION [ALL] chain (reference: DataFusion set operations). The
    trailing ORDER BY/LIMIT/OFFSET of the final member bind to the
    whole union, per standard SQL."""

    selects: list[SelectStatement]
    all: bool = False
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int = 0


class _SelectParser(_Parser):
    """Statement-level parser; expressions delegate to the filter grammar."""

    def _at_word(self, *words: str) -> bool:
        t = self.peek()
        return t.kind in ("ident", "kw") and t.text.upper() in words

    def _eat_word(self, word: str) -> bool:
        if self._at_word(word):
            self.next()
            return True
        return False

    def _at_subquery(self) -> bool:
        if self.peek().kind != "lparen":
            return False
        t2 = self.toks[self.i + 1]
        return t2.kind in ("ident", "kw") and t2.text.upper() == "SELECT"

    def _parse_subquery(self) -> "Subquery":
        self.expect("lparen")
        stmt = self.parse_select()
        self.expect("rparen")
        return Subquery(stmt)

    def parse_paren_list(self) -> Expr:
        # IN (SELECT ...) — subquery instead of a literal list
        if self._at_subquery():
            return self._parse_subquery()
        return super().parse_paren_list()

    def parse_primary(self) -> Expr:
        if self._at_subquery():
            return self._parse_subquery()
        if self._at_word("EXISTS"):
            self.next()
            if not self._at_subquery():
                raise SqlParseError("expected (SELECT ...) after EXISTS")
            return Exists(self._parse_subquery().stmt)
        # aggregates (incl. COUNT(*) / COUNT(DISTINCT x)) before the
        # generic function-call rule
        t = self.peek()
        if t.kind == "ident" and t.text.lower() in AGG_NAMES:
            if self.toks[self.i + 1].kind == "lparen":
                fname = t.text.lower()
                self.next()
                self.next()  # lparen
                if fname == "count" and self.peek().kind == "op" and self.peek().text == "*":
                    self.next()
                    self.expect("rparen")
                    return Aggregate("count_all", None)
                distinct = False
                if fname == "count" and self._at_word("DISTINCT"):
                    self.next()
                    distinct = True
                arg = self.parse_or()
                self.expect("rparen")
                return Aggregate("count_distinct" if distinct else fname, arg)
        return super().parse_primary()

    def parse_expr_list(self) -> list[Expr]:
        out = [self.parse_or()]
        while self.peek().kind == "comma":
            self.next()
            out.append(self.parse_or())
        return out

    def parse_select(self) -> SelectStatement:
        if not self._eat_word("SELECT"):
            raise SqlParseError("expected SELECT")
        distinct = bool(self._eat_word("DISTINCT"))
        items: list[SelectItem] = []
        while True:
            if self.peek().kind == "op" and self.peek().text == "*":
                self.next()
                items.append(SelectItem(Star(), None))
            else:
                e = self.parse_or()
                alias = None
                if self.accept_kw("AS"):
                    alias = self.expect("ident").text
                elif self.peek().kind == "ident" and not self._at_word(*_CLAUSE_WORDS):
                    alias = self.next().text
                items.append(SelectItem(e, alias))
            if self.peek().kind == "comma":
                self.next()
                continue
            break
        if not self._eat_word("FROM"):
            raise SqlParseError("expected FROM")
        source = self._parse_source()
        joins: list[Join] = []
        while True:
            how = None
            if self._eat_word("INNER"):
                how = "inner"
            elif self._eat_word("LEFT"):
                self._eat_word("OUTER")
                how = "left outer"
            elif self._eat_word("RIGHT"):
                self._eat_word("OUTER")
                how = "right outer"
            elif self._eat_word("FULL"):
                self._eat_word("OUTER")
                how = "full outer"
            if how is not None:
                if not self._eat_word("JOIN"):
                    raise SqlParseError("expected JOIN")
            elif self._eat_word("JOIN"):
                how = "inner"
            else:
                break
            right = self._parse_source()
            if not self._eat_word("ON"):
                raise SqlParseError("expected ON after JOIN")
            joins.append(Join(source=right, how=how, on=_eq_pairs(self.parse_or())))
        where = self.parse_or() if self._eat_word("WHERE") else None
        group_by: list[Expr] = []
        if self._eat_word("GROUP"):
            if not self._eat_word("BY"):
                raise SqlParseError("expected BY after GROUP")
            group_by = self.parse_expr_list()
        having = self.parse_or() if self._eat_word("HAVING") else None
        order_by: list[tuple[Expr, bool]] = []
        if self._eat_word("ORDER"):
            if not self._eat_word("BY"):
                raise SqlParseError("expected BY after ORDER")
            while True:
                e = self.parse_or()
                desc = False
                if self._eat_word("DESC"):
                    desc = True
                else:
                    self._eat_word("ASC")
                order_by.append((e, desc))
                if self.peek().kind == "comma":
                    self.next()
                    continue
                break
        limit = None
        offset = 0
        if self._eat_word("LIMIT"):
            limit = int(self.expect("number").text)
        if self._eat_word("OFFSET"):
            offset = int(self.expect("number").text)
        return SelectStatement(
            items=items, source=source, joins=joins, where=where, group_by=group_by,
            having=having, order_by=order_by, limit=limit, offset=offset,
            distinct=distinct,
        )

    def _parse_source(self) -> TableSource:
        t = self.peek()
        if t.kind == "lparen":
            self.next()
            sub = self.parse_select()
            self.expect("rparen")
            alias = None
            if self.accept_kw("AS"):
                alias = self.expect("ident").text
            elif self.peek().kind == "ident" and not self._at_word(*_CLAUSE_WORDS):
                alias = self.next().text
            return TableSource(kind="subquery", subquery=sub, alias=alias)
        name = self.expect("ident").text
        if name.lower() == "fts" and self.peek().kind == "lparen":
            self.next()
            tbl = self.next()
            if tbl.kind not in ("ident", "string"):
                raise SqlParseError("fts() first argument must be a table name")
            self.expect("comma")
            q = self.parse_or()
            k = None
            if self.peek().kind == "comma":
                self.next()
                k = self.parse_or()
            self.expect("rparen")
            src = TableSource(kind="fts", name=tbl.text, fts_query=q, fts_k=k)
        else:
            src = TableSource(kind="table", name=name)
        if self.accept_kw("AS"):
            src.alias = self.expect("ident").text
        elif self.peek().kind == "ident" and not self._at_word(*_CLAUSE_WORDS):
            src.alias = self.next().text
        return src


def _eq_pairs(cond: Expr) -> list[tuple[Expr, Expr]]:
    """Flatten an ON condition into equality pairs (AND-ed `a.x = b.y`)."""
    if isinstance(cond, BinaryOp) and cond.op == "and":
        return _eq_pairs(cond.left) + _eq_pairs(cond.right)
    if isinstance(cond, BinaryOp) and cond.op == "eq" and isinstance(cond.left, Column) and isinstance(cond.right, Column):
        return [(cond.left, cond.right)]
    raise SqlParseError(
        "JOIN ... ON supports AND-ed column equalities (a.x = b.y); got "
        f"{cond.sql()!r}"
    )


def parse_select(sql: str) -> "SelectStatement | UnionStatement":
    p = _SelectParser(sql)
    stmt = p.parse_select()
    selects = [stmt]
    is_all = None
    while p._eat_word("UNION"):
        this_all = bool(p._eat_word("ALL"))
        if not this_all:
            p._eat_word("DISTINCT")
        if is_all is None:
            is_all = this_all
        elif is_all != this_all:
            raise SqlParseError("mixed UNION / UNION ALL is not supported")
        selects.append(p.parse_select())
    if p.peek().kind != "eof":
        t = p.peek()
        raise SqlParseError(f"unexpected trailing token {t.text!r} at {t.pos}")
    if len(selects) == 1:
        return stmt
    # standard SQL: the trailing ORDER BY/LIMIT of the text bind to the
    # union, not the last member (the member parser consumed them)
    last = selects[-1]
    union = UnionStatement(
        selects, all=bool(is_all),
        order_by=last.order_by, limit=last.limit, offset=last.offset,
    )
    last.order_by, last.limit, last.offset = [], None, 0
    return union


# --------------------------------------------------------------- analysis

def _walk(e: Expr):
    yield e
    if isinstance(e, BinaryOp):
        yield from _walk(e.left)
        yield from _walk(e.right)
    elif isinstance(e, UnaryOp):
        yield from _walk(e.operand)
    elif isinstance(e, Between):
        yield from _walk(e.operand)
        yield from _walk(e.low)
        yield from _walk(e.high)
    elif isinstance(e, FunctionCall):
        for a in e.args:
            yield from _walk(a)
    elif isinstance(e, Cast):
        yield from _walk(e.operand)
    elif isinstance(e, Case):
        for c, v in e.whens:
            yield from _walk(c)
            yield from _walk(v)
        if e.else_ is not None:
            yield from _walk(e.else_)
    elif isinstance(e, Aggregate) and e.arg is not None:
        yield from _walk(e.arg)


def _columns_of(exprs) -> set[str]:
    out: set[str] = set()
    for e in exprs:
        if e is None:
            continue
        for n in _walk(e):
            if isinstance(n, Column):
                out.add(n.name.split(".")[0])
    return out


def _find_aggs(exprs) -> list[Aggregate]:
    found: dict[str, Aggregate] = {}
    for e in exprs:
        if e is None:
            continue
        for n in _walk(e):
            if isinstance(n, Aggregate):
                found.setdefault(n.sql(), n)
    return list(found.values())


def _replace(e: Expr, table: dict[str, Expr]) -> Expr:
    """Rewrite: any sub-expression whose .sql() is in `table` becomes the
    mapped expression (used to bind aggregates / group keys to columns)."""
    key = e.sql()
    if key in table:
        return table[key]
    if isinstance(e, BinaryOp):
        return BinaryOp(e.op, _replace(e.left, table), _replace(e.right, table))
    if isinstance(e, UnaryOp):
        return UnaryOp(e.op, _replace(e.operand, table))
    if isinstance(e, Between):
        return Between(
            _replace(e.operand, table), _replace(e.low, table),
            _replace(e.high, table), e.negated,
        )
    if isinstance(e, FunctionCall):
        return FunctionCall(e.name, tuple(_replace(a, table) for a in e.args))
    if isinstance(e, Cast):
        return Cast(_replace(e.operand, table), e.type_name)
    if isinstance(e, Case):
        return Case(
            tuple((_replace(c, table), _replace(v, table)) for c, v in e.whens),
            _replace(e.else_, table) if e.else_ is not None else None,
        )
    if isinstance(e, Aggregate) and e.arg is not None:
        return Aggregate(e.func, _replace(e.arg, table))
    return e


# --------------------------------------------------------------- execution

_PA_AGG = {
    "count": "count",
    "count_distinct": "count_distinct",
    "count_all": "count_all",
    "sum": "sum",
    "avg": "mean",
    "min": "min",
    "max": "max",
}


def execute_select(
    sql_or_stmt: str | SelectStatement,
    open_table: Callable[[str], Any],
) -> pa.Table:
    """Run a SELECT. `open_table(name)` resolves table names."""
    from .query import _op_timer

    stmt = parse_select(sql_or_stmt) if isinstance(sql_or_stmt, str) else sql_or_stmt
    if isinstance(stmt, UnionStatement):
        return _execute_union(stmt, open_table)

    # resolve subquery expressions in every clause, on a COPY — the
    # caller's statement object must stay re-executable (resolution
    # bakes in one execution's subquery results)
    if _has_subqueries(stmt):
        rs = lambda e: _resolve_subqueries(e, open_table)
        import copy as _copy

        stmt = _copy.copy(stmt)
        stmt.items = [
            it if isinstance(it.expr, Star) else SelectItem(rs(it.expr), it.alias)
            for it in stmt.items
        ]
        stmt.where = rs(stmt.where) if stmt.where is not None else None
        stmt.having = rs(stmt.having) if stmt.having is not None else None
        stmt.group_by = [rs(e) for e in stmt.group_by]
        stmt.order_by = [(rs(e), d) for e, d in stmt.order_by]
    elif stmt.group_by:
        # the alias-resolution below mutates group_by — copy first
        import copy as _copy

        stmt = _copy.copy(stmt)
        stmt.group_by = list(stmt.group_by)

    if stmt.joins:
        data, stmt = _load_joined(stmt, open_table)
    else:
        data = _load_source(stmt, open_table)

    # GROUP BY <alias>: resolve select-item aliases to their expressions
    # (standard SQL / DataFusion behavior)
    if stmt.group_by:
        alias_map = {
            it.alias: it.expr for it in stmt.items
            if it.alias and not isinstance(it.expr, Star)
        }
        stmt.group_by = [
            alias_map.get(e.name, e) if isinstance(e, Column) and e.name not in data.column_names
            else e
            for e in stmt.group_by
        ]

    all_exprs = (
        [it.expr for it in stmt.items]
        + stmt.group_by
        + [stmt.having]
        + [e for e, _ in stmt.order_by]
    )
    aggs = _find_aggs(all_exprs)
    grouped = bool(stmt.group_by) or bool(aggs)

    if grouped:
        with _op_timer("AggregateExec") as tm:
            out = _execute_grouped(stmt, data, aggs)
            tm.set_rows(out.num_rows)
    else:
        with _op_timer("ProjectionExec") as tm:
            out = _execute_plain(stmt, data)
            tm.set_rows(out.num_rows)

    if stmt.offset or stmt.limit is not None:
        with _op_timer("GlobalLimitExec") as tm:
            if stmt.offset:
                out = out.slice(stmt.offset)
            if stmt.limit is not None:
                out = out.slice(0, stmt.limit)
            tm.set_rows(out.num_rows)
    return out


def _has_subqueries(stmt: "SelectStatement") -> bool:
    exprs = (
        [it.expr for it in stmt.items if not isinstance(it.expr, Star)]
        + stmt.group_by
        + [stmt.having, stmt.where]
        + [e for e, _ in stmt.order_by]
    )
    return any(
        isinstance(n, (Subquery, Exists))
        for e in exprs if e is not None
        for n in _walk(e)
    )


def _resolve_subqueries(e: Expr, open_table) -> Expr:
    """Replace Subquery nodes with literal values: the RHS of IN/NOT IN
    becomes a value list; any other position is a scalar subquery
    (one column, at most one row; zero rows -> NULL)."""

    def run(sub: Subquery, want_list: bool):
        out = execute_select(sub.stmt, open_table)
        if out.num_columns != 1:
            raise InvalidInputError(
                f"subquery must return exactly one column (got {out.num_columns})"
            )
        vals = out.column(0).to_pylist()
        if want_list:
            return Literal(vals)
        if len(vals) > 1:
            raise InvalidInputError(
                f"scalar subquery returned {len(vals)} rows"
            )
        return Literal(vals[0] if vals else None)

    def rw(node: Expr) -> Expr:
        if isinstance(node, Exists):
            inner = node.stmt
            probe = execute_select(
                SelectStatement(
                    items=inner.items, source=inner.source,
                    joins=inner.joins, where=inner.where,
                    group_by=inner.group_by, having=inner.having,
                    order_by=[],
                    # existence needs at most one surviving row, but the
                    # inner LIMIT/OFFSET are part of the row set
                    limit=1 if inner.limit is None else min(inner.limit, 1),
                    offset=inner.offset,
                ),
                open_table,
            )
            return Literal(probe.num_rows > 0)
        if isinstance(node, Subquery):
            return run(node, want_list=False)
        if isinstance(node, BinaryOp):
            if node.op in ("in", "not_in") and isinstance(node.right, Subquery):
                lst = run(node.right, want_list=True)
                if any(v is None for v in lst.value):
                    # SQL three-valued logic: x NOT IN (..., NULL) is
                    # never TRUE; x IN drops NULLs (match only on values)
                    if node.op == "not_in":
                        return Literal(False)
                    lst = Literal([v for v in lst.value if v is not None])
                return BinaryOp(node.op, rw(node.left), lst)
            return BinaryOp(node.op, rw(node.left), rw(node.right))
        if isinstance(node, UnaryOp):
            return UnaryOp(node.op, rw(node.operand))
        if isinstance(node, Between):
            return Between(rw(node.operand), rw(node.low), rw(node.high), node.negated)
        if isinstance(node, FunctionCall):
            return FunctionCall(node.name, tuple(rw(a) for a in node.args))
        if isinstance(node, Cast):
            return Cast(rw(node.operand), node.type_name)
        if isinstance(node, Case):
            return Case(
                tuple((rw(c), rw(v)) for c, v in node.whens),
                rw(node.else_) if node.else_ is not None else None,
            )
        return node

    return rw(e)


def _execute_union(stmt: UnionStatement, open_table) -> pa.Table:
    from .query import _op_timer

    parts = [execute_select(sel, open_table) for sel in stmt.selects]
    first = parts[0]
    aligned = [first]
    for t in parts[1:]:
        if t.num_columns != first.num_columns:
            raise InvalidInputError(
                f"UNION members have {first.num_columns} vs {t.num_columns} columns"
            )
        aligned.append(t.rename_columns(first.column_names))
    with _op_timer("UnionExec") as tm:
        out = pa.concat_tables(aligned, promote_options="default")
        if not stmt.all:
            out = out.group_by(out.column_names).aggregate([])
        tm.set_rows(out.num_rows)
    if stmt.order_by:
        # reuse the SELECT sort machinery: expression keys evaluate
        # against the union output, DESC honored
        sorter = SelectStatement(
            items=[SelectItem(Star(), None)],
            source=stmt.selects[0].source,
            order_by=stmt.order_by,
        )
        with _op_timer("SortExec"):
            out = _apply_order(sorter, out, env=out)
    if stmt.offset:
        out = out.slice(stmt.offset)
    if stmt.limit is not None:
        out = out.slice(0, stmt.limit)
    return out


# -------------------------------------------------------- explain/analyze


def plan_select(stmt) -> list[tuple[int, str, str]]:
    """Physical plan tree for a SELECT as (indent, op_key, label) rows —
    the op_key matches the _op_timer labels execute_select records, so
    analyze can join metrics onto plan lines (the same contract the
    reference gets from DataFusion operator metrics, query.rs:756)."""
    if isinstance(stmt, UnionStatement):
        lines = [(0, "UnionExec", f"UnionExec: all={stmt.all}")]
        for sel in stmt.selects:
            for d, k, label in plan_select(sel):
                lines.append((d + 1, k, label))
        return lines

    all_exprs = (
        [it.expr for it in stmt.items]
        + stmt.group_by
        + [stmt.having]
        + [e for e, _ in stmt.order_by]
    )
    aggs = _find_aggs(all_exprs)
    grouped = bool(stmt.group_by) or bool(aggs)

    lines: list[tuple[int, str, str]] = []
    depth = 0

    def emit(key: str, label: str):
        nonlocal depth
        lines.append((depth, key, label))
        depth += 1

    if stmt.limit is not None or stmt.offset:
        emit("GlobalLimitExec", f"GlobalLimitExec: limit={stmt.limit} offset={stmt.offset}")
    if stmt.distinct:
        emit("DistinctExec", "DistinctExec")
    if stmt.order_by:
        keys = ", ".join(
            f"{e.sql()} {'DESC' if d else 'ASC'}" for e, d in stmt.order_by
        )
        emit("SortExec", f"SortExec: [{keys}]")
    if grouped:
        emit(
            "AggregateExec",
            "AggregateExec: group_by=[%s], aggs=[%s]%s"
            % (
                ", ".join(e.sql() for e in stmt.group_by) or "",
                ", ".join(a.sql() for a in aggs),
                f", having=[{stmt.having.sql()}]" if stmt.having is not None else "",
            ),
        )
    else:
        emit(
            "ProjectionExec",
            "ProjectionExec: [%s]" % ", ".join(it.name for it in stmt.items),
        )
    if stmt.joins:
        if stmt.where is not None:
            emit("FilterExec", f"FilterExec: [{stmt.where.sql()}]")
        join_depth = depth
        for j in reversed(stmt.joins):
            on = " AND ".join(f"{a.sql()} = {b.sql()}" for a, b in j.on)
            lines.append((join_depth, "HashJoinExec", f"HashJoinExec: type={j.how} on=[{on}]"))
            join_depth += 1
        base_depth = join_depth
        lines.append(
            (base_depth, f"ScanExec:{stmt.source.name}", _scan_label(stmt.source, None, None))
        )
        for i, j in enumerate(stmt.joins):
            lines.append(
                (base_depth - i, f"ScanExec:{j.source.name}", _scan_label(j.source, None, None))
            )
    else:
        src = stmt.source
        if src.kind == "fts":
            emit(
                f"FtsExec:{src.name}",
                f"FtsExec: table={src.name} query={src.fts_query.sql()}"
                + (f" k={src.fts_k.sql()}" if src.fts_k is not None else ""),
        )
        elif src.kind == "subquery":
            if stmt.where is not None:
                emit("FilterExec", f"FilterExec: [{stmt.where.sql()}]")
            for d, k, label in plan_select(src.subquery):
                lines.append((depth + d, k, label))
        else:
            has_star = any(isinstance(it.expr, Star) for it in stmt.items)
            aliases = {it.alias for it in stmt.items if it.alias}
            needed = None if has_star else sorted(
                _columns_of(
                    [it.expr for it in stmt.items]
                    + stmt.group_by
                    + [stmt.having, stmt.where]
                    + [e for e, _ in stmt.order_by]
                )
                - aliases
            )
            emit(f"ScanExec:{src.name}", _scan_label(src, stmt.where, needed))
    return lines


def _scan_label(src: TableSource, where, needed) -> str:
    if src.kind == "subquery":
        return "SubqueryExec"
    label = f"ScanExec: table={src.name}"
    if needed is not None:
        label += f" projection=[{', '.join(needed)}]"
    if where is not None:
        label += f" pushdown=[{where.sql()}]"
    return label


def explain_select(sql_or_stmt: str | SelectStatement) -> str:
    """Textual physical plan without executing (reference explain_plan
    over the DataFusion SQL layer)."""
    stmt = parse_select(sql_or_stmt) if isinstance(sql_or_stmt, str) else sql_or_stmt
    return "\n".join("  " * d + label for d, _, label in plan_select(stmt))


def analyze_select(
    sql_or_stmt: str | SelectStatement,
    open_table: Callable[[str], Any],
) -> tuple[str, pa.Table]:
    """Execute a SELECT collecting per-operator metrics; returns the
    annotated plan text and the result (reference analyze_plan —
    DataFusion-style `metrics=[...]` per plan line)."""
    import time as _time

    from .query import _PLAN_METRICS

    stmt = parse_select(sql_or_stmt) if isinstance(sql_or_stmt, str) else sql_or_stmt
    op_metrics: dict = {}
    token = _PLAN_METRICS.set(op_metrics)
    try:
        t0 = _time.perf_counter()
        out = execute_select(stmt, open_table)
        elapsed = _time.perf_counter() - t0
    finally:
        _PLAN_METRICS.reset(token)
    plan = plan_select(stmt)
    # metrics are recorded per operator NAME; when a plan repeats a name
    # (subqueries, self-joins) the record is a sum over instances —
    # render it once, flagged as aggregated, instead of repeating the
    # total on every matching line
    key_counts: dict = {}
    for _, key, _ in plan:
        key_counts[key] = key_counts.get(key, 0) + 1
    shown: set = set()
    rendered = []
    for d, key, label in plan:
        rec = op_metrics.get(key)
        if rec and key not in shown:
            shown.add(key)
            bits = []
            if "output_rows" in rec:
                bits.append(f"output_rows={rec['output_rows']}")
            bits.append(f"elapsed_compute={rec['elapsed_s'] * 1e3:.2f}ms")
            if rec.get("invocations", 1) > 1:
                bits.append(f"invocations={rec['invocations']}")
            if key_counts[key] > 1:
                bits.append(f"aggregated_over={key_counts[key]} plan nodes")
            label += ", metrics=[%s]" % ", ".join(bits)
        rendered.append("  " * d + label)
    rendered.append(
        f"total: rows={out.num_rows} elapsed={elapsed * 1e3:.2f}ms"
    )
    return "\n".join(rendered), out


def _load_joined(stmt: SelectStatement, open_table) -> tuple[pa.Table, SelectStatement]:
    """Execute the FROM ... JOIN chain with Arrow hash joins; returns the
    joined table and the statement with qualified column references
    rewritten to the joined table's (possibly suffixed) column names.

    Reference behavior: DataFusion joins over TableProviders
    (table/datafusion.rs). Equality keys only; colliding non-key right
    columns are suffixed `_<alias>` (qualify them in SQL to address)."""

    from .query import _op_timer

    def load(src: TableSource) -> pa.Table:
        if src.kind == "table":
            with _op_timer(f"ScanExec:{src.name}") as tm:
                out = open_table(src.name).search(None).limit(None).to_arrow()
                tm.set_rows(out.num_rows)
            return out
        if src.kind == "subquery":
            return execute_select(src.subquery, open_table)
        raise InvalidInputError("fts() sources cannot be joined directly; wrap in a subquery")

    def side_of(col: Column) -> tuple[str | None, str]:
        if "." in col.name:
            q, c = col.name.split(".", 1)
            return q, c
        return None, col.name

    data = load(stmt.source)
    env: dict[str, Expr] = {}

    def register(alias: str | None, names, suffix: str = ""):
        if alias is None:
            return
        for c in names:
            env[Column(f"{alias}.{c}").sql()] = Column(f"{c}{suffix}")

    base_alias = stmt.source.alias or stmt.source.name
    register(base_alias, data.schema.names)
    for j in stmt.joins:
        right = load(j.source)
        ralias = j.source.alias or j.source.name
        lkeys, rkeys = [], []
        for a, b in j.on:
            qa, ca = side_of(a)
            qb, cb = side_of(b)
            # orient the pair: the side qualified by the right alias is
            # the right key; anything else resolves against the left
            if qb == ralias or (qa == base_alias and qb is None):
                lq, lc, rc = qa, ca, cb
            elif qa == ralias:
                lq, lc, rc = qb, cb, ca
            else:
                lq, lc, rc = qa, ca, cb
            left_ref = env.get(Column(f"{lq}.{lc}").sql()) if lq else None
            lkeys.append(left_ref.name if isinstance(left_ref, Column) else lc)
            rkeys.append(rc)
        collide = (set(right.schema.names) - set(rkeys)) & set(data.schema.names)
        suffix = f"_{ralias}" if collide else ""
        with _op_timer("HashJoinExec") as tm:
            data = data.join(
                right, keys=lkeys, right_keys=rkeys, join_type=j.how,
                right_suffix=suffix or None,
            )
            tm.set_rows(data.num_rows)
        register(
            ralias,
            right.schema.names,
        )
        if suffix:
            for c in collide:
                env[Column(f"{ralias}.{c}").sql()] = Column(f"{c}{suffix}")
        # join keys coalesce into the left name
        for lc, rc in zip(lkeys, rkeys):
            env[Column(f"{ralias}.{rc}").sql()] = Column(lc)

    def rw(e):
        return _replace(e, env) if e is not None else None

    new_stmt = SelectStatement(
        items=[SelectItem(rw(it.expr), it.alias) for it in stmt.items],
        source=stmt.source,
        joins=[],
        where=None,
        group_by=[rw(e) for e in stmt.group_by],
        having=rw(stmt.having),
        order_by=[(rw(e), d) for e, d in stmt.order_by],
        limit=stmt.limit,
        offset=stmt.offset,
        distinct=stmt.distinct,
    )
    if stmt.where is not None:
        with _op_timer("FilterExec") as tm:
            mask = evaluate_predicate_mask(data, rw(stmt.where))
            data = data.filter(pa.array(mask))
            tm.set_rows(data.num_rows)
    return data, new_stmt


def _load_source(stmt: SelectStatement, open_table) -> pa.Table:
    src = stmt.source
    has_star = any(isinstance(it.expr, Star) for it in stmt.items)
    needed = None
    if not has_star:
        # select-item aliases shadow base columns in ORDER BY/HAVING —
        # they are outputs, not scan columns
        aliases = {it.alias for it in stmt.items if it.alias}
        needed = sorted(
            _columns_of(
                [it.expr for it in stmt.items]
                + stmt.group_by
                + [stmt.having, stmt.where]
                + [e for e, _ in stmt.order_by]
            )
            - aliases
        )
    if src.kind == "table":
        from .query import _op_timer

        tbl = open_table(src.name)
        qb = tbl.search(None)
        if stmt.where is not None:
            qb = qb.where(stmt.where.sql())  # pushdown (incl. scalar indexes)
        if needed is not None:
            cols = [c for c in needed if c in tbl.schema.names]
            if cols:
                qb = qb.select(cols)
        with _op_timer(f"ScanExec:{src.name}") as tm:
            out = qb.to_arrow()
            tm.set_rows(out.num_rows)
        return out
    if src.kind == "fts":
        tbl = open_table(src.name)
        qv = src.fts_query
        if not isinstance(qv, Literal) or not isinstance(qv.value, str):
            raise InvalidInputError("fts() query must be a string literal")
        query: Any = qv.value
        if query.lstrip().startswith("{"):
            # reference udtf/fts.rs accepts a JSON-encoded structured
            # query; map it onto the FTS query AST
            query = _fts_query_from_json(query)
        k = tbl.count_rows()
        if src.fts_k is not None:
            if not isinstance(src.fts_k, Literal):
                raise InvalidInputError("fts() k must be an integer literal")
            k = int(src.fts_k.value)
        from .query import _op_timer

        with _op_timer(f"FtsExec:{src.name}") as tm:
            out = tbl._execute_fts(
                query, k=k, filter=stmt.where.sql() if stmt.where else None
            )
            tm.set_rows(out.num_rows)
        return out
    if src.kind == "subquery":
        from .query import _op_timer

        data = execute_select(src.subquery, open_table)
        if stmt.where is not None:
            with _op_timer("FilterExec") as tm:
                mask = evaluate_predicate_mask(data, stmt.where)
                data = data.filter(pa.array(mask))
                tm.set_rows(data.num_rows)
        return data
    raise AssertionError(src.kind)


def _fts_query_from_json(text: str):
    import json

    from .query_fts import BooleanQuery, BoostQuery, MatchQuery, PhraseQuery

    def build(doc):
        if "match" in doc:
            m = doc["match"]
            return MatchQuery(
                m["query"], m.get("column"),
                operator=m.get("operator", "OR"),
                fuzziness=m.get("fuzziness", 0),
            )
        if "phrase" in doc:
            p = doc["phrase"]
            return PhraseQuery(p["query"], p.get("column"), slop=p.get("slop", 0))
        if "boost" in doc:
            b = doc["boost"]
            return BoostQuery(
                build(b["positive"]), build(b["negative"]),
                negative_boost=b.get("negative_boost", 0.5),
            )
        if "boolean" in doc:
            b = doc["boolean"]
            clauses = []
            for occur in ("should", "must", "must_not"):
                for sub in b.get(occur, []):
                    clauses.append((occur.replace("_", " ").upper(), build(sub)))
            return BooleanQuery(clauses)
        raise InvalidInputError(f"unsupported fts JSON query: {list(doc)}")

    return build(json.loads(text))


def _execute_plain(stmt: SelectStatement, data: pa.Table) -> pa.Table:
    out_cols: dict[str, pa.Array] = {}
    for it in stmt.items:
        if isinstance(it.expr, Star):
            for name in data.column_names:
                out_cols[name] = data.column(name)
        else:
            out_cols[it.name] = _as_array(evaluate_expression(data, it.expr), data.num_rows)
    from .query import _op_timer

    out = pa.table(out_cols)
    if stmt.distinct:
        # DISTINCT precedes ORDER BY; afterwards sort keys must be
        # output columns (standard SQL restriction for DISTINCT)
        with _op_timer("DistinctExec") as tm:
            out = out.group_by(out.column_names).aggregate([])
            tm.set_rows(out.num_rows)
        if stmt.order_by:
            with _op_timer("SortExec"):
                out = _apply_order(stmt, out, env=out)
        return out
    if stmt.order_by:
        with _op_timer("SortExec"):
            out = _apply_order(stmt, out, env=data)
    return out


def _execute_grouped(stmt: SelectStatement, data: pa.Table, aggs: list[Aggregate]) -> pa.Table:
    for it in stmt.items:
        if isinstance(it.expr, Star):
            raise InvalidInputError("SELECT * cannot be combined with GROUP BY / aggregates")

    # pre-group columns: group keys + aggregate inputs
    pre: dict[str, pa.Array] = {}
    binding: dict[str, Expr] = {}  # expr.sql() -> Column placeholder
    key_names: list[str] = []
    for i, ge in enumerate(stmt.group_by):
        name = f"__gk{i}"
        pre[name] = _as_array(evaluate_expression(data, ge), data.num_rows)
        binding[ge.sql()] = Column(name)
        key_names.append(name)
    agg_specs: list[tuple] = []
    n_count_all = 0
    for j, ag in enumerate(aggs):
        pa_fn = _PA_AGG[ag.func]
        if ag.func == "count_all":
            if n_count_all == 0:
                agg_specs.append(([], "count_all"))
                n_count_all = 1
            binding[ag.sql()] = Column("count_all")
        else:
            name = f"__ain{j}"
            pre[name] = _as_array(evaluate_expression(data, ag.arg), data.num_rows)
            agg_specs.append((name, pa_fn))
            binding[ag.sql()] = Column(f"{name}_{pa_fn}")

    pre_tbl = pa.table(pre) if pre else pa.table({"__one": pa.array([1] * data.num_rows)})

    if key_names:
        env = pre_tbl.group_by(key_names).aggregate(agg_specs)
    else:
        # single implicit group
        env_cols: dict[str, pa.Array] = {}
        for spec in agg_specs:
            col, fn = spec
            if fn == "count_all":
                env_cols["count_all"] = pa.array([data.num_rows], type=pa.int64())
                continue
            arr = pre_tbl.column(col)
            if fn == "count":
                val = pc.count(arr).as_py()
            elif fn == "count_distinct":
                val = pc.count_distinct(arr).as_py()
            elif fn == "mean":
                val = pc.mean(arr).as_py()
            else:
                val = getattr(pc, fn)(arr).as_py()
            env_cols[f"{col}_{fn}"] = pa.array([val])
        env = pa.table(env_cols) if env_cols else pa.table({"__dummy": pa.array([0])})

    # group keys with nulls: pyarrow group_by keeps null groups (SQL too)
    if stmt.having is not None:
        # HAVING may reference select-item aliases (HAVING n > 3 for
        # COUNT(*) AS n) — standard SQL / DataFusion behavior
        having_binding = dict(binding)
        for it in stmt.items:
            if it.alias and not isinstance(it.expr, Star):
                # standard SQL: a grouped COLUMN of the same name takes
                # precedence over the select alias in HAVING
                having_binding.setdefault(
                    Column(it.alias).sql(), _replace(it.expr, binding)
                )
        mask = evaluate_predicate_mask(env, _replace(stmt.having, having_binding))
        env = env.filter(pa.array(mask))

    out_cols: dict[str, pa.Array] = {}
    for it in stmt.items:
        bound = _replace(it.expr, binding)
        for n in _walk(bound):
            if isinstance(n, Aggregate):
                raise InvalidInputError(
                    f"aggregate {n.sql()} not resolvable (is it missing from GROUP BY context?)"
                )
            if isinstance(n, Column) and not n.name.startswith("__") and n.name not in env.column_names:
                raise InvalidInputError(
                    f"column {n.name!r} must appear in GROUP BY or inside an aggregate"
                )
        out_cols[it.name] = _as_array(evaluate_expression(env, bound), env.num_rows)
    from .query import _op_timer

    out = pa.table(out_cols)
    if stmt.distinct:
        with _op_timer("DistinctExec") as tm:
            out = out.group_by(out.column_names).aggregate([])
            tm.set_rows(out.num_rows)
        if stmt.order_by:
            with _op_timer("SortExec"):
                out = _apply_order(stmt, out, env=out)
        return out
    if stmt.order_by:
        with _op_timer("SortExec"):
            out = _apply_order(stmt, out, env=env, binding=binding)
    return out


def _apply_order(
    stmt: SelectStatement, out: pa.Table, env: pa.Table, binding: dict[str, Expr] | None = None
) -> pa.Table:
    sort_cols = []
    aux: dict[str, pa.Array] = {}
    alias_map = {it.name: it.expr for it in stmt.items if not isinstance(it.expr, Star)}
    for idx, (e, desc) in enumerate(stmt.order_by):
        direction = "descending" if desc else "ascending"
        # alias or projected column reference → sort the output column
        if isinstance(e, Column) and e.name in out.column_names:
            sort_cols.append((e.name, direction))
            continue
        if isinstance(e, Column) and e.name in alias_map:
            sort_cols.append((e.name, direction))
            continue
        be = _replace(e, binding) if binding else e
        arr = _as_array(evaluate_expression(env, be), env.num_rows)
        name = f"__ord{idx}"
        aux[name] = arr
        sort_cols.append((name, direction))
    if aux:
        if out.num_rows != env.num_rows:
            raise InvalidInputError("ORDER BY expression must be computable on the result")
        combined = out
        for n, a in aux.items():
            combined = combined.append_column(n, a)
        idxs = pc.sort_indices(combined, sort_keys=sort_cols)
        return out.take(idxs)
    return out.sort_by(sort_cols)


def _as_array(v, num_rows: int) -> pa.Array:
    if isinstance(v, pa.ChunkedArray):
        return v.combine_chunks()
    if isinstance(v, pa.Array):
        return v
    if isinstance(v, pa.Scalar):
        return pa.array([v.as_py()] * num_rows, type=v.type)
    return pa.array([v] * num_rows)
