"""Differential SQL fuzzer: random valid queries run against BOTH the
lancedb_tpu SQL engine and sqlite3, results compared as canonicalized
row multisets.

The grammar is restricted to the semantics the two engines share by
design (no integer division, no collation-sensitive string ordering,
no implicit casts); every query it emits must agree. A divergence is a
bug in one of the engines — historically ours.

Used two ways:
  * tests/test_sql_differential.py runs a seeded slice per CI run
  * `python scripts/fuzz_sql_diff.py [n] [seed]` for long offline runs
"""
from __future__ import annotations

import math
import random
import sqlite3
import sys

import pyarrow as pa

# ---------------------------------------------------------------- data


def make_tables(rng: random.Random):
    """Two small tables with NULLs, duplicates, and negatives.

    t1: id (unique, NOT NULL), a/b ints with NULLs+dups, c float with
    NULLs, s short ASCII text with NULLs.  t2: a (join key), d.
    """
    n1, n2 = 120, 40

    def ints(n, lo, hi, null_p):
        return [None if rng.random() < null_p else rng.randint(lo, hi) for _ in range(n)]

    t1 = {
        "id": list(range(n1)),
        "a": ints(n1, -5, 9, 0.15),
        "b": ints(n1, 0, 4, 0.10),
        "c": [None if rng.random() < 0.12 else round(rng.uniform(-20, 20), 3) for _ in range(n1)],
        "s": [None if rng.random() < 0.10 else rng.choice(["ant", "bee", "cat", "dog", "eel"]) for _ in range(n1)],
    }
    t2 = {
        "a": ints(n2, -5, 9, 0.10),
        "d": ints(n2, -3, 30, 0.10),
    }
    return t1, t2


# ------------------------------------------------------------- grammar


class Gen:
    """Random query generator over the shared SQL subset."""

    NUM_COLS = ["a", "b", "id"]
    FLOAT_COLS = ["c"]
    TEXT_COLS = ["s"]

    def __init__(self, rng: random.Random):
        self.r = rng

    def num_expr(self, depth=0) -> str:
        r = self.r
        if depth >= 2 or r.random() < 0.45:
            return r.choice(self.NUM_COLS + [str(r.randint(-3, 9))])
        pick = r.random()
        a, b = self.num_expr(depth + 1), self.num_expr(depth + 1)
        if pick < 0.35:
            return f"({a} {r.choice(['+', '-', '*'])} {b})"
        if pick < 0.50:
            return f"abs({a})"
        if pick < 0.65:
            return f"coalesce({a}, {b})"
        if pick < 0.80:
            return f"nullif({a}, {b})"
        return (f"CASE WHEN {self.pred(depth + 1)} THEN {a} "
                f"ELSE {b} END")

    def pred(self, depth=0) -> str:
        r = self.r
        if depth >= 2 or r.random() < 0.5:
            pick = r.random()
            if pick < 0.45:
                return f"{self.num_expr(depth + 1)} {r.choice(['<', '<=', '>', '>=', '=', '<>'])} {self.num_expr(depth + 1)}"
            if pick < 0.60:
                col = r.choice(self.NUM_COLS + self.FLOAT_COLS + self.TEXT_COLS)
                return f"{col} IS {'NOT ' if r.random() < 0.5 else ''}NULL"
            if pick < 0.75:
                vals = ", ".join(str(r.randint(-3, 9)) for _ in range(r.randint(1, 4)))
                return f"{r.choice(self.NUM_COLS)} {'NOT ' if r.random() < 0.3 else ''}IN ({vals})"
            if pick < 0.9:
                lo = r.randint(-4, 4)
                return f"{r.choice(self.NUM_COLS)} BETWEEN {lo} AND {lo + r.randint(0, 6)}"
            return f"{self.text_expr()} {'<>' if r.random() < 0.5 else '='} '{r.choice(['ant', 'bee', 'cat', 'ANT'])}'"
        op = self.r.choice(["AND", "OR"])
        neg = "NOT " if self.r.random() < 0.2 else ""
        return f"{neg}({self.pred(depth + 1)} {op} {self.pred(depth + 1)})"

    def text_expr(self) -> str:
        r = self.r
        pick = r.random()
        if pick < 0.4:
            return "s"
        if pick < 0.55:
            return "upper(s)"
        if pick < 0.7:
            return "lower(s)"
        if pick < 0.85:
            return "substr(s, 1, 2)"
        return "s || 'x'"

    def agg(self) -> str:
        r = self.r
        f = r.choice(["count", "sum", "min", "max", "avg", "total"])
        if f == "count" and r.random() < 0.5:
            return "count(*)"
        if f == "total":  # sqlite total() == our coalesce(sum(),0.0)
            e = self.num_expr(1)
            return f"coalesce(sum({e}), 0) + 0"
        return f"{f}({self.num_expr(1)})"

    def window(self) -> str:
        r = self.r
        part = f"PARTITION BY {r.choice(['b', 'a'])}" if r.random() < 0.7 else ""
        order = "ORDER BY id"
        fn = r.choice([
            "row_number()", "rank()", "dense_rank()",
            "percent_rank()", "cume_dist()", f"ntile({r.randint(1, 5)})",
            f"sum({r.choice(self.NUM_COLS)})",
            f"min({r.choice(self.NUM_COLS)})",
            f"max({r.choice(self.NUM_COLS)})",
            f"avg({r.choice(self.NUM_COLS)})",
            f"count({r.choice(self.NUM_COLS)})",
            f"lag({r.choice(self.NUM_COLS)})",
            f"lag({r.choice(self.NUM_COLS)}, {r.randint(1, 3)})",
            f"lead({r.choice(self.NUM_COLS)})",
            f"first_value({r.choice(self.NUM_COLS)})",
            f"last_value({r.choice(self.NUM_COLS)})",
            f"nth_value({r.choice(self.NUM_COLS)}, {r.randint(1, 3)})",
        ])
        frameable = fn.startswith(("sum", "min", "max", "avg", "count",
                                   "first_value", "last_value", "nth_value"))
        frame = ""
        if frameable and r.random() < 0.5:
            lo = r.choice(["UNBOUNDED PRECEDING", "2 PRECEDING", "CURRENT ROW"])
            hi = r.choice(["CURRENT ROW", "1 FOLLOWING", "UNBOUNDED FOLLOWING"])
            if (lo, hi) != ("CURRENT ROW", "CURRENT ROW"):
                frame = f" ROWS BETWEEN {lo} AND {hi}"
        inner = " ".join(x for x in (part, order) if x)
        return f"{fn} OVER ({inner}{frame})"

    # ---- statement shapes ------------------------------------------

    def simple_select(self) -> str:
        r = self.r
        items = [f"{self.num_expr()} AS e{i}" for i in range(r.randint(1, 3))]
        where = f" WHERE {self.pred()}" if r.random() < 0.8 else ""
        sql = f"SELECT id, {', '.join(items)} FROM t1{where}"
        if r.random() < 0.4:
            sql += f" ORDER BY id {'DESC' if r.random() < 0.5 else 'ASC'} LIMIT {r.randint(1, 20)}"
        return sql

    def grouped(self) -> str:
        r = self.r
        key = r.choice(["b", "a", "s", "length(s)", "abs(a)"])
        key_alias = f"{key} AS k" if "(" in key else key
        aggs = [f"{self.agg()} AS g{i}" for i in range(r.randint(1, 3))]
        where = f" WHERE {self.pred()}" if r.random() < 0.6 else ""
        having = ""
        if r.random() < 0.4:
            hv = r.choice([f"count(*) > {r.randint(0, 3)}",
                           f"max({r.choice(self.NUM_COLS)}) >= {r.randint(-2, 5)}",
                           f"sum({r.choice(self.NUM_COLS)}) < {r.randint(5, 60)}"])
            having = f" HAVING {hv}"
        return f"SELECT {key_alias}, {', '.join(aggs)} FROM t1{where} GROUP BY {key}{having}"

    def windowed(self) -> str:
        r = self.r
        items = [f"{self.window()} AS w{i}" for i in range(r.randint(1, 2))]
        where = f" WHERE {self.pred()}" if r.random() < 0.5 else ""
        return f"SELECT id, {', '.join(items)} FROM t1{where}"

    def joined(self) -> str:
        r = self.r
        jt = r.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN"])
        where = f" WHERE {self.pred()}" if r.random() < 0.5 and jt == "JOIN" else ""
        return (f"SELECT t1.id, t1.a, t2.d FROM t1 {jt} t2 ON t1.a = t2.a{where}")

    def setop(self) -> str:
        r = self.r
        op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        p1 = f"SELECT a, b FROM t1 WHERE {self.pred()}"
        p2 = f"SELECT a, b FROM t1 WHERE {self.pred()}"
        return f"{p1} {op} {p2}"

    def cte(self) -> str:
        r = self.r
        inner = self.grouped() if r.random() < 0.5 else self.simple_select()
        # project only named columns out of the CTE
        return f"WITH x AS ({inner}) SELECT * FROM x WHERE 1 = 1"

    def correlated(self) -> str:
        r = self.r
        op = "EXISTS" if r.random() < 0.6 else "NOT EXISTS"
        return (f"SELECT id, a FROM t1 WHERE {op} "
                f"(SELECT 1 FROM t2 WHERE t2.a = t1.a AND t2.d > {r.randint(-2, 8)})")

    def scalar_sub(self) -> str:
        return ("SELECT id, a, (SELECT max(d) FROM t2 WHERE t2.a = t1.a) AS m "
                "FROM t1 WHERE b IS NOT NULL")

    def nulls_ordered(self) -> str:
        # explicit NULLS FIRST/LAST on a nullable key, id tiebreak makes
        # the total order deterministic for exact row comparison
        r = self.r
        key = r.choice(["a", "b", "c"])
        d1 = r.choice(["ASC", "DESC"])
        fl = r.choice(["FIRST", "LAST"])
        return (f"SELECT id, {key} FROM t1 ORDER BY {key} {d1} NULLS {fl}, "
                f"id ASC LIMIT {r.randint(5, 40)}")

    def statement(self) -> str:
        shapes = [self.simple_select, self.grouped, self.windowed, self.joined,
                  self.setop, self.cte, self.correlated, self.scalar_sub,
                  self.nulls_ordered]
        w = [4, 3, 3, 2, 2, 2, 2, 1, 2]
        return self.r.choices(shapes, weights=w, k=1)[0]()


# ---------------------------------------------------------- comparison


def _canon_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate float-vs-int representation and accumulation order
        return round(v, 6)
    return v


def canon(rows: list[tuple]) -> list[tuple]:
    out = [tuple(_canon_val(v) for v in r) for r in rows]
    return sorted(out, key=lambda r: tuple((v is None, str(type(v)), str(v)) for v in r))


def run_ours(db, sql: str) -> list[tuple]:
    t = db.sql(sql)
    cols = [t.column(i).to_pylist() for i in range(t.num_columns)]
    return list(zip(*cols)) if cols else []


def run_sqlite(cur, sql: str) -> list[tuple]:
    return cur.execute(sql).fetchall()


def ordered_prefix(sql: str) -> bool:
    """Deterministic row order: ORDER BY with the unique id column as a
    key (leading or tiebreak) plus LIMIT."""
    if "LIMIT" not in sql or "ORDER BY" not in sql:
        return False
    tail = sql.rsplit("ORDER BY", 1)[1]
    return tail.lstrip().startswith("id") or ", id" in tail


def compare(sql: str, ours: list[tuple], theirs: list[tuple]) -> str | None:
    if ordered_prefix(sql):
        a = [tuple(_canon_val(v) for v in r) for r in ours]
        b = [tuple(_canon_val(v) for v in r) for r in theirs]
    else:
        a, b = canon(ours), canon(theirs)
    if a != b:
        diff_a = [r for r in a if r not in b][:3]
        diff_b = [r for r in b if r not in a][:3]
        return (f"rows {len(a)} vs {len(b)}; ours-extra={diff_a} "
                f"sqlite-extra={diff_b}")
    return None


# -------------------------------------------------------------- driver


def setup(seed: int, indexes: bool = False):
    import lancedb_tpu

    rng = random.Random(seed)
    t1, t2 = make_tables(rng)
    db = lancedb_tpu.connect("memory://")
    tb1 = db.create_table("t1", pa.table({k: pa.array(v) for k, v in t1.items()}), mode="overwrite")
    db.create_table("t2", pa.table({k: pa.array(v) for k, v in t2.items()}), mode="overwrite")
    if indexes:
        # exercise the scalar-index WHERE pushdown path: results must
        # be identical to the unindexed scan (and to sqlite)
        tb1.create_scalar_index("id", index_type="BTREE")
        tb1.create_scalar_index("a", index_type="BTREE")
        tb1.create_scalar_index("b", index_type="BITMAP")
        tb1.create_scalar_index("s", index_type="BITMAP")

    con = sqlite3.connect(":memory:")
    cur = con.cursor()
    cur.execute("CREATE TABLE t1 (id INTEGER, a INTEGER, b INTEGER, c REAL, s TEXT)")
    cur.execute("CREATE TABLE t2 (a INTEGER, d INTEGER)")
    cur.executemany("INSERT INTO t1 VALUES (?,?,?,?,?)",
                    list(zip(*[t1[k] for k in ("id", "a", "b", "c", "s")])))
    cur.executemany("INSERT INTO t2 VALUES (?,?)", list(zip(t2["a"], t2["d"])))
    return db, cur, Gen(rng)


def fuzz(n: int, seed: int, verbose: bool = False,
         indexes: bool = False) -> list[tuple[str, str]]:
    db, cur, gen = setup(seed, indexes=indexes)
    failures = []
    for i in range(n):
        sql = gen.statement()
        try:
            theirs = run_sqlite(cur, sql)
        except sqlite3.Error as e:  # grammar bug, not an engine bug
            if verbose:
                print(f"[{i}] sqlite rejected: {e}\n    {sql}")
            continue
        try:
            ours = run_ours(db, sql)
        except Exception as e:
            failures.append((sql, f"ours raised {type(e).__name__}: {e}"))
            continue
        msg = compare(sql, ours, theirs)
        if msg:
            failures.append((sql, msg))
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = fuzz(n, seed, verbose="-v" in sys.argv)
    print(f"{n} queries, {len(fails)} divergences")
    for sql, msg in fails[:20]:
        print(f"--- {msg}\n    {sql}")
    sys.exit(1 if fails else 0)
