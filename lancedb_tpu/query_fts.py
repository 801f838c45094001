"""Full-text query AST (reference python query.py:387-590: MatchQuery,
PhraseQuery, BoostQuery, MultiMatchQuery, BooleanQuery with `&`/`|`
operator overloads)."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Union


class Occur(str, Enum):
    SHOULD = "SHOULD"
    MUST = "MUST"
    MUST_NOT = "MUST_NOT"


class Operator(str, Enum):
    AND = "AND"
    OR = "OR"


class FtsQueryNode:
    def __and__(self, other: "FtsQueryNode") -> "BooleanQuery":
        return BooleanQuery([(Occur.MUST, self), (Occur.MUST, other)])

    def __or__(self, other: "FtsQueryNode") -> "BooleanQuery":
        return BooleanQuery([(Occur.SHOULD, self), (Occur.SHOULD, other)])


@dataclass
class MatchQuery(FtsQueryNode):
    """Term-bag BM25 match over one column."""

    query: str
    column: str | None = None
    boost: float = 1.0
    fuzziness: int = 0
    max_expansions: int = 50
    operator: Operator = Operator.OR
    prefix_length: int = 0

    def __repr__(self) -> str:
        return f"MatchQuery({self.query!r}, column={self.column})"


@dataclass
class PhraseQuery(FtsQueryNode):
    """Exact phrase with optional slop (requires positions)."""

    query: str
    column: str | None = None
    slop: int = 0

    def __repr__(self) -> str:
        return f'PhraseQuery("{self.query}", column={self.column}, slop={self.slop})'


@dataclass
class BoostQuery(FtsQueryNode):
    """score = positive − negative_boost × negative."""

    positive: FtsQueryNode
    negative: FtsQueryNode
    negative_boost: float = 0.5


@dataclass
class MultiMatchQuery(FtsQueryNode):
    """Match across several columns, max-combined with per-column boosts."""

    query: str
    columns: list[str]
    boosts: list[float] | None = None
    operator: Operator = Operator.OR

    def __post_init__(self):
        if self.boosts is None:
            self.boosts = [1.0] * len(self.columns)
        if len(self.boosts) != len(self.columns):
            raise ValueError("boosts must match columns")


@dataclass
class BooleanQuery(FtsQueryNode):
    """List of (occur, query) clauses."""

    queries: list[tuple[Occur, FtsQueryNode]] = field(default_factory=list)

    def __and__(self, other: FtsQueryNode) -> "BooleanQuery":
        return BooleanQuery(self.queries + [(Occur.MUST, other)])

    def __or__(self, other: FtsQueryNode) -> "BooleanQuery":
        return BooleanQuery(self.queries + [(Occur.SHOULD, other)])


FtsQuery = Union[str, FtsQueryNode]


def parse_string_query(query: str, columns: list[str] | None) -> FtsQueryNode:
    """A plain string is a MatchQuery; quoted strings become phrases
    (reference python behavior: `"exact phrase"` syntax)."""
    q = query.strip()
    col = columns[0] if columns else None
    if len(q) >= 2 and q[0] == '"' and q[-1] == '"':
        return PhraseQuery(q[1:-1], col)
    if columns and len(columns) > 1:
        return MultiMatchQuery(q, columns)
    return MatchQuery(q, col)
