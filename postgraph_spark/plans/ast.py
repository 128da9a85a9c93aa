"""Clause IR — the analog of the reference's cypher_nodes.h ExtensibleNode
ASTs (src/include/nodes/cypher_nodes.h): one dataclass per clause /
pattern element / expression form.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

# ------------------------------------------------------------- expressions


@dataclass
class Lit:
    value: Any  # None | bool | int | float | str


@dataclass
class ListLit:
    items: list


@dataclass
class MapLit:
    items: dict  # str -> expr


@dataclass
class Var:
    name: str


@dataclass
class Prop:
    base: Any  # expr (usually Var)
    path: list[str]


@dataclass
class Index:
    base: Any
    index: Any  # expr


@dataclass
class Slice:
    base: Any
    lo: Any | None
    hi: Any | None


@dataclass
class BinOp:
    op: str  # + - * / % ^ = <> < <= > >= AND OR XOR IN STARTS ENDS CONTAINS =~
    left: Any
    right: Any


@dataclass
class UnaryOp:
    op: str  # NOT, -
    operand: Any


@dataclass
class IsNull:
    operand: Any
    negated: bool = False


@dataclass
class BoolTest:
    """IS [NOT] TRUE | FALSE | UNKNOWN (cypher_gram.y:13887-13931
    BooleanTest): never-null boolean result."""

    operand: Any
    which: str  # 'true' | 'false' | 'unknown'
    negated: bool = False


@dataclass
class DistinctFrom:
    """IS [NOT] DISTINCT FROM (cypher_gram.y:13935-13941): null-safe
    comparison — never returns null."""

    left: Any
    right: Any
    negated: bool = False


@dataclass
class WindowSpec:
    """OVER (...) / WINDOW name AS (...) definition
    (cypher_gram.y:17407-17520)."""

    ref_name: Optional[str] = None  # existing window name to extend
    partition_by: list = field(default_factory=list)  # exprs
    order_by: list = field(default_factory=list)  # SortItem
    frame_kind: Optional[str] = None  # 'rows' | 'range' | None (default)
    frame_start: Optional[Any] = None  # 'unbounded' | 'current' | (expr, )
    frame_end: Optional[Any] = None
    frame_start_dir: Optional[str] = None  # 'preceding' | 'following'
    frame_end_dir: Optional[str] = None
    frame_exclude: Optional[str] = None  # 'current' | 'group' | 'ties'


@dataclass
class FuncCall:
    name: str  # lowercase
    args: list
    distinct: bool = False
    star: bool = False  # count(*)
    # decorations (cypher_gram.y:17218: within_group filter over)
    over: Any = None  # WindowSpec | str (named window) | None
    filter_where: Any = None  # FILTER (WHERE expr)
    within_group: list = field(default_factory=list)  # WITHIN GROUP (ORDER BY ...)


@dataclass
class CaseExpr:
    operand: Any | None  # simple CASE operand or None (searched)
    whens: list  # [(cond_or_value, result)]
    default: Any | None


@dataclass
class ExistsPattern:
    """EXISTS ( pattern ) predicate."""

    pattern: "Path"


@dataclass
class SubqueryCmp:
    """Quantified subquery comparison: `expr IN (query)`,
    `expr op ANY/SOME/ALL (query)` (cypher_gram.y:17037-17040,
    17110-17126; sublink transform cypher_expr.c:82,231)."""

    op: str  # = <> < <= > >=
    quant: str  # 'any' | 'all'
    left: Any
    query: Any  # SingleQuery | SetOp producing one column


@dataclass
class Cast:
    """expr :: typename (cypher_gram.y:17107-17109) or a typed literal
    TIMESTAMP '...' / DATE '...' / INTERVAL '...' (g.y:17655+)."""

    operand: Any
    type_name: str  # canonical lowercase: timestamp, timestamptz, date,
    #                 time, timetz, interval, integer, float, numeric,
    #                 string, boolean


# ---------------------------------------------------------------- patterns


@dataclass
class NodePat:
    var: Optional[str]
    label: Optional[str]
    props: Optional[MapLit]


@dataclass
class RelPat:
    var: Optional[str]
    label: Optional[str]
    props: Optional[MapLit]
    direction: str  # 'out' (->), 'in' (<-), 'both'
    varlen: Optional[tuple] = None  # (lo, hi|None); None = fixed single hop


@dataclass
class Path:
    var: Optional[str]  # named path p = (...)
    elements: list  # NodePat, RelPat, NodePat, ...


# ----------------------------------------------------------------- clauses


@dataclass
class SortItem:
    expr: Any
    descending: bool = False
    nulls_first: Optional[bool] = None


@dataclass
class MatchClause:
    paths: list
    where: Any | None = None
    optional: bool = False
    order_by: list = field(default_factory=list)


@dataclass
class ReturnItem:
    expr: Any
    alias: Optional[str]


@dataclass
class GroupSpec:
    """One GROUP BY item: a plain expr, rollup/cube over exprs, empty
    grouping `()`, or GROUPING SETS (cypher_gram.y:4431-4490).
    For kind='grouping_sets', `sets` is the list of expr-lists (an
    empty inner list = the grand-total set)."""

    kind: str  # 'expr' | 'rollup' | 'cube' | 'grouping_sets' | 'empty'
    exprs: list
    sets: list = field(default_factory=list)


@dataclass
class WithClause:
    items: list  # ReturnItem
    distinct: bool = False
    where: Any | None = None
    order_by: list = field(default_factory=list)
    skip: Any | None = None
    limit: Any | None = None
    star: bool = False  # WITH *
    # explicit decorations (cypher_gram.y:5099-5171)
    group_by: list = field(default_factory=list)  # GroupSpec
    having: Any | None = None
    windows: dict = field(default_factory=dict)  # name -> WindowSpec


@dataclass
class ReturnClause:
    items: list
    distinct: bool = False
    order_by: list = field(default_factory=list)
    skip: Any | None = None
    limit: Any | None = None
    #: RETURN * [, items] — expand every in-scope binding (g.y:5177)
    star: bool = False


@dataclass
class UnwindClause:
    expr: Any
    alias: str


@dataclass
class CreateClause:
    paths: list


@dataclass
class SetItem:
    target: Any  # Prop or Var
    expr: Any
    is_add: bool = False  # SET n += map


@dataclass
class SetClause:
    items: list
    is_remove: bool = False


@dataclass
class DeleteClause:
    exprs: list
    detach: bool = False


@dataclass
class MergeClause:
    path: Path


@dataclass
class SingleQuery:
    clauses: list


@dataclass
class SetOp:
    op: str  # 'union' | 'union_all' | 'intersect' | 'except'
    left: Any  # SingleQuery | SetOp
    right: Any
