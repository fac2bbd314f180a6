"""QuerySpec — the engine's query IR, mirroring the reference's
GraphQL-like query language and QueryRequest.

Reference: /root/reference/memory_core/orchestrator/query_language.py:104-128
(QuerySpec), :221-331 (QueryBuilder fluent API);
/root/reference/memory_core/query/query_types.py:89-269 (QueryRequest).

A QuerySpec ≅ one SQL SELECT: entity (table), conjunctive filters,
multi-key sort, offset/limit pagination, projection, aggregations. The
compiler (plans/compiler.py) lowers it to a single lazy DataFrame
pipeline so Catalyst sees the whole plan at once — filter pushdown,
column pruning, and TakeOrderedAndProject all apply.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from memory_engine_spark.operators.filters import FilterCondition
from memory_engine_spark.operators.sorting import SortCriteria
from memory_engine_spark.operators.aggregates import Aggregation


@dataclass
class QuerySpec:
    entity: str
    filters: list[FilterCondition] = field(default_factory=list)
    sorts: list[SortCriteria] = field(default_factory=list)
    limit: int | None = None
    offset: int = 0
    include_fields: list[str] | None = None
    exclude_fields: list[str] | None = None
    aggregations: list[Aggregation] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: list[FilterCondition] = field(default_factory=list)

    # -- fluent builder API (query_language.py:221-331) --------------------
    def filter(self, fld: str, op: str, value: Any = None, **kw) -> "QuerySpec":
        self.filters.append(FilterCondition(fld, op, value, **kw))
        return self

    def sort(self, fld: str, ascending: bool = True) -> "QuerySpec":
        self.sorts.append(SortCriteria(fld, ascending))
        return self

    def page(self, offset: int = 0, limit: int | None = None) -> "QuerySpec":
        self.offset, self.limit = offset, limit
        return self

    def select(self, *fields: str) -> "QuerySpec":
        self.include_fields = list(fields)
        return self

    def drop(self, *fields: str) -> "QuerySpec":
        self.exclude_fields = list(fields)
        return self

    def agg(self, op: str, fld: str | None = None, alias: str | None = None) -> "QuerySpec":
        self.aggregations.append(Aggregation(op, fld, alias))
        return self

    def grouping(self, *fields: str) -> "QuerySpec":
        self.group_by = list(fields)
        return self

    # -- validation (query_language.py:131-218 whitelists) -----------------
    def validate(self, allowed_fields: Sequence[str] | None = None) -> None:
        if allowed_fields is None:
            return
        allowed = set(allowed_fields)
        for f_ in self.filters + self.having:
            root = f_.field.split(".", 1)[0]
            if root not in allowed:
                raise ValueError(f"field not queryable: {f_.field!r}")
        for s in self.sorts:
            if s.field.split(".", 1)[0] not in allowed:
                raise ValueError(f"field not sortable: {s.field!r}")
