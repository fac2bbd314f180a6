"""Multi-key sort + offset pagination.

Reference: /root/reference/memory_core/orchestrator/query_language.py:590-626
(sorts with null sentinels, offset/limit slice) and
/root/reference/memory_core/query/query_engine.py:449-471 (pagination with
total_count / has_more / next_offset).

Null-sentinel parity: the reference substitutes ``""`` for nulls ascending
and ``"zzz"`` descending — i.e. nulls sort FIRST ascending and (for typical
lowercase strings) LAST descending. Spark's ``asc_nulls_first`` /
``desc_nulls_last`` reproduce that ordering declaratively without mutating
values.

Pagination at scale: ``offset+limit`` over a global sort is a single
TakeOrderedAndProject when offset+limit is small (Catalyst does this for
``df.orderBy(...).offset(o).limit(n)``); total_count is a separate count
job — the reference also pays it (it len()s the full result list).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SortCriteria:
    """query_types.py:59-67."""

    field: str
    ascending: bool = True


@dataclass
class Page:
    df: DataFrame
    total_count: int
    offset: int
    limit: int | None

    @property
    def has_more(self) -> bool:
        return self.limit is not None and self.offset + self.limit < self.total_count

    @property
    def next_offset(self) -> int | None:
        return self.offset + self.limit if self.has_more else None


def sort_columns(sorts: Sequence[SortCriteria]) -> list[Column]:
    cols = []
    for s in sorts:
        c = F.col(s.field)
        cols.append(c.asc_nulls_first() if s.ascending else c.desc_nulls_last())
    return cols


def apply_sort(df: DataFrame, sorts: Sequence[SortCriteria]) -> DataFrame:
    return df.orderBy(*sort_columns(sorts)) if sorts else df


def paginate(df: DataFrame, offset: int = 0, limit: int | None = None,
             with_total: bool = False) -> Page:
    """Slice [offset, offset+limit). ``df`` must already be sorted for a
    deterministic page. total_count computed only on request (extra job)."""
    total = df.count() if with_total else -1
    out = df
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return Page(out, total, offset, limit)
