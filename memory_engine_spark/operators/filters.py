"""Filter-condition compiler: the reference's 21 filter operators as
Column expressions.

Reference registry: /root/reference/memory_core/query/filter_processor.py:51-73
(impls :283-424); second 14-op dialect
/root/reference/memory_core/orchestrator/query_language.py:32-49 (eval
:538-588). Every operator maps to a built-in Column op, so predicates stay
JVM-side, participate in whole-stage codegen, and push down to the Parquet
scan — there is no row-at-a-time path.

Semantics replicated exactly:
- conjunctive AND of all conditions (filter_processor.py:84-131)
- null handling: exclude (null rows drop out, the Column-op default) /
  include (null rows pass) / as_value (nulls compared as values)
  (filter_processor.py:24-31,151-157)
- per-condition case_sensitive flag lowering both sides
  (filter_processor.py:171-175)
- dot-path nested field access into the properties bag
  (filter_processor.py:186-223)
- regex guard: pattern ≤1000 chars, invalid pattern → no match
  (filter_processor.py:343-356)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_EXCLUDE = "exclude"
NULL_INCLUDE = "include"
NULL_AS_VALUE = "as_value"

MAX_REGEX_LEN = 1000  # filter_processor.py:345

# filter_processor.py:259-280: the reference tries these formats in
# order when coercing strings to datetimes.
DATETIME_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "dd-MM-yyyy",
    "yyyy/MM/dd",
]


def parse_datetime_multi(col: Column) -> Column:
    """Multi-format datetime coercion (filter_processor.py:259-280):
    first format that parses wins; unparseable → null. ``try_to_timestamp``
    keeps bad rows null instead of failing the job."""
    parsed = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in DATETIME_FORMATS]
    # bare unix-epoch seconds as a final fallback (epoch↔datetime, :262-264);
    # try_cast keeps non-numeric strings null under ANSI mode.
    epoch = F.timestamp_seconds(col.try_cast("double"))
    return F.coalesce(*parsed, epoch)


@dataclass
class FilterCondition:
    """One predicate: ``field <op> value`` (filter_processor.py:34-48)."""

    field: str
    op: str
    value: Any = None
    case_sensitive: bool = True
    null_policy: str = NULL_EXCLUDE


def _resolve(df_or_cols: DataFrame | None, path: str) -> Column:
    """Dot-path resolution. For MAP columns ``props.key`` →
    ``element_at(props, 'key')``; for struct columns native dot access
    works (filter_processor.py:186-223)."""
    if "." not in path or df_or_cols is None:
        return F.col(path)
    head, rest = path.split(".", 1)
    try:
        dtype = dict(df_or_cols.dtypes).get(head, "")
    except Exception:  # pragma: no cover - unanalyzable plans
        dtype = ""
    if dtype.startswith("map"):
        return F.element_at(F.col(head), rest)
    return F.col(path)


def _fold(col: Column, value: Any, case_sensitive: bool) -> tuple[Column, Any]:
    if case_sensitive:
        return col, value
    col = F.lower(col)
    if isinstance(value, str):
        value = value.lower()
    elif isinstance(value, (list, tuple)):
        value = [v.lower() if isinstance(v, str) else v for v in value]
    return col, value


def compile_condition(cond: FilterCondition, df: DataFrame | None = None) -> Column:
    """Compile one FilterCondition to a boolean Column."""
    col = _resolve(df, cond.field)
    op = cond.op
    val = cond.value

    # Existence / emptiness ops ignore case folding.
    if op == "exists":
        return col.isNotNull()
    if op == "not_exists":
        return col.isNull()
    if op == "empty":
        return col.isNull() | (F.length(col.cast("string")) == 0)
    if op == "not_empty":
        return col.isNotNull() & (F.length(col.cast("string")) > 0)
    if op == "null":  # query_language.py dialect
        return col.isNull() if val in (True, None) else col.isNotNull()

    col, val = _fold(col, val, cond.case_sensitive)

    if op == "eq":
        pred = col == F.lit(val)
    elif op == "ne":
        pred = col != F.lit(val)
    elif op == "gt":
        pred = col > F.lit(val)
    elif op == "gte":
        pred = col >= F.lit(val)
    elif op == "lt":
        pred = col < F.lit(val)
    elif op == "lte":
        pred = col <= F.lit(val)
    elif op == "in":
        pred = col.isin(list(val))
    elif op == "not_in":
        pred = ~col.isin(list(val))
    elif op == "contains":
        pred = col.contains(val)
    elif op == "not_contains":
        pred = ~col.contains(val)
    elif op == "starts_with":
        pred = col.startswith(val)
    elif op == "ends_with":
        pred = col.endswith(val)
    elif op == "regex":
        # Guard driver-side like the reference: invalid/oversized → False.
        if not isinstance(val, str) or len(val) > MAX_REGEX_LEN:
            return F.lit(False)
        try:
            re.compile(val)
        except re.error:
            return F.lit(False)
        pred = col.rlike(val)
    elif op == "between":
        lo, hi = val
        pred = col.between(F.lit(lo), F.lit(hi))
    elif op == "date_range":
        lo, hi = val
        ts = F.to_timestamp(col)
        pred = ts.between(F.to_timestamp(F.lit(lo)), F.to_timestamp(F.lit(hi)))
    elif op == "array_contains":
        pred = F.array_contains(col, val)
    elif op == "array_length":
        pred = F.size(col) == F.lit(int(val))
    else:
        raise ValueError(f"unknown filter op: {op!r}")

    if cond.null_policy == NULL_INCLUDE:
        pred = pred | _resolve(df, cond.field).isNull()
    elif cond.null_policy == NULL_AS_VALUE and op in ("eq", "ne"):
        base = _resolve(df, cond.field)
        pred = base.eqNullSafe(F.lit(val)) if op == "eq" else ~base.eqNullSafe(F.lit(val))
    return pred


def apply_filters(df: DataFrame, conditions: Sequence[FilterCondition]) -> DataFrame:
    """Conjunctive AND of all conditions (filter_processor.py:84-131).

    One ``df.filter`` call → Catalyst merges, reorders, and pushes the
    predicates to the scan; the reference's selectivity-based reordering
    (query_optimizer.py:254-298) is subsumed.
    """
    if not conditions:
        return df
    pred = reduce(lambda a, b: a & b, (compile_condition(c, df) for c in conditions))
    return df.filter(pred)


OPS_21 = [
    "eq", "ne", "gt", "gte", "lt", "lte", "in", "not_in", "contains",
    "not_contains", "starts_with", "ends_with", "regex", "exists",
    "not_exists", "empty", "not_empty", "between", "date_range",
    "array_contains", "array_length",
]
