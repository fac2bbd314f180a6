"""Filter-compiler semantics vs the reference's 21-operator registry
(/root/reference/memory_core/query/filter_processor.py:51-73,283-424)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from memory_engine_spark.operators.filters import (
    NULL_AS_VALUE, NULL_INCLUDE, FilterCondition, apply_filters,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(id=1, name="Alpha One", score=0.9, tags=["x", "y"], props={"domain": "tech"}),
        Row(id=2, name="beta two", score=0.4, tags=["y"], props={"domain": "bio"}),
        Row(id=3, name=None, score=None, tags=[], props={}),
        Row(id=4, name="Gamma", score=0.5, tags=["x", "z", "w"], props={"domain": "tech"}),
    ]
    return spark.createDataFrame(rows)


def ids(df, *conds):
    return sorted(r["id"] for r in apply_filters(df, list(conds)).collect())


def test_eq_ne_cmp(df):
    assert ids(df, FilterCondition("score", "eq", 0.5)) == [4]
    assert ids(df, FilterCondition("score", "ne", 0.5)) == [1, 2]  # null excluded
    assert ids(df, FilterCondition("score", "gt", 0.4)) == [1, 4]
    assert ids(df, FilterCondition("score", "gte", 0.4)) == [1, 2, 4]
    assert ids(df, FilterCondition("score", "lt", 0.5)) == [2]
    assert ids(df, FilterCondition("score", "lte", 0.5)) == [2, 4]


def test_membership_and_strings(df):
    assert ids(df, FilterCondition("id", "in", [1, 3])) == [1, 3]
    assert ids(df, FilterCondition("id", "not_in", [1, 3])) == [2, 4]
    assert ids(df, FilterCondition("name", "contains", "a One")) == [1]
    assert ids(df, FilterCondition("name", "not_contains", "two")) == [1, 4]
    assert ids(df, FilterCondition("name", "starts_with", "beta")) == [2]
    assert ids(df, FilterCondition("name", "ends_with", "One")) == [1]


def test_case_insensitive(df):
    assert ids(df, FilterCondition("name", "contains", "ALPHA", case_sensitive=False)) == [1]
    assert ids(df, FilterCondition("name", "eq", "gamma", case_sensitive=False)) == [4]


def test_regex_and_guard(df):
    assert ids(df, FilterCondition("name", "regex", r"^[A-Z]\w+ \w+$")) == [1]
    # invalid regex → matches nothing (filter_processor.py:343-356)
    assert ids(df, FilterCondition("name", "regex", "([")) == []
    # oversized pattern → matches nothing
    assert ids(df, FilterCondition("name", "regex", "x" * 1001)) == []


def test_existence_emptiness(df):
    assert ids(df, FilterCondition("name", "exists")) == [1, 2, 4]
    assert ids(df, FilterCondition("name", "not_exists")) == [3]
    assert ids(df, FilterCondition("name", "empty")) == [3]
    assert ids(df, FilterCondition("name", "not_empty")) == [1, 2, 4]


def test_between_and_arrays(df):
    assert ids(df, FilterCondition("score", "between", [0.4, 0.5])) == [2, 4]
    assert ids(df, FilterCondition("tags", "array_contains", "x")) == [1, 4]
    assert ids(df, FilterCondition("tags", "array_length", 1)) == [2]


def test_null_policies(df):
    # include: null rows pass through (filter_processor.py:24-31)
    assert ids(df, FilterCondition("score", "gt", 0.4, null_policy=NULL_INCLUDE)) == [1, 3, 4]
    # as_value: eq compares nulls as values
    assert ids(df, FilterCondition("score", "eq", 0.5, null_policy=NULL_AS_VALUE)) == [4]
    assert ids(df, FilterCondition("score", "ne", 0.5, null_policy=NULL_AS_VALUE)) == [1, 2, 3]


def test_datetime_multi_format_coercion(spark):
    from pyspark.sql import functions as F

    from memory_engine_spark.operators.filters import parse_datetime_multi

    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",), ("2024-01-02T03:04:05",), ("2024-01-02",),
         ("01/15/2024",), ("15-01-2024",), ("2024/01/02",), ("garbage",),
         ("1704164645",)],
        "s string")
    got = [r["t"] for r in
           df.select(parse_datetime_multi(F.col("s")).alias("t")).collect()]
    assert got[0] is not None and got[0].year == 2024 and got[0].second == 5
    assert got[1] == got[0]
    assert got[2].day == 2 and got[3].month == 1 and got[3].day == 15
    assert got[4].day == 15 and got[5].day == 2
    assert got[6] is None                     # unparseable → null
    assert got[7].year == 2024                # epoch-seconds fallback


def test_nested_map_access(df):
    assert ids(df, FilterCondition("props.domain", "eq", "tech")) == [1, 4]


def test_conjunction(df):
    assert ids(df,
               FilterCondition("score", "gte", 0.4),
               FilterCondition("tags", "array_contains", "x")) == [1, 4]
    assert ids(df,
               FilterCondition("score", "gte", 0.4),
               FilterCondition("name", "contains", "beta")) == [2]
