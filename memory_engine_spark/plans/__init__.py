"""Query plans: QuerySpec IR + compiler to DataFrame pipelines."""

from memory_engine_spark.plans.query_spec import QuerySpec
from memory_engine_spark.plans.compiler import compile_query

__all__ = ["QuerySpec", "compile_query"]
