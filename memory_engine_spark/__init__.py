"""memory_engine_spark — PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of Celebr4tion/memory-engine (see SURVEY.md): a semantic
knowledge-graph engine whose data model (knowledge nodes, typed edges,
embeddings, revisions, events) maps to columnar DataFrames over Parquet,
whose query surface (filter/sort/aggregate/paginate pipelines, graph
traversal, semantic similarity search, synthesis analytics) compiles to
declarative DataFrame plans optimized by Catalyst, and whose streaming
event bus maps to Structured Streaming.

Design stance (scale-first):
- All operators are expressed with built-in ``pyspark.sql.functions`` so
  they stay inside whole-stage codegen; Python UDFs only where semantics
  genuinely require them (and then Arrow-batched).
- Joins: broadcast for small dims, bucket/hash-prune candidate generation
  for pairwise similarity (never a raw cross join), iterative frontier
  joins with anti-join visited sets for BFS.
- Filters and projections are pushed to the Parquet scan by construction
  (single-pipeline lazy plans, no intermediate collects).
"""

__version__ = "0.1.0"

from memory_engine_spark.session import EngineSession, get_spark

__all__ = ["EngineSession", "get_spark", "__version__"]
