"""Table loaders for the driver's synthetic star schema + the engine's
graph view over it.

The engine's native tables are ``nodes``/``edges``/``embeddings``/
``revisions``/``events`` (SURVEY.md §1.1). The driver's test data
(TESTDATA.md) is a TPC-H-ish star schema; ``graph_edges`` derives a
typed edge table from its foreign keys so every graph operator
(operators/graph.py) can be exercised and oracle-checked on it:

    customer --placed-->   order
    order    --contains--> part        (via lineitem)
    order    --supplied_by--> supplier (via lineitem)
    customer --from_nation--> nation
    supplier --from_nation--> nation
    nation   --in_region--> region

Node ids are prefixed (``c_1``, ``o_42``, ``p_7``, ``s_3``, ``n_0``,
``r_0``) to keep the id space unambiguous, mirroring the reference's
string node_ids (knowledge_node.py:19-28).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet table, converting TIMESTAMP(NANOS) columns —
    which Spark has no native type for (read as long via
    ``spark.sql.legacy.parquet.nanosAsLong``) — to microsecond
    timestamps with integer division, matching DuckDB's ns→µs
    truncation exactly (float division would lose precision: ns-epoch
    values exceed 2^53)."""
    df = spark.read.parquet(path)
    schema = pq.read_schema(path)
    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            df = df.withColumn(field.name,
                               F.timestamp_micros(F.expr(f"`{field.name}` div 1000")))
        elif pa.types.is_timestamp(field.type) and field.type.tz is None:
            # µs/ms timestamps without a zone surface as TIMESTAMP_NTZ
            # (inferTimestampNTZ); normalize to TIMESTAMP so epoch
            # functions (unix_micros etc.) resolve. The session zone is
            # pinned to UTC, so the cast is value-preserving and matches
            # DuckDB's naive-epoch arithmetic.
            df = df.withColumn(field.name,
                               F.col(field.name).cast("timestamp"))
    return df


class LazyTables(dict):
    """Dict of table-name → DataFrame that defers the parquet footer /
    schema reads until a table is actually used — a query touching two
    tables shouldn't pay driver-side setup for ten."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark, self._dir = spark, sf_dir

    def __missing__(self, name: str) -> DataFrame:
        path = os.path.join(self._dir, f"{name}.parquet")
        if name not in TABLE_NAMES or not os.path.exists(path):
            raise KeyError(f"table not found: {name!r} under {self._dir}")
        df = _read_parquet(self._spark, path)
        self[name] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # The caller may hand us a bare session (the driver does): these two
    # runtime confs are required for correct reads of the ns-timestamp
    # test parquet and for timezone-stable date bucketing vs the oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return LazyTables(spark, sf_dir)


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key —
    the cluster-scale layout for repeated co-located joins: two tables
    bucketed on the same key with the same bucket count join WITHOUT a
    shuffle (SortMergeJoin reads co-located buckets; `.explain` shows no
    Exchange). This is the physical design SURVEY §4.2 calls for on
    `edges` (bucket by from_id, sort by relation_type) so every BFS hop
    and degree aggregation reuses the layout instead of reshuffling."""
    writer = df.write.mode("overwrite").format("parquet") \
        .bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def _edge(df: DataFrame, from_expr: str, to_expr: str, rel: str,
          conf_expr: str = "0.5") -> DataFrame:
    return df.select(
        F.expr(from_expr).alias("from_id"),
        F.expr(to_expr).alias("to_id"),
        F.lit(rel).alias("relation_type"),
        F.expr(conf_expr).cast("double").alias("confidence_score"),
    )


def graph_edges(t: dict[str, DataFrame]) -> DataFrame:
    """Typed, directed edge table (from_id, to_id, relation_type,
    confidence_score) over the star schema. Distinct is applied per
    relation where the source grain is finer than the edge grain
    (lineitem → order-part)."""
    placed = _edge(t["orders"], "concat('c_', o_custkey)", "concat('o_', o_orderkey)", "placed")
    contains = _edge(
        t["lineitem"], "concat('o_', l_orderkey)", "concat('p_', l_partkey)", "contains"
    ).distinct()
    supplied = _edge(
        t["lineitem"], "concat('o_', l_orderkey)", "concat('s_', l_suppkey)", "supplied_by"
    ).distinct()
    cust_nation = _edge(
        t["customer"], "concat('c_', c_custkey)", "concat('n_', c_nationkey)", "from_nation"
    )
    supp_nation = _edge(
        t["supplier"], "concat('s_', s_suppkey)", "concat('n_', s_nationkey)", "from_nation"
    )
    in_region = _edge(
        t["nation"], "concat('n_', n_nationkey)", "concat('r_', n_regionkey)", "in_region"
    )
    out = placed
    for e in (contains, supplied, cust_nation, supp_nation, in_region):
        out = out.unionByName(e)
    return out
