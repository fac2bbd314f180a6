"""Quality assessment, gap detection, source reliability,
cross-validation.

Reference:
- quality assessment (content/structural/temporal analyzers):
  /root/reference/memory_core/quality/quality_assessment.py:25-1272
- gap detection (content/relationship/domain gaps):
  /root/reference/memory_core/quality/gap_detection.py:24-1295
- source reliability (per-source aggregates):
  /root/reference/memory_core/quality/source_reliability.py
- cross-validation (claim/evidence corroboration):
  /root/reference/memory_core/quality/cross_validation.py

All decompose to per-row expressions + degree joins + per-source
aggregates (SURVEY.md §2.11) — one projection or one groupBy each, all
deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators.dedup import normalized, tokens
from memory_engine_spark.operators.graph import degrees
from memory_engine_spark.operators.ranking import freshness_score
from memory_engine_spark.operators.text import content_length_score


def content_quality(text_col: Column) -> Column:
    """Content-quality dimension: 0.5·length_score + 0.5·lexical
    diversity (distinct words / words) — the deterministic core of the
    content analyzer (quality_assessment.py content dimension)."""
    toks = tokens(text_col)
    diversity = F.when(F.size(toks) == 0, 0.0) \
        .otherwise(F.size(F.array_distinct(toks)) / F.size(toks))
    return 0.5 * content_length_score(text_col) + 0.5 * diversity


def assess_quality(nodes: DataFrame, edges: DataFrame, text_col: str = "content",
                   id_col: str = "node_id", ts_col: str | None = None,
                   now_ts: float | None = None) -> DataFrame:
    """Per-node quality report: content / structural / temporal
    dimensions + overall (equal-weight mean of available dimensions),
    5 levels (quality_assessment.py:25-46 dimensions+levels)."""
    deg = degrees(edges).select(id_col if "node_id" == id_col else "node_id",
                                "degree")
    out = nodes.join(deg.withColumnRenamed("node_id", id_col), id_col, "left") \
        .fillna(0, ["degree"])
    content = content_quality(F.col(text_col))
    # structural: 0 edges→0.2, saturating at 5 edges→1.0 (mirrors the
    # relationship-count curve, result_ranker.py:438-457)
    structural = F.when(F.col("degree") == 0, 0.2) \
        .otherwise(F.least(0.5 + 0.1 * F.col("degree"), F.lit(1.0)))
    dims = [F.round(content, 6).alias("content_quality"),
            F.round(structural, 6).alias("structural_quality")]
    overall_parts = [content, structural]
    if ts_col is not None and now_ts is not None:
        age_days = (F.lit(now_ts) - F.col(ts_col)) / 86400.0
        temporal = freshness_score(age_days)
        dims.append(F.round(temporal, 6).alias("temporal_quality"))
        overall_parts.append(temporal)
    overall = sum(overall_parts[1:], start=overall_parts[0]) / len(overall_parts)
    level = (F.when(overall >= 0.8, "excellent")
             .when(overall >= 0.6, "good")
             .when(overall >= 0.4, "fair")
             .when(overall >= 0.2, "poor")
             .otherwise("critical"))
    return out.select(id_col, *dims, F.round(overall, 6).alias("overall_quality"),
                      level.alias("quality_level"))


def source_reliability(df: DataFrame, source_col: str, quality_col,
                       id_col: str) -> DataFrame:
    """Per-source reliability report (source_reliability.py):
    n_items, avg quality, consistency = 1 − stddev(quality) clamped ≥0,
    reliability = 0.6·avg + 0.2·consistency + 0.2·volume factor
    min(n/100, 1). All exact aggregates."""
    q = quality_col if isinstance(quality_col, Column) else F.col(quality_col)
    agg = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(q).alias("avg_q"),
        F.coalesce(F.stddev(q), F.lit(0.0)).alias("sd_q"),
    )
    consistency = F.greatest(F.lit(0.0), 1.0 - F.col("sd_q"))
    volume = F.least(F.col("n_items") / 100.0, F.lit(1.0))
    rel = 0.6 * F.col("avg_q") + 0.2 * consistency + 0.2 * volume
    return agg.select(
        source_col,
        "n_items",
        F.round("avg_q", 6).alias("avg_quality"),
        F.round(consistency, 6).alias("consistency"),
        F.round(rel, 6).alias("reliability"),
    )


def relationship_gaps(nodes: DataFrame, edges: DataFrame,
                      id_col: str = "node_id") -> DataFrame:
    """Relationship-gap detection (gap_detection.py): nodes with no
    edges at all — two anti-joins."""
    return (
        nodes.join(edges.select(F.col("from_id").alias(id_col)), id_col, "left_anti")
        .join(edges.select(F.col("to_id").alias(id_col)), id_col, "left_anti")
    )


def coverage_gaps(df: DataFrame, domain_col: str,
                  min_items: int = 5) -> DataFrame:
    """Domain-coverage gaps (gap_detection.py): domains represented by
    fewer than ``min_items`` rows."""
    return (df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_items"))
            .filter(F.col("n_items") < min_items))


def cross_validate(df: DataFrame, text_col: str, source_col: str,
                   id_col: str, min_sources: int = 2) -> DataFrame:
    """Cross-validation (cross_validation.py): claims (normalized
    content) corroborated by ≥ min_sources distinct sources. One groupBy
    on the claim fingerprint; corroboration = distinct-source count."""
    claim = F.md5(normalized(F.col(text_col))).alias("claim_hash")
    return (
        df.select(claim, F.col(source_col).alias("_src"), F.col(id_col).alias("_id"))
        .groupBy("claim_hash")
        .agg(F.countDistinct("_src").alias("n_sources"),
             F.count(F.lit(1)).alias("n_items"),
             F.min("_id").alias("example_id"))
        .filter(F.col("n_sources") >= min_sources)
    )
