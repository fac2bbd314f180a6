"""Perspective analysis: group nodes into viewpoints, measure consensus.

Reference: /root/reference/memory_core/synthesis/perspective_analysis.py
(2102 LoC) — 6 perspective types (:22-42), viewpoint grouping, consensus
levels: strong >80%, moderate 60–80%, weak 40–60%, conflict <40%.

Spark decomposition (SURVEY.md §2.11): viewpoints = connected components
of the content-similarity graph; each viewpoint's stance profile =
per-group aggregates; consensus = share of members agreeing with the
group-dominant stance. Deterministic: similarity via word-Jaccard pairs,
stance via a caller-provided column (e.g. rating_truthfulness ≥ 0.5,
or a sentiment/position label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators.components import connected_components
from memory_engine_spark.operators.dedup import ngram_jaccard_pairs

CONSENSUS_LEVELS = [(0.8, "strong"), (0.6, "moderate"), (0.4, "weak")]


def consensus_level(ratio):
    out = F.lit("conflict")
    for threshold, name in reversed(CONSENSUS_LEVELS):
        out = F.when(ratio > threshold, name).otherwise(out)
    return out


def viewpoint_groups(df: DataFrame, text_col: str, id_col: str,
                     similarity_threshold: float = 0.3,
                     ngram: int = 1) -> DataFrame:
    """Group rows into viewpoints: connected components over the
    word/shingle-Jaccard similarity graph. Returns (id, viewpoint);
    singletons get their own id as viewpoint."""
    pairs = ngram_jaccard_pairs(df, text_col, id_col, n=ngram,
                                threshold=similarity_threshold)
    edges = pairs.select(F.col("a").cast("string").alias("from_id"),
                         F.col("b").cast("string").alias("to_id"))
    comp = connected_components(edges)
    ids = df.select(F.col(id_col).cast("string").alias("node_id"))
    return (ids.join(comp, "node_id", "left")
            .select(F.col("node_id").alias(id_col),
                    F.coalesce("component", "node_id").alias("viewpoint")))


def perspective_consensus(df: DataFrame, stance_col: str, id_col: str,
                          viewpoints: DataFrame) -> DataFrame:
    """Per-viewpoint consensus (perspective_analysis.py levels): dominant
    stance share → strong/moderate/weak/conflict. One groupBy pair.
    Ties between stances break toward the smaller stance value for
    determinism."""
    from pyspark.sql.window import Window

    joined = df.select(F.col(id_col).cast("string").alias("_id"),
                       F.col(stance_col).alias("stance")) \
        .join(viewpoints.select(F.col(viewpoints.columns[0]).cast("string")
                                .alias("_id"), "viewpoint"), "_id")
    per_stance = joined.groupBy("viewpoint", "stance").agg(
        F.count(F.lit(1)).alias("n"))
    # dominant stance: max by (n desc, stance asc) — deterministic
    w = Window.partitionBy("viewpoint").orderBy(F.col("n").desc(),
                                                F.col("stance").asc())
    dom = (per_stance.withColumn("rk", F.row_number().over(w))
           .filter("rk = 1")
           .select("viewpoint", F.col("stance").alias("dominant_stance"),
                   F.col("n").alias("dominant_n")))
    out = (per_stance.groupBy("viewpoint").agg(F.sum("n").alias("n_members"))
           .join(dom, "viewpoint"))
    ratio = F.col("dominant_n") / F.col("n_members")
    return out.select(
        "viewpoint", "n_members", "dominant_stance",
        F.round(ratio, 6).alias("consensus_ratio"),
        consensus_level(ratio).alias("consensus"),
    )
